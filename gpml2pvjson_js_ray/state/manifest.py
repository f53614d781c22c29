"""Per-partition lineage + counters manifest enabling exact resume
(SURVEY.md §4 checkpoint/resume; north rule "exact resume").

Each completed input partition writes one JSON line:
  {partition_id, input_files, pages, islands, docs, errors, triples,
   output_dirs, sha256}
to <out_dir>/_manifest/partition-<id>.json (atomic: tmp file + rename).
On resume, partitions with a manifest entry are skipped; their outputs are
byte-identical on rerun because ids and conversion are deterministic per
island (GraphIdManager stability, SURVEY.md §4 determinism row).
"""

from __future__ import annotations

import hashlib
import json
import os


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def load_manifest(out_dir: str) -> dict[str, dict]:
    mdir = _manifest_dir(out_dir)
    entries: dict[str, dict] = {}
    if not os.path.isdir(mdir):
        return entries
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                entry = json.load(f)
            entries[entry["partition_id"]] = entry
        except (json.JSONDecodeError, KeyError, OSError):
            continue  # torn write → partition treated as incomplete
    return entries


def record_partition(out_dir: str, partition_id: str, input_files: list[str],
                     counters: dict, output_dirs: list[str]) -> dict:
    entry = {
        "partition_id": partition_id,
        "input_files": input_files,
        "output_dirs": output_dirs,
        **counters,
    }
    payload = json.dumps(entry, sort_keys=True)
    entry["sha256"] = hashlib.sha256(payload.encode()).hexdigest()
    mdir = _manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"partition-{partition_id}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entry, f, sort_keys=True)
    os.replace(tmp, final)  # atomic on POSIX
    return entry
