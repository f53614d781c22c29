"""Ray Data stage: per-island GPML→pvjson conversion.

Stateless map_batches task (no model/index state — mapping tables are
module-level constants shipped once in the task closure, SURVEY.md §2.3 ST3).
Malformed islands become quarantine rows (error column) instead of aborting
the job — the reference treats them as hard process exits
(bin/gpml2pvjson:115-118), which does not scale to 10^12 documents.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions.convert import ConversionError, convert_island

DOCS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("doc_id", pa.string()),
    ("pathway_id", pa.string()),
    ("pathway_name", pa.string()),
    ("organism", pa.string()),
    ("n_entities", pa.int32()),
    ("pvjson", pa.large_string()),
    ("error", pa.string()),
])


def _convert_islands(batch: pa.Table):
    """Shared body: returns (docs table, parsed doc dicts aligned with ok
    rows as (url, doc) pairs)."""
    urls = batch.column("url").to_pylist()
    tss = batch.column("warc_ts").to_pylist()
    doc_ids = batch.column("doc_id").to_pylist()
    islands = batch.column("island").to_pylist()

    out = {name: [] for name in DOCS_SCHEMA.names}
    parsed: list[tuple[str, dict]] = []
    for url, ts, doc_id, island in zip(urls, tss, doc_ids, islands):
        out["url"].append(url)
        out["warc_ts"].append(ts)
        out["doc_id"].append(doc_id)
        try:
            doc = convert_island(island)
            pathway = doc["pathway"]
            if not pathway.get("id"):
                # CLI fallback id = sha256 of the island bytes
                pathway["id"] = doc_id
            out["pathway_id"].append(pathway["id"])
            out["pathway_name"].append(pathway.get("name", ""))
            out["organism"].append(pathway.get("organism", ""))
            out["n_entities"].append(len(doc["entitiesById"]))
            out["pvjson"].append(json.dumps(doc, separators=(",", ":")))
            out["error"].append("")
            parsed.append((url, doc))
        except ConversionError as exc:
            out["pathway_id"].append("")
            out["pathway_name"].append("")
            out["organism"].append("")
            out["n_entities"].append(0)
            out["pvjson"].append("")
            out["error"].append(str(exc)[:500])
    return pa.Table.from_pydict(out, schema=DOCS_SCHEMA), parsed


def convert_islands_batch(batch: pa.Table) -> pa.Table:
    return _convert_islands(batch)[0]


def make_convert_emit_fn(docs_dir: str):
    """Fused stage for the flagship pipeline: convert islands, write the
    docs checkpoint parquet INSIDE the task (content-addressed file name →
    idempotent on retry), and emit triples from the in-memory doc dicts —
    skipping the json.dumps→parquet→json.loads round trip that separate
    stages would pay."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from ..functions.triples import emit_triples
    from .triples import TRIPLES_SCHEMA, _BOOL_COLS

    def convert_emit(batch: pa.Table) -> pa.Table:
        docs_table, parsed = _convert_islands(batch)
        if docs_table.num_rows:
            key = hashlib.sha1(
                "|".join(docs_table.column("doc_id").to_pylist())
                .encode()).hexdigest()[:16]
            pq.write_table(docs_table,
                           os.path.join(docs_dir, f"docs-{key}.parquet"),
                           compression="zstd")
        out = {name: [] for name in TRIPLES_SCHEMA.names}
        for url, doc in parsed:
            for t in emit_triples(doc, url, copy_entities=False):
                for name in TRIPLES_SCHEMA.names:
                    if name in _BOOL_COLS:
                        out[name].append(bool(t.get(name)))
                    else:
                        out[name].append(t.get(name) or "")
        return pa.Table.from_pydict(out, schema=TRIPLES_SCHEMA)

    return convert_emit
