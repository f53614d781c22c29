"""Flagship pipeline: pages → islands → pvjson docs → triples → linked →
deduped → canonical entities + partitioned adjacency, with per-partition
lineage manifest and exact resume.

Ray-Data-first (SURVEY.md §3.4): every stage is a `map_batches` transform
over Arrow batches. The xref dictionary is broadcast once via ray.put as a
numpy-backed index (zero-copy per worker). The only all-to-all exchanges
are the exact-dedup + adjacency bucket exchange and the canonical-entity
merge — both pre-combined per batch and executed as a hive-partitioned
write (map side) + per-bucket raw-Ray reduce tasks, because the key space
is small and known (see stages/adjacency.py).
"""

from __future__ import annotations

import glob
import os

from ..sources.pages import SEED, write_pages_parquet
from ..stages.canonicalize import (dedup_triples_global,
                                   dedup_triples_within_batch,
                                   entity_partials_batch,
                                   merge_entity_partials)
from ..stages.convert import convert_islands_batch
from ..stages.extract import extract_islands_batch, extract_text_batch
from ..stages.triples import emit_triples_batch
from ..state.manifest import load_manifest, record_partition

_PAGES_CACHE_ROOT = "/tmp/gpml2pvjson_pages"

# corpus sizes per scale-factor directory name (sf0.001 ≈ smoke, sf0.01 ≈
# correctness, sf0.1 ≈ bench) — deterministic, no external data
SF_TO_N_PAGES = {"sf0.001": 240, "sf0.01": 2400, "sf0.1": 384000}

# bump when triple-emission/linking/dedup SEMANTICS change: the resumable
# manifest caches phase-1 output by partition id only, so a stale
# checkpoint written by older code would otherwise diverge from a live
# recompute (the kg_* oracle SQL reads the checkpoint; the queries
# recompute live)
KG_PIPELINE_VERSION = 2

_xref_ref_cache = None


def pages_path_for_sf(sf_dir: str, seed: int = SEED) -> str:
    """Deterministic synthetic pages corpus sized to match the driver's
    sf directory naming; cached under /tmp. GRAFT_N_PAGES overrides the
    size for corpus-scaling probes (e.g. the 2× amortization runs in
    BASELINE.md) without touching the sf naming contract."""
    override = os.environ.get("GRAFT_N_PAGES")
    if override:
        return pages_path(int(override), seed)
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    n_pages = SF_TO_N_PAGES.get(sf_name, 2400)
    return pages_path(n_pages, seed)


def kg_checkpoint_dir_for_sf(sf_dir: str) -> str:
    """Deterministic checkpoint root for sf_dir's synthetic corpus —
    pure string arithmetic (NO corpus generation side effect), so the
    DuckDB oracle SQL for the kg_* driver queries can embed the path
    at oracle_sql() time. Must stay in lockstep with the out-dir
    naming in __ray_entry__._kg_pipeline_output."""
    from ..sources.pages import GEN_VERSION
    override = os.environ.get("GRAFT_N_PAGES")
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    n_pages = int(override) if override else SF_TO_N_PAGES.get(sf_name, 2400)
    return (f"/tmp/gpml2pvjson_kgq_n{n_pages}_s{SEED}"
            f"_v{GEN_VERSION}_p{KG_PIPELINE_VERSION}")


def kg_oracle_sql_for_sf(sf_dir: str = "/root/testdata/sf0.01") -> dict:
    """DuckDB oracle SQL for the driver-verifiable kg_* queries, over
    the ENGINE'S OWN phase-1 checkpoint (the linked pre-dedup triples
    parquet written by run_kg_pipeline). Each statement recomputes a
    downstream pipeline artifact independently — exact dedup
    (DISTINCT), canonical-entity unification (alias union + mention
    counts), degree/predicate profiles, star/OPTIONAL joins — so the
    distributed exchange expressions get a driver-green hash check
    against first-principles SQL. The matching queries() callables
    call _ensure (run_kg_pipeline, manifest-cached) before returning,
    which guarantees the checkpoint exists by the time the SQL runs."""
    trip = os.path.join(kg_checkpoint_dir_for_sf(sf_dir),
                        "triples", "*", "*.parquet")
    trip_cols = ("subj, pred, obj, url, pathway_id, entity_id, "
                 "subj_xref, obj_xref, subj_is_node, obj_is_node, "
                 "biopax_type, control_type, conversion_direction, "
                 "canonical_subj, canonical_obj")
    dedup = (f"dedup AS (SELECT DISTINCT canonical_subj, pred, "
             f"canonical_obj FROM read_parquet('{trip}'))")
    arms = (f"{dedup}, arms AS (SELECT canonical_subj, "
            "count(*) FILTER (pred = 'hasXref') AS nx, "
            "count(*) FILTER (pred = 'isPartOf') AS np "
            "FROM dedup WHERE pred IN ('hasXref', 'isPartOf') "
            "GROUP BY canonical_subj)")
    return {
        # identity-under-recompute: the live conversion+linking rerun
        # must byte-match the checkpoint it wrote (determinism gate)
        "kg_linked_triples":
            f"SELECT {trip_cols} FROM read_parquet('{trip}')",
        # exact dedup: keep-first-by-url per (s,p,o) == min(url)
        "kg_deduped_triples": f"""
SELECT canonical_subj, pred, canonical_obj, min(url) AS url
FROM read_parquet('{trip}')
GROUP BY canonical_subj, pred, canonical_obj""",
        "kg_canonical_entities": f"""
WITH rt AS (SELECT * FROM read_parquet('{trip}')),
long AS (
  SELECT canonical_subj AS canonical_id, subj_xref AS xref, url,
         subj_is_node AS is_node FROM rt
  UNION ALL
  SELECT canonical_obj, obj_xref, url, obj_is_node FROM rt),
m AS (SELECT * FROM long
      WHERE canonical_id IS NOT NULL AND canonical_id <> ''
        AND (is_node OR xref <> ''))
SELECT canonical_id,
       CASE WHEN count(*) FILTER (xref <> '') = 0 THEN '[]'
            ELSE to_json(list_slice(list_sort(list_distinct(
                     list(xref) FILTER (xref <> ''))), 1, 32)) END
           AS aliases_json,
       CAST(count(*) AS BIGINT) AS n_mentions,
       min(url) AS first_url
FROM m GROUP BY canonical_id""",
        "kg_predicate_counts": f"""
WITH {dedup}
SELECT pred, CAST(count(*) AS BIGINT) AS n_triples
FROM dedup GROUP BY pred""",
        "kg_entity_degrees": f"""
WITH {dedup},
deg AS (SELECT canonical_subj, CAST(count(*) AS BIGINT) AS degree
        FROM dedup GROUP BY canonical_subj)
SELECT degree, CAST(count(*) AS BIGINT) AS n_entities
FROM deg GROUP BY degree""",
        "kg_star_join": f"""
WITH {arms}
SELECT canonical_subj, CAST(nx + np AS BIGINT) AS n_edges
FROM arms WHERE nx > 0 AND np > 0""",
        "kg_optional_join": f"""
WITH {arms}
SELECT canonical_subj, CAST(nx AS BIGINT) AS n_required,
       CAST(np AS BIGINT) AS n_optional
FROM arms WHERE nx > 0""",
    }


def pages_path(n_pages: int, seed: int = SEED) -> str:
    from ..sources.pages import GEN_VERSION
    out = os.path.join(_PAGES_CACHE_ROOT,
                       f"n{n_pages}_s{seed}_v{GEN_VERSION}")
    return write_pages_parquet(out, n_pages, seed)


def get_xref_ref():
    """Build the xref index once per driver process and ray.put it
    (numpy-backed → zero-copy ray.get in every linker actor)."""
    global _xref_ref_cache
    if _xref_ref_cache is None:
        import ray
        from ..sources.xrefs import build_xref_index
        _xref_ref_cache = ray.put(build_xref_index())
    return _xref_ref_cache


def _ensure_fsspec_http_stub():
    """fsspec.implementations.http fails to import here (no aiohttp). Ray's
    path resolution catches ModuleNotFoundError on it — but under
    CONCURRENT read_parquet calls a second thread can observe the
    partially-initialized module and get a bare ImportError instead, which
    Ray does not catch. Seed sys.modules with a benign stub once so the
    import is deterministic and thread-safe (the class is only ever used in
    isinstance checks)."""
    import sys
    import types
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        stub = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # pragma: no cover - isinstance-only stub
            pass

        stub.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = stub


def _target_blocks() -> int:
    """Blocks drive map task parallelism; with a handful of parquet files a
    default read yields a handful of blocks and the CPUs starve. Target a
    few blocks per CPU (harmless at real scale where files ≫ CPUs)."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # 2 (not 3): measured round-4 A/B at 24 CPUs — 48 blocks (2 even
    # waves) beat 96 (15.3-16.4 s vs 16.1-16.5 s) and larger counts are
    # strictly worse (6→18.1+, 8→18.4+ s: per-task overhead dominates);
    # the 6-CPU level is insensitive (52.6 vs 52.9 s). Real-scale runs
    # have files >> CPUs and never hit this override.
    per_cpu = int(os.environ.get("GRAFT_BLOCKS_PER_CPU", "2"))
    return max(8, cpus * per_cpu)


def _even_blocks(n_files: int, target: int | None = None) -> int:
    """Block count for a read over n_files equal-sized parquet shards.

    read_parquet bundles whole files into blocks, so an arbitrary block
    count leaves some blocks with ⌈n/B⌉ files and some with ⌊n/B⌋ — up to a
    2× per-task size skew that straggles the final wave of the fused map
    operator. Prefer a block count that (a) divides n_files exactly (every
    block gets the same number of files → equal task sizes) and (b) is a
    multiple of the CPU count (the ~equal tasks then finish in integral
    waves with no partial-wave idle tail). Falls back to the plain
    blocks-per-CPU target when no such divisor exists (e.g. prime file
    counts, files < CPUs)."""
    target = target or _target_blocks()
    if n_files < 2:
        return target
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    cands = [d for d in range(1, n_files + 1)
             if n_files % d == 0 and d % cpus == 0
             and 2 * cpus <= d <= 8 * cpus]
    if not cands:
        return target
    # closest to the blocks-per-CPU target; prefer MORE blocks on ties
    # (finer tasks pipeline into the streaming exchange sooner)
    return min(cands, key=lambda d: (abs(d - target), -d))


def read_pages(path: str, columns: list[str] | None = None):
    import ray.data as rd
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    # prune at the read: text/lang are not needed on the KG path
    return rd.read_parquet(files or path,
                           columns=columns or ["url", "warc_ts", "html"],
                           override_num_blocks=_even_blocks(len(files)))


def read_pages_ndjson(path: str):
    """Alternate source format: Common-Crawl-style pages as
    newline-delimited JSON (one object per line with url, warc_ts as an
    ISO-8601 string, html as UTF-8 text, text, lang — JSON cannot carry
    raw bytes, so html travels as text). Each batch is normalized to the
    EXACT parquet page schema (html → binary, warc_ts → timestamp[us],
    KG columns only), so every downstream stage is source-agnostic:
    `islands_dataset(read_pages_ndjson(d))` ==
    `islands_dataset(read_pages(d))` on the same corpus
    (tests/test_ray_stages.py::test_ndjson_source_parity)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(path, "*.ndjson"))
                   + glob.glob(os.path.join(path, "*.jsonl")))

    def norm(b: pa.Table) -> pa.Table:
        ts = b.column("warc_ts")
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("us"))
        else:
            # Arrow's string→timestamp cast parses ISO-8601 with or
            # without fractional seconds (strptime %S can't carry %f,
            # which silently dropped sub-second capture times)
            ts = ts.cast(pa.string()).cast(pa.timestamp("us"))
        return pa.table({
            "url": b.column("url").cast(pa.string()),
            "warc_ts": ts,
            "html": b.column("html").cast(pa.string()).cast(pa.binary()),
        })

    return rd.read_json(
        files or path,
        file_extensions=["json", "jsonl", "ndjson"]).map_batches(
        norm, batch_format="pyarrow")


def read_pages_warc(path: str):
    """Alternate source format: pages as WARC shards — the actual
    Common-Crawl wire format (response records, Content-Length-delimited
    WARC 1.0/1.1 layout, gzip-transparent). Normalized to the EXACT
    parquet page schema so every downstream stage is source-agnostic:
    `islands_dataset(read_pages_warc(d))` == `islands_dataset(
    read_pages(d))` (tests/test_ray_stages.py::test_warc_source_parity).

    Scale shape: one task per WARC shard (`read_binary_files` — the
    shard IS the parallelism unit, exactly how production CC jobs run),
    record walk per shard in Python because WARC records are
    byte-length-delimited (no splittable structure to vectorize over;
    the per-record cost is two finds + one slice, dwarfed by downstream
    parsing). html bytes are sliced exactly per Content-Length, so
    binary payloads survive byte-identical."""
    import datetime as _dt
    import gzip as _gzip

    import pyarrow as pa
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(path, "*.warc"))
                   + glob.glob(os.path.join(path, "*.warc.gz")))

    def parse(b: pa.Table) -> pa.Table:
        urls, tss, htmls = [], [], []
        for data in b.column("bytes").to_pylist():
            if data[:2] == b"\x1f\x8b":
                data = _gzip.decompress(data)
            pos = 0
            n = len(data)
            while pos < n:
                while data.startswith(b"\r\n", pos):
                    pos += 2
                if pos >= n:
                    break
                hdr_end = data.find(b"\r\n\r\n", pos)
                if hdr_end < 0 or not data.startswith(b"WARC/", pos):
                    raise ValueError(
                        f"malformed WARC record at byte {pos}")
                headers = {}
                for line in data[pos:hdr_end].decode(
                        "utf-8", errors="replace").split("\r\n")[1:]:
                    k, _, v = line.partition(":")
                    headers[k.strip()] = v.strip()
                clen = int(headers["Content-Length"])
                body = data[hdr_end + 4:hdr_end + 4 + clen]
                pos = hdr_end + 4 + clen
                if headers.get("WARC-Type") != "response":
                    continue
                split = body.find(b"\r\n\r\n")
                htmls.append(body[split + 4:])
                urls.append(headers["WARC-Target-URI"])
                tss.append(_dt.datetime.fromisoformat(
                    headers["WARC-Date"].rstrip("Z")))
        return pa.table({
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
        })

    return rd.read_binary_files(files or path) \
        .map_batches(parse, batch_format="pyarrow")


def _partition_id(part_files: list[str]) -> str:
    """Input-derived partition id: sha1 over the shard basenames of the
    file GROUP. Index-derived ids (round ≤3 session 5) silently
    mis-skipped on resume when a NEW shard sorted before existing ones
    (every index shifts but the manifest matches by id alone) — group
    ids make an incremental crawl drop resume-safe at the granularity
    of the grouping: with files_per_partition=1 (the incremental
    deployment shape) only the new shard runs; with coarser grouping a
    new shard reshuffles group membership and invalidated groups rerun
    (run_kg_pipeline garbage-collects their stale outputs). Basenames,
    not full paths, so a corpus moved between mounts still resumes; a
    shard REWRITTEN in place under the same name is not detected —
    crawl drops are append-only by contract."""
    import hashlib
    key = "|".join(os.path.basename(p) for p in part_files)
    return hashlib.sha1(key.encode()).hexdigest()[:12]


def latest_pages_dataset(pages, num_buckets: int = 64):
    """Re-crawl collapse: keep only the NEWEST capture of each url —
    the ingest-side dedup a rolling web crawl needs before conversion
    (the triple-level dedup downstream keeps min-url representatives of
    identical ISLANDS; this collapses identical URLS). Hash-bucketed by
    url so all captures of a url co-locate in one exchange; within a
    bucket one vectorized polars group_by picks argmax(warc_ts), with
    byte-order of html as the deterministic tiebreak for equal
    timestamps. The exchange carries whole page rows — at 100 TB run
    this FIRST, before any per-page work, so every later stage sees
    each url once."""
    import pyarrow as pa

    from ..stages.exchange import hash_rows_mod, polars_capped

    def add_bucket(b: pa.Table) -> pa.Table:
        buckets = hash_rows_mod(b, ["url"], num_buckets)
        return b.append_column(
            "url_bucket", pa.array(buckets.astype("int32"),
                                   type=pa.int32()))

    def newest(g: pa.Table) -> pa.Table:
        pl = polars_capped()
        df = pl.from_arrow(g.drop_columns(["url_bucket"]))
        out = (df.sort(["url", "warc_ts", "html"])
               .group_by("url", maintain_order=True).last()
               .select(df.columns))
        return out.to_arrow().cast(g.drop_columns(["url_bucket"]).schema)

    return (pages.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("url_bucket")
            .map_groups(newest, batch_format="pyarrow"))


def islands_dataset(pages):
    return pages.map_batches(extract_islands_batch, batch_format="pyarrow",
                             batch_size=256)


def docs_dataset(pages):
    return islands_dataset(pages).map_batches(
        convert_islands_batch, batch_format="pyarrow", batch_size=256)


def quarantine_report(pages):
    """Per-error-class counts over the quarantined (malformed) islands —
    the ops dashboard for the reference's throw-on-malformed semantics
    re-expressed as per-row quarantine (SURVEY.md §7.5 hard part 4:
    `src/2013a/toPvjson.ts:236-239,442,753-771` abort the CLI; at web
    scale the error becomes a recorded row instead). Map-only classify
    (error text → its head, before any volatile detail) + an
    error-class-sized groupby; the healthy-row fast path drops clean
    batches before anything is built. Rows-only (error strings are
    engine-internal), pinned by pytest on a corpus with planted
    malformed islands."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as _pc

    from ray.data.aggregate import Sum

    def classify(b: "pa.Table") -> "pa.Table":
        err = b.column("error")
        mask = _pc.not_equal(err, "")
        if not _pc.any(mask).as_py():
            return pa.table({"error_class": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        bad = b.filter(mask)
        # class = text up to the first ':' (exception-type-ish head),
        # capped — vectorized split_pattern + list_element
        head = _pc.list_element(
            _pc.split_pattern(bad.column("error"), ":", max_splits=1), 0)
        head = _pc.utf8_slice_codeunits(head, 0, 60)
        t = pa.table({"error_class": head,
                      "n": pa.array(np.ones(len(bad), dtype=np.int64))})
        return (pa.TableGroupBy(t, ["error_class"]).aggregate([("n", "sum")])
                .rename_columns(["error_class", "n"]))

    return (docs_dataset(pages)
            .select_columns(["error"])
            .map_batches(classify, batch_format="pyarrow")
            .groupby("error_class")
            .aggregate(Sum("n", alias_name="n"))
            .sort("error_class"))


def linked_triples_dataset(pages, xref_ref=None, link_concurrency=(2, 16)):
    docs = docs_dataset(pages)
    triples = docs.map_batches(emit_triples_batch, batch_format="pyarrow",
                               batch_size=256)
    if xref_ref is None:
        xref_ref = get_xref_ref()
    from ..stages.link import make_link_fn
    # batch_size=None: the linker is fully vectorized, so it takes whole
    # blocks. An explicit batch_size here would set min_rows_per_bundle on
    # the FUSED operator chain, bundling that many *input pages* (not
    # triples) per task — round-1's phase-1 ran as ~47 ten-second tasks and
    # wave-quantized badly at 32 CPUs because of exactly that.
    return triples.map_batches(make_link_fn(xref_ref),
                               batch_format="pyarrow", batch_size=None)


def deduped_triples_dataset(pages, xref_ref=None):
    linked = linked_triples_dataset(pages, xref_ref)
    combined = linked.map_batches(dedup_triples_within_batch,
                                  batch_format="pyarrow")
    return dedup_triples_global(combined)


def canonical_entities_dataset(pages, xref_ref=None):
    linked = linked_triples_dataset(pages, xref_ref)
    partials = linked.map_batches(entity_partials_batch,
                                  batch_format="pyarrow")
    return merge_entity_partials(partials)


# aliases used by __ray_entry__ (queries() callables take a pages Dataset)
linked_triples_from_pages = linked_triples_dataset
deduped_triples_from_pages = deduped_triples_dataset
canonical_entities_from_pages = canonical_entities_dataset


def text_invariant_dataset(path: str):
    """Per-url extracted text + byte-identity flag vs the corpus oracle."""
    import ray.data as rd
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    pages = rd.read_parquet(files or path,
                            columns=["url", "lang", "html", "text"],
                            override_num_blocks=_even_blocks(len(files)))
    return pages.map_batches(extract_text_batch, batch_format="pyarrow",
                             batch_size=256)


# ---------------------------------------------------------------------------
# resumable partitioned run (ray job entry point)
# ---------------------------------------------------------------------------

def run_kg_pipeline(pages_dir: str, out_dir: str,
                    files_per_partition: int | None = None,
                    resume: bool = True,
                    num_buckets: int | None = None,
                    hot_subjects: frozenset | None = None,
                    stream_exchange: bool = True) -> dict:
    """End-to-end run with per-partition lineage manifest.

    Phase 1 (resumable per input partition): pages → linked triples parquet
    under out/triples/part=<id>/ and docs under out/docs/part=<id>/.
    Phase 2 (global): exact dedup → adjacency layout + canonical entities.

    Partition sizing: each partition is a full Ray Data sub-pipeline with
    fixed startup cost; the single-node default is ONE partition (max
    throughput). Pass files_per_partition to trade throughput for resume
    granularity — on a real multi-node run size partitions to O(minutes)
    of work each.
    """
    import ray
    import ray.data as rd

    _ensure_fsspec_http_stub()

    @ray.remote(num_cpus=1)
    def _partition_counters(docs_dir: str, triples_dir: str) -> dict:
        """Per-partition lineage counters, computed on a worker (metadata
        reads + one error-column scan) — not on the driver."""
        import pyarrow.compute as _pc
        import pyarrow.dataset as _pads
        n_docs = _pads.dataset(docs_dir).count_rows()
        n_err = _pads.dataset(docs_dir).to_table(
            columns=["error"],
            filter=_pc.field("error") != "").num_rows if n_docs else 0
        n_triples = _pads.dataset(triples_dir).count_rows()
        return {"docs": n_docs, "errors": n_err, "triples": n_triples}

    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    if files_per_partition is None:
        # Default: ONE partition — a single streaming execution saturates
        # this node best (measured; concurrent sub-pipelines contend on the
        # driver). On a real cluster, partition count follows data size —
        # pass files_per_partition explicitly to get resume granularity.
        files_per_partition = max(1, len(files))
    partitions = [files[i:i + files_per_partition]
                  for i in range(0, len(files), files_per_partition)]
    manifest = load_manifest(out_dir) if resume else {}
    # docs = island rows (one per extracted island, including quarantined
    # rows); errors = the quarantined subset
    stats = {"partitions_total": len(partitions), "partitions_skipped": 0,
             "docs": 0, "errors": 0, "triples": 0}

    import time as _time
    _t_start = _time.perf_counter()
    xref_ref = get_xref_ref()

    import shutil as _shutil
    from concurrent.futures import ThreadPoolExecutor

    from ..stages.link import make_link_fn

    def partition_chain(pid: str, part_files: list[str],
                        n_concurrent_partitions: int = 1):
        """pages → islands → fused convert+checkpoint+emit → linked. One
        resumable partition's full chain."""
        pages = rd.read_parquet(
            part_files, columns=["url", "warc_ts", "html"],
            override_num_blocks=_even_blocks(
                len(part_files),
                target=max(8, _target_blocks()
                           // max(1, n_concurrent_partitions))))
        docs_dir = os.path.join(out_dir, "docs", f"part={pid}")
        os.makedirs(docs_dir, exist_ok=True)

        # fused convert+docs-checkpoint+emit stage: writes the docs parquet
        # inside the task and emits triples from the in-memory doc dicts —
        # no dumps→parquet→loads round trip (stages/convert.py)
        from ..stages.convert import make_convert_emit_fn
        # link batch_size=None: see linked_triples_dataset (an explicit
        # batch size would wave-quantize the fused phase-1 operator)
        return (islands_dataset(pages)
                .map_batches(make_convert_emit_fn(docs_dir),
                             batch_format="pyarrow", batch_size=256)
                .map_batches(make_link_fn(xref_ref),
                             batch_format="pyarrow", batch_size=None))

    # Partitions run as CONCURRENT Ray Data pipelines (driver threads) —
    # measured faster than a single union-of-branches execution, whose
    # input branches the streaming executor drains mostly serially. Each
    # partition is ONE execution: the docs checkpoint is written through
    # inside the pipeline (no separate write+re-read execution).
    live = {_partition_id(pf) for pf in partitions}
    # garbage-collect partitions invalidated by a regrouping (new shard
    # with files_per_partition > 1) or a removed shard: their manifest
    # entries and checkpoint dirs would otherwise accumulate unbounded
    # and feed stale triples into phase 2 on resumed runs
    for stale in set(manifest) - live:
        import shutil as _sh
        _sh.rmtree(os.path.join(out_dir, "docs", f"part={stale}"),
                   ignore_errors=True)
        _sh.rmtree(os.path.join(out_dir, "triples", f"part_id={stale}"),
                   ignore_errors=True)
        try:
            os.remove(os.path.join(out_dir, "_manifest",
                                   f"partition-{stale}.json"))
        except OSError:
            pass
        manifest.pop(stale, None)
    todo = [(_partition_id(pf), pf) for pf in partitions
            if _partition_id(pf) not in manifest]
    stats["partitions_skipped"] = len(partitions) - len(todo)
    triples_root = os.path.join(out_dir, "triples")

    # The wide phase-2 outputs (adjacency + entities) are rebuilt from the
    # (resumable) phase-1 partitions on every run; their exchange's MAP
    # side runs STREAMED UNDER PHASE 1: each partition's linked-triples
    # blocks are checkpointed to parquet by a passthrough writer stage and
    # fed straight into split tasks (stages/exchange.py StreamingExchange),
    # so after the last partition lands only the per-bucket reduces remain.
    import shutil
    for sub in ("adjacency", "entities"):
        shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)

    from ..stages.adjacency import adjacency_exchange_spec
    from ..stages.canonicalize import entity_exchange_spec
    from ..stages.exchange import StreamingExchange
    from ..stages.triples import make_triples_writer

    # Hot-subject salting: the bucket function must be FIXED before the
    # first split task, so auto-detection-from-this-run's-triples can't
    # feed it. Fresh runs detect heavy hitters with a driver-local
    # pre-pass over a ~0.1% page sample (hot_subjects_from_pages, ~0.3 s);
    # resumed runs with no new work sample the existing checkpoint
    # instead (free — phase 1 is skipped). Callers can still supply known
    # heavy hitters (e.g. last crawl's entity counts) to skip the pass.
    _t_hot = _time.perf_counter()
    if hot_subjects is None:
        if todo:
            from ..stages.adjacency import hot_subjects_from_pages
            hot_subjects = hot_subjects_from_pages(files, xref_ref)
        else:
            from ..stages.adjacency import hot_subjects_from_sample
            hot_subjects = hot_subjects_from_sample(triples_root)
    stats["hot_subjects_sec"] = round(_time.perf_counter() - _t_hot, 3)
    exchange = StreamingExchange([
        adjacency_exchange_spec(os.path.join(out_dir, "adjacency"),
                                num_buckets=num_buckets,
                                hot_subjects=hot_subjects),
        entity_exchange_spec(os.path.join(out_dir, "entities")),
    ])

    def run_partition(pid: str, part_files: list[str]) -> tuple:
        docs_dir = os.path.join(out_dir, "docs", f"part={pid}")
        triples_dir = os.path.join(triples_root, f"part_id={pid}")
        # clear any half-written outputs from a previous failed run
        _shutil.rmtree(docs_dir, ignore_errors=True)
        _shutil.rmtree(triples_dir, ignore_errors=True)
        os.makedirs(triples_dir, exist_ok=True)
        linked = partition_chain(pid, part_files,
                                 n_concurrent_partitions=min(4, len(todo)))
        if stream_exchange:
            written = linked.map_batches(make_triples_writer(triples_dir),
                                         batch_format="pyarrow",
                                         batch_size=None)
            # consuming the stream writes the checkpoint AND feeds the
            # exchange's split tasks block-by-block
            exchange.add_dataset(written)
        else:
            linked.write_parquet(triples_dir, compression="zstd")
            exchange.add_files(sorted(glob.glob(
                os.path.join(triples_dir, "*.parquet"))))
        return pid, part_files, docs_dir, triples_dir

    def finish_partition(done: tuple) -> dict:
        """Counters (a worker-side Ray task) + manifest write. Runs in a
        background thread OVERLAPPED with the exchange: the manifest marks
        the partition complete, and on a crash before it lands the
        partition simply reruns (idempotent outputs)."""
        pid, part_files, docs_dir, triples_dir = done
        counters = ray.get(_partition_counters.remote(docs_dir, triples_dir))
        record_partition(out_dir, pid, part_files, counters,
                         [docs_dir, triples_dir])
        return counters

    # resume-skipped partitions enter the exchange from their checkpoint
    # files (no recompute)
    for pf in partitions:
        pid = _partition_id(pf)
        if pid in manifest:
            exchange.add_files(sorted(glob.glob(
                os.path.join(triples_root, f"part_id={pid}", "*.parquet"))))

    counter_futures = []
    counter_pool = ThreadPoolExecutor(max_workers=2)
    _t_exec = _time.perf_counter()
    if todo:
        with ThreadPoolExecutor(max_workers=min(4, len(todo))) as pool:
            for done in pool.map(lambda args: run_partition(*args), todo):
                counter_futures.append(
                    counter_pool.submit(finish_partition, done))
    stats["phase1_exec_sec"] = round(_time.perf_counter() - _t_exec, 3)
    stats["phase1_sec"] = round(_time.perf_counter() - _t_start, 3)

    _t_p2 = _time.perf_counter()
    adj_counts, ent_counts = exchange.finish()
    stats["phase2_sec"] = round(_time.perf_counter() - _t_p2, 3)

    _t_cnt = _time.perf_counter()
    for fut in counter_futures:
        counters = fut.result()
        stats["docs"] += counters["docs"]
        stats["errors"] += counters["errors"]
        stats["triples"] += counters["triples"]
    counter_pool.shutdown()
    stats["counters_wait_sec"] = round(_time.perf_counter() - _t_cnt, 3)

    stats["triples_deduped"] = sum(adj_counts)
    stats["entities"] = sum(ent_counts)
    return stats


def write_ntriples(pages, out_dir: str, xref_ref=None,
                   quads: bool = False):
    """Materialize the deduped triple stream as sharded N-Triples — the
    bulk-load RDF sink next to the JSON-LD one (functions/ntriples.py
    documents the term-mapping convention). Each task formats its block
    and writes ONE shard under a content-addressed name
    (sha1 of the block's lines → idempotent under task retry, same
    write discipline as the docs checkpoint, stages/convert.py:72);
    shards land in `out_dir` directly so a resumed/re-run export
    overwrites byte-identical files instead of duplicating. Returns the
    shard manifest as a Dataset (shard, n_triples) — constant-size per
    task, nothing dataset-sized on the driver.

    `quads=True` exports N-QUADS with the crawl URL as each statement's
    graph label — per-page provenance, which only exists BEFORE global
    dedup, so the quad stream is the linked (pre-dedup) one; the triple
    stream stays the deduped canonical set."""
    import hashlib
    import os as _os

    from ..functions.ntriples import lines_batch, xref_iri_factory

    _os.makedirs(out_dir, exist_ok=True)
    graph_col = "url" if quads else None
    ext = "nq" if quads else "nt"

    def write_shard(b: "pa.Table") -> "pa.Table":
        import pyarrow as _pa
        if b.num_rows == 0:
            # a zero-row block would otherwise publish a shard holding
            # one blank line — invalid under the one-triple-per-line
            # grammar — so it contributes nothing to the manifest
            return _pa.table({"shard": _pa.array([], _pa.string()),
                              "n_triples": _pa.array([], _pa.int64())})
        resolve = xref_iri_factory()
        lines = lines_batch(b, xref_iri_of=resolve,
                            graph_col=graph_col).column("line")
        payload = ("\n".join(lines.to_pylist()) + "\n").encode("utf-8")
        key = hashlib.sha1(payload).hexdigest()[:16]
        path = _os.path.join(out_dir, f"part-{key}.{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        _os.replace(tmp, path)          # atomic publish
        return _pa.table({"shard": _pa.array([f"part-{key}.{ext}"]),
                          "n_triples": _pa.array([len(lines)],
                                                 _pa.int64())})

    src = (linked_triples_dataset(pages, xref_ref) if quads
           else deduped_triples_dataset(pages, xref_ref))
    manifest = src.map_batches(write_shard, batch_format="pyarrow")
    # two identical-payload blocks content-address to the SAME file but
    # would append two manifest rows, double-counting shards/triples —
    # collapse by shard name (the manifest is tiny: one row per block)
    from ray.data.aggregate import Max
    return (manifest.groupby("shard")
            .aggregate(Max("n_triples", alias_name="n_triples")))
