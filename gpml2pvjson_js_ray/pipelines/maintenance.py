"""Table-maintenance operators: small-file compaction and snapshot diff.

Beyond-reference extensions (SURVEY.md §2): the two jobs every long-lived
100-TB parquet lake needs between processing runs.

`compact_parquet` is the small-file coalescing pass: a crawl that
checkpoints write-through (stages/convert.py) or resumes often leaves
thousands of KB-scale files; readers then pay per-file open/stat costs
that dwarf the scan. Compaction re-blocks the table to a byte-size
target computed from file METADATA only (no data read on the driver),
streams the rows through a shuffle-free `repartition`, and publishes
atomically (tmp dir + rename — same contract as the ANN index builders
in pipelines/simops.py), so a crashed compaction never corrupts the
live table and a concurrent reader sees old or new, never half.

`documents_snapshot_diff` is the snapshot-to-snapshot change report
(added / deleted / changed row keys) that incremental pipelines use to
scope work. The second snapshot is DERIVED deterministically from the
first (modular arithmetic on doc_id — no external data, same rule the
DuckDB oracle applies), and the diff itself is the scale shape that
matters: tag each side, union, hash-bucket by key so ONE exchange
co-locates both versions of every key, classify vectorized per bucket.
Never a driver-side anti-join, never a full sort.
"""

from __future__ import annotations

import math
import os
import shutil

import numpy as np
import pyarrow as pa

_COMPACT_ROOT = "/tmp/gpml2pvjson_compact"


def _atomic_publish(tmp_dir: str, out_dir: str) -> None:
    """Publish a fully-written tmp dir under its final name atomically.
    Loses the tmp copy ONLY when a concurrent builder already published
    `out_dir` (content-addressed dirs ⇒ identical content); any other
    rename failure (permissions, cross-device roots) re-raises with the
    real cause instead of silently deleting the just-written data."""
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        if os.path.isdir(out_dir):
            shutil.rmtree(tmp_dir, ignore_errors=True)
        else:
            raise

# documents_snapshot_diff's deterministic second snapshot, shared with
# the SQL oracle: delete doc_id%17==3, rewrite text of doc_id%13==1,
# add a fresh doc (key offset +1000000) for doc_id%29==0.
_DIFF_DEL_MOD, _DIFF_DEL_REM = 17, 3
_DIFF_CHG_MOD, _DIFF_CHG_REM = 13, 1
_DIFF_ADD_MOD, _DIFF_ADD_REM = 29, 0
_DIFF_ADD_OFFSET = 1_000_000


def compact_parquet(input_path: str, out_dir: str,
                    target_bytes: int = 128 << 20) -> dict:
    """Coalesce a parquet table into ~target_bytes files; returns a
    manifest dict. Output block count is computed from input file sizes
    (driver reads METADATA only), so the plan is fixed before any data
    moves; `repartition(n)` without shuffle is a streaming split/merge,
    not an all-to-all. Publish is atomic (write to `<out>.tmp`, rename);
    if `out_dir` already exists it is reused as-is (content-addressed
    caching is the caller's concern — key the dir by input + target)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    d = pads.dataset(input_path)
    infos = d.filesystem.get_file_info(list(d.files))
    input_bytes = sum(i.size for i in infos)
    n_out = max(1, math.ceil(input_bytes / target_bytes))

    if not os.path.isdir(out_dir):
        tmp_dir = out_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        rd.read_parquet(input_path).repartition(n_out).write_parquet(tmp_dir)
        _atomic_publish(tmp_dir, out_dir)

    out_files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    return {
        "out_dir": out_dir,
        "n_input_files": len(infos),
        "n_output_files": len(out_files),
        "input_bytes": input_bytes,
        "target_bytes": target_bytes,
        "planned_output_files": n_out,
    }


def documents_compact(sf_dir: str, target_bytes: int = 256 << 10):
    """Compact the documents table, then read the COMPACTED copy back and
    return its full contents ordered by doc_id — the oracle equality
    against a plain `SELECT … ORDER BY doc_id` over the ORIGINAL table is
    the losslessness proof (every row, every column, bit-identical
    through the rewrite)."""
    import hashlib

    import ray.data as rd

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.sha1(
        f"{os.path.abspath(src)}|{os.path.getmtime(src)}|{target_bytes}"
        .encode()).hexdigest()[:16]
    out_dir = os.path.join(_COMPACT_ROOT, key)
    os.makedirs(_COMPACT_ROOT, exist_ok=True)
    compact_parquet(src, out_dir, target_bytes=target_bytes)
    return (rd.read_parquet(out_dir)
            .select_columns(["doc_id", "text", "lang", "source", "n_chars"])
            .sort("doc_id"))


SQL_DOCUMENTS_COMPACT = """
SELECT doc_id, text, lang, source, n_chars
FROM documents ORDER BY doc_id
"""


def documents_snapshot_diff(sf_dir: str, num_buckets: int = 32):
    """Diff two table snapshots by key: (doc_id, change) with change in
    {'added','deleted','changed'}; unchanged keys emit nothing.

    Scale shape: each side is tagged with a version column; the union is
    hash-bucketed on doc_id (vectorized `hash_rows_mod`) so a single
    groupby exchange co-locates both versions of every key, and each
    bucket classifies ALL its keys in one vectorized polars pass (counts
    per version + text equality) — cost is one exchange over (key, text)
    pairs regardless of corpus size, and the usual regime (tiny diff)
    returns a tiny table. The second snapshot is derived from the first
    by the deterministic rule in the module docstring."""
    from ..stages.exchange import hash_rows_mod, polars_capped

    import ray.data as rd

    base = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])

    def derive_v2(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        f = pl.from_arrow(b)
        kept = (f.filter(pl.col("doc_id") % _DIFF_DEL_MOD != _DIFF_DEL_REM)
                .with_columns(
                    text=pl.when(pl.col("doc_id") % _DIFF_CHG_MOD
                                 == _DIFF_CHG_REM)
                    .then(pl.col("text") + pl.lit(" v2"))
                    .otherwise(pl.col("text"))))
        added = (f.filter(pl.col("doc_id") % _DIFF_ADD_MOD == _DIFF_ADD_REM)
                 .with_columns(
                     doc_id=pl.col("doc_id") + _DIFF_ADD_OFFSET,
                     text=pl.lit("new ") + pl.col("text")))
        return pl.concat([kept, added]).to_arrow().cast(b.schema)

    def tag(version: int):
        def fn(b: pa.Table) -> pa.Table:
            b = b.append_column(
                "version", pa.array(np.full(b.num_rows, version,
                                            dtype=np.int8)))
            return b.append_column(
                "bucket",
                pa.array(hash_rows_mod(b, ["doc_id"], num_buckets)))
        return fn

    v0 = base.map_batches(tag(0), batch_format="pyarrow")
    v1 = (base.map_batches(derive_v2, batch_format="pyarrow")
          .map_batches(tag(1), batch_format="pyarrow"))

    def classify(g: pa.Table) -> pa.Table:
        pl = polars_capped()
        f = pl.from_arrow(g.select(["doc_id", "text", "version"]))
        agg = (f.group_by("doc_id").agg(
            t0=pl.col("text").filter(pl.col("version") == 0).first(),
            n0=(pl.col("version") == 0).sum(),
            t1=pl.col("text").filter(pl.col("version") == 1).first(),
            n1=(pl.col("version") == 1).sum()))
        out = (agg.with_columns(
            change=pl.when(pl.col("n0") == 0).then(pl.lit("added"))
            .when(pl.col("n1") == 0).then(pl.lit("deleted"))
            .when(pl.col("t0") != pl.col("t1")).then(pl.lit("changed"))
            .otherwise(pl.lit(None)))
            .drop_nulls("change").select("doc_id", "change"))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("change", pa.string())]))

    return (v0.union(v1)
            .groupby("bucket")
            .map_groups(classify, batch_format="pyarrow")
            .sort("doc_id"))


SQL_DOCUMENTS_SNAPSHOT_DIFF = f"""
WITH v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % {_DIFF_CHG_MOD} = {_DIFF_CHG_REM}
              THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % {_DIFF_DEL_MOD} <> {_DIFF_DEL_REM}
  UNION ALL
  SELECT doc_id + {_DIFF_ADD_OFFSET} AS doc_id, 'new ' || text AS text
  FROM documents WHERE doc_id % {_DIFF_ADD_MOD} = {_DIFF_ADD_REM}
),
j AS (
  SELECT coalesce(b.doc_id, v.doc_id) AS doc_id, b.text AS t0, v.text AS t1
  FROM documents b FULL OUTER JOIN v2 v ON b.doc_id = v.doc_id
)
SELECT doc_id,
       CASE WHEN t0 IS NULL THEN 'added'
            WHEN t1 IS NULL THEN 'deleted'
            ELSE 'changed' END AS change
FROM j WHERE t0 IS NULL OR t1 IS NULL OR t0 <> t1
ORDER BY doc_id
"""


# documents_source_report_incremental's deterministic base/increment
# split, shared with the reasoning in its docstring: the "previous
# crawl" is doc_id % 5 != INC_REM, the "new batch" is the rest.
_INC_MOD, _INC_REM = 5, 0
_VIEW_ROOT = "/tmp/gpml2pvjson_matview"


def documents_source_report_incremental(sf_dir: str):
    """Incremental materialized-view maintenance for the per-source
    report card: the base crawl's (source, lang) SUFFICIENT STATISTICS
    (count + char-sum — associative, mergeable) are materialized once
    to parquet; the new batch computes ONLY its own partials and one
    tiny groupby merges state + delta before the driver-side finalize.
    The base corpus is never re-read on update — the cost of refresh
    is O(increment) plus an exchange bounded by |sources|×|langs|.

    The DuckDB oracle is the PLAIN full-table source report
    (SQL_DOCUMENTS_SOURCE_REPORT_INCREMENTAL == same query as
    documents_source_report): merged-state == full-recompute is
    exactly the correctness claim of incremental view maintenance.
    Base/increment split is deterministic (doc_id % 5)."""
    import hashlib

    import ray.data as rd

    from .relational import source_report_finalize, source_report_partial
    from ray.data.aggregate import Sum

    src_path = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.sha1(
        f"{os.path.abspath(src_path)}|{os.path.getmtime(src_path)}"
        f"|src_report|{_INC_MOD}|{_INC_REM}".encode()).hexdigest()[:16]
    state_dir = os.path.join(_VIEW_ROOT, key)
    os.makedirs(_VIEW_ROOT, exist_ok=True)

    def read_side(increment: bool):
        def pick(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % _INC_MOD) == _INC_REM
            return b.filter(pa.array(m if increment else ~m))
        return (rd.read_parquet(src_path,
                                columns=["doc_id", "source", "lang",
                                         "n_chars"])
                .map_batches(pick, batch_format="pyarrow")
                .map_batches(source_report_partial,
                             batch_format="pyarrow"))

    if not os.path.isdir(state_dir):
        tmp_dir = state_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        (read_side(increment=False)
         .groupby(["source", "lang"])
         .aggregate(Sum("n", alias_name="n"),
                    Sum("chars", alias_name="chars"))
         .write_parquet(tmp_dir))
        _atomic_publish(tmp_dir, state_dir)

    merged = (rd.read_parquet(state_dir)
              .union(read_side(increment=True))
              .groupby(["source", "lang"])
              .aggregate(Sum("n", alias_name="n"),
                         Sum("chars", alias_name="chars"))
              .to_pandas())
    return source_report_finalize(merged)


# merged-state == full-recompute IS the incremental-maintenance claim,
# so the oracle is literally the one-shot report's SQL.
def _sql_source_report():
    from .relational import SQL_DOCUMENTS_SOURCE_REPORT
    return SQL_DOCUMENTS_SOURCE_REPORT


# -- CDC merge (MERGE INTO apply) ---------------------------------------------

# documents_merge_upsert's deterministic change feed, shared with the
# SQL oracle: DELETE doc_id%11==5; UPDATE doc_id%7==2 (text -> 'upd '||text);
# INSERT a fresh key for doc_id%23==4 with key -(doc_id+1) — the
# NEGATIVE key space is structurally disjoint from base ids (which are
# non-negative at every corpus size), so an insert can never collide
# with a live row no matter the scale (a +OFFSET scheme would collide
# once max(doc_id) crosses the offset, silently folding two rows where
# the oracle emits both). One op per key: DELETE wins over UPDATE.
_M_DEL_MOD, _M_DEL_REM = 11, 5
_M_UPD_MOD, _M_UPD_REM = 7, 2
_M_INS_MOD, _M_INS_REM = 23, 4


def documents_merge_upsert(sf_dir: str, num_buckets: int = 32):
    """Apply a CDC change feed (insert / update / delete ops keyed by
    doc_id) to a base snapshot — the MERGE INTO of a streaming lakehouse
    ingest, the third leg of the table-maintenance trio next to
    compaction and snapshot diff.

    Scale shape: base rows and op rows are tagged with a src column
    (0=base, 1=upsert, 2=delete) and unioned; ONE hash-bucket exchange
    on the key co-locates every key's base row with its op, and each
    bucket resolves vectorized in polars (delete drops, upsert
    overrides, insert is an upsert with no base row — the classic
    last-writer-wins fold). Never a driver-side join; the exchange
    carries (key, text) rows once. The change feed is derived
    deterministically from the base by the module-constant rules (no
    external data), which is also exactly what the DuckDB oracle
    applies — merged output == SQL MERGE semantics IS the claim."""
    import ray.data as rd

    from ..stages.exchange import hash_rows_mod, polars_capped

    src = os.path.join(sf_dir, "documents.parquet")
    base = rd.read_parquet(src, columns=["doc_id", "text"])

    def expand(b: pa.Table) -> pa.Table:
        # ONE pass emits base rows AND their derived change-feed rows
        # (src 0=base, 1=upsert, 2=delete) — the table is read once
        pl = polars_capped()
        f = pl.from_arrow(b).with_columns(src=pl.lit(0, dtype=pl.Int8))
        dels = (f.filter(pl.col("doc_id") % _M_DEL_MOD == _M_DEL_REM)
                .with_columns(text=pl.lit(None, dtype=pl.String),
                              src=pl.lit(2, dtype=pl.Int8)))
        upds = (f.filter((pl.col("doc_id") % _M_UPD_MOD == _M_UPD_REM)
                         & (pl.col("doc_id") % _M_DEL_MOD != _M_DEL_REM))
                .with_columns(text=pl.lit("upd ") + pl.col("text"),
                              src=pl.lit(1, dtype=pl.Int8)))
        ins = (f.filter(pl.col("doc_id") % _M_INS_MOD == _M_INS_REM)
               .with_columns(doc_id=-(pl.col("doc_id") + 1),
                             text=pl.lit("ins ") + pl.col("text"),
                             src=pl.lit(1, dtype=pl.Int8)))
        out = pl.concat([f, dels, upds, ins]).to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("text", pa.string()),
            ("src", pa.int8())]))
        return out.append_column(
            "bucket", pa.array(hash_rows_mod(out, ["doc_id"],
                                             num_buckets)))

    def resolve(g: pa.Table) -> pa.Table:
        pl = polars_capped()
        f = pl.from_arrow(g.select(["doc_id", "text", "src"]))
        agg = (f.group_by("doc_id").agg(
            deleted=(pl.col("src") == 2).any(),
            utext=pl.col("text").filter(pl.col("src") == 1).first(),
            btext=pl.col("text").filter(pl.col("src") == 0).first()))
        out = (agg.filter(~pl.col("deleted"))
               .with_columns(text=pl.coalesce(pl.col("utext"),
                                              pl.col("btext")))
               .select("doc_id", "text"))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("text", pa.string())]))

    return (base.map_batches(expand, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(resolve, batch_format="pyarrow")
            .sort("doc_id"))


SQL_DOCUMENTS_MERGE_UPSERT = f"""
WITH upd AS (
  SELECT doc_id, 'upd ' || text AS text FROM documents
  WHERE doc_id % {_M_UPD_MOD} = {_M_UPD_REM}
    AND doc_id % {_M_DEL_MOD} <> {_M_DEL_REM}
), ins AS (
  SELECT -(doc_id + 1) AS doc_id, 'ins ' || text AS text
  FROM documents WHERE doc_id % {_M_INS_MOD} = {_M_INS_REM}
)
SELECT doc_id, text FROM (
  SELECT b.doc_id, coalesce(u.text, b.text) AS text
  FROM documents b LEFT JOIN upd u ON b.doc_id = u.doc_id
  WHERE b.doc_id % {_M_DEL_MOD} <> {_M_DEL_REM}
  UNION ALL
  SELECT doc_id, text FROM ins)
ORDER BY doc_id
"""


# -- Z-order clustering (multi-column data layout) -----------------------------

_ZORDER_ROOT = "/tmp/gpml2pvjson_zorder"


def _interleave16(a_code: np.ndarray, b_code: np.ndarray) -> np.ndarray:
    """Bit-interleave two uint16 code arrays into one uint32 z-value
    (Morton order), fully vectorized: spread each 16-bit code to even
    bit positions with the classic mask ladder, OR the second shifted."""
    def spread(x: np.ndarray) -> np.ndarray:
        x = x.astype(np.uint64)
        x = (x | (x << 8)) & np.uint64(0x00FF00FF)
        x = (x | (x << 4)) & np.uint64(0x0F0F0F0F)
        x = (x | (x << 2)) & np.uint64(0x33333333)
        x = (x | (x << 1)) & np.uint64(0x55555555)
        return x
    return (spread(a_code) | (spread(b_code) << np.uint64(1))) \
        .astype(np.int64)


def zorder_parquet(input_path: str, out_dir: str, col_a: str, col_b: str,
                   num_files: int = 16) -> dict:
    """Rewrite a parquet table clustered by the Z-ORDER (Morton curve)
    of two columns — the multi-dimensional layout optimization (Delta
    OPTIMIZE ZORDER BY) that makes file-level min/max pruning effective
    on BOTH columns at once, where a plain sort serves only its leading
    column.

    Scale shape: pass 1 reads ONLY the two cluster columns' min/max
    from parquet row-group METADATA (no data scan) to fix the global
    code scale; pass 2 maps each row's (a, b) to 16-bit range codes,
    interleaves bits vectorized (one mask ladder per batch), SORTS by
    the z-value (the one all-to-all — a range exchange, same cost as
    any layout rewrite), and writes ~num_files files atomically
    (tmp + rename, the compaction contract). Returns a manifest with
    per-file min/max spans of both columns so callers (and the pruning
    test) can measure clustering quality."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd

    def _rg_stats(md, col: str):
        """Row-group min/max for a top-level column, looked up by LEAF
        path name — row-group metadata columns are flattened leaves, so
        a top-level Arrow field index would hit the wrong column as
        soon as any nested column precedes the cluster columns."""
        for rg in range(md.num_row_groups):
            for j in range(md.row_group(rg).num_columns):
                c = md.row_group(rg).column(j)
                if c.path_in_schema.split(".")[0] == col:
                    st = c.statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(
                            f"zorder_parquet needs min/max statistics "
                            f"for column {col!r} (writer disabled them)")
                    yield st

    d = pads.dataset(input_path)
    lo_a = lo_b = np.inf
    hi_a = hi_b = -np.inf
    for frag in d.get_fragments():
        md = frag.metadata
        for st in _rg_stats(md, col_a):
            lo_a, hi_a = min(lo_a, st.min), max(hi_a, st.max)
        for st in _rg_stats(md, col_b):
            lo_b, hi_b = min(lo_b, st.min), max(hi_b, st.max)
    span_a = (hi_a - lo_a) or 1.0
    span_b = (hi_b - lo_b) or 1.0

    def add_z(b: pa.Table) -> pa.Table:
        a = b.column(col_a).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        c = b.column(col_b).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        code_a = np.clip((a - lo_a) / span_a * 65535.0, 0, 65535) \
            .astype(np.uint16)
        code_b = np.clip((c - lo_b) / span_b * 65535.0, 0, 65535) \
            .astype(np.uint16)
        return b.append_column("_z", pa.array(_interleave16(code_a,
                                                            code_b)))

    if not os.path.isdir(out_dir):
        tmp_dir = out_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        (rd.read_parquet(input_path)
         .map_batches(add_z, batch_format="pyarrow")
         .sort("_z")
         .repartition(num_files)
         .drop_columns(["_z"])
         .write_parquet(tmp_dir))
        _atomic_publish(tmp_dir, out_dir)

    spans = []
    for fn in sorted(os.listdir(out_dir)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(out_dir, fn))
        mins = {col_a: np.inf, col_b: np.inf}
        maxs = {col_a: -np.inf, col_b: -np.inf}
        for col in (col_a, col_b):
            for st in _rg_stats(md, col):
                mins[col] = min(mins[col], st.min)
                maxs[col] = max(maxs[col], st.max)
        spans.append({"file": fn,
                      f"{col_a}_min": mins[col_a],
                      f"{col_a}_max": maxs[col_a],
                      f"{col_b}_min": mins[col_b],
                      f"{col_b}_max": maxs[col_b]})
    return {"out_dir": out_dir, "n_files": len(spans), "files": spans,
            "bounds": {col_a: (lo_a, hi_a), col_b: (lo_b, hi_b)}}


def events_zorder(sf_dir: str, num_files: int = 16):
    """Z-order the events table by (user_id, value), read the clustered
    copy back and return it ordered by event_id — the oracle equality
    against a plain `SELECT … ORDER BY event_id` over the ORIGINAL table
    is the losslessness proof (the layout rewrite loses and changes
    nothing). The clustering QUALITY (min/max pruning on both columns)
    is pinned by the pytest over `zorder_parquet`'s span manifest."""
    import hashlib

    import ray.data as rd

    src = os.path.join(sf_dir, "events.parquet")
    key = hashlib.sha1(
        f"{os.path.abspath(src)}|{os.path.getmtime(src)}|zorder"
        f"|{num_files}".encode()).hexdigest()[:16]
    out_dir = os.path.join(_ZORDER_ROOT, key)
    os.makedirs(_ZORDER_ROOT, exist_ok=True)
    zorder_parquet(src, out_dir, "user_id", "value", num_files=num_files)
    return (rd.read_parquet(out_dir)
            .select_columns(["event_id", "ts", "user_id", "event_type",
                             "value", "props"])
            .sort("event_id"))


SQL_EVENTS_ZORDER = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events ORDER BY event_id
"""


# -- vacuum: reclaim orphaned data files -------------------------------------

def vacuum_orphans(data_dir: str, manifest_files, *,
                   suffixes: tuple[str, ...] = (".parquet", ".nt", ".nq"),
                   dry_run: bool = False) -> "pa.Table":
    """Delete data files in `data_dir` that no manifest references —
    the lakehouse VACUUM: content-addressed writers (the docs
    checkpoints, the N-Triples shards, compact/zorder outputs) are
    idempotent but a writer that died between write and manifest
    commit, or a re-run after a code change that shifted block
    boundaries, leaves orphan files that never get read again yet cost
    storage and list() time forever at 10^12-document scale.

    Safety rules (each one is the difference between VACUUM and rm):
    - only files with a known data suffix are candidates — manifests,
      `_manifest/` state and dotfiles are never touched;
    - in-flight `.tmp` files are skipped (the atomic-publish writers
      rename over them; a concurrent writer's tmp is not an orphan);
    - `dry_run=True` reports without deleting — run it first, always.

    Driver-side by design: the file LISTING (one row per file) is the
    small side at any scale — 10^12 docs in 256 MiB shards is ~10^6
    manifest rows per partition dir, listed once; the data bytes never
    move. Returns a table (file, size_bytes, action) sorted by file."""
    import glob as _glob

    keep = {os.path.basename(f) for f in manifest_files}
    files, sizes, actions = [], [], []
    for path in sorted(_glob.glob(os.path.join(data_dir, "*"))):
        name = os.path.basename(path)
        if not name.endswith(suffixes) or name.endswith(".tmp"):
            continue
        size = os.path.getsize(path)
        if name in keep:
            action = "kept"
        elif dry_run:
            action = "orphan"
        else:
            os.remove(path)
            action = "deleted"
        files.append(name)
        sizes.append(size)
        actions.append(action)
    return pa.table({"file": pa.array(files, pa.string()),
                     "size_bytes": pa.array(sizes, pa.int64()),
                     "action": pa.array(actions, pa.string())})
