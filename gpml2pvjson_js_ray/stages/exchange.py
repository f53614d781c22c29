"""Object-store shuffle exchange: the repo's hand-rolled map/reduce for
wide operators whose key space is a SMALL KNOWN set of hash buckets.

Why not `Dataset.groupby`: Ray Data's generic groupby is a sort shuffle
with multi-second fixed latency regardless of data size (measured in
round 1 — ~8 s on 650k rows at any CPU count). When the partitioning key
is a bucket id we computed ourselves, the exchange reduces to the classic
two-stage Ray shuffle (the pattern Exoshuffle/Ray's own sort use): one
*split* task per upstream block returns one compact slice per bucket
(`num_returns=Σ buckets`; small slices ship inline through the owner),
and one *reduce* task per bucket concatenates its slices and finalizes.
Everything stays in the object store — zero-copy Arrow, no parquet
encode/decode round-trip, no shared filesystem requirement — so unlike
round 1's /dev/shm hive-write exchange this shape runs unchanged on a
multi-node cluster (the object store handles cross-node transfer and
spills under pressure).

The exchange is STREAMING on the map side: `StreamingExchange` accepts
blocks from any number of concurrently executing Dataset pipelines
(`add_dataset`) and/or already-checkpointed parquet files (`add_files`),
submitting split tasks as blocks appear — so the split wave overlaps the
producing pipeline and only the reduce tail is exposed wall-clock. Every
reduce needs every split's output (an inherent barrier), so reduces are
submitted at `finish()`.

Scale sizing: reduce fan-out equals `num_buckets`, so buckets must be
≫ cores (`auto_num_buckets`). Each reduce materializes one bucket; at
very large inputs raise `num_buckets` so one bucket ≈ 1-4 GiB of Arrow
(num_buckets ≈ input_bytes / 2 GiB), and at 10^12-row scale where split
counts explode, coalesce upstream blocks (split fan-in is per-block, not
per-row) or tree-reduce per bucket.

Vectorized bucket hashing lives here too (`hash_rows_mod`): polars
`hash_rows` (xxhash) over the key columns — no Python row loops in the
exchange path (round-1 verdict's top scaling lever).
"""

from __future__ import annotations

import threading
from typing import Callable

import numpy as np
import pyarrow as pa


def auto_num_buckets(multiple: int = 4, floor: int = 64) -> int:
    """Bucket count ≫ cores so the reduce side never caps parallelism."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(floor, multiple * cpus)


def polars_capped():
    """Import polars with its rayon pool capped for worker processes: each
    Ray worker would otherwise spawn a logical-CPU-sized thread pool
    (32 threads × dozens of workers thrashes the box; tasks here are
    already process-parallel). Must run before polars' first import in
    the process; no-op when polars is already loaded."""
    import os
    import sys
    if "polars" not in sys.modules:
        os.environ.setdefault("POLARS_MAX_THREADS", "2")
    import polars as pl
    return pl


def hash_rows_mod(batch: pa.Table, cols: list[str], mod: int) -> np.ndarray:
    """Vectorized row hash of `cols` modulo `mod` (int64 numpy array).
    Deterministic within a run; bucket layout is internal, so cross-version
    hash stability is not required."""
    pl = polars_capped()
    h = pl.from_arrow(batch.select(cols)).hash_rows(seed=0)
    return (h % mod).cast(pl.Int64).to_numpy()


def _split_table(t: pa.Table, buckets: np.ndarray, num_buckets: int):
    """Slice a table into per-bucket COMPACT tables (one take per bucket —
    a sort + zero-copy slice() would be cheaper, but each slice pins and
    re-serializes the block's FULL buffers: ~200× the exchange bytes)."""
    if t.num_rows == 0:
        return [t] * num_buckets
    order = np.argsort(buckets, kind="stable")
    bounds = np.searchsorted(buckets[order], np.arange(num_buckets + 1))
    return [t.take(pa.array(order[bounds[i]:bounds[i + 1]]))
            for i in range(num_buckets)]


def _cap_worker_threads() -> None:
    """Raw Ray tasks run in plain worker processes where Arrow's default
    thread pools are logical-CPU-sized; with dozens of 1-CPU tasks in
    flight that multiplies into thousands of threads. Cap per process
    (idempotent, cheap)."""
    try:
        if pa.cpu_count() > 2:
            pa.set_cpu_count(2)
        if pa.io_thread_count() > 4:
            pa.set_io_thread_count(4)
    except Exception:
        pass


def _split_multi(block, map_fns, bucket_counts):
    """Split task: runs every spec's map_fn (combiner + bucket assignment)
    on one upstream block and returns spec-0's bucket slices, then
    spec-1's, ... (num_returns = sum(bucket_counts)). Blocks may arrive as
    pandas (e.g. from_pandas datasets) — normalized to Arrow."""
    _cap_worker_threads()
    if not isinstance(block, pa.Table):
        block = pa.Table.from_pandas(block, preserve_index=False)
    outs: list = []
    for map_fn, nb in zip(map_fns, bucket_counts):
        t = map_fn(block)
        buckets = t.column("bucket").to_numpy()
        t = t.drop_columns(["bucket"])
        outs.extend(_split_table(t, buckets, nb))
    return tuple(outs) if len(outs) > 1 else outs[0]


def _split_files(paths: list[str], map_fns, bucket_counts):
    """File-input split task: one read of the file group feeds every
    spec's bucket computation."""
    import pyarrow.parquet as pq
    block = pa.concat_tables([pq.read_table(p) for p in paths])
    return _split_multi(block, map_fns, bucket_counts)


_REDUCE_CHUNK = 32  # max tables concatenated at once inside a reduce


def _reduce_bucket(reduce_fn, combine_fn, bucket_id: int, *parts: pa.Table):
    """Final per-bucket reduce. When the bucket arrives as many slices and
    the spec has an associative combine_fn (dedup/merge = shrinking), fold
    chunk-by-chunk instead of one giant concat_tables: the task then never
    holds the full RAW bucket in memory, only the folded partials plus one
    chunk — the documented fallback for buckets far above the 1-4 GiB
    sizing rule. Chunked folding preserves first-occurrence order within
    the bucket, so outputs are byte-identical to the single-concat path
    (covered by tests forcing a tiny _REDUCE_CHUNK)."""
    _cap_worker_threads()
    tables = [p for p in parts if p.num_rows > 0]
    if not tables:
        return reduce_fn(parts[0], bucket_id)
    if combine_fn is not None and len(tables) > _REDUCE_CHUNK:
        while len(tables) > _REDUCE_CHUNK:
            tables = [combine_fn(pa.concat_tables(
                tables[j:j + _REDUCE_CHUNK]))
                for j in range(0, len(tables), _REDUCE_CHUNK)]
    return reduce_fn(pa.concat_tables(tables), bucket_id)


def _combine_parts(combine_fn, *parts: pa.Table) -> pa.Table:
    """Associative partial reduce of one bucket's accumulated slices
    (dedup/merge shrink as they go; the final reduce then touches a
    fraction of the slices)."""
    _cap_worker_threads()
    tables = [p for p in parts if p.num_rows > 0]
    if not tables:
        return parts[0]
    return combine_fn(pa.concat_tables(tables))


_COMBINE_FANIN = 16  # partial-combine a bucket once this many slices pile up


def iter_streaming_block_refs(ds, use_internal: bool | None = None):
    """Yield (block_ref, holder) pairs from a Dataset's streaming
    execution. Preferred path: the internal ref-bundle iterator (zero-copy
    block refs as the executor produces them; `holder` keeps the bundle
    alive until its split task has consumed the block). Fallback when that
    private API is absent or disabled: the PUBLIC iter_batches, re-blocked
    into the object store via ray.put (one extra copy per block — the
    price of not depending on Ray internals; task-argument refcounting
    keeps the put refs alive). A Ray upgrade that drops
    iter_internal_ref_bundles therefore degrades performance, not
    correctness."""
    it = None
    if use_internal is not False:
        try:
            it = ds.iter_internal_ref_bundles()
        except AttributeError:
            it = None
    if it is not None:
        for bundle in it:
            for block_ref in bundle.block_refs:
                yield block_ref, bundle
        return
    import ray
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        yield ray.put(batch), None


class StreamingExchange:
    """Multi-spec object-store exchange with a streaming map side.

    specs: list of {"num_buckets", "map_fn", "reduce_fn"} and optionally
    "combine_fn" — see module docstring. A combine_fn (an ASSOCIATIVE
    partial reduce: pa.Table -> pa.Table, e.g. within-batch dedup or
    partial merge) lets the exchange fold each bucket's slices
    incrementally WHILE the map side still streams, so the post-barrier
    reduce tail only touches ~1/_COMBINE_FANIN of the slices. Feed inputs
    with add_dataset / add_files (thread-safe; the kg pipeline calls
    add_dataset from concurrent partition threads), then call finish()
    once to run the reduces and collect per-spec results.
    """

    def __init__(self, specs: list[dict]):
        import ray
        self.specs = specs
        self._bucket_counts = [s["num_buckets"] for s in specs]
        total = sum(self._bucket_counts)
        self._split_block = ray.remote(num_cpus=1,
                                       num_returns=total)(_split_multi)
        self._split_files = ray.remote(num_cpus=1,
                                       num_returns=total)(_split_files)
        self._combine = ray.remote(num_cpus=1)(_combine_parts)
        self._map_fns_ref = ray.put([s["map_fn"] for s in specs])
        self._combine_refs = [
            ray.put(s["combine_fn"]) if s.get("combine_fn") else None
            for s in specs]
        # per spec, per bucket: list of pending slice refs
        self._bucket_refs: list[list[list]] = [
            [[] for _ in range(nb)] for nb in self._bucket_counts]
        self._lock = threading.Lock()
        # (bundle, probe_ref) pairs: bundle refs are held only until their
        # split task has consumed the block, then released — the exchange
        # never pins the whole upstream dataset in the object store
        self._pending: list[tuple] = []

    def _record(self, refs) -> None:
        refs = refs if isinstance(refs, list) else [refs]
        offset = 0
        for i, nb in enumerate(self._bucket_counts):
            for b in range(nb):
                slot = self._bucket_refs[i][b]
                slot.append(refs[offset + b])
                if (self._combine_refs[i] is not None
                        and len(slot) >= _COMBINE_FANIN):
                    folded = self._combine.remote(
                        self._combine_refs[i], *slot)
                    slot.clear()
                    slot.append(folded)
            offset += nb

    def _prune_pending(self) -> None:
        import ray
        if not self._pending:
            return
        ready, _ = ray.wait([probe for _, probe in self._pending],
                            num_returns=len(self._pending), timeout=0,
                            fetch_local=False)
        done = set(ready)
        self._pending = [(b, p) for b, p in self._pending
                         if p not in done]

    def add_dataset(self, ds, use_internal: bool | None = None) -> None:
        """Consume a Dataset's blocks as its streaming execution produces
        them, submitting one split task per block."""
        for block_ref, holder in iter_streaming_block_refs(ds, use_internal):
            refs = self._split_block.remote(
                block_ref, self._map_fns_ref, self._bucket_counts)
            with self._lock:
                self._record(refs)
                probe = (refs if isinstance(refs, list)
                         else [refs])[0]
                self._pending.append((holder, probe))
                self._prune_pending()

    def add_files(self, files: list[str],
                  files_per_task: int | None = None) -> None:
        """Submit split tasks over already-written parquet files (e.g.
        resume-skipped partitions) — no Dataset execution involved."""
        import ray
        if not files:
            return
        if files_per_task is None:
            try:
                cpus = int(ray.cluster_resources().get("CPU", 8))
            except Exception:
                cpus = 8
            files_per_task = max(1, round(len(files) / (2 * cpus)))
        for i in range(0, len(files), files_per_task):
            refs = self._split_files.remote(
                files[i:i + files_per_task], self._map_fns_ref,
                self._bucket_counts)
            with self._lock:
                self._record(refs)

    def finish(self) -> list[list]:
        """Submit one reduce per bucket per spec (each needs every split's
        slice for that bucket — by now mostly pre-folded partials) and
        return per-spec reduce results."""
        import ray
        reduce = ray.remote(num_cpus=1)(_reduce_bucket)
        futures_per_spec = []
        for i, spec in enumerate(self.specs):
            if not any(self._bucket_refs[i]):
                futures_per_spec.append([])
                continue
            reduce_fn_ref = ray.put(spec["reduce_fn"])
            futures_per_spec.append([
                reduce.remote(reduce_fn_ref, self._combine_refs[i], b,
                              *self._bucket_refs[i][b])
                for b in range(spec["num_buckets"])])
        results = [ray.get(futs) if futs else []
                   for futs in futures_per_spec]
        self._pending.clear()
        return results


def shuffle_reduce_multi(ds, specs: list[dict]) -> list[list]:
    """One-shot multi-spec exchange over a single Dataset."""
    ex = StreamingExchange(specs)
    ex.add_dataset(ds)
    return ex.finish()


def shuffle_reduce_files(files: list[str], specs: list[dict],
                         files_per_task: int | None = None) -> list[list]:
    """One-shot multi-spec exchange over parquet files (no Dataset)."""
    ex = StreamingExchange(specs)
    ex.add_files(files, files_per_task)
    return ex.finish()


def shuffle_reduce(ds, *, num_buckets: int,
                   map_fn: Callable[[pa.Table], pa.Table],
                   reduce_fn: Callable[[pa.Table, int], object],
                   combine_fn: Callable[[pa.Table], pa.Table] | None = None
                   ) -> list:
    """Single-exchange convenience wrapper."""
    return shuffle_reduce_multi(
        ds, [{"num_buckets": num_buckets, "map_fn": map_fn,
              "reduce_fn": reduce_fn, "combine_fn": combine_fn}])[0]
