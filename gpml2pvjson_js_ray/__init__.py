"""gpml2pvjson_js_ray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the query/data-processing capabilities of
wikipathways/gpml2pvjson-js (reference at /root/reference, read-only) as a
from-scratch Ray Data pipeline:

  pages (Parquet: url, warc_ts, html, text, lang)
    → island extraction (map_batches, Arrow)
    → GPML→pvjson conversion (map_batches; whole reference conversion
      semantics per island — see functions/)
    → (subj, pred, obj) triple emission (reference edge-type tables)
    → entity linking (actor pool, broadcast xref dictionary)
    → canonicalization (groupby on canonical id)
    → partitioned Parquet adjacency + JSON-LD documents

Layout:
  functions/  pure per-document conversion semantics (no Ray)
  sources/    synthetic page generation + readers
  stages/     Ray Data map_batches / actor-pool stages
  state/      lineage manifest, resume bookkeeping
  pipelines/  end-to-end composed pipelines
"""

__version__ = "0.1.0"


def _cap_native_thread_pools() -> None:
    """Cap per-process native thread pools at import time.

    Every Ray worker that unpickles one of this package's UDFs imports the
    package first, so this runs once in every worker process (and in the
    driver, where the same small caps are harmless). Without it each of N
    workers spawns logical-CPU-sized Arrow/OpenMP pools: measured on the
    bench corpus, 24 uncapped workers burned 1.53x the CPU of 6 (528 vs
    346 CPU-s for identical work) purely on pool thrash — capping
    recovered wall 23.2 s → 17.8 s at 24 CPUs. Workers are process-level
    parallel already; 2 threads per pool is plenty for intra-op spill.
    """
    import os

    # effective only if OpenMP hasn't started a parallel region yet in
    # this process — true for freshly forked Ray workers
    os.environ.setdefault("OMP_NUM_THREADS", "2")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "2")
    os.environ.setdefault("POLARS_MAX_THREADS", "2")
    try:
        import pyarrow as _pa
        if _pa.cpu_count() > 2:
            _pa.set_cpu_count(2)
        if _pa.io_thread_count() > 4:
            _pa.set_io_thread_count(4)
    except Exception:  # pragma: no cover - pyarrow always present here
        pass


_cap_native_thread_pools()
