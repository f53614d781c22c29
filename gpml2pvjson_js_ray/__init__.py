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
