"""Ray Data stages: exact triple dedup (D5) + canonical-entity unification
(A6) — the two wide shuffles of the KG pipeline.

Both follow the pre-aggregate pattern (ray_guide: combine inside
map_batches, then a small groupby): a within-batch combiner shrinks the
all-to-all exchange before the global `groupby`, which matters at 10^12-row
scale where the raw triple stream is orders of magnitude larger than the
distinct-key space.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

TRIPLE_KEY = ["canonical_subj", "pred", "canonical_obj"]


def dedup_triples_within_batch(batch: pa.Table) -> pa.Table:
    """Combiner: drop duplicate (s,p,o) rows inside one batch, keeping the
    lexically-smallest url for deterministic provenance."""
    if batch.num_rows == 0:
        return batch
    # sort by key+url, then keep the first row of each key run — fully
    # vectorized: adjacent-row inequality on each key column
    sort_keys = [(k, "ascending") for k in TRIPLE_KEY] + [("url", "ascending")]
    batch = batch.sort_by(sort_keys)
    n = batch.num_rows
    if n <= 1:
        return batch
    differs = None
    for k in TRIPLE_KEY:
        col = batch.column(k).combine_chunks()
        d = pc.not_equal(col.slice(1), col.slice(0, n - 1))
        differs = d if differs is None else pc.or_(differs, d)
    mask = pa.concat_arrays([pa.array([True]),
                             differs.combine_chunks()
                             if isinstance(differs, pa.ChunkedArray)
                             else differs])
    return batch.filter(mask)


NUM_DEDUP_BUCKETS = 64


def _add_spo_bucket(batch: pa.Table,
                    num_buckets: int = NUM_DEDUP_BUCKETS) -> pa.Table:
    import zlib
    s = batch.column("canonical_subj").to_pylist()
    p = batch.column("pred").to_pylist()
    o = batch.column("canonical_obj").to_pylist()
    buckets = [zlib.crc32(f"{a}\x00{b}\x00{c}".encode()) % num_buckets
               for a, b, c in zip(s, p, o)]
    return batch.append_column("spo_bucket",
                               pa.array(buckets, type=pa.int32()))


def dedup_triples_global(ds, num_buckets: int = NUM_DEDUP_BUCKETS):
    """Global exact dedup: hash-partition by a BUCKET of the (s,p,o) key
    (cardinality ≈ parallelism, not ≈ distinct keys — one map_groups call
    per bucket), then the vectorized within-batch dedup over each whole
    bucket. First-row-per-key is deterministic (min url)."""
    bucketed = ds.map_batches(
        lambda b: _add_spo_bucket(b, num_buckets), batch_format="pyarrow")

    def dedup_bucket(t: pa.Table) -> pa.Table:
        return dedup_triples_within_batch(t)

    out = bucketed.groupby("spo_bucket").map_groups(
        dedup_bucket, batch_format="pyarrow")
    return out.drop_columns(["spo_bucket"])


# ---------------------------------------------------------------------------
# canonical entity unification
# ---------------------------------------------------------------------------

MAX_ALIASES = 32  # cap alias payload per canonical id (hot entities)

ENTITY_PARTIAL_SCHEMA = pa.schema([
    ("canonical_id", pa.string()),
    ("aliases_json", pa.string()),
    ("n_mentions", pa.int64()),
    ("first_url", pa.string()),
])


def entity_partials_batch(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch partial aggregation of entity mentions keyed by
    canonical id (subject and object sides both contribute)."""
    acc: dict[str, dict] = {}
    for side, xref_side, node_side in (
            ("canonical_subj", "subj_xref", "subj_is_node"),
            ("canonical_obj", "obj_xref", "obj_is_node")):
        ids = batch.column(side).to_pylist()
        xrefs = batch.column(xref_side).to_pylist()
        urls = batch.column("url").to_pylist()
        nodes = batch.column(node_side).to_pylist()
        for cid, xref, url, is_node in zip(ids, xrefs, urls, nodes):
            if not cid or not (is_node or xref):
                continue  # literals (classes, citation ids) are not entities
            slot = acc.get(cid)
            if slot is None:
                slot = acc[cid] = {"aliases": set(), "n": 0, "url": url}
            slot["n"] += 1
            if xref:
                if len(slot["aliases"]) < MAX_ALIASES:
                    slot["aliases"].add(xref)
            if url < slot["url"]:
                slot["url"] = url
    return pa.Table.from_pydict({
        "canonical_id": list(acc.keys()),
        "aliases_json": [json.dumps(sorted(v["aliases"]))
                         for v in acc.values()],
        "n_mentions": [v["n"] for v in acc.values()],
        "first_url": [v["url"] for v in acc.values()],
    }, schema=ENTITY_PARTIAL_SCHEMA)


NUM_ENTITY_BUCKETS = 64


def merge_entity_partials(ds, num_buckets: int = NUM_ENTITY_BUCKETS):
    """Global merge: hash-partition canonical ids into buckets (one
    map_groups call per bucket, not per id), then a vectorized pandas
    groupby-agg inside each bucket. Deterministic: sorted alias union, sum
    of mentions, min first_url (SURVEY.md §2.5 A6)."""
    import zlib

    import pandas as pd

    def add_bucket(b: pa.Table) -> pa.Table:
        buckets = [zlib.crc32(v.encode()) % num_buckets
                   for v in b.column("canonical_id").to_pylist()]
        return b.append_column("entity_bucket",
                               pa.array(buckets, type=pa.int32()))

    def merge_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        def agg_aliases(blobs):
            aliases: set = set()
            for blob in blobs:
                aliases.update(json.loads(blob))
            return json.dumps(sorted(aliases)[:MAX_ALIASES])

        g = df.groupby("canonical_id", sort=False)
        out = g.agg(aliases_json=("aliases_json", agg_aliases),
                    n_mentions=("n_mentions", "sum"),
                    first_url=("first_url", "min")).reset_index()
        out["n_mentions"] = out["n_mentions"].astype("int64")
        return out

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    # merge_bucket's output frame already excludes the bucket column
    return bucketed.groupby("entity_bucket").map_groups(
        merge_bucket, batch_format="pandas")


def merge_entity_partials_fs(ds, out_dir: str,
                             num_buckets: int = NUM_ENTITY_BUCKETS) -> int:
    """Filesystem-exchange variant of the A6 merge (same trick as
    adjacency.write_adjacency_deduped): hive-partitioned write by entity
    bucket is the map-side exchange; one raw-Ray task per bucket does the
    vectorized merge. Returns the merged entity count."""
    import os
    import shutil
    import zlib

    import pandas as pd
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray

    def add_bucket(b: pa.Table) -> pa.Table:
        buckets = [zlib.crc32(v.encode()) % num_buckets
                   for v in b.column("canonical_id").to_pylist()]
        return b.append_column("entity_bucket",
                               pa.array(buckets, type=pa.int32()))

    from .adjacency import _exchange_blocks, _exchange_dir_for
    exchange_dir = _exchange_dir_for(out_dir)
    shutil.rmtree(exchange_dir, ignore_errors=True)
    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    # coalesce before the partitioned write (see adjacency.py)
    bucketed = bucketed.repartition(_exchange_blocks())
    bucketed.write_parquet(exchange_dir, partition_cols=["entity_bucket"])

    @ray.remote(num_cpus=1)
    def merge_bucket_task(bucket_dir: str, final_path: str) -> int:
        df = pads.dataset(bucket_dir).to_table().to_pandas()

        def agg_aliases(blobs):
            aliases: set = set()
            for blob in blobs:
                aliases.update(json.loads(blob))
            return json.dumps(sorted(aliases)[:MAX_ALIASES])

        g = df.groupby("canonical_id", sort=False)
        out = g.agg(aliases_json=("aliases_json", agg_aliases),
                    n_mentions=("n_mentions", "sum"),
                    first_url=("first_url", "min")).reset_index()
        out["n_mentions"] = out["n_mentions"].astype("int64")
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                       final_path, compression="zstd")
        return len(out)

    os.makedirs(out_dir, exist_ok=True)
    futures = []
    for name in sorted(os.listdir(exchange_dir)):
        if not name.startswith("entity_bucket="):
            continue
        bucket = name.split("=", 1)[1]
        futures.append(merge_bucket_task.remote(
            os.path.join(exchange_dir, name),
            os.path.join(out_dir, f"entities-{bucket}.parquet")))
    total = sum(ray.get(futures))
    shutil.rmtree(exchange_dir, ignore_errors=True)
    return total
