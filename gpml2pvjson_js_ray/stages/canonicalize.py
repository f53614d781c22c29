"""Ray Data stages: exact triple dedup (D5) + canonical-entity unification
(A6) — the two wide shuffles of the KG pipeline.

Both follow the pre-aggregate pattern (ray_guide: combine inside
map_batches, then a small exchange): a within-batch combiner shrinks the
all-to-all exchange before the global merge, which matters at 10^12-row
scale where the raw triple stream is orders of magnitude larger than the
distinct-key space. All per-row work is vectorized (pyarrow compute /
polars group_by) — no Python loops over mentions.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from .exchange import (auto_num_buckets, hash_rows_mod, polars_capped,
                       shuffle_reduce)

TRIPLE_KEY = ["canonical_subj", "pred", "canonical_obj"]


def dedup_triples_within_batch(batch: pa.Table) -> pa.Table:
    """Combiner: drop duplicate (s,p,o) rows inside one batch, keeping the
    lexically-smallest (url, subj, obj, entity_id) row. The tiebreak
    beyond url matters: two entities in ONE document can emit the same
    canonical (s,p,o) (e.g. two nodes sharing an xref), and url alone
    left the survivor to incidental block order — the full tiebreak is
    a TOTAL order over the payload-distinct candidates, so keep-first
    is deterministic across any partitioning (and min-folds
    associatively through the exchange combine), which is what lets
    the kg_adjacency driver oracle pin full rows via row_number()."""
    if batch.num_rows == 0:
        return batch
    # sort by key+tiebreak, then keep the first row of each key run —
    # fully vectorized: adjacent-row inequality on each key column.
    # Tiebreak columns are filtered to the batch schema: callers like
    # the salting probe feed key+url projections
    names = set(batch.schema.names)
    sort_keys = [(k, "ascending") for k in TRIPLE_KEY] \
        + [(k, "ascending") for k in ("url", "subj", "obj", "entity_id")
           if k in names]
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
    ids = hash_rows_mod(batch, TRIPLE_KEY, num_buckets)
    return batch.append_column("spo_bucket",
                               pa.array(ids, type=pa.int32()))


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

# internal partial schema: aliases travel as a real list column (no JSON
# round-trip mid-pipeline); the final entities table exposes aliases_json
ENTITY_PARTIAL_SCHEMA = pa.schema([
    ("canonical_id", pa.string()),
    ("aliases", pa.list_(pa.string())),
    ("n_mentions", pa.int64()),
    ("first_url", pa.string()),
])

ENTITY_FINAL_SCHEMA = pa.schema([
    ("canonical_id", pa.string()),
    ("aliases_json", pa.string()),
    ("n_mentions", pa.int64()),
    ("first_url", pa.string()),
])


def entity_partials_batch(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch partial aggregation of entity mentions keyed by
    canonical id (subject and object sides both contribute). Vectorized
    polars group_by; literals (classes, citation ids — no xref and not a
    node) are excluded."""
    pl = polars_capped()
    frames = []
    for side, xref_side, node_side in (
            ("canonical_subj", "subj_xref", "subj_is_node"),
            ("canonical_obj", "obj_xref", "obj_is_node")):
        frames.append(
            pl.from_arrow(batch.select([side, xref_side, "url", node_side]))
            .rename({side: "canonical_id", xref_side: "xref",
                     node_side: "is_node"}))
    long = pl.concat(frames).filter(
        pl.col("canonical_id").is_not_null()
        & (pl.col("canonical_id") != "")
        & (pl.col("is_node") | (pl.col("xref") != "")))
    agg = long.group_by("canonical_id").agg(
        aliases=pl.col("xref").filter(pl.col("xref") != "")
        .unique().sort().head(MAX_ALIASES),
        n_mentions=pl.len().cast(pl.Int64),
        first_url=pl.col("url").min(),
    )
    return agg.to_arrow().cast(ENTITY_PARTIAL_SCHEMA)


def _merge_partial_frame(df):
    """Merge partial rows sharing a canonical_id: sorted-capped alias
    union, summed mentions, min first_url (deterministic; SURVEY.md §2.5
    A6). Vectorized polars aggregation."""
    pl = polars_capped()
    return df.group_by("canonical_id").agg(
        aliases=pl.col("aliases").flatten().drop_nulls()
        .unique().sort().head(MAX_ALIASES),
        n_mentions=pl.col("n_mentions").sum().cast(pl.Int64),
        first_url=pl.col("first_url").min(),
    )


def _finalize_entities(df) -> pa.Table:
    """list<string> aliases → aliases_json, vectorized (escape backslash
    and quote, join). Control characters CAN reach alias strings (numeric
    character references like &#10; in GPML attributes survive XML
    attribute normalization), so rows whose fast-path encoding still
    contains a raw control char fall back to json.dumps — rare, and keeps
    every aliases_json valid JSON."""
    import json

    pl = polars_capped()
    esc = (pl.element()
           .str.replace_all("\\", "\\\\", literal=True)
           .str.replace_all('"', '\\"', literal=True))
    joined = pl.concat_str(
        pl.lit('["'),
        pl.col("aliases").list.eval(esc).list.join('","'),
        pl.lit('"]'))
    out = df.with_columns(
        aliases_json=pl.when(pl.col("aliases").list.len() > 0)
        .then(joined).otherwise(pl.lit("[]"))
    ).select(["canonical_id", "aliases_json", "n_mentions", "first_url"])
    bad = out["aliases_json"].str.contains(r"[\x00-\x1F]")
    if bad.any():
        idxs = bad.arg_true()
        fixed = [json.dumps(df["aliases"][int(i)].to_list(),
                            ensure_ascii=False, separators=(",", ":"))
                 for i in idxs]
        out = out.with_columns(
            out["aliases_json"].scatter(idxs, fixed).alias("aliases_json"))
    return out.to_arrow().cast(ENTITY_FINAL_SCHEMA)


NUM_ENTITY_BUCKETS = 64


def merge_entity_partials(ds, num_buckets: int = NUM_ENTITY_BUCKETS):
    """Global merge via the Dataset API: hash-partition canonical ids into
    buckets (one map_groups call per bucket, not per id), then the
    vectorized merge inside each bucket."""

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = hash_rows_mod(b, ["canonical_id"], num_buckets)
        return b.append_column("entity_bucket",
                               pa.array(ids, type=pa.int32()))

    def merge_bucket(t: pa.Table) -> pa.Table:
        # polars import stays INSIDE the task body: a closure-captured
        # module would be re-imported at unpickle, before the thread cap
        pl = polars_capped()
        df = pl.from_arrow(t.drop_columns(["entity_bucket"]))
        return _finalize_entities(_merge_partial_frame(df))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("entity_bucket").map_groups(
        merge_bucket, batch_format="pyarrow")


def entity_exchange_spec(out_dir: str, num_buckets: int | None = None,
                         input_is_partials: bool = False) -> dict:
    """Exchange spec (stages/exchange.py) for the A6 entity merge: the
    split task computes per-block partials (or re-combines partial rows —
    second-level combiner; the exchange ships one row per distinct id per
    block, not per mention) and one reduce task per bucket does the final
    vectorized merge + JSON encode."""
    if num_buckets is None:
        num_buckets = auto_num_buckets(multiple=2)
    os.makedirs(out_dir, exist_ok=True)

    def map_fn(block: pa.Table) -> pa.Table:
        if input_is_partials:
            pl = polars_capped()
            t = (_merge_partial_frame(pl.from_arrow(block))
                 .to_arrow().cast(ENTITY_PARTIAL_SCHEMA))
        else:
            t = entity_partials_batch(block)
        ids = hash_rows_mod(t, ["canonical_id"], num_buckets)
        return t.append_column("bucket", pa.array(ids, type=pa.int64()))

    def reduce_fn(t: pa.Table, bucket_id: int) -> int:
        import pyarrow.parquet as pq
        if t.num_rows == 0:
            return 0
        pl = polars_capped()
        out = _finalize_entities(_merge_partial_frame(pl.from_arrow(t)))
        pq.write_table(out,
                       os.path.join(out_dir,
                                    f"entities-{bucket_id}.parquet"),
                       compression="zstd")
        return out.num_rows

    def combine_fn(t: pa.Table) -> pa.Table:
        # associative partial merge: fold bucket slices while streaming
        pl = polars_capped()
        return (_merge_partial_frame(pl.from_arrow(t))
                .to_arrow().cast(ENTITY_PARTIAL_SCHEMA))

    return {"num_buckets": num_buckets, "map_fn": map_fn,
            "reduce_fn": reduce_fn, "combine_fn": combine_fn}


def merge_entity_partials_fs(ds, out_dir: str,
                             num_buckets: int | None = None) -> int:
    """Standalone A6 merge over a dataset of entity partials (see
    entity_exchange_spec; run_kg_pipeline fuses this exchange with the
    adjacency layout over one traversal of the raw triples instead)."""
    spec = entity_exchange_spec(out_dir, num_buckets,
                                input_is_partials=True)
    return sum(shuffle_reduce(ds, **spec))
