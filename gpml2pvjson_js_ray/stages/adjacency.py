"""Ray Data stage: adjacency layout (O4) — subject-hash bucketing with
heavy-hitter salting, per-bucket sort, partitioned Parquet output.

The bucket column is the ONE partitioning key reused across downstream
stages; hot subjects are salted across `salt_factor` neighboring buckets
so a single celebrity entity cannot skew one partition (SURVEY.md §2.6 O4
/ §4 skew). All bucket assignment is vectorized (polars row hashes +
numpy) — no Python row loops in the exchange path.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .exchange import auto_num_buckets, hash_rows_mod, shuffle_reduce

DEFAULT_SALT_FACTOR = 4


def subject_bucket_ids(batch: pa.Table, num_buckets: int,
                       hot_subjects: frozenset = frozenset(),
                       salt_factor: int = DEFAULT_SALT_FACTOR) -> np.ndarray:
    """Bucket by subject hash; hot subjects are salted by the (pred, obj)
    hash — NOT by provenance — so identical (s,p,o) triples always land in
    the same bucket and per-bucket dedup remains globally exact while a
    celebrity subject still spreads across salt_factor buckets."""
    base = hash_rows_mod(batch, ["canonical_subj"], num_buckets)
    if not hot_subjects:
        return base
    hot_mask = pc.is_in(
        batch.column("canonical_subj"),
        value_set=pa.array(sorted(hot_subjects))).combine_chunks()
    hot_np = hot_mask.to_numpy(zero_copy_only=False)
    salt = hash_rows_mod(batch, ["pred", "canonical_obj"], salt_factor)
    return np.where(hot_np, (base + salt) % num_buckets, base)


def add_subject_bucket(batch: pa.Table, num_buckets: int = 16,
                       hot_subjects: frozenset = frozenset(),
                       salt_factor: int = DEFAULT_SALT_FACTOR) -> pa.Table:
    ids = subject_bucket_ids(batch, num_buckets, hot_subjects, salt_factor)
    return batch.append_column("subj_bucket",
                               pa.array(ids, type=pa.int32()))


def hot_subjects_from_sample(triples_dir: str,
                             threshold_fraction: float = 0.01,
                             max_rows: int = 200_000) -> frozenset:
    """Heavy-hitter detection from a bounded sample of the written triples:
    read one column of the first file(s), count subjects, flag those above
    threshold_fraction of the sample. Driver-local metadata-cheap read — no
    Ray job; at cluster scale the same sample comes from a handful of
    shards."""
    import pyarrow.dataset as pads
    try:
        dataset = pads.dataset(triples_dir)
    except (OSError, pa.ArrowInvalid):
        return frozenset()
    files = dataset.files[:4] if hasattr(dataset, "files") else []
    if not files:
        return frozenset()
    sample = pads.dataset(files).head(max_rows, columns=["canonical_subj"])
    if sample.num_rows == 0:
        return frozenset()
    counts = pc.value_counts(sample.column("canonical_subj"))
    threshold = max(2.0, threshold_fraction * sample.num_rows)
    hot = [str(entry["values"]) for entry in counts.to_pylist()
           if entry["counts"] > threshold]
    return frozenset(hot)


def hot_subjects_from_pages(page_files: list[str],
                            xref_ref,
                            sample_pages: int = 256,
                            threshold_fraction: float = 0.01) -> frozenset:
    """FRESH-RUN heavy-hitter pre-pass (VERDICT r2 item 7): run the
    phase-1 batch chain over a tiny deterministic page sample (spread
    across up to 8 evenly-spaced input files) and flag canonical subjects
    above threshold_fraction of the sampled triples. Driver-local — a few
    hundred pages through the same vectorized batch functions the real
    pipeline uses (~0.3 s); at cluster scale the identical sample becomes
    a handful of Ray tasks over shard heads. The result fixes the bucket
    function BEFORE the first split task, which is why it cannot be
    derived from the run's own stream."""
    import pyarrow.dataset as pads

    from .convert import convert_islands_batch
    from .extract import extract_islands_batch
    from .link import make_link_fn
    from .triples import emit_triples_batch

    if not page_files:
        return frozenset()
    picks = page_files[::max(1, len(page_files) // 8)][:8]
    per = max(1, sample_pages // len(picks))
    parts = []
    for f in picks:
        try:
            parts.append(pads.dataset(f).head(
                per, columns=["url", "warc_ts", "html"]))
        except (OSError, pa.ArrowInvalid):
            continue
    if not parts:
        return frozenset()
    batch = pa.concat_tables(parts)
    linked = make_link_fn(xref_ref)(
        emit_triples_batch(convert_islands_batch(
            extract_islands_batch(batch))))
    if linked.num_rows == 0:
        return frozenset()
    counts = pc.value_counts(linked.column("canonical_subj"))
    threshold = max(2.0, threshold_fraction * linked.num_rows)
    return frozenset(str(e["values"]) for e in counts.to_pylist()
                     if e["counts"] > threshold)


def write_adjacency(ds, out_dir: str, num_buckets: int = 16,
                    hot_subjects: frozenset = frozenset()):
    """bucket → sort → partitioned parquet (Dataset-API variant)."""
    bucketed = ds.map_batches(
        lambda b: add_subject_bucket(b, num_buckets, hot_subjects),
        batch_format="pyarrow")
    ordered = bucketed.sort(["subj_bucket", "canonical_subj"])
    ordered.write_parquet(out_dir, partition_cols=["subj_bucket"])


def adjacency_exchange_spec(out_dir: str, num_buckets: int | None = None,
                            hot_subjects: frozenset = frozenset()) -> dict:
    """Exchange spec (stages/exchange.py) for the fused exact-dedup +
    adjacency layout.

    Because the bucket is a pure function of (subj, and for hot subjects
    pred/obj), every copy of an (s,p,o) triple lands in the same bucket, so
    per-bucket vectorized dedup is globally exact; per-bucket sort by
    canonical_subj plus bucket partitioning yields the subject-clustered
    layout without a global sort (SURVEY.md §2.6 O4 + §2.7 D5 fused).

    The split task fuses the within-block dedup combiner (shrinks the
    exchange) with bucket assignment; one reduce task per bucket dedups,
    sorts and writes out_dir/subj_bucket=K/part-0.parquet. Bucket count
    auto-scales to ≫ CPU count so the reduce side never caps parallelism
    (round-1's 16-way reduce was the scaling bottleneck); at larger inputs
    pass num_buckets ≈ input_bytes / 2 GiB so one bucket fits a worker."""
    import pyarrow.parquet as pq

    from .canonicalize import dedup_triples_within_batch

    if num_buckets is None:
        num_buckets = auto_num_buckets(multiple=2)
    os.makedirs(out_dir, exist_ok=True)
    # layout sidecar: point lookups / traversals must re-derive the
    # bucket function EXACTLY (N from cluster size is not reproducible
    # later), so the probe set {(hash(subj)+s) % N, s < salt_factor}
    # can be computed without scanning (see graph.two_hop_from_adjacency)
    import json
    with open(os.path.join(out_dir, "_layout.json"), "w") as fh:
        json.dump({"num_buckets": num_buckets,
                   "salt_factor": DEFAULT_SALT_FACTOR,
                   "key": "canonical_subj"}, fh)

    def map_fn(block: pa.Table) -> pa.Table:
        # no per-block dedup here: the incremental combine_fn and the
        # final reduce both dedup, and a third pass on the hot streaming
        # path costs more CPU than the ~15% exchange-volume reduction
        # it buys (measured; re-crawl duplicates mostly span blocks)
        ids = subject_bucket_ids(block, num_buckets, hot_subjects)
        return block.append_column("bucket",
                                   pa.array(ids, type=pa.int64()))

    def reduce_fn(t: pa.Table, bucket_id: int) -> int:
        if t.num_rows == 0:
            return 0
        t = dedup_triples_within_batch(t)
        t = t.sort_by([("canonical_subj", "ascending")])
        final_dir = os.path.join(out_dir, f"subj_bucket={bucket_id}")
        os.makedirs(final_dir, exist_ok=True)
        pq.write_table(t, os.path.join(final_dir, "part-0.parquet"),
                       compression="zstd")
        return t.num_rows

    return {"num_buckets": num_buckets, "map_fn": map_fn,
            "reduce_fn": reduce_fn,
            # associative partial: fold bucket slices while streaming
            "combine_fn": dedup_triples_within_batch}


def write_adjacency_deduped(linked_ds, out_dir: str,
                            num_buckets: int | None = None,
                            hot_subjects: frozenset = frozenset()) -> int:
    """Standalone fused dedup + adjacency run (see adjacency_exchange_spec;
    run_kg_pipeline fuses this exchange with the entity merge over one
    traversal instead)."""
    spec = adjacency_exchange_spec(out_dir, num_buckets, hot_subjects)
    return sum(shuffle_reduce(linked_ds, **spec))


def write_predicate_layout(adj_dir: str, out_dir: str,
                           num_buckets: int | None = None) -> int:
    """Secondary PSO index: re-partition the (already deduped) adjacency
    rows by predicate-hash bucket so predicate-driven queries ("all
    edges with pred P") read ONE partition instead of scanning the
    subject-clustered primary layout.

    Layout choice: partitioning by predicate VALUE would hive-encode
    arbitrary IRIs into paths and make one unbounded directory per hot
    predicate; hashing to `num_buckets` with a `_pso_layout.json`
    sidecar keeps the probe computable without scanning (mirror of the
    subject layout's sidecar contract). Predicate skew is inherent to a
    PSO index — a hot predicate's bucket is simply that predicate's
    edge set, which any consumer of it must read anyway; Ray's
    write_parquet emits one file per producing block into each
    partition dir, so the hot bucket stays readable in parallel.

    Returns the number of rows written. Streaming end-to-end: read →
    one map_batches (vectorized bucket hash) → partitioned write."""
    import json

    import ray.data as rd

    files = []
    for root, _dirs, names in os.walk(adj_dir):
        files += [os.path.join(root, n) for n in names
                  if n.endswith(".parquet")]
    if num_buckets is None:
        num_buckets = auto_num_buckets(multiple=2)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "_pso_layout.json"), "w") as fh:
        json.dump({"num_buckets": num_buckets, "key": "pred"}, fh)

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = hash_rows_mod(b, ["pred"], num_buckets)
        return b.append_column("pred_bucket",
                               pa.array(ids, type=pa.int32()))

    ds = rd.read_parquet(sorted(files)).map_batches(
        add_bucket, batch_format="pyarrow")
    ds.write_parquet(out_dir, partition_cols=["pred_bucket"])
    total = 0
    for root, _dirs, names in os.walk(out_dir):
        if "pred_bucket=" not in root:
            continue
        import pyarrow.parquet as pq
        for n in names:
            if n.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, n)).num_rows
    return total
