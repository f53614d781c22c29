"""Ray Data stage: adjacency layout (O4) — subject-hash bucketing with
heavy-hitter salting, global sort, partitioned Parquet output.

The bucket column is the ONE partitioning key reused across downstream
stages; hot subjects are salted into `salt_factor` sub-buckets so a single
celebrity entity cannot skew one partition (SURVEY.md §2.6 O4 / §4 skew).
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc


def _hash_bucket(values: pa.ChunkedArray, num_buckets: int) -> list[int]:
    return [zlib.crc32(v.encode()) % num_buckets
            for v in values.to_pylist()]


def add_subject_bucket(batch: pa.Table, num_buckets: int = 16,
                       hot_subjects: frozenset = frozenset(),
                       salt_factor: int = 4) -> pa.Table:
    """Bucket by subject hash; hot subjects are salted into sub-buckets by
    the (pred, obj) hash — NOT by provenance — so identical (s,p,o) triples
    always land in the same bucket and per-bucket dedup remains globally
    exact while a celebrity subject still spreads across salt_factor
    partitions."""
    subj = batch.column("canonical_subj").to_pylist()
    preds = batch.column("pred").to_pylist()
    objs = batch.column("canonical_obj").to_pylist()
    buckets = []
    for s, p, o in zip(subj, preds, objs):
        base = (zlib.crc32(s.encode()) % num_buckets) * salt_factor
        if s in hot_subjects:
            salt = zlib.crc32(f"{p}\x00{o}".encode()) % salt_factor
            buckets.append(base + salt)
        else:
            buckets.append(base)
    return batch.append_column("subj_bucket",
                               pa.array(buckets, type=pa.int32()))


def find_hot_subjects(ds, threshold_fraction: float = 0.01,
                      sample_fraction: float = 0.05) -> frozenset:
    """Cheap heavy-hitter detection on a sample: subjects holding more than
    `threshold_fraction` of sampled rows are salted."""
    sample = ds.random_sample(sample_fraction, seed=7)
    counts = sample.groupby("canonical_subj").count().to_pandas()
    if counts.empty:
        return frozenset()
    total = counts["count()"].sum()
    hot = counts[counts["count()"] > max(2.0, threshold_fraction * total)]
    return frozenset(hot["canonical_subj"].tolist())


def write_adjacency(ds, out_dir: str, num_buckets: int = 16,
                    hot_subjects: frozenset = frozenset()):
    """bucket → sort → partitioned parquet."""
    bucketed = ds.map_batches(
        lambda b: add_subject_bucket(b, num_buckets, hot_subjects),
        batch_format="pyarrow")
    ordered = bucketed.sort(["subj_bucket", "canonical_subj"])
    ordered.write_parquet(out_dir, partition_cols=["subj_bucket"])


def write_adjacency_deduped(linked_ds, out_dir: str, num_buckets: int = 16,
                            hot_subjects: frozenset = frozenset()):
    """Fused exact-dedup + adjacency layout in ONE shuffle.

    Because the bucket is a pure function of (subj, and for hot subjects
    pred/obj), every copy of an (s,p,o) triple lands in the same bucket, so
    the per-bucket vectorized dedup is globally exact; the per-bucket sort
    by canonical_subj plus hive partitioning by bucket yields the same
    subject-clustered layout as a global sort — without the extra
    all-to-all sort barrier (SURVEY.md §2.6 O4 + §2.7 D5 fused)."""
    from .canonicalize import dedup_triples_within_batch

    combined = linked_ds.map_batches(dedup_triples_within_batch,
                                     batch_format="pyarrow")
    bucketed = combined.map_batches(
        lambda b: add_subject_bucket(b, num_buckets, hot_subjects),
        batch_format="pyarrow")

    def finalize(t: pa.Table) -> pa.Table:
        # global-within-bucket dedup (sorts by s,p,o,url), then stable
        # subject clustering
        t = dedup_triples_within_batch(t)
        return t.sort_by([("canonical_subj", "ascending")])

    out = bucketed.groupby("subj_bucket").map_groups(
        finalize, batch_format="pyarrow")
    out.write_parquet(out_dir, partition_cols=["subj_bucket"])
