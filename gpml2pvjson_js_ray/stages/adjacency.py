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
    subj = batch.column("canonical_subj")
    urls = batch.column("url").to_pylist()
    buckets = []
    for v, url in zip(subj.to_pylist(), urls):
        h = zlib.crc32(v.encode())
        if v in hot_subjects:
            # salt: spread a hot subject deterministically by provenance
            h = zlib.crc32((v + "|" + url).encode())
            buckets.append((h % salt_factor)
                           + (zlib.crc32(v.encode()) % num_buckets)
                           * salt_factor)
        else:
            buckets.append((h % num_buckets) * salt_factor)
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
    """bucket → sort → partitioned parquet. Returns the written dataset."""
    bucketed = ds.map_batches(
        lambda b: add_subject_bucket(b, num_buckets, hot_subjects),
        batch_format="pyarrow")
    ordered = bucketed.sort(["subj_bucket", "canonical_subj"])
    ordered.write_parquet(out_dir, partition_cols=["subj_bucket"])
