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


def _exchange_blocks() -> int:
    try:
        import ray
        return max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
    except Exception:
        return 8


def _exchange_dir_for(out_dir: str) -> str:
    """Exchange data is transient scratch (deleted after the reduce): put it
    on tmpfs when available — disk writeback stalls on the VM's virtual
    disk are the single largest source of phase-2 variance. On a multi-node
    cluster the exchange would live on shared storage instead."""
    import hashlib
    import os
    if os.path.isdir("/dev/shm"):
        tag = hashlib.sha1(out_dir.encode()).hexdigest()[:12]
        return f"/dev/shm/kg_exchange_{tag}"
    return out_dir + ".exchange"


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


def hot_subjects_from_sample(triples_dir: str,
                             threshold_fraction: float = 0.01,
                             max_rows: int = 200_000) -> frozenset:
    """Heavy-hitter detection from a bounded sample of the written triples:
    read one column of the first file(s), count subjects, flag those above
    threshold_fraction of the sample. Driver-local metadata-cheap read — no
    Ray job; at cluster scale the same sample comes from a handful of
    shards."""
    import os

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
    """Fused exact-dedup + adjacency layout via a FILESYSTEM exchange.

    Because the bucket is a pure function of (subj, and for hot subjects
    pred/obj), every copy of an (s,p,o) triple lands in the same bucket, so
    per-bucket vectorized dedup is globally exact; per-bucket sort by
    canonical_subj plus bucket partitioning yields the subject-clustered
    layout without a global sort (SURVEY.md §2.6 O4 + §2.7 D5 fused).

    Exchange strategy: Ray Data's generic groupby is a sort shuffle with
    multi-second fixed latency; with a SMALL KNOWN key space (num_buckets ×
    salt) the hive-partitioned parquet write IS the map-side exchange
    (tasks append bucket=K files), and one small raw-Ray task per bucket
    does the reduce (read bucket dir → dedup → sort → single file). On a
    multi-node cluster the same shape runs against shared storage — this is
    the documented drop-to-raw-tasks fallback for an operator the Dataset
    API can't express efficiently."""
    import os
    import shutil

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray

    from .canonicalize import dedup_triples_within_batch

    combined = linked_ds.map_batches(dedup_triples_within_batch,
                                     batch_format="pyarrow")
    bucketed = combined.map_batches(
        lambda b: add_subject_bucket(b, num_buckets, hot_subjects),
        batch_format="pyarrow")

    exchange_dir = _exchange_dir_for(out_dir)
    shutil.rmtree(exchange_dir, ignore_errors=True)
    # coalesce blocks before the partitioned write: file count is
    # blocks × buckets, and thousands of tiny files dominate exchange cost
    bucketed = bucketed.repartition(_exchange_blocks())
    bucketed.write_parquet(exchange_dir, partition_cols=["subj_bucket"])

    @ray.remote(num_cpus=1)
    def finalize_bucket(bucket_dir: str, final_dir: str):
        t = pads.dataset(bucket_dir).to_table()
        t = dedup_triples_within_batch(t)
        t = t.sort_by([("canonical_subj", "ascending")])
        os.makedirs(final_dir, exist_ok=True)
        pq.write_table(t, os.path.join(final_dir, "part-0.parquet"),
                       compression="zstd")
        return t.num_rows

    futures = []
    for name in sorted(os.listdir(exchange_dir)):
        if not name.startswith("subj_bucket="):
            continue
        futures.append(finalize_bucket.remote(
            os.path.join(exchange_dir, name),
            os.path.join(out_dir, name)))
    total = sum(ray.get(futures))
    shutil.rmtree(exchange_dir, ignore_errors=True)
    return total
