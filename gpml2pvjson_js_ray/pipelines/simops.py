"""Similarity search over the `embeddings` table (list<float> column).

- Brute-force cosine top-k lives in relational.py (SQL-verifiable).
- embeddings_ann_lsh_top10: random-hyperplane LSH bucketing — the scale
  path: hash once per vector (map_batches, vectorized matmul), co-locate by
  bucket, search only the query's bucket (multi-probe fallback widens to
  Hamming-1 buckets when the bucket is thin). Approximate by design →
  rows-only driver check; pytest asserts recall vs brute force.
- embeddings_label_stats: per-label count/norm stats (SQL-verified).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SEED = 2024


def _n_planes(n_vectors: int) -> int:
    """Adaptive: target ~64 vectors per bucket so the probe set (exact
    bucket + Hamming-1 neighbors) holds enough candidates. With uniform
    random embeddings LSH recall is bucket-coverage-bound; real embedding
    corpora cluster and behave far better."""
    import math
    return max(3, min(16, int(math.log2(max(2, n_vectors / 64)))))


def _read_emb(sf_dir: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                           columns=columns)


def _planes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.RandomState(_SEED)
    return rng.normal(size=(n_planes, dim))


def _bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    n_planes = planes.shape[0]
    bits = (mat @ planes.T) > 0
    return bits.dot(1 << np.arange(n_planes)[::-1]).astype(np.int64)


def embeddings_ann_lsh_top10(sf_dir: str):
    """Top-10 cosine neighbors of vec_id 0 via LSH bucket restriction."""
    import ray.data as rd

    emb = _read_emb(sf_dir, ["vec_id", "embedding"])
    n_vectors = emb.count()
    n_planes = _n_planes(n_vectors)
    query_row = emb.filter(expr="vec_id == 0").take(1)[0]
    q = np.asarray(query_row["embedding"], dtype=np.float64)
    planes = _planes(q.shape[0], n_planes)
    qn = q / np.linalg.norm(q)
    q_bucket = int(_bucket_of(qn[None, :], planes)[0])
    # multi-probe: exact bucket + Hamming-1 neighbors
    probe = {q_bucket} | {q_bucket ^ (1 << i) for i in range(n_planes)}

    def bucket_and_sim(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        mat = np.array(b.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        buckets = _bucket_of(mat / norms[:, None], planes)
        sims = (mat @ qn) / norms
        keep = np.array([i != 0 and bkt in probe
                         for i, bkt in zip(ids, buckets)])
        if not keep.any():
            return pa.Table.from_pydict(
                {"vec_id": pa.array([], type=pa.int64()),
                 "sim": pa.array([], type=pa.float64())})
        return pa.Table.from_pydict({
            "vec_id": pa.array(ids[keep], type=pa.int64()),
            "sim": pa.array(np.round(sims[keep], 6), type=pa.float64())})

    return (emb.map_batches(bucket_and_sim, batch_format="pyarrow")
            .sort(["sim", "vec_id"], descending=[True, False])
            .limit(10))


def embeddings_near_dups(sf_dir: str, threshold: float = 0.95):
    """Embedding-cosine near-duplicate pairs via LSH bucket co-location:
    bucket each normalized vector (map_batches, vectorized), groupby bucket,
    exact pairwise cosine inside each bucket, keep pairs ≥ threshold.
    Misses cross-bucket pairs by design (LSH recall); at 100 TB the bucket
    count scales with corpus size and per-bucket work stays bounded."""
    import pandas as pd

    emb = _read_emb(sf_dir, ["vec_id", "embedding"])
    n_vectors = emb.count()
    n_planes = _n_planes(n_vectors)
    first = emb.take(1)[0]
    planes = _planes(len(first["embedding"]), n_planes)

    def add_bucket(b: pa.Table) -> pa.Table:
        mat = np.array(b.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        buckets = _bucket_of(mat / norms[:, None], planes)
        return b.append_column("bucket",
                               pa.array(buckets, type=pa.int64()))

    def pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        ids = df["vec_id"].to_numpy()
        mat = np.array(df["embedding"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame({
            "vec_a": np.minimum(ids[ia[keep]], ids[ib[keep]]).astype("int64"),
            "vec_b": np.maximum(ids[ia[keep]], ids[ib[keep]]).astype("int64"),
            "cosine": np.round(sims[ia[keep], ib[keep]], 6)})

    return (emb.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pairs, batch_format="pandas"))


def embeddings_label_stats(sf_dir: str):
    from ray.data.aggregate import Count, Mean
    emb = _read_emb(sf_dir, ["label", "embedding"])

    def norms(b: pa.Table) -> pa.Table:
        mat = np.array(b.column("embedding").to_pylist(), dtype=np.float64)
        n = np.linalg.norm(mat, axis=1)
        return pa.Table.from_pydict({
            "label": b.column("label"),
            "norm": pa.array(n, type=pa.float64())})

    out = (emb.map_batches(norms, batch_format="pyarrow")
           .groupby("label")
           .aggregate(Count(alias_name="n_vectors"),
                      Mean("norm", alias_name="avg_norm")))

    def final(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("avg_norm")
        return b.set_column(i, "avg_norm",
                            pc.round(b.column("avg_norm"), ndigits=4))
    return out.map_batches(final, batch_format="pyarrow")


SQL_EMBEDDINGS_LABEL_STATS = """
SELECT label, count(*) AS n_vectors,
       round(avg(sqrt(list_sum(list_transform(
           CAST(embedding AS DOUBLE[]), x -> x * x)))), 4) AS avg_norm
FROM embeddings GROUP BY label
"""
