"""Similarity search over the `embeddings` table (list<float> column).

- Brute-force cosine top-k lives in relational.py (SQL-verifiable): the
  exactness baseline.
- embeddings_ann_lsh_top10: random-hyperplane LSH over a PERSISTED
  bucket-partitioned index — queries read only the probe buckets
  (multi-probe widens to Hamming-1). Data-independent hashing.
- embeddings_ann_ivf_top10: spherical-k-means IVF (inverted file) —
  coarse quantizer trained on a bounded sample, lists partitioned by
  nearest centroid, queries probe the nprobe nearest lists. Adapts to
  the data distribution.
  Both ANN paths are approximate by design → rows-only driver check;
  pytest asserts recall + sim-exactness vs brute force.
- embeddings_near_dups: bucket-co-located exact pairwise cosine.
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


def _emb_matrix(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy-ish extraction of the fixed-width list<float> embedding
    column: flatten the values buffer and reshape — no Python list
    round-trip."""
    ids = b.column("vec_id").to_numpy(zero_copy_only=False)
    arr = b.column("embedding").combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.float64, copy=False)
    return ids, flat.reshape(len(arr), -1)


_ANN_INDEX_ROOT = "/tmp/gpml2pvjson_ann_index"


def _ann_index_dir(sf_dir: str, n_planes: int) -> str:
    import hashlib
    src = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.sha1(
        f"{os.path.abspath(src)}|{os.path.getmtime(src)}|{n_planes}|{_SEED}"
        .encode()).hexdigest()[:16]
    return os.path.join(_ANN_INDEX_ROOT, tag)


def build_ann_index(sf_dir: str) -> tuple[str, int]:
    """Build (once; content-addressed cache) the LSH 'inverted file': the
    embeddings rewritten as parquet hive-partitioned by hyperplane bucket.
    Queries then read ONLY their probe buckets via partition pruning —
    the index build is the linear pass, each query is sublinear. At
    100 TB this layout is exactly an IVF: build amortizes across all
    subsequent queries."""
    import shutil

    import pyarrow.dataset as pads

    src = os.path.join(sf_dir, "embeddings.parquet")
    # metadata-only row count (no Ray job) sizes the bucket space
    n_vectors = pads.dataset(src).count_rows()
    n_planes = _n_planes(n_vectors)
    idx_dir = _ann_index_dir(sf_dir, n_planes)
    if os.path.isdir(idx_dir):
        return idx_dir, n_planes
    first = pads.dataset(src).head(1, columns=["embedding"])
    planes = _planes(len(first.column("embedding")[0]), n_planes)
    emb = _read_emb(sf_dir, ["vec_id", "embedding"])

    def add_bucket(b: pa.Table) -> pa.Table:
        _, mat = _emb_matrix(b)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        buckets = _bucket_of(mat / norms[:, None], planes)
        return b.append_column("bucket",
                               pa.array(buckets, type=pa.int64()))

    tmp_dir = idx_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    emb.map_batches(add_bucket, batch_format="pyarrow") \
        .write_parquet(tmp_dir, partition_cols=["bucket"])
    try:
        os.rename(tmp_dir, idx_dir)  # atomic publish
    except OSError:
        shutil.rmtree(tmp_dir, ignore_errors=True)  # concurrent builder won
    return idx_dir, n_planes


def embeddings_ann_lsh_top10(sf_dir: str):
    """Top-10 cosine neighbors of vec_id 0: probe ONLY the query's LSH
    bucket plus Hamming-1 neighbors of the persisted bucket-partitioned
    index — similarity is computed for the probed candidates alone, never
    the full corpus (round-1 version scanned everything and filtered).
    Partition pruning is explicit: only the probe buckets' directories are
    even opened."""
    import ray.data as rd

    import pyarrow.dataset as pads

    idx_dir, n_planes = build_ann_index(sf_dir)
    # query-vector fetch: driver-local predicate-pushdown read (row-group
    # stats prune), not a distributed scan
    q_tbl = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")) \
        .to_table(filter=pads.field("vec_id") == 0, columns=["embedding"])
    q = np.asarray(q_tbl.column("embedding")[0].as_py(), dtype=np.float64)
    planes = _planes(q.shape[0], n_planes)
    qn = q / np.linalg.norm(q)
    q_bucket = int(_bucket_of(qn[None, :], planes)[0])
    # multi-probe: exact bucket + Hamming-1 neighbors
    probe = sorted({q_bucket} |
                   {q_bucket ^ (1 << i) for i in range(n_planes)})

    import glob
    probe_dirs = [f for b in probe
                  for f in sorted(glob.glob(
                      os.path.join(idx_dir, f"bucket={b}", "*.parquet")))]
    if not probe_dirs:
        import pandas as pd
        return rd.from_pandas(pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"),
             "sim": pd.Series([], dtype="float64")}))
    candidates = rd.read_parquet(probe_dirs)

    def sim(b: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(b)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qn) / norms
        keep = ids != 0
        return pa.Table.from_pydict({
            "vec_id": pa.array(ids[keep], type=pa.int64()),
            "sim": pa.array(np.round(sims[keep], 6), type=pa.float64())})

    return (candidates.map_batches(sim, batch_format="pyarrow")
            .sort(["sim", "vec_id"], descending=[True, False])
            .limit(10))


def embeddings_near_dups(sf_dir: str, threshold: float = 0.95):
    """Embedding-cosine near-duplicate pairs via LSH bucket co-location:
    bucket each normalized vector (map_batches, vectorized), groupby bucket,
    exact pairwise cosine inside each bucket, keep pairs ≥ threshold.
    Misses cross-bucket pairs by design (LSH recall); at 100 TB the bucket
    count scales with corpus size and per-bucket work stays bounded."""
    import pandas as pd
    import pyarrow.dataset as pads

    # size the bucket space from parquet METADATA (row count) and one
    # row-group head (dim) — the round-2 version ran two extra full
    # Dataset executions (emb.count() + emb.take(1)) before the real one
    src = os.path.join(sf_dir, "embeddings.parquet")
    n_vectors = pads.dataset(src).count_rows()
    n_planes = _n_planes(n_vectors)
    first = pads.dataset(src).head(1, columns=["embedding"])
    planes = _planes(len(first.column("embedding")[0]), n_planes)
    emb = _read_emb(sf_dir, ["vec_id", "embedding"])

    def add_bucket(b: pa.Table) -> pa.Table:
        _, mat = _emb_matrix(b)
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


def embeddings_near_dups_exact(sf_dir: str, threshold: float = 0.5):
    """Exact embedding-cosine near-duplicate pairs by broadcast brute
    force: the full unit-normalized matrix goes into the object store
    ONCE (ray.put; zero-copy read in every task) and each batch computes
    its rows × the matrix with one matmul. This is the DuckDB-oracle-able
    ground-truth baseline for embeddings_near_dups (the LSH-bucketed
    variant, which trades recall for sublinearity). Quadratic in corpus
    size by construction — at 100 TB its role is per-bucket exact scoring
    and small-corpus validation, never the full corpus."""
    import ray
    import pyarrow.dataset as pads

    tbl = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")) \
        .to_table(columns=["vec_id", "embedding"])
    ids_all, mat_all = _emb_matrix(tbl)
    norms = np.linalg.norm(mat_all, axis=1)
    norms[norms == 0] = 1.0
    ref = ray.put((ids_all.astype(np.int64), mat_all / norms[:, None]))

    def pairs(b: pa.Table) -> pa.Table:
        import ray as _ray
        ids_b, mat_b = _emb_matrix(b)
        bn = np.linalg.norm(mat_b, axis=1)
        bn[bn == 0] = 1.0
        all_ids, all_unit = _ray.get(ref)
        sims = (mat_b / bn[:, None]) @ all_unit.T
        ia, ja = np.nonzero((sims >= threshold)
                            & (ids_b[:, None] < all_ids[None, :]))
        return pa.Table.from_pydict({
            "vec_a": pa.array(ids_b[ia].astype(np.int64)),
            "vec_b": pa.array(all_ids[ja]),
            "cosine": pa.array(np.round(sims[ia, ja], 6),
                               type=pa.float64())})

    return (_read_emb(sf_dir, ["vec_id", "embedding"])
            .map_batches(pairs, batch_format="pyarrow")
            .sort(["vec_a", "vec_b"]))


SQL_EMBEDDINGS_NEAR_DUPS_EXACT = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6)
           AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.5
ORDER BY vec_a, vec_b
"""


def embeddings_label_stats(sf_dir: str):
    from ray.data.aggregate import Count, Mean
    emb = _read_emb(sf_dir, ["label", "embedding"])

    def norms(b: pa.Table) -> pa.Table:
        arr = b.column("embedding").combine_chunks()
        mat = (arr.flatten().to_numpy(zero_copy_only=False)
               .astype(np.float64, copy=False).reshape(len(arr), -1))
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
SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vectors,
       round(avg(sqrt(list_sum(list_transform(
           CAST(embedding AS DOUBLE[]), x -> x * x)))), 4) AS avg_norm
FROM embeddings GROUP BY label
"""


# -- IVF (k-means inverted file) ANN ---------------------------------------

def _kmeans_spherical(sample: np.ndarray, k: int, iters: int = 10,
                      seed: int = _SEED) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample: centroids
    live on the unit sphere, assignment = max dot product. Small and
    numpy-only — the sample is bounded, never the corpus."""
    rng = np.random.RandomState(seed)
    if len(sample) == 0:
        raise ValueError("k-means training sample is empty")
    # the sample is bounded (sample_rows) while k grows ~sqrt(N): clamp so
    # rng.choice(replace=False) can't fail at large N or on tiny corpora
    k = min(k, len(sample))
    norms = np.linalg.norm(sample, axis=1)
    norms[norms == 0] = 1.0
    unit = sample / norms[:, None]
    centroids = unit[rng.choice(len(unit), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(unit @ centroids.T, axis=1)
        for c in range(k):
            members = unit[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


def _ivf_index_dir(sf_dir: str, k: int) -> str:
    import hashlib
    src = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.sha1(
        f"ivf|{os.path.abspath(src)}|{os.path.getmtime(src)}|{k}|{_SEED}"
        .encode()).hexdigest()[:16]
    return os.path.join(_ANN_INDEX_ROOT, tag)


def _train_coarse_quantizer(src: str,
                            sample_rows: int = 8192
                            ) -> tuple[int, np.ndarray]:
    """k = max(8, √N) spherical-k-means centroids from a deterministic
    UNBIASED sample: head() would be a file-prefix read — with
    clustered/ordered storage the quantizer would skew toward the first
    rows. Seeded random row indices via Dataset.take keep it unbiased
    and still bounded (metadata row count, no full value scan)."""
    import pyarrow.dataset as pads

    n_vectors = pads.dataset(src).count_rows()
    # ~sqrt(N) centroids, floor 8: buckets ≈ sqrt keeps both the probe
    # cost and the per-list length sublinear
    k = max(8, int(np.sqrt(n_vectors)))
    n_sample = min(sample_rows, n_vectors)
    rng = np.random.RandomState(_SEED)
    idx = np.sort(rng.choice(n_vectors, size=n_sample, replace=False))
    sample_tbl = pads.dataset(src).take(idx, columns=["embedding"])
    arr = sample_tbl.column("embedding").combine_chunks()
    sample = (arr.flatten().to_numpy(zero_copy_only=False)
              .astype(np.float64, copy=False).reshape(len(arr), -1))
    return k, _kmeans_spherical(sample, k)


def build_ivf_index(sf_dir: str,
                    sample_rows: int = 8192) -> tuple[str, np.ndarray]:
    """IVF build (once; content-addressed cache): train a spherical
    k-means coarse quantizer on a bounded sample, then rewrite the
    embeddings hive-partitioned by nearest-centroid id. Queries probe the
    nprobe nearest centroids' partitions only — the classic inverted-file
    ANN layout, complementary to the hyperplane-LSH index above (IVF
    adapts to the data distribution; LSH is data-independent)."""
    import shutil

    import pyarrow.dataset as pads

    src = os.path.join(sf_dir, "embeddings.parquet")
    k, centroids = _train_coarse_quantizer(src, sample_rows)
    idx_dir = _ivf_index_dir(sf_dir, k)
    if os.path.isdir(idx_dir):
        return idx_dir, centroids

    emb = _read_emb(sf_dir, ["vec_id", "embedding"])

    def assign(b: pa.Table) -> pa.Table:
        _, mat = _emb_matrix(b)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        lists = np.argmax((mat / norms[:, None]) @ centroids.T, axis=1)
        return b.append_column("ivf_list",
                               pa.array(lists, type=pa.int64()))

    tmp_dir = idx_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    emb.map_batches(assign, batch_format="pyarrow") \
        .write_parquet(tmp_dir, partition_cols=["ivf_list"])
    try:
        os.rename(tmp_dir, idx_dir)  # atomic publish
    except OSError:
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return idx_dir, centroids


def embeddings_ann_ivf_top10(sf_dir: str, nprobe: int = 4):
    """Top-10 cosine neighbors of vec_id 0 via the IVF index: score the
    query against the coarse centroids, read ONLY the nprobe nearest
    lists' partitions, exact cosine within them."""
    import glob

    import pyarrow.dataset as pads
    import ray.data as rd

    idx_dir, centroids = build_ivf_index(sf_dir)
    q_tbl = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")) \
        .to_table(filter=pads.field("vec_id") == 0, columns=["embedding"])
    q = np.asarray(q_tbl.column("embedding")[0].as_py(), dtype=np.float64)
    qn = q / np.linalg.norm(q)
    probe = np.argsort(-(centroids @ qn))[:nprobe]

    files = [f for c in probe
             for f in sorted(glob.glob(
                 os.path.join(idx_dir, f"ivf_list={int(c)}", "*.parquet")))]
    if not files:
        import pandas as pd
        return rd.from_pandas(pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"),
             "sim": pd.Series([], dtype="float64")}))
    candidates = rd.read_parquet(files)

    def sim(b: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(b)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qn) / norms
        keep = ids != 0
        return pa.Table.from_pydict({
            "vec_id": pa.array(ids[keep], type=pa.int64()),
            "sim": pa.array(np.round(sims[keep], 6), type=pa.float64())})

    return (candidates.map_batches(sim, batch_format="pyarrow")
            .sort(["sim", "vec_id"], descending=[True, False])
            .limit(10))


# -- int8 scalar quantization (the PQ/SQ compression step of a vector store) --

def embeddings_sq8_error(sf_dir: str):
    """Per-vector int8 scalar quantization with reconstruction-error
    stats — the compression pass a 100-TB vector store runs before
    ANN indexing (4× smaller than float32, ~8× smaller than float64).

    q_i = round_half_away(127 * x_i / scale), scale = max|x_i|; output
    (vec_id, scale, max_abs_err, mean_abs_err) rounded to 6 digits.
    Map-only: one numpy pass per batch, nothing shuffles but the output.
    Rounding is sign * floor(|y| + 0.5) to match SQL ROUND (numpy's
    np.round is half-even and diverges on exact .5 boundaries)."""
    emb = _read_emb(sf_dir, ["vec_id", "embedding"])

    def stats(b: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(b)
        scale = np.abs(mat).max(axis=1)
        safe = np.where(scale == 0.0, 1.0, scale)[:, None]
        y = 127.0 * mat / safe
        q = np.sign(y) * np.floor(np.abs(y) + 0.5)
        err = np.abs(mat - q * safe / 127.0)
        err[scale == 0.0, :] = 0.0
        return pa.Table.from_pydict({
            "vec_id": pa.array(ids, type=pa.int64()),
            "scale": pa.array(np.round(scale, 6), type=pa.float64()),
            "max_abs_err": pa.array(np.round(err.max(axis=1), 6),
                                    type=pa.float64()),
            "mean_abs_err": pa.array(
                np.round(err.sum(axis=1) / mat.shape[1], 6),
                type=pa.float64())})

    return (emb.map_batches(stats, batch_format="pyarrow")
            .sort("vec_id"))


SQL_EMBEDDINGS_SQ8_ERROR = """
WITH s AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                       x -> abs(x)), 'max') AS scale
  FROM embeddings
)
SELECT vec_id, round(scale, 6) AS scale,
  CASE WHEN scale = 0 THEN 0.0 ELSE round(list_aggregate(
    list_transform(emb, x -> abs(x - round(127*x/scale)*scale/127)),
    'max'), 6) END AS max_abs_err,
  CASE WHEN scale = 0 THEN 0.0 ELSE round(list_aggregate(
    list_transform(emb, x -> abs(x - round(127*x/scale)*scale/127)),
    'sum') / len(emb), 6) END AS mean_abs_err
FROM s ORDER BY vec_id
"""


# -- hybrid related-document retrieval (lexical + vector score fusion) -------

def documents_related_topk(sf_dir: str, query_id: int = 0, k: int = 10,
                           w_cos: float = 0.7, w_jac: float = 0.3,
                           num_partitions: int = 8):
    """Top-k documents most related to a query document, scored by a
    weighted fusion of embedding cosine and distinct-token Jaccard —
    the hybrid (vector + lexical) retrieval shape of a RAG corpus
    service.

    The query doc's embedding and distinct-token set broadcast into
    both map stages (tiny); cosine and Jaccard are each MAP-ONLY passes
    over their own table (one numpy matvec per batch; one polars
    explode→is_in→fold per batch), fused by one inner hash join on the
    dense shared id, then sort+limit. Ranking uses the 6-digit rounded
    score with id tiebreak so the k-boundary is deterministic
    cross-engine."""
    import ray.data as rd

    from ..stages.exchange import polars_capped

    # -- broadcast sides (one tiny read each, driver-held) ------------
    emb0 = (rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding"])
            .filter(expr=f"vec_id == {int(query_id)}").take(1))
    qv = np.asarray(emb0[0]["embedding"], dtype=np.float64)
    qv = qv / np.linalg.norm(qv)
    doc0 = (rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
            .filter(expr=f"doc_id == {int(query_id)}").take(1))
    import re as _re
    qtoks = sorted(set(_re.findall("[a-zA-ZÀ-ÿ]+",
                                   (doc0[0]["text"] or "").lower())))
    nq = len(qtoks)

    def cos(b: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(b)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        c = (mat @ qv) / norms
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "cosine": pa.array(c, type=pa.float64())})

    def jac(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        # explode DISTINCT tokens; an empty token list explodes to one
        # null row, so zero-token docs stay in the output with
        # jaccard 0 (the SQL keeps them through its join too)
        ex = (pl.from_arrow(b).select(
            "doc_id",
            tok=pl.col("text").fill_null("").str.to_lowercase()
            .str.extract_all("[a-zA-ZÀ-ÿ]+").list.unique())
            .explode("tok")
            .with_columns(
                v=pl.col("tok").is_not_null(),
                hit=pl.col("tok").is_in(qtoks).fill_null(False)))
        g = ex.group_by("doc_id").agg(
            nd=pl.col("v").sum().cast(pl.Int64),
            ni=pl.col("hit").sum().cast(pl.Int64))
        g = g.with_columns(
            jaccard=pl.when(pl.col("nd") + nq - pl.col("ni") > 0)
            .then(pl.col("ni") / (1.0 * (pl.col("nd") + nq
                                         - pl.col("ni"))))
            .otherwise(0.0))
        return (g.select("doc_id", "jaccard").to_arrow()
                .cast(pa.schema([("doc_id", pa.int64()),
                                 ("jaccard", pa.float64())])))

    emb = (rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                           columns=["vec_id", "embedding"])
           .map_batches(cos, batch_format="pyarrow"))
    docs = (rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
            .map_batches(jac, batch_format="pyarrow"))

    fused = emb.join(docs, join_type="inner",
                     num_partitions=num_partitions, on=("doc_id",))

    def score(b: pa.Table) -> pa.Table:
        s = (w_cos * b.column("cosine").to_numpy(zero_copy_only=False)
             + w_jac * b.column("jaccard").to_numpy(
                 zero_copy_only=False))
        b = b.append_column("score",
                            pa.array(np.round(s, 6), type=pa.float64()))
        keep = pc.not_equal(b.column("doc_id"),
                            pa.scalar(int(query_id), type=pa.int64()))
        return b.filter(keep).select(["doc_id", "score"])

    return (fused.map_batches(score, batch_format="pyarrow")
            .sort(["score", "doc_id"], descending=[True, False])
            .limit(k))


SQL_DOCUMENTS_RELATED_TOPK = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = 0
),
qt AS (
  SELECT list_distinct(regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-zA-ZÀ-ÿ]+')) AS qtoks
  FROM documents WHERE doc_id = 0
),
dt AS (
  SELECT doc_id,
         list_distinct(regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-zA-ZÀ-ÿ]+')) AS toks
  FROM documents
),
scored AS (
  SELECT e.vec_id AS doc_id,
    round(0.7 * list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                       q.qv)
        + 0.3 * (CASE WHEN len(dt.toks) + len(qt.qtoks)
                           - len(list_intersect(dt.toks, qt.qtoks)) > 0
                 THEN len(list_intersect(dt.toks, qt.qtoks))
                      / (1.0 * (len(dt.toks) + len(qt.qtoks)
                                - len(list_intersect(dt.toks,
                                                     qt.qtoks))))
                 ELSE 0.0 END), 6) AS score
  FROM embeddings e, q, qt
  JOIN dt ON dt.doc_id = e.vec_id
  WHERE e.vec_id <> 0
)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


# -- distributed PCA (two-pass moments → broadcast projection) ---------------

def _pca_model(sf_dir: str, d: int) -> tuple[np.ndarray, np.ndarray]:
    """Fit PCA distributed: pass 1 folds each block into (n, Σx, ΣxxT)
    moment partials — one row per block, dim²-sized regardless of block
    rows — and the tiny partial table combines on the driver (it is the
    reduced result; dim=64 → 4 KB per block). Eigendecomposition of the
    covariance runs on the driver (dim × dim, constant in corpus size).
    Eigenvector signs are fixed so the largest-|loading| coordinate is
    positive — deterministic across runs and BLAS builds."""

    def moments(b: pa.Table) -> pa.Table:
        _, mat = _emb_matrix(b)
        return pa.Table.from_pydict({
            "n": pa.array([len(mat)], type=pa.int64()),
            "s1": pa.array([mat.sum(axis=0)]),
            "s2": pa.array([(mat.T @ mat).ravel()]),
        })

    parts = (_read_emb(sf_dir, ["vec_id", "embedding"])
             .map_batches(moments, batch_format="pyarrow").to_pandas())
    n = int(parts["n"].sum())
    s1 = np.sum(np.stack(parts["s1"].to_numpy()), axis=0)
    dim = len(s1)
    s2 = np.sum(np.stack(parts["s2"].to_numpy()), axis=0).reshape(dim, dim)
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    top = evecs[:, ::-1][:, :d]                 # top-d components
    signs = np.sign(top[np.argmax(np.abs(top), axis=0),
                        np.arange(top.shape[1])])
    signs[signs == 0] = 1.0
    return mean, top * signs


def embeddings_pca_error(sf_dir: str, d: int = 8):
    """Per-vector PCA reconstruction error with a rank-d model — the
    dimensionality-reduction prep pass (and its quality audit) of an
    embedding pipeline. Model fit is the distributed two-pass above;
    scoring is a pure map: (mean, components) broadcast via ray.put
    once, one matmul per batch. Output: (vec_id, err) with err =
    ‖x - x̂‖₂ rounded to 6 dp. Non-SQL (eigendecomposition); exactness
    vs a serial full-corpus PCA with the identical sign rule is pinned
    in tests/test_ray_stages.py::test_pca_error_matches_serial."""
    import ray

    ref = ray.put(_pca_model(sf_dir, d))

    def score(b: pa.Table) -> pa.Table:
        import ray as _ray
        mean, comps = _ray.get(ref)
        ids, mat = _emb_matrix(b)
        centered = mat - mean
        recon = (centered @ comps) @ comps.T
        err = np.linalg.norm(centered - recon, axis=1)
        return pa.Table.from_pydict({
            "vec_id": pa.array(ids.astype(np.int64)),
            "err": pa.array(np.round(err, 6), type=pa.float64())})

    return (_read_emb(sf_dir, ["vec_id", "embedding"])
            .map_batches(score, batch_format="pyarrow")
            .sort("vec_id"))


# -- IVF + int8 codes: the compressed-index scale path -----------------------

def _ivf_sq8_index_dir(sf_dir: str, k: int) -> str:
    import hashlib
    src = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.sha1(
        f"ivfsq8|{os.path.abspath(src)}|{os.path.getmtime(src)}|{k}|{_SEED}"
        .encode()).hexdigest()[:16]
    return os.path.join(_ANN_INDEX_ROOT, tag)


def build_ivf_sq8_index(sf_dir: str,
                        sample_rows: int = 8192) -> tuple[str, np.ndarray]:
    """IVF layout with int8 scalar-quantized storage: the same coarse
    quantizer and hive partitioning as `build_ivf_index`, but each list
    stores (vec_id, code: list<int8>, scale: float64) instead of the raw
    floats — 4× smaller on disk and in the probe reads, the compression a
    100-TB vector store actually ships. Per-vector symmetric quantization
    (code = round(x / scale), scale = max|x| / 127); cosine scoring needs
    no dequantization pass beyond code × scale inside the matmul."""
    import shutil

    src = os.path.join(sf_dir, "embeddings.parquet")
    k, centroids = _train_coarse_quantizer(src, sample_rows)
    idx_dir = _ivf_sq8_index_dir(sf_dir, k)
    if os.path.isdir(idx_dir):
        return idx_dir, centroids

    emb = _read_emb(sf_dir, ["vec_id", "embedding"])

    def assign_quantize(b: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(b)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        lists = np.argmax((mat / norms[:, None]) @ centroids.T, axis=1)
        scale = np.abs(mat).max(axis=1) / 127.0
        safe = np.where(scale == 0, 1.0, scale)
        # shared half-AWAY rule (matches embeddings_sq8_error exactly;
        # plain floor(y+0.5) is half-UP and flips negative .5 boundaries)
        y = mat / safe[:, None]
        code = np.clip(np.sign(y) * np.floor(np.abs(y) + 0.5),
                       -127, 127).astype(np.int8)
        dim = mat.shape[1]
        return pa.Table.from_pydict({
            "vec_id": pa.array(ids.astype(np.int64)),
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(code.ravel(), type=pa.int8()), dim),
            "scale": pa.array(scale, type=pa.float64()),
            "ivf_list": pa.array(lists, type=pa.int64())})

    tmp_dir = idx_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    emb.map_batches(assign_quantize, batch_format="pyarrow") \
        .write_parquet(tmp_dir, partition_cols=["ivf_list"])
    try:
        os.rename(tmp_dir, idx_dir)  # atomic publish
    except OSError:
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return idx_dir, centroids


def embeddings_ann_ivf_sq8_top10(sf_dir: str, nprobe: int = 4):
    """Top-10 cosine neighbors of vec_id 0 from the COMPRESSED index:
    probe the nprobe nearest lists, score int8 codes directly (scale
    cancels in cosine up to sign; kept for reconstruction consumers)."""
    import glob

    import pyarrow.dataset as pads
    import ray.data as rd

    idx_dir, centroids = build_ivf_sq8_index(sf_dir)
    q_tbl = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")) \
        .to_table(filter=pads.field("vec_id") == 0, columns=["embedding"])
    q = np.asarray(q_tbl.column("embedding")[0].as_py(), dtype=np.float64)
    qn = q / np.linalg.norm(q)
    probe = np.argsort(-(centroids @ qn))[:nprobe]

    files = [f for c in probe
             for f in sorted(glob.glob(
                 os.path.join(idx_dir, f"ivf_list={int(c)}", "*.parquet")))]
    if not files:
        import pandas as pd
        return rd.from_pandas(pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"),
             "sim": pd.Series([], dtype="float64")}))
    candidates = rd.read_parquet(files)

    def sim(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        codes = b.column("code").combine_chunks()
        mat = (codes.flatten().to_numpy(zero_copy_only=False)
               .astype(np.float64, copy=False).reshape(len(codes), -1))
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qn) / norms
        keep = ids != 0
        return pa.Table.from_pydict({
            "vec_id": pa.array(ids[keep], type=pa.int64()),
            "sim": pa.array(np.round(sims[keep], 6), type=pa.float64())})

    return (candidates.map_batches(sim, batch_format="pyarrow")
            .sort(["sim", "vec_id"], descending=[True, False])
            .limit(10))


# -- batched multi-query exact top-k (broadcast query matrix) ----------------

_BATCH_QUERY_IDS = (0, 1, 2, 3)


def embeddings_batch_cosine_topk(sf_dir: str,
                                 query_ids: tuple[int, ...]
                                 = _BATCH_QUERY_IDS,
                                 k: int = 5):
    """Exact top-k neighbors for a BATCH of query vectors in one corpus
    pass: the query matrix is fetched driver-side (predicate-pushdown
    read), broadcast once via ray.put, and every block scores all
    queries with a single matmul. Per-block partial top-k per query
    (on the 6-dp-rounded sim with vec_id tiebreak — the same total
    order the final rank uses, so the partial cut is exact) shrinks the
    exchange to blocks × |queries| × k rows; one tiny groupby ranks.
    Output: (query_id, vec_id, rank, sim)."""
    import ray
    import pyarrow.dataset as pads

    q_tbl = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")) \
        .to_table(filter=pads.field("vec_id").isin(list(query_ids)),
                  columns=["vec_id", "embedding"])
    q_ids, q_mat = _emb_matrix(q_tbl)
    qn = np.linalg.norm(q_mat, axis=1)
    qn[qn == 0] = 1.0
    ref = ray.put((q_ids.astype(np.int64), q_mat / qn[:, None]))

    def partial_topk(b: pa.Table) -> pa.Table:
        import ray as _ray
        ids, mat = _emb_matrix(b)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        qids, qunit = _ray.get(ref)
        sims = np.round((mat / norms[:, None]) @ qunit.T, 6)  # n × q
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(qids):
            keep = ids != qid
            cand_ids, cand = ids[keep], sims[keep, j]
            order = np.lexsort((cand_ids, -cand))[:k]
            out_q.append(np.full(len(order), qid))
            out_v.append(cand_ids[order])
            out_s.append(cand[order])
        return pa.Table.from_pydict({
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
            "sim": pa.array(np.concatenate(out_s), type=pa.float64())})

    def rank_group(g: pa.Table) -> pa.Table:
        vids = g.column("vec_id").to_numpy(zero_copy_only=False)
        sims = g.column("sim").to_numpy(zero_copy_only=False)
        order = np.lexsort((vids, -sims))[:k]
        return pa.Table.from_pydict({
            "query_id": g.column("query_id").take(order),
            "vec_id": pa.array(vids[order], type=pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1),
                             type=pa.int64()),
            "sim": pa.array(sims[order], type=pa.float64())})

    return (_read_emb(sf_dir, ["vec_id", "embedding"])
            .map_batches(partial_topk, batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(rank_group, batch_format="pyarrow")
            .sort(["query_id", "rank"]))


SQL_EMBEDDINGS_BATCH_COSINE_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (0, 1, 2, 3)),
sims AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.qe AS DOUBLE[])), 6) AS sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM sims)
SELECT query_id, vec_id, rank, sim FROM ranked
WHERE rank <= 5 ORDER BY query_id, rank
"""


def embeddings_mmr_top10(sf_dir: str, query_id: int = 0, k: int = 10,
                         lam: float = 0.7, m: int = 50):
    """Maximal-marginal-relevance diversified top-k retrieval
    (Carbonell & Goldstein 1998): rerank the exact cosine top-m
    candidate pool so each pick maximizes
    lam*sim(q,d) - (1-lam)*max_{s in selected} sim(d,s).

    Scale shape: the corpus pass is the SAME exact partial-top-k scan
    as embeddings_batch_cosine_topk (broadcast query, per-block matmul,
    per-block top-m cut on the 6-dp-rounded sim with vec_id tiebreak),
    carrying candidate EMBEDDINGS along so the rerank needs no second
    corpus read; the greedy selection is inherently sequential in k but
    runs over only m rows (constant, independent of corpus size) inside
    one final map_groups. Output: (rank, vec_id, sim, mmr_score).
    No SQL oracle (iterative greedy selection); planted-corpus pytest
    pins the diversity behavior and the sim ordering."""
    import ray
    import pyarrow.dataset as pads

    q_tbl = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")) \
        .to_table(filter=pads.field("vec_id") == query_id,
                  columns=["embedding"])
    _, q_mat = _emb_matrix(q_tbl.add_column(
        0, "vec_id", pa.array([query_id], type=pa.int64())))
    q_unit = q_mat[0] / (np.linalg.norm(q_mat[0]) or 1.0)
    ref = ray.put(q_unit)

    def partial(b: pa.Table) -> pa.Table:
        import ray as _ray
        ids, mat = _emb_matrix(b)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((mat / norms[:, None]) @ _ray.get(ref), 6)
        keep = np.flatnonzero(ids != query_id)
        order = keep[np.lexsort((ids[keep], -sims[keep]))[:m]]
        out = b.select(["vec_id", "embedding"]).take(pa.array(order))
        out = out.append_column("sim", pa.array(sims[order],
                                                type=pa.float64()))
        return out.append_column(
            "g", pa.array(np.zeros(len(order), dtype=np.int8)))

    def mmr_group(g: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(g)
        sims = g.column("sim").to_numpy(zero_copy_only=False)
        cut = np.lexsort((ids, -sims))[:m]  # global top-m from block partials
        ids, mat, sims = ids[cut], mat[cut], sims[cut]
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        pair = unit @ unit.T
        n = len(ids)
        picked = np.zeros(n, dtype=bool)
        max_to_sel = np.zeros(n)
        sel, scores = [], []
        for _ in range(min(k, n)):
            score = lam * sims - (1.0 - lam) * max_to_sel
            score[picked] = -np.inf
            # argmax with vec_id tiebreak: smallest id among maxima
            best_score = score.max()
            cand = np.flatnonzero(score == best_score)
            best = cand[np.argmin(ids[cand])]
            sel.append(best)
            scores.append(best_score)
            picked[best] = True
            max_to_sel = np.maximum(max_to_sel, pair[:, best])
        sel = np.asarray(sel)
        return pa.Table.from_pydict({
            "rank": pa.array(np.arange(1, len(sel) + 1), type=pa.int64()),
            "vec_id": pa.array(ids[sel], type=pa.int64()),
            "sim": pa.array(sims[sel], type=pa.float64()),
            "mmr_score": pa.array(np.asarray(scores), type=pa.float64())})

    return (_read_emb(sf_dir, ["vec_id", "embedding"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("g")
            .map_groups(mmr_group, batch_format="pyarrow")
            .sort("rank"))


# -- incremental IVF ingest: append new vectors without retraining --

def ivf_append(idx_dir: str, centroids: np.ndarray, new_emb) -> None:
    """Append new vectors to an EXISTING IVF layout with the quantizer
    FROZEN: assign each vector to its nearest coarse centroid and write
    additional parquet files into the same hive partitions (Ray's
    default APPEND save mode generates fresh unique file names, so old
    files are never touched and probe-readers see old+new). This is the
    incremental-ingest path of a vector store — O(new vectors), no
    index rebuild, recall on existing vectors untouched. A production
    deployment would stage the new files and flip a manifest for
    exactly-once visibility (the write-audit-publish pattern the
    exchange and compaction use); the layout itself is already
    append-structured."""
    def assign(b: pa.Table) -> pa.Table:
        _, mat = _emb_matrix(b)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        lists = np.argmax((mat / norms[:, None]) @ centroids.T, axis=1)
        return b.append_column("ivf_list",
                               pa.array(lists, type=pa.int64()))

    new_emb.map_batches(assign, batch_format="pyarrow") \
        .write_parquet(idx_dir, partition_cols=["ivf_list"])


def _ivf_append_demo_index(sf_dir: str) -> tuple[str, np.ndarray]:
    """Base-plus-increment IVF demo index (content-addressed cache):
    the base index is built over embeddings with vec_id % 10 != 7; the
    held-out slice is then ivf_append()ed. Deterministic, so the cache
    key needs only the source identity."""
    import hashlib
    import shutil

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd

    src = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.sha1(
        f"ivfapp|{os.path.abspath(src)}|{os.path.getmtime(src)}|{_SEED}"
        .encode()).hexdigest()[:16]
    root = os.path.join(_ANN_INDEX_ROOT, tag)
    base_path = os.path.join(root, "base.parquet")
    idx_dir = os.path.join(root, "index")

    if not os.path.isdir(idx_dir):
        os.makedirs(root, exist_ok=True)
        if not os.path.exists(base_path):
            full = pads.dataset(src).to_table(
                columns=["vec_id", "embedding"])
            ids = full.column("vec_id").to_numpy(zero_copy_only=False)
            pq.write_table(full.filter(pa.array(ids % 10 != 7)),
                           base_path + ".tmp")
            os.replace(base_path + ".tmp", base_path)
        k, centroids = _train_coarse_quantizer(base_path)
        tmp_dir = idx_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        base_ds = rd.read_parquet(base_path)

        def assign(b: pa.Table) -> pa.Table:
            _, mat = _emb_matrix(b)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            lists = np.argmax((mat / norms[:, None]) @ centroids.T,
                              axis=1)
            return b.append_column("ivf_list",
                                   pa.array(lists, type=pa.int64()))

        base_ds.map_batches(assign, batch_format="pyarrow") \
            .write_parquet(tmp_dir, partition_cols=["ivf_list"])

        # increment: the held-out slice, appended with quantizer frozen.
        # (Appending BEFORE the publish rename keeps the demo cache
        # all-or-nothing; a live deployment appends to the published dir
        # and flips a manifest — see ivf_append's docstring.)
        def held_out(b: pa.Table) -> pa.Table:
            ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 10 == 7))
        inc = (rd.read_parquet(src, columns=["vec_id", "embedding"])
               .map_batches(held_out, batch_format="pyarrow"))
        ivf_append(tmp_dir, centroids, inc)
        try:
            os.rename(tmp_dir, idx_dir)  # atomic publish
        except OSError:
            shutil.rmtree(tmp_dir, ignore_errors=True)
    else:
        _, centroids = _train_coarse_quantizer(base_path)
    return idx_dir, centroids


def embeddings_ann_ivf_appended_top10(sf_dir: str, nprobe: int = 4):
    """Top-10 for vec_id 0 via the base+appended IVF index — proves
    incrementally-ingested vectors are first-class citizens of the
    probe path (same partition layout, same sublinear reads). Held-out
    vec_id % 10 == 7 vectors are only reachable through the appended
    files. Rows-only for the driver; pytest pins appended-vector
    visibility and recall vs brute force."""
    import glob

    import pyarrow.dataset as pads
    import ray.data as rd

    idx_dir, centroids = _ivf_append_demo_index(sf_dir)
    q_tbl = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")) \
        .to_table(filter=pads.field("vec_id") == 0, columns=["embedding"])
    q = np.asarray(q_tbl.column("embedding")[0].as_py(), dtype=np.float64)
    qn = q / np.linalg.norm(q)
    probe = np.argsort(-(centroids @ qn))[:nprobe]

    files = [f for c in probe
             for f in sorted(glob.glob(
                 os.path.join(idx_dir, f"ivf_list={int(c)}", "*.parquet")))]
    if not files:
        import pandas as pd
        return rd.from_pandas(pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"),
             "sim": pd.Series([], dtype="float64")}))

    def sim(b: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(b)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qn) / norms
        keep = ids != 0
        return pa.Table.from_pydict({
            "vec_id": pa.array(ids[keep], type=pa.int64()),
            "sim": pa.array(np.round(sims[keep], 6), type=pa.float64())})

    return (rd.read_parquet(files)
            .map_batches(sim, batch_format="pyarrow")
            .sort(["sim", "vec_id"], descending=[True, False])
            .limit(10))


def embeddings_cluster_profile(sf_dir: str):
    """Topic-style clustering report over the embedding corpus: assign
    every vector to its nearest spherical-k-means centroid (the IVF
    coarse trainer, k ≈ √N, bounded unbiased sample) and report per
    cluster (cluster, n_vectors, mean_sim) where mean_sim is the mean
    cosine of members to their centroid — the cluster-cohesion
    diagnostic a SemDeDup/topic-balance pass reads before choosing
    per-cluster dedup thresholds.

    Scale shape: training reads a BOUNDED sample; assignment is
    map-only (one matmul per block against the broadcast centroid
    matrix); the exchange is per-block bincount PARTIALS of size k —
    never rows. Rows-only for the driver (k-means is not
    SQL-expressible); pytest pins mass conservation and cohesion on a
    planted corpus."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    src = os.path.join(sf_dir, "embeddings.parquet")
    k, centroids = _train_coarse_quantizer(src)
    ref = ray.put(centroids)

    def partial(b: pa.Table) -> pa.Table:
        import ray as _ray
        cents = _ray.get(ref)
        _, mat = _emb_matrix(b)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat / norms[:, None]) @ cents.T
        lists = np.argmax(sims, axis=1)
        best = sims[np.arange(len(lists)), lists]
        n = np.bincount(lists, minlength=k)
        s = np.bincount(lists, weights=best, minlength=k)
        nz = np.flatnonzero(n)
        return pa.Table.from_pydict({
            "cluster": pa.array(nz, type=pa.int64()),
            "n": pa.array(n[nz], type=pa.int64()),
            "sim_sum": pa.array(s[nz], type=pa.float64())})

    reduced = (rd.read_parquet(src, columns=["vec_id", "embedding"])
               .map_batches(partial, batch_format="pyarrow")
               .groupby("cluster")
               .aggregate(Sum("n", alias_name="n"),
                          Sum("sim_sum", alias_name="sim_sum"))
               .to_pandas())
    reduced = reduced.sort_values("cluster")
    return pa.table({
        "cluster": pa.array(reduced["cluster"].to_numpy(), pa.int64()),
        "n_vectors": pa.array(reduced["n"].to_numpy(), pa.int64()),
        "mean_sim": pa.array(
            np.round(reduced["sim_sum"].to_numpy()
                     / reduced["n"].to_numpy(), 6), pa.float64())})


# -- k-center coreset (greedy Gonzalez farthest-point selection) ---------------

def embeddings_kcenter_coreset(sf_dir: str, k: int = 8):
    """Diversity coreset: greedy k-center (Gonzalez farthest-point,
    the 2-approximation) over the embedding column — the diverse-subset
    selection step of data pruning / active-learning curation, where
    near-duplicate-heavy corpora waste the training budget.

    Distributed shape (k linear passes, O(n·k) distance work total):
    the dataset carries a running `dmin` column (distance to the
    nearest selected center so far); each round one map_batches folds
    in the distance to ONLY the newest center (not all centers — the
    running min makes each pass O(n·d)), a per-block argmax partial
    shrinks every block to one row, and the driver reduces the tiny
    (blocks × 1)-row partials to the global farthest point, which
    becomes the next center. Distances are Euclidean on L2-normalized
    vectors; ties break to the smallest vec_id, so selection is
    deterministic. The seed is the smallest vec_id (not a random
    draw — reproducibility over seeding nicety).

    Returns (order_idx, vec_id, radius): radius is the max dmin AT
    selection time, i.e. the coverage radius the selection just
    improved — non-increasing from order_idx 1 onward (asserted in
    tests); the seed row records the sentinel -1.0 (no coverage
    radius exists before any center).

    100-TB note: the per-round state is one broadcast center (d
    floats) and one scalar argmax; the base matrix + dmin column is
    materialized once and re-mapped k times. For k in the thousands
    you'd batch rounds (select the top-r spread-out partials per pass)
    — standard practice; k here is a curation-sized constant."""
    import ray
    import ray.data as rd

    emb = _read_emb(sf_dir, ["vec_id", "embedding"])

    def unitize(b: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(b)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        return pa.table({
            "vec_id": pa.array(ids.astype(np.int64)),
            "unit": pa.FixedSizeListArray.from_arrays(
                pa.array(unit.ravel(), pa.float32()), unit.shape[1]),
            "dmin": pa.array(np.full(len(ids), np.inf, np.float64))})

    base = emb.map_batches(unitize, batch_format="pyarrow").materialize()

    def _mat(b: pa.Table) -> np.ndarray:
        arr = b.column("unit").combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64, copy=False)
        return flat.reshape(len(arr), -1)

    def block_argmax(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b                        # keep the block schema
        d = b.column("dmin").to_numpy(zero_copy_only=False)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        best = np.lexsort((ids, -d))[0]      # max dmin, tie → min id
        return b.take(pa.array([int(best)]))

    selected = []
    # seed row: one block-local min-id partial per block, tiny reduce
    def block_seed(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        return b.take(pa.array([int(np.argmin(ids))]))

    seed = base.map_batches(block_seed, batch_format="pyarrow") \
        .to_pandas().sort_values("vec_id").iloc[0]
    cur_id = int(seed["vec_id"])
    cur_vec = np.asarray(seed["unit"], dtype=np.float64)
    cur_radius = float("inf")
    for round_i in range(k):
        selected.append({"order_idx": round_i, "vec_id": cur_id,
                         "radius": (-1.0 if round_i == 0
                                    else round(cur_radius, 6))})
        if round_i == k - 1:
            break
        c_ref = ray.put(cur_vec)

        def fold(b: pa.Table, _ref=c_ref) -> pa.Table:
            import ray as _ray
            if b.num_rows == 0:
                return b
            c = _ray.get(_ref)
            mat = _mat(b)
            d_new = np.linalg.norm(mat - c[None, :], axis=1)
            d = np.minimum(
                b.column("dmin").to_numpy(zero_copy_only=False), d_new)
            return b.set_column(b.schema.get_field_index("dmin"),
                                "dmin", pa.array(d, pa.float64()))

        base = base.map_batches(fold, batch_format="pyarrow") \
            .materialize()
        part = base.map_batches(block_argmax,
                                batch_format="pyarrow").to_pandas()
        part = part.sort_values(["dmin", "vec_id"],
                                ascending=[False, True]).iloc[0]
        cur_id = int(part["vec_id"])
        cur_vec = np.asarray(part["unit"], dtype=np.float64)
        cur_radius = float(part["dmin"])
        if cur_radius <= 0.0:
            # every remaining point coincides with a selected center
            # (k > distinct points): stop instead of emitting
            # duplicate vec_ids into the "diverse subset"
            break

    import pandas as pd
    return pd.DataFrame(selected)


# -- PQ (product quantization) ANN --------------------------------------------
# Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011: split each (L2-normalized) vector into m
# subvectors, k-means each subspace independently, store only the m
# uint8 centroid codes per vector (m bytes vs 4·dim). Queries score the
# WHOLE corpus through an m × ksub lookup table (ADC: asymmetric
# distance computation) — a compressed linear scan whose bandwidth is
# dim/ m·4 smaller than brute force — then exact-rerank the top
# candidates from the raw vectors. Complementary to the IVF and LSH
# indexes above: PQ compresses the scan itself rather than pruning it,
# and composes with IVF at real scale (IVF-PQ).


def _pq_index_dir(sf_dir: str, m: int, ksub: int) -> str:
    import hashlib
    src = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.sha1(
        f"pq|{os.path.abspath(src)}|{os.path.getmtime(src)}|{m}|{ksub}|"
        f"{_SEED}".encode()).hexdigest()[:16]
    return os.path.join(_ANN_INDEX_ROOT, tag)


def _kmeans_l2(sample: np.ndarray, k: int, iters: int = 12,
               seed: int = _SEED) -> np.ndarray:
    """Plain (euclidean) k-means on a bounded driver-side sample —
    PQ subspace codebooks are euclidean, unlike the spherical coarse
    quantizer (_kmeans_spherical), because subvectors of unit vectors
    are not themselves unit."""
    rng = np.random.RandomState(seed)
    if len(sample) == 0:
        raise ValueError("PQ training sample is empty")
    k = min(k, len(sample))
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(iters):
        # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
        d = (-2.0 * sample @ centroids.T
             + (centroids ** 2).sum(axis=1)[None, :])
        assign = np.argmin(d, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def _seeded_unit_sample(src: str, sample_rows: int = 8192) -> np.ndarray:
    """Deterministic unbiased L2-normalized sample (same seeded
    row-indices scheme as the IVF coarse quantizer)."""
    import pyarrow.dataset as pads

    n_vectors = pads.dataset(src).count_rows()
    n_sample = min(sample_rows, n_vectors)
    rng = np.random.RandomState(_SEED)
    idx = np.sort(rng.choice(n_vectors, size=n_sample, replace=False))
    arr = pads.dataset(src).take(idx, columns=["embedding"]) \
        .column("embedding").combine_chunks()
    sample = (arr.flatten().to_numpy(zero_copy_only=False)
              .astype(np.float64, copy=False).reshape(len(arr), -1))
    norms = np.linalg.norm(sample, axis=1)
    norms[norms == 0] = 1.0
    return sample / norms[:, None]


def _pq_codebooks(unit: np.ndarray, m: int, ksub: int) -> np.ndarray:
    """Codebooks (m, ksub, dsub) from per-subspace euclidean k-means
    over the given (already normalized / residualized) sample."""
    dim = unit.shape[1]
    if dim % m:
        raise ValueError(f"PQ m={m} must divide dim={dim}")
    dsub = dim // m
    return np.stack([
        _kmeans_l2(np.ascontiguousarray(unit[:, j * dsub:(j + 1) * dsub]),
                   ksub, seed=_SEED + j)
        for j in range(m)])


def _pq_train(src: str, m: int, ksub: int,
              sample_rows: int = 8192) -> np.ndarray:
    return _pq_codebooks(_seeded_unit_sample(src, sample_rows), m, ksub)


def build_pq_index(sf_dir: str, m: int = 4,
                   ksub: int = 256) -> tuple[str, np.ndarray]:
    """PQ build (once; content-addressed cache): train per-subspace
    codebooks on a bounded sample, then encode the corpus via a
    distributed map_batches pass into (vec_id, m uint8 codes) — the
    stored index is m bytes per vector. Codebooks are re-derived
    deterministically on reuse (seeded; cheaper than a sidecar file and
    impossible to desynchronize from the codes)."""
    import shutil

    src = os.path.join(sf_dir, "embeddings.parquet")
    codebooks = _pq_train(src, m, ksub)
    idx_dir = _pq_index_dir(sf_dir, m, ksub)
    if os.path.isdir(idx_dir):
        return idx_dir, codebooks

    dsub = codebooks.shape[2]
    cb_sq = (codebooks ** 2).sum(axis=2)  # (m, ksub)

    def encode(b: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(b)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        codes = np.empty((len(unit), len(codebooks)), dtype=np.uint8)
        for j in range(len(codebooks)):
            sub = unit[:, j * dsub:(j + 1) * dsub]
            d = -2.0 * sub @ codebooks[j].T + cb_sq[j][None, :]
            codes[:, j] = np.argmin(d, axis=1)
        return pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "codes": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), type=pa.uint8()),
                len(codebooks))})

    tmp_dir = idx_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    _read_emb(sf_dir, ["vec_id", "embedding"]) \
        .map_batches(encode, batch_format="pyarrow") \
        .write_parquet(tmp_dir)
    try:
        os.rename(tmp_dir, idx_dir)  # atomic publish
    except OSError:
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return idx_dir, codebooks


def embeddings_ann_pq_top10(sf_dir: str, k: int = 10, m: int = 4,
                            ksub: int = 256, rerank: int = 50):
    """Top-k cosine neighbors of vec_id 0 via the PQ codes: ADC lookup
    table scan over the compressed index (distributed; m bytes/vector of
    scan bandwidth), per-block top-`rerank` partials, then an exact
    cosine re-rank of the global candidate pool from the raw vectors.
    The candidate pool is `rerank`-sized — driver-bounded by a constant,
    never by the corpus."""
    import pyarrow.dataset as pads
    import ray.data as rd

    idx_dir, codebooks = build_pq_index(sf_dir, m, ksub)
    src = os.path.join(sf_dir, "embeddings.parquet")
    q_tbl = pads.dataset(src).to_table(
        filter=pads.field("vec_id") == 0, columns=["embedding"])
    q = np.asarray(q_tbl.column("embedding")[0].as_py(), dtype=np.float64)
    qn = q / np.linalg.norm(q)
    dsub = codebooks.shape[2]
    # ADC table: lut[j, c] = <q_j, codebook[j][c]> — cosine of unit
    # vectors decomposes as the sum of per-subspace inner products
    lut = np.stack([codebooks[j] @ qn[j * dsub:(j + 1) * dsub]
                    for j in range(len(codebooks))])

    def scan(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        codes = (b.column("codes").combine_chunks().flatten()
                 .to_numpy(zero_copy_only=False)
                 .reshape(len(ids), len(codebooks)))
        score = np.zeros(len(ids))
        for j in range(len(codebooks)):
            score += lut[j][codes[:, j]]
        keep = ids != 0
        ids, score = ids[keep], score[keep]
        top = np.argsort(-score)[:rerank]
        return pa.table({"vec_id": pa.array(ids[top], type=pa.int64()),
                         "adc": pa.array(score[top], type=pa.float64())})

    import ray
    pool = (rd.read_parquet(idx_dir)
            .map_batches(scan, batch_format="pyarrow")
            .sort("adc", descending=True)
            .limit(rerank))
    cand_ids = pa.concat_tables(
        ray.get(pool.to_arrow_refs())).column("vec_id").combine_chunks()

    return _exact_rerank(src, qn, cand_ids, k)


def _exact_rerank(src: str, qn: np.ndarray, cand_ids, k: int):
    """Exact-cosine re-rank of a constant-size candidate pool: read ONLY
    the candidate rows (predicate pushdown; at real scale the raw table
    is vec_id-sorted so this prunes to a handful of row groups)."""
    import pandas as pd
    import pyarrow.dataset as pads
    import ray.data as rd

    exact = pads.dataset(src).to_table(
        filter=pads.field("vec_id").isin(cand_ids),
        columns=["vec_id", "embedding"])
    ids, mat = _emb_matrix(exact)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    sims = np.round((mat @ qn) / norms, 6)
    order = np.lexsort((ids, -sims))[:k]
    return rd.from_pandas(pd.DataFrame({
        "vec_id": ids[order].astype(np.int64),
        "sim": sims[order]}))


# -- IVF-PQ: coarse pruning × residual compression -----------------------------
# The composition actually deployed at 100-TB vector scale (Jégou et
# al. 2011 §IV; FAISS IVFPQ): the coarse quantizer prunes the scan to
# nprobe inverted lists, and within each list vectors are PQ-encoded as
# RESIDUALS from their list centroid — residuals have far less variance
# than raw vectors, so the same code budget quantizes much finer. Query
# cost = nprobe × (list length × m byte-lookups) + constant rerank.


def _ivfpq_index_dir(sf_dir: str, k: int, m: int, ksub: int) -> str:
    import hashlib
    src = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.sha1(
        f"ivfpq|{os.path.abspath(src)}|{os.path.getmtime(src)}|{k}|{m}|"
        f"{ksub}|{_SEED}".encode()).hexdigest()[:16]
    return os.path.join(_ANN_INDEX_ROOT, tag)


def build_ivfpq_index(sf_dir: str, m: int = 4, ksub: int = 256,
                      sample_rows: int = 8192
                      ) -> tuple[str, np.ndarray, np.ndarray]:
    """IVF-PQ build (once; content-addressed cache): train the spherical
    coarse quantizer and the residual PQ codebooks on ONE bounded
    sample, then one distributed encode pass writes (vec_id, m uint8
    codes) hive-partitioned by inverted list. Models are re-derived
    deterministically on cache hits (seeded), so codes and codebooks
    can't desynchronize."""
    import shutil

    src = os.path.join(sf_dir, "embeddings.parquet")
    k, centroids = _train_coarse_quantizer(src, sample_rows)
    unit = _seeded_unit_sample(src, sample_rows)
    assign = np.argmax(unit @ centroids.T, axis=1)
    codebooks = _pq_codebooks(unit - centroids[assign], m, ksub)

    idx_dir = _ivfpq_index_dir(sf_dir, k, m, ksub)
    if os.path.isdir(idx_dir):
        return idx_dir, centroids, codebooks

    dsub = codebooks.shape[2]
    cb_sq = (codebooks ** 2).sum(axis=2)

    def encode(b: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(b)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        u = mat / norms[:, None]
        lists = np.argmax(u @ centroids.T, axis=1)
        resid = u - centroids[lists]
        codes = np.empty((len(u), len(codebooks)), dtype=np.uint8)
        for j in range(len(codebooks)):
            sub = resid[:, j * dsub:(j + 1) * dsub]
            d = -2.0 * sub @ codebooks[j].T + cb_sq[j][None, :]
            codes[:, j] = np.argmin(d, axis=1)
        return pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "ivf_list": pa.array(lists, type=pa.int64()),
            "codes": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), type=pa.uint8()),
                len(codebooks))})

    tmp_dir = idx_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    _read_emb(sf_dir, ["vec_id", "embedding"]) \
        .map_batches(encode, batch_format="pyarrow") \
        .write_parquet(tmp_dir, partition_cols=["ivf_list"])
    try:
        os.rename(tmp_dir, idx_dir)  # atomic publish
    except OSError:
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return idx_dir, centroids, codebooks


def embeddings_ann_ivfpq_top10(sf_dir: str, k: int = 10, nprobe: int = 6,
                               m: int = 4, ksub: int = 256,
                               rerank: int = 50):
    """Top-k cosine neighbors of vec_id 0 via IVF-PQ: read ONLY the
    nprobe nearest lists' code partitions, ADC-score their residual
    codes (score = ⟨q, c_list⟩ + Σ_j lut[j, code_j], the cosine
    decomposition under residual encoding), keep per-block top-`rerank`
    partials, exact-rerank the constant-size global pool from the raw
    vectors. Sublinear probe AND compressed scan."""
    import glob

    import pyarrow.dataset as pads
    import ray
    import ray.data as rd

    idx_dir, centroids, codebooks = build_ivfpq_index(sf_dir, m, ksub)
    src = os.path.join(sf_dir, "embeddings.parquet")
    q_tbl = pads.dataset(src).to_table(
        filter=pads.field("vec_id") == 0, columns=["embedding"])
    q = np.asarray(q_tbl.column("embedding")[0].as_py(), dtype=np.float64)
    qn = q / np.linalg.norm(q)
    cscore = centroids @ qn
    probe = np.argsort(-cscore)[:nprobe]
    dsub = codebooks.shape[2]
    lut = np.stack([codebooks[j] @ qn[j * dsub:(j + 1) * dsub]
                    for j in range(len(codebooks))])
    def make_scan(offset: float):
        # the hive layout strips ivf_list from file contents, but every
        # file of one list shares the SAME centroid term — bake it into
        # the per-list scan closure instead of carrying a column
        def scan(b: pa.Table) -> pa.Table:
            ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            codes = (b.column("codes").combine_chunks().flatten()
                     .to_numpy(zero_copy_only=False)
                     .reshape(len(ids), len(codebooks)))
            score = np.full(len(ids), offset)
            for j in range(len(codebooks)):
                score += lut[j][codes[:, j]]
            keep = ids != 0
            ids, score = ids[keep], score[keep]
            top = np.argsort(-score)[:rerank]
            return pa.table({
                "vec_id": pa.array(ids[top], type=pa.int64()),
                "adc": pa.array(score[top], type=pa.float64())})
        return scan

    parts = []
    for c in probe:
        files = sorted(glob.glob(
            os.path.join(idx_dir, f"ivf_list={int(c)}", "*.parquet")))
        if files:
            parts.append(rd.read_parquet(files)
                         .map_batches(make_scan(float(cscore[c])),
                                      batch_format="pyarrow"))
    if not parts:
        import pandas as pd
        return rd.from_pandas(pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"),
             "sim": pd.Series([], dtype="float64")}))
    pool = parts[0]
    for p in parts[1:]:
        pool = pool.union(p)
    pool = pool.sort("adc", descending=True).limit(rerank)
    # the pool is ≤ rerank rows by construction — a constant-size
    # driver materialization (union+limit can emit schema-degenerate
    # empty blocks, so take_all beats concat of raw block refs here)
    cand_ids = pa.array([r["vec_id"] for r in pool.take_all()],
                        type=pa.int64())
    return _exact_rerank(src, qn, cand_ids, k)
