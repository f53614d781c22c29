"""Deterministic sampling / split / sequence-packing operators.

The training-data-curation surface a 100 TB corpus pipeline needs
(beyond-reference extension, SURVEY.md §2 extension table). Everything
here is *deterministic by key arithmetic* — no RNG state, so results
are reproducible across runs, resumable partitions, and cluster sizes,
and every operator is a pure `map_batches` (zero shuffles) except the
packing scan, whose only exchange is a tiny per-bucket-totals groupby.

- **Train/val/test split** (`documents_split_assign`): Knuth
  multiplicative hash of the key → percent bucket. The canonical "split
  by hash, not by position" pattern: stable under re-sharding and
  incremental corpus growth.
- **Stratified sampling** (`documents_stratified_sample`): per-stratum
  (language) keep-rates applied with an independent key hash —
  a mixture-weighting downsample as used for corpus balancing.
- **Sequence packing** (`documents_concat_chunks`): GPT-style
  concat-then-chunk: documents in key order are conceptually
  concatenated and sliced into fixed-capacity context windows; each doc
  gets its window span + offset. Distributed as a two-pass prefix scan:
  per-bucket totals (tiny groupby over contiguous key ranges) →
  exclusive scan over bucket totals (driver-side, |buckets| rows) →
  broadcast offsets + vectorized in-bucket cumsum. Integer arithmetic
  throughout → bit-identical to the single-node window-function oracle.

Column names match the oracle SQL aliases exactly (driver hash-compare
sorts columns by name).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .relational import _read

# Knuth multiplicative constants (public domain, TAOCP vol. 3); both
# fit 64-bit signed products for doc_id < 2^31, matching the BIGINT
# arithmetic of the SQL oracle (no unsigned wraparound on either side).
_SPLIT_MULT = 2654435761
_SAMPLE_MULT = 2246822519
_M32 = 1 << 32


def _pct_hash(ids: np.ndarray, mult: int, mod: int) -> np.ndarray:
    return ((ids * mult) % _M32) % mod


# -- train/val/test split ---------------------------------------------------

def documents_split_assign(sf_dir: str, train_pct: int = 80,
                           val_pct: int = 10):
    """Assign every document to train/val/test by key hash.

    Pure map over the scan — at 100 TB this adds one int64 column and
    never shuffles; the split is a property of the key, not the shard."""
    def assign(b: pa.Table) -> pa.Table:
        h = _pct_hash(b.column("doc_id").to_numpy(), _SPLIT_MULT, 100)
        split = np.where(h < train_pct, "train",
                         np.where(h < train_pct + val_pct, "val", "test"))
        return pa.table({"doc_id": b.column("doc_id"),
                         "lang": b.column("lang"),
                         "split": pa.array(split)})

    return (_read(sf_dir, "documents", ["doc_id", "lang"])
            .map_batches(assign, batch_format="pyarrow")
            .sort("doc_id"))


SQL_DOCUMENTS_SPLIT_ASSIGN = """
SELECT doc_id, lang,
       CASE WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 80
                THEN 'train'
            WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 90
                THEN 'val'
            ELSE 'test' END AS split
FROM documents ORDER BY doc_id
"""


# -- stratified (per-language) downsample -----------------------------------

# keep-rates per mille per stratum: corpus-balancing mixture weights
# (dominant language downsampled hardest).
_LANG_RATE_PMIL = {"en": 300, "de": 700, "es": 700, "fr": 700, "zh": 700}
_DEFAULT_RATE_PMIL = 500


def documents_stratified_sample(sf_dir: str):
    """Keep each document with its language's deterministic keep-rate.

    The rate table is a constant (broadcast-by-closure: bytes, not a
    shuffle); the filter is a vectorized map over the scan."""
    known = pa.array(list(_LANG_RATE_PMIL))
    known_rates = np.fromiter(_LANG_RATE_PMIL.values(), dtype=np.int64)

    def keep(b: pa.Table) -> pa.Table:
        h = _pct_hash(b.column("doc_id").to_numpy(), _SAMPLE_MULT, 1000)
        idx = pc.index_in(b.column("lang").combine_chunks(),
                          value_set=known).fill_null(-1) \
            .to_numpy(zero_copy_only=False)
        rates = np.where(idx >= 0, known_rates[np.maximum(idx, 0)],
                         _DEFAULT_RATE_PMIL)
        return b.select(["doc_id", "lang"]).filter(pa.array(h < rates))

    return (_read(sf_dir, "documents", ["doc_id", "lang"])
            .map_batches(keep, batch_format="pyarrow")
            .sort("doc_id"))


SQL_DOCUMENTS_STRATIFIED_SAMPLE = """
SELECT doc_id, lang FROM documents
WHERE ((doc_id * 2246822519) % 4294967296) % 1000 <
      CASE lang WHEN 'en' THEN 300 WHEN 'de' THEN 700 WHEN 'es' THEN 700
                WHEN 'fr' THEN 700 WHEN 'zh' THEN 700 ELSE 500 END
ORDER BY doc_id
"""


# -- fixed-size uniform sample (hash order) ---------------------------------

def documents_uniform_k_sample(sf_dir: str, k: int = 100):
    """Deterministic uniform k-sample: the k documents with the smallest
    key hash. Equivalent to a seeded ORDER BY random() LIMIT k but
    reproducible and mergeable: each block pre-selects its local
    k-smallest (vectorized argpartition), so the final sort+limit sees
    at most k rows per block instead of the corpus."""
    def local_topk(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        h = _pct_hash(ids, _SAMPLE_MULT, _M32)
        t = pa.table({"doc_id": b.column("doc_id"),
                      "lang": b.column("lang"),
                      "h": pa.array(h)})
        if len(t) <= k:
            return t
        keep = np.argpartition(h, k)[:k]
        return t.take(pa.array(np.sort(keep)))

    return (_read(sf_dir, "documents", ["doc_id", "lang"])
            .map_batches(local_topk, batch_format="pyarrow")
            .sort(["h", "doc_id"])
            .limit(k))


SQL_DOCUMENTS_UNIFORM_K_SAMPLE = """
SELECT doc_id, lang,
       ((doc_id * 2246822519) % 4294967296) AS h
FROM documents ORDER BY h, doc_id LIMIT 100
"""


def documents_per_source_cap(sf_dir: str, k: int = 10):
    """Per-domain quota: keep at most k documents per source, selected
    by key-hash order (unbiased w.r.t. shard position — the per-domain
    cap step of web-corpus curation, so no single domain dominates the
    mixture). Combiner shape: each block pre-selects its local
    k-smallest hashes PER SOURCE (the shuffle then carries ≤ k rows per
    (source, block)); the exact per-source top-k closes inside one
    source groupby."""
    import pandas as pd

    from ..stages.exchange import polars_capped

    def local_topk(b: pa.Table) -> pa.Table:
        h = _pct_hash(b.column("doc_id").to_numpy(), _SAMPLE_MULT, _M32)
        pl = polars_capped()
        df = pl.from_arrow(pa.table({
            "doc_id": b.column("doc_id"),
            "source": b.column("source"),
            "h": pa.array(h)}))
        return (df.sort(["h", "doc_id"])
                .group_by("source", maintain_order=True).head(k)
                .to_arrow())

    def exact_topk(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["h", "doc_id"]).head(k)
        return df[["doc_id", "source"]]

    return (_read(sf_dir, "documents", ["doc_id", "source"])
            .map_batches(local_topk, batch_format="pyarrow")
            .groupby("source")
            .map_groups(exact_topk, batch_format="pandas")
            .sort("doc_id"))


SQL_DOCUMENTS_PER_SOURCE_CAP = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
             PARTITION BY source
             ORDER BY ((doc_id * 2246822519) % 4294967296), doc_id)
             AS rn
  FROM documents)
WHERE rn <= 10
ORDER BY doc_id
"""


# -- weighted mixture interleave --------------------------------------------

def documents_mixture_interleave(sf_dir: str):
    """Deterministic weighted interleave across sources: the training
    order a mixture sampler would emit. Each source's documents get
    positions rank·1000 // weight (rank = 1-based doc_id order within
    the source), so a weight-2 source appears twice as densely as a
    weight-1 source in the global (pos, doc_id) order.

    The only exchange is the groupby(source) that ranks within each
    source (vectorized in one map_groups); the interleave itself is
    position arithmetic — no driver-side merge loop, no RNG."""
    import pandas as pd

    def rank_pos(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values("doc_id", kind="stable")
        w = _source_weight(df["source"].iloc[0])
        rank = np.arange(1, len(df) + 1, dtype=np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "source": df["source"].to_numpy(),
                             "pos": rank * 1000 // w})

    return (_read(sf_dir, "documents", ["doc_id", "source"])
            .groupby("source")
            .map_groups(rank_pos, batch_format="pandas")
            .sort(["pos", "doc_id"]))


def _source_weight(source: str) -> int:
    """Even-numbered sources are upsampled 2×: the stand-in for a
    per-source quality weight table (a constant broadcast in practice)."""
    import re
    m = re.search(r"\d+", source)  # FIRST digit run, like the SQL twin
    return 2 if m and int(m.group()) % 2 == 0 else 1


SQL_DOCUMENTS_MIXTURE_INTERLEAVE = r"""
SELECT doc_id, source,
       (row_number() OVER (PARTITION BY source ORDER BY doc_id) * 1000)
       // (CASE WHEN regexp_extract(source, '(\d+)', 1) <> ''
                 AND CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT)
                     % 2 = 0
                THEN 2 ELSE 1 END) AS pos
FROM documents ORDER BY pos, doc_id
"""


# -- GPT-style concat-then-chunk sequence packing ---------------------------

def documents_concat_chunks(sf_dir: str, capacity: int = 4096,
                            bucket_docs: int = 128):
    """Concatenate documents in doc_id order and slice into
    fixed-capacity context windows; emit each document's window span.

    Two-pass distributed prefix scan (the canonical pattern):
      1. per-bucket totals: bucket = doc_id // bucket_docs is a
         CONTIGUOUS key range, so per-batch partials + one tiny groupby
         give |buckets| rows (millions at 100 TB — still driver-safe
         as a single numpy scan);
      2. exclusive scan over sorted bucket totals → per-bucket global
         offsets, broadcast by closure; each bucket then sorts its own
         rows and cumsums locally (map_groups), adding the offset.

    At scale, set bucket_docs so a bucket's rows fit one worker
    (e.g. 1e5); correctness is independent of the setting because the
    arithmetic is exact integer addition in key order."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        bucket = pc.divide(b.column("doc_id"), pa.scalar(bucket_docs))
        t = pa.table({"bucket": bucket, "total": b.column("n_chars")})
        return (pa.TableGroupBy(t, "bucket").aggregate([("total", "sum")])
                .rename_columns(["bucket", "total"]))

    totals = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("bucket")
              .aggregate(Sum("total", alias_name="total")))
    tt = pa.concat_tables(
        [t for t in ray.get(totals.to_arrow_refs()) if len(t)])
    order = pc.sort_indices(tt.column("bucket"))
    buckets = tt.column("bucket").take(order).to_numpy()
    sums = tt.column("total").take(order).to_numpy()
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    offset_ref = ray.put((buckets, offsets))

    def pack(b: pa.Table) -> pa.Table:
        bk, off = ray.get(offset_ref)
        idx = pc.sort_indices(b.column("doc_id"))
        ids = b.column("doc_id").take(idx).to_numpy()
        n = b.column("n_chars").take(idx).to_numpy()
        bucket = ids // bucket_docs
        base = off[np.searchsorted(bk, bucket)]
        cum = np.cumsum(n) - n  # exclusive in-bucket prefix
        start = base + cum
        end = start + np.maximum(n, 1) - 1  # empty docs occupy their slot
        return pa.table({
            "doc_id": pa.array(ids),
            "chunk_start": pa.array(start // capacity),
            "chunk_end": pa.array(end // capacity),
            "chunk_offset": pa.array(start % capacity)})

    # groupby(bucket) co-locates each contiguous key range; pack() is
    # per-bucket-local so the cumsum never crosses workers.
    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bucket", pc.divide(b.column("doc_id"), pa.scalar(bucket_docs)))

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pack, batch_format="pyarrow")
            .sort("doc_id"))


SQL_DOCUMENTS_CONCAT_CHUNKS = """
WITH scanned AS (
  SELECT doc_id, n_chars,
         COALESCE(sum(n_chars) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS start_pos
  FROM documents
)
SELECT doc_id,
       CAST(start_pos // 4096 AS BIGINT) AS chunk_start,
       CAST((start_pos + greatest(n_chars, 1) - 1) // 4096 AS BIGINT)
           AS chunk_end,
       CAST(start_pos % 4096 AS BIGINT) AS chunk_offset
FROM scanned ORDER BY doc_id
"""


# -- weighted sample without replacement (A-ES / exponential keys) -----------

def documents_weighted_sample(sf_dir: str, k: int = 50):
    """Deterministic weighted sample of k docs, P(i) ∝ n_chars — the
    Efraimidis–Spirakis one-pass scheme: key_i = u_i^(1/w_i) with a
    deterministic uniform u_i from the key hash; the k largest keys are
    a weighted sample without replacement. Mergeable exactly like
    `documents_uniform_k_sample`: each block pre-selects its local
    top-k (argpartition), the global sort+limit sees ≤ k rows per
    block. One tiny exchange; no pass stores more than k rows."""
    def local_topk(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        w = np.maximum(b.column("n_chars").to_numpy(), 1).astype(np.float64)
        u = ((ids * _SAMPLE_MULT) % _M32 + 1.0) / (_M32 + 1.0)
        key = u ** (1.0 / w)
        t = pa.table({"doc_id": b.column("doc_id"),
                      "n_chars": b.column("n_chars"),
                      "key": pa.array(key)})
        if len(t) <= k:
            return t
        keep = np.argpartition(-key, k)[:k]
        return t.take(pa.array(np.sort(keep)))

    return (_read(sf_dir, "documents", ["doc_id", "n_chars"])
            .map_batches(local_topk, batch_format="pyarrow")
            .sort(["key", "doc_id"], descending=[True, False])
            .limit(k)
            .select_columns(["doc_id", "n_chars"]))


SQL_DOCUMENTS_WEIGHTED_SAMPLE = """
SELECT doc_id, n_chars FROM documents
ORDER BY pow((((doc_id * 2246822519) % 4294967296) + 1.0) / 4294967297.0,
             1.0 / greatest(n_chars, 1)) DESC, doc_id
LIMIT 50
"""


# -- deterministic epoch shuffle ----------------------------------------------

def documents_epoch_shuffle(sf_dir: str, epoch: int = 1,
                            n_buckets: int = 4096):
    """Assign every document its position in a DETERMINISTIC epoch-`epoch`
    training order — the reshuffle-each-epoch a trainer needs, computed
    as data (reproducible, resumable, auditable) instead of an opaque
    `random_shuffle()`: position = rank of the Knuth multiplicative
    hash of (doc_id + epoch), doc_id tiebreak.

    Global rank without a global sort-then-number: hash-value buckets
    are CONTIGUOUS ranges of the shuffled order, so the two-pass prefix
    scan of documents_concat_chunks applies verbatim — per-bucket
    counts + exclusive scan give each bucket its global offset, then
    `groupby(bucket).map_groups` ranks locally (sort by (h, doc_id) +
    arange). At 100 TB size n_buckets so one bucket fits a worker;
    the hash is uniform, so buckets are balanced by construction.
    BIGINT caveat shared with the SQL oracle: (doc_id+epoch)·2654435761
    must stay under 2^63 (doc_id < ~3.5e9); wrap to a uint64 hash
    before that scale."""
    import ray
    from ray.data.aggregate import Sum

    mult = np.uint64(2654435761)
    mod = np.uint64(2 ** 32)
    width = (2 ** 32) // n_buckets

    def h_of(ids: np.ndarray) -> np.ndarray:
        return ((ids.astype(np.uint64) + np.uint64(epoch)) * mult) % mod

    ds = _read(sf_dir, "documents", ["doc_id"])

    def count_partial(b: pa.Table) -> pa.Table:
        bk = (h_of(b.column("doc_id").to_numpy()) // width) \
            .astype(np.int64)
        v, n = np.unique(bk, return_counts=True)
        return pa.table({"bucket": pa.array(v),
                         "n": pa.array(n.astype(np.int64))})

    totals = (ds.map_batches(count_partial, batch_format="pyarrow")
              .groupby("bucket").aggregate(Sum("n", alias_name="n")))
    tt = pa.concat_tables(
        [t for t in ray.get(totals.to_arrow_refs()) if len(t)])
    order = pc.sort_indices(tt.column("bucket"))
    buckets = tt.column("bucket").take(order).to_numpy()
    counts = tt.column("n").take(order).to_numpy()
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    offset_ref = ray.put((buckets, offsets))

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        h = h_of(ids)
        return pa.table({"doc_id": b.column("doc_id"),
                         "h": pa.array(h.astype(np.int64)),
                         "bucket": pa.array((h // width)
                                            .astype(np.int64))})

    def local_rank(df) -> "pa.Table":
        bk, off = __import__("ray").get(offset_ref)
        df = df.sort_values(["h", "doc_id"], kind="mergesort")
        base = off[np.searchsorted(bk, df["bucket"].iloc[0])]
        import pandas as pd
        return pd.DataFrame({
            "pos": base + np.arange(len(df), dtype=np.int64),
            "doc_id": df["doc_id"].to_numpy()})

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(local_rank, batch_format="pandas")
            .sort("pos"))


SQL_DOCUMENTS_EPOCH_SHUFFLE = """
SELECT CAST(row_number() OVER (
           ORDER BY ((doc_id + 1) * 2654435761) % 4294967296, doc_id)
       - 1 AS BIGINT) AS pos,
       doc_id
FROM documents
ORDER BY pos
"""


# -- deterministic negative-pair sampling (contrastive training prep) ---------

_NEG_MULT, _NEG_ADD = 2654435761, 1013904223
_NEG_K = 2


def documents_negative_pairs(sf_dir: str, k: int = _NEG_K):
    """Deterministic pseudo-random negative pairs per document — the
    in-batch-negatives substitute of contrastive embedding training
    when you need REPRODUCIBLE negatives (resume/audit): partner j of
    doc i is ((i·MULT + j·ADD) mod 2³²) mod N, bumped by one when it
    hits i itself. Pure map, zero shuffle, no RNG state: the pair set
    is a function of (doc_id, j, N) alone, so any shard re-derives its
    pairs after a failure without coordination (N comes from parquet
    metadata, no count job). Exact in uint64 for doc_id < 2³² — at
    larger id spaces the same formula runs in 128-bit (the SQL oracle
    already computes it in HUGEINT)."""
    import pyarrow.dataset as pads

    src = os.path.join(sf_dir, "documents.parquet")
    n = pads.dataset(src).count_rows()

    def pairs(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        out_id, out_j, out_neg = [], [], []
        for j in range(1, k + 1):
            cand = ((ids * np.uint64(_NEG_MULT)
                     + np.uint64(j * _NEG_ADD))
                    % np.uint64(1 << 32)) % np.uint64(n)
            cand = np.where(cand == ids, (cand + 1) % np.uint64(n), cand)
            out_id.append(ids)
            out_j.append(np.full(len(ids), j, dtype=np.int64))
            out_neg.append(cand)
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_id).astype(np.int64)),
            "neg_rank": pa.array(np.concatenate(out_j)),
            "neg_doc_id": pa.array(
                np.concatenate(out_neg).astype(np.int64))})

    import ray.data as rd
    return (rd.read_parquet(src, columns=["doc_id"])
            .map_batches(pairs, batch_format="pyarrow")
            .sort(["doc_id", "neg_rank"]))


SQL_DOCUMENTS_NEGATIVE_PAIRS = f"""
WITH n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM documents),
js AS (SELECT unnest(generate_series(1, {_NEG_K})) AS j),
cand AS (
  SELECT d.doc_id, js.j,
         ((CAST(d.doc_id AS HUGEINT) * {_NEG_MULT}
           + CAST(js.j AS HUGEINT) * {_NEG_ADD}) % 4294967296) % n.n
             AS cand
  FROM documents d, js, n)
SELECT doc_id, CAST(j AS BIGINT) AS neg_rank,
       CAST(CASE WHEN cand = doc_id
                 THEN (cand + 1) % (SELECT n FROM n)
                 ELSE cand END AS BIGINT) AS neg_doc_id
FROM cand ORDER BY doc_id, neg_rank
"""
