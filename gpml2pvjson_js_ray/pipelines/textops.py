"""Text-analysis + deduplication operators over the `documents` table —
the training-data-pipeline operator set (language-ID, quality scoring,
fingerprinting, MinHash-LSH near-dup, SimHash), each Ray-Data-first.

The sketch computations themselves are not SQL-expressible, but their
dup families (minhash / simhash / winnowing) ARE driver-oracled since
round 4: the deterministic signature tables are checkpointed and DuckDB
recomputes everything downstream (candidate generation, verify,
thresholds) from first principles — see the sketch-checkpoint section
at the bottom of this module.
"""

from __future__ import annotations

import math
import os
import re

import numpy as np
import pyarrow as pa

from ..stages.exchange import polars_capped


def _read_docs(sf_dir: str, columns):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=columns)


# -- vectorized tokenization + hashing (shared by the sketch ops) -----------
#
# Round 2 ran hashlib.blake2b once PER TOKEN of every document inside
# Python loops — at 100 TB that is the per-byte cost of every sketch
# query. All sketch ops now tokenize with polars str kernels and hash
# whole token columns at once (Series.hash, the same primitive the
# exchange already relies on for cross-task-consistent bucketing); the
# per-document folds (rolling fingerprint, minhash min, simhash bit
# votes) are numpy segment reductions over the exploded token arrays.

# Explicit ASCII non-whitespace class — rust-regex \S is Unicode-aware
# while DuckDB's RE2 \S is ASCII; the spelled-out class tokenizes
# identically in polars, RE2 and Python re (NBSP etc. stay token chars).
WS_TOKEN_RE = r"[^\t\n\f\r ]+"


def _token_hash_arrays(texts, regex: str = WS_TOKEN_RE,
                       lowercase: bool = True):
    """→ (flat uint64 token hashes in text order, int64 per-text counts).
    No per-token Python anywhere."""
    pl = polars_capped()
    s = pl.Series("t", texts, dtype=pl.String).fill_null("")
    if lowercase:
        s = s.str.to_lowercase()
    toks = s.str.extract_all(regex)
    lengths = toks.list.len().cast(pl.Int64).to_numpy()
    flat = toks.explode().drop_nulls()  # empty lists explode to one null
    hashes = flat.hash(seed=0).to_numpy().astype(np.uint64, copy=False)
    return hashes, np.asarray(lengths, dtype=np.int64)


def _segment_offsets(lengths: np.ndarray) -> np.ndarray:
    out = np.zeros(len(lengths), dtype=np.int64)
    if len(lengths) > 1:
        np.cumsum(lengths[:-1], out=out[1:])
    return out


def _segment_sums_u64(values: np.ndarray, lengths: np.ndarray,
                      offsets: np.ndarray) -> np.ndarray:
    """Per-segment uint64 wraparound sums; empty segments → 0 (reduceat
    returns a stray element for them, so zero those out explicitly)."""
    n = len(lengths)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if values.size == 0:
        return np.zeros(n, dtype=np.uint64)
    safe = np.minimum(offsets, values.size - 1)
    out = np.add.reduceat(values, safe)
    out[lengths == 0] = 0
    return out


_STOPWORDS = {
    "en": {"the", "of", "and", "to", "a", "in", "is", "that", "for", "it",
           "with", "as", "was", "on", "are", "by", "this", "be", "from"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "von", "mit",
           "nicht", "auf", "auch", "für", "werden", "sind", "zwischen"},
    "fr": {"le", "la", "les", "et", "est", "une", "des", "dans", "pour",
           "avec", "pas", "sur", "sont", "été", "entre"},
}


_TOKEN_PATTERN = r"[a-zA-ZÀ-ÿ]+"


class LangId:
    """Stopword-overlap language identifier. Callable-class form: the
    per-language structures are built once per actor in __init__ (the
    actor-pool pattern for stateful stages), not per batch. Scoring is
    fully vectorized: polars extract_all → list.eval(is_in) per language;
    no per-row Python (round 2 looped tokens per document)."""

    def __init__(self):
        self.stopwords = {lang: sorted(ws)
                          for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        pl = polars_capped()
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        toks = (pl.col("text").fill_null("").str.to_lowercase()
                .str.extract_all(_TOKEN_PATTERN))
        df = df.with_columns(toks.alias("toks")) \
            .with_columns(n=pl.col("toks").list.len().cast(pl.Int64))
        score_cols = []
        for lang, sw in self.stopwords.items():
            score_cols.append(
                (pl.col("toks").list.eval(pl.element().is_in(sw))
                 .list.sum().fill_null(0).cast(pl.Float64)
                 / pl.max_horizontal(pl.col("n"), pl.lit(1)))
                .alias(f"s_{lang}"))
        df = df.with_columns(score_cols)
        best = pl.max_horizontal([f"s_{lang}" for lang in self.stopwords])
        # tie-break mirrors the dict-iteration order of the loop version:
        # first language reaching the max wins (strictly-greater updates)
        pred = pl.lit("unknown")
        for lang in reversed(list(self.stopwords)):
            pred = pl.when((pl.col(f"s_{lang}") == best) & (best > 0.02)) \
                .then(pl.lit(lang)).otherwise(pred)
        out = df.select(
            pl.col("doc_id"),
            lang_pred=pred,
            lang_score=best.round(6).cast(pl.Float64),
        )
        return out.to_arrow().cast(pa.schema([
            ("doc_id", batch.schema.field("doc_id").type),
            ("lang_pred", pa.string()),
            ("lang_score", pa.float64())]))


def documents_langid(sf_dir: str):
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    return docs.map_batches(LangId, batch_format="pyarrow",
                            batch_size=2048, concurrency=2, num_cpus=1)


def _round4_away(pl, expr):
    """round-half-AWAY-from-zero to 4 decimals via the explicit
    floor(x·1e4 + 0.5)/1e4 formula (values here are all ≥ 0). polars
    round() is half-to-even while DuckDB round() is half-away; ratios
    like 1/32 = 0.03125 sit exactly on a representable 4-decimal
    midpoint, so the two diverge. Using the SAME explicit IEEE ops on
    both sides (see SQL_DOCUMENTS_QUALITY) makes the outputs bitwise
    equal and therefore oracle-able. The final scale-down is `* 0.0001`
    (not `/ 10000.0`) because polars lowers scalar division to a
    reciprocal multiply — spelling the multiply out keeps DuckDB on the
    identical instruction."""
    return (expr * 10000.0 + 0.5).floor() * 0.0001


def documents_quality(sf_dir: str):
    """Length / punctuation / stopword-ratio quality features + a composite
    score (training-data quality filtering). Vectorized end-to-end:
    polars list/str kernels, per-row-lang stopword sets via a when-chain;
    no per-row Python (round 2 looped tokens and chars per document)."""
    docs = _read_docs(sf_dir, ["doc_id", "text", "lang"])

    def score(batch: pa.Table) -> pa.Table:
        pl = polars_capped()
        df = pl.from_arrow(batch.select(["doc_id", "text", "lang"]))
        df = df.with_columns(
            text=pl.col("text").fill_null(""),
        ).with_columns(
            toks=pl.col("text").str.extract_all(_TOKEN_PATTERN),
        ).with_columns(
            n=pl.col("toks").list.len().cast(pl.Int64),
            tok_chars=pl.col("toks").list.eval(
                pl.element().str.len_chars()).list.sum()
            .fill_null(0).cast(pl.Float64),
            lo_toks=pl.col("toks").list.eval(
                pl.element().str.to_lowercase()),
            # \p{Alphabetic} ≈ str.isalpha for the Latin text this models
            n_alpha=pl.col("text").str.count_matches(r"\p{Alphabetic}")
            .cast(pl.Float64),
            n_chars=pl.col("text").str.len_chars().cast(pl.Int64),
        )
        # per-row language selects its stopword set (en is the fallback,
        # matching _STOPWORDS.get(lang, en))
        sw_count = pl.col("lo_toks").list.eval(
            pl.element().is_in(sorted(_STOPWORDS["en"]))).list.sum()
        for lang in ("de", "fr"):
            sw_count = pl.when(pl.col("lang") == lang).then(
                pl.col("lo_toks").list.eval(
                    pl.element().is_in(sorted(_STOPWORDS[lang])))
                .list.sum()).otherwise(sw_count)
        nf = pl.col("n").cast(pl.Float64)
        df = df.with_columns(
            mean_token_len=_round4_away(pl, pl.when(pl.col("n") > 0)
                                        .then(pl.col("tok_chars") / nf)
                                        .otherwise(0.0)),
            stopword_ratio=_round4_away(
                pl, pl.when(pl.col("n") > 0)
                .then(sw_count.fill_null(0).cast(pl.Float64) / nf)
                .otherwise(0.0)),
            alpha_ratio=_round4_away(
                pl, pl.col("n_alpha")
                / pl.max_horizontal(pl.col("n_chars"), pl.lit(1))),
        )
        out = df.select(
            pl.col("doc_id"),
            n_tokens=pl.col("n"),
            mean_token_len=pl.col("mean_token_len"),
            stopword_ratio=pl.col("stopword_ratio"),
            alpha_ratio=pl.col("alpha_ratio"),
            quality_score=_round4_away(pl, (
                pl.min_horizontal(pl.lit(1.0), nf / 50.0) * 0.4
                + pl.min_horizontal(pl.lit(1.0),
                                    pl.col("stopword_ratio") * 5) * 0.3
                + pl.col("alpha_ratio") * 0.3)),
        )
        return out.to_arrow()

    return docs.map_batches(score, batch_format="pyarrow", batch_size=2048)


# -- rolling-hash fingerprint ----------------------------------------------

_FP_BASE = np.uint64(1000003)


def _fingerprints_batch(texts) -> list[str]:
    """Order-sensitive rolling fingerprint, vectorized: fp = Σ th_i ·
    B^(n−1−i) (natural uint64 wraparound) — the closed form of the
    h = h·B + th fold, computed with one power table + one segment sum
    instead of a per-token Python loop."""
    hashes, lengths = _token_hash_arrays(texts, lowercase=False)
    offsets = _segment_offsets(lengths)
    if hashes.size:
        pos = np.arange(hashes.size, dtype=np.int64) \
            - np.repeat(offsets, lengths)
        exp = np.repeat(lengths, lengths) - 1 - pos
        pw = np.ones(int(lengths.max()), dtype=np.uint64)
        np.multiply.accumulate(
            np.full(len(pw), _FP_BASE, dtype=np.uint64)[: len(pw) - 1],
            out=pw[1:])
        contrib = hashes * pw[exp]
    else:
        contrib = hashes
    fps = _segment_sums_u64(contrib, lengths, offsets)
    return [format(int(v), "016x") for v in fps]


def documents_fingerprint(sf_dir: str):
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        fps = _fingerprints_batch(batch.column("text").to_pylist())
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(fps, type=pa.string())})

    return docs.map_batches(fp, batch_format="pyarrow", batch_size=2048)


# -- MinHash + LSH near-duplicate detection ---------------------------------

N_PERM = 64
N_BANDS = 16  # 4 rows per band
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5
# minhash verify fast path: broadcast candidate texts when the candidate
# id set is at most this large (≈ tens of MB of text), else fall back to
# the fully-shuffled union+groupby join
_BROADCAST_TEXT_CAP = 200_000


def _pair_collect_cap() -> int:
    """Max candidate-pair rows the near-dup verifiers may collect on the
    driver (for the semi-join id broadcast). Above it the verify
    switches AUTOMATICALLY to the fully distributed union+groupby join
    (_distributed_shingle_verify) — an enforced size guard, not a code
    comment (round-4 advice). Env-overridable so the adversarial-volume
    pytest can force the fallback without a giant corpus."""
    return int(os.environ.get("GRAFT_PAIR_COLLECT_CAP", "500000"))


def _distributed_shingle_verify(candidate_pairs, docs, threshold: float,
                                round_mult: float, round_inv: float):
    """Exact shingle-Jaccard verify of a candidate-pair Dataset with
    ZERO driver materialization — the adversarial-volume path shared by
    documents_minhash_dups and documents_setsim_join:

      1. pairs explode into (doc_id, doc_a, doc_b) side rows;
      2. union + groupby(doc_id) attaches each side row to its doc text
         (the canonical Ray-Data repartition join — docs may be the
         full corpus; unmatched doc rows vanish in the group fold);
      3. groupby(doc_a, doc_b) brings both sides of a pair together and
         computes exact shingle Jaccard inside the group (duplicate
         candidates from multiple colliding bands collapse here free).

    Rounding is floor(j*mult + 0.5)*inv — the half-away formula both
    DuckDB oracles reproduce. Returns (doc_a, doc_b, jaccard)."""
    import math

    import pandas as pd

    JOIN_SCHEMA = pa.schema([("doc_id", pa.int64()),
                             ("doc_a", pa.int64()),
                             ("doc_b", pa.int64()),
                             ("text", pa.string())])

    def explode_sides(b: pa.Table) -> pa.Table:
        a = b.column("doc_a")
        bb = b.column("doc_b")
        return pa.Table.from_arrays(
            [pa.concat_arrays([a.combine_chunks(), bb.combine_chunks()]),
             pa.concat_arrays([a.combine_chunks(), a.combine_chunks()]),
             pa.concat_arrays([bb.combine_chunks(), bb.combine_chunks()]),
             pa.array([""] * (2 * b.num_rows), type=pa.string())],
            schema=JOIN_SCHEMA)

    def docs_as_join_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        minus = pa.array([-1] * n, type=pa.int64())
        return pa.Table.from_arrays(
            [b.column("doc_id").cast(pa.int64()).combine_chunks(),
             minus, minus,
             b.column("text").cast(pa.string()).combine_chunks()],
            schema=JOIN_SCHEMA)

    sides = candidate_pairs.map_batches(explode_sides,
                                        batch_format="pyarrow")
    doc_rows = docs.map_batches(docs_as_join_rows, batch_format="pyarrow")

    def attach_text(df: "pd.DataFrame") -> "pd.DataFrame":
        side_rows = df[df["doc_a"] >= 0]
        if side_rows.empty:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "text": pd.Series([], dtype="object")})
        texts = df[df["doc_a"] < 0].set_index("doc_id")["text"]
        out = side_rows[["doc_a", "doc_b", "doc_id"]].copy()
        out["text"] = side_rows["doc_id"].map(texts).fillna("")
        return out

    joined = (sides.union(doc_rows).groupby("doc_id")
              .map_groups(attach_text, batch_format="pandas"))

    def verify_pair(df: "pd.DataFrame") -> "pd.DataFrame":
        rows = []
        for (a, b), g in df.groupby(["doc_a", "doc_b"], sort=False):
            ta = g[g["doc_id"] == a]["text"]
            tb = g[g["doc_id"] == b]["text"]
            sa = _shingles(ta.iloc[0] if len(ta) else "")
            sb = _shingles(tb.iloc[0] if len(tb) else "")
            union = len(sa | sb)
            j = (len(sa & sb) / union) if union else 0.0
            if j >= threshold:
                # half-away via the explicit floor formula (SQL round();
                # Python round() is half-to-even)
                rows.append((int(a), int(b),
                             math.floor(j * round_mult + 0.5) * round_inv))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]) \
            if rows else pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64"),
                 "jaccard": pd.Series([], dtype="float64")})

    return joined.groupby(["doc_a", "doc_b"]).map_groups(
        verify_pair, batch_format="pandas")

_rng = np.random.RandomState(12345)
_PERM_A = _rng.randint(1, 2**63 - 1, size=N_PERM).astype(np.uint64) | np.uint64(1)
_PERM_B = _rng.randint(0, 2**63 - 1, size=N_PERM).astype(np.uint64)


_WS_TOKEN_CRE = re.compile(WS_TOKEN_RE)


def _shingles(text: str) -> set:
    """Python-set shingles, used only in the exact-Jaccard verify of the
    (tiny) candidate set — the sketch path below never calls this.
    Tokenization matches WS_TOKEN_RE (str.split() would split on
    Unicode whitespace that the SQL oracle's RE2 \\S does not)."""
    toks = _WS_TOKEN_CRE.findall((text or "").lower())
    if len(toks) < SHINGLE_K:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + SHINGLE_K])
            for i in range(len(toks) - SHINGLE_K + 1)}


# per-window-position mixing multipliers (odd → bijective mod 2^64)
_SHINGLE_MIX = (_rng.randint(1, 2**63 - 1, size=SHINGLE_K)
                .astype(np.uint64) | np.uint64(1))
_BAND_FOLD = np.uint64(0x100000001B3)  # FNV-64 prime


def _shingle_hash_arrays(texts):
    """Vectorized k-token shingle hashes: token hashes are zero-padded
    per document (so 1 ≤ n < K docs still yield exactly one shingle,
    matching the loop semantics), then each window of K consecutive
    hashes mixes with per-position odd multipliers (uint64 wraparound).
    MinHash is duplicate-insensitive, so the multiset needs no dedup.
    → (flat shingle hashes, per-doc shingle counts, shingle offsets)."""
    hashes, lengths = _token_hash_arrays(texts)
    n_sh = np.where(lengths > 0,
                    np.maximum(lengths - SHINGLE_K + 1, 1), 0)
    plens = np.where(lengths > 0, lengths + SHINGLE_K - 1, 0)
    padded = np.zeros(int(plens.sum()), dtype=np.uint64)
    poffs = _segment_offsets(plens)
    if hashes.size:
        pos = np.arange(hashes.size, dtype=np.int64) \
            - np.repeat(_segment_offsets(lengths), lengths)
        padded[np.repeat(poffs, lengths) + pos] = hashes
    sh_offs = _segment_offsets(n_sh)
    total_sh = int(n_sh.sum())
    if total_sh:
        spos = np.arange(total_sh, dtype=np.int64) \
            - np.repeat(sh_offs, n_sh)
        starts = np.repeat(poffs, n_sh) + spos
        sh = np.zeros(total_sh, dtype=np.uint64)
        for j in range(SHINGLE_K):
            sh += padded[starts + j] * _SHINGLE_MIX[j]
    else:
        sh = np.zeros(0, dtype=np.uint64)
    return sh, n_sh, sh_offs


def _minhash_batch(texts) -> np.ndarray:
    """(ndocs, N_PERM) uint64 minhash signatures, vectorized across the
    whole batch: (a·x + b) mod 2^64 per permutation, per-document min via
    minimum.reduceat. Perms run in blocks of 16 to bound the temporary
    to 16 × total_shingles × 8 B."""
    sh, n_sh, sh_offs = _shingle_hash_arrays(texts)
    ndocs = len(n_sh)
    out = np.zeros((ndocs, N_PERM), dtype=np.uint64)
    if sh.size == 0 or ndocs == 0:
        return out
    safe = np.minimum(sh_offs, sh.size - 1)
    empty = n_sh == 0
    for p0 in range(0, N_PERM, 16):
        p1 = min(p0 + 16, N_PERM)
        vals = sh[None, :] * _PERM_A[p0:p1, None] + _PERM_B[p0:p1, None]
        mins = np.minimum.reduceat(vals, safe, axis=1)
        out[:, p0:p1] = mins.T
    out[empty, :] = 0
    return out


def _band_hashes(mh: np.ndarray) -> np.ndarray:
    """(ndocs, N_PERM) minhash → (ndocs, N_BANDS) int64 band keys: FNV
    fold of each band's rows (band equality ⟺ all rows equal, w.h.p.)."""
    rows = N_PERM // N_BANDS
    seg = mh.reshape(mh.shape[0], N_BANDS, rows)
    bh = np.zeros((mh.shape[0], N_BANDS), dtype=np.uint64)
    for j in range(rows):
        bh = bh * _BAND_FOLD ^ seg[:, :, j]
    return bh.view(np.int64)


class MinHashBands:
    """map_batches stage: doc → (band_id, band_hash, doc_id) rows —
    fully vectorized (numpy band fold over the batched signatures)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mh = _minhash_batch(texts)
        bh = _band_hashes(mh)
        n = len(texts)
        return pa.Table.from_pydict({
            "band_id": pa.array(np.tile(np.arange(N_BANDS,
                                                  dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1)),
            "doc_id": pa.array(np.repeat(doc_ids, N_BANDS),
                               type=pa.int64())})


def documents_minhash_dups(sf_dir: str):
    """MinHash→band→bucket-groupby candidate pairs, verified by exact
    shingle Jaccard — fully distributed, nothing materializes on the
    driver:

      1. band rows → groupby(bucket) → candidate pairs (as before);
      2. the distinct candidate doc_ids (small by construction — LSH
         bands at threshold 0.5 emit few pairs) are collected and
         broadcast once via ray.put; docs are SEMI-JOIN filtered against
         them before the text join, so the shuffle carries candidate
         texts only, never the whole corpus (round 2 shuffled every
         text; VERDICT r2 item 3);
      3. pairs explode into (doc_id, doc_a, doc_b) side rows; a
         union + groupby(doc_id) joins each side row to its doc text
         (the canonical Ray-Data repartition join);
      4. groupby(doc_a, doc_b) brings both sides of a pair together and
         computes exact shingle Jaccard inside the group (duplicate
         candidates from multiple colliding bands collapse here for free).

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    import itertools

    import pandas as pd
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..stages.exchange import hash_rows_mod

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    bands = docs.map_batches(MinHashBands(), batch_format="pyarrow",
                             batch_size=1024)

    def add_bucket(b: pa.Table) -> pa.Table:
        buckets = hash_rows_mod(b, ["band_hash"], 16)
        return b.append_column("bucket",
                               pa.array(buckets, type=pa.int32()))

    def pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        # vectorized within bucket: only (band_id, band_hash) groups with
        # ≥2 docs produce candidate pairs
        dup_groups = df[df.duplicated(["band_id", "band_hash"], keep=False)]
        out = []
        for _, g in dup_groups.groupby(["band_id", "band_hash"],
                                       sort=False):
            ids = sorted(g["doc_id"].unique())
            out.extend(itertools.combinations(ids, 2))
        if not out:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        return pd.DataFrame(out, columns=["doc_a", "doc_b"]) \
            .drop_duplicates()

    candidate_pairs = (bands.map_batches(add_bucket, batch_format="pyarrow")
                       .groupby("bucket")
                       .map_groups(pairs, batch_format="pandas")
                       .materialize())

    # ---- size guard (round-4 advice): the candidate PAIR set is tiny
    # by construction, but the driver collect below is gated on its
    # COUNTED size, not an assumption — above the cap the verify runs
    # fully distributed (pairs deduped by groupby, full-corpus text
    # join), nothing dataset-sized ever on the driver.
    if candidate_pairs.count() > _pair_collect_cap():
        from ray.data.aggregate import Count as _Count
        uniq_pairs = (candidate_pairs.groupby(["doc_a", "doc_b"])
                      .aggregate(_Count(alias_name="_n"))
                      .map_batches(lambda t: t.select(["doc_a", "doc_b"]),
                                   batch_format="pyarrow"))
        return _distributed_shingle_verify(uniq_pairs, docs,
                                           JACCARD_THRESHOLD,
                                           10000.0, 0.0001)

    # ---- semi-join: distinct doc_ids of the (small) pair set fit on
    # the driver; broadcast them once and filter docs before the text
    # join.
    id_tbl = candidate_pairs.to_pandas()
    if len(id_tbl) == 0:
        return rd.from_arrow(pa.Table.from_pydict({
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64())}))
    cand_ids = np.unique(np.concatenate(
        [id_tbl["doc_a"].to_numpy(), id_tbl["doc_b"].to_numpy()]))
    ids_ref = ray.put(pa.array(cand_ids, type=pa.int64()))

    def filter_docs(b: pa.Table) -> pa.Table:
        # zero-copy plasma read of the broadcast id set, once per call
        return b.filter(pc.is_in(b.column("doc_id"),
                                 value_set=ray.get(ids_ref)))

    docs = docs.map_batches(filter_docs, batch_format="pyarrow")

    # ---- fast path: when the candidate set is small (the typical
    # near-dup regime — candidates ≪ corpus), the candidate TEXTS also
    # fit in the object store. Broadcast them once and verify every
    # pair in a single map over the (deduped) pair set: ZERO additional
    # shuffles vs the three (union + two groupbys) of the join path
    # below, which remains the fallback for adversarial candidate
    # volumes. Duplicate pairs from multiple colliding bands are
    # collapsed on the driver (the pair table is already collected for
    # the semi-join ids).
    if len(cand_ids) <= _BROADCAST_TEXT_CAP:
        parts = [t for t in ray.get(docs.to_arrow_refs()) if len(t)]
        ttbl = (pa.concat_tables(parts) if parts else
                pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string())}))
        texts_ref = ray.put(ttbl)
        uniq = id_tbl.drop_duplicates(["doc_a", "doc_b"])
        pair_ds = rd.from_arrow(pa.table({
            "doc_a": pa.array(uniq["doc_a"].to_numpy(), pa.int64()),
            "doc_b": pa.array(uniq["doc_b"].to_numpy(), pa.int64())}))

        def verify_broadcast(b: pa.Table) -> pa.Table:
            tt = ray.get(texts_ref)
            text_of = dict(zip(tt.column("doc_id").to_pylist(),
                               tt.column("text").to_pylist()))
            memo: dict = {}

            def sh(d):
                if d not in memo:
                    memo[d] = _shingles(text_of.get(d, ""))
                return memo[d]

            ra, rb, rj = [], [], []
            for a, b2 in zip(b.column("doc_a").to_pylist(),
                             b.column("doc_b").to_pylist()):
                sa, sb = sh(a), sh(b2)
                union = len(sa | sb)
                j = (len(sa & sb) / union) if union else 0.0
                if j >= JACCARD_THRESHOLD:
                    ra.append(a)
                    rb.append(b2)
                    # half-away via the explicit floor formula so the
                    # DuckDB oracle reproduces the exact double (see
                    # _round4_away; Python round() is half-to-even)
                    rj.append(math.floor(j * 10000.0 + 0.5) * 0.0001)
            return pa.table({"doc_a": pa.array(ra, pa.int64()),
                             "doc_b": pa.array(rb, pa.int64()),
                             "jaccard": pa.array(rj, pa.float64())})

        return pair_ds.map_batches(verify_broadcast,
                                   batch_format="pyarrow")

    # ---- candidate texts too large to broadcast: distributed text
    # join over the (already semi-join-filtered) docs
    uniq = id_tbl.drop_duplicates(["doc_a", "doc_b"])
    pair_ds = rd.from_arrow(pa.table({
        "doc_a": pa.array(uniq["doc_a"].to_numpy(), pa.int64()),
        "doc_b": pa.array(uniq["doc_b"].to_numpy(), pa.int64())}))
    return _distributed_shingle_verify(pair_ds, docs,
                                       JACCARD_THRESHOLD,
                                       10000.0, 0.0001)


# -- n-gram Jaccard (blocked exact) -----------------------------------------

def documents_ngram_jaccard(sf_dir: str, threshold: float = 0.3,
                            num_buckets: int = 8):
    """Exact word-3-gram Jaccard similarity pairs, blocked by
    (lang, length band) to bound the pairwise work per group — the
    complementary exact method to MinHash-LSH (which approximates the
    candidate set instead of the similarity)."""
    import itertools

    import pandas as pd

    docs = _read_docs(sf_dir, ["doc_id", "text", "lang"])

    def add_block(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        blocks = (pl.from_arrow(b.select(["lang", "text"]))
                  .select(block=pl.col("lang") + ":"
                          + (pl.col("text").fill_null("")
                             .str.count_matches(WS_TOKEN_RE) // 40)
                          .cast(pl.String))
                  .to_series())
        return b.append_column(
            "block", blocks.to_arrow().cast(pa.string()))

    def pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        sh = {int(r.doc_id): _shingles(r.text)
              for r in df.itertuples(index=False)}
        out = []
        for a, b in itertools.combinations(sorted(sh), 2):
            sa, sb = sh[a], sh[b]
            union = len(sa | sb)
            j = (len(sa & sb) / union) if union else 0.0
            if j >= threshold:
                out.append((a, b, round(j, 4)))
        if not out:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "jaccard": pd.Series([], dtype="float64")})
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])

    return (docs.map_batches(add_block, batch_format="pyarrow")
            .groupby("block")
            .map_groups(pairs, batch_format="pandas"))


# -- SimHash ---------------------------------------------------------------

def _simhash_batch(texts) -> np.ndarray:
    """(ndocs,) uint64 simhash fingerprints, vectorized: per-document bit
    votes are segment sums of each bit column of the token-hash array
    (bit b of the fingerprint is set when more than half the tokens have
    bit b set — identical to summing ±1 votes)."""
    hashes, lengths = _token_hash_arrays(texts)
    offsets = _segment_offsets(lengths)
    out = np.zeros(len(lengths), dtype=np.uint64)
    if hashes.size == 0:
        return out
    one = np.uint64(1)
    for b in range(64):
        bit = (hashes >> np.uint64(b)) & one
        count = _segment_sums_u64(bit, lengths, offsets)
        # vote > 0  ⟺  2·count > n
        out |= ((count * np.uint64(2)) > lengths.astype(np.uint64)) \
            .astype(np.uint64) << np.uint64(63 - b)
    return out


def documents_simhash(sf_dir: str):
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def sh(batch: pa.Table) -> pa.Table:
        fps = _simhash_batch(batch.column("text").to_pylist())
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array([format(int(v), "016x") for v in fps],
                                type=pa.string())})

    return docs.map_batches(sh, batch_format="pyarrow", batch_size=1024)


def documents_simhash_dups(sf_dir: str, max_hamming: int = 3):
    """SimHash near-duplicate PAIRS via Hamming-ball banding (Manku et al.
    pigeonhole: split the 64-bit fingerprint into max_hamming+1 bands —
    any pair within Hamming distance max_hamming shares at least one
    identical band). Candidates co-locate via groupby on the band value;
    the exact popcount verify runs inside the group; duplicate candidates
    from multiple matching bands collapse in a final pair-key groupby.
    Fully distributed — nothing materializes on the driver.

    Returns (doc_a, doc_b, hamming) with doc_a < doc_b."""
    import itertools

    import pandas as pd

    n_bands = max_hamming + 1
    band_bits = 64 // n_bands

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def bands(batch: pa.Table) -> pa.Table:
        fps = _simhash_batch(batch.column("text").to_pylist())
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(fps)
        shifts = (np.arange(n_bands, dtype=np.uint64)
                  * np.uint64(band_bits))
        mask = np.uint64((1 << band_bits) - 1)
        band_vals = ((fps[:, None] >> shifts[None, :]) & mask) \
            .astype(np.int64).reshape(-1)
        return pa.Table.from_pydict({
            "band_id": pa.array(np.tile(np.arange(n_bands,
                                                  dtype=np.int32), n)),
            "band_val": pa.array(band_vals, type=pa.int64()),
            "doc_id": pa.array(np.repeat(doc_ids, n_bands),
                               type=pa.int64()),
            "simhash": pa.array(fps.view(np.int64)
                                .repeat(n_bands), type=pa.int64()),
        })

    def pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        rows = []
        dup = df[df.duplicated(["band_id", "band_val"], keep=False)]
        for _, g in dup.groupby(["band_id", "band_val"], sort=False):
            uniq = g.drop_duplicates("doc_id")[["doc_id", "simhash"]]
            for (a, ha), (b, hb) in itertools.combinations(
                    uniq.itertuples(index=False), 2):
                d = bin((int(ha) ^ int(hb)) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming:
                    lo, hi = (int(a), int(b)) if a < b else (int(b), int(a))
                    rows.append((lo, hi, d))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]) \
            if rows else pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64"),
                 "hamming": pd.Series([], dtype="int64")})

    def first(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.drop_duplicates(["doc_a", "doc_b"])

    from ..stages.exchange import hash_rows_mod

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = hash_rows_mod(b, ["band_id", "band_val"], 32)
        return b.append_column("bucket", pa.array(ids, type=pa.int32()))

    cand = (docs.map_batches(bands, batch_format="pyarrow",
                             batch_size=1024)
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pairs, batch_format="pandas"))
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        first, batch_format="pandas")


# -- DuckDB oracles for the SQL-expressible text ops -------------------------
#
# langid and the blocked exact n-gram Jaccard are deterministic functions
# of the text, so they CAN be oracle-checked (validated value-exact against
# the Ray output on the driver corpora; the rounding semantics of both
# engines agree on these expressions). The sketch ops (minhash/simhash/
# fingerprint) stay rows-only by nature.

def _sql_stopword_list(lang: str) -> str:
    return "[" + ",".join(f"'{w}'" for w in sorted(_STOPWORDS[lang])) + "]"


def _sql_lang_score(lang: str) -> str:
    return (f"CAST(len(list_filter(toks, t -> list_contains("
            f"{_sql_stopword_list(lang)}, t))) AS DOUBLE)"
            f" / greatest(len(toks), 1)")


SQL_DOCUMENTS_LANGID = f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-zA-ZÀ-ÿ]+') AS toks
  FROM documents
), sc AS (
  SELECT doc_id, {_sql_lang_score('en')} AS s_en,
         {_sql_lang_score('de')} AS s_de, {_sql_lang_score('fr')} AS s_fr
  FROM tok
)
SELECT doc_id,
  CASE WHEN greatest(s_en, s_de, s_fr) <= 0.02 THEN 'unknown'
       WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS lang_pred,
  round(greatest(s_en, s_de, s_fr), 6) AS lang_score
FROM sc
"""


def _sql_sw_count(lang: str) -> str:
    return (f"len(list_filter(toks, t -> list_contains("
            f"{_sql_stopword_list(lang)}, lower(t))))")


# Mirrors documents_quality op-for-op; all roundings use the explicit
# half-away floor(x*1e4+0.5)/1e4 so DuckDB and polars produce bitwise
# identical doubles (see _round4_away).
SQL_DOCUMENTS_QUALITY = f"""
WITH tok AS (
  SELECT doc_id, lang, coalesce(text, '') AS text,
         regexp_extract_all(coalesce(text, ''), '[a-zA-ZÀ-ÿ]+') AS toks
  FROM documents
), feat AS (
  SELECT doc_id, len(toks) AS n_tokens,
    CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
         AS DOUBLE) AS tok_chars,
    CASE WHEN lang = 'de' THEN {_sql_sw_count('de')}
         WHEN lang = 'fr' THEN {_sql_sw_count('fr')}
         ELSE {_sql_sw_count('en')} END AS sw,
    CAST(len(regexp_extract_all(text, '\\p{{L}}')) AS DOUBLE) AS n_alpha,
    length(text) AS n_chars
  FROM tok
), r AS (
  SELECT doc_id, n_tokens,
    floor((CASE WHEN n_tokens > 0
                THEN tok_chars / CAST(n_tokens AS DOUBLE)
                ELSE 0.0 END) * 10000.0 + 0.5) * 0.0001 AS mean_token_len,
    floor((CASE WHEN n_tokens > 0
                THEN CAST(sw AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                ELSE 0.0 END) * 10000.0 + 0.5) * 0.0001 AS stopword_ratio,
    floor((n_alpha / CAST(greatest(n_chars, 1) AS DOUBLE))
          * 10000.0 + 0.5) * 0.0001 AS alpha_ratio
  FROM feat
)
SELECT doc_id, n_tokens, mean_token_len, stopword_ratio, alpha_ratio,
  floor((least(1.0, CAST(n_tokens AS DOUBLE) / 50.0) * 0.4
         + least(1.0, stopword_ratio * 5) * 0.3
         + alpha_ratio * 0.3) * 10000.0 + 0.5) * 0.0001 AS quality_score
FROM r
"""

SQL_DOCUMENTS_NGRAM_JACCARD = r"""
WITH sh AS (
  SELECT doc_id,
         lang || ':' ||
         CAST(len(regexp_extract_all(text,
             '[^' || chr(9) || chr(10) || chr(12) || chr(13) || ' ]+'))
         // 40 AS VARCHAR)
             AS block,
         CASE WHEN len(toks) = 0 THEN []
              WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         END AS sh
  FROM documents,
       LATERAL (SELECT regexp_extract_all(lower(text),
             '[^' || chr(9) || chr(10) || chr(12) || chr(13) || ' ]+')
         AS toks)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / nullif(len(list_distinct(a.sh || b.sh)), 0), 4) AS jaccard
FROM sh a JOIN sh b ON a.block = b.block AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / nullif(len(list_distinct(a.sh || b.sh)), 0) >= 0.3
"""


# -- char-bigram LM scoring (the CCNet/KenLM perplexity-filter shape) --------

def documents_char_lm_score(sf_dir: str):
    """Language-model quality scoring with a corpus-trained character
    bigram model — the two-pass broadcast-model shape of a CCNet-style
    perplexity filter (train a small LM, score every document, filter
    on the score downstream).

    Pass 1 (train): per-batch (first_char, bigram) partial counts →
    one groupby over the BIGRAM VOCABULARY (alphabet², tiny — this is
    the only exchange); the folded model materializes on the driver
    (hundreds of rows) and broadcasts into pass 2 via task closure.
    Pass 2 (score): map-only — each doc's bigrams look up
    ln(C(ab)/C(a·)) through one vectorized searchsorted, and the
    per-doc mean closes inside the batch because each row is a whole
    document. No smoothing needed: scoring bigrams always exist in the
    model (trained on the same corpus).

    Output: (doc_id, n_bigrams, avg_logp) — avg_logp rounded to 6 (ln
    and the mean are float64 in both engines; only summation order
    differs). Docs with no 2+-char tokens emit no row."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..stages.exchange import polars_capped

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def _bigrams(b, pl):
        """(doc_id, ca, bg) rows — explode tokens, then chars, pair
        adjacent chars within each token instance."""
        ex = (pl.from_arrow(b).select(
            "doc_id",
            tok=pl.col("text").fill_null("").str.to_lowercase()
            .str.extract_all("[a-zA-ZÀ-ÿ]+"))
            .explode("tok").drop_nulls("tok")
            .with_row_index("tid")
            .with_columns(ch=pl.col("tok").str.extract_all("."))
            .explode("ch"))
        return (ex.with_columns(
            cb=pl.col("ch").shift(-1).over("tid"))
            .drop_nulls("cb")
            .select("doc_id", ca=pl.col("ch"),
                    bg=pl.col("ch") + pl.col("cb")))

    def train_partial(b) -> "pa.Table":
        pl = polars_capped()
        out = (_bigrams(b, pl).group_by("ca", "bg")
               .agg(c=pl.len().cast(pl.Int64)))
        return out.to_arrow().cast(pa.schema([
            ("ca", pa.string()), ("bg", pa.string()),
            ("c", pa.int64())]))

    model = (docs.map_batches(train_partial, batch_format="pyarrow")
             .groupby(["ca", "bg"]).aggregate(Sum("c", alias_name="c"))
             .to_pandas())
    prefix_tot = model.groupby("ca")["c"].transform("sum")
    logp = np.log(model["c"].to_numpy(dtype=np.float64)
                  / prefix_tot.to_numpy(dtype=np.float64))
    order = np.argsort(model["bg"].to_numpy())
    vocab = model["bg"].to_numpy()[order]
    logp = logp[order]

    def score(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        bgf = _bigrams(b, pl)
        idx = np.searchsorted(vocab, bgf["bg"].to_numpy())
        scored = bgf.with_columns(
            lp=pl.Series("lp", logp[idx], dtype=pl.Float64))
        out = (scored.group_by("doc_id").agg(
            n_bigrams=pl.len().cast(pl.Int64),
            avg_logp=(pl.col("lp").sum()
                      / pl.len().cast(pl.Float64)).round(6)))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
            ("avg_logp", pa.float64())]))

    return (docs.map_batches(score, batch_format="pyarrow")
            .sort("doc_id"))


SQL_DOCUMENTS_CHAR_LM_SCORE = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')),
                                   '[a-zA-ZÀ-ÿ]+')) AS tok
  FROM documents
),
chars AS (SELECT doc_id, regexp_extract_all(tok, '.') AS cs FROM toks),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(cs)), i -> cs[i])) AS ca,
         unnest(list_transform(range(1, len(cs)),
                               i -> cs[i] || cs[i+1])) AS b
  FROM chars WHERE len(cs) >= 2
),
model AS (SELECT b, any_value(ca) AS ca, count(*) AS c FROM bg GROUP BY b),
prefix AS (SELECT ca, sum(c) AS ctot FROM model GROUP BY ca),
scored AS (
  SELECT g.doc_id, ln((m.c * 1.0) / p.ctot) AS lp
  FROM bg g JOIN model m USING (b) JOIN prefix p ON m.ca = p.ca
)
SELECT doc_id, count(*) AS n_bigrams,
       round(sum(lp) / count(*), 6) AS avg_logp
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


# -- DSIR-style importance weights (domain reweighting) ----------------------

_DSIR_TARGET_SOURCE = "src0"


def documents_dsir_weights(sf_dir: str,
                           target_source: str = _DSIR_TARGET_SOURCE):
    """Data-selection importance weights: per-doc mean log ratio of a
    TARGET-domain char-bigram model to the corpus model (the DSIR
    shape — weight data toward a target domain before sampling). Both
    are JOINT bigram multinomials (DSIR's hashed-ngram feature model),
    not per-prefix conditionals — conditionals cancel on any domain
    whose next-char is deterministic given the prefix. One training
    pass fits BOTH models (per-batch bigram partials carry a corpus
    count and a target count; one vocabulary-sized exchange); the
    target model is add-one smoothed over the corpus vocabulary so
    unseen-in-target bigrams stay finite. Scoring is map-only via the
    same broadcast searchsorted lookup as documents_char_lm_score.
    Output: (doc_id, n_bigrams, log_weight); positive ⇒ doc looks more
    target-like than the corpus average."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..stages.exchange import polars_capped

    docs = _read_docs(sf_dir, ["doc_id", "source", "text"])

    def _bigrams_src(b, pl, with_source):
        cols = ["doc_id", "source"] if with_source else ["doc_id"]
        ex = (pl.from_arrow(b.select(cols + ["text"])).select(
            *cols,
            tok=pl.col("text").fill_null("").str.to_lowercase()
            .str.extract_all("[a-zA-ZÀ-ÿ]+"))
            .explode("tok").drop_nulls("tok")
            .with_row_index("tid")
            .with_columns(ch=pl.col("tok").str.extract_all("."))
            .explode("ch"))
        return (ex.with_columns(cb=pl.col("ch").shift(-1).over("tid"))
                .drop_nulls("cb")
                .select(*cols, bg=pl.col("ch") + pl.col("cb")))

    def train_partial(b: "pa.Table") -> "pa.Table":
        pl = polars_capped()
        out = (_bigrams_src(b, pl, with_source=True)
               .group_by("bg")
               .agg(c=pl.len().cast(pl.Int64),
                    tc=(pl.col("source") == target_source)
                    .sum().cast(pl.Int64)))
        return out.to_arrow().cast(pa.schema([
            ("bg", pa.string()), ("c", pa.int64()),
            ("tc", pa.int64())]))

    model = (docs.map_batches(train_partial, batch_format="pyarrow")
             .groupby("bg")
             .aggregate(Sum("c", alias_name="c"),
                        Sum("tc", alias_name="tc"))
             .to_pandas())
    c = model["c"].to_numpy(dtype=np.float64)
    tc = model["tc"].to_numpy(dtype=np.float64)
    ctot, ttot, vsize = c.sum(), tc.sum(), float(len(model))
    logw = (np.log((tc + 1.0) / (ttot + vsize))
            - np.log(c / ctot))
    order = np.argsort(model["bg"].to_numpy())
    vocab = model["bg"].to_numpy()[order]
    logw = logw[order]

    def score(b: "pa.Table") -> "pa.Table":
        pl = polars_capped()
        bgf = _bigrams_src(b, pl, with_source=False)
        idx = np.searchsorted(vocab, bgf["bg"].to_numpy())
        scored = bgf.with_columns(
            lw=pl.Series("lw", logw[idx], dtype=pl.Float64))
        out = (scored.group_by("doc_id").agg(
            n_bigrams=pl.len().cast(pl.Int64),
            log_weight=(pl.col("lw").sum()
                        / pl.len().cast(pl.Float64)).round(6)))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
            ("log_weight", pa.float64())]))

    return (docs.map_batches(score, batch_format="pyarrow")
            .sort("doc_id"))


SQL_DOCUMENTS_DSIR_WEIGHTS = """
WITH toks AS (
  SELECT doc_id, source,
         unnest(regexp_extract_all(lower(coalesce(text, '')),
                                   '[a-zA-ZÀ-ÿ]+')) AS tok
  FROM documents
),
chars AS (SELECT doc_id, source,
                 regexp_extract_all(tok, '.') AS cs FROM toks),
bg AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(cs)),
                               i -> cs[i] || cs[i+1])) AS b
  FROM chars WHERE len(cs) >= 2
),
model AS (
  SELECT b, count(*) AS c,
         sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS tc
  FROM bg GROUP BY b),
tot AS (SELECT sum(c) AS ctot, sum(tc) AS ttot, count(*) AS vsize
        FROM model),
scored AS (
  SELECT g.doc_id,
         ln((m.tc + 1.0) / (t.ttot + t.vsize))
           - ln((m.c * 1.0) / t.ctot) AS lw
  FROM bg g JOIN model m USING (b) CROSS JOIN tot t
)
SELECT doc_id, count(*) AS n_bigrams,
       round(sum(lw) / count(*), 6) AS log_weight
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


# -- CCNet-style per-language quality buckets ---------------------------------

def documents_ccnet_buckets(sf_dir: str):
    """CCNet's head/middle/tail split: score every document with the
    corpus-trained char-bigram LM (documents_char_lm_score's model),
    then bucket WITHIN EACH LANGUAGE by score quantile — head = top
    quarter, tail = bottom quarter (thresholds at p25/p75; CCNet buckets
    by per-language perplexity cutoffs exactly like this, tertile vs
    quartile being a config knob). Output: (lang, bucket, n_docs).

    Scale plan, stage by stage:
      1. train = one vocabulary-sized exchange (alphabet² rows);
      2. score = map-only, the (doc_id, lang, avg_logp) projection is
         MATERIALIZED — ~20 bytes/row vs multi-KB text, the standard
         CCNet two-phase layout — so the text is read once, not twice;
      3. thresholds = exact discrete quantiles per lang
         (quantile_disc semantics: element at ceil(q·n)−1, q exact in
         binary so the index arithmetic cannot drift); partitioning
         assumption: one lang's SCORE COLUMN fits a task (floats, not
         texts — the t-digest in pipelines/quantiles.py is the
         constant-state fallback when even that breaks);
      4. assignment = map-only against the broadcast (tiny) threshold
         table, per-batch count partials → a |langs|×3-row groupby.
    """
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    from ..stages.exchange import polars_capped

    docs = _read_docs(sf_dir, ["doc_id", "lang", "text"])

    def _bigrams(b, pl, carry):
        ex = (pl.from_arrow(b.select(list(carry) + ["text"])).select(
            *carry,
            tok=pl.col("text").fill_null("").str.to_lowercase()
            .str.extract_all("[a-zA-ZÀ-ÿ]+"))
            .explode("tok").drop_nulls("tok")
            .with_row_index("tid")
            .with_columns(ch=pl.col("tok").str.extract_all("."))
            .explode("ch"))
        return (ex.with_columns(cb=pl.col("ch").shift(-1).over("tid"))
                .drop_nulls("cb")
                .select(*carry, ca=pl.col("ch"),
                        bg=pl.col("ch") + pl.col("cb")))

    def train_partial(b) -> pa.Table:
        pl = polars_capped()
        out = (_bigrams(b, pl, ("doc_id",)).group_by("ca", "bg")
               .agg(c=pl.len().cast(pl.Int64)))
        return out.to_arrow().cast(pa.schema([
            ("ca", pa.string()), ("bg", pa.string()), ("c", pa.int64())]))

    model = (docs.map_batches(train_partial, batch_format="pyarrow")
             .groupby(["ca", "bg"]).aggregate(Sum("c", alias_name="c"))
             .to_pandas())
    prefix_tot = model.groupby("ca")["c"].transform("sum")
    logp = np.log(model["c"].to_numpy(dtype=np.float64)
                  / prefix_tot.to_numpy(dtype=np.float64))
    order = np.argsort(model["bg"].to_numpy())
    vocab, logp = model["bg"].to_numpy()[order], logp[order]

    def score(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        bgf = _bigrams(b, pl, ("doc_id", "lang"))
        idx = np.searchsorted(vocab, bgf["bg"].to_numpy())
        scored = bgf.with_columns(
            lp=pl.Series("lp", logp[idx], dtype=pl.Float64))
        out = (scored.group_by("doc_id", "lang").agg(
            avg_logp=(pl.col("lp").sum()
                      / pl.len().cast(pl.Float64)).round(6)))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("lang", pa.string()),
            ("avg_logp", pa.float64())]))

    scored = (docs.map_batches(score, batch_format="pyarrow")
              .materialize())

    def th_group(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["avg_logp"].to_numpy())
        n = len(v)
        i25 = max(0, int(np.ceil(0.25 * n)) - 1)
        i75 = max(0, int(np.ceil(0.75 * n)) - 1)
        return pd.DataFrame({"lang": [df["lang"].iloc[0]],
                             "t_lo": [v[i25]], "t_hi": [v[i75]]})

    th = (scored.select_columns(["lang", "avg_logp"])
          .groupby("lang").map_groups(th_group, batch_format="pandas")
          .to_pandas().sort_values("lang"))
    lang_keys = np.asarray(th["lang"].to_numpy(), dtype=np.str_)
    t_lo, t_hi = th["t_lo"].to_numpy(), th["t_hi"].to_numpy()

    def assign(b: pa.Table) -> pa.Table:
        langs = np.asarray(
            b.column("lang").to_numpy(zero_copy_only=False),
            dtype=np.str_)  # unicode dtype → C-speed searchsorted
        s = b.column("avg_logp").to_numpy()
        li = np.searchsorted(lang_keys, langs)
        bucket = np.where(s <= t_lo[li], "tail",
                          np.where(s <= t_hi[li], "middle", "head"))
        t = pa.table({"lang": b.column("lang"),
                      "bucket": pa.array(bucket),
                      "one": pa.array(np.ones(len(b), dtype=np.int64))})
        return (pa.TableGroupBy(t, ["lang", "bucket"])
                .aggregate([("one", "sum")])
                .rename_columns(["lang", "bucket", "n_docs"]))

    return (scored.map_batches(assign, batch_format="pyarrow")
            .groupby(["lang", "bucket"])
            .aggregate(Sum("n_docs", alias_name="n_docs"))
            .sort(["lang", "bucket"]))


SQL_DOCUMENTS_CCNET_BUCKETS = """
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(coalesce(text, '')),
                                   '[a-zA-ZÀ-ÿ]+')) AS tok
  FROM documents
),
chars AS (SELECT doc_id, lang, regexp_extract_all(tok, '.') AS cs
          FROM toks),
bg AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(cs)), i -> cs[i])) AS ca,
         unnest(list_transform(range(1, len(cs)),
                               i -> cs[i] || cs[i+1])) AS b
  FROM chars WHERE len(cs) >= 2
),
model AS (SELECT b, any_value(ca) AS ca, count(*) AS c FROM bg GROUP BY b),
prefix AS (SELECT ca, sum(c) AS ctot FROM model GROUP BY ca),
scored AS (
  SELECT g.doc_id, any_value(g.lang) AS lang,
         round(sum(ln((m.c * 1.0) / p.ctot)) / count(*), 6) AS avg_logp
  FROM bg g JOIN model m USING (b) JOIN prefix p ON m.ca = p.ca
  GROUP BY g.doc_id
),
th AS (
  SELECT lang,
         quantile_disc(avg_logp, 0.25) AS t_lo,
         quantile_disc(avg_logp, 0.75) AS t_hi
  FROM scored GROUP BY lang
)
SELECT s.lang,
       CASE WHEN s.avg_logp <= t.t_lo THEN 'tail'
            WHEN s.avg_logp <= t.t_hi THEN 'middle'
            ELSE 'head' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM scored s JOIN th t USING (lang)
GROUP BY 1, 2
ORDER BY 1, 2
"""


# -- edit-distance near-dup pairs (string-similarity join) ---------------------

_ED_PREFIX = 64      # chars of prefix compared
_ED_MAX = 4          # max edit distance
_ED_LEN_DIFF = 8     # max |n_chars| difference between pair members
_ED_BLOCK = 16       # length-band width; must be > _ED_LEN_DIFF


def _banded_levenshtein(a: str, b: str, k: int) -> int:
    """Ukkonen-banded unit-cost Levenshtein, early-exit above k.
    Returns k+1 when the distance exceeds k. O(len(a)·(2k+1)) cells —
    with 64-char prefixes and k=4 that is ≤ 576 cells per pair, and it
    only ever runs on in-block candidates that already passed the
    vectorized length filter."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    big = k + 1
    prev = [j if j <= k else big for j in range(lb + 1)]
    for i in range(1, la + 1):
        lo = max(0, i - k)          # first in-band cell of this row
        hi = min(lb, i + k)
        cur = [big] * (lb + 1)
        if lo == 0:
            cur[0] = i
        for j in range(max(1, lo), hi + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j - 1] + cost,
                         prev[j] + 1, cur[j - 1] + 1)
        if min(cur[lo:hi + 1]) > k:
            return big
        prev = cur
    return prev[lb] if prev[lb] <= k else big


def documents_editdist_dups(sf_dir: str, num_buckets: int = 64):
    """String-similarity join: pairs of same-language documents whose
    lengths differ by ≤ 8 chars and whose 64-char prefixes are within
    edit distance 4 — the typo/near-identical-boilerplate dedup that
    hash-exact dedup misses and shingle-Jaccard over-reaches (single
    in-word edits barely move 5-gram sets but are exactly what edit
    distance counts).

    Scale shape — lossless length-band blocking: each doc is emitted to
    its home band floor(n_chars/16) and as a GHOST to band+1; a
    qualifying pair (|Δlen| ≤ 8 < 16) lands either in one home band or
    in adjacent bands, where the ghost copy meets the larger band's
    natives — counted exactly once by the rule (home,home) ∪
    (ghost,home). Bands co-locate via ONE groupby on (lang, band,
    bucket-salt); inside a block the |Δlen| ≤ 8 prefilter is a
    vectorized numpy outer compare and only surviving candidates run
    the banded O(len·k) DP. Never an all-pairs scan across bands; the
    oracle is the blocking-free SQL self-join, so the parity check IS
    the losslessness proof."""
    import pandas as pd
    import pyarrow.compute as pc

    docs = _read_docs(sf_dir, ["doc_id", "text", "lang", "n_chars"])

    def emit(b: pa.Table) -> pa.Table:
        pre = pc.utf8_slice_codeunits(b.column("text"), 0, _ED_PREFIX)
        n = b.column("n_chars").to_numpy(zero_copy_only=False)
        home = n // _ED_BLOCK
        base = pa.table({
            "doc_id": b.column("doc_id"), "lang": b.column("lang"),
            "n_chars": b.column("n_chars"), "prefix": pre})
        both = pa.concat_tables([
            base.append_column("band", pa.array(home))
                .append_column("ghost", pa.array(
                    np.zeros(len(b), dtype=bool))),
            base.append_column("band", pa.array(home + 1))
                .append_column("ghost", pa.array(
                    np.ones(len(b), dtype=bool)))])
        return both

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_a": [], "doc_b": [], "dist": []}
        for (_, _), g in df.groupby(["lang", "band"], sort=False):
            ids = g["doc_id"].to_numpy()
            ln = g["n_chars"].to_numpy()
            gh = g["ghost"].to_numpy()
            txt = g["prefix"].to_numpy()
            m = len(g)
            if m < 2:
                continue
            # candidate pairs in near-linear space: sort by length and
            # pair each row only with the rows inside its +_ED_LEN_DIFF
            # window (a triu_indices materialization is O(m²) memory —
            # a 50k-doc band would allocate ~10 GB before the length
            # mask). Remaining masks: not ghost-ghost, distinct ids,
            # not counted twice (a cross-band pair is claimed by the
            # block where the ghost meets a native; a same-home-band
            # pair is claimed by the home block only).
            order = np.argsort(ln, kind="stable")
            ids, ln, gh, txt = (ids[order], ln[order], gh[order],
                                txt[order])
            end = np.searchsorted(ln, ln + _ED_LEN_DIFF, side="right")
            cnt = np.maximum(end - np.arange(m) - 1, 0)
            ii = np.repeat(np.arange(m), cnt)
            offs = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            jj = np.arange(cnt.sum()) - np.repeat(offs, cnt) + ii + 1
            ok = ~(gh[ii] & gh[jj]) & (ids[ii] != ids[jj])
            # same-band natives pair in their home block; ghost+native
            # pairs only count when their HOME bands differ (else the
            # home block already counted them)
            both_native = ~gh[ii] & ~gh[jj]
            home_i = ln[ii] // _ED_BLOCK
            home_j = ln[jj] // _ED_BLOCK
            ok &= both_native | (home_i != home_j)
            for i, j in zip(ii[ok], jj[ok]):
                d = _banded_levenshtein(txt[i], txt[j], _ED_MAX)
                if d <= _ED_MAX:
                    a, bb = (ids[i], ids[j]) if ids[i] < ids[j] \
                        else (ids[j], ids[i])
                    out["doc_a"].append(a)
                    out["doc_b"].append(bb)
                    out["dist"].append(d)
        return pd.DataFrame({
            "doc_a": np.asarray(out["doc_a"], dtype=np.int64),
            "doc_b": np.asarray(out["doc_b"], dtype=np.int64),
            "dist": np.asarray(out["dist"], dtype=np.int64)})

    def add_key(b: pa.Table) -> pa.Table:
        from ..stages.exchange import hash_rows_mod
        ids = hash_rows_mod(b, ["lang", "band"], num_buckets)
        return b.append_column("block", pa.array(ids, type=pa.int32()))

    return (docs.map_batches(emit, batch_format="pyarrow")
            .map_batches(add_key, batch_format="pyarrow")
            .groupby("block")
            .map_groups(pairs, batch_format="pandas")
            .sort(["doc_a", "doc_b"]))


SQL_DOCUMENTS_EDITDIST_DUPS = f"""
SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b,
       CAST(levenshtein(substr(d1.text, 1, {_ED_PREFIX}),
                        substr(d2.text, 1, {_ED_PREFIX})) AS BIGINT)
           AS dist
FROM documents d1 JOIN documents d2
  ON d1.lang = d2.lang AND d1.doc_id < d2.doc_id
 AND abs(d1.n_chars - d2.n_chars) <= {_ED_LEN_DIFF}
 AND levenshtein(substr(d1.text, 1, {_ED_PREFIX}),
                 substr(d2.text, 1, {_ED_PREFIX})) <= {_ED_MAX}
ORDER BY doc_a, doc_b
"""


# -- prefix-filtered exact set-similarity join (PPJoin-lite) -------------------

def documents_setsim_join(sf_dir: str, threshold: float = 0.3,
                          num_partitions: int = 8):
    """Exact word-3-gram Jaccard join with PREFIX FILTERING (Chaudhuri
    et al. ICDE'06; Xiao et al. WWW'08 PPJoin) — the LOSSLESS
    candidate-generation alternative to documents_ngram_jaccard's
    (lang, length-band) blocking and MinHash's probabilistic banding:
    order every document's shingle set by global rarity (df asc,
    shingle asc) and emit only its first |x| - ceil(t·|x|) + 1
    shingles; any pair with J ≥ t MUST collide on at least one emitted
    prefix shingle, so parity with the blocking-free brute-force SQL
    oracle proves zero missed pairs (the band-blocked variant can in
    principle drop a cross-band pair; this one cannot).

    Scale shape, four bounded exchanges: (1) per-block shingle-set
    explode → groupby(shingle) document frequencies (combinable
    counts); (2) shingle-keyed join ships each (doc, shingle) row its
    df — the ordering is distributed, NEVER a driver/broadcast
    vocabulary; (3) groupby(doc).map_groups sorts in-doc by (df,
    shingle) and cuts the prefix — output rows shrink to ~(1-t)·|x|
    per doc; (4) groupby(prefix shingle) pairs docs in-group
    (vectorized triu + the |y| ≥ t·|x| length filter — rare-first
    ordering keeps these groups tiny: a df-1 shingle pairs nothing, a
    stopword shingle almost never survives into a prefix). The
    candidate set is near-dup-sized, so exact verification reuses the
    MinHash fast path: distinct candidate ids broadcast → semi-filter
    docs → one map over the pair list with broadcast texts (the
    union+groupby join of documents_minhash_dups remains the
    documented fallback for adversarial candidate volumes)."""
    import math

    import ray
    import ray.data as rd

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def explode(b: pa.Table) -> pa.Table:
        # vectorized (the MinHashBands shingle machinery): shingles are
        # keyed by their 64-bit window hash, deduped per doc via one
        # lexsort — no per-row Python on the corpus scan. Hashing only
        # MERGES shingles (J_hash >= J_str), so prefix-filter
        # completeness w.r.t. the threshold is preserved and the exact
        # string-shingle verify below keeps precision.
        texts = b.column("text").to_pylist()
        dids = b.column("doc_id").to_numpy(zero_copy_only=False)
        sh, n_sh, _offs = _shingle_hash_arrays(texts)
        doc_idx = np.repeat(np.arange(len(n_sh), dtype=np.int64), n_sh)
        order = np.lexsort((sh, doc_idx))
        ds_, ss_ = doc_idx[order], sh[order]
        first = np.ones(len(ss_), dtype=bool)
        first[1:] = (ds_[1:] != ds_[:-1]) | (ss_[1:] != ss_[:-1])
        ds_, ss_ = ds_[first], ss_[first]
        sizes = np.bincount(ds_, minlength=len(n_sh)).astype(np.int64)
        return pa.table({"doc_id": pa.array(dids[ds_], pa.int64()),
                         "sh": pa.array(ss_.view(np.int64), pa.int64()),
                         "size": pa.array(sizes[ds_], pa.int64())})

    from ray.data.aggregate import Count

    tok = (docs.map_batches(explode, batch_format="pyarrow")
           .repartition(num_partitions).materialize())
    dfreq = (tok.groupby("sh").aggregate(Count(alias_name="df"))
             .repartition(num_partitions))
    ranked = tok.join(dfreq, join_type="inner",
                      num_partitions=num_partitions,
                      on=("sh",), right_on=("sh",))

    def prefix(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["df", "sh"], kind="mergesort")
        n = int(g["size"].iloc[0])
        p = n - int(math.ceil(threshold * n)) + 1
        return g.head(p)[["sh", "doc_id", "size"]]

    import pandas as pd

    def pairs(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sz = g["size"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        i, j = np.triu_indices(len(ids), k=1)
        # length filter: J(x,y) ≥ t ⇒ t·|y| ≤ |x| (|x| ≤ |y|)
        keep = np.minimum(sz[i], sz[j]) >= threshold * np.maximum(
            sz[i], sz[j])
        keep &= ids[i] != ids[j]
        return pd.DataFrame({"doc_a": ids[i][keep],
                             "doc_b": ids[j][keep]}).drop_duplicates()

    cand = (ranked.groupby("doc_id")
            .map_groups(prefix, batch_format="pandas")
            .groupby("sh")
            .map_groups(pairs, batch_format="pandas")
            .materialize())

    # ---- size guard (round-4 advice): above the cap the verify runs
    # fully distributed — pairs deduped by groupby, full-corpus text
    # join — instead of the driver collect below
    if cand.count() > _pair_collect_cap():
        uniq_pairs = (cand.groupby(["doc_a", "doc_b"])
                      .aggregate(Count(alias_name="_n"))
                      .map_batches(lambda t: t.select(["doc_a", "doc_b"]),
                                   batch_format="pyarrow"))
        return (_distributed_shingle_verify(uniq_pairs, docs, threshold,
                                            1e6, 1e-6)
                .sort(["doc_a", "doc_b"]))

    # ---- exact verify over the (small) candidate set -----------------
    ptbl = cand.to_pandas().drop_duplicates(["doc_a", "doc_b"])
    empty = pa.Table.from_pydict({
        "doc_a": pa.array([], type=pa.int64()),
        "doc_b": pa.array([], type=pa.int64()),
        "jaccard": pa.array([], type=pa.float64())})
    if len(ptbl) == 0:
        return rd.from_arrow(empty)
    cand_ids = np.unique(np.concatenate(
        [ptbl["doc_a"].to_numpy(), ptbl["doc_b"].to_numpy()]))
    ids_ref = ray.put(pa.array(cand_ids, type=pa.int64()))

    def filter_docs(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return b.filter(_pc.is_in(b.column("doc_id"),
                                  value_set=ray.get(ids_ref)))

    parts = [t for t in ray.get(
        docs.map_batches(filter_docs,
                         batch_format="pyarrow").to_arrow_refs())
             if len(t)]
    texts_ref = ray.put(pa.concat_tables(parts))
    pair_ds = rd.from_arrow(pa.table({
        "doc_a": pa.array(ptbl["doc_a"].to_numpy(), pa.int64()),
        "doc_b": pa.array(ptbl["doc_b"].to_numpy(), pa.int64())}))

    def verify(b: pa.Table) -> pa.Table:
        tt = ray.get(texts_ref)
        text_of = dict(zip(tt.column("doc_id").to_pylist(),
                           tt.column("text").to_pylist()))
        memo: dict = {}

        def sh_of(d):
            if d not in memo:
                memo[d] = _shingles(text_of.get(d, ""))
            return memo[d]

        ra, rb, rj = [], [], []
        for a, b2 in zip(b.column("doc_a").to_pylist(),
                         b.column("doc_b").to_pylist()):
            sa, sb = sh_of(a), sh_of(b2)
            union = len(sa | sb)
            j = (len(sa & sb) / union) if union else 0.0
            if j >= threshold:
                ra.append(a)
                rb.append(b2)
                # half-away rounding (SQL round()); np.round half-even
                # would diverge on exact .5 ulp boundaries of the
                # small-integer ratio
                rj.append(np.floor(j * 1e6 + 0.5) * 1e-6)
        return pa.table({"doc_a": pa.array(ra, pa.int64()),
                         "doc_b": pa.array(rb, pa.int64()),
                         "jaccard": pa.array(rj, pa.float64())})

    return (pair_ds.map_batches(verify, batch_format="pyarrow")
            .sort(["doc_a", "doc_b"]))


SQL_DOCUMENTS_SETSIM_JOIN = r"""
WITH sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) = 0 THEN []
              WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         END AS sh
  FROM documents,
       LATERAL (SELECT regexp_extract_all(lower(text),
             '[^' || chr(9) || chr(10) || chr(12) || chr(13) || ' ]+')
         AS toks)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / nullif(len(list_distinct(a.sh || b.sh)), 0), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / nullif(len(list_distinct(a.sh || b.sh)), 0) >= 0.3
ORDER BY doc_a, doc_b
"""


# -- winnowing fingerprints (MOSS) --------------------------------------------

def _winnow_batch(b: pa.Table, w: int) -> pa.Table:
    """(doc_id, text) block → distinct (fp, doc_id) winnowing
    fingerprints: per doc, the k-gram hash sequence (the vectorized
    _shingle_hash_arrays) slides a w-window and keeps each window's
    MINIMUM hash, rightmost on ties (Schleimer/Wilkerson/Aiken
    SIGMOD'03 robust winnowing). Per-doc numpy (sliding_window_view +
    reversed argmin for the rightmost tie); the only Python loop is
    over docs, never tokens."""
    ids = b.column("doc_id").to_pylist()
    sh, n_sh, offs = _shingle_hash_arrays(b.column("text").to_pylist())
    out_fp, out_id = [], []
    for j, did in enumerate(ids):
        n = int(n_sh[j])
        if n == 0:
            continue
        seq = sh[offs[j]:offs[j] + n]
        if n <= w:
            # one window: rightmost minimum
            m = seq.min()
            out_fp.append(np.uint64(m))
            out_id.append(did)
            continue
        win = np.lib.stride_tricks.sliding_window_view(seq, w)
        # rightmost min: argmin over the REVERSED window finds the
        # last position attaining the minimum
        ridx = (w - 1) - np.argmin(win[:, ::-1], axis=1)
        pos = np.unique(np.arange(len(win)) + ridx)
        fps = np.unique(seq[pos])
        out_fp.extend(fps)
        out_id.extend([did] * len(fps))
    return pa.table({"fp": pa.array(np.array(out_fp, dtype=np.uint64)),
                     "doc_id": pa.array(out_id, type=pa.int64())})


def documents_winnowing_dups(sf_dir: str, w: int = 4,
                             min_shared: int = 2, max_df: int = 64):
    """Local-fingerprint near-duplicate pairs by winnowing — the MOSS
    plagiarism detector's sketch, with the guarantee MinHash lacks:
    ANY shared verbatim token run of length ≥ w + SHINGLE_K - 1 places
    at least one identical fingerprint in both documents (a w-window
    of shared k-gram hashes lies fully inside the run, and its minimum
    is position-independent). So winnowing catches LOCAL overlap —
    a copied paragraph inside otherwise-different pages — that
    whole-document Jaccard sketches dilute away.

    Scale shape: fingerprinting is map-only (density ~2/(w+1) of the
    k-gram count per doc); pairs generate inside groupby(fp) with the
    boilerplate cap max_df (a fingerprint shared by hundreds of docs
    is template noise and would blow up quadratically — the standard
    cap, a documented semantic exactly like host_cocitation's); the
    pair groupby sums shared-fingerprint counts and min_shared
    thresholds. Returns (doc_a, doc_b, n_shared) sorted by
    (-n_shared, doc_a, doc_b)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) < 2 or len(ids) > max_df:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        i, j = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[i], "doc_b": ids[j],
                             "n": np.ones(len(i), dtype=np.int64)})

    def close(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        b = b.filter(_pc.greater_equal(b.column("n_shared"),
                                       pa.scalar(min_shared)))
        return pa.table({"doc_a": b.column("doc_a"),
                         "doc_b": b.column("doc_b"),
                         "n_shared": b.column("n_shared").cast(pa.int64())})

    return (docs.map_batches(lambda b: _winnow_batch(b, w),
                             batch_format="pyarrow")
            .groupby("fp")
            .map_groups(pairs, batch_format="pandas")
            .groupby(["doc_a", "doc_b"])
            .aggregate(Sum("n", alias_name="n_shared"))
            .map_batches(close, batch_format="pyarrow")
            .sort(["n_shared", "doc_a", "doc_b"],
                  descending=[True, False, False]))


# ---------------------------------------------------------------------------
# sketch checkpoints: DuckDB oracles for the minhash/simhash dup families
# ---------------------------------------------------------------------------
#
# The sketches themselves (polars seed-0 token hashes, numpy permutation
# mins / bit votes) are not SQL-expressible, but their OUTPUTS are
# deterministic tables — checkpoint them and the downstream semantics
# become first-principles SQL: the minhash verify is an exact shingle
# Jaccard over candidate pairs regenerated from the band rows, and the
# simhash pigeonhole banding is LOSSLESS for hamming ≤ max_hamming
# (≤ 3 differing bits cannot touch all 4 bands), so a blocking-free
# all-pairs bit_count(xor) join is the exact ground truth — the same
# checkpoint + brute-force contract as the media near-dup oracles
# (stages/multimodal.py: media_dups_oracle_sql).

_SKETCH_CKPT_ROOT = "/tmp/gpml2pvjson_textsketch"
# bump when sketch semantics change (stale-checkpoint invalidation)
SKETCH_VERSION = 1


def sketch_checkpoint_path(name: str, sf_dir: str) -> str:
    """Deterministic sketch-parquet path — string arithmetic plus one
    stat() so oracle_sql() can embed it without running anything. The
    input corpus's BYTE SIZE is part of the name (like
    webgraph.host_edges_checkpoint_path's n/SEED/GEN_VERSION encoding):
    a regenerated documents.parquet auto-invalidates every sketch
    checkpoint instead of silently feeding the oracle signatures of the
    old corpus (round-4 advice)."""
    sf = os.path.basename(os.path.normpath(sf_dir))
    try:
        nbytes = os.path.getsize(os.path.join(sf_dir,
                                              "documents.parquet"))
    except OSError:
        nbytes = 0
    return os.path.join(
        _SKETCH_CKPT_ROOT,
        f"{name}_{sf}_b{nbytes}_v{SKETCH_VERSION}.parquet")


def _checkpoint_sorted(ds, sort_cols, path: str):
    """Collect-and-write a BOUNDED oracle artifact (driver-check scale
    only — the corpus-scale dedup path never materializes these; at
    sf0.01 the band table is 16 rows/doc over 500 docs)."""
    import pyarrow.parquet as pq
    t = pa.Table.from_pandas(
        ds.to_pandas().sort_values(sort_cols).reset_index(drop=True),
        preserve_index=False)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


def documents_minhash_dups_oracled(sf_dir: str):
    """documents_minhash_dups with a driver-verifiable contract: the
    (band_id, band_hash, doc_id) rows are checkpointed, and the DuckDB
    oracle regenerates candidate pairs from band collisions and runs
    the exact shingle-Jaccard verify in SQL (minhash_oracle_sql_for_sf)
    — so both the banding output and the verify threshold/rounding get
    a hash-checked driver row."""
    path = sketch_checkpoint_path("minhash_bands", sf_dir)
    if not os.path.exists(path):
        docs = _read_docs(sf_dir, ["doc_id", "text"])
        bands = docs.map_batches(MinHashBands(), batch_format="pyarrow",
                                 batch_size=1024)
        _checkpoint_sorted(bands, ["doc_id", "band_id"], path)
    return documents_minhash_dups(sf_dir)


def documents_simhash_dups_oracled(sf_dir: str):
    """documents_simhash_dups under the checkpoint + brute-force-oracle
    contract: the (doc_id, simhash) table is checkpointed; the oracle
    all-pairs bit_count(xor) join proves the Manku pigeonhole banding
    lossless against ground truth."""
    path = sketch_checkpoint_path("simhash", sf_dir)
    if not os.path.exists(path):
        docs = _read_docs(sf_dir, ["doc_id", "text"])

        def sig(batch: pa.Table) -> pa.Table:
            fps = _simhash_batch(batch.column("text").to_pylist())
            return pa.Table.from_pydict({
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(fps.view(np.int64), type=pa.int64())})

        _checkpoint_sorted(docs.map_batches(sig, batch_format="pyarrow",
                                            batch_size=1024),
                           ["doc_id"], path)
    return documents_simhash_dups(sf_dir)


# shingle-set SQL fragment shared with SQL_DOCUMENTS_NGRAM_JACCARD's
# tokenization (k = SHINGLE_K = 3, lowercase, ASCII-whitespace tokens)
_SQL_SHINGLES = r"""
  SELECT doc_id,
         CASE WHEN len(toks) = 0 THEN []
              WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         END AS sh
  FROM documents,
       LATERAL (SELECT regexp_extract_all(lower(text),
             '[^' || chr(9) || chr(10) || chr(12) || chr(13) || ' ]+')
         AS toks)"""


def minhash_oracle_sql_for_sf(sf_dir: str) -> str:
    """Candidate pairs from band-hash collisions over the checkpoint,
    verified by exact shingle Jaccard at the engine's 0.5 threshold;
    the half-away floor rounding mirrors the engine verify bit-for-bit
    (see _round4_away for why round() differs between engines)."""
    p = sketch_checkpoint_path("minhash_bands", sf_dir)
    return f"""
WITH br AS MATERIALIZED (
  SELECT band_id, band_hash, doc_id FROM read_parquet('{p}')),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM br a JOIN br b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id),
sh AS MATERIALIZED ({_SQL_SHINGLES}),
jac AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / nullif(len(list_distinct(a.sh || b.sh)), 0) AS j
  FROM cand c JOIN sh a ON a.doc_id = c.doc_a
              JOIN sh b ON b.doc_id = c.doc_b)
SELECT doc_a, doc_b, floor(j * 10000.0 + 0.5) * 0.0001 AS jaccard
FROM jac WHERE j >= {JACCARD_THRESHOLD!r}"""


def simhash_oracle_sql_for_sf(sf_dir: str, max_hamming: int = 3) -> str:
    """Brute-force all-pairs Hamming join over the simhash checkpoint —
    the blocking-free ground truth the banded engine path must equal
    exactly (banding is lossless at hamming ≤ max_hamming by the
    pigeonhole argument in documents_simhash_dups)."""
    p = sketch_checkpoint_path("simhash", sf_dir)
    return f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM read_parquet('{p}') a JOIN read_parquet('{p}') b
  ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"""


def documents_winnowing_dups_oracled(sf_dir: str):
    """documents_winnowing_dups under the checkpoint contract: the
    (fp, doc_id) winnow fingerprints are checkpointed and the DuckDB
    oracle re-derives the whole downstream — distinct doc-per-fp,
    boilerplate df cap, pair counts, min_shared threshold — from first
    principles SQL (winnowing_oracle_sql_for_sf)."""
    path = sketch_checkpoint_path("winnow_fps", sf_dir)
    if not os.path.exists(path):
        docs = _read_docs(sf_dir, ["doc_id", "text"])
        fps = docs.map_batches(lambda b: _winnow_batch(b, 4),
                               batch_format="pyarrow")
        _checkpoint_sorted(fps, ["doc_id", "fp"], path)
    return documents_winnowing_dups(sf_dir)


def winnowing_oracle_sql_for_sf(sf_dir: str, min_shared: int = 2,
                                max_df: int = 64) -> str:
    """Shared-fingerprint pair counts over the winnow checkpoint —
    everything after the sketch is relational (distinct, df cap,
    self-join, threshold), so the SQL is a full independent recompute
    of the engine's groupby(fp) pair generation."""
    p = sketch_checkpoint_path("winnow_fps", sf_dir)
    return f"""
WITH f AS MATERIALIZED (
  SELECT DISTINCT fp, doc_id FROM read_parquet('{p}')),
df AS MATERIALIZED (SELECT fp, count(*) AS nd FROM f GROUP BY fp),
ok AS MATERIALIZED (
  SELECT f.fp, f.doc_id FROM f JOIN df USING (fp)
  WHERE nd BETWEEN 2 AND {max_df})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM ok a JOIN ok b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {min_shared}"""


def documents_simhash_oracled(sf_dir: str):
    """documents_simhash with its signature checkpoint guaranteed (the
    same parquet documents_simhash_dups_oracled writes) — the oracle is
    the identity hex rendering over the checkpoint, which pins the
    engine's fingerprint determinism end-to-end."""
    path = sketch_checkpoint_path("simhash", sf_dir)
    if not os.path.exists(path):
        documents_simhash_dups_oracled(sf_dir)   # writes the checkpoint
    return documents_simhash(sf_dir)


def simhash_identity_oracle_sql_for_sf(sf_dir: str) -> str:
    p = sketch_checkpoint_path("simhash", sf_dir)
    return (f"SELECT doc_id, lpad(lower(to_hex(simhash)), 16, '0') "
            f"AS simhash FROM read_parquet('{p}')")


def documents_fingerprint_oracled(sf_dir: str):
    """documents_fingerprint under the identity-checkpoint contract
    (determinism gate, like kg_host_link_graph)."""
    path = sketch_checkpoint_path("fingerprint", sf_dir)
    if not os.path.exists(path):
        _checkpoint_sorted(documents_fingerprint(sf_dir),
                           ["doc_id"], path)
    return documents_fingerprint(sf_dir)


def fingerprint_oracle_sql_for_sf(sf_dir: str) -> str:
    p = sketch_checkpoint_path("fingerprint", sf_dir)
    return f"SELECT doc_id, fingerprint FROM read_parquet('{p}')"
