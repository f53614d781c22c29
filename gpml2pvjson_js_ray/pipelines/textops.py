"""Text-analysis + deduplication operators over the `documents` table —
the training-data-pipeline operator set (language-ID, quality scoring,
fingerprinting, MinHash-LSH near-dup, SimHash), each Ray-Data-first.

Sketch-based ops are not SQL-expressible; the driver records rows-only
checks and pytest covers their semantics on known inputs.
"""

from __future__ import annotations

import hashlib
import os
import re
import struct

import numpy as np
import pyarrow as pa


def _read_docs(sf_dir: str, columns):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=columns)


_TOKEN_RE = re.compile(r"[a-zA-ZÀ-ÿ]+")

_STOPWORDS = {
    "en": {"the", "of", "and", "to", "a", "in", "is", "that", "for", "it",
           "with", "as", "was", "on", "are", "by", "this", "be", "from"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "von", "mit",
           "nicht", "auf", "auch", "für", "werden", "sind", "zwischen"},
    "fr": {"le", "la", "les", "et", "est", "une", "des", "dans", "pour",
           "avec", "pas", "sur", "sont", "été", "entre"},
}


class LangId:
    """Stopword-overlap language identifier. Callable-class form: the
    per-language structures are built once per actor in __init__ (the
    actor-pool pattern for stateful stages), not per batch."""

    def __init__(self):
        self.token_re = _TOKEN_RE
        self.stopwords = {lang: frozenset(ws)
                          for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, scores = [], []
        for text in batch.column("text").to_pylist():
            toks = [t.lower() for t in self.token_re.findall(text or "")]
            best_lang, best = "unknown", 0.0
            n = max(1, len(toks))
            for lang, sw in self.stopwords.items():
                score = sum(1 for t in toks if t in sw) / n
                if score > best:
                    best_lang, best = lang, score
            preds.append(best_lang if best > 0.02 else "unknown")
            scores.append(round(best, 6))
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(preds, type=pa.string()),
            "lang_score": pa.array(scores, type=pa.float64())})


def documents_langid(sf_dir: str):
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    return docs.map_batches(LangId, batch_format="pyarrow",
                            batch_size=2048, concurrency=2, num_cpus=1)


def documents_quality(sf_dir: str):
    """Length / punctuation / stopword-ratio quality features + a composite
    score (training-data quality filtering)."""
    docs = _read_docs(sf_dir, ["doc_id", "text", "lang"])

    def score(batch: pa.Table) -> pa.Table:
        out = {"doc_id": batch.column("doc_id"), "n_tokens": [],
               "mean_token_len": [], "stopword_ratio": [],
               "alpha_ratio": [], "quality_score": []}
        langs = batch.column("lang").to_pylist()
        for text, lang in zip(batch.column("text").to_pylist(), langs):
            text = text or ""
            toks = _TOKEN_RE.findall(text)
            n = len(toks)
            mean_len = (sum(len(t) for t in toks) / n) if n else 0.0
            sw = _STOPWORDS.get(lang, _STOPWORDS["en"])
            sw_ratio = (sum(1 for t in toks if t.lower() in sw) / n) \
                if n else 0.0
            alpha = sum(1 for c in text if c.isalpha())
            alpha_ratio = alpha / max(1, len(text))
            q = (min(1.0, n / 50.0) * 0.4 + min(1.0, sw_ratio * 5) * 0.3
                 + alpha_ratio * 0.3)
            out["n_tokens"].append(n)
            out["mean_token_len"].append(round(mean_len, 4))
            out["stopword_ratio"].append(round(sw_ratio, 4))
            out["alpha_ratio"].append(round(alpha_ratio, 4))
            out["quality_score"].append(round(q, 4))
        return pa.Table.from_pydict(out)

    return docs.map_batches(score, batch_format="pyarrow", batch_size=2048)


# -- rolling-hash fingerprint ----------------------------------------------

_FP_BASE = 1000003
_FP_MOD = (1 << 61) - 1


def _fingerprint(tokens: list[str]) -> str:
    h = 0
    for t in tokens:
        th = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8)
                            .digest(), "big")
        h = (h * _FP_BASE + th) % _FP_MOD
    return format(h, "016x")


def documents_fingerprint(sf_dir: str):
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        fps = [_fingerprint((t or "").split())
               for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(fps, type=pa.string())})

    return docs.map_batches(fp, batch_format="pyarrow", batch_size=2048)


# -- MinHash + LSH near-duplicate detection ---------------------------------

N_PERM = 64
N_BANDS = 16  # 4 rows per band
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5

_rng = np.random.RandomState(12345)
_PERM_A = _rng.randint(1, 2**63 - 1, size=N_PERM).astype(np.uint64) | np.uint64(1)
_PERM_B = _rng.randint(0, 2**63 - 1, size=N_PERM).astype(np.uint64)


def _shingles(text: str) -> set:
    toks = (text or "").lower().split()
    if len(toks) < SHINGLE_K:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + SHINGLE_K])
            for i in range(len(toks) - SHINGLE_K + 1)}


def _shingle_hashes(shingles: set) -> np.ndarray:
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8)
                        .digest(), "big") for s in shingles),
        dtype=np.uint64, count=len(shingles))


def _minhash(shingles: set) -> np.ndarray:
    hs = _shingle_hashes(shingles)
    if hs.size == 0:
        return np.zeros(N_PERM, dtype=np.uint64)
    # universal-ish hash (a*x + b) mod 2^64 per permutation (natural uint64
    # wraparound), min over shingles — fully vectorized
    vals = hs[None, :] * _PERM_A[:, None] + _PERM_B[:, None]
    return vals.min(axis=1)


class MinHashBands:
    """map_batches stage: doc → (band_id, band_hash, doc_id) rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        band_ids, band_hashes, doc_ids = [], [], []
        rows_per_band = N_PERM // N_BANDS
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            mh = _minhash(_shingles(text))
            for b in range(N_BANDS):
                seg = mh[b * rows_per_band:(b + 1) * rows_per_band]
                bh = hashlib.blake2b(seg.tobytes(), digest_size=8).hexdigest()
                band_ids.append(b)
                band_hashes.append(bh)
                doc_ids.append(doc_id)
        return pa.Table.from_pydict({
            "band_id": pa.array(band_ids, type=pa.int32()),
            "band_hash": pa.array(band_hashes, type=pa.string()),
            "doc_id": pa.array(doc_ids, type=pa.int64())})


def documents_minhash_dups(sf_dir: str):
    """MinHash→band→bucket-groupby candidate pairs, verified by exact
    shingle Jaccard — fully distributed, nothing materializes on the
    driver:

      1. band rows → groupby(bucket) → candidate pairs (as before);
      2. pairs explode into (doc_id, doc_a, doc_b) side rows; a
         union + groupby(doc_id) joins each side row to its doc text
         (the canonical Ray-Data repartition join — one shuffle of the
         text column keyed by doc_id);
      3. groupby(doc_a, doc_b) brings both sides of a pair together and
         computes exact shingle Jaccard inside the group (duplicate
         candidates from multiple colliding bands collapse here for free).

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    import itertools

    import pandas as pd

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
                       .map_groups(pairs, batch_format="pandas"))

    # ---- distributed text join: explode pair sides, union with docs,
    # group by doc_id (side rows have text="", the doc row carries it)
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
            if j >= JACCARD_THRESHOLD:
                rows.append((int(a), int(b), round(j, 4)))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]) \
            if rows else pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64"),
                 "jaccard": pd.Series([], dtype="float64")})

    return joined.groupby(["doc_a", "doc_b"]).map_groups(
        verify_pair, batch_format="pandas")


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
        langs = b.column("lang").to_pylist()
        texts = b.column("text").to_pylist()
        blocks = [f"{lang}:{len((t or '').split()) // 40}"
                  for lang, t in zip(langs, texts)]
        return b.append_column("block", pa.array(blocks, type=pa.string()))

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

def _simhash64(tokens: list[str]) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8)
                           .digest(), "big")
        bits = np.unpackbits(
            np.frombuffer(struct.pack(">Q", h), dtype=np.uint8))
        acc += bits.astype(np.int64) * 2 - 1
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= (1 << (63 - i))
    return out


def documents_simhash(sf_dir: str):
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def sh(batch: pa.Table) -> pa.Table:
        vals = [format(_simhash64((t or "").lower().split()), "016x")
                for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(vals, type=pa.string())})

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
        doc_ids, band_ids, band_vals, hashes = [], [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            h = _simhash64((text or "").lower().split())
            for b in range(n_bands):
                band_ids.append(b)
                band_vals.append((h >> (b * band_bits))
                                 & ((1 << band_bits) - 1))
                doc_ids.append(doc_id)
                hashes.append(h)
        return pa.Table.from_pydict({
            "band_id": pa.array(band_ids, type=pa.int32()),
            "band_val": pa.array(band_vals, type=pa.int64()),
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "simhash": pa.array([v - (1 << 64) if v >= (1 << 63) else v
                                 for v in hashes], type=pa.int64()),
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
