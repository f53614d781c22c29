"""Lexical / tokenizer-training operators: dictionary mention detection,
inverted-index intersection search, BPE merge-pair counting, kNN graph.

Beyond-reference extension surface (SURVEY.md §2 extension table) — each
expressed scale-first over the synthetic driver tables:

- **Dictionary mention detection** (`documents_entity_mentions`): the
  plain-text analogue of the KG pipeline's xref entity linking
  (`stages/link.py`, reference `Processor.ts` xref lookups): a small
  gazetteer of surface form → KB IRI is broadcast by closure, each batch
  tokenizes vectorized, filters to dictionary hits and counts mentions
  per (doc, term) ENTIRELY in-batch (a document's tokens are complete
  inside its row, so no shuffle exists at any corpus size). At a
  dictionary too large to broadcast the same pass becomes a term-hash
  `Dataset.join`, the shape `pipelines/joins.py` demonstrates.
- **Index-intersection search** (`documents_search_and`): multi-term AND
  query answered the inverted-index way — per-batch DISTINCT (doc, term)
  pairs filtered to the query terms BEFORE the exchange, so the groupby
  that intersects posting lists carries at most |query| rows per
  matching document, never tokens. The degenerate-to-scan alternative
  (regex per doc) is what this operator exists to avoid at 100 TB.
- **BPE merge-pair counting** (`documents_bpe_pair_stats`): the inner
  statistic of byte-pair-encoding tokenizer training — corpus-wide
  counts of adjacent within-word byte pairs. Each batch folds its texts
  into one uint8 buffer and counts pairs with a single vectorized
  bincount over `256*b[:-1] + b[1:]` (no per-token Python, no per-pair
  dict); the exchange then carries ≤ 256² count rows per block —
  constant-size regardless of corpus bytes, the combiner pattern that
  makes tokenizer training a one-pass streaming job.
- **kNN graph** (`embeddings_knn_graph`): each vector's top-k neighbors
  by cosine — the exact broadcast-brute-force baseline (one matmul per
  batch against the unit-normalized matrix in the object store, the
  same shape as `simops.embeddings_near_dups_exact`); ranks break ties
  on the 6-dp-rounded score then neighbor id so the order is
  cross-engine stable. At scale the candidate generator swaps to the
  persisted IVF/LSH indexes in `pipelines/simops.py`; this exact pass
  is their per-bucket scorer and small-corpus ground truth.

Column names match the oracle SQL aliases exactly (the driver's
hash-compare sorts columns by name).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .relational import _read

# Same token recipe as documents_top_terms / documents_term_postings
# (validated cross-engine: polars rust-regex == DuckDB RE2 on this class).
_TERM_RE = "[a-zA-ZÀ-ÿ]+"

# Gazetteer: surface form → knowledge-base IRI. Deliberately NOT derivable
# from the term string (forces a real lookup, like a BridgeDb xref table);
# broadcast by closure — tiny, read-only, pickled once per worker.
_ENTITY_DICT = {
    "customer": "urn:kb:ent:0001",
    "spark": "urn:kb:ent:0002",
    "vector": "urn:kb:ent:0003",
    "table": "urn:kb:ent:0004",
    "dup": "urn:kb:ent:0005",
    "window": "urn:kb:ent:0006",
}

_SEARCH_TERMS = ("dup", "key", "vector")  # default AND query


def documents_entity_mentions(sf_dir: str):
    """Per-document mention counts against the broadcast gazetteer:
    (doc_id, term, iri, n_mentions) for every dictionary term that
    occurs in the document. Pure map — counts are complete in-batch."""
    from ..stages.exchange import polars_capped

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    terms = list(_ENTITY_DICT)
    iris = [_ENTITY_DICT[t] for t in terms]

    def mentions(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        gaz = pl.DataFrame({"term": terms, "iri": iris})
        out = (pl.from_arrow(b).select(
            "doc_id",
            term=pl.col("text").fill_null("").str.to_lowercase()
            .str.extract_all(_TERM_RE))
            .explode("term")
            .filter(pl.col("term").is_in(terms))
            .group_by(["doc_id", "term"])
            .agg(n_mentions=pl.len().cast(pl.Int64))
            .join(gaz, on="term", how="inner"))
        return (out.select(["doc_id", "term", "iri", "n_mentions"])
                .to_arrow().cast(pa.schema([
                    ("doc_id", pa.int64()), ("term", pa.string()),
                    ("iri", pa.string()), ("n_mentions", pa.int64())])))

    return docs.map_batches(mentions, batch_format="pyarrow")


SQL_DOCUMENTS_ENTITY_MENTIONS = """
WITH gaz(term, iri) AS (VALUES
  ('customer', 'urn:kb:ent:0001'), ('spark', 'urn:kb:ent:0002'),
  ('vector', 'urn:kb:ent:0003'), ('table', 'urn:kb:ent:0004'),
  ('dup', 'urn:kb:ent:0005'), ('window', 'urn:kb:ent:0006')),
toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')),
                                   '[a-zA-ZÀ-ÿ]+')) AS term
  FROM documents)
SELECT t.doc_id, t.term, g.iri, count(*) AS n_mentions
FROM toks t JOIN gaz g USING (term)
GROUP BY t.doc_id, t.term, g.iri
"""


def documents_search_and(sf_dir: str, terms: tuple[str, ...] = _SEARCH_TERMS):
    """Documents containing ALL query terms, by posting-list
    intersection: distinct (doc, term) hits are extracted and filtered
    per batch (the exchange carries ≤ |terms| rows per candidate doc),
    then one groupby counts distinct matched terms per doc."""
    from ..stages.exchange import polars_capped

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    want = sorted(set(terms))

    def hits(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        out = (pl.from_arrow(b).select(
            "doc_id",
            term=pl.col("text").fill_null("").str.to_lowercase()
            .str.extract_all(_TERM_RE))
            .explode("term")
            .filter(pl.col("term").is_in(want))
            .unique())
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("term", pa.string())]))

    def full_match(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.equal(b.column("n_terms"), len(want))
        return b.filter(mask).select(["doc_id"])

    from ray.data.aggregate import Count
    # rows are distinct (doc, term) pairs ⇒ Count == distinct terms hit
    return (docs.map_batches(hits, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Count(alias_name="n_terms"))
            .map_batches(full_match, batch_format="pyarrow")
            .sort("doc_id"))


SQL_DOCUMENTS_SEARCH_AND = """
WITH hits AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(coalesce(text, '')),
                                     '[a-zA-ZÀ-ÿ]+')) AS term
    FROM documents)
  WHERE term IN ('dup', 'key', 'vector'))
SELECT doc_id FROM hits
GROUP BY doc_id HAVING count(*) = 3
ORDER BY doc_id
"""


def documents_bpe_pair_stats(sf_dir: str, k: int = 50):
    """Top-k adjacent within-word byte pairs across the corpus — one
    merge-candidate scoring pass of BPE tokenizer training. Per batch:
    texts fold into a single NUL-joined uint8 buffer; pair codes are
    `256*b[:-1] + b[1:]`, masked to the printable-ASCII alphabet (NUL /
    whitespace are word boundaries; non-ASCII bytes are excluded so
    byte pairs == the oracle's character pairs), one bincount. The
    exchange carries per-block (pair, n) partials (≤ 65536 rows, in
    practice ~|alphabet|²) — constant-size in corpus bytes."""
    docs = _read(sf_dir, "documents", ["text"])
    # pair alphabet = printable ASCII (0x21-0x7E): whitespace/NUL are the
    # word-boundary rule, and non-ASCII BYTES are excluded so the byte
    # pairs counted here are exactly the character pairs the SQL oracle
    # counts ('à' is 2 UTF-8 bytes — intra-character byte pairs would
    # diverge from substring() semantics on accented corpora).
    _keep = np.zeros(256, dtype=bool)
    _keep[0x21:0x7F] = True
    _sep = ~_keep

    def partial(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        buf = np.frombuffer(
            "\x00".join(t or "" for t in texts).encode("utf-8"),
            dtype=np.uint8)
        if len(buf) < 2:
            return pa.Table.from_pydict({
                "pair": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64())})
        a, c = buf[:-1], buf[1:]
        ok = ~(_sep[a] | _sep[c])
        codes = a[ok].astype(np.int32) * 256 + c[ok]
        counts = np.bincount(codes, minlength=65536)
        nz = np.flatnonzero(counts)
        pairs = [chr(v >> 8) + chr(v & 0xFF) for v in nz]
        return pa.Table.from_pydict({
            "pair": pa.array(pairs, type=pa.string()),
            "n": pa.array(counts[nz], type=pa.int64())})

    from ray.data.aggregate import Sum
    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("pair")
            .aggregate(Sum("n", alias_name="n"))
            .sort(["n", "pair"], descending=[True, False])
            .limit(k))


SQL_DOCUMENTS_BPE_PAIR_STATS = """
WITH pos AS (
  SELECT text, unnest(generate_series(1, length(text) - 1)) AS g
  FROM documents WHERE text IS NOT NULL),
p AS (SELECT substring(text, g, 2) AS pair FROM pos)
SELECT pair, count(*) AS n FROM p
WHERE regexp_matches(pair, '^[!-~]{2}$')
GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 50
"""


def embeddings_knn_graph(sf_dir: str, k: int = 3):
    """Exact k-nearest-neighbor graph: (vec_id, neighbor_id, rank,
    cosine) with rank 1..k per vector, ordered by 6-dp-rounded cosine
    desc then neighbor_id asc (cross-engine-stable ties). Broadcast
    brute force — see module docstring for the sublinear swap."""
    import ray
    import pyarrow.dataset as pads
    from .simops import _emb_matrix, _read_emb

    tbl = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")) \
        .to_table(columns=["vec_id", "embedding"])
    ids_all, mat_all = _emb_matrix(tbl)
    order = np.argsort(ids_all)          # id-ascending ⇒ stable-sort
    ids_all = ids_all[order].astype(np.int64)   # tiebreak comes free
    norms = np.linalg.norm(mat_all[order], axis=1)
    norms[norms == 0] = 1.0
    ref = ray.put((ids_all, mat_all[order] / norms[:, None]))

    def topk(b: pa.Table) -> pa.Table:
        import ray as _ray
        ids_b, mat_b = _emb_matrix(b)
        bn = np.linalg.norm(mat_b, axis=1)
        bn[bn == 0] = 1.0
        all_ids, all_unit = _ray.get(ref)
        sims = np.round((mat_b / bn[:, None]) @ all_unit.T, 6)
        sims[ids_b[:, None] == all_ids[None, :]] = -np.inf  # no self edge
        # stable argsort on -sims: candidates already id-ascending, so
        # equal rounded scores resolve to the smaller neighbor_id
        nn = np.argsort(-sims, axis=1, kind="stable")[:, :k]
        rows = np.repeat(ids_b.astype(np.int64), k)
        return pa.Table.from_pydict({
            "vec_id": pa.array(rows),
            "neighbor_id": pa.array(all_ids[nn].ravel()),
            "rank": pa.array(np.tile(np.arange(1, k + 1), len(ids_b)),
                             type=pa.int64()),
            "cosine": pa.array(np.take_along_axis(sims, nn, axis=1)
                               .ravel(), type=pa.float64())})

    return (_read_emb(sf_dir, ["vec_id", "embedding"])
            .map_batches(topk, batch_format="pyarrow")
            .sort(["vec_id", "rank"]))


SQL_EMBEDDINGS_KNN_GRAPH = """
WITH sims AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM sims)
SELECT vec_id, neighbor_id, rank, cosine FROM ranked
WHERE rank <= 3 ORDER BY vec_id, rank
"""


# -- BM25 ranked retrieval ------------------------------------------------------

_BM25_TERMS = ("merge", "window")   # default ranked query
_BM25_K1, _BM25_B = 1.2, 0.75


def documents_bm25_topk(sf_dir: str,
                        terms: tuple[str, ...] = _BM25_TERMS,
                        k: int = 10):
    """Okapi BM25 top-k retrieval for a fixed term query — the ranked
    counterpart of `documents_search_and`'s boolean AND, and the
    lexical scorer a hybrid RAG retriever fuses with the vector side
    (`simops.documents_related_topk`).

    score(d) = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf_t = ln(1 + (N−df_t+0.5)/(df_t+0.5)).

    Scale shape: pass 1 folds each block into ONE partial row
    (n_docs, Σdl, df per query term — docs are complete in-block, so
    df partials are exact); the |query|-wide stats merge on the driver
    (constant size). Pass 2 is a pure map: tokenize vectorized, tf per
    term via list.count_matches, score with the broadcast scalars, and
    per-block partial top-k (on the 4-dp half-away-rounded score with
    doc_id tiebreak — the same total order the final rank uses, so the
    cut is exact) shrinks the exchange to blocks × k rows before one
    global sort+limit."""
    from ..stages.exchange import polars_capped

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    want = list(terms)

    def stats_partial(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        toks = (pl.from_arrow(b).select(
            toks=pl.col("text").fill_null("").str.to_lowercase()
            .str.extract_all(_TERM_RE)))
        cols = {"n_docs": pl.len().cast(pl.Int64),
                "sum_dl": pl.col("toks").list.len().cast(pl.Int64).sum()}
        for i, t in enumerate(want):
            cols[f"df_{i}"] = (pl.col("toks").list.contains(t)
                               .sum().cast(pl.Int64))
        out = toks.select(**cols)
        return out.to_arrow()

    parts = (docs.map_batches(stats_partial, batch_format="pyarrow")
             .to_pandas())
    n_docs = float(parts["n_docs"].sum())
    avgdl = float(parts["sum_dl"].sum()) / n_docs
    idf = [float(np.log(1.0 + (n_docs - float(parts[f"df_{i}"].sum())
                               + 0.5)
                        / (float(parts[f"df_{i}"].sum()) + 0.5)))
           for i in range(len(want))]

    def score(b: pa.Table) -> pa.Table:
        # tokenize/count in polars (integers — exact); do the FLOAT
        # formula in numpy, whose true division and left-to-right op
        # order match the SQL text exactly (polars expressions rewrite
        # scalar division to a reciprocal multiply — a 1-ulp hazard)
        pl = polars_capped()
        f = (pl.from_arrow(b).select(
            "doc_id",
            toks=pl.col("text").fill_null("").str.to_lowercase()
            .str.extract_all(_TERM_RE))
            .with_columns(
                dl=pl.col("toks").list.len().cast(pl.Int64),
                **{f"tf_{i}": pl.col("toks").list.count_matches(t)
                   .cast(pl.Int64) for i, t in enumerate(want)}))
        ids = f.get_column("doc_id").to_numpy()
        dl = f.get_column("dl").to_numpy().astype(np.float64)
        norm = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avgdl)
        s = np.zeros(len(ids), dtype=np.float64)
        for i in range(len(want)):
            tf = f.get_column(f"tf_{i}").to_numpy().astype(np.float64)
            s += idf[i] * tf * 2.2 / (tf + norm)
        s = np.floor(s * 10000.0 + 0.5) * 0.0001
        order = np.lexsort((ids, -s))[:k]
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[order].astype(np.int64)),
            "score": pa.array(s[order], type=pa.float64())})

    return (docs.map_batches(score, batch_format="pyarrow")
            .sort(["score", "doc_id"], descending=[True, False])
            .limit(k))


SQL_DOCUMENTS_BM25_TOPK = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')),
                                    '[a-zA-ZÀ-ÿ]+') AS toks
  FROM documents),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl,
         CAST(sum(CASE WHEN list_contains(toks, 'merge') THEN 1
                       ELSE 0 END) AS DOUBLE) AS df0,
         CAST(sum(CASE WHEN list_contains(toks, 'window') THEN 1
                       ELSE 0 END) AS DOUBLE) AS df1
  FROM toks),
scored AS (
  SELECT t.doc_id,
    floor((
      ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5))
        * len(list_filter(t.toks, x -> x = 'merge')) * 2.2
        / (len(list_filter(t.toks, x -> x = 'merge'))
           + 1.2 * (0.25 + 0.75 * len(t.toks) / s.avgdl))
      + ln(1 + (s.n - s.df1 + 0.5) / (s.df1 + 0.5))
        * len(list_filter(t.toks, x -> x = 'window')) * 2.2
        / (len(list_filter(t.toks, x -> x = 'window'))
           + 1.2 * (0.25 + 0.75 * len(t.toks) / s.avgdl))
    ) * 10000.0 + 0.5) * 0.0001 AS score
  FROM toks t, stats s)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


# -- full BPE tokenizer training ----------------------------------------------

def documents_bpe_train(sf_dir: str, n_merges: int = 20):
    """BPE tokenizer TRAINING (Sennrich et al.) — the iterative merge
    loop, not just one candidate-scoring pass (documents_bpe_pair_stats
    is that single pass).

    Scale shape: merge selection never needs the corpus — only the
    word-frequency table. So the distributed part is ONE pass reducing
    the corpus to (word, count) via per-batch polars count partials +
    one groupby (this is how GPT-2's tokenizer was trained: on word
    counts, not raw text). The n_merges argmax rounds then run on that
    REDUCED table driver-side — bounded by |distinct words|, not corpus
    bytes, and inherently sequential (merge k+1's counts depend on
    merge k). Ties break (count desc, (left, right) lex asc) so the
    merge table is deterministic.

    Output: (rank, left, right, pair_count) — the merge table a
    tokenizer ships. Rows-only oracle (an iterative argmax chain is not
    SQL-expressible); the planted pytest hand-verifies the classic
    low/lower/newest merge sequence."""
    from ray.data.aggregate import Sum

    from ..stages.exchange import polars_capped

    docs = _read(sf_dir, "documents", ["text"])

    def word_partial(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        out = (pl.from_arrow(b.select(["text"]))
               .select(w=pl.col("text").fill_null("").str.to_lowercase()
                       .str.extract_all("[a-z]+"))
               .explode("w").drop_nulls("w")
               .group_by("w").agg(n=pl.len().cast(pl.Int64)))
        return out.to_arrow().cast(pa.schema([("w", pa.string()),
                                              ("n", pa.int64())]))

    vocab = (docs.map_batches(word_partial, batch_format="pyarrow")
             .groupby("w").aggregate(Sum("n", alias_name="n"))
             .to_pandas())

    words = [list(w) for w in vocab["w"]]
    counts = vocab["n"].to_numpy()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, n in zip(words, counts):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + int(n)
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (lft, rgt), cnt = best
        merges.append((lft, rgt, cnt))
        tok = lft + rgt
        for syms in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == lft and syms[i + 1] == rgt:
                    syms[i:i + 2] = [tok]
                else:
                    i += 1
    return pa.table({
        "rank": pa.array(np.arange(1, len(merges) + 1), pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "pair_count": pa.array([m[2] for m in merges], pa.int64())})


def documents_bpe_word_counts(sf_dir: str):
    """The DISTRIBUTED stage of BPE training in isolation: the
    corpus → (word, count) reduction the merge loop consumes (per-batch
    polars count partials + one groupby-sum — how GPT-2's tokenizer was
    actually trained: on word counts, not raw text). The merge chain
    itself is an inherently sequential argmax over this reduced table
    and stays rows-only (documents_bpe_train, pytest-pinned); this
    entry gives the corpus-scale part a first-principles DuckDB oracle
    (round-5). Returns (w, n) sorted by w."""
    from ray.data.aggregate import Sum

    from ..stages.exchange import polars_capped

    docs = _read(sf_dir, "documents", ["text"])

    def word_partial(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        out = (pl.from_arrow(b.select(["text"]))
               .select(w=pl.col("text").fill_null("").str.to_lowercase()
                       .str.extract_all("[a-z]+"))
               .explode("w").drop_nulls("w")
               .group_by("w").agg(n=pl.len().cast(pl.Int64)))
        return out.to_arrow().cast(pa.schema([("w", pa.string()),
                                              ("n", pa.int64())]))

    return (docs.map_batches(word_partial, batch_format="pyarrow")
            .groupby("w").aggregate(Sum("n", alias_name="n"))
            .sort("w"))


SQL_DOCUMENTS_BPE_WORD_COUNTS = """
SELECT w, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                                       '[a-z]+')) AS w
      FROM documents)
GROUP BY w ORDER BY w
"""


# -- co-mention edges + PMI (the KG co-occurrence graph builder) ---------------

def documents_comention_pmi(sf_dir: str):
    """Entity co-mention edges with pointwise mutual information — the
    co-occurrence-graph pass of KG construction: two gazetteer entities
    that appear in the same document get an edge, weighted by
    pmi = ln(n_ab · N / (n_a · n_b)) over document frequencies.

    Scale shape: per batch, DISTINCT (doc, term) gazetteer hits reduce
    to (a) per-term df partials and (b) per-doc term PAIRS (a < b) —
    pair fan-out is ≤ C(|gazetteer|, 2) per doc, bounded by the
    dictionary, never by document length. One |vocab|²-sized groupby
    counts pairs; df totals are a second constant-size exchange whose
    result broadcasts into the final PMI map. Output
    (term_a, term_b, n_ab, pmi) ordered by the pair."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..stages.exchange import polars_capped
    from .mlprep import _docs_count

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    terms = sorted(_ENTITY_DICT)
    n_docs = float(_docs_count(sf_dir))

    def hits_batch(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        out = (pl.from_arrow(b).select(
            "doc_id",
            term=pl.col("text").fill_null("").str.to_lowercase()
            .str.extract_all(_TERM_RE))
            .explode("term")
            .filter(pl.col("term").is_in(terms))
            .unique())
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("term", pa.string())]))

    # ONE corpus scan: the distinct (doc, term) hits table is tiny
    # (≤ |gazetteer| rows per doc) and feeds BOTH the df counts and the
    # pair generation — without the materialize, the expensive regex
    # tokenization would execute twice. A doc's hits stay inside the
    # block that produced them, so pair generation remains per-batch.
    hits_ds = (docs.map_batches(hits_batch, batch_format="pyarrow")
               .materialize())

    def df_partial(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        out = pl.from_arrow(b).group_by("term").len(name="df_part")
        return out.to_arrow().cast(pa.schema([
            ("term", pa.string()), ("df_part", pa.int64())]))

    df_tbl = (hits_ds.map_batches(df_partial, batch_format="pyarrow")
              .groupby("term")
              .aggregate(Sum("df_part", alias_name="df"))
              .to_pandas())
    df_map = dict(zip(df_tbl["term"], df_tbl["df"].astype(float)))

    def pair_partial(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        h = pl.from_arrow(b)
        pairs = (h.join(h, on="doc_id", how="inner")
                 .filter(pl.col("term") < pl.col("term_right"))
                 .group_by(["term", "term_right"])
                 .agg(n_part=pl.len().cast(pl.Int64)))
        return pairs.rename({"term": "term_a",
                             "term_right": "term_b"}) \
            .to_arrow().cast(pa.schema([
                ("term_a", pa.string()), ("term_b", pa.string()),
                ("n_part", pa.int64())]))

    def finish(b: pa.Table) -> pa.Table:
        ta = b.column("term_a").to_pylist()
        tb = b.column("term_b").to_pylist()
        n_ab = b.column("n_ab").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        na = np.array([df_map[t] for t in ta])
        nb = np.array([df_map[t] for t in tb])
        pmi = np.log(n_ab * n_docs / (na * nb))
        return pa.table({
            "term_a": pa.array(ta, pa.string()),
            "term_b": pa.array(tb, pa.string()),
            "n_ab": pa.array(n_ab.astype(np.int64)),
            "pmi": pa.array(np.floor(pmi * 10000.0 + 0.5) * 0.0001,
                            pa.float64())})

    return (hits_ds.map_batches(pair_partial, batch_format="pyarrow")
            .groupby(["term_a", "term_b"])
            .aggregate(Sum("n_part", alias_name="n_ab"))
            .map_batches(finish, batch_format="pyarrow")
            .sort(["term_a", "term_b"]))


SQL_DOCUMENTS_COMENTION_PMI = """
WITH hits AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(coalesce(text, '')),
                                     '[a-zA-ZÀ-ÿ]+')) AS term
    FROM documents)
  WHERE term IN ('customer', 'spark', 'vector', 'table', 'dup',
                 'window')),
df AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_ab
  FROM hits a JOIN hits b
    ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term)
SELECT p.term_a, p.term_b, CAST(p.n_ab AS BIGINT) AS n_ab,
       floor(ln(CAST(p.n_ab AS DOUBLE)
                * (SELECT CAST(count(*) AS DOUBLE) FROM documents)
                / (CAST(da.df AS DOUBLE) * CAST(db.df AS DOUBLE)))
             * 10000.0 + 0.5) * 0.0001 AS pmi
FROM pairs p JOIN df da ON da.term = p.term_a
             JOIN df db ON db.term = p.term_b
ORDER BY term_a, term_b
"""


# -- hybrid retrieval: reciprocal-rank fusion of BM25 + dense cosine ----------

def documents_hybrid_rrf_topk(sf_dir: str,
                              terms: tuple[str, ...] = _BM25_TERMS,
                              query_id: int = 0, k: int = 10,
                              depth: int = 50, rrf_c: int = 60):
    """Hybrid search: fuse the lexical (Okapi BM25, documents_bm25_topk)
    and dense (embedding cosine vs the query_id vector) rankings by
    Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR'09):

        rrf(d) = Σ_side 1 / (rrf_c + rank_side(d)),  rank ∈ 1..depth

    the standard production hybrid-retrieval combiner (rank-based, so
    the two score scales never need calibration — contrast
    simops.documents_related_topk, the weighted SCORE fusion).

    Scale shape: each side is its own distributed top-`depth` retrieval
    — BM25's two passes with exact per-block partial top-k, and one
    map-only cosine matvec per batch with the same partial-top-k cut —
    so the fusion input is 2×depth rows no matter the corpus size; the
    RRF join itself is constant-size driver work by construction
    (exactly like the reference's driver-side final fold of constant
    outputs). Both per-side ranks order by (rounded score desc, id asc)
    — the same total order the oracle's row_number() uses, making every
    rank, both rank lists' depth cuts, and the final k-boundary
    cross-engine deterministic. Absent-side ranks surface as 0 (never a
    valid rank) and contribute no RRF term."""
    import pyarrow.dataset as pads

    # -- lexical side: BM25 top-`depth` (already (score desc, id) order)
    lex = documents_bm25_topk(sf_dir, terms=terms, k=depth).to_pandas()
    lex_rank = {int(d): r + 1 for r, d in enumerate(lex["doc_id"])}

    # -- dense side: cosine-vs-query top-`depth`, metadata-path query row
    qt = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")) \
        .to_table(columns=["embedding"],
                  filter=pads.field("vec_id") == query_id)
    qv = np.asarray(qt.column("embedding")[0].as_py(), dtype=np.float64)
    qv = qv / np.linalg.norm(qv)

    def cos_partial(b: pa.Table) -> pa.Table:
        from .simops import _emb_matrix
        ids, mat = _emb_matrix(b)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        s = np.round((mat @ qv) / norms, 6)
        order = np.lexsort((ids, -s))[:depth]   # exact cut: same total order
        return pa.table({"doc_id": pa.array(ids[order], type=pa.int64()),
                         "sim": pa.array(s[order], type=pa.float64())})

    vec = (_read(sf_dir, "embeddings", ["vec_id", "embedding"])
           .map_batches(cos_partial, batch_format="pyarrow")
           .sort(["sim", "doc_id"], descending=[True, False])
           .limit(depth).to_pandas())
    vec_rank = {int(d): r + 1 for r, d in enumerate(vec["doc_id"])}

    # -- constant-size fusion (≤ 2·depth candidates) ---------------------
    cand = sorted(set(lex_rank) | set(vec_rank))
    rl = np.array([lex_rank.get(d, 0) for d in cand], dtype=np.int64)
    rv = np.array([vec_rank.get(d, 0) for d in cand], dtype=np.int64)
    # term order (lex + vec) mirrors the oracle's coalesce(..)+coalesce(..)
    rrf = (np.where(rl > 0, 1.0 / (rrf_c + rl), 0.0)
           + np.where(rv > 0, 1.0 / (rrf_c + rv), 0.0))
    ids = np.array(cand, dtype=np.int64)
    order = np.lexsort((ids, -rrf))[:k]
    return pa.table({"doc_id": pa.array(ids[order]),
                     "rrf": pa.array(rrf[order], type=pa.float64()),
                     "rank_lex": pa.array(rl[order]),
                     "rank_vec": pa.array(rv[order])})


SQL_DOCUMENTS_HYBRID_RRF_TOPK = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')),
                                    '[a-zA-ZÀ-ÿ]+') AS toks
  FROM documents),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl,
         CAST(sum(CASE WHEN list_contains(toks, 'merge') THEN 1
                       ELSE 0 END) AS DOUBLE) AS df0,
         CAST(sum(CASE WHEN list_contains(toks, 'window') THEN 1
                       ELSE 0 END) AS DOUBLE) AS df1
  FROM toks),
scored AS (
  SELECT t.doc_id,
    floor((
      ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5))
        * len(list_filter(t.toks, x -> x = 'merge')) * 2.2
        / (len(list_filter(t.toks, x -> x = 'merge'))
           + 1.2 * (0.25 + 0.75 * len(t.toks) / s.avgdl))
      + ln(1 + (s.n - s.df1 + 0.5) / (s.df1 + 0.5))
        * len(list_filter(t.toks, x -> x = 'window')) * 2.2
        / (len(list_filter(t.toks, x -> x = 'window'))
           + 1.2 * (0.25 + 0.75 * len(t.toks) / s.avgdl))
    ) * 10000.0 + 0.5) * 0.0001 AS score
  FROM toks t, stats s),
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
  FROM scored ORDER BY score DESC, doc_id ASC LIMIT 50),
sims AS (
  SELECT vec_id AS doc_id,
         round(list_cosine_similarity(
             CAST(embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
              WHERE vec_id = 0)), 6) AS sim
  FROM embeddings),
vec AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY sim DESC, doc_id ASC) AS r
  FROM sims ORDER BY sim DESC, doc_id ASC LIMIT 50)
SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
       coalesce(1.0 / (60 + l.r), 0.0)
         + coalesce(1.0 / (60 + v.r), 0.0) AS rrf,
       coalesce(l.r, 0) AS rank_lex,
       coalesce(v.r, 0) AS rank_vec
FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
ORDER BY rrf DESC, doc_id ASC
LIMIT 10
"""


# -- sparse TF-IDF related-document retrieval (postings-join plan) ------------

def documents_tfidf_related_topk(sf_dir: str, query_id: int = 0,
                                 k: int = 10, num_partitions: int = 8):
    """Top-k documents most similar to a query DOCUMENT by tf-idf
    cosine, computed the sparse-IR way — through an inverted-postings
    join, never a dense vector: the third retrieval plan shape next to
    BM25 (fixed-term probabilistic) and the dense matvec
    (embeddings_cosine_top10). tf = raw in-doc term count,
    idf = ln(N/df), score = <q,d> / (|q||d|).

    Scale shape: (1) per-block explode to (doc_id, term, tf) — term
    counts close in-block because a document is one row; (2) ONE
    term-keyed exchange: groupby(term) document frequencies, then the
    postings join ships each (doc, term, tf) row its df — exactly an
    inverted-index walk, the vocabulary is never driver-side;
    (3) map: weight = tf·idf, dot partial against the BROADCAST query
    weight vector (|q| terms, tiny); (4) groupby(doc_id) folds
    norm² = Σw² and dot = Σ w·w_q — constant columns out; score, sort,
    limit. The query doc is excluded (its score is 1 by definition),
    matching the oracle."""
    import math

    import pyarrow.compute as _pc
    import pyarrow.dataset as pads

    from ..stages.exchange import polars_capped

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = float(pads.dataset(
        os.path.join(sf_dir, "documents.parquet")).count_rows())

    def explode(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        df = (pl.from_arrow(b.select(["doc_id", "text"]))
              .with_columns(term=pl.col("text").fill_null("")
                            .str.to_lowercase()
                            .str.extract_all(_TERM_RE))
              .drop("text").explode("term").drop_nulls()
              .group_by(["doc_id", "term"])
              .agg(pl.len().cast(pl.Int64).alias("tf")))
        return df.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("term", pa.string()),
            ("tf", pa.int64())]))

    from ray.data.aggregate import Sum

    tok = (docs.map_batches(explode, batch_format="pyarrow")
           .repartition(num_partitions).materialize())
    dfreq = (tok.map_batches(
        lambda b: pa.table({"term": b.column("term")})
        .group_by(["term"]).aggregate([([], "count_all")])
        .rename_columns(["term", "df"]), batch_format="pyarrow")
        .groupby("term").aggregate(Sum("df", alias_name="df"))
        .repartition(num_partitions))

    # broadcast query weight vector: |q| terms, driver-tiny by definition
    qt = (tok.filter(expr=f"doc_id == {int(query_id)}")).to_pandas()
    q_tf = dict(zip(qt["term"], qt["tf"]))

    ranked = tok.join(dfreq, join_type="inner",
                      num_partitions=num_partitions,
                      on=("term",), right_on=("term",))

    def weights(b: pa.Table) -> pa.Table:
        terms = b.column("term").to_pylist()
        tf = b.column("tf").to_numpy().astype(np.float64)
        dfv = b.column("df").to_numpy().astype(np.float64)
        idf = np.log(n_docs / dfv)
        w = tf * idf
        wq = np.array([q_tf.get(t, 0) for t in terms],
                      dtype=np.float64) * idf
        return pa.table({"doc_id": b.column("doc_id"),
                         "w2": pa.array(w * w),
                         "dot": pa.array(w * wq)})

    # materialize: the qnorm filter below and the score scan both
    # consume this — without the pin, the whole token/join/groupby
    # pipeline re-executes a second time for one driver-tiny row
    folded = (ranked.map_batches(weights, batch_format="pyarrow")
              .groupby("doc_id")
              .aggregate(Sum("w2", alias_name="norm2"),
                         Sum("dot", alias_name="dot"))
              .materialize())

    # query norm from the same folded table (one tiny driver filter)
    qrow = folded.filter(expr=f"doc_id == {int(query_id)}").to_pandas()
    qnorm = math.sqrt(float(qrow["norm2"].iloc[0])) if len(qrow) else 1.0

    def score(b: pa.Table) -> pa.Table:
        b = b.filter(_pc.invert(_pc.equal(b.column("doc_id"),
                                          pa.scalar(query_id))))
        n2 = b.column("norm2").to_numpy()
        dot = b.column("dot").to_numpy()
        # masked assignment, not np.where: the divide branch must not
        # run where n2 == 0 (and a zero-norm query — every query term
        # idf 0 — scores everything 0 instead of NaN)
        s = np.zeros(len(n2), dtype=np.float64)
        if qnorm > 0:
            m = n2 > 0
            s[m] = dot[m] / (np.sqrt(n2[m]) * qnorm)
        return pa.table({"doc_id": b.column("doc_id"),
                         "score": pa.array(np.round(s, 6) + 0.0)})

    return (folded.map_batches(score, batch_format="pyarrow")
            .sort(["score", "doc_id"], descending=[True, False])
            .limit(k))


SQL_DOCUMENTS_TFIDF_RELATED_TOPK = """
WITH tok AS (
  SELECT doc_id, t.term, count(*) AS tf
  FROM documents,
       UNNEST(regexp_extract_all(lower(coalesce(text, '')),
                                 '[a-zA-ZÀ-ÿ]+')) AS t(term)
  GROUP BY doc_id, t.term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tok
          GROUP BY term),
w AS (
  SELECT tok.doc_id, tok.term,
         tok.tf * ln(n.n_docs / dfreq.df) AS wt
  FROM tok JOIN dfreq USING (term) CROSS JOIN n),
q AS (SELECT term, wt FROM w WHERE doc_id = 0),
folded AS (
  SELECT w.doc_id,
         sum(w.wt * w.wt) AS norm2,
         sum(w.wt * coalesce(q.wt, 0)) AS dot
  FROM w LEFT JOIN q USING (term)
  GROUP BY w.doc_id),
qn AS (SELECT sqrt(norm2) AS qnorm FROM folded WHERE doc_id = 0)
SELECT f.doc_id,
       round(CASE WHEN f.norm2 > 0
                  THEN f.dot / (sqrt(f.norm2) * qn.qnorm)
                  ELSE 0 END, 6) + 0 AS score
FROM folded f CROSS JOIN qn
WHERE f.doc_id != 0
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""
