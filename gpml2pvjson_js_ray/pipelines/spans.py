"""Cross-document span (word n-gram) duplication statistics and
within-document repetition filters — the exact-substring-dedup and
Gopher-repetition steps of a webtext training pipeline.

`documents_span_dedup_stats` is the counting pass of exact substring
deduplication (Lee et al., "Deduplicating Training Data Makes Language
Models Better"): explode every document into word 5-grams, count how
many documents each gram appears in corpus-wide, and report per document
how much of it is duplicated elsewhere. The downstream filter (drop or
trim docs above a duplicated-span fraction) is a trivial predicate on
this table.

`documents_repetition_stats` is the within-document half (Gopher /
MassiveText repetition rules): duplicate-word fraction and
most-frequent-word fraction per document. It needs NO shuffle at all —
each input row is a whole document, so every statistic closes inside the
batch.

Why bucketed-groupby instead of Dataset.join here: Ray 2.49's hash
join (`HashShuffleAggregator.finalize`) raises ArrowInvalid ("No match
... on right side") when a right-side hash partition receives zero
rows — and a filtered gram vocabulary routinely leaves partitions
empty. The bucket reduce sidesteps the join entirely and saves an
exchange besides.

Scale shape:
- span stats shuffle (doc_id, gram, occ) PARTIALS — the per-batch
  explode collapses repeated grams within a doc before anything moves,
  so the exchange carries a per-doc gram vocabulary, never the token
  stream. Two hash exchanges total (by gram, then by doc_id), both over
  aggregated tables. At 100 TB you'd key the first exchange on a 128-bit
  gram hash instead of the string to shrink the wire format; at test
  scale the string key keeps the oracle comparison exact (same trade the
  repo's top-bigrams operator makes).
- repetition stats are map-only: read → map_batches → sort. Nothing
  moves but the output.

Reference parity: beyond-reference surface (SURVEY.md §2 extension
operators); tokenizer matches the repo's cross-engine `_TERM_RE`
convention so the DuckDB oracles are bitwise-comparable.
"""

from __future__ import annotations

import os

import pyarrow as pa

# Cross-engine tokenizer: must match regexp_extract_all in the oracles.
_TERM_RE = "[a-zA-ZÀ-ÿ]+"


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


def documents_span_dedup_stats(sf_dir: str, n: int = 5):
    """Per-document cross-corpus duplicated-span stats over word n-grams.

    Output: (doc_id, n_grams, n_cross_dup_grams) where n_grams is the
    number of n-gram occurrences in the doc and n_cross_dup_grams counts
    occurrences whose gram appears in MORE THAN ONE document corpus-wide.
    Docs shorter than n words produce no row (no grams — matches the
    oracle, which inner-joins grams to counts).

    Plan (all vectorized, no per-group Python): one explode pass emits
    per-doc gram partials (doc_id, gram, occ — each row already a
    distinct (doc_id, gram), so rows-per-gram == ndocs); grams then hash
    into `num_buckets` buckets so ONE groupby co-locates every
    occurrence of a gram, and the per-bucket reduce runs polars
    group-joins over the whole bucket at once (never per-gram Python).
    Each bucket emits per-doc PARTIAL (n, dup) sums, and a final tiny
    doc_id groupby folds them — a doc with no duplicated grams sums to
    dup == 0 with no outer join needed. Two hash exchanges total, both
    over aggregated tables."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from ..stages.exchange import hash_rows_mod, polars_capped

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def gram_partials(b: pa.Table) -> pa.Table:
        """(doc_id, gram) occurrence counts — each row is a whole doc,
        so per-doc gram counts close inside the batch."""
        pl = polars_capped()
        ex = (pl.from_arrow(b).select(
            "doc_id",
            tok=pl.col("text").fill_null("").str.to_lowercase()
            .str.extract_all(_TERM_RE))
            .explode("tok").drop_nulls("tok"))
        gram = pl.col("tok")
        for i in range(1, n):
            gram = gram + " " + pl.col("tok").shift(-i).over("doc_id")
        out = (ex.with_columns(gram=gram).drop_nulls("gram")
               .group_by("doc_id", "gram")
               .agg(occ=pl.len().cast(pl.Int64)))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("gram", pa.string()),
            ("occ", pa.int64())]))

    num_buckets = 64

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bucket", pa.array(hash_rows_mod(b, ["gram"], num_buckets)))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """All occurrences of this bucket's grams are here, so
        rows-per-gram is the exact corpus-wide ndocs. Vectorized over
        the whole bucket: flag grams seen in >1 doc, fold to per-doc
        partial sums."""
        pl = polars_capped()
        f = pl.from_pandas(df[["doc_id", "gram", "occ"]])
        f = f.with_columns(
            dup_gram=pl.len().over("gram") > 1)
        out = (f.group_by("doc_id").agg(
            n=pl.col("occ").sum(),
            dup=pl.when(pl.col("dup_gram")).then(pl.col("occ"))
                .otherwise(0).sum().cast(pl.Int64)))
        return out.to_pandas()

    partials = (docs.map_batches(gram_partials, batch_format="pyarrow")
                .map_batches(add_bucket, batch_format="pyarrow"))

    return (partials.groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas")
            .groupby("doc_id")
            .aggregate(Sum("n", alias_name="n_grams"),
                       Sum("dup", alias_name="n_cross_dup_grams"))
            .sort("doc_id"))


SQL_DOCUMENTS_SPAN_DEDUP_STATS = """
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')),
                            '[a-zA-ZÀ-ÿ]+') AS ts
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts) - 3),
                i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                     || ' ' || ts[i+3] || ' ' || ts[i+4])) AS gram
  FROM toks WHERE len(ts) >= 5
),
counts AS (
  SELECT gram, count(DISTINCT doc_id) AS ndocs FROM grams GROUP BY gram
)
SELECT g.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN c.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_cross_dup_grams
FROM grams g JOIN counts c USING (gram)
GROUP BY g.doc_id ORDER BY g.doc_id
"""


def documents_repetition_stats(sf_dir: str):
    """Gopher-style within-document repetition statistics, map-only.

    Output per doc: n_words, n_distinct_words, top_word_count,
    dup_word_frac = 1 - distinct/total, top_word_frac = top/total.
    Zero-token docs produce no row (matches the oracle's unnest).
    Fractions are computed as the same IEEE-double expression in both
    engines, so values hash-match without rounding tricks."""
    from ..stages.exchange import polars_capped

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        ex = (pl.from_arrow(b).select(
            "doc_id",
            tok=pl.col("text").fill_null("").str.to_lowercase()
            .str.extract_all(_TERM_RE))
            .explode("tok").drop_nulls("tok"))
        wc = ex.group_by("doc_id", "tok").agg(c=pl.len().cast(pl.Int64))
        agg = (wc.group_by("doc_id").agg(
            n_words=pl.col("c").sum(),
            n_distinct_words=pl.len().cast(pl.Int64),
            top_word_count=pl.col("c").max()))
        agg = agg.with_columns(
            dup_word_frac=1.0 - pl.col("n_distinct_words")
            / (1.0 * pl.col("n_words")),
            top_word_frac=pl.col("top_word_count")
            / (1.0 * pl.col("n_words")))
        return agg.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("n_words", pa.int64()),
            ("n_distinct_words", pa.int64()),
            ("top_word_count", pa.int64()),
            ("dup_word_frac", pa.float64()),
            ("top_word_frac", pa.float64())]))

    return (docs.map_batches(stats, batch_format="pyarrow")
            .sort("doc_id"))


SQL_DOCUMENTS_REPETITION_STATS = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')),
                                   '[a-zA-ZÀ-ÿ]+')) AS tok
  FROM documents
),
wc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_words,
       count(*) AS n_distinct_words,
       max(c) AS top_word_count,
       1.0 - count(*) / (1.0 * sum(c)) AS dup_word_frac,
       max(c) / (1.0 * sum(c)) AS top_word_frac
FROM wc GROUP BY doc_id ORDER BY doc_id
"""


def events_type_transitions(sf_dir: str):
    """Markov transition counts over each user's ordered event stream:
    (from_type, to_type, n_transitions) summed over all users.

    Partitioning assumption (custom-operator rule): one user's events
    must co-locate, which groupby(user_id).map_groups guarantees. Within
    a group the sort is (ts, event_id) for a deterministic total order;
    the group emits PARTIAL pair counts, so the second exchange carries
    a type×type table (tiny), never the event stream."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        nxt = df["event_type"].shift(-1)
        mask = nxt.notna()
        if not mask.any():
            return pd.DataFrame({"from_type": pd.Series([], dtype=str),
                                 "to_type": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype="int64")})
        pairs = pd.DataFrame({"from_type": df["event_type"][mask],
                              "to_type": nxt[mask]})
        out = (pairs.groupby(["from_type", "to_type"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype("int64")
        return out

    return (ev.groupby("user_id").map_groups(per_user,
                                             batch_format="pandas")
            .groupby(["from_type", "to_type"])
            .aggregate(Sum("n", alias_name="n_transitions"))
            .sort(["from_type", "to_type"]))


SQL_EVENTS_TYPE_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       count(*) AS n_transitions
FROM seq WHERE next_type IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


def documents_span_dedup_filter(sf_dir: str, n: int = 5,
                                max_dup_frac: float = 0.5):
    """The filter half of exact-substring dedup: keep documents whose
    cross-corpus duplicated-span fraction is at most `max_dup_frac`.
    Composes documents_span_dedup_stats (docs with <n words have no
    grams, hence no row — nothing to dedup there). The fraction is the
    identical IEEE-double division in both engines."""
    import pyarrow.compute as pc

    stats = documents_span_dedup_stats(sf_dir, n=n)

    def keep(b: pa.Table) -> pa.Table:
        frac = pc.divide(
            pc.cast(b.column("n_cross_dup_grams"), pa.float64()),
            pc.cast(b.column("n_grams"), pa.float64()))
        b = b.append_column("dup_frac", frac)
        return b.filter(pc.less_equal(frac,
                                      pa.scalar(float(max_dup_frac))))

    return stats.map_batches(keep, batch_format="pyarrow")


def _filter_sql() -> str:
    return f"""
WITH stats AS ({SQL_DOCUMENTS_SPAN_DEDUP_STATS.replace("ORDER BY g.doc_id", "")})
SELECT doc_id, n_grams, n_cross_dup_grams,
       n_cross_dup_grams / (1.0 * n_grams) AS dup_frac
FROM stats
WHERE n_cross_dup_grams / (1.0 * n_grams) <= 0.5
ORDER BY doc_id
"""


SQL_DOCUMENTS_SPAN_DEDUP_FILTER = _filter_sql()


# Gopher/MassiveText-style keep thresholds (word-count band + repetition
# caps). One source of truth for the engine and the SQL oracle below.
_GOPHER_MIN_WORDS = 20
_GOPHER_MAX_WORDS = 100_000
_GOPHER_MAX_DUP_FRAC = 0.6
_GOPHER_MAX_TOP_FRAC = 0.3


def documents_gopher_filter(sf_dir: str):
    """Gopher-style composite quality gate, map-only: a document is kept
    iff its word count sits in [min, max] AND its duplicate-word and
    top-word fractions stay under the caps. Output: one row per doc
    that produced tokens — (doc_id, keep, n_words, dup_word_frac,
    top_word_frac). Built on the same per-batch repetition fold as
    documents_repetition_stats (a doc's tokens are complete in its
    row ⇒ zero shuffle at any corpus size); the boolean is the same
    IEEE-double comparison in both engines."""
    from ..stages.exchange import polars_capped

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def gate(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        ex = (pl.from_arrow(b).select(
            "doc_id",
            tok=pl.col("text").fill_null("").str.to_lowercase()
            .str.extract_all(_TERM_RE))
            .explode("tok").drop_nulls("tok"))
        wc = ex.group_by("doc_id", "tok").agg(c=pl.len().cast(pl.Int64))
        agg = (wc.group_by("doc_id").agg(
            n_words=pl.col("c").sum(),
            n_distinct=pl.len().cast(pl.Int64),
            top_c=pl.col("c").max()))
        agg = agg.with_columns(
            dup_word_frac=1.0 - pl.col("n_distinct")
            / (1.0 * pl.col("n_words")),
            top_word_frac=pl.col("top_c") / (1.0 * pl.col("n_words")))
        agg = agg.with_columns(
            keep=(pl.col("n_words") >= _GOPHER_MIN_WORDS)
            & (pl.col("n_words") <= _GOPHER_MAX_WORDS)
            & (pl.col("dup_word_frac") <= _GOPHER_MAX_DUP_FRAC)
            & (pl.col("top_word_frac") <= _GOPHER_MAX_TOP_FRAC))
        return (agg.select(["doc_id", "keep", "n_words", "dup_word_frac",
                            "top_word_frac"])
                .to_arrow().cast(pa.schema([
                    ("doc_id", pa.int64()), ("keep", pa.bool_()),
                    ("n_words", pa.int64()),
                    ("dup_word_frac", pa.float64()),
                    ("top_word_frac", pa.float64())])))

    return (docs.map_batches(gate, batch_format="pyarrow")
            .sort("doc_id"))


SQL_DOCUMENTS_GOPHER_FILTER = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')),
                                   '[a-zA-ZÀ-ÿ]+')) AS tok
  FROM documents
),
wc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         1.0 - count(*) / (1.0 * sum(c)) AS dup_word_frac,
         max(c) / (1.0 * sum(c)) AS top_word_frac
  FROM wc GROUP BY doc_id)
SELECT doc_id,
       (n_words >= 20 AND n_words <= 100000
        AND dup_word_frac <= 0.6 AND top_word_frac <= 0.3) AS keep,
       n_words, dup_word_frac, top_word_frac
FROM agg ORDER BY doc_id
"""
