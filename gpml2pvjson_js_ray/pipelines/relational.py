"""Relational / analytical operators over the driver's TPC-H-ish testdata,
implemented Ray-Data-first and mirrored 1:1 by DuckDB oracle SQL in
__ray_entry__.oracle_sql().

Patterns exercised (SURVEY.md §2 operator inventory, generalized):
  read-with-column-pruning, vectorized filter/project (pyarrow.compute),
  grouped aggregation (Sum/Mean/Count), broadcast hash join (small side via
  driver-materialized dict — no shuffle), sort + limit (top-k), tumbling
  event-time windows, gap sessionization (groupby + map_groups), exact
  dedup, string tokenization, vector (cosine) math.

All float outputs are rounded identically on the Ray and SQL sides so the
driver's value-hash comparison is robust to summation-order ulps.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


def _round_col(batch: pa.Table, col: str, digits: int) -> pa.Table:
    i = batch.schema.get_field_index(col)
    return batch.set_column(i, col, pc.round(batch.column(col),
                                             ndigits=digits))


# -- Q1-style pricing summary ----------------------------------------------

def lineitem_pricing_summary(sf_dir: str):
    from ray.data.aggregate import Count, Mean, Sum
    ds = _read(sf_dir, "lineitem",
               ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                "l_returnflag", "l_linestatus", "l_shipdate"])

    def derive(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(
            b.column("l_shipdate"),
            pa.scalar(np.datetime64("2001-01-01T00:00:00", "us"))))
        disc_price = pc.multiply(b.column("l_extendedprice"),
                                 pc.subtract(pa.scalar(1.0),
                                             b.column("l_discount")))
        charge = pc.multiply(disc_price,
                             pc.add(pa.scalar(1.0), b.column("l_tax")))
        b = b.append_column("disc_price", disc_price)
        b = b.append_column("charge", charge)
        return b.drop_columns(["l_shipdate", "l_tax"])

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                      Sum("l_extendedprice", alias_name="sum_base_price"),
                      Sum("disc_price", alias_name="sum_disc_price"),
                      Sum("charge", alias_name="sum_charge"),
                      Mean("l_quantity", alias_name="avg_qty"),
                      Mean("l_discount", alias_name="avg_disc"),
                      Count(alias_name="count_order")))

    def final(b: pa.Table) -> pa.Table:
        for col, d in (("sum_qty", 2), ("sum_base_price", 2),
                       ("sum_disc_price", 2), ("sum_charge", 2),
                       ("avg_qty", 4), ("avg_disc", 4)):
            b = _round_col(b, col, d)
        return b
    return out.map_batches(final, batch_format="pyarrow")


SQL_LINEITEM_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                AS sum_qty,
       round(sum(l_extendedprice), 2)                           AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)        AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4)                                AS avg_qty,
       round(avg(l_discount), 4)                                AS avg_disc,
       count(*)                                                 AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-01-01'
GROUP BY l_returnflag, l_linestatus
"""


# -- broadcast join: orders ⋈ customer → revenue per segment ----------------

def _broadcast_kv(ds, key_col: str, val_col: str):
    """Materialize a SMALL dimension as (keys, values) Arrow arrays and
    ray.put them ONCE — every join task then reads the pair zero-copy from
    the object store instead of having a Python dict pickled into each
    task (the round-1 anti-pattern)."""
    import ray
    tbl = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    return ray.put((tbl.column(key_col).combine_chunks(),
                    tbl.column(val_col).combine_chunks()))


def _make_attach(lookup_ref, key_col: str, out_col: str):
    """Vectorized broadcast-join probe: pc.index_in + take (nulls where
    the key is absent, like dict.get)."""
    def attach(b: pa.Table) -> pa.Table:
        import ray
        keys, vals = ray.get(lookup_ref)
        col = b.column(key_col).combine_chunks()
        if col.type != keys.type:
            col = col.cast(keys.type)
        idx = pc.index_in(col, value_set=keys)
        return b.append_column(out_col, vals.take(idx))
    return attach


def orders_by_segment(sf_dir: str):
    from ray.data.aggregate import Count, Sum
    lookup = _broadcast_kv(
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        "c_custkey", "c_mktsegment")
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    attach = _make_attach(lookup, "o_custkey", "c_mktsegment")
    out = (orders.map_batches(attach, batch_format="pyarrow")
           .groupby("c_mktsegment")
           .aggregate(Count(alias_name="n_orders"),
                      Sum("o_totalprice", alias_name="revenue")))
    return out.map_batches(lambda b: _round_col(b, "revenue", 2),
                           batch_format="pyarrow")


SQL_ORDERS_BY_SEGMENT = """
SELECT c_mktsegment, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# -- top-k: highest-spend customers ----------------------------------------

def top10_customers(sf_dir: str):
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    spend = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="spend"))
    lookup = _broadcast_kv(
        _read(sf_dir, "customer", ["c_custkey", "c_name"]),
        "c_custkey", "c_name")
    base_attach = _make_attach(lookup, "o_custkey", "c_name")

    def attach(b: pa.Table) -> pa.Table:
        return _round_col(base_attach(b), "spend", 2)

    return (spend.map_batches(attach, batch_format="pyarrow")
            .sort(["spend", "o_custkey"], descending=[True, False])
            .limit(10)
            .select_columns(["o_custkey", "c_name", "spend"]))


SQL_TOP10_CUSTOMERS = """
SELECT o_custkey, c_name, round(sum(o_totalprice), 2) AS spend
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey, c_name
ORDER BY spend DESC, o_custkey ASC
LIMIT 10
"""


# -- two-hop broadcast join: customers per region ---------------------------

def customers_per_region(sf_dir: str):
    from ray.data.aggregate import Count, Mean
    import ray

    # two-hop dimension collapse on the driver (nation ⋈ region: 25×5
    # rows), broadcast once as arrow arrays
    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas().set_index("r_regionkey")
    keys = pa.array(nation["n_nationkey"].astype("int64"))
    vals = pa.array([region.loc[int(rk), "r_name"]
                     for rk in nation["n_regionkey"]], type=pa.string())
    lookup = ray.put((keys, vals))
    customer = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    attach = _make_attach(lookup, "c_nationkey", "r_name")
    out = (customer.map_batches(attach, batch_format="pyarrow")
           .groupby("r_name")
           .aggregate(Count(alias_name="n_customers"),
                      Mean("c_acctbal", alias_name="avg_acctbal")))
    return out.map_batches(lambda b: _round_col(b, "avg_acctbal", 4),
                           batch_format="pyarrow")


SQL_CUSTOMERS_PER_REGION = """
SELECT r_name, count(*) AS n_customers,
       round(avg(c_acctbal), 4) AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# -- filter + grouped count -------------------------------------------------

def high_value_orders_by_priority(sf_dir: str):
    from ray.data.aggregate import Count, Sum
    orders = _read(sf_dir, "orders",
                   ["o_orderpriority", "o_totalprice"])
    filtered = orders.map_batches(
        lambda b: b.filter(pc.greater(b.column("o_totalprice"),
                                      pa.scalar(100000.0))),
        batch_format="pyarrow")
    out = filtered.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_orders"),
        Sum("o_totalprice", alias_name="total"))
    return out.map_batches(lambda b: _round_col(b, "total", 2),
                           batch_format="pyarrow")


SQL_HIGH_VALUE_ORDERS = """
SELECT o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders WHERE o_totalprice > 100000
GROUP BY o_orderpriority
"""


# -- part stats -------------------------------------------------------------

def parts_by_brand(sf_dir: str):
    from ray.data.aggregate import Count, Mean
    part = _read(sf_dir, "part", ["p_brand", "p_size", "p_retailprice"])
    out = part.groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Mean("p_size", alias_name="avg_size"),
        Mean("p_retailprice", alias_name="avg_price"))

    def final(b):
        b = _round_col(b, "avg_size", 4)
        return _round_col(b, "avg_price", 2)
    return out.map_batches(final, batch_format="pyarrow")


SQL_PARTS_BY_BRAND = """
SELECT p_brand, count(*) AS n_parts, round(avg(p_size), 4) AS avg_size,
       round(avg(p_retailprice), 2) AS avg_price
FROM part GROUP BY p_brand
"""


# -- event-time tumbling window --------------------------------------------

def events_tumbling_5min(sf_dir: str):
    from ray.data.aggregate import Count, Sum
    events = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def add_window(b: pa.Table) -> pa.Table:
        micros = pc.cast(b.column("ts"), pa.int64())
        window = pc.floor(pc.divide(pc.cast(micros, pa.float64()),
                                    pa.scalar(300_000_000.0)))
        return b.append_column("window_id", pc.cast(window, pa.int64()))

    out = (events.map_batches(add_window, batch_format="pyarrow")
           .groupby(["event_type", "window_id"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("value", alias_name="sum_value")))
    return out.map_batches(lambda b: _round_col(b, "sum_value", 4),
                           batch_format="pyarrow")


SQL_EVENTS_TUMBLING_5MIN = """
SELECT event_type, CAST(floor(epoch(ts) / 300) AS BIGINT) AS window_id,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type, window_id
"""


# -- sliding event-time window (explode: one event → 2 windows) -------------

def events_sliding_10min(sf_dir: str):
    """10-minute windows sliding by 5 minutes: each event belongs to the
    window starting at its own 5-min slot and the one before."""
    from ray.data.aggregate import Count, Sum
    events = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def explode(b: pa.Table) -> pa.Table:
        micros = pc.cast(b.column("ts"), pa.int64())
        slot = pc.cast(pc.floor(pc.divide(pc.cast(micros, pa.float64()),
                                          pa.scalar(300_000_000.0))),
                       pa.int64())
        slot_prev = pc.subtract(slot, pa.scalar(1, type=pa.int64()))
        twice = pa.concat_tables([
            b.append_column("window_id", slot),
            b.append_column("window_id", slot_prev)])
        return twice.drop_columns(["ts"])

    out = (events.map_batches(explode, batch_format="pyarrow")
           .groupby(["event_type", "window_id"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("value", alias_name="sum_value")))
    return out.map_batches(lambda b: _round_col(b, "sum_value", 4),
                           batch_format="pyarrow")


SQL_EVENTS_SLIDING_10MIN = """
SELECT event_type,
       CAST(floor(epoch(ts) / 300) AS BIGINT) - k AS window_id,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events CROSS JOIN (VALUES (0), (1)) AS offsets(k)
GROUP BY event_type, window_id
"""


def events_tumbling_distinct_users(sf_dir: str):
    """Exact distinct users per 5-minute tumbling window (the DAU/MAU
    uniques-per-window shape). Scale shape: per-block (window, user)
    pair dedup FIRST (the combiner — the shuffle then carries at most
    one row per pair per block, not one per event), then one
    groupby(window) whose in-group nunique is vectorized. Exact, not
    sketched — the HLL variant for when uniques-per-window no longer
    fits is events_distinct_users_hll."""
    import pandas as pd

    events = _read(sf_dir, "events", ["ts", "user_id"])

    def pairs(b: pa.Table) -> pa.Table:
        micros = pc.cast(b.column("ts"), pa.int64())
        window = pc.cast(
            pc.floor(pc.divide(pc.cast(micros, pa.float64()),
                               pa.scalar(300_000_000.0))),
            pa.int64())
        tbl = pa.table({"window_id": window,
                        "user_id": b.column("user_id")})
        from ..stages.exchange import polars_capped
        pl = polars_capped()
        return (pl.from_arrow(tbl).unique()
                .sort(["window_id", "user_id"]).to_arrow())

    def count_users(df: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({
            "window_id": [int(df["window_id"].iloc[0])],
            "n_users": [int(df["user_id"].nunique())]})

    return (events.map_batches(pairs, batch_format="pyarrow")
            .groupby("window_id")
            .map_groups(count_users, batch_format="pandas")
            .sort("window_id"))


SQL_EVENTS_TUMBLING_DISTINCT_USERS = """
SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS window_id,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY window_id
ORDER BY window_id
"""


# -- gap sessionization (groupby + map_groups) ------------------------------

SESSION_GAP_SECONDS = 1800


def events_sessionize(sf_dir: str, num_buckets: int = 32):
    """Hash-partition users into buckets (one map_groups call per bucket),
    then vectorized pandas sessionization inside each bucket — the
    co-locate-by-key-then-vectorize pattern; per-user map_groups would pay
    per-group overhead proportional to user count."""
    import pandas as pd
    events = _read(sf_dir, "events", ["user_id", "ts"])

    def add_bucket(b: pa.Table) -> pa.Table:
        # num_buckets is a power of two → bucket = user_id & (B-1)
        bucket = pc.bit_wise_and(b.column("user_id"),
                                 pa.scalar(num_buckets - 1,
                                           type=pa.int64()))
        return b.append_column("user_bucket",
                               pc.cast(bucket, pa.int32()))

    def sessions(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["user_id", "ts"])
        gaps = df.groupby("user_id")["ts"].diff().dt.total_seconds()
        transitions = (gaps > SESSION_GAP_SECONDS).groupby(
            df["user_id"].values).sum()
        counts = df.groupby("user_id").size()
        out = pd.DataFrame({
            "user_id": counts.index.astype("int64"),
            "n_events": counts.values.astype("int64"),
            "n_sessions": (transitions.reindex(counts.index).values
                           + 1).astype("int64")})
        return out

    # sessions() already excludes the bucket column from its output
    return (events.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("user_bucket")
            .map_groups(sessions, batch_format="pandas"))


SQL_EVENTS_SESSIONIZE = f"""
SELECT user_id, count(*) AS n_events,
       CAST(1 + sum(CASE WHEN gap > {SESSION_GAP_SECONDS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_sessions
FROM (
  SELECT user_id,
         epoch(ts) - lag(epoch(ts))
             OVER (PARTITION BY user_id ORDER BY ts) AS gap
  FROM events)
GROUP BY user_id
"""


# -- exact document dedup ---------------------------------------------------

def documents_exact_dedup(sf_dir: str, num_buckets: int = 16):
    """Hash-partition by a bucket of the content hash, vectorized
    min/count per text inside each bucket."""
    import pandas as pd

    from ..stages.exchange import hash_rows_mod
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def add_bucket(b: pa.Table) -> pa.Table:
        buckets = hash_rows_mod(b, ["text"], num_buckets)
        return b.append_column("text_bucket",
                               pa.array(buckets.astype("int32"),
                                        type=pa.int32()))

    def first_per_text(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby("text", sort=False)["doc_id"]
        out = pd.DataFrame({"doc_id": g.min().astype("int64"),
                            "n_copies": g.size().astype("int64")})
        return out.reset_index(drop=True)

    return (docs.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("text_bucket")
            .map_groups(first_per_text, batch_format="pandas"))


SQL_DOCUMENTS_EXACT_DEDUP = """
SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY text
"""


def documents_dedup_incremental(sf_dir: str, num_buckets: int = 16):
    """Incremental-ingest dedup: filter an INCOMING batch of documents
    (odd doc_id — the stand-in for a new crawl increment) against the
    KNOWN corpus (even doc_id), dropping incoming docs whose exact text
    already exists. The production shape for 'only ingest what's new':
    both sides co-locate by a bucket of the text hash (one exchange —
    never a broadcast of the known-corpus text set, which at 100 TB no
    longer fits a worker), and the known/new classification is
    vectorized inside each bucket. Survivors keep their identity
    columns. Planted-overlap pytest in tests/test_mlprep.py; DuckDB
    NOT-EXISTS oracle."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..stages.exchange import hash_rows_mod
    docs = _read(sf_dir, "documents",
                 ["doc_id", "text", "lang", "source"])

    def tag_and_bucket(b: pa.Table) -> pa.Table:
        is_known = pc.equal(
            pc.bit_wise_and(b.column("doc_id"),
                            pa.scalar(1, type=pa.int64())),
            pa.scalar(0, type=pa.int64()))
        buckets = hash_rows_mod(b, ["text"], num_buckets)
        return (b.append_column("is_known", is_known)
                .append_column("text_bucket",
                               pa.array(buckets.astype("int32"),
                                        type=pa.int32())))

    def keep_new(df: "pd.DataFrame") -> "pd.DataFrame":
        known = df.loc[df["is_known"], "text"]
        out = df[(~df["is_known"]) & (~df["text"].isin(set(known)))]
        return out[["doc_id", "lang", "source"]]

    return (docs.map_batches(tag_and_bucket, batch_format="pyarrow")
            .groupby("text_bucket")
            .map_groups(keep_new, batch_format="pandas")
            .sort("doc_id"))


SQL_DOCUMENTS_DEDUP_INCREMENTAL = """
SELECT n.doc_id, n.lang, n.source
FROM documents n
WHERE n.doc_id % 2 = 1
  AND NOT EXISTS (SELECT 1 FROM documents k
                  WHERE k.doc_id % 2 = 0 AND k.text = n.text)
ORDER BY n.doc_id
"""


# -- token counting ---------------------------------------------------------

def documents_token_stats(sf_dir: str):
    """Vectorized: n_tokens = whitespace-run count of the trimmed text + 1
    (split-array length), n_chars = char length. polars str kernels; no
    per-row Python (the round-2 version looped a regex split per row)."""
    from ..stages.exchange import polars_capped

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        df = pl.from_arrow(b)
        # explicit ASCII whitespace set: polars strip_chars()/\s are
        # Unicode-aware while DuckDB trim()/RE2 \s are ASCII — spelling
        # the set out keeps both engines identical on NBSP-bearing text
        out = df.select(
            pl.col("doc_id"),
            n_tokens=(pl.col("text").str.strip_chars("\t\n\f\r ")
                      .str.count_matches(r"[\t\n\f\r ]+") + 1)
            .cast(pl.Int64),
            n_chars=pl.col("text").str.len_chars().cast(pl.Int64),
        )
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("n_chars", pa.int64())]))

    return docs.map_batches(stats, batch_format="pyarrow")


SQL_DOCUMENTS_TOKEN_STATS = r"""
SELECT doc_id,
       len(regexp_split_to_array(
           trim(text, chr(9) || chr(10) || chr(12) || chr(13) || ' '),
           '[' || chr(9) || chr(10) || chr(12) || chr(13) || ' ]+'))
           AS n_tokens,
       length(text) AS n_chars
FROM documents
"""


# -- global term frequencies (combiner pattern) -----------------------------

def documents_top_terms(sf_dir: str, k: int = 50):
    """Top-k corpus-wide term frequencies — the canonical pre-aggregate
    shape for 100-TB counting: each batch emits PARTIAL per-term counts
    (rows = distinct terms in the batch, not tokens), so the groupby
    shuffle moves a vocabulary-sized table instead of a token stream;
    the global sum + top-k then run over the small aggregate. Ties at
    the k-boundary break by term ascending in both engines."""
    from ray.data.aggregate import Sum
    from ..stages.exchange import polars_capped

    docs = _read(sf_dir, "documents", ["text"])

    def partial_counts(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        df = pl.from_arrow(b)
        out = (df.select(term=pl.col("text").fill_null("")
                         .str.to_lowercase()
                         .str.extract_all("[a-zA-ZÀ-ÿ]+"))
               .explode("term").drop_nulls()
               .group_by("term").len(name="n"))
        return out.to_arrow().cast(pa.schema([
            ("term", pa.string()), ("n", pa.int64())]))

    return (docs.map_batches(partial_counts, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("n", alias_name="n_occurrences"))
            .sort(["n_occurrences", "term"], descending=[True, False])
            .limit(k))


SQL_DOCUMENTS_TOP_TERMS = """
SELECT t AS term, count(*) AS n_occurrences
FROM (SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                                       '[a-zA-ZÀ-ÿ]+')) AS t
      FROM documents)
GROUP BY t ORDER BY n_occurrences DESC, term ASC LIMIT 50
"""


# -- BPE-ish token counting -------------------------------------------------

# GPT-2-style pre-tokenizer shape, ASCII-simplified so Python's re, polars'
# rust regex and DuckDB's RE2 agree exactly: a token is an optional leading
# space followed by a letter run, digit run, or symbol run. Whitespace-only
# runs are not tokens. The whitespace set is spelled out because \s is
# Unicode in rust-regex but ASCII in RE2 (they'd diverge on NBSP).
BPE_TOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^\t\n\f\r A-Za-z0-9]+"


def documents_token_stats_bpe(sf_dir: str):
    """Token counting with a BPE-ish regex (subword-tokenizer pre-split),
    complementing the whitespace counter above. Vectorized:
    polars str.count_matches, no per-row Python."""
    from ..stages.exchange import polars_capped

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        df = pl.from_arrow(b)
        out = df.select(
            pl.col("doc_id"),
            n_tokens_bpe=pl.col("text").str.count_matches(
                BPE_TOKEN_PATTERN).cast(pl.Int64),
            n_chars=pl.col("text").str.len_chars().cast(pl.Int64),
        )
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()),
            ("n_tokens_bpe", pa.int64()),
            ("n_chars", pa.int64())]))

    return docs.map_batches(stats, batch_format="pyarrow")


SQL_DOCUMENTS_TOKEN_STATS_BPE = r"""
SELECT doc_id,
       len(regexp_extract_all(text,
           ' ?[A-Za-z]+| ?[0-9]+| ?[^' || chr(9) || chr(10) || chr(12)
           || chr(13) || ' A-Za-z0-9]+'))
           AS n_tokens_bpe,
       length(text) AS n_chars
FROM documents
"""


# -- language distribution --------------------------------------------------

def documents_lang_counts(sf_dir: str):
    from ray.data.aggregate import Count, Mean
    docs = _read(sf_dir, "documents", ["lang", "n_chars"])
    out = docs.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Mean("n_chars", alias_name="avg_chars"))
    return out.map_batches(lambda b: _round_col(b, "avg_chars", 4),
                           batch_format="pyarrow")


SQL_DOCUMENTS_LANG_COUNTS = """
SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY lang
"""


# -- brute-force cosine top-k (broadcast query vector) ----------------------

def embeddings_cosine_top10(sf_dir: str):
    import pyarrow.dataset as pads

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # light metadata-path read for the single query vector — no extra
    # Dataset execution just to fetch one row
    qt = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")) \
        .to_table(columns=["embedding"], filter=pads.field("vec_id") == 0)
    query = np.asarray(qt.column("embedding")[0].as_py(), dtype=np.float64)
    qn = query / np.linalg.norm(query)

    def sims(b: pa.Table) -> pa.Table:
        from .simops import _emb_matrix
        ids, mat = _emb_matrix(b)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        s = (mat @ qn) / norms
        keep = ids != 0
        return pa.Table.from_pydict({
            "vec_id": pa.array(ids[keep], type=pa.int64()),
            "sim": pa.array(np.round(s[keep], 6), type=pa.float64())})

    return (emb.map_batches(sims, batch_format="pyarrow")
            .sort(["sim", "vec_id"], descending=[True, False])
            .limit(10))


SQL_EMBEDDINGS_COSINE_TOP10 = """
SELECT vec_id,
       round(list_cosine_similarity(
           CAST(embedding AS DOUBLE[]),
           (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
            WHERE vec_id = 0)), 6) AS sim
FROM embeddings WHERE vec_id != 0
ORDER BY sim DESC, vec_id ASC
LIMIT 10
"""


def events_session_stats(sf_dir: str, num_buckets: int = 32):
    """Session-LEVEL analytics table: one row per (user, session) with
    event count, exact microsecond duration and total value — the
    enrichment step downstream of events_sessionize (which returns only
    per-user counts).

    Same co-locate-by-user-bucket-then-vectorize shape as sessionize:
    power-of-two bucket mask, one pandas call per bucket, session
    boundaries from the 30-minute gap rule, session index via per-user
    cumsum of boundary flags. Durations subtract int64 microsecond
    ticks (exact — the float total-value sum is the only rounded
    column)."""
    import pandas as pd

    events = _read(sf_dir, "events",
                   ["event_id", "user_id", "ts", "value"])

    def add_bucket(b: pa.Table) -> pa.Table:
        bucket = pc.bit_wise_and(b.column("user_id"),
                                 pa.scalar(num_buckets - 1,
                                           type=pa.int64()))
        return b.append_column("user_bucket",
                               pc.cast(bucket, pa.int32()))

    def stats(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["user_id", "ts", "event_id"])
        gaps = df.groupby("user_id")["ts"].diff().dt.total_seconds()
        new_s = (gaps.isna() | (gaps > SESSION_GAP_SECONDS))
        df = df.assign(
            session_idx=new_s.groupby(df["user_id"].values).cumsum()
            .astype("int64"))
        g = df.groupby(["user_id", "session_idx"])
        # explicit µs cast — Arrow timestamp[us] arrives as
        # datetime64[us] under pandas 2, so a bare int64 view is
        # already microseconds (not nanoseconds)
        ts_us = df["ts"].astype("datetime64[us]").astype("int64")
        dur_us = (ts_us.groupby([df["user_id"].values,
                                 df["session_idx"].values]).max()
                  - ts_us.groupby([df["user_id"].values,
                                   df["session_idx"].values]).min())
        out = pd.DataFrame({
            "n_events": g.size().astype("int64"),
            "total_value": g["value"].sum().round(6),
        }).reset_index()
        out["duration_us"] = dur_us.values.astype("int64")
        out["user_id"] = out["user_id"].astype("int64")
        return out[["user_id", "session_idx", "n_events",
                    "duration_us", "total_value"]]

    return (events.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("user_bucket")
            .map_groups(stats, batch_format="pandas")
            .sort(["user_id", "session_idx"]))


SQL_EVENTS_SESSION_STATS = f"""
WITH seq AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w)
                      > {SESSION_GAP_SECONDS}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM seq
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT)
           AS duration_us,
       round(sum(value), 6) AS total_value
FROM sess GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


# -- per-source corpus report card -------------------------------------------

def documents_source_report(sf_dir: str):
    """Per source: document count, mean length, and language entropy
    (nats) — the one-pass "corpus report card" a curation run prints
    before mixing sources (a source whose lang entropy collapses to 0
    is monolingual; a suspiciously high one is likely mislabeled).

    Scale plan: per-batch (source, lang) partials carry count +
    char-sum, so the single exchange is bounded by |sources|×|langs|
    per block, never by rows. The entropy fold happens on the reduced
    table (tiny) with terms summed in sorted-lang order — a
    deterministic summation order, so the 6-dp round is stable.
    Returns (source, n_docs, avg_chars, lang_entropy), sorted."""
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["source", "lang", "n_chars"])

    reduced = (docs.map_batches(source_report_partial,
                                batch_format="pyarrow")
               .groupby(["source", "lang"])
               .aggregate(Sum("n", alias_name="n"),
                          Sum("chars", alias_name="chars"))
               .to_pandas())
    return source_report_finalize(reduced)


def source_report_partial(b: pa.Table) -> pa.Table:
    """Per-batch (source, lang) sufficient statistics for the source
    report: count + char-sum. ASSOCIATIVE AND MERGEABLE — the same
    partials serve the one-shot report and the incremental
    materialized-view update (pipelines/maintenance.py)."""
    import numpy as np

    t = pa.table({"source": b.column("source"),
                  "lang": b.column("lang"),
                  "n": pa.array(np.ones(len(b), dtype=np.int64)),
                  "chars": pc.cast(b.column("n_chars"), pa.int64())})
    return (pa.TableGroupBy(t, ["source", "lang"])
            .aggregate([("n", "sum"), ("chars", "sum")])
            .rename_columns(["source", "lang", "n", "chars"]))


def source_report_finalize(reduced) -> pa.Table:
    """Fold fully-merged (source, lang, n, chars) partials into the
    report rows. Deterministic: per-source terms summed in sorted-lang
    order so the 6-dp entropy round is stable."""
    import math

    import numpy as np

    rows = {"source": [], "n_docs": [], "avg_chars": [],
            "lang_entropy": []}
    for src, g in reduced.sort_values(["source", "lang"]) \
                         .groupby("source", sort=True):
        nd = int(g["n"].sum())
        p = g["n"].to_numpy(dtype=np.float64) / float(nd)
        rows["source"].append(src)
        rows["n_docs"].append(nd)
        # explicit floor(x·1e4 + 0.5): chars/nd hits exact 4-dp
        # midpoints (e.g. nd=32 → …3125), where round() is half-even
        # but SQL is half-away — same fix as the quality-score ratios
        rows["avg_chars"].append(
            math.floor(float(g["chars"].sum()) / float(nd) * 1e4 + 0.5)
            * 1e-4)
        rows["lang_entropy"].append(round(float(-(p * np.log(p)).sum()), 6))
    return pa.table({"source": pa.array(rows["source"]),
                     "n_docs": pa.array(rows["n_docs"], pa.int64()),
                     "avg_chars": pa.array(rows["avg_chars"], pa.float64()),
                     "lang_entropy": pa.array(rows["lang_entropy"],
                                              pa.float64())})


SQL_DOCUMENTS_SOURCE_REPORT = """
WITH lc AS (
  SELECT source, lang, count(*) AS n, sum(n_chars) AS chars
  FROM documents GROUP BY source, lang
),
tot AS (
  SELECT source, sum(n) AS nd, sum(chars) AS chars_tot FROM lc
  GROUP BY source
)
SELECT l.source,
       CAST(any_value(t.nd) AS BIGINT) AS n_docs,
       floor(any_value(t.chars_tot) * 1.0 / any_value(t.nd) * 1e4
             + 0.5) * 1e-4 AS avg_chars,
       round(-sum((l.n * 1.0 / t.nd) * ln(l.n * 1.0 / t.nd)), 6)
           AS lang_entropy
FROM lc l JOIN tot t USING (source)
GROUP BY l.source
ORDER BY l.source
"""


# -- Pareto skyline (maximize price, minimize date) --------------------------

def _skyline_block(b: pa.Table) -> pa.Table:
    """Vectorized 2-D skyline of one block: keep orders not dominated by
    any other row IN THE BLOCK (dominator: totalprice >= AND orderdate
    <=, strictly better in at least one).

    Sort by (date asc, price desc); a row survives iff its price equals
    its date-group's max AND strictly exceeds the running max over all
    strictly-earlier dates. Equal (date, price) rows are mutually
    non-dominating, so whole tie groups survive together — matching the
    NOT EXISTS oracle semantics exactly."""
    if b.num_rows == 0:
        return b
    idx = pc.sort_indices(b, sort_keys=[("o_orderdate", "ascending"),
                                        ("o_totalprice", "descending")])
    t = b.take(idx).combine_chunks()
    date = t.column("o_orderdate").to_numpy(zero_copy_only=False)
    price = t.column("o_totalprice").to_numpy(zero_copy_only=False)
    n = len(price)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = date[1:] != date[:-1]
    grp_start = np.maximum.accumulate(np.where(new, np.arange(n), 0))
    gmax = price[grp_start]          # within-date max (desc sort ⇒ first)
    cummax = np.maximum.accumulate(price)
    before = np.where(grp_start > 0, cummax[np.maximum(grp_start - 1, 0)],
                      -np.inf)       # max over strictly earlier dates
    keep = (price == gmax) & (price > before)
    return t.filter(pa.array(keep))


def orders_skyline(sf_dir: str):
    """Pareto frontier of orders: the set not dominated on
    (maximize o_totalprice, minimize o_orderdate) — 'for every order on
    the frontier, no other order is both at-least-as-expensive and
    at-least-as-early, strictly better in one'.

    Scale plan: the skyline operator is the textbook local-combiner
    case — a block's skyline is tiny (O(log n) expected for random
    data, bounded by distinct dates here) and skyline(union) ==
    skyline(union of local skylines), so the per-block pass prunes
    ~everything before a single-partition exact pass over the
    surviving handful. Nothing dataset-sized ever gathers."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_totalprice"])
    local = ds.map_batches(_skyline_block, batch_format="pyarrow")
    return (local.repartition(1)
            .map_batches(_skyline_block, batch_format="pyarrow")
            .sort(["o_orderdate", "o_orderkey"]))


SQL_ORDERS_SKYLINE = """
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM orders d
  WHERE d.o_totalprice >= o.o_totalprice
    AND d.o_orderdate <= o.o_orderdate
    AND (d.o_totalprice > o.o_totalprice OR d.o_orderdate < o.o_orderdate))
ORDER BY o_orderdate, o_orderkey
"""
