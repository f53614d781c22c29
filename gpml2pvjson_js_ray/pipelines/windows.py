"""Ordered / windowed operators Ray Data has no built-in for: as-of join,
per-group ranked top-k, and running cumulative aggregation.

All three share one partitioning assumption, stated per the custom-operator
rule: rows for one key (user_id / lang) must co-locate, which
`groupby(key).map_groups` guarantees via its hash shuffle. Within a group
the ordered semantics are vectorized (numpy sort/searchsorted/cumsum) —
group size is the per-task memory bound, so heavy keys are the thing to
watch; event streams keyed by user are naturally fine-grained.

Reference parity: the reference engine's only ordered semantics are
in-document (SURVEY.md §2.6 O1-O3, zIndex/topo/year sorts inside one
pathway, `src/2013a/toPvjson.ts`); these pipelines are part of the
beyond-reference surface a training-data/KG engine needs (as-of joins for
event attribution, ranked top-k for per-language corpus pruning,
cumulative windows for user-level features). Column names match the
oracle SQL aliases exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


# -- as-of join: click → most recent prior purchase by the same user --------

def events_last_purchase_asof(sf_dir: str):
    """For every click event, the most recent purchase by the same user at
    or before the click (DuckDB `ASOF LEFT JOIN` semantics).

    Plan: ONE pass over events splits the stream into tagged click /
    purchase rows (a flag column, no second read); the hash shuffle of
    `groupby(user_id)` co-locates each user's rows; inside a group both
    sides sort once and every click binary-searches the purchase
    timestamps (np.searchsorted) — O((c+p) log p) per user, never a
    cross product. At 100 TB this is the standard distributed as-of
    shape: partition by key, sort within partition, merge."""
    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b.column("event_type"),
                        value_set=pa.array(["click", "purchase"]))
        b = b.filter(keep)
        return b.append_column(
            "is_click", pc.equal(b.column("event_type"), "click"))

    def asof_group(df: pd.DataFrame) -> pd.DataFrame:
        clicks = df[df["is_click"]]
        purch = df[~df["is_click"]].sort_values("ts", kind="stable")
        p_ts = purch["ts"].to_numpy()
        idx = np.searchsorted(p_ts, clicks["ts"].to_numpy(),
                              side="right") - 1
        has = idx >= 0
        last_ts = np.full(len(clicks), np.datetime64("NaT"),
                          dtype="datetime64[us]")
        last_val = np.full(len(clicks), np.nan)
        last_ts[has] = p_ts[idx[has]]
        last_val[has] = purch["value"].to_numpy()[idx[has]]
        return pd.DataFrame({
            "event_id": clicks["event_id"].to_numpy(),
            "user_id": clicks["user_id"].to_numpy(),
            "ts": clicks["ts"].to_numpy(),
            "last_purchase_ts": last_ts,
            "last_purchase_value": last_val,
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(asof_group, batch_format="pandas")
            .sort("event_id"))


SQL_EVENTS_LAST_PURCHASE_ASOF = """
WITH clicks AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT ts, user_id, value FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id, c.ts,
       p.ts    AS last_purchase_ts,
       p.value AS last_purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
"""


# -- ranked top-k per group -------------------------------------------------

def documents_top_per_lang(sf_dir: str, k: int = 3):
    """Top-k longest documents per language with their rank
    (ROW_NUMBER semantics, ties broken by doc_id).

    Each batch keeps only its own per-lang top-k BEFORE the shuffle — the
    exchange then carries ≤ k·langs rows per block regardless of corpus
    size (the partial-top-k combiner pattern; same shape as
    relational.documents_top_terms)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial_topk(b: pa.Table) -> pa.Table:
        order = [("lang", "ascending"), ("n_chars", "descending"),
                 ("doc_id", "ascending")]
        b = b.sort_by(order)
        # vectorized rank-within-lang: position minus first position of
        # the row's lang in the sorted table
        langs = b.column("lang")
        enc = langs.combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        pos = np.arange(len(b))
        first = np.full(len(enc.dictionary), len(b), dtype=np.int64)
        np.minimum.at(first, codes, pos)
        return b.filter(pa.array(pos - first[codes] < k))

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_chars", "doc_id"],
                            ascending=[False, True], kind="stable").head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    return (ds.map_batches(partial_topk, batch_format="pyarrow")
            .groupby("lang")
            .map_groups(final_topk, batch_format="pandas")
            .sort(["lang", "rank"]))


SQL_DOCUMENTS_TOP_PER_LANG = """
SELECT lang, doc_id, n_chars,
       CAST(row_number() OVER (
            PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS BIGINT)
         AS rank
FROM documents
QUALIFY rank <= 3
ORDER BY lang, rank
"""


# -- running cumulative aggregate per key -----------------------------------

def events_cumulative_value(sf_dir: str):
    """Running total of purchase value per user, ordered by event time
    (SUM OVER (PARTITION BY user ORDER BY ts) semantics).

    groupby(user_id) co-locates each user's purchases; the group sorts by
    (ts, event_id) and np.cumsum runs the same left-to-right double
    additions the SQL window frame does, so values are bit-identical
    before the shared half-away rounding (floor(x*100+0.5)*0.01 on BOTH
    sides — see BASELINE.md on cross-engine rounding)."""
    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def purchases(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b.column("event_type"), "purchase")) \
                .drop_columns(["event_type"])

    def cum_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="stable")
        run = np.cumsum(df["value"].to_numpy())
        out = pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "user_id": df["user_id"].to_numpy(),
            "ts": df["ts"].to_numpy(),
            "cum_value": np.floor(run * 100.0 + 0.5) * 0.01,
        })
        return out

    return (ds.map_batches(purchases, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(cum_group, batch_format="pandas")
            .sort("event_id"))


# -- per-user ML feature table ----------------------------------------------

def events_user_features(sf_dir: str):
    """Per-user activity features (the feature-engineering step of a
    training pipeline): event counts, purchase counts, value sum/max,
    first/last timestamps and activity span in days.

    Every feature is associative, so the whole table is one
    partial-aggregated groupby: per-batch arrow partials shrink each
    block to its distinct users before the single shuffle."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.timestamp("us"))
        t = pa.table({
            "user_id": b.column("user_id"),
            "n_events": pa.array(np.ones(len(b), dtype=np.int64)),
            "n_purchases": pc.cast(
                pc.equal(b.column("event_type"), pa.scalar("purchase")),
                pa.int64()),
            "sum_value": b.column("value"),
            "max_value": b.column("value"),
            "first_ts": ts,
            "last_ts": ts})
        return (pa.TableGroupBy(t, "user_id").aggregate(
            [("n_events", "sum"), ("n_purchases", "sum"),
             ("sum_value", "sum"), ("max_value", "max"),
             ("first_ts", "min"), ("last_ts", "max")])
            .rename_columns(["user_id", "n_events", "n_purchases",
                             "sum_value", "max_value", "first_ts",
                             "last_ts"]))

    def finish(b: pa.Table) -> pa.Table:
        # shared half-away rounding (bitwise-identical to the oracle)
        sv = b.column("sum_value").to_numpy()
        sv = np.floor(sv * 100.0 + 0.5) * 0.01
        span = (b.column("last_ts").cast(pa.int64()).to_numpy()
                - b.column("first_ts").cast(pa.int64()).to_numpy()) \
            // 86_400_000_000
        b = b.set_column(b.schema.get_field_index("sum_value"),
                         "sum_value", pa.array(sv))
        return b.append_column("span_days", pa.array(span))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("n_purchases", alias_name="n_purchases"),
                       Sum("sum_value", alias_name="sum_value"),
                       Max("max_value", alias_name="max_value"),
                       Min("first_ts", alias_name="first_ts"),
                       Max("last_ts", alias_name="last_ts"))
            .map_batches(finish, batch_format="pyarrow")
            .sort("user_id"))


SQL_EVENTS_USER_FEATURES = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           AS n_purchases,
       floor(sum(value) * 100.0 + 0.5) * 0.01 AS sum_value,
       max(value) AS max_value,
       CAST(min(ts) AS TIMESTAMP) AS first_ts,
       CAST(max(ts) AS TIMESTAMP) AS last_ts,
       (epoch_us(max(ts)) - epoch_us(min(ts))) // 86400000000
           AS span_days
FROM events GROUP BY user_id ORDER BY user_id
"""


# -- signup → purchase conversion funnel ------------------------------------

def events_signup_conversion(sf_dir: str):
    """Two-step funnel: users who signed up, and of those, users with a
    purchase at-or-after their first signup.

    The ordered condition "purchase after first signup" reduces to
    `max(purchase_ts) >= min(signup_ts)` per user — both sides are
    associative, so the whole funnel is ONE partial-aggregable groupby:
    per-batch (user, min_signup, max_purchase) partials shrink every
    block to its distinct users before the only shuffle, and the final
    count is a scalar fold. No per-user event lists ever co-locate,
    which is what makes this shape hold at 100 TB event streams."""
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    _MINV = np.int64(-(2 ** 62))

    def partial(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b.column("event_type"),
                        value_set=pa.array(["signup", "purchase"]))
        b = b.filter(keep)
        ts = b.column("ts").cast(pa.timestamp("us")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        is_signup = pc.equal(b.column("event_type"),
                             pa.scalar("signup")).to_numpy(
                                 zero_copy_only=False)
        t = pa.table({
            "user_id": b.column("user_id"),
            # sentinel-coded so min/max ignore the other type's rows
            "signup_ts": pa.array(np.where(is_signup, ts, -_MINV)),
            "purchase_ts": pa.array(np.where(is_signup, _MINV, ts))})
        return (pa.TableGroupBy(t, "user_id")
                .aggregate([("signup_ts", "min"), ("purchase_ts", "max")])
                .rename_columns(["user_id", "signup_ts", "purchase_ts"]))

    per_user = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Min("signup_ts", alias_name="signup_ts"),
                           Max("purchase_ts", alias_name="purchase_ts")))

    def fold(b: pa.Table) -> pa.Table:
        s = b.column("signup_ts").to_numpy()
        p = b.column("purchase_ts").to_numpy()
        signed_up = s < -_MINV  # at least one real signup row
        converted = signed_up & (p >= s) & (p > _MINV)
        return pa.table({
            "n_signup": pa.array([int(signed_up.sum())]),
            "n_converted": pa.array([int(converted.sum())])})

    def total(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_signup": pa.array([pc.sum(b.column("n_signup")).as_py()
                                  or 0]),
            "n_converted": pa.array(
                [pc.sum(b.column("n_converted")).as_py() or 0])})

    # fold leaves one row per block; the repartition(1) reduce is O(blocks)
    return (per_user.map_batches(fold, batch_format="pyarrow")
            .repartition(1)
            .map_batches(total, batch_format="pyarrow", batch_size=None))


SQL_EVENTS_SIGNUP_CONVERSION = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS ms,
         max(CASE WHEN event_type = 'purchase' THEN ts END) AS mp
  FROM events GROUP BY user_id
)
SELECT CAST(count(ms) AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (WHERE mp >= ms) AS BIGINT) AS n_converted
FROM per_user
"""


# -- week-over-week retention cohorts ---------------------------------------

def events_weekly_retention(sf_dir: str):
    """Per calendar week (Monday-truncated): active users and how many of
    them return the following week.

    Two exchanges, both small: per-batch distinct (user, week) pairs
    shrink the first shuffle to unique pairs per block;
    groupby(user_id) then computes each user's next-week flags from the
    sorted week list (vectorized diff == 7 days); the final
    groupby(week) aggregates a few rows per user. The week truncation
    ((days+3) % 7 Monday alignment) is bit-identical to DuckDB
    date_trunc('week') — verified on boundary timestamps."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pairs(b: pa.Table) -> pa.Table:
        days = b.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        week = (days - (days + 3) % 7).astype("datetime64[D]") \
            .astype("datetime64[us]")
        t = pa.table({"user_id": b.column("user_id"),
                      "week": pa.array(week)})
        return t.group_by(["user_id", "week"]).aggregate([])

    def flag_next(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.drop_duplicates(["user_id", "week"])
              .sort_values("week", kind="stable"))
        wk = df["week"].to_numpy().astype("datetime64[D]").astype(np.int64)
        nxt = np.zeros(len(wk), dtype=np.int64)
        if len(wk) > 1:
            nxt[:-1] = (np.diff(wk) == 7).astype(np.int64)
        return pd.DataFrame({"week": df["week"].to_numpy(), "r": nxt})

    return (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(flag_next, batch_format="pandas")
            .groupby("week")
            .aggregate(Count(alias_name="active_users"),
                       Sum("r", alias_name="retained_next_week"))
            .sort("week"))


SQL_EVENTS_WEEKLY_RETENTION = """
WITH wk AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
), flg AS (
  SELECT user_id, week,
         CASE WHEN lead(week) OVER (PARTITION BY user_id ORDER BY week)
                   = week + INTERVAL 7 DAY
              THEN 1 ELSE 0 END AS r
  FROM wk
)
SELECT CAST(week AS TIMESTAMP) AS week,
       CAST(count(*) AS BIGINT) AS active_users,
       CAST(sum(r) AS BIGINT) AS retained_next_week
FROM flg GROUP BY week ORDER BY week
"""


SQL_EVENTS_CUMULATIVE_VALUE = """
SELECT event_id, user_id, ts,
       floor(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) * 100.0 + 0.5) * 0.01
         AS cum_value
FROM events
WHERE event_type = 'purchase'
ORDER BY event_id
"""


# -- first/last-touch attribution: associative argmin/argmax ------------------

def events_first_last_touch(sf_dir: str):
    """Per user: the type and timestamp of their FIRST and LAST event
    (ties broken by event_id) — the marketing first/last-touch
    attribution shape, and the catalog's argmin/argmax combiner: unlike
    min/max of a single column, the reduced value (event_type) rides
    along with the ordering key, so the fold must carry (key, payload)
    pairs.

    Scale plan: argmin/argmax IS associative, so each block folds to one
    row per user locally (pandas sort + groupby first/last — vectorized,
    no Python loop), and the hash shuffle carries ≤ one row per (user,
    block). The final `map_groups` reduce sees only those partials
    (group size ≤ #blocks, never #events). event_id tiebreaks travel
    with the partials so cross-block timestamp ties resolve exactly as
    the oracle's row_number ORDER BY ts, event_id."""
    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        g = df.groupby("user_id", sort=False)
        return g.agg(
            first_ts=("ts", "first"), first_id=("event_id", "first"),
            first_type=("event_type", "first"),
            last_ts=("ts", "last"), last_id=("event_id", "last"),
            last_type=("event_type", "last")).reset_index()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        fi = df.sort_values(["first_ts", "first_id"],
                            kind="mergesort").iloc[0]
        la = df.sort_values(["last_ts", "last_id"],
                            kind="mergesort").iloc[-1]
        return pd.DataFrame({
            "user_id": [df["user_id"].iloc[0]],
            "first_type": [fi["first_type"]], "first_ts": [fi["first_ts"]],
            "last_type": [la["last_type"]], "last_ts": [la["last_ts"]]})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("user_id")
            .map_groups(final, batch_format="pandas")
            .sort("user_id"))


SQL_EVENTS_FIRST_LAST_TOUCH = """
WITH ranked AS (
  SELECT user_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT user_id,
       max(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
       max(CASE WHEN rn_a = 1 THEN ts END)         AS first_ts,
       max(CASE WHEN rn_d = 1 THEN event_type END) AS last_type,
       max(CASE WHEN rn_d = 1 THEN ts END)         AS last_ts
FROM ranked
GROUP BY user_id
ORDER BY user_id
"""


# -- ordered sequence export: the training-sequence builder ------------------

def events_user_sequences(sf_dir: str, sep: str = "->"):
    """Each user's full event-type sequence in time order (event_id
    tiebreak) — the build-training-sequences shape (behavioral LM
    pretraining, next-event prediction).

    Partitioning assumption (per the module's custom-operator rule):
    ONE USER'S EVENTS must fit a task — `groupby(user_id).map_groups`
    co-locates them and the in-group sort is the only ordered step.
    User-keyed event streams are naturally fine-grained; a key hot
    enough to break this (a bot account at 100 TB) needs upstream
    capping, not a different operator. Unlike first/last touch there is
    NO associative fold for ordered concatenation — the shuffle
    necessarily carries every row, which is why this operator exists
    separately from the partial-reducing ones."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def seq_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        return pd.DataFrame({
            "user_id": [df["user_id"].iloc[0]],
            "n_events": np.array([len(df)], dtype=np.int64),
            "seq": [sep.join(df["event_type"])]})

    return (ds.groupby("user_id")
            .map_groups(seq_group, batch_format="pandas")
            .sort("user_id"))


SQL_EVENTS_USER_SEQUENCES = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       string_agg(event_type, '->' ORDER BY ts, event_id) AS seq
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def events_debounce(sf_dir: str, gap_seconds: int = 60,
                    num_buckets: int = 32):
    """Telemetry debounce: drop an event when the SAME (user, type)
    fired within `gap_seconds` before it (LAG semantics — each event is
    compared to its immediate predecessor in (ts, event_id) order, the
    standard rapid-repeat-duplicate filter for clickstream/sensor
    feeds). Keeps the first of every burst.

    Scale shape: co-locate-by-user-bucket-then-vectorize (the
    sessionize pattern — one map_groups per bucket, never per user):
    power-of-two bucket from user_id, per-bucket pandas sort +
    grouped diff; the only exchange is the bucket groupby. Output is
    the KEPT events by event_id; DuckDB-oracled via lag() OVER."""
    import pandas as pd
    import pyarrow.compute as pc

    events = _read(sf_dir, "events",
                   ["event_id", "user_id", "event_type", "ts"])

    def add_bucket(b: pa.Table) -> pa.Table:
        bucket = pc.bit_wise_and(b.column("user_id"),
                                 pa.scalar(num_buckets - 1,
                                           type=pa.int64()))
        return b.append_column("user_bucket",
                               pc.cast(bucket, pa.int32()))

    def debounce(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"])
        gaps = df.groupby(["user_id", "event_type"])["ts"].diff() \
            .dt.total_seconds()
        keep = gaps.isna() | (gaps > gap_seconds)
        out = df.loc[keep, ["event_id", "user_id", "event_type", "ts"]]
        return out

    return (events.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("user_bucket")
            .map_groups(debounce, batch_format="pandas")
            .sort("event_id"))


def events_trending_types(sf_dir: str, k: int = 2,
                          window_seconds: int = 3600,
                          num_buckets: int = 32):
    """Trending items: the top-k event types per 1-hour tumbling window
    by event count (rank ties → event_type order). The leaderboard /
    trending-topics shape: per-block (window, type) COUNT partials →
    one (window, type)-keyed groupby-sum (the only row exchange, carries
    ≤ one row per (window, type) per block) → rank inside window-hash
    buckets, one vectorized pandas groupby per bucket."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..stages.exchange import hash_rows_mod, polars_capped

    events = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        micros = pc.cast(b.column("ts"), pa.int64())
        window = pc.cast(
            pc.floor(pc.divide(pc.cast(micros, pa.float64()),
                               pa.scalar(window_seconds * 1e6))),
            pa.int64())
        pl = polars_capped()
        return (pl.from_arrow(pa.table({
            "window_id": window, "event_type": b.column("event_type")}))
            .group_by(["window_id", "event_type"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .select(["window_id", "event_type", "n"]).to_arrow())

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = hash_rows_mod(b, ["window_id"], num_buckets)
        return b.append_column("bucket", pa.array(ids, type=pa.int32()))

    def rank(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["window_id", "n", "event_type"],
                            ascending=[True, False, True])
        df["rank"] = df.groupby("window_id").cumcount() + 1
        out = df[df["rank"] <= k]
        return out[["window_id", "event_type", "n", "rank"]].astype(
            {"n": "int64", "rank": "int64"})

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"window_id": b.column("window_id"),
                         "event_type": b.column("event_type"),
                         "n": b.column("sum(n)")})

    return (events.map_batches(partial, batch_format="pyarrow")
            .groupby(["window_id", "event_type"])
            .aggregate(Sum("n", alias_name="sum(n)"))
            .map_batches(rename, batch_format="pyarrow")
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(rank, batch_format="pandas")
            .sort(["window_id", "rank"]))


SQL_EVENTS_TRENDING_TYPES = """
WITH counts AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS window_id,
         event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY window_id, event_type
)
SELECT window_id, event_type, n, rank FROM (
  SELECT window_id, event_type, n,
         CAST(row_number() OVER (PARTITION BY window_id
                                 ORDER BY n DESC, event_type) AS BIGINT)
             AS rank
  FROM counts)
WHERE rank <= 2
ORDER BY window_id, rank
"""


SQL_EVENTS_DEBOUNCE = """
WITH lagged AS (
  SELECT event_id, user_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev_ts
  FROM events)
SELECT event_id, user_id, event_type, ts FROM lagged
WHERE prev_ts IS NULL OR epoch(ts - prev_ts) > 60
ORDER BY event_id
"""


def events_anomaly_bursts(sf_dir: str, factor: int = 1,
                          num_buckets: int = 32):
    """Burst detection against each user's OWN baseline: flag
    (user, minute) buckets whose event count exceeds `factor`× the
    user's mean per-active-minute rate. All comparisons in integer
    arithmetic (n·minutes > factor·total) so no float rounding can
    diverge from the SQL oracle. The synthetic events table is
    near-uniform per user (its max minute-rate never reaches 2×
    baseline), so the driver instance runs factor=1 — strictly-above-
    average minutes — to keep the oracled result non-trivial.

    Scale shape: per-block (user, minute, n) arrow partials collapse
    the raw stream before anything moves; one groupby-sum exchange
    merges them; the per-user baseline + flag then closes inside
    user-hash buckets (sessionize co-location pattern) — the baseline
    is never a second scan of raw events and never a join. Output
    (user_id, minute, n) sorted; DuckDB-oracled."""
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    events = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": b.column("user_id"),
            "minute": pc.floor_temporal(b.column("ts"), unit="minute"),
            "n": pa.array(np.ones(len(b), dtype=np.int64))})
        return (pa.TableGroupBy(t, ["user_id", "minute"])
                .aggregate([("n", "sum")])
                .rename_columns(["user_id", "minute", "n"]))

    def add_bucket(b: pa.Table) -> pa.Table:
        bucket = pc.bit_wise_and(b.column("user_id"),
                                 pa.scalar(num_buckets - 1,
                                           type=pa.int64()))
        return b.append_column("user_bucket",
                               pc.cast(bucket, pa.int32()))

    def flag(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby("user_id")["n"]
        total = g.transform("sum").to_numpy()
        minutes = g.transform("size").to_numpy()
        n = df["n"].to_numpy()
        keep = n * minutes > factor * total  # n > factor * (total/minutes)
        out = df.loc[keep, ["user_id", "minute", "n"]]
        return out

    return (events.map_batches(partial, batch_format="pyarrow")
            .groupby(["user_id", "minute"])
            .aggregate(Sum("n", alias_name="n"))
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("user_bucket")
            .map_groups(flag, batch_format="pandas")
            .sort(["user_id", "minute"]))


SQL_EVENTS_ANOMALY_BURSTS = """
WITH pm AS (
  SELECT user_id, date_trunc('minute', ts) AS minute, count(*) AS n
  FROM events GROUP BY user_id, date_trunc('minute', ts)),
ua AS (
  SELECT user_id, sum(n) AS total, count(*) AS n_minutes
  FROM pm GROUP BY user_id)
SELECT pm.user_id, pm.minute, pm.n
FROM pm JOIN ua USING (user_id)
WHERE pm.n * ua.n_minutes > 1 * ua.total
ORDER BY user_id, minute
"""


# -- exponentially time-decayed counts (trending score) -----------------------

# half-life 7 days; the literal is shared verbatim with the SQL oracle
# (repr round-trips the exact double) so both engines use the same λ.
_DECAY_LAMBDA = 0.0990210257942779  # ln(2)/7 per day


def events_decayed_counts(sf_dir: str):
    """Per-event-type exponentially time-decayed count and value at the
    corpus watermark (max ts) — the freshness-weighted popularity score
    a production ranker keeps per item (half-life 7 days).

    Scale shape: pass 1 reduces to ONE max-ts scalar (per-block max
    partials, constant-size); pass 2 is map-only — each block computes
    per-type partials Σw and Σw·value with w = exp(-λ·age_days) in
    numpy (true division + libm exp, matching the SQL text's op order),
    and the exchange carries |types|-sized partials per block. Sums are
    reassociated vs the SQL's scan order, so outputs round to 4 dp —
    far above the ~1e-13 reassociation noise of corpus-sized folds."""
    from ray.data.aggregate import Sum

    events = _read(sf_dir, "events", ["ts", "event_type", "value"])

    max_parts = (events.map_batches(
        lambda b: pa.table({
            "m": pa.array([pc.max(b.column("ts")).value], pa.int64())}),
        batch_format="pyarrow").to_pandas())
    ref_us = int(max_parts["m"].max())

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        age_days = (ref_us - ts_us).astype(np.float64) / 86400000000.0
        w = np.exp(-_DECAY_LAMBDA * age_days)
        val = b.column("value").to_numpy(zero_copy_only=False)
        types = b.column("event_type")
        import pandas as pd_
        df = pd_.DataFrame({"event_type": types.to_pandas(),
                            "w": w, "wv": w * val})
        g = df.groupby("event_type", sort=False)[["w", "wv"]].sum()
        return pa.table({
            "event_type": pa.array(g.index.to_numpy(), pa.string()),
            "w": pa.array(g["w"].to_numpy(), pa.float64()),
            "wv": pa.array(g["wv"].to_numpy(), pa.float64())})

    def finish(b: pa.Table) -> pa.Table:
        w = b.column("w").to_numpy(zero_copy_only=False)
        wv = b.column("wv").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b.column("event_type"),
            "decayed_count": pa.array(
                np.floor(w * 10000.0 + 0.5) * 0.0001, pa.float64()),
            "decayed_value": pa.array(
                np.floor(wv * 10000.0 + 0.5) * 0.0001, pa.float64())})

    return (events.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("w", alias_name="w"),
                       Sum("wv", alias_name="wv"))
            .map_batches(finish, batch_format="pyarrow")
            .sort("event_type"))


SQL_EVENTS_DECAYED_COUNTS = f"""
WITH ref AS (SELECT max(epoch_us(ts)) AS ref_us FROM events),
w AS (
  SELECT event_type,
         exp(-{_DECAY_LAMBDA!r}
             * ((ref.ref_us - epoch_us(ts)) / 86400000000.0)) AS w,
         exp(-{_DECAY_LAMBDA!r}
             * ((ref.ref_us - epoch_us(ts)) / 86400000000.0)) * value
             AS wv
  FROM events, ref)
SELECT event_type,
       floor(sum(w) * 10000.0 + 0.5) * 0.0001 AS decayed_count,
       floor(sum(wv) * 10000.0 + 0.5) * 0.0001 AS decayed_value
FROM w GROUP BY event_type ORDER BY event_type
"""


# -- late-arrival detection (watermark semantics) ------------------------------

_LATENESS_US = 120 * 1_000_000  # 120 s allowed lateness


def events_late_arrivals(sf_dir: str, num_buckets: int = 32):
    """Watermark-style late-event report: processing order is event_id
    (arrival order); an event is LATE when its ts lags the running max
    event-time of the same user's PRIOR arrivals by more than the
    allowed lateness — the rows a watermarking streaming engine would
    route to a side output. Output: (user_id, n_events, n_late).

    Scale shape: the debounce pattern — co-locate by power-of-two
    user bucket (one exchange), per-bucket pandas sort by (user,
    event_id) + grouped cummax of integer-µs timestamps; comparisons
    are integer-exact, so the oracle match is bitwise."""
    import pandas as pd

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_bucket(b: pa.Table) -> pa.Table:
        # NULL user_ids share one bucket (coalesce) so they co-locate
        # and survive to the report — SQL's GROUP BY emits a NULL row
        bucket = pc.bit_wise_and(
            pc.coalesce(b.column("user_id"),
                        pa.scalar(0, type=pa.int64())),
            pa.scalar(num_buckets - 1, type=pa.int64()))
        b = b.append_column("ts_us", b.column("ts").cast(pa.int64()))
        return b.append_column("user_bucket",
                               pc.cast(bucket, pa.int32()))

    def late(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["user_id", "event_id"])
        prior_max = (df.groupby("user_id", dropna=False)["ts_us"]
                     .cummax()
                     .groupby(df["user_id"], dropna=False).shift(1))
        is_late = prior_max.notna() & (
            df["ts_us"] < prior_max - _LATENESS_US)
        g = df.assign(is_late=is_late).groupby("user_id", dropna=False)
        out = pd.DataFrame({
            "user_id": pd.array(
                [None if pd.isna(u) else int(u)
                 for u in g.size().index], dtype="Int64"),
            "n_events": g.size().to_numpy().astype("int64"),
            "n_late": g["is_late"].sum().to_numpy().astype("int64")})
        if not out["user_id"].isna().any():
            # plain int64 when no NULL users (dtype parity with the
            # oracle; see events_type_islands)
            out["user_id"] = out["user_id"].astype("int64")
        return out

    return (events.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("user_bucket")
            .map_groups(late, batch_format="pandas")
            .sort("user_id"))


SQL_EVENTS_LATE_ARRIVALS = f"""
WITH m AS (
  SELECT user_id,
         epoch_us(ts) < max(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - {_LATENESS_US} AS is_late
  FROM events)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN is_late THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM m GROUP BY user_id ORDER BY user_id
"""


# -- gaps-and-islands: consecutive same-type runs per user --------------------

def events_type_islands(sf_dir: str, num_buckets: int = 32):
    """Gaps-and-islands: maximal runs of consecutive SAME-TYPE events
    per user in (ts, event_id) order, one row per island with its
    validity interval — the SCD2 "collapse consecutive states into
    intervals" shape (and the oracle is the classic row_number
    difference technique).

    Scale shape: the debounce pattern — co-locate by power-of-two user
    bucket (ONE exchange, never a per-user task), then the whole bucket
    vectorizes: one pandas sort by (user, ts, event_id), boundary flags
    from shifted-column compares, island ids by cumsum, and one grouped
    first/last/size. NULL user_ids share a bucket and a sentinel
    grouping key so they form islands together, exactly like SQL's
    PARTITION BY treats NULL as one partition."""
    events = _read(sf_dir, "events",
                   ["event_id", "user_id", "event_type", "ts"])

    _SENT = -(2 ** 62)

    def add_bucket(b: pa.Table) -> pa.Table:
        bucket = pc.bit_wise_and(
            pc.coalesce(b.column("user_id"),
                        pa.scalar(0, type=pa.int64())),
            pa.scalar(num_buckets - 1, type=pa.int64()))
        return b.append_column("user_bucket",
                               pc.cast(bucket, pa.int32()))

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        key = df["user_id"].fillna(_SENT)
        df = df.assign(_ukey=key).sort_values(
            ["_ukey", "ts", "event_id"], kind="mergesort")
        new_user = df["_ukey"].ne(df["_ukey"].shift())
        new_type = df["event_type"].ne(df["event_type"].shift())
        isl = (new_user | new_type).cumsum()
        g = df.groupby(isl, sort=False)
        out = pd.DataFrame({
            # nullable Int64: a NULL-user island must stay NULL without
            # dragging the whole column to float64
            "user_id": pd.array(g["user_id"].first(), dtype="Int64"),
            "event_type": g["event_type"].first(),
            "start_id": g["event_id"].first().astype("int64"),
            "start_ts": g["ts"].first(),
            "end_ts": g["ts"].last(),
            "n_events": g.size().astype("int64")}).reset_index(drop=True)
        if not out["user_id"].isna().any():
            # plain int64 when no NULL users: matches the oracle's
            # dtype (the driver hashes value bytes, and DuckDB only
            # widens on actual NULLs too)
            out["user_id"] = out["user_id"].astype("int64")
        return out

    return (events.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("user_bucket")
            .map_groups(islands, batch_format="pandas")
            .sort(["user_id", "start_id"]))


SQL_EVENTS_TYPE_ISLANDS = """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rnt
  FROM events)
SELECT user_id, event_type,
       first(event_id ORDER BY ts, event_id) AS start_id,
       min(ts) AS start_ts,
       max(ts) AS end_ts,
       CAST(count(*) AS BIGINT) AS n_events
FROM o GROUP BY user_id, event_type, rn - rnt
ORDER BY user_id, start_id
"""


# -- per-hour OHLC candles ----------------------------------------------------

def events_hourly_ohlc(sf_dir: str):
    """Per-hour OHLC candle over event values: open/close = value of
    the hour's first/last event in (ts, event_id) order, high/low =
    max/min — the time-series downsampling shape every monitoring and
    market pipeline runs.

    Open/close are argmin/argmax folds (the first_last_touch combiner
    generalized to a time-bucket key): each block reduces to ≤ one row
    per (hour, block) carrying the ordering keys alongside the payload
    value, the shuffle moves only those partials, and the per-hour
    reduce re-applies the same tiebreak — so cross-block ts ties
    resolve exactly as the oracle's row_number. High/low/count are
    plain associative folds riding the same partial. Values are
    compared, never combined, so the oracle match is bitwise."""
    events = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(b.column("ts"), unit="hour")
        df = pd.DataFrame({
            "hour": hour.to_pandas(),
            "ts": b.column("ts").to_pandas(),
            "event_id": b.column("event_id").to_pandas(),
            "value": b.column("value").to_pandas()})
        df = df.sort_values(["hour", "ts", "event_id"], kind="mergesort")
        g = df.groupby("hour", sort=False)
        return pa.Table.from_pandas(pd.DataFrame({
            "hour": g["ts"].first().index,
            "open_ts": g["ts"].first(), "open_id": g["event_id"].first(),
            "open_v": g["value"].first(),
            "close_ts": g["ts"].last(), "close_id": g["event_id"].last(),
            "close_v": g["value"].last(),
            "high_v": g["value"].max(), "low_v": g["value"].min(),
            "n_events": g.size().astype("int64")}).reset_index(drop=True),
            preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        op = df.sort_values(["open_ts", "open_id"],
                            kind="mergesort").iloc[0]
        cl = df.sort_values(["close_ts", "close_id"],
                            kind="mergesort").iloc[-1]
        return pd.DataFrame({
            "hour": [df["hour"].iloc[0]],
            "open_v": [op["open_v"]], "high_v": [df["high_v"].max()],
            "low_v": [df["low_v"].min()], "close_v": [cl["close_v"]],
            "n_events": np.array([df["n_events"].sum()], dtype=np.int64)})

    return (events.map_batches(partial, batch_format="pyarrow")
            .groupby("hour")
            .map_groups(final, batch_format="pandas")
            .sort("hour"))


SQL_EVENTS_HOURLY_OHLC = """
WITH ranked AS (
  SELECT date_trunc('hour', ts) AS hour, value,
         row_number() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events)
SELECT CAST(hour AS TIMESTAMP) AS hour,
       max(CASE WHEN rn_a = 1 THEN value END) AS open_v,
       max(value) AS high_v,
       min(value) AS low_v,
       max(CASE WHEN rn_d = 1 THEN value END) AS close_v,
       CAST(count(*) AS BIGINT) AS n_events
FROM ranked GROUP BY hour ORDER BY hour
"""


# -- peak concurrency (interval sweep) ----------------------------------------

def events_peak_concurrent_users(sf_dir: str):
    """Peak number of simultaneously-active users per day, where a
    user's daily activity span is the CLOSED interval [first event,
    last event] of that day — the classic interval max-overlap /
    'minimum meeting rooms' operator, absent from both Ray Data and
    the reference engine.

    Two-stage shape, everything aggregated before it moves:
    1. per-batch Arrow partials fold each block to its distinct
       (user, day) min/max timestamps, then ONE groupby((user, day))
       completes the spans — the shuffle carries per-user-day rows,
       never the event stream;
    2. spans explode into ±1 endpoint deltas and a groupby(day)
       sweep runs the vectorized cumsum; ties sort starts-before-ends
       (closed-interval semantics, delta DESC), and within an equal
       (ts, delta) run the running max is permutation-invariant, so
       the result is deterministic.

    Scale plan: stage-2 group size is bounded by 2x the distinct
    users active that day — the day key is the natural parallelism
    unit, and a hot day would salt by user-hash with a per-salt max
    + one tiny day-level max fold (max is associative)."""
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.timestamp("us"))
        t = pa.table({"user_id": b.column("user_id"),
                      "day": pc.floor_temporal(ts, unit="day"),
                      "s": ts, "e": ts})
        return (pa.TableGroupBy(t, ["user_id", "day"])
                .aggregate([("s", "min"), ("e", "max")])
                .rename_columns(["user_id", "day", "s", "e"]))

    spans = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["user_id", "day"])
             .aggregate(Min("s", alias_name="s"),
                        Max("e", alias_name="e")))

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        s = df["s"].to_numpy()
        e = df["e"].to_numpy()
        ts = np.concatenate([s, e])
        delta = np.concatenate([np.ones(len(s), dtype=np.int64),
                                -np.ones(len(e), dtype=np.int64)])
        order = np.lexsort((-delta, ts))   # ts asc, starts before ends
        run = np.cumsum(delta[order])
        return pd.DataFrame({
            "day": [df["day"].iloc[0]],
            "peak_concurrency": np.array([run.max()], dtype=np.int64)})

    return (spans.groupby("day")
            .map_groups(sweep, batch_format="pandas")
            .sort("day"))


SQL_EVENTS_PEAK_CONCURRENT_USERS = """
WITH spans AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         min(ts) AS s, max(ts) AS e
  FROM events GROUP BY user_id, date_trunc('day', ts)),
ep AS (
  SELECT day, s AS ts, 1 AS delta FROM spans
  UNION ALL
  SELECT day, e AS ts, -1 AS delta FROM spans),
run AS (
  SELECT day,
         sum(delta) OVER (PARTITION BY day ORDER BY ts, delta DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS conc
  FROM ep)
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(max(conc) AS BIGINT) AS peak_concurrency
FROM run GROUP BY day ORDER BY day
"""


# -- 3-step ordered funnel -----------------------------------------------------

_FUNNEL_STEPS = ["view", "click", "purchase"]
_FUNNEL_LABELS = ["view", "view>click", "view>click>purchase"]


def events_funnel_3step(sf_dir: str, num_buckets: int = 32):
    """Ordered 3-step funnel: users whose first 'view' is STRICTLY
    followed by a 'click', strictly followed by a 'purchase' — the
    chained min-after-min semantics (t1 = first view, t2 = first click
    with ts > t1, t3 = first purchase with ts > t2). Unlike the 2-step
    events_signup_conversion, whose 'after' reduces to the associative
    max(purchase) >= min(signup) trick, the 3-step chain is NOT
    partial-aggregable — a user's step-2 anchor depends on their
    step-1 time — so the correct distributed shape is per-user
    co-location: one hash-bucket groupby carries each user's (ts,
    type) rows for the three step types only, the chain closes
    vectorized inside the bucket, and only (step_idx, n_users)
    partials leave it for the final 3-row fold.

    Scale plan: the shuffle carries 3-type event rows once (filtered
    at the read), bucket count bounds task size, and the reduce is
    constant-size. Returns (step_idx, step, n_users)."""
    from ray.data.aggregate import Sum

    from ..stages.exchange import hash_rows_mod

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("event_type"),
                              value_set=pa.array(_FUNNEL_STEPS)))
        b = b.set_column(b.schema.get_field_index("ts"), "ts",
                         b.column("ts").cast(pa.timestamp("us")))
        ids = hash_rows_mod(b, ["user_id"], num_buckets)
        return b.append_column("bucket", pa.array(ids, type=pa.int32()))

    def chain(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: SQL's GROUP BY keeps the NULL-user group in
        # step 1, while the step-2/3 equality JOINs can never match
        # NULL — so the NULL group is counted once and then dropped
        # from the chain, exactly as the oracle does. merge (not
        # DataFrame.join) sidesteps the pandas empty-left-join quirk
        # that names the result's index and breaks the next groupby.
        g1 = df[df["event_type"] == "view"] \
            .groupby("user_id", dropna=False)["ts"].min()
        n1 = len(g1)
        v = (g1.rename("t1").reset_index()
             .dropna(subset=["user_id"]))
        cl = df[df["event_type"] == "click"][["user_id", "ts"]] \
            .merge(v, on="user_id", how="inner")
        t2 = cl[cl["ts"] > cl["t1"]].groupby("user_id")["ts"].min()
        pu = df[df["event_type"] == "purchase"][["user_id", "ts"]] \
            .merge(t2.rename("t2").reset_index(), on="user_id",
                   how="inner")
        t3 = pu[pu["ts"] > pu["t2"]].groupby("user_id")["ts"].min()
        return pd.DataFrame({
            "step_idx": np.array([1, 2, 3], dtype=np.int64),
            "n_users": np.array([n1, len(t2), len(t3)],
                                dtype=np.int64)})

    counts = (ds.map_batches(prep, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(chain, batch_format="pandas")
              .groupby("step_idx")
              .aggregate(Sum("n_users", alias_name="n_users")))

    def label(b: pa.Table) -> pa.Table:
        idx = b.column("step_idx").to_numpy(zero_copy_only=False)
        steps = np.asarray(_FUNNEL_LABELS, dtype=object)[idx - 1]
        return pa.table({"step_idx": b.column("step_idx"),
                         "step": pa.array(list(steps), type=pa.string()),
                         "n_users": b.column("n_users")})

    return (counts.map_batches(label, batch_format="pyarrow")
            .sort("step_idx"))


SQL_EVENTS_FUNNEL_3STEP = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
         CAST(count(*) AS BIGINT) AS n_users FROM v
  UNION ALL
  SELECT 2, 'view>click', CAST(count(*) AS BIGINT) FROM c
  UNION ALL
  SELECT 3, 'view>click>purchase', CAST(count(*) AS BIGINT) FROM p)
ORDER BY step_idx
"""


# -- per-user modal event type (mode with deterministic tie-break) -----------

def events_user_top_type(sf_dir: str):
    """Each user's most frequent event type; ties break to the
    lexicographically smallest type — the GROUP BY + row_number()=1 mode
    shape.

    Scale plan: per-block partial counts shrink the shuffle to distinct
    (user, type) pairs per block; the per-user argmax is ONE packed-int64
    Max aggregate (count in the high bits, inverse lexicographic type
    rank in the low bits) over the already-reduced counts table — no
    map_groups, no per-group Python. The type vocabulary is a tiny
    broadcast (event taxonomies are dimension-small by construction);
    NULL users are excluded on both sides."""
    from ray.data.aggregate import Max, Sum

    def cnt_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("user_id")))
        t = pa.table({"user_id": b.column("user_id"),
                      "event_type": b.column("event_type"),
                      "one": pa.array(np.ones(len(b), dtype=np.int64))})
        return (pa.TableGroupBy(t, ["user_id", "event_type"])
                .aggregate([("one", "sum")])
                .rename_columns(["user_id", "event_type", "cnt"]))

    counts = (_read(sf_dir, "events", ["user_id", "event_type"])
              .map_batches(cnt_partial, batch_format="pyarrow")
              .groupby(["user_id", "event_type"])
              .aggregate(Sum("cnt", alias_name="cnt")))

    # tiny vocabulary, sorted ascending: rank 0 = lexicographically
    # smallest; inverse rank makes the packed Max prefer IT on count ties.
    # Resolved from a separate single-column scan so the counts pipeline
    # executes exactly once (unique() on `counts` would run it twice).
    types = sorted(_read(sf_dir, "events", ["event_type"])
                   .unique("event_type"))
    rank = {t: i for i, t in enumerate(types)}
    n_types = len(types)
    rank_arr = pa.array([rank[t] for t in types], pa.int64())
    type_arr = pa.array(types, pa.string())

    def pack(b: pa.Table) -> pa.Table:
        idx = pc.index_in(b.column("event_type").combine_chunks(),
                          value_set=type_arr)
        r = rank_arr.take(idx)
        packed = pc.add(
            pc.multiply(b.column("cnt"), pa.scalar(n_types, pa.int64())),
            pc.subtract(pa.scalar(n_types - 1, pa.int64()), r))
        return pa.table({"user_id": b.column("user_id"),
                         "packed": packed})

    def unpack(b: pa.Table) -> pa.Table:
        packed = b.column("packed")
        cnt = pc.divide(packed, pa.scalar(n_types, pa.int64()))
        inv = pc.subtract(packed, pc.multiply(cnt,
                                              pa.scalar(n_types, pa.int64())))
        r = pc.subtract(pa.scalar(n_types - 1, pa.int64()), inv)
        return pa.table({"user_id": b.column("user_id"),
                         "top_type": type_arr.take(r),
                         "cnt": cnt})

    return (counts.map_batches(pack, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(Max("packed", alias_name="packed"))
            .map_batches(unpack, batch_format="pyarrow")
            .sort("user_id"))


SQL_EVENTS_USER_TOP_TYPE = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS cnt
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id, event_type),
r AS (
  SELECT user_id, event_type, cnt,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY cnt DESC, event_type) AS rn
  FROM c)
SELECT user_id, event_type AS top_type, cnt
FROM r WHERE rn = 1 ORDER BY user_id
"""


# -- cohort retention matrix (day granularity) --------------------------------

def events_cohort_retention(sf_dir: str):
    """Classic cohort-retention matrix: users are cohorted by the day of
    their FIRST event; each cell counts how many of a cohort's users were
    active `day_offset` days after their cohort day.

    Scale shape: each block first collapses to its distinct (user, day)
    pairs — per-block dedup shrinks the one real exchange (groupby
    user_id) to ≤ users × active-days rows regardless of event volume.
    Inside each user group, the cohort day is the min and the offsets are
    a vectorized datetime64 diff; each user emits one row per distinct
    active day, so the final groupby input is the same deduped pair count
    and the output is the cohorts × offsets matrix (tiny). NULL users are
    excluded on both engines (the SQL's inner join drops them)."""
    import pandas as pd
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pairs(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("user_id")))
        days = b.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype("datetime64[us]")
        t = pa.table({"user_id": b.column("user_id"),
                      "day": pa.array(days)})
        return t.group_by(["user_id", "day"]).aggregate([])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        days = np.unique(df["day"].to_numpy().astype("datetime64[D]"))
        cohort = days.min()
        return pd.DataFrame({
            "cohort_day": np.full(len(days), cohort.astype("datetime64[us]")),
            "day_offset": (days - cohort).astype(np.int64)})

    return (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(per_user, batch_format="pandas")
            .groupby(["cohort_day", "day_offset"])
            .aggregate(Count(alias_name="n_users"))
            .sort(["cohort_day", "day_offset"]))


SQL_EVENTS_COHORT_RETENTION = """
WITH fd AS (
  SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
pairs AS (
  SELECT DISTINCT e.user_id, fd.cohort_day,
         datediff('day', fd.cohort_day, date_trunc('day', e.ts))
           AS day_offset
  FROM events e JOIN fd ON e.user_id = fd.user_id)
SELECT cohort_day, day_offset, count(*) AS n_users
FROM pairs GROUP BY cohort_day, day_offset
ORDER BY cohort_day, day_offset
"""


# -- time-window self-join: follow-ups after a purchase ------------------------

def events_purchase_followups(sf_dir: str, window_min: int = 10):
    """How many events of each type happen within `window_min` minutes
    AFTER a purchase by the same user (strictly later, inclusive upper
    bound) — the stream-stream interval-join shape, counted over all
    (event, purchase) qualifying pairs.

    Plan: one pass tags the stream (no second read); groupby(user_id)
    co-locates each user's rows; inside a group the purchase timestamps
    sort once and EVERY event counts its qualifying purchases with two
    binary searches (searchsorted difference) — O((e+p) log p) per
    user, never the e×p cross product a naive interval join explodes
    into. Each group folds to ≤ #types partial rows, so the final
    exchange is types-sized."""
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"])
    w = np.timedelta64(int(window_min) * 60, "s").astype("timedelta64[us]")

    def drop_null_users(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(b.column("user_id")))

    def count_group(df: pd.DataFrame) -> pd.DataFrame:
        p_ts = np.sort(
            df.loc[df["event_type"] == "purchase", "ts"].to_numpy())
        if len(p_ts) == 0:
            return pd.DataFrame({"followup_type": pd.Series([], dtype=str),
                                 "n_followups": pd.Series([],
                                                          dtype="int64")})
        t = df["ts"].to_numpy()
        # purchases p with p.ts < t AND t <= p.ts + w  ⟺  p.ts ∈ [t-w, t)
        n = (np.searchsorted(p_ts, t, side="left")
             - np.searchsorted(p_ts, t - w, side="left"))
        out = pd.DataFrame({"followup_type": df["event_type"].to_numpy(),
                            "n": n})
        out = (out.groupby("followup_type", sort=False)["n"].sum()
               .reset_index(name="n_followups"))
        return out[out["n_followups"] > 0]

    return (ds.map_batches(drop_null_users, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(count_group, batch_format="pandas")
            .groupby("followup_type")
            .aggregate(Sum("n_followups", alias_name="n_followups"))
            .sort("followup_type"))


SQL_EVENTS_PURCHASE_FOLLOWUPS = """
SELECT e.event_type AS followup_type, count(*) AS n_followups
FROM events e JOIN events p
  ON e.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND e.ts >  p.ts
 AND e.ts <= p.ts + INTERVAL 10 MINUTE
GROUP BY e.event_type
ORDER BY followup_type
"""


# -- per-user event-type Shannon entropy ---------------------------------------

def events_user_type_entropy(sf_dir: str):
    """Behavioral-diversity feature: Shannon entropy (nats) of each
    user's event-type distribution — H(u) = -Σ_t p_t·ln(p_t),
    p_t = n_{u,t}/n_u. The information-theoretic cousin of
    events_user_top_type (mode) and the standard bot/spam signal
    (near-zero entropy = single-action automation).

    Scale shape: per-block (user, type) count partials close most of
    the volume before ONE (user, type) groupby; the per-user fold then
    co-locates the ≤|types| rows of each user (groupby(user_id)
    .map_groups) and computes the entropy vectorized. The exchange
    carries count rows bounded by users × types, never events. NULL
    users are excluded (matching the oracle's WHERE); the `+ 0.0`
    normalizes IEEE -0.0 (a single-type user's -Σ is negative zero,
    which would hash-differ from the oracle's sign)."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_valid(b.column("user_id")))
        return (pa.TableGroupBy(t, ["user_id", "event_type"])
                .aggregate([([], "count_all")])
                .rename_columns(["user_id", "event_type", "n"]))

    counts = (ev.map_batches(partial, batch_format="pyarrow")
              .groupby(["user_id", "event_type"])
              .aggregate(Sum("n", alias_name="n")))

    def entropy(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy().astype(np.float64)
        total = n.sum()
        p = n / total
        h = float(-(p * np.log(p)).sum() + 0.0)
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "n_events": [int(total)],
            "entropy": [np.floor(h * 1e6 + 0.5) * 1e-6]})

    return (counts.groupby("user_id")
            .map_groups(entropy, batch_format="pandas")
            .sort("user_id"))


SQL_EVENTS_USER_TYPE_ENTROPY = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1, 2),
u AS (SELECT user_id, sum(n) AS total FROM c GROUP BY 1)
SELECT c.user_id,
       CAST(u.total AS BIGINT) AS n_events,
       round(-sum((n / CAST(total AS DOUBLE))
                  * ln(n / CAST(total AS DOUBLE))) + 0, 6) AS entropy
FROM c JOIN u USING (user_id)
GROUP BY c.user_id, u.total
ORDER BY user_id
"""
