"""Rollup / pivot / correlated-scalar-subquery operators.

Three relational operator classes the reference engine has no analogue
for (beyond-reference extension surface, SURVEY.md §2 extension table),
each expressed scale-first:

- **ROLLUP aggregate** (`lineitem_rollup`): the only distributed pass is
  the finest-granularity groupby — every coarser rollup level is derived
  by re-aggregating that already-tiny result (|flags|×|statuses| rows),
  so no extra shuffle touches the base table. At 100 TB the base
  aggregation is the same single exchange as a plain GROUP BY.
- **Pivot** (`events_daily_type_pivot`): wide conditional counts. The
  pivot columns are materialized per batch as 0/1 int64 indicator
  columns and partial-summed per block (one row per day per block), so
  the global groupby shuffles |days|×|blocks| tiny rows — never events.
- **Broadcast scalar subquery** (`customers_above_nation_avg`): the
  classic `x > (SELECT avg(..) ... correlated)` plan — the per-group
  aggregate is computed distributed, collapsed to a small table, and
  broadcast via ray.put; the filter then runs inside map tasks with a
  vectorized index_in probe. No shuffle join of the big side.

Column names match the oracle SQL aliases exactly (the driver's
hash-compare sorts columns by name).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .relational import _broadcast_kv, _make_attach, _read, _round_col


# -- ROLLUP / CUBE over (l_returnflag, l_linestatus) revenue ----------------

def _revenue_fine(sf_dir: str):
    """Shared finest-granularity revenue aggregate for ROLLUP and CUBE:
    per-batch partial combine, then ONE distributed Sum groupby over
    (l_returnflag, l_linestatus). Every coarser grouping set in either
    query is derived from this tiny result, never a second lineitem
    pass."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_extendedprice",
                "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        t = pa.table({"l_returnflag": b.column("l_returnflag"),
                      "l_linestatus": b.column("l_linestatus"),
                      "sum_revenue": rev})
        return (pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"])
                .aggregate([("sum_revenue", "sum")])
                .rename_columns(["l_returnflag", "l_linestatus",
                                 "sum_revenue"]))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("sum_revenue", alias_name="sum_revenue")))


def lineitem_rollup(sf_dir: str):
    """Revenue by ROLLUP(l_returnflag, l_linestatus): finest level plus
    per-flag subtotals plus grand total, NULL-filled like SQL ROLLUP.

    Scale shape: see _revenue_fine — subtotal levels are pure Arrow
    arithmetic on the ≤ dozens-row reduced result."""
    fine = _revenue_fine(sf_dir)

    def add_rollup_levels(b: pa.Table) -> pa.Table:
        # b is the full (tiny) finest-level table: derive the coarser
        # levels from it instead of re-scanning lineitem. Subtotal
        # cells use the 'ALL' sentinel instead of SQL NULL so every
        # downstream consumer (driver hash-compare, parquet sinks with
        # non-null schemas) sorts and types the result uniformly.
        sub = (pa.TableGroupBy(b, "l_returnflag")
               .aggregate([("sum_revenue", "sum")])
               .rename_columns(["l_returnflag", "sum_revenue"]))
        all_s = pa.array(["ALL"] * len(sub), pa.string())
        sub = pa.table({"l_returnflag": sub.column("l_returnflag"),
                        "l_linestatus": all_s,
                        "sum_revenue": sub.column("sum_revenue")})
        total = pc.sum(b.column("sum_revenue"))
        grand = pa.table({"l_returnflag": pa.array(["ALL"], pa.string()),
                          "l_linestatus": pa.array(["ALL"], pa.string()),
                          "sum_revenue": pa.array([total.as_py()],
                                                  pa.float64())})
        out = pa.concat_tables([
            b.cast(grand.schema), sub.cast(grand.schema), grand])
        return _round_col(out, "sum_revenue", 2)

    # the finest result is tiny: one repartition(1) so the rollup
    # derivation sees the whole table in a single batch.
    return (fine.repartition(1)
            .map_batches(add_rollup_levels, batch_format="pyarrow",
                         batch_size=None)
            .sort(["l_returnflag", "l_linestatus"]))


SQL_LINEITEM_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY 1, 2
"""


# -- pivot: per-day event-type counts ---------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_daily_type_pivot(sf_dir: str):
    """Event counts per calendar day pivoted into one column per
    event_type (the fixed vocabulary above; unknown types are ignored,
    matching the FILTER clauses of the oracle).

    Partial pivot inside each batch (indicator columns + per-day arrow
    groupby) means the shuffle carries one row per (day, block)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        day = b.column("ts").cast(pa.timestamp("us")) \
            .to_numpy(zero_copy_only=False).astype("datetime64[D]") \
            .astype("datetime64[us]")
        cols = {"day": pa.array(day)}
        et = b.column("event_type")
        for t in _EVENT_TYPES:
            cols[f"n_{t}"] = pc.cast(pc.equal(et, pa.scalar(t)), pa.int64())
        t = pa.table(cols)
        agg = pa.TableGroupBy(t, "day").aggregate(
            [(f"n_{x}", "sum") for x in _EVENT_TYPES])
        return agg.rename_columns(["day"] + [f"n_{x}" for x in _EVENT_TYPES])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("day")
            .aggregate(*[Sum(f"n_{x}", alias_name=f"n_{x}")
                         for x in _EVENT_TYPES])
            .sort("day"))


SQL_EVENTS_DAILY_TYPE_PIVOT = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
           AS n_click,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
           AS n_error,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           AS n_purchase,
       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
           AS n_signup,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
           AS n_view
FROM events GROUP BY day ORDER BY day
"""


# -- correlated scalar subquery via broadcast agg ---------------------------

def customers_above_nation_avg(sf_dir: str):
    """Customers whose account balance strictly exceeds their nation's
    average balance, annotated with the nation name and that average.

    Plan: distributed per-nation (sum, count) partials → tiny global
    aggregate → ray.put broadcast → vectorized probe+filter inside the
    customer scan. The big table is read exactly once and never
    shuffled."""
    import ray

    cust_cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal"]

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"k": b.column("c_nationkey"),
                      "s": b.column("c_acctbal"),
                      "n": pa.array(np.ones(len(b), dtype=np.int64))})
        return (pa.TableGroupBy(t, "k")
                .aggregate([("s", "sum"), ("n", "sum")])
                .rename_columns(["k", "s", "n"]))

    from ray.data.aggregate import Sum
    avgs = (_read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("k")
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n")))
    parts = [t for t in ray.get(avgs.to_arrow_refs()) if len(t)]
    at = pa.concat_tables(parts)
    avg_ref = ray.put((at.column("k").combine_chunks(),
                       pc.divide(at.column("s"),
                                 pc.cast(at.column("n"), pa.float64()))
                       .combine_chunks()))

    nation = _broadcast_kv(_read(sf_dir, "nation",
                                 ["n_nationkey", "n_name"]),
                           "n_nationkey", "n_name")
    attach_name = _make_attach(nation, "c_nationkey", "n_name")
    attach_avg = _make_attach(avg_ref, "c_nationkey", "nation_avg")

    def filt(b: pa.Table) -> pa.Table:
        b = attach_avg(b)
        b = b.filter(pc.greater(b.column("c_acctbal"),
                                b.column("nation_avg")))
        b = attach_name(b)
        b = _round_col(b, "nation_avg", 2)
        return b.select(["c_custkey", "c_name", "c_acctbal", "n_name",
                         "nation_avg"])

    return (_read(sf_dir, "customer", cust_cols)
            .map_batches(filt, batch_format="pyarrow")
            .sort("c_custkey"))


SQL_CUSTOMERS_ABOVE_NATION_AVG = """
WITH avgs AS (
  SELECT c_nationkey AS k, sum(c_acctbal) / count(*) AS nation_avg
  FROM customer GROUP BY c_nationkey
)
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(nation_avg, 2) AS nation_avg
FROM customer
JOIN avgs ON c_nationkey = k
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > avgs.nation_avg
ORDER BY c_custkey
"""


def lineitem_cube(sf_dir: str):
    """Revenue by CUBE(l_returnflag, l_linestatus): all four grouping
    sets — finest, per-flag, per-status, grand total — with the 'ALL'
    sentinel in collapsed dimensions. Same scale shape as the ROLLUP:
    ONE distributed finest-level groupby (shared _revenue_fine); every
    coarser grouping set is pure Arrow arithmetic on the tiny reduced
    result, never a second pass over lineitem."""
    fine = _revenue_fine(sf_dir)

    def add_cube_levels(b: pa.Table) -> pa.Table:
        def collapse(keep: str, drop: str) -> pa.Table:
            g = (pa.TableGroupBy(b, keep)
                 .aggregate([("sum_revenue", "sum")])
                 .rename_columns([keep, "sum_revenue"]))
            cols = {keep: g.column(keep),
                    drop: pa.array(["ALL"] * len(g), pa.string()),
                    "sum_revenue": g.column("sum_revenue")}
            return pa.table({n: cols[n] for n in
                             ("l_returnflag", "l_linestatus",
                              "sum_revenue")})

        total = pc.sum(b.column("sum_revenue"))
        grand = pa.table({
            "l_returnflag": pa.array(["ALL"], pa.string()),
            "l_linestatus": pa.array(["ALL"], pa.string()),
            "sum_revenue": pa.array([total.as_py()], pa.float64())})
        out = pa.concat_tables([
            b.cast(grand.schema),
            collapse("l_returnflag", "l_linestatus").cast(grand.schema),
            collapse("l_linestatus", "l_returnflag").cast(grand.schema),
            grand])
        return _round_col(out, "sum_revenue", 2)

    return (fine.repartition(1)
            .map_batches(add_cube_levels, batch_format="pyarrow",
                         batch_size=None)
            .sort(["l_returnflag", "l_linestatus"]))


SQL_LINEITEM_CUBE = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""
