"""Multi-way join pipelines over the TPC-H-ish testdata tables.

Two join strategies, each used where its scale shape is right:

- **Shuffle hash join** (`Dataset.join`): for LARGE ⋈ LARGE (lineitem ⋈
  orders) both sides are hash-partitioned on the key — at 100 TB neither
  side fits any single node, so an all-to-all exchange is unavoidable and
  the partition count bounds per-aggregator memory.
- **Broadcast join** (ray.put once + vectorized pc.index_in/take probe in
  every map task): for LARGE ⋈ SMALL (dimension tables — customer,
  supplier, nation, region). Shipping the small side once beats hashing
  the big side across the cluster; see relational._broadcast_kv.

Reference parity: the reference engine exposes only single-stream
conversion joins (see SURVEY.md §2 J1-J7); these pipelines are part of the
beyond-reference relational surface (SURVEY.md §2 extension table) that a
training-data pipeline needs. Column names match the oracle SQL aliases
exactly (driver hash-compare sorts columns by name).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .relational import _broadcast_kv, _make_attach, _read, _round_col


def _ts(s: str):
    return pa.scalar(np.datetime64(s, "us"))


# shared defaults for revenue_by_nation and its Bloom variant — a single
# source of truth so the bitmap's build predicate can never drift from
# the join's (a drifted Bloom under-covers keys and silently DROPS
# matching rows; false positives are safe, false negatives are not)
_RBN_YEAR_LO = "1996-01-01T00:00:00"
_RBN_YEAR_HI = "1997-01-01T00:00:00"


def _orders_in_window(sf_dir: str, lo, hi, columns):
    """Orders scan filtered to o_orderdate ∈ [lo, hi) — the one
    definition of the build-side predicate, used by both the join plan
    and the Bloom bitmap builder."""
    return (_read(sf_dir, "orders", columns + ["o_orderdate"])
            .map_batches(lambda b: b.filter(pc.and_(
                pc.greater_equal(b.column("o_orderdate"), lo),
                pc.less(b.column("o_orderdate"), hi)))
                .drop_columns(["o_orderdate"]),
                batch_format="pyarrow"))


# -- Q5-style: revenue by nation, local suppliers only ----------------------

def revenue_by_nation(sf_dir: str, region: str = "ASIA",
                      year_lo: str = _RBN_YEAR_LO,
                      year_hi: str = _RBN_YEAR_HI,
                      num_partitions: int = 16,
                      _lineitem_prefilter=None):
    """lineitem ⋈ orders (shuffle hash join) ⋈ customer ⋈ supplier ⋈
    nation ⋈ region (broadcast) → revenue per nation where the supplier
    and customer nation match.

    Scale shape: lineitem and orders are the two unbounded tables — they
    meet in a hash-partitioned `Dataset.join` on orderkey (num_partitions
    bounds per-aggregator memory; size ~ rows/num_partitions). The
    dimension chain (customer→nation→region, supplier→nation) is broadcast
    once via ray.put and probed with vectorized pc.index_in inside map
    tasks. Revenue partial-aggregates inside each joined batch before the
    final tiny groupby (25 nations max)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    # dimension broadcasts (small: ≤ a few MB even at TB scale)
    cust = _broadcast_kv(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "c_custkey", "c_nationkey")
    supp = _broadcast_kv(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "s_suppkey", "s_nationkey")

    import ray
    nation = _read(sf_dir, "nation").to_pandas()
    reg = _read(sf_dir, "region").to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    in_region = nation[nation["n_regionkey"].isin(rkeys)]
    nation_ref = ray.put((
        pa.array(in_region["n_nationkey"].to_numpy()),
        pa.array(in_region["n_name"].astype(str).to_numpy())))

    lo, hi = _ts(year_lo), _ts(year_hi)
    orders = _orders_in_window(sf_dir, lo, hi,
                               ["o_orderkey", "o_custkey"])
    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount"])
    if _lineitem_prefilter is not None:
        # semi-join pushdown (e.g. the Bloom bitmap of surviving
        # orderkeys, revenue_by_nation_bloom) shrinks the shuffled side
        lineitem = lineitem.map_batches(_lineitem_prefilter,
                                        batch_format="pyarrow")

    joined = lineitem.join(orders, join_type="inner",
                           num_partitions=num_partitions,
                           on=("l_orderkey",), right_on=("o_orderkey",))

    attach_cnat = _make_attach(cust, "o_custkey", "c_nationkey")
    attach_snat = _make_attach(supp, "l_suppkey", "s_nationkey")

    def finish_batch(b: pa.Table) -> pa.Table:
        b = attach_cnat(b)
        b = attach_snat(b)
        # local-supplier condition + region membership
        keep = pc.and_(pc.equal(b.column("c_nationkey"),
                                b.column("s_nationkey")),
                       pc.is_in(b.column("c_nationkey"),
                                value_set=_nation_keys(nation_ref)))
        b = b.filter(keep)
        rev = pc.multiply(b.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        nk, nn = _nation_arrays(nation_ref)
        names = pc.take(nn, pc.index_in(b.column("c_nationkey"),
                                        value_set=nk))
        t = pa.table({"n_name": names, "revenue": rev})
        # partial combine: one row per nation per batch
        return (pa.TableGroupBy(t, "n_name").aggregate([("revenue", "sum")])
                .rename_columns(["n_name", "revenue"]))

    out = (joined.map_batches(finish_batch, batch_format="pyarrow")
           .groupby("n_name")
           .aggregate(Sum("revenue", alias_name="revenue")))
    return (out.map_batches(lambda b: _round_col(b, "revenue", 2),
                            batch_format="pyarrow")
            .sort("revenue", descending=True))


_NATION_CACHE: dict[str, tuple] = {}


def _nation_arrays(ref):
    """Worker-local memo for the broadcast (keys, names) pair — ray.get is
    zero-copy but per-call overhead adds up across small batches."""
    key = ref.hex()
    if key not in _NATION_CACHE:
        import ray
        while len(_NATION_CACHE) >= 8:
            _NATION_CACHE.pop(next(iter(_NATION_CACHE)))
        _NATION_CACHE[key] = ray.get(ref)
    return _NATION_CACHE[key]


def _nation_keys(ref):
    return _nation_arrays(ref)[0]


SQL_REVENUE_BY_NATION = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem, orders, customer, supplier, nation, region
WHERE l_orderkey = o_orderkey
  AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# -- Q3-style: unshipped orders by revenue ----------------------------------

def order_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                            cutoff: str = "1997-06-01T00:00:00",
                            num_partitions: int = 16):
    """customer (broadcast semi-filter) ⋈ orders ⋈ lineitem (shuffle hash
    join) → top-10 unshipped orders by revenue.

    orders is pre-filtered to the segment's customers with a broadcast
    membership probe BEFORE entering the shuffle join — the join then
    exchanges only qualifying orders (a semi-join pushdown; at 100 TB this
    cuts the shuffled volume by ~the segment selectivity)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    seg_keys = cust.filter(expr=f"c_mktsegment == '{segment}'") \
                   .select_columns(["c_custkey"]).to_pandas()
    seg_ref = ray.put(pa.array(seg_keys["c_custkey"].to_numpy()))

    def seg_filter(b: pa.Table) -> pa.Table:
        vs = _seg_cache(seg_ref)
        return b.filter(pc.is_in(b.column("o_custkey"), value_set=vs))

    cut = _ts(cutoff)
    orders = (_read(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_orderdate"])
              .map_batches(lambda b: seg_filter(
                  b.filter(pc.less(b.column("o_orderdate"), cut))),
                  batch_format="pyarrow"))
    lineitem = (_read(sf_dir, "lineitem",
                      ["l_orderkey", "l_extendedprice", "l_discount",
                       "l_shipdate"])
                .map_batches(lambda b: b.filter(
                    pc.greater(b.column("l_shipdate"), cut)),
                    batch_format="pyarrow"))

    joined = lineitem.join(orders, join_type="inner",
                           num_partitions=num_partitions,
                           on=("l_orderkey",), right_on=("o_orderkey",))

    def derive(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        t = pa.table({"l_orderkey": b.column("l_orderkey"),
                      "o_orderdate": b.column("o_orderdate"),
                      "revenue": rev})
        return (pa.TableGroupBy(t, ["l_orderkey", "o_orderdate"])
                .aggregate([("revenue", "sum")])
                .rename_columns(["l_orderkey", "o_orderdate", "revenue"]))

    out = (joined.map_batches(derive, batch_format="pyarrow")
           .groupby(["l_orderkey", "o_orderdate"])
           .aggregate(Sum("revenue", alias_name="revenue")))
    return (out.map_batches(lambda b: _round_col(b, "revenue", 2),
                            batch_format="pyarrow")
            .sort(["revenue", "l_orderkey"], descending=[True, False])
            .limit(10))


_SEG_CACHE: dict[str, pa.Array] = {}


def _seg_cache(ref):
    key = ref.hex()
    if key not in _SEG_CACHE:
        import ray
        while len(_SEG_CACHE) >= 8:
            _SEG_CACHE.pop(next(iter(_SEG_CACHE)))
        _SEG_CACHE[key] = ray.get(ref)
    return _SEG_CACHE[key]


# -- anti join: customers with no large orders -------------------------------

def customers_without_large_orders(sf_dir: str, threshold: float = 450000.0):
    """Broadcast anti-join: customers that never placed an order above
    `threshold`.

    The distinct qualifying-custkey set is bounded by the customer table
    (the small side by definition), so each orders block filters to
    qualifying orders and pre-dedups its keys (per-batch unique → tiny
    blocks); the global distinct set is collected once and broadcast;
    customer blocks then drop members with one vectorized inverted is_in
    probe. No shuffle of either table. If the key set ever outgrew a
    broadcast, the fallback is the shuffle shape: groupby(custkey) over
    the tagged union, keep groups with no order rows."""
    import ray
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    thr = pa.scalar(float(threshold))
    batch_keys = orders.map_batches(
        lambda b: pa.table({"o_custkey": pc.unique(
            b.filter(pc.greater(b.column("o_totalprice"), thr))
            .column("o_custkey"))}),
        batch_format="pyarrow")
    keys = pc.unique(pa.chunked_array(
        [pa.array(batch_keys.to_pandas()["o_custkey"].to_numpy())]))
    keys_ref = ray.put(keys)

    def drop_members(b: pa.Table) -> pa.Table:
        vs = _seg_cache(keys_ref)
        return b.filter(pc.invert(pc.is_in(b.column("c_custkey"),
                                           value_set=vs)))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    return (cust.map_batches(drop_members, batch_format="pyarrow")
            .sort("c_custkey"))


SQL_CUSTOMERS_WITHOUT_LARGE_ORDERS = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
ORDER BY c_custkey
"""


SQL_ORDER_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-06-01'
  AND l_shipdate  > TIMESTAMP '1997-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# -- Bloom-filter semi-join pushdown -----------------------------------------

# Double hashing (Kirsch–Mitzenmacher): k positions from two splitmix64
# draws. k=7, 10 bits/key → ~1% false positives; false positives only
# cost shuffle bytes — the exact hash join after the filter removes them,
# so the result is identical to the unfiltered plan.
_BLOOM_K = 7
_BLOOM_SALT = np.uint64(0x9E3779B97F4A7C15)


def _bloom_positions(u: np.ndarray, m_bits: int):
    from .sketches import _splitmix64
    h1 = _splitmix64(u)
    h2 = _splitmix64(u ^ _BLOOM_SALT) | np.uint64(1)
    for i in range(_BLOOM_K):
        yield (h1 + np.uint64(i) * h2) % np.uint64(m_bits)


def _bloom_words(keys: np.ndarray, m_bits: int) -> np.ndarray:
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    u = keys.astype(np.uint64)
    for pos in _bloom_positions(u, m_bits):
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return words


def _bloom_contains(words: np.ndarray, keys: np.ndarray,
                    m_bits: int) -> np.ndarray:
    u = keys.astype(np.uint64)
    ok = np.ones(len(u), dtype=bool)
    for pos in _bloom_positions(u, m_bits):
        bit = (words[(pos >> np.uint64(6)).astype(np.int64)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        ok &= bit.astype(bool)
    return ok


def _dataset_bloom(ds, key_col: str, m_bits: int):
    """OR-merge per-batch Bloom partials into one broadcast bitmap.
    Each batch contributes one constant-size row (m_bits/8 bytes), so
    the merge shuffles kilobytes however large the build side is — the
    probabilistic stand-in for an exact key broadcast when the key set
    itself no longer fits a worker (the 100-TB regime)."""
    import pandas as pd
    import ray

    def partial(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_numpy(zero_copy_only=False)
        return pa.table({
            "g": pa.array([0]),
            "words": pa.array([_bloom_words(keys, m_bits).tobytes()],
                              type=pa.binary())})

    def merge(df: "pd.DataFrame") -> "pd.DataFrame":
        w = np.zeros(m_bits // 64, dtype=np.uint64)
        for blob in df["words"]:
            w |= np.frombuffer(blob, dtype=np.uint64)
        return pd.DataFrame({"g": [0], "words": [w.tobytes()]})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("g").map_groups(merge, batch_format="pandas")
            .take_all())  # exactly one constant-size row
    return ray.put(np.frombuffer(rows[0]["words"], dtype=np.uint64).copy())


def revenue_by_nation_bloom(sf_dir: str, m_bits: int = 1 << 20, **kw):
    """revenue_by_nation with a Bloom semi-join pushdown: the date
    filter survives only ~1/7 of orders, so a Bloom bitmap of the
    surviving orderkeys (built distributed, OR-merged, broadcast once)
    drops most lineitem rows BEFORE the hash-partition exchange. The
    build side streams twice (bloom pass + join pass) — cheaper than
    shuffling the unfiltered big side; the exact join then removes the
    ~1% false positives, so the result is bit-identical to
    revenue_by_nation (same SQL oracle)."""
    import ray

    lo = _ts(kw.get("year_lo", _RBN_YEAR_LO))
    hi = _ts(kw.get("year_hi", _RBN_YEAR_HI))
    orders_keys = _orders_in_window(sf_dir, lo, hi, ["o_orderkey"])
    words_ref = _dataset_bloom(orders_keys, "o_orderkey", m_bits)

    def probe(b: pa.Table) -> pa.Table:
        w = ray.get(words_ref)
        keys = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(_bloom_contains(w, keys, m_bits)))

    return revenue_by_nation(sf_dir, _lineitem_prefilter=probe, **kw)


# -- Q7-style: shipping volume between a nation pair -------------------------

def nation_pair_volume(sf_dir: str, nation_a: str = "NATION_1",
                       nation_b: str = "NATION_2",
                       year_lo: str = "1996-01-01T00:00:00",
                       year_hi: str = "1998-01-01T00:00:00",
                       num_partitions: int = 16):
    """supplier-nation ↔ customer-nation shipping volume by year (the
    TPC-H Q7 shape): lineitem ⋈ orders meet in the hash-partitioned
    shuffle join; BOTH sides are semi-filtered to the two nations BEFORE
    the exchange via broadcast dimension probes (supplier→nation on the
    lineitem side, customer→nation on the orders side), so the shuffle
    carries only the ~(2/|nations|)² qualifying slice of each table.
    Volume partial-aggregates per (supp_nation, cust_nation, year)
    inside each joined batch; the final groupby is pair×years-sized."""
    import ray
    from ray.data.aggregate import Sum

    nation = _read(sf_dir, "nation").to_pandas()
    keys = {n: int(nation.loc[nation["n_name"] == n,
                              "n_nationkey"].iloc[0])
            for n in (nation_a, nation_b)}
    key_a, key_b = keys[nation_a], keys[nation_b]
    name_of = {key_a: nation_a, key_b: nation_b}

    supp = _broadcast_kv(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "s_suppkey", "s_nationkey")
    cust = _broadcast_kv(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "c_custkey", "c_nationkey")
    attach_snat = _make_attach(supp, "l_suppkey", "s_nationkey")
    attach_cnat = _make_attach(cust, "o_custkey", "c_nationkey")
    pair = pa.array([key_a, key_b])

    lo, hi = _ts(year_lo), _ts(year_hi)

    def line_side(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                             pc.less(b.column("l_shipdate"), hi)))
        b = attach_snat(b)
        return (b.filter(pc.is_in(b.column("s_nationkey"), value_set=pair))
                .drop_columns(["l_suppkey"]))

    def orders_side(b: pa.Table) -> pa.Table:
        b = attach_cnat(b)
        return (b.filter(pc.is_in(b.column("c_nationkey"), value_set=pair))
                .drop_columns(["o_custkey"]))

    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount", "l_shipdate"]) \
        .map_batches(line_side, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .map_batches(orders_side, batch_format="pyarrow")

    joined = lineitem.join(orders, join_type="inner",
                           num_partitions=num_partitions,
                           on=("l_orderkey",), right_on=("o_orderkey",))

    def finish_batch(b: pa.Table) -> pa.Table:
        s_n = b.column("s_nationkey")
        c_n = b.column("c_nationkey")
        # the CROSS pair only (a→b or b→a), never domestic
        b = b.filter(pc.invert(pc.equal(s_n, c_n)))
        if b.num_rows == 0:
            return pa.table({
                "supp_nation": pa.array([], type=pa.string()),
                "cust_nation": pa.array([], type=pa.string()),
                "l_year": pa.array([], type=pa.int64()),
                "volume": pa.array([], type=pa.float64())})
        vol = pc.multiply(b.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      b.column("l_discount")))
        names = pa.array([name_of[key_a], name_of[key_b]])
        s_names = pc.take(names, pc.index_in(b.column("s_nationkey"),
                                             value_set=pair))
        c_names = pc.take(names, pc.index_in(b.column("c_nationkey"),
                                             value_set=pair))
        t = pa.table({
            "supp_nation": s_names,
            "cust_nation": c_names,
            "l_year": pc.year(b.column("l_shipdate")).cast(pa.int64()),
            "volume": vol})
        return (pa.TableGroupBy(t, ["supp_nation", "cust_nation",
                                    "l_year"])
                .aggregate([("volume", "sum")])
                .rename_columns(["supp_nation", "cust_nation", "l_year",
                                 "volume"]))

    out = (joined.map_batches(finish_batch, batch_format="pyarrow")
           .groupby(["supp_nation", "cust_nation", "l_year"])
           .aggregate(Sum("volume", alias_name="volume")))
    return (out.map_batches(lambda b: _round_col(b, "volume", 2),
                            batch_format="pyarrow")
            .sort(["supp_nation", "cust_nation", "l_year"]))


SQL_NATION_PAIR_VOLUME = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume
FROM lineitem, orders, supplier, customer, nation n1, nation n2
WHERE l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND o_custkey = c_custkey
  AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# -- Q13 shape: per-customer order-count distribution ------------------------

def customers_order_count_histogram(sf_dir: str):
    """Distribution of per-customer order counts INCLUDING customers
    with zero orders (the TPC-H Q13 left-outer-join shape).

    Scale plan — the left outer join is ALGEBRAICALLY ELIMINATED: only
    orders is shuffled, and only as (custkey, partial_count) rows.
      1. per-batch partial count per o_custkey → groupby Sum — one
         exchange carrying ≤ one row per (custkey, block);
      2. per-batch histogram of the counts → tiny groupby (bounded by
         max orders per customer, dozens of rows);
      3. the zero bucket is derived, not joined: customers with zero
         orders = count(customer) − Σ histogram (every customer WITH
         orders appears in exactly one count row). At 100 TB this
         replaces a customer ⋈ orders outer shuffle with a cheap count
         aggregate over the customer table.
    Returns a pyarrow Table (the histogram is inherently tiny)."""
    import ray
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def partial_counts(b: pa.Table) -> pa.Table:
        k, n = np.unique(
            b.column("o_custkey").to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"o_custkey": pa.array(k),
                         "c_count": pa.array(n.astype(np.int64))})

    per_cust = (orders.map_batches(partial_counts, batch_format="pyarrow")
                .groupby("o_custkey")
                .aggregate(Sum("c_count", alias_name="c_count")))

    def partial_hist(b: pa.Table) -> pa.Table:
        v, n = np.unique(
            b.column("c_count").to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"c_count": pa.array(v.astype(np.int64)),
                         "n_custs": pa.array(n.astype(np.int64))})

    hist_parts = [t for t in ray.get(
        per_cust.map_batches(partial_hist, batch_format="pyarrow")
        .groupby("c_count").aggregate(Sum("n_custs", alias_name="n_custs"))
        .to_arrow_refs()) if len(t)]
    hist = pa.concat_tables(hist_parts) if hist_parts else pa.table(
        {"c_count": pa.array([], pa.int64()),
         "n_custs": pa.array([], pa.int64())})

    n_customers = _read(sf_dir, "customer", ["c_custkey"]).count()
    n_with_orders = int(pc.sum(hist.column("n_custs")).as_py() or 0)
    n_zero = n_customers - n_with_orders
    out = hist.cast(pa.schema([("c_count", pa.int64()),
                               ("n_custs", pa.int64())]))
    if n_zero > 0:  # emit the 0 bucket only when it exists (SQL parity)
        out = pa.concat_tables([out, pa.table(
            {"c_count": pa.array([0], pa.int64()),
             "n_custs": pa.array([n_zero], pa.int64())})])
    order = pc.sort_indices(out, sort_keys=[("n_custs", "descending"),
                                            ("c_count", "descending")])
    return out.take(order)


SQL_CUSTOMERS_ORDER_COUNT_HISTOGRAM = """
SELECT c_count, CAST(count(*) AS BIGINT) AS n_custs
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
ORDER BY n_custs DESC, c_count DESC
"""


# -- Q18 shape: large-quantity orders (HAVING semi-join) ----------------------

def top_large_quantity_orders(sf_dir: str, qty_threshold: float = 300.0,
                              k: int = 100):
    """Orders whose lineitems sum to more than `qty_threshold` units,
    with customer name, largest totalprice first — the TPC-H Q18
    GROUP-BY-HAVING-IN shape.

    Scale plan: the only all-to-all is the per-orderkey quantity rollup,
    and it ships per-batch PARTIALS (one row per orderkey per block, via
    pa.TableGroupBy) rather than raw lineitems. The HAVING filter makes
    the surviving key set tiny BY CONSTRUCTION (p99.9 of per-order
    quantity sits well under the threshold), so the orders side is
    semi-joined by broadcast is_in — no second shuffle — and customer
    names attach via the standard broadcast probe. The final sort runs
    on the filtered sliver only."""
    import ray
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        return (pa.TableGroupBy(b, ["l_orderkey"])
                .aggregate([("l_quantity", "sum")])
                .rename_columns(["l_orderkey", "total_qty"]))

    per_order = (li.map_batches(partial, batch_format="pyarrow")
                 .groupby("l_orderkey")
                 .aggregate(Sum("total_qty", alias_name="total_qty"))
                 .map_batches(lambda b: b.filter(pc.greater(
                     b.column("total_qty"),
                     pa.scalar(float(qty_threshold)))),
                     batch_format="pyarrow"))
    parts = [t for t in ray.get(per_order.to_arrow_refs()) if len(t)]
    if not parts:
        # no order clears the threshold: skip the orders/customer scan
        # entirely and return a typed empty result (sort/limit over
        # all-empty blocks would otherwise lose the schema)
        return ray.data.from_arrow(pa.table(
            {"c_name": pa.array([], pa.string()),
             "o_custkey": pa.array([], pa.int64()),
             "o_orderkey": pa.array([], pa.int64()),
             "o_orderdate": pa.array([], pa.timestamp("us")),
             "o_totalprice": pa.array([], pa.float64()),
             "total_qty": pa.array([], pa.float64())}))
    surv = pa.concat_tables(parts)
    qty_ref = ray.put((surv.column("l_orderkey").combine_chunks(),
                       surv.column("total_qty").combine_chunks()))

    cust = _broadcast_kv(_read(sf_dir, "customer", ["c_custkey", "c_name"]),
                         "c_custkey", "c_name")
    attach_qty = _make_attach(qty_ref, "o_orderkey", "total_qty")
    attach_name = _make_attach(cust, "o_custkey", "c_name")

    def pick(b: pa.Table) -> pa.Table:
        keys, _ = _seg_cache(qty_ref)
        b = b.filter(pc.is_in(b.column("o_orderkey"), value_set=keys))
        return attach_name(attach_qty(b))

    out = (_read(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])
           .map_batches(pick, batch_format="pyarrow")
           .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
           .limit(k))
    return out.select_columns(["c_name", "o_custkey", "o_orderkey",
                               "o_orderdate", "o_totalprice", "total_qty"])


SQL_TOP_LARGE_QUANTITY_ORDERS = """
SELECT c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300.0
) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# -- Q22 shape: churned high-balance customers (hash anti-join) ---------------

def rich_churned_by_segment(sf_dir: str, cutoff: str = "2000-01-01",
                            num_partitions: int = 16):
    """Per market segment: customers whose balance exceeds the global
    average but who placed NO order since `cutoff` — the TPC-H Q22
    scalar-subquery + NOT-IN shape, churn-analysis flavored.

    Scale plan: unlike customers_without_large_orders (broadcast
    anti-join, valid when the qualifying key set is small), here the
    recently-active customer set is a large fraction of all customers,
    so broadcasting it would ship ~the customer table to every task.
    Instead both sides meet in a hash-partitioned LEFT OUTER
    `Dataset.join` on custkey and the anti-join is `filter(marker is
    null)` — the 100-TB-safe LARGE ⋈ LARGE anti form. The active set is
    pre-deduped per batch, so the shuffle carries ≤ one row per
    (custkey, block). The scalar subquery (global avg balance) is one
    streaming aggregate, never a join."""
    from ray.data.aggregate import Count, Mean, Sum

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_acctbal", "c_mktsegment"])
    avg_bal = cust.aggregate(Mean("c_acctbal"))["mean(c_acctbal)"]

    # the repartition ALSO merges away zero-column empty blocks (block
    # splitting emits them on small inputs), which break Dataset.join —
    # same pitfall as pipelines/graph.py:56, here on the LEFT side
    rich = cust.map_batches(
        lambda b: b.filter(pc.greater(b.column("c_acctbal"),
                                      pa.scalar(float(avg_bal)))),
        batch_format="pyarrow").repartition(num_partitions)

    cut = _ts(cutoff)

    def active_partial(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.greater_equal(b.column("o_orderdate"), cut))
        return pa.table({"o_custkey":
                         pc.unique(keep.column("o_custkey"))})

    # dedup to one row per active custkey; repartition merges away the
    # aggregate's empty zero-column blocks, which break Dataset.join
    # (same pitfall as pipelines/graph.py:56)
    active = (_read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
              .map_batches(active_partial, batch_format="pyarrow")
              .groupby("o_custkey").aggregate(Count(alias_name="marker"))
              .repartition(num_partitions))

    joined = rich.join(active, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=("c_custkey",), right_on=("o_custkey",))

    def churned_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_null(b.column("marker")))
        t = pa.table({"c_mktsegment": b.column("c_mktsegment"),
                      "c_acctbal": b.column("c_acctbal"),
                      "one": pa.array(np.ones(len(b), dtype=np.int64))})
        return (pa.TableGroupBy(t, ["c_mktsegment"])
                .aggregate([("one", "sum"), ("c_acctbal", "sum")])
                .rename_columns(["c_mktsegment", "n_custs", "total_bal"]))

    out = (joined.map_batches(churned_partial, batch_format="pyarrow")
           .groupby("c_mktsegment")
           .aggregate(Sum("n_custs", alias_name="n_custs"),
                      Sum("total_bal", alias_name="total_bal")))
    return (out.map_batches(lambda b: _round_col(b, "total_bal", 2),
                            batch_format="pyarrow")
            .sort("c_mktsegment"))


SQL_RICH_CHURNED_BY_SEGMENT = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_custs,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
  AND c_custkey NOT IN (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# -- Q4 shape: EXISTS decorrelated to an associative aggregate ----------------

def late_orders_by_priority(sf_dir: str, late_days: int = 200,
                            num_partitions: int = 16):
    """Orders per priority having at least one lineitem shipped more
    than `late_days` after the order date — the TPC-H Q4
    correlated-EXISTS shape.

    Scale plan: the EXISTS is DECORRELATED before any join —
    `EXISTS(l_shipdate > o_orderdate + d)` ⇔ `max(l_shipdate) >
    o_orderdate + d`, and max is associative, so lineitem folds to one
    (orderkey, max_ship) row per block locally, then one groupby. The
    join with orders is then hash-partitioned 1-row-per-key ⋈ orders
    (Dataset.join), and the verdict is a vectorized timestamp compare +
    per-batch priority count partials → a ≤5-row final groupby. No task
    ever sees a whole order's lineitem list."""
    from ray.data.aggregate import Max, Sum

    def max_partial(b: pa.Table) -> pa.Table:
        return (pa.TableGroupBy(b, ["l_orderkey"])
                .aggregate([("l_shipdate", "max")])
                .rename_columns(["l_orderkey", "max_ship"]))

    per_order = (_read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
                 .map_batches(max_partial, batch_format="pyarrow")
                 .groupby("l_orderkey")
                 .aggregate(Max("max_ship", alias_name="max_ship"))
                 .repartition(num_partitions))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    joined = orders.join(per_order, join_type="inner",
                         num_partitions=num_partitions,
                         on=("o_orderkey",), right_on=("l_orderkey",))

    lag = pa.scalar(np.timedelta64(int(late_days), "D")
                    .astype("timedelta64[us]"))

    def late_partial(b: pa.Table) -> pa.Table:
        late = b.filter(pc.greater(
            b.column("max_ship"),
            pc.add(b.column("o_orderdate"), lag)))
        t = pa.table({"o_orderpriority": late.column("o_orderpriority"),
                      "one": pa.array(np.ones(len(late), dtype=np.int64))})
        return (pa.TableGroupBy(t, ["o_orderpriority"])
                .aggregate([("one", "sum")])
                .rename_columns(["o_orderpriority", "n_late"]))

    return (joined.map_batches(late_partial, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(Sum("n_late", alias_name="n_late"))
            .sort("o_orderpriority"))


SQL_LATE_ORDERS_BY_PRIORITY = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late
FROM orders o
JOIN (SELECT l_orderkey, max(l_shipdate) AS max_ship
      FROM lineitem GROUP BY l_orderkey) l
  ON o.o_orderkey = l.l_orderkey
WHERE max_ship > o_orderdate + INTERVAL 200 DAY
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# -- Q14 shape: promo revenue share (conditional-aggregate ratio) ------------

def promo_revenue_share(sf_dir: str, promo_type: str = "PROMO",
                        ship_lo: str = "1996-01-01T00:00:00",
                        ship_hi: str = "1996-04-01T00:00:00"):
    """Share of window revenue coming from promo-typed parts — the
    TPC-H Q14 CASE-WHEN-ratio shape.

    Scale plan: part is the dimension side, broadcast ONCE as a
    partkey→p_type probe (ray.put, zero-copy read in every task); the
    lineitem scan folds each block to a single (promo_rev, total_rev)
    partial row, so the only exchange is a ≤#blocks-row aggregate. The
    ratio is computed on the driver from two scalars. No shuffle of
    lineitem ever happens."""
    from ray.data.aggregate import Sum

    ptype = _broadcast_kv(_read(sf_dir, "part", ["p_partkey", "p_type"]),
                          "p_partkey", "p_type")
    attach_type = _make_attach(ptype, "l_partkey", "p_type")
    lo, hi = _ts(ship_lo), _ts(ship_hi)

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                             pc.less(b.column("l_shipdate"), hi)))
        b = attach_type(b)
        # inner-join semantics: drop lineitems whose partkey is absent
        b = b.filter(pc.is_valid(b.column("p_type")))
        rev = pc.multiply(b.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      b.column("l_discount")))
        is_promo = pc.equal(b.column("p_type"), pa.scalar(promo_type))
        promo = pc.sum(pc.if_else(is_promo, rev, pa.scalar(0.0)))
        total = pc.sum(rev)
        return pa.table({
            "promo": pa.array([promo.as_py() or 0.0], pa.float64()),
            "total": pa.array([total.as_py() or 0.0], pa.float64())})

    agg = (_read(sf_dir, "lineitem",
                 ["l_partkey", "l_extendedprice", "l_discount",
                  "l_shipdate"])
           .map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("promo", alias_name="promo"),
                      Sum("total", alias_name="total")))
    pct = 100.0 * float(agg["promo"]) / float(agg["total"])
    return pa.table({"promo_revenue_pct":
                     pa.array([round(pct, 4)], pa.float64())})


SQL_PROMO_REVENUE_SHARE = """
SELECT ROUND(100.0 * sum(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


# -- Q15 shape: top revenue supplier (global-max semi-filter) -----------------

def top_revenue_suppliers(sf_dir: str,
                          ship_lo: str = "1996-01-01T00:00:00",
                          ship_hi: str = "1996-07-01T00:00:00"):
    """Supplier(s) with the maximum window revenue — the TPC-H Q15
    view + scalar-max shape (ties all surface, like the SQL).

    Scale plan: lineitem folds per block to (suppkey, revenue) partials
    before the only exchange, a supplier-cardinality groupby (dimension
    -sized, tiny next to lineitem). Revenue is rounded to 2dp BEFORE the
    max compare on both engines so summation order can't flip the
    argmax. The global max is one scalar aggregate; the winner filter
    and s_name attach run as broadcast probes."""
    from ray.data.aggregate import Max, Sum

    lo, hi = _ts(ship_lo), _ts(ship_hi)

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                             pc.less(b.column("l_shipdate"), hi)))
        t = pa.table({
            "l_suppkey": b.column("l_suppkey"),
            "rev": pc.multiply(b.column("l_extendedprice"),
                               pc.subtract(pa.scalar(1.0),
                                           b.column("l_discount")))})
        return (pa.TableGroupBy(t, ["l_suppkey"])
                .aggregate([("rev", "sum")])
                .rename_columns(["l_suppkey", "total_revenue"]))

    rev = (_read(sf_dir, "lineitem",
                 ["l_suppkey", "l_extendedprice", "l_discount",
                  "l_shipdate"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("l_suppkey")
           .aggregate(Sum("total_revenue", alias_name="total_revenue"))
           .map_batches(lambda b: _round_col(b, "total_revenue", 2),
                        batch_format="pyarrow"))

    best = float(rev.aggregate(Max("total_revenue"))["max(total_revenue)"])
    sname = _broadcast_kv(_read(sf_dir, "supplier",
                                ["s_suppkey", "s_name"]),
                          "s_suppkey", "s_name")
    attach_name = _make_attach(sname, "l_suppkey", "s_name")

    def winners(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("total_revenue"),
                              pa.scalar(best)))
        b = attach_name(b)
        return pa.table({"s_suppkey": b.column("l_suppkey"),
                         "s_name": b.column("s_name"),
                         "total_revenue": b.column("total_revenue")})

    return (rev.map_batches(winners, batch_format="pyarrow")
            .sort("s_suppkey"))


SQL_TOP_REVENUE_SUPPLIERS = """
WITH rev AS (
  SELECT l_suppkey,
         ROUND(sum(l_extendedprice * (1 - l_discount)), 2)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-07-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# -- Q17 shape: small-quantity revenue (per-key scalar subquery) --------------

def small_quantity_revenue(sf_dir: str, brand: str = "Brand#13",
                           qty_frac: float = 0.2):
    """Weekly-averaged revenue that would be lost by dropping orders of
    less than `qty_frac` × the part's average quantity, for one brand —
    the TPC-H Q17 correlated-scalar-subquery shape, decorrelated.

    Scale plan: the correlated `avg(l_quantity) WHERE l_partkey = p`
    decorrelates into one per-partkey (sum, count) rollup. The brand
    filter makes the part set dimension-small BY CONSTRUCTION, so the
    per-part thresholds broadcast via ray.put and the second lineitem
    pass is a pure map: probe threshold, compare, fold to one partial
    per block. Both lineitem passes are brand-prefiltered by the same
    broadcast key set — neither ever shuffles."""
    import ray
    from ray.data.aggregate import Sum

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    bkeys = pa.array(
        sorted(part.loc[part["p_brand"] == brand, "p_partkey"]),
        pa.int64())
    bkeys_ref = ray.put(bkeys)

    def qty_partial(b: pa.Table) -> pa.Table:
        keys = ray.get(bkeys_ref)
        b = b.filter(pc.is_in(b.column("l_partkey"), value_set=keys))
        t = pa.table({"l_partkey": b.column("l_partkey"),
                      "qty": b.column("l_quantity"),
                      "one": pa.array(np.ones(len(b), dtype=np.int64))})
        return (pa.TableGroupBy(t, ["l_partkey"])
                .aggregate([("qty", "sum"), ("one", "sum")])
                .rename_columns(["l_partkey", "sum_qty", "n"]))

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    per_part = (_read(sf_dir, "lineitem", li_cols)
                .map_batches(qty_partial, batch_format="pyarrow")
                .groupby("l_partkey")
                .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                           Sum("n", alias_name="n")))
    pp = pa.concat_tables(
        [t for t in ray.get(per_part.to_arrow_refs()) if len(t)])
    thr = pc.multiply(pc.divide(pp.column("sum_qty").cast(pa.float64()),
                                pp.column("n").cast(pa.float64())),
                      pa.scalar(float(qty_frac)))
    thr_ref = ray.put((pp.column("l_partkey").combine_chunks(),
                       thr.combine_chunks()))

    def loss_partial(b: pa.Table) -> pa.Table:
        keys, vals = ray.get(thr_ref)
        col = b.column("l_partkey").combine_chunks()
        if col.type != keys.type:
            col = col.cast(keys.type)
        idx = pc.index_in(col, value_set=keys)
        limit = vals.take(idx)
        keep = pc.and_(pc.is_valid(limit),
                       pc.less(b.column("l_quantity").cast(pa.float64()),
                               limit))
        s = pc.sum(pc.if_else(keep, b.column("l_extendedprice"),
                              pa.scalar(0.0)))
        return pa.table({"loss":
                         pa.array([s.as_py() or 0.0], pa.float64())})

    agg = (_read(sf_dir, "lineitem", li_cols)
           .map_batches(loss_partial, batch_format="pyarrow")
           .aggregate(Sum("loss", alias_name="loss")))
    return pa.table({"avg_yearly": pa.array(
        [round(float(agg["loss"]) / 7.0, 2)], pa.float64())})


SQL_SMALL_QUANTITY_REVENUE = """
SELECT ROUND(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2
                    WHERE l2.l_partkey = part.p_partkey)
"""


# -- Q10-style: returned-item revenue, top customers --------------------------

_RRT_LO, _RRT_HI = "1996-01-01T00:00:00", "1996-07-01T00:00:00"


def returned_revenue_topk(sf_dir: str, flag: str = "A",
                          lo: str = _RRT_LO, hi: str = _RRT_HI,
                          k: int = 20, num_partitions: int = 16):
    """Top-k customers by revenue from RETURNED items in a date window
    (TPC-H Q10 shape): lineitem(returnflag) ⋈ orders(window) shuffle
    hash join on orderkey; customer→nationkey and nation→name broadcast.

    Scale shape: both prefilters land BEFORE the join (the returned
    flag on the lineitem scan, the order window on the orders scan), so
    the hash exchange carries surviving rows only; revenue partials
    combine per (custkey) inside each joined batch; the final groupby
    is bounded by |customers|, and the name attach runs on its tiny
    output. Ranking uses the ROUNDED revenue with custkey tiebreak."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    cust = _broadcast_kv(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "c_custkey", "c_nationkey")
    nation = _read(sf_dir, "nation").to_pandas()
    nation_ref = ray.put((
        pa.array(nation["n_nationkey"].to_numpy()),
        pa.array(nation["n_name"].astype(str).to_numpy())))

    orders = _orders_in_window(sf_dir, _ts(lo), _ts(hi),
                               ["o_orderkey", "o_custkey"])

    def returned_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b.column("l_returnflag"), flag)) \
            .drop_columns(["l_returnflag"])

    lineitem = (_read(sf_dir, "lineitem",
                      ["l_orderkey", "l_extendedprice", "l_discount",
                       "l_returnflag"])
                .map_batches(returned_only, batch_format="pyarrow"))

    joined = lineitem.join(orders, join_type="inner",
                           num_partitions=num_partitions,
                           on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      b.column("l_discount")))
        t = pa.table({"c_custkey": b.column("o_custkey"),
                      "revenue": rev})
        return (pa.TableGroupBy(t, "c_custkey")
                .aggregate([("revenue", "sum")])
                .rename_columns(["c_custkey", "revenue"]))

    attach_nat = _make_attach(cust, "c_custkey", "c_nationkey")

    def finish(b: pa.Table) -> pa.Table:
        b = _round_col(b, "revenue", 2)
        b = attach_nat(b)
        nk, nn = _nation_arrays(nation_ref)
        names = pc.take(nn, pc.index_in(
            b.column("c_nationkey").combine_chunks().cast(nk.type),
            value_set=nk))
        return pa.table({"c_custkey": b.column("c_custkey"),
                         "n_name": names,
                         "revenue": b.column("revenue")})

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby("c_custkey")
            .aggregate(Sum("revenue", alias_name="revenue"))
            .map_batches(finish, batch_format="pyarrow")
            .sort(["revenue", "c_custkey"], descending=[True, False])
            .limit(k))


SQL_RETURNED_REVENUE_TOPK = """
SELECT c_custkey, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem, orders, customer, nation
WHERE l_orderkey = o_orderkey
  AND o_custkey = c_custkey
  AND c_nationkey = n_nationkey
  AND l_returnflag = 'A'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY c_custkey, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


# -- Q12 shape: priority line counts by line status ---------------------------

_Q12_HI = ("1-URGENT", "2-HIGH")


def lineitem_priority_counts(sf_dir: str,
                             ship_lo: str = "1996-01-01T00:00:00",
                             ship_hi: str = "1997-01-01T00:00:00",
                             num_partitions: int = 16):
    """Per-linestatus counts of lineitems on high- vs low-priority
    orders — the TPC-H Q12 conditional-aggregation-after-join shape.

    Scale plan: lineitem folds per block to (orderkey, linestatus, cnt)
    partials BEFORE the join, so the shuffled left side carries at most
    one row per (order, status) per block instead of every lineitem.
    Orders ⋈ partials is a hash-partitioned `Dataset.join` on orderkey
    (both sides unbounded at 100 TB). The conditional split is a
    vectorized is_in over the joined batches, folded to one row per
    linestatus per batch before the final 2-row groupby."""
    from ray.data.aggregate import Sum

    lo, hi = _ts(ship_lo), _ts(ship_hi)

    def li_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                             pc.less(b.column("l_shipdate"), hi)))
        t = pa.table({"l_orderkey": b.column("l_orderkey"),
                      "l_linestatus": b.column("l_linestatus"),
                      "one": pa.array(np.ones(len(b), dtype=np.int64))})
        return (pa.TableGroupBy(t, ["l_orderkey", "l_linestatus"])
                .aggregate([("one", "sum")])
                .rename_columns(["l_orderkey", "l_linestatus", "cnt"]))

    li = (_read(sf_dir, "lineitem",
                ["l_orderkey", "l_linestatus", "l_shipdate"])
          .map_batches(li_partial, batch_format="pyarrow"))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    joined = li.join(orders, join_type="inner",
                     num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def split(b: pa.Table) -> pa.Table:
        hi_mask = pc.is_in(b.column("o_orderpriority"),
                           value_set=pa.array(_Q12_HI))
        cnt = b.column("cnt")
        zero = pa.scalar(0, pa.int64())
        t = pa.table({
            "l_linestatus": b.column("l_linestatus"),
            "hi": pc.if_else(hi_mask, cnt, zero),
            "lo": pc.if_else(hi_mask, zero, cnt)})
        return (pa.TableGroupBy(t, "l_linestatus")
                .aggregate([("hi", "sum"), ("lo", "sum")])
                .rename_columns(["l_linestatus", "high_line_count",
                                 "low_line_count"]))

    return (joined.map_batches(split, batch_format="pyarrow")
            .groupby("l_linestatus")
            .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                       Sum("low_line_count", alias_name="low_line_count"))
            .sort("l_linestatus"))


SQL_LINEITEM_PRIORITY_COUNTS = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_linestatus ORDER BY l_linestatus
"""


# -- Q19 shape: disjunctive-predicate revenue ---------------------------------

_Q19_BRANCHES = (
    ("Brand#12", 1, 5, 1.0, 11.0),
    ("Brand#23", 1, 10, 10.0, 20.0),
    ("Brand#24", 1, 15, 20.0, 30.0),
)


def disjunctive_part_revenue(sf_dir: str, branches=_Q19_BRANCHES):
    """Revenue matched by an OR of (brand, size-range, quantity-range)
    branch predicates — the TPC-H Q19 disjunctive multi-predicate join.

    Scale plan: part attributes (brand, size) broadcast once via
    ray.put; every lineitem block probes them with one vectorized
    index_in and evaluates ALL branches as arrow boolean algebra — the
    disjunction never materializes a joined row, and each block folds
    to a single partial sum. No shuffle anywhere; output is one row."""
    import ray
    from ray.data.aggregate import Sum

    branch_spec = tuple(branches)
    part = pa.concat_tables(ray.get(
        _read(sf_dir, "part",
              ["p_partkey", "p_brand", "p_size"]).to_arrow_refs()))
    # broadcast ONLY branch-eligible part rows (brand + size head of the
    # predicate): the branch list makes this slice dimension-small BY
    # CONSTRUCTION, so the probe arrays stay tiny even when the full
    # part table would not; non-members resolve to null -> excluded
    elig = None
    for br, s_lo, s_hi, _q_lo, _q_hi in branch_spec:
        m = pc.and_(pc.equal(part.column("p_brand"), pa.scalar(br)),
                    pc.and_(pc.greater_equal(part.column("p_size"),
                                             pa.scalar(s_lo)),
                            pc.less_equal(part.column("p_size"),
                                          pa.scalar(s_hi))))
        elig = m if elig is None else pc.or_(elig, m)
    part = part.filter(elig)
    part_ref = ray.put((part.column("p_partkey").combine_chunks(),
                        part.column("p_brand").combine_chunks(),
                        part.column("p_size").combine_chunks()))

    def partial(b: pa.Table) -> pa.Table:
        keys, brands, sizes = ray.get(part_ref)
        idx = pc.index_in(b.column("l_partkey").combine_chunks(),
                          value_set=keys)
        brand = brands.take(idx)
        size = sizes.take(idx)
        qty = b.column("l_quantity")
        keep = None
        for br, s_lo, s_hi, q_lo, q_hi in branch_spec:
            m = pc.and_(
                pc.and_(pc.equal(brand, pa.scalar(br)),
                        pc.and_(pc.greater_equal(size, pa.scalar(s_lo)),
                                pc.less_equal(size, pa.scalar(s_hi)))),
                pc.and_(pc.greater_equal(qty, pa.scalar(q_lo)),
                        pc.less_equal(qty, pa.scalar(q_hi))))
            keep = m if keep is None else pc.or_(keep, m)
        rev = pc.multiply(b.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      b.column("l_discount")))
        s = pc.sum(pc.if_else(pc.fill_null(keep, False), rev,
                              pa.scalar(0.0)))
        return pa.table({"revenue":
                         pa.array([s.as_py() or 0.0], pa.float64())})

    agg = (_read(sf_dir, "lineitem",
                 ["l_partkey", "l_quantity", "l_extendedprice",
                  "l_discount"])
           .map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("revenue", alias_name="revenue")))
    return pa.table({"revenue": pa.array(
        [round(float(agg["revenue"]), 2)], pa.float64())})


SQL_DISJUNCTIVE_PART_REVENUE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# -- Q11 shape: parts above a global value-share threshold --------------------

def important_parts(sf_dir: str, fraction: float = 0.0006):
    """Parts whose lineitem value exceeds `fraction` of the GLOBAL total
    — the TPC-H Q11 HAVING-against-a-scalar-subquery shape.

    Scale plan: one partial-aggregated groupby builds the per-part
    values; the global total is a second SCALAR aggregate over that
    (part-cardinality, already reduced) dataset, broadcast into the
    filter as a plain float — no second scan of lineitem, no shuffle
    for the threshold. At sf0.01 the nearest part sits 215+ absolute
    units from the cut, so cross-engine summation-order ulps cannot
    flip membership."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"l_partkey": b.column("l_partkey"),
                      "val": b.column("l_extendedprice")})
        return (pa.TableGroupBy(t, "l_partkey")
                .aggregate([("val", "sum")])
                .rename_columns(["l_partkey", "val"]))

    vals = (_read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("l_partkey")
            .aggregate(Sum("val", alias_name="val")))
    total = float(vals.aggregate(Sum("val"))["sum(val)"])
    cut = pa.scalar(fraction * total)

    def keep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("val"), cut))
        return pa.table({
            "l_partkey": b.column("l_partkey"),
            "part_value": pc.round(b.column("val"), ndigits=2)})

    return (vals.map_batches(keep, batch_format="pyarrow")
            .sort(["part_value", "l_partkey"], descending=[True, False]))


SQL_IMPORTANT_PARTS = """
WITH v AS (
  SELECT l_partkey, sum(l_extendedprice) AS pv
  FROM lineitem GROUP BY l_partkey)
SELECT l_partkey, round(pv, 2) AS part_value
FROM v WHERE pv > 0.0006 * (SELECT sum(pv) FROM v)
ORDER BY part_value DESC, l_partkey
"""


# -- Q21 shape: the straggler supplier per multi-supplier order ----------------

def waiting_suppliers(sf_dir: str, k: int = 10, num_partitions: int = 8):
    """Suppliers most often the SOLE last shipper on finished
    multi-supplier orders — the TPC-H Q21 exists/not-exists blame shape,
    expressed on this schema's columns (no receipt/commit dates, so
    "kept the order waiting" = uniquely holds the order's max
    l_shipdate).

    Scale plan: every reduction runs on the (order, supplier) pair
    table, which per-block partials shrink below lineitem cardinality
    BEFORE the first shuffle; the per-order stats (max ship, supplier
    count) come from a second groupby on the SAME key and rejoin the
    pairs via hash join, so nothing order-wide ever sits on one node.
    Orders (status filter) joins by hash; supplier names broadcast.
    num_partitions defaults low because TWO JoinOperators share one
    DAG — each reserves aggregator actors, and 2x16 deadlocks a small
    session (same sizing as corpus.quality_filtered_corpus)."""
    from ray.data.aggregate import Count, Max

    def pair_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"l_orderkey": b.column("l_orderkey"),
                      "l_suppkey": b.column("l_suppkey"),
                      "ship": b.column("l_shipdate")})
        return (pa.TableGroupBy(t, ["l_orderkey", "l_suppkey"])
                .aggregate([("ship", "max")])
                .rename_columns(["l_orderkey", "l_suppkey", "smax"]))

    pairs = (_read(sf_dir, "lineitem",
                   ["l_orderkey", "l_suppkey", "l_shipdate"])
             .map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["l_orderkey", "l_suppkey"])
             .aggregate(Max("smax", alias_name="smax")))

    per_order = (pairs.groupby("l_orderkey")
                 .aggregate(Max("smax", alias_name="omax"),
                            Count(alias_name="n_supp")))

    # repartition merges away the aggregates' zero-column empty blocks,
    # which break Dataset.join (pitfall per pipelines/graph.py:56)
    pairs = pairs.repartition(num_partitions)
    per_order = per_order.repartition(num_partitions)

    at_max = (pairs.join(per_order, join_type="inner",
                         num_partitions=num_partitions,
                         on=("l_orderkey",))
              .map_batches(lambda b: b.filter(pc.and_(
                  pc.greater(b.column("n_supp"), pa.scalar(1)),
                  pc.equal(b.column("smax"), b.column("omax"))))
                  .select(["l_orderkey", "l_suppkey"]),
                  batch_format="pyarrow"))

    blamed = (at_max.groupby("l_orderkey")
              .aggregate(Max("l_suppkey", alias_name="culprit"),
                         Count(alias_name="n_at_max"))
              .map_batches(lambda b: b.filter(
                  pc.equal(b.column("n_at_max"), pa.scalar(1)))
                  .select(["l_orderkey", "culprit"]),
                  batch_format="pyarrow"))

    fin_orders = (_read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
                  .map_batches(lambda b: b.filter(
                      pc.equal(b.column("o_orderstatus"), pa.scalar("F")))
                      .select(["o_orderkey"]), batch_format="pyarrow"))

    names = _broadcast_kv(_read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
                          "s_suppkey", "s_name")
    attach = _make_attach(names, "culprit", "s_name")

    blamed = blamed.repartition(num_partitions)
    fin_orders = fin_orders.repartition(num_partitions)
    return (blamed.join(fin_orders, join_type="inner",
                        num_partitions=num_partitions,
                        on=("l_orderkey",), right_on=("o_orderkey",))
            .map_batches(attach, batch_format="pyarrow")
            .groupby("s_name")
            .aggregate(Count(alias_name="numwait"))
            .sort(["numwait", "s_name"], descending=[True, False])
            .limit(k))


SQL_WAITING_SUPPLIERS = """
WITH pairs AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS smax
  FROM lineitem GROUP BY l_orderkey, l_suppkey),
ord AS (
  SELECT l_orderkey AS okey, max(smax) AS omax, count(*) AS n_supp
  FROM pairs GROUP BY l_orderkey),
blamed AS (
  SELECT p.l_orderkey, max(p.l_suppkey) AS culprit
  FROM pairs p JOIN ord ON p.l_orderkey = okey
  WHERE n_supp > 1 AND p.smax = omax
  GROUP BY p.l_orderkey HAVING count(*) = 1)
SELECT s_name, count(*) AS numwait
FROM blamed
JOIN orders ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey = culprit
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 10
"""


# -- Q22 shape: rich customers with no large orders, by nation -----------------

def rich_inactive_by_nation(sf_dir: str, big: float = 300_000.0,
                            num_partitions: int = 16):
    """Customers whose balance beats the global positive-balance average
    and who never placed a LARGE order (totalprice >= `big`), counted
    per nation — the TPC-H Q22 scalar-subquery + NOT EXISTS shape,
    realized with the engine's NATIVE left_anti hash join (the
    churned-by-segment sibling shows the left_outer+is_null spelling).

    Scale plan: the threshold is ONE scalar aggregate broadcast into the
    filter (no second scan); the NOT EXISTS is a native left_anti hash
    join against the DISTINCT big-order custkeys (pre-reduced by
    groupby, so the anti side carries one row per qualifying customer,
    not one per order). Margin note: the nearest customer sits ≥6.7
    absolute from the sf0.01 balance threshold, so cross-engine
    summation-order ulps cannot flip membership."""
    from ray.data.aggregate import Count, Mean, Sum

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])
    avg_bal = float(cust.map_batches(
        lambda b: b.filter(pc.greater(b.column("c_acctbal"),
                                      pa.scalar(0.0))),
        batch_format="pyarrow").aggregate(Mean("c_acctbal"))["mean(c_acctbal)"])
    cut = pa.scalar(avg_bal)

    # repartition merges away empty blocks, which break Dataset.join
    # (pitfall per pipelines/graph.py:56)
    rich = cust.map_batches(
        lambda b: b.filter(pc.greater(b.column("c_acctbal"), cut)),
        batch_format="pyarrow").repartition(num_partitions)

    active = (_read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
              .map_batches(lambda b: b.filter(
                  pc.greater_equal(b.column("o_totalprice"),
                                   pa.scalar(big)))
                  .select(["o_custkey"]), batch_format="pyarrow")
              .groupby("o_custkey").aggregate(Count(alias_name="n_o"))
              .repartition(num_partitions))

    return (rich.join(active, join_type="left_anti",
                      num_partitions=num_partitions,
                      on=("c_custkey",), right_on=("o_custkey",))
            .groupby("c_nationkey")
            .aggregate(Count(alias_name="numcust"),
                       Sum("c_acctbal", alias_name="totacctbal"))
            .map_batches(lambda b: _round_col(b, "totacctbal", 2),
                         batch_format="pyarrow")
            .sort("c_nationkey"))


SQL_RICH_INACTIVE_BY_NATION = """
WITH ab AS (SELECT avg(c_acctbal) AS cut FROM customer
            WHERE c_acctbal > 0.0)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer, ab
WHERE c_acctbal > cut
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_totalprice >= 300000.0)
GROUP BY c_nationkey ORDER BY c_nationkey
"""


# -- Q8 shape: nation market share inside a region, per year -------------------

def nation_market_share(sf_dir: str, region: str = "ASIA",
                        nation: str = "NATION_3",
                        num_partitions: int = 8):
    """Per order year: the revenue share supplied by one nation's
    suppliers among all orders placed by customers of one region — the
    TPC-H Q8 two-sided-dimension market-share shape.

    Scale plan: supplier→nation is a broadcast probe folded into the
    lineitem partial, which reduces lineitem to ONE (orderkey, rev,
    rev_nation) row per order before any shuffle. customer is NOT
    broadcast (unbounded at 100 TB): the region membership flows
    through a hash join orders ⋈ region-customers, and the final
    groupby runs on years (constant cardinality). Share rounded to 6 —
    numerator and denominator are each sums of identical products, so
    cross-engine ulps sit ~1e-10 relative, far inside the rounding.
    num_partitions defaults low: TWO JoinOperators share one DAG (see
    waiting_suppliers note)."""
    from ray.data.aggregate import Sum

    # nation/region dimensions: tiny, resolved driver-side
    import ray
    nat = pa.concat_tables(ray.get(
        _read(sf_dir, "nation",
              ["n_nationkey", "n_name", "n_regionkey"]).to_arrow_refs()))
    reg = pa.concat_tables(ray.get(
        _read(sf_dir, "region",
              ["r_regionkey", "r_name"]).to_arrow_refs()))
    region_keys = reg.filter(pc.equal(reg.column("r_name"),
                                      pa.scalar(region))).column("r_regionkey")
    region_nations = nat.filter(pc.is_in(nat.column("n_regionkey"),
                                         value_set=region_keys.combine_chunks()))
    region_nation_keys = region_nations.column("n_nationkey").combine_chunks()
    nation_key = nat.filter(pc.equal(nat.column("n_name"),
                                     pa.scalar(nation))).column("n_nationkey")

    supp_nation = _broadcast_kv(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "s_suppkey", "s_nationkey")
    target = int(nation_key[0].as_py())

    def li_partial(b: pa.Table) -> pa.Table:
        keys, vals = ray.get(supp_nation)
        idx = pc.index_in(b.column("l_suppkey").combine_chunks(),
                          value_set=keys)
        snat = vals.take(idx)
        rev = pc.multiply(b.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        hit = pc.equal(snat, pa.scalar(target))
        t = pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "rev": rev,
            "rev_n": pc.if_else(pc.fill_null(hit, False), rev,
                                pa.scalar(0.0))})
        return (pa.TableGroupBy(t, "l_orderkey")
                .aggregate([("rev", "sum"), ("rev_n", "sum")])
                .rename_columns(["l_orderkey", "rev", "rev_n"]))

    line_rev = (_read(sf_dir, "lineitem",
                      ["l_orderkey", "l_suppkey", "l_extendedprice",
                       "l_discount"])
                .map_batches(li_partial, batch_format="pyarrow"))

    # repartitions below merge away empty blocks, which break
    # Dataset.join (pitfall per pipelines/graph.py:56)
    region_cust = (_read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
                   .map_batches(lambda b: b.filter(pc.is_in(
                       b.column("c_nationkey"),
                       value_set=region_nation_keys))
                       .select(["c_custkey"]), batch_format="pyarrow")
                   .repartition(num_partitions))

    def year_col(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_year": pc.year(b.column("o_orderdate"))})

    orders = (_read(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_orderdate"])
              .join(region_cust, join_type="left_semi",
                    num_partitions=num_partitions,
                    on=("o_custkey",), right_on=("c_custkey",))
              .map_batches(year_col, batch_format="pyarrow")
              .repartition(num_partitions))

    shares = (line_rev.groupby("l_orderkey")
              .aggregate(Sum("rev", alias_name="rev"),
                         Sum("rev_n", alias_name="rev_n"))
              .repartition(num_partitions)
              .join(orders, join_type="inner",
                    num_partitions=num_partitions,
                    on=("l_orderkey",), right_on=("o_orderkey",))
              .groupby("o_year")
              .aggregate(Sum("rev", alias_name="rev"),
                         Sum("rev_n", alias_name="rev_n")))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_year": b.column("o_year").cast(pa.int64()),
            "mkt_share": pc.round(pc.divide(b.column("rev_n"),
                                            b.column("rev")), ndigits=6)})

    return shares.map_batches(finish, batch_format="pyarrow").sort("o_year")


SQL_NATION_MARKET_SHARE = """
WITH region_orders AS (
  SELECT o_orderkey, year(o_orderdate) AS o_year
  FROM orders JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'ASIA'),
line_rev AS (
  SELECT l_orderkey,
         sum(l_extendedprice * (1 - l_discount)) AS rev,
         sum(CASE WHEN n_name = 'NATION_3'
                  THEN l_extendedprice * (1 - l_discount)
                  ELSE 0 END) AS rev_n
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  GROUP BY l_orderkey)
SELECT o_year, round(sum(rev_n) / sum(rev), 6) AS mkt_share
FROM region_orders JOIN line_rev ON l_orderkey = o_orderkey
GROUP BY o_year ORDER BY o_year
"""


# -- Q6 shape: forecast revenue change (map-only scalar aggregate) ------------

def forecast_revenue_change(sf_dir: str,
                            ship_lo: str = "1996-01-01T00:00:00",
                            ship_hi: str = "1997-01-01T00:00:00",
                            disc_lo: float = 0.05, disc_hi: float = 0.07,
                            qty_max: float = 24.0):
    """Revenue that would be recovered by eliminating small-quantity
    mid-discount line items in one shipping year — the TPC-H Q6 shape.

    Scale plan: the cheapest possible — a column-pruned lineitem scan
    folds each block to ONE partial sum row (filter + multiply + sum,
    all pyarrow kernels), so the only exchange is a ≤#blocks-row
    aggregate. Zero shuffle, zero driver materialization; at 100 TB this
    is a pure streaming pass bounded by storage bandwidth."""
    from ray.data.aggregate import Sum

    lo, hi = _ts(ship_lo), _ts(ship_hi)

    def partial(b: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                    pc.less(b.column("l_shipdate"), hi)),
            pc.and_(
                pc.and_(pc.greater_equal(b.column("l_discount"),
                                         pa.scalar(disc_lo)),
                        pc.less_equal(b.column("l_discount"),
                                      pa.scalar(disc_hi))),
                pc.less(b.column("l_quantity"), pa.scalar(qty_max))))
        b = b.filter(mask)
        s = pc.sum(pc.multiply(b.column("l_extendedprice"),
                               b.column("l_discount")))
        return pa.table({"revenue_change":
                         pa.array([s.as_py() or 0.0], pa.float64())})

    agg = (_read(sf_dir, "lineitem",
                 ["l_extendedprice", "l_discount", "l_quantity",
                  "l_shipdate"])
           .map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("revenue_change", alias_name="revenue_change")))
    return pa.table({"revenue_change":
                     pa.array([round(float(agg["revenue_change"]), 2)],
                              pa.float64())})


SQL_FORECAST_REVENUE_CHANGE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_change
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# -- Q9 shape: product-type profit by nation and year -------------------------

def product_type_profit(sf_dir: str, name_contains: str = "bolt",
                        num_partitions: int = 16):
    """Profit per (supplier nation, order year) for parts whose name
    contains a substring — the TPC-H Q9 shape (profit measure adapted to
    the schema at hand: no partsupp table, so profit =
    l_extendedprice * (1 - l_discount)).

    Scale plan: the part-name predicate resolves to a partkey SET on the
    dimension side, broadcast once (ray.put) and applied as a vectorized
    pc.is_in prefilter on the lineitem scan — only the matching slice
    (~1/vocabulary of rows) ever reaches the shuffle. Supplier→nation
    name is a second broadcast probe. The one unavoidable exchange is
    lineitem ⋈ orders on orderkey (both unbounded), hash-partitioned with
    the orders side projected to (o_orderkey, o_year) BEFORE the join so
    the shuffle carries two ints per order. Profit partial-aggregates per
    (nation, year) inside each joined batch; the final groupby is
    nations×years-sized."""
    import ray
    from ray.data.aggregate import Sum

    part = pa.concat_tables(ray.get(
        _read(sf_dir, "part", ["p_partkey", "p_name"]).to_arrow_refs()))
    match = pc.match_substring(part.column("p_name"), name_contains)
    part_keys_ref = ray.put(part.column("p_partkey").filter(match)
                            .combine_chunks())

    nation = _read(sf_dir, "nation").to_pandas()
    nation_name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    supp = pa.concat_tables(ray.get(
        _read(sf_dir, "supplier",
              ["s_suppkey", "s_nationkey"]).to_arrow_refs()))
    s_nation = pa.array([nation_name[int(k)]
                         for k in supp.column("s_nationkey").to_pylist()])
    supp_ref = ray.put((supp.column("s_suppkey").combine_chunks(),
                        s_nation))

    def line_side(b: pa.Table) -> pa.Table:
        import ray as _ray
        keys = _ray.get(part_keys_ref)
        b = b.filter(pc.is_in(b.column("l_partkey"), value_set=keys))
        skeys, snames = _ray.get(supp_ref)
        idx = pc.index_in(b.column("l_suppkey").combine_chunks(),
                          value_set=skeys)
        profit = pc.multiply(b.column("l_extendedprice"),
                             pc.subtract(pa.scalar(1.0),
                                         b.column("l_discount")))
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "nation": snames.take(idx),
                         "profit": profit})

    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_partkey", "l_suppkey",
                      "l_extendedprice", "l_discount"]) \
        .map_batches(line_side, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]) \
        .map_batches(lambda b: pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_year": pc.year(b.column("o_orderdate")).cast(pa.int64())}),
            batch_format="pyarrow")

    joined = lineitem.join(orders, join_type="inner",
                           num_partitions=num_partitions,
                           on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"nation": b.column("nation"),
                      "o_year": b.column("o_year"),
                      "profit": b.column("profit")})
        return (pa.TableGroupBy(t, ["nation", "o_year"])
                .aggregate([("profit", "sum")])
                .rename_columns(["nation", "o_year", "sum_profit"]))

    out = (joined.map_batches(partial, batch_format="pyarrow")
           .groupby(["nation", "o_year"])
           .aggregate(Sum("sum_profit", alias_name="sum_profit")))
    return (out.map_batches(lambda b: _round_col(b, "sum_profit", 2),
                            batch_format="pyarrow")
            .sort(["nation", "o_year"], descending=[False, True]))


SQL_PRODUCT_TYPE_PROFIT = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%bolt%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# -- Q16 shape: supplier-relationship count-distinct with anti-join ----------

def supplier_relation_counts(sf_dir: str, excl_brand: str = "Brand#13",
                             excl_type: str = "PROMO",
                             sizes=(1, 4, 9, 14, 23, 36, 45, 49)):
    """How many distinct suppliers ship each qualifying (brand, type,
    size) part class, excluding negative-balance suppliers — the TPC-H
    Q16 shape (lineitem stands in for partsupp as the part↔supplier
    relation; the s_acctbal < 0 exclusion stands in for the
    customer-complaints anti-join, the schema having no s_comment).

    Scale plan: part attributes broadcast once as three partkey probes;
    the excluded-supplier set is dimension-sized and broadcast the same
    way (NOT-IN = vectorized is_in + invert — an anti-join with zero
    shuffle). Each block pre-dedups to its distinct (brand, type, size,
    suppkey) quads, so the single groupby exchange carries at most
    |part-class| × |suppliers| rows regardless of lineitem size; the
    distinct-supplier count folds per group from the pre-deduped quads."""
    import ray
    from ray.data.aggregate import Count

    part = pa.concat_tables(ray.get(
        _read(sf_dir, "part",
              ["p_partkey", "p_brand", "p_type", "p_size"])
        .to_arrow_refs()))
    qual = pc.and_(
        pc.and_(pc.invert(pc.equal(part.column("p_brand"),
                                   pa.scalar(excl_brand))),
                pc.invert(pc.equal(part.column("p_type"),
                                   pa.scalar(excl_type)))),
        pc.is_in(part.column("p_size"),
                 value_set=pa.array(list(sizes),
                                    type=part.column("p_size").type)))
    part = part.filter(qual)
    part_ref = ray.put((part.column("p_partkey").combine_chunks(),
                        part.column("p_brand").combine_chunks(),
                        part.column("p_type").combine_chunks(),
                        part.column("p_size").combine_chunks()))

    supp = pa.concat_tables(ray.get(
        _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
        .to_arrow_refs()))
    excl = supp.filter(pc.less(supp.column("s_acctbal"), pa.scalar(0.0)))
    excl_ref = ray.put(excl.column("s_suppkey").combine_chunks())

    def quads(b: pa.Table) -> pa.Table:
        import ray as _ray
        pkeys, brand, ptype, psize = _ray.get(part_ref)
        bad = _ray.get(excl_ref)
        b = b.filter(pc.invert(pc.is_in(b.column("l_suppkey"),
                                        value_set=bad)))
        idx = pc.index_in(b.column("l_partkey").combine_chunks(),
                          value_set=pkeys)
        t = pa.table({"p_brand": brand.take(idx),
                      "p_type": ptype.take(idx),
                      "p_size": psize.take(idx),
                      "l_suppkey": b.column("l_suppkey")})
        t = t.filter(pc.is_valid(t.column("p_brand")))  # inner join
        return t.group_by(["p_brand", "p_type", "p_size",
                           "l_suppkey"]).aggregate([])

    def count_distinct(df):
        import pandas as pd
        return pd.DataFrame({
            "p_brand": [df["p_brand"].iloc[0]],
            "p_type": [df["p_type"].iloc[0]],
            "p_size": [df["p_size"].iloc[0]],
            "supplier_cnt": [int(df["l_suppkey"].nunique())]})

    return (_read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
            .map_batches(quads, batch_format="pyarrow")
            .groupby(["p_brand", "p_type", "p_size"])
            .map_groups(count_distinct, batch_format="pandas")
            .sort(["supplier_cnt", "p_brand", "p_type", "p_size"],
                  descending=[True, False, False, False]))


SQL_SUPPLIER_RELATION_COUNTS = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# -- Q20 shape: potential part promotion (grouped-HAVING semi-join) ----------

def potential_promotion_suppliers(sf_dir: str, name_prefix: str = "red ",
                                  qty_threshold: float = 300.0,
                                  ship_lo: str = "1996-01-01T00:00:00",
                                  ship_hi: str = "1997-01-01T00:00:00"):
    """Suppliers who shipped more than `qty_threshold` units of
    prefix-named parts in one year — the TPC-H Q20 nested-semi-join
    shape (lineitem shipped quantity stands in for partsupp availqty).

    Scale plan: the part-name prefix resolves to a broadcast partkey set
    (pc.is_in prefilter), so the lineitem scan keeps only the matching
    slice; per-block (suppkey, qty) partials shrink the one exchange to a
    supplier-cardinality groupby. The HAVING filter and the s_name attach
    are then dimension-sized map work. Nothing lineitem-sized is ever
    shuffled or driver-materialized."""
    import ray
    from ray.data.aggregate import Sum

    part = pa.concat_tables(ray.get(
        _read(sf_dir, "part", ["p_partkey", "p_name"]).to_arrow_refs()))
    match = pc.starts_with(part.column("p_name"), name_prefix)
    part_keys_ref = ray.put(part.column("p_partkey").filter(match)
                            .combine_chunks())
    lo, hi = _ts(ship_lo), _ts(ship_hi)

    def partial(b: pa.Table) -> pa.Table:
        import ray as _ray
        keys = _ray.get(part_keys_ref)
        b = b.filter(pc.and_(
            pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                    pc.less(b.column("l_shipdate"), hi)),
            pc.is_in(b.column("l_partkey"), value_set=keys)))
        t = pa.table({"s_suppkey": b.column("l_suppkey"),
                      "total_qty": b.column("l_quantity")})
        return (pa.TableGroupBy(t, ["s_suppkey"])
                .aggregate([("total_qty", "sum")])
                .rename_columns(["s_suppkey", "total_qty"]))

    qty = (_read(sf_dir, "lineitem",
                 ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("s_suppkey")
           .aggregate(Sum("total_qty", alias_name="total_qty")))

    sname = _broadcast_kv(_read(sf_dir, "supplier",
                                ["s_suppkey", "s_name"]),
                          "s_suppkey", "s_name")
    attach_name = _make_attach(sname, "s_suppkey", "s_name")

    def winners(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("total_qty"),
                                pa.scalar(qty_threshold)))
        b = attach_name(b)
        return pa.table({"s_suppkey": b.column("s_suppkey"),
                         "s_name": b.column("s_name"),
                         "total_qty": b.column("total_qty")})

    return (qty.map_batches(winners, batch_format="pyarrow")
            .sort("s_suppkey"))


SQL_POTENTIAL_PROMOTION_SUPPLIERS = """
SELECT s_suppkey, s_name, total_qty
FROM supplier JOIN (
  SELECT l_suppkey, sum(l_quantity) AS total_qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE 'red %')
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey) q ON s_suppkey = l_suppkey
WHERE total_qty > 300.0
ORDER BY s_suppkey
"""


# -- Adamic-Adar link prediction over the customer–part bipartite graph ------

def customers_common_parts_affinity(sf_dir: str, k: int = 100,
                                    num_partitions: int = 16):
    """Top-k customer pairs by Adamic-Adar affinity over the
    customer–part bipartite graph (Adamic & Adar 2003, "Friends and
    neighbors on the Web"): two customers are similar when they buy
    the same parts, and a shared NICHE part (few buyers) is stronger
    evidence than a shared commodity part —

        score(a, b) = Σ_{p ∈ parts(a) ∩ parts(b)} 1 / ln(|buyers(p)|)

    the canonical link-prediction / record-linkage scorer, here the
    KG-side analogue of webgraph.host_cocitation with the inverse-log
    degree weight instead of a raw count.

    Scale shape: one unavoidable lineitem ⋈ orders exchange on
    orderkey (both sides projected to two ints) resolves custkey; the
    (custkey, partkey) stream then hash-co-locates by PART, so pair
    generation is vectorized triu inside each part group and the
    weight 1/ln(degree) closes in-group (the group IS the distinct
    buyer set — np.unique dedups re-orders and multi-line orders, so
    no global distinct pass is needed). Single-buyer parts contribute
    nothing (and ln(1)=0 would blow up) — skipped in-group, HAVING
    count>=2 in the oracle. Pair volume is Σ_p deg(p)², bounded here
    by the schema's uniform part degree; a skewed corpus would cap
    hot-part degree exactly like host_cocitation.max_out_degree
    (webgraph.py:182) — a documented semantic both sides would share.
    The final (cust_a, cust_b) groupby is pre-shrunk by per-block
    partial sums."""
    import pandas as pd
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def line_dedup(b: pa.Table) -> pa.Table:
        # per-block (orderkey, partkey) dedup — pure shuffle shrink
        # (multi-line orders repeat pairs); exactness comes from the
        # in-group np.unique below
        return (pa.table({"l_orderkey": b.column("l_orderkey"),
                          "l_partkey": b.column("l_partkey")})
                .group_by(["l_orderkey", "l_partkey"]).aggregate([]))

    joined = (_read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
              .map_batches(line_dedup, batch_format="pyarrow")
              .join(orders, join_type="inner",
                    num_partitions=num_partitions,
                    on=("l_orderkey",), right_on=("o_orderkey",)))

    def cp(b: pa.Table) -> pa.Table:
        return (pa.table({"custkey": b.column("o_custkey"),
                          "partkey": b.column("l_partkey")})
                .group_by(["custkey", "partkey"]).aggregate([]))

    _empty = pd.DataFrame({"cust_a": pd.Series([], dtype="int64"),
                           "cust_b": pd.Series([], dtype="int64"),
                           "w": pd.Series([], dtype="float64")})

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        buyers = np.unique(df["custkey"].to_numpy())
        if len(buyers) < 2:
            return _empty
        w = 1.0 / np.log(float(len(buyers)))
        i, j = np.triu_indices(len(buyers), k=1)
        return pd.DataFrame({"cust_a": buyers[i], "cust_b": buyers[j],
                             "w": np.full(len(i), w)})

    def partial(b: pa.Table) -> pa.Table:
        return (pa.TableGroupBy(b.select(["cust_a", "cust_b", "w"]),
                                ["cust_a", "cust_b"])
                .aggregate([("w", "sum")])
                .rename_columns(["cust_a", "cust_b", "w"]))

    scored = (joined.map_batches(cp, batch_format="pyarrow")
              .groupby("partkey")
              .map_groups(pairs, batch_format="pandas")
              .map_batches(partial, batch_format="pyarrow")
              .groupby(["cust_a", "cust_b"])
              .aggregate(Sum("w", alias_name="aa_score")))

    return (scored.map_batches(lambda b: _round_col(b, "aa_score", 6),
                               batch_format="pyarrow")
            .sort(["aa_score", "cust_a", "cust_b"],
                  descending=[True, False, False])
            .limit(k))


SQL_CUSTOMERS_COMMON_PARTS_AFFINITY = """
WITH cp AS (
  SELECT DISTINCT o_custkey AS c, l_partkey AS p
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
pw AS (
  SELECT p, 1.0 / ln(count(*)) AS w
  FROM cp GROUP BY p HAVING count(*) >= 2)
SELECT a.c AS cust_a, b.c AS cust_b,
       round(sum(pw.w), 6) AS aa_score
FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
JOIN pw ON pw.p = a.p
GROUP BY 1, 2
ORDER BY aa_score DESC, cust_a, cust_b
LIMIT 100
"""


# -- nation revenue year-over-year growth (LAG over an aggregated series) -----

def nation_revenue_yoy(sf_dir: str, num_partitions: int = 8):
    """Year-over-year revenue growth per customer nation — the
    dashboard staple whose shape is a WINDOW OVER AN AGGREGATE: first
    reduce orders to the (nation, year) revenue series, then a LAG
    within each nation ordered by year. First-year rows (no prior year
    to compare) are excluded, matching the oracle's IS NOT NULL.

    Scale shape: customer→nation is a broadcast probe (dimension-sized,
    ray.put once); per-block (nation, year) revenue partials close
    inside each orders batch, so the one exchange carries
    nations × years rows. The LAG then runs inside
    groupby(nation).map_groups on that already-tiny series — the
    standard two-stage 'aggregate, then window the aggregate' plan that
    avoids ever sorting the fact table."""
    import pandas as pd
    from ray.data.aggregate import Sum

    nation = _read(sf_dir, "nation").to_pandas()
    nname = dict(zip(nation["n_nationkey"], nation["n_name"]))
    cust = _broadcast_kv(_read(sf_dir, "customer",
                               ["c_custkey", "c_nationkey"]),
                         "c_custkey", "c_nationkey")
    attach = _make_attach(cust, "o_custkey", "c_nationkey")

    def partial(b: pa.Table) -> pa.Table:
        b = attach(b)
        t = pa.table({
            "c_nationkey": b.column("c_nationkey"),
            "o_year": pc.year(b.column("o_orderdate")).cast(pa.int64()),
            "revenue": b.column("o_totalprice")})
        return (pa.TableGroupBy(t, ["c_nationkey", "o_year"])
                .aggregate([("revenue", "sum")])
                .rename_columns(["c_nationkey", "o_year", "revenue"]))

    series = (_read(sf_dir, "orders",
                    ["o_custkey", "o_orderdate", "o_totalprice"])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(["c_nationkey", "o_year"])
              .aggregate(Sum("revenue", alias_name="revenue")))

    def lag_growth(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("o_year")
        rev = g["revenue"].to_numpy()
        yr = g["o_year"].to_numpy()
        if len(g) < 2:
            return pd.DataFrame({
                "nation": pd.Series([], dtype=str),
                "o_year": pd.Series([], dtype="int64"),
                "revenue": pd.Series([], dtype="float64"),
                "yoy_growth": pd.Series([], dtype="float64")})
        growth = rev[1:] / rev[:-1] - 1.0
        return pd.DataFrame({
            "nation": nname[int(g["c_nationkey"].iloc[0])],
            "o_year": yr[1:],
            "revenue": np.round(rev[1:], 2),
            # np.round returns the canonical nearest-6dp double (the
            # sign·floor(|x|·1e6+.5)·1e-6 construction lands 1 ulp off
            # the double DuckDB's round emits); growth is a ratio of
            # noisy float sums, so exact .5-ulp ties cannot arise. The
            # + 0.0 clears IEEE -0.0 for tiny negatives rounding to 0.
            "yoy_growth": np.round(growth, 6) + 0.0})

    return (series.groupby("c_nationkey")
            .map_groups(lag_growth, batch_format="pandas")
            .sort(["nation", "o_year"]))


SQL_NATION_REVENUE_YOY = """
WITH series AS (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS BIGINT) AS o_year,
         sum(o_totalprice) AS rev
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1, 2)
SELECT nation, o_year, round(rev, 2) AS revenue,
       round(rev / lag(rev) OVER (PARTITION BY nation ORDER BY o_year)
             - 1.0, 6) + 0 AS yoy_growth
FROM series
QUALIFY yoy_growth IS NOT NULL
ORDER BY nation, o_year
"""


# -- trailing 3-month revenue (ROWS frame over an aggregated series) ----------

def nation_revenue_rolling3(sf_dir: str, num_partitions: int = 8):
    """Trailing 3-month revenue per customer nation — SUM OVER a ROWS
    BETWEEN 2 PRECEDING frame on the (nation, month) aggregated
    series; the moving-window companion of nation_revenue_yoy's LAG.
    Same two-stage plan: broadcast dimension probe + per-block
    (nation, month) partials close the fact table down to
    nations × months rows, then the frame runs vectorized inside
    groupby(nation).map_groups (cumsum difference — exact float
    parity with the oracle needs the SAME left-to-right accumulation,
    so the window sums are computed as a + b + c per row, not as
    cumsum deltas whose subtraction reorders the additions)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    nation = _read(sf_dir, "nation").to_pandas()
    nname = dict(zip(nation["n_nationkey"], nation["n_name"]))
    cust = _broadcast_kv(_read(sf_dir, "customer",
                               ["c_custkey", "c_nationkey"]),
                         "c_custkey", "c_nationkey")
    attach = _make_attach(cust, "o_custkey", "c_nationkey")

    def partial(b: pa.Table) -> pa.Table:
        b = attach(b)
        ym = pc.add(pc.multiply(pc.year(b.column("o_orderdate")),
                                pa.scalar(100)),
                    pc.month(b.column("o_orderdate")))
        t = pa.table({"c_nationkey": b.column("c_nationkey"),
                      "o_month": ym.cast(pa.int64()),
                      "revenue": b.column("o_totalprice")})
        return (pa.TableGroupBy(t, ["c_nationkey", "o_month"])
                .aggregate([("revenue", "sum")])
                .rename_columns(["c_nationkey", "o_month", "revenue"]))

    series = (_read(sf_dir, "orders",
                    ["o_custkey", "o_orderdate", "o_totalprice"])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(["c_nationkey", "o_month"])
              .aggregate(Sum("revenue", alias_name="revenue")))

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("o_month")
        rev = g["revenue"].to_numpy()
        # left-to-right 3-term sums, matching the engine's frame order
        r3 = rev.copy()
        if len(rev) > 1:
            r3[1:] = rev[:-1] + rev[1:]
        if len(rev) > 2:
            r3[2:] = (rev[:-2] + rev[1:-1]) + rev[2:]
        return pd.DataFrame({
            "nation": nname[int(g["c_nationkey"].iloc[0])],
            "o_month": g["o_month"].to_numpy(),
            "revenue_3mo": np.round(r3, 2) + 0.0})

    return (series.groupby("c_nationkey")
            .map_groups(roll, batch_format="pandas")
            .sort(["nation", "o_month"]))


SQL_NATION_REVENUE_ROLLING3 = """
WITH series AS (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
             AS o_month,
         sum(o_totalprice) AS rev
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1, 2)
SELECT nation, o_month,
       round(sum(rev) OVER (PARTITION BY nation ORDER BY o_month
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             2) + 0 AS revenue_3mo
FROM series
ORDER BY nation, o_month
"""
