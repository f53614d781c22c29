"""Planted-data tests for rollup / pivot / scalar-subquery operators."""
import os

import numpy as np
import pandas as pd
import pytest

from gpml2pvjson_js_ray.pipelines import rollup


@pytest.fixture(scope="module")
def roll_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("roll_sf")
    pd.DataFrame({
        "l_orderkey": [1, 1, 2, 3],
        "l_partkey": [1, 2, 3, 4],
        "l_suppkey": [1, 1, 1, 1],
        "l_linenumber": [1, 2, 1, 1],
        "l_quantity": [1.0, 2.0, 3.0, 4.0],
        # revenue = price * (1 - disc): 100, 200, 50, 1000
        "l_extendedprice": [100.0, 200.0, 100.0, 1000.0],
        "l_discount": [0.0, 0.0, 0.5, 0.0],
        "l_tax": [0.0] * 4,
        "l_returnflag": ["A", "A", "N", "N"],
        "l_linestatus": ["F", "O", "F", "F"],
        "l_shipdate": [np.datetime64("1996-01-01", "us")] * 4,
    }).to_parquet(os.path.join(d, "lineitem.parquet"), index=False)
    ts = lambda s: np.datetime64(s, "us")  # noqa: E731
    pd.DataFrame({
        "event_id": range(5),
        "ts": [ts("2024-01-01T10:00"), ts("2024-01-01T11:00"),
               ts("2024-01-02T10:00"), ts("2024-01-02T10:30"),
               ts("2024-01-02T23:59")],
        "user_id": [1, 2, 1, 2, 3],
        "event_type": ["click", "view", "click", "click", "purchase"],
        "value": [1.0] * 5,
        "props": ["{}"] * 5,
    }).to_parquet(os.path.join(d, "events.parquet"), index=False)
    # nation 1: avg = 150 (100, 200); nation 2: single customer (avg ==
    # own balance, strict > excludes it)
    pd.DataFrame({
        "c_custkey": [1, 2, 3],
        "c_name": ["c1", "c2", "c3"],
        "c_nationkey": [1, 1, 2],
        "c_acctbal": [100.0, 200.0, 50.0],
        "c_mktsegment": ["BUILDING"] * 3,
    }).to_parquet(os.path.join(d, "customer.parquet"), index=False)
    pd.DataFrame({
        "n_nationkey": [1, 2],
        "n_name": ["ALPHA", "BETA"],
        "n_regionkey": [0, 0],
    }).to_parquet(os.path.join(d, "nation.parquet"), index=False)
    return str(d)


def test_lineitem_rollup_levels(ray_session, roll_sf):
    out = rollup.lineitem_rollup(roll_sf).to_pandas()
    # 3 fine rows + 2 per-flag subtotals + 1 grand total
    assert len(out) == 6
    key = out.set_index(["l_returnflag", "l_linestatus"])["sum_revenue"]
    assert key[("A", "F")] == 100.0
    assert key[("A", "O")] == 200.0
    assert key[("N", "F")] == 1050.0
    sub = out[(out["l_linestatus"] == "ALL")
              & (out["l_returnflag"] != "ALL")]
    assert dict(zip(sub["l_returnflag"], sub["sum_revenue"])) == {
        "A": 300.0, "N": 1050.0}
    grand = out[out["l_returnflag"] == "ALL"]
    assert len(grand) == 1 and grand["sum_revenue"].iloc[0] == 1350.0


def test_daily_type_pivot(ray_session, roll_sf):
    out = rollup.events_daily_type_pivot(roll_sf).to_pandas()
    assert len(out) == 2
    d1 = out.iloc[0]
    assert (d1["n_click"], d1["n_view"], d1["n_purchase"]) == (1, 1, 0)
    d2 = out.iloc[1]
    assert (d2["n_click"], d2["n_view"], d2["n_purchase"]) == (2, 0, 1)
    assert int(out[[f"n_{t}" for t in rollup._EVENT_TYPES]].sum().sum()) == 5


def test_customers_above_nation_avg(ray_session, roll_sf):
    out = rollup.customers_above_nation_avg(roll_sf).to_pandas()
    # only c2 (200 > 150); single-customer nation 2 excluded by strict >
    assert list(out["c_custkey"]) == [2]
    assert out["n_name"].iloc[0] == "ALPHA"
    assert out["nation_avg"].iloc[0] == 150.0
