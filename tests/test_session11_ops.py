"""Planted edge cases for the session-11 operators: interpolated
percentiles (degenerate all-equal group), per-type value trend (exact
linear series), gaps-and-islands (NULL users, ts ties), hourly OHLC
(tiebreaks), and the edit-distance similarity join (cross-band pair,
exactly-once counting). sf-scale value parity with DuckDB is swept by
test_oracles.py; these pin semantics the synthetic corpus can't reach."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from gpml2pvjson_js_ray.pipelines import (  # noqa: E402
    mlprep, quantiles, textops, windows)


def _ts(s):
    return np.datetime64(s, "us")


@pytest.fixture(scope="module")
def sf11(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf11")
    events = pd.DataFrame({
        "event_id": [0, 1, 2, 3, 4, 5, 6, 7, 8, 9],
        "ts": [_ts("2024-01-01T00:00"),   # u1 click
               _ts("2024-01-01T00:01"),   # u1 click  (same island)
               _ts("2024-01-01T00:02"),   # u1 view   (new island)
               _ts("2024-01-01T00:02"),   # u1 view   (ts tie, same island)
               _ts("2024-01-01T00:03"),   # u1 click  (back: 3rd island)
               _ts("2024-01-01T00:00"),   # NULL click
               _ts("2024-01-01T00:04"),   # NULL click (one NULL island)
               _ts("2024-01-01T01:00"),   # u2, hour 2 open (tie below)
               _ts("2024-01-01T01:00"),   # u2, hour 2 — id breaks tie
               _ts("2024-01-01T01:30")],  # u2, hour 2 close
        "user_id": pd.array([1, 1, 1, 1, 1, None, None, 2, 2, 2],
                            dtype="Int64"),
        "event_type": ["click", "click", "view", "view", "click",
                       "click", "click", "view", "view", "view"],
        # linear in time for user-independent trend checks
        "value": [1.0, 2.0, 3.0, 3.0, 4.0, 9.0, 9.0, 7.0, 5.0, 6.0],
        "props": ["{}"] * 10,
    })
    events.to_parquet(os.path.join(d, "events.parquet"), index=False)

    base = "The quick brown fox jumps over the lazy dog near the bank."
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            base + " x" * 100,                      # len 259: band 16
            base.replace("quick", "quack") + " x" * 100 + " y",
            # ^ 1 edit in prefix, len 261 — band 16 (same band pair)
            base + " x" * 150,                      # len 359: band 22
            base.replace("brown", "braun") + " x" * 152,
            # ^ len 363: band 22? 59+304=363 → 363//16=22; vs 359//16=22
            "Completely different text that shares no prefix at all."
            + " z" * 160,
        ],
        "lang": ["en", "en", "en", "en", "en"],
        "source": ["s"] * 5,
        "n_chars": [0, 0, 0, 0, 0],
    })
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return str(d)


@pytest.fixture(scope="module")
def sf_crossband(tmp_path_factory):
    """Two near-identical docs whose lengths straddle a band boundary
    (47 vs 49 chars, bands 2 and 3) — found only via the ghost copy."""
    d = tmp_path_factory.mktemp("sf_crossband")
    a = "abcdefghij klmnopqrst uvwxyz abcdefghij klmnop"   # 46
    docs = pd.DataFrame({
        "doc_id": [10, 11, 12],
        "text": [a + "q",            # 47 chars → band 2
                 a + "qrs",          # 49 chars → band 3, prefix dist 2
                 "W" * 200],         # far away
        "lang": ["en", "en", "en"],
        "source": ["s"] * 3,
        "n_chars": [47, 49, 200],
    })
    docs.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    pd.DataFrame({
        "event_id": [0], "ts": [_ts("2024-01-01T00:00")],
        "user_id": pd.array([1], dtype="Int64"),
        "event_type": ["click"], "value": [1.0], "props": ["{}"],
    }).to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


def test_percentiles_cont_interpolates_and_degenerates(ray_session, sf11):
    out = quantiles.events_value_percentiles_cont(sf11) \
        .sort_values("event_type").reset_index(drop=True)
    # click values: [1,2,4,9,9]; view values: [3,3,7,5,6]
    click = np.array([1.0, 2.0, 4.0, 9.0, 9.0])
    view = np.array([3.0, 3.0, 5.0, 6.0, 7.0])
    exp = {
        "click": (np.percentile(click, 50), np.percentile(click, 90)),
        "view": (np.percentile(view, 50), np.percentile(view, 90)),
    }
    for _, r in out.iterrows():
        e50, e90 = exp[r["event_type"]]
        assert r["p50_cont"] == pytest.approx(e50, abs=1e-6)
        assert r["p90_cont"] == pytest.approx(e90, abs=1e-6)


def test_percentiles_cont_all_equal_group(ray_session, tmp_path):
    d = tmp_path / "sfeq"
    d.mkdir()
    pd.DataFrame({
        "event_id": [0, 1, 2],
        "ts": [_ts("2024-01-01T00:00")] * 3,
        "user_id": pd.array([1, 1, 1], dtype="Int64"),
        "event_type": ["flat"] * 3,
        "value": [5.5, 5.5, 5.5], "props": ["{}"] * 3,
    }).to_parquet(os.path.join(d, "events.parquet"), index=False)
    out = quantiles.events_value_percentiles_cont(str(d))
    assert out["p50_cont"].tolist() == [5.5]
    assert out["p90_cont"].tolist() == [5.5]


def test_value_trend_exact_line(ray_session, tmp_path):
    d = tmp_path / "sflin"
    d.mkdir()
    ts = [np.datetime64("2024-01-01", "us") + np.timedelta64(i, "D")
          for i in range(6)]
    pd.DataFrame({
        "event_id": range(6), "ts": ts,
        "user_id": pd.array([1] * 6, dtype="Int64"),
        "event_type": ["a"] * 6,
        # v = 2·t + 1 exactly → corr 1, slope 2 per day
        "value": [1.0, 3.0, 5.0, 7.0, 9.0, 11.0],
        "props": ["{}"] * 6,
    }).to_parquet(os.path.join(d, "events.parquet"), index=False)
    out = mlprep.events_value_trend(str(d)).to_pandas()
    assert out["n"].tolist() == [6]
    assert out["corr_vt"].iloc[0] == pytest.approx(1.0, abs=1e-6)
    assert out["slope_per_day"].iloc[0] == pytest.approx(2.0, abs=1e-6)


def test_type_islands_null_users_and_ties(ray_session, sf11):
    out = windows.events_type_islands(sf11).to_pandas()
    u1 = out[out["user_id"] == 1]
    assert u1["event_type"].tolist() == ["click", "view", "click"]
    assert u1["n_events"].tolist() == [2, 2, 1]
    assert u1["start_id"].tolist() == [0, 2, 4]
    # the two NULL-user clicks form ONE island (NULL groups like SQL)
    nul = out[out["user_id"].isna()]
    assert len(nul) == 1
    assert int(nul["n_events"].iloc[0]) == 2
    u2 = out[out["user_id"] == 2]
    assert u2["n_events"].tolist() == [3]


def test_hourly_ohlc_tiebreaks(ray_session, sf11):
    out = windows.events_hourly_ohlc(sf11).to_pandas()
    h2 = out[out["hour"] == pd.Timestamp("2024-01-01T01:00:00")]
    # two 01:00 events tie on ts — event_id 7 (value 7.0) opens
    assert h2["open_v"].tolist() == [7.0]
    assert h2["close_v"].tolist() == [6.0]
    assert h2["high_v"].tolist() == [7.0]
    assert h2["low_v"].tolist() == [5.0]
    h1 = out[out["hour"] == pd.Timestamp("2024-01-01T00:00:00")]
    assert h1["open_v"].tolist() == [1.0]   # id 0 beats NULL-user id 5 tie
    assert int(h1["n_events"].iloc[0]) == 7


def test_editdist_same_band_pairs(ray_session, sf11):
    out = textops.documents_editdist_dups(sf11).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (1, 2) in pairs            # 1 edit + 2-char length diff
    assert (3, 4) in pairs            # 1 edit + 4-char length diff
    assert all(p in {(1, 2), (3, 4)} for p in pairs)
    d12 = int(out.loc[(out["doc_a"] == 1) & (out["doc_b"] == 2),
                      "dist"].iloc[0])
    assert d12 == 1  # quick→quack: one substitution inside the prefix


def test_editdist_cross_band_counted_exactly_once(ray_session,
                                                  sf_crossband):
    out = textops.documents_editdist_dups(sf_crossband).to_pandas()
    assert out["doc_a"].tolist() == [10]
    assert out["doc_b"].tolist() == [11]
    assert out["dist"].tolist() == [2]


def test_banded_levenshtein_matches_reference():
    import itertools
    def ref(a, b):
        la, lb = len(a), len(b)
        dp = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, lb + 1):
                cur = min(prev + (a[i - 1] != b[j - 1]),
                          dp[j] + 1, dp[j - 1] + 1)
                prev, dp[j] = dp[j], cur
        return dp[lb]
    rng = np.random.RandomState(7)
    alpha = "abc"
    for _ in range(200):
        a = "".join(rng.choice(list(alpha), rng.randint(0, 9)))
        b = "".join(rng.choice(list(alpha), rng.randint(0, 9)))
        for k in (0, 1, 2, 4):
            got = textops._banded_levenshtein(a, b, k)
            want = ref(a, b)
            assert (got == want) if want <= k else (got == k + 1), \
                (a, b, k, got, want)
