"""HyperLogLog distinct-count sketch: vectorized kernel accuracy on
planted cardinalities, merge associativity, and end-to-end agreement with
the exact operator on the sf0.01 events table. (The exact operator itself
is swept by the DuckDB oracle harness in test_oracles.py.)"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from gpml2pvjson_js_ray.pipelines.sketches import (  # noqa: E402
    _clz64, _hll_estimate, _hll_registers, _splitmix64,
    events_distinct_users, events_distinct_users_hll)

SF_DIR = "/root/testdata/sf0.01"


def test_clz64_matches_bit_length():
    rng = np.random.RandomState(7)
    vals = np.concatenate([
        np.array([0, 1, 2, 3, 2**63, 2**64 - 1], dtype=np.uint64),
        rng.randint(0, 2**63, size=500).astype(np.uint64)])
    got = _clz64(vals)
    want = np.array([64 - int(v).bit_length() for v in vals])
    assert (got == want).all()


def test_splitmix64_is_uniformish():
    h = _splitmix64(np.arange(100_000, dtype=np.uint64))
    # bucket into 64 bins by top bits; all bins within 10% of uniform
    counts = np.bincount((h >> np.uint64(58)).astype(int), minlength=64)
    assert counts.min() > 100_000 / 64 * 0.9
    assert counts.max() < 100_000 / 64 * 1.1


@pytest.mark.parametrize("n", [50, 1_000, 50_000])
def test_hll_estimate_within_expected_error(n):
    keys = np.arange(n, dtype=np.int64) * 7919 + 13
    est = _hll_estimate(_hll_registers(keys, p=14))
    # std error 1.04/sqrt(2^14) ~ 0.8%; allow 4 sigma + small-n slack
    assert abs(est - n) / n < 0.04


def test_hll_merge_equals_single_pass():
    keys = (np.arange(30_000, dtype=np.int64) * 104729) % 10_000
    a = _hll_registers(keys[:17_000], p=12)
    b = _hll_registers(keys[17_000:], p=12)
    merged = np.maximum(a, b)
    single = _hll_registers(keys, p=12)
    assert (merged == single).all()


def test_hll_close_to_exact_on_events(ray_session):
    exact = events_distinct_users(SF_DIR).to_pandas()
    approx = events_distinct_users_hll(SF_DIR).to_pandas()
    assert list(exact["event_type"]) == list(approx["event_type"])
    for _, row in exact.merge(approx, on="event_type").iterrows():
        err = abs(row["distinct_users_est"] - row["distinct_users"])
        assert err / max(1, row["distinct_users"]) < 0.05, row


def test_cms_top_users_matches_exact_on_skew(ray_session, tmp_path):
    """Planted Zipf-ish skew: the CMS top-k must contain the true heavy
    hitters with estimates >= true counts (CMS never underestimates)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gpml2pvjson_js_ray.pipelines.sketches import (events_top_users,
                                                       events_top_users_cms)

    rng = np.random.RandomState(3)
    # heavy users 0..4 with 400-800 events; 500 background users w/ ~4
    users = np.concatenate(
        [np.repeat(np.arange(5), [800, 700, 600, 500, 400]),
         rng.randint(100, 600, size=2000)]).astype(np.int64)
    rng.shuffle(users)
    n = len(users)
    t = pa.table({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pa.array(np.zeros(n, dtype="datetime64[us]")),
        "user_id": users,
        "event_type": ["e"] * n,
        "value": np.ones(n),
        "props": ["{}"] * n})
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))

    exact = events_top_users(str(d), k=5).to_pandas()
    approx = events_top_users_cms(str(d), k=5).to_pandas()
    assert list(exact["user_id"]) == [0, 1, 2, 3, 4]
    assert set(approx["user_id"]) == {0, 1, 2, 3, 4}
    truth = dict(zip(exact["user_id"], exact["n_events"]))
    for uid, est in zip(approx["user_id"], approx["est_events"]):
        assert est >= truth[uid]          # CMS overestimates only
        assert est <= truth[uid] * 1.5    # ...and not grossly here


def test_cms_merge_is_order_invariant():
    from gpml2pvjson_js_ray.pipelines.sketches import _cms_fold

    rng = np.random.RandomState(11)
    users = rng.randint(0, 1000, size=5000).astype(np.int64)
    ids, cnt = np.unique(users, return_counts=True)
    whole = _cms_fold(ids, cnt.astype(np.int64), 512)
    ids_a, cnt_a = np.unique(users[:2500], return_counts=True)
    ids_b, cnt_b = np.unique(users[2500:], return_counts=True)
    split = (_cms_fold(ids_a, cnt_a.astype(np.int64), 512)
             + _cms_fold(ids_b, cnt_b.astype(np.int64), 512))
    assert (whole == split).all()


def test_bloom_no_false_negatives_and_low_fp():
    from gpml2pvjson_js_ray.pipelines.joins import (_bloom_contains,
                                                    _bloom_words)

    keys = np.arange(0, 20000, 2, dtype=np.int64)
    probes = np.arange(1, 20001, 2, dtype=np.int64)
    m = 1 << 17  # ~13 bits/key
    w = _bloom_words(keys, m)
    assert _bloom_contains(w, keys, m).all()  # Bloom never drops a member
    assert _bloom_contains(w, probes, m).mean() < 0.02
    # partial-build OR-merge == whole build (the distributed fold)
    merged = _bloom_words(keys[:5000], m) | _bloom_words(keys[5000:], m)
    assert (merged == w).all()
