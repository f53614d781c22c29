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
