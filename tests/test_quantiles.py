"""t-digest kernel accuracy on planted distributions, merge invariance,
and end-to-end agreement between the sketch and the exact distributed
quantiles on the sf0.01 events table. (The exact operator's value parity
is swept by the DuckDB oracle harness.)"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from gpml2pvjson_js_ray.pipelines.quantiles import (  # noqa: E402
    _tdigest_compress, _tdigest_quantiles, events_value_quantiles,
    events_value_quantiles_tdigest)

SF_DIR = "/root/testdata/sf0.01"


def test_tdigest_uniform_accuracy():
    rng = np.random.RandomState(11)
    v = rng.uniform(0, 1, 50_000)
    m, w = _tdigest_compress(v, np.ones(len(v)))
    assert len(m) <= 120  # ~delta centroids after one compress
    est = _tdigest_quantiles(m, w, [0.25, 0.5, 0.9, 0.99])
    assert abs(est[0] - 0.25) < 0.01
    assert abs(est[1] - 0.50) < 0.01
    assert abs(est[2] - 0.90) < 0.005   # tails tighter (arcsin scale)
    assert abs(est[3] - 0.99) < 0.003


def test_tdigest_merge_matches_single_pass():
    """Digesting in chunks then merging ≈ digesting everything at once."""
    rng = np.random.RandomState(5)
    v = rng.exponential(2.0, 40_000)
    whole_m, whole_w = _tdigest_compress(v, np.ones(len(v)))
    parts = []
    for chunk in np.array_split(v, 7):
        parts.append(_tdigest_compress(chunk, np.ones(len(chunk))))
    merged_m, merged_w = _tdigest_compress(
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]))
    qs = [0.25, 0.5, 0.9, 0.99]
    a = _tdigest_quantiles(whole_m, whole_w, qs)
    b = _tdigest_quantiles(merged_m, merged_w, qs)
    assert np.allclose(a, b, rtol=0.03)
    # total weight is conserved exactly
    assert merged_w.sum() == pytest.approx(len(v))


def test_tdigest_degenerate_inputs():
    m, w = _tdigest_compress(np.array([]), np.array([]))
    assert len(m) == 0
    m, w = _tdigest_compress(np.array([3.0]), np.array([1.0]))
    assert list(m) == [3.0] and list(w) == [1.0]
    # constant column: every quantile is that constant
    m, w = _tdigest_compress(np.full(1000, 7.5), np.ones(1000))
    assert np.allclose(_tdigest_quantiles(m, w, [0.1, 0.99]), 7.5)


def test_sketch_agrees_with_exact_on_sf(ray_session):
    exact = events_value_quantiles(SF_DIR).to_pandas() \
        .set_index("event_type")
    sketch = events_value_quantiles_tdigest(SF_DIR).to_pandas() \
        .set_index("event_type")
    assert sorted(exact.index) == sorted(sketch.index)
    for t in exact.index:
        for col in ("p25", "p50", "p90", "p99"):
            e, s = exact.loc[t, col], sketch.loc[t, col]
            scale = max(abs(e), 1e-9)
            assert abs(e - s) / scale < 0.05, (t, col, e, s)


def test_mad_outliers_planted(ray_session, tmp_path):
    """Hand-checked median/MAD: a constant group where MAD collapses to
    0 (any deviation is an outlier) and an even group exercising both
    interpolated medians."""
    import numpy as np
    import pandas as pd

    d = tmp_path / "mad"
    d.mkdir()
    vals = [1.0, 1.0, 1.0, 1.0, 100.0,   # type a: med 1, mad 0 → 1 outlier
            1.0, 2.0, 3.0, 4.0]          # type b: med 2.5, mad 1 → 0
    types = ["a"] * 5 + ["b"] * 4
    pd.DataFrame({
        "event_id": np.arange(len(vals), dtype=np.int64),
        "ts": np.array([np.datetime64("2024-01-01T00:00", "us")] * len(vals)),
        "user_id": np.zeros(len(vals), dtype=np.int64),
        "event_type": types,
        "value": vals,
        "props": ["{}"] * len(vals),
    }).to_parquet(str(d / "events.parquet"), index=False)

    from gpml2pvjson_js_ray.pipelines.quantiles import events_mad_outliers
    out = (events_mad_outliers(str(d)).to_pandas()
           .set_index("event_type"))
    assert out.loc["a", "med"] == 1.0 and out.loc["a", "mad"] == 0.0
    assert out.loc["a", "n_outliers"] == 1
    assert out.loc["b", "med"] == 2.5 and out.loc["b", "mad"] == 1.0
    assert out.loc["b", "n_outliers"] == 0
    assert out["n_events"].tolist() == [5, 4]


def test_winsorized_clips_to_group_elements(ray_session, tmp_path):
    """Type 'a' holds values 1..100: p01 = 1, p99 = 99 (discrete
    quantiles are group ELEMENTS), so only the 100 clips (to 99); a
    second type is untouched by 'a''s bounds."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gpml2pvjson_js_ray.pipelines.quantiles import (
        events_value_winsorized)

    vals = list(range(1, 101)) + [5.0, 500.0]
    types = ["a"] * 100 + ["b", "b"]
    t = pa.table({
        "event_id": pa.array(range(len(vals)), pa.int64()),
        "ts": pa.array(np.array(["2024-01-01"] * len(vals),
                                dtype="datetime64[us]")),
        "user_id": pa.array([1] * len(vals), pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array([float(v) for v in vals], pa.float64()),
        "props": pa.array(["{}"] * len(vals), pa.string())})
    d = tmp_path / "ev"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "events.parquet"))

    out = events_value_winsorized(str(d)).to_pandas()
    a = out[out["event_type"] == "a"]["value_w"].to_numpy()
    assert a.min() == 1.0 and a.max() == 99.0
    assert (np.sort(a)[:-1] == np.arange(1.0, 100.0)).all()
    b = out[out["event_type"] == "b"]["value_w"].to_numpy()
    # b's own p01/p99 over {5, 500} are both elements of {5, 500}
    assert set(b) == {5.0, 500.0}
