"""Distributed quantiles over the events table: exact per-group
percentiles (discrete — returns actual elements, so cross-engine parity
is exact) and a merging t-digest sketch (the 100-TB path: constant-size
state per group however large the group).

Exact variant partitioning assumption: one group's values must fit a
task (groupby co-location + in-group sort). event_type has few, huge
groups, which is exactly where the exact path stops scaling — the
t-digest variant exists for that regime: per-batch digests are ≤ delta
centroids each (a few KB), the merge shuffle carries kilobytes per
group, and accuracy concentrates at the tails via the arcsin scale
function (Dunning & Ertl's t-digest, vectorized: no Python loop touches
row data — centroids cluster by a floor(k(q)) bucket id + reduceat).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

_QS = (0.25, 0.50, 0.90, 0.99)
_QCOLS = ("p25", "p50", "p90", "p99")


def _read_events(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                           columns=["event_type", "value"])


# -- exact (quantile_disc semantics: element at ceil(q*n)-1) -----------------

def events_value_quantiles(sf_dir: str):
    """Exact p25/p50/p90/p99 of value per event type, discrete-quantile
    semantics (DuckDB quantile_disc): the selected value IS an element of
    the group, so no interpolation arithmetic can diverge between
    engines."""

    def exact_group(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["value"].to_numpy())
        n = len(v)
        idx = [int(np.ceil(q * n)) - 1 for q in _QS]
        out = {"event_type": [df["event_type"].iloc[0]]}
        for col, i in zip(_QCOLS, idx):
            out[col] = [v[max(0, i)]]
        return pd.DataFrame(out)

    return (_read_events(sf_dir)
            .groupby("event_type")
            .map_groups(exact_group, batch_format="pandas")
            .sort("event_type"))


SQL_EVENTS_VALUE_QUANTILES = """
SELECT event_type,
       quantile_disc(value, 0.25) AS p25,
       quantile_disc(value, 0.50) AS p50,
       quantile_disc(value, 0.90) AS p90,
       quantile_disc(value, 0.99) AS p99
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# -- t-digest sketch ---------------------------------------------------------

def _tdigest_compress(means: np.ndarray, weights: np.ndarray,
                      delta: float = 100.0):
    """Cluster centroids by the arcsin scale function: centroids whose
    mid-quantile lands in the same k-bucket merge (weighted mean). One
    sort + one reduceat — fully vectorized, deterministic."""
    order = np.argsort(means, kind="stable")
    m, w = means[order], weights[order]
    total = w.sum()
    if total == 0 or len(m) == 0:
        return m, w
    q = (np.cumsum(w) - w / 2.0) / total
    k = np.floor(delta / (2.0 * np.pi)
                 * (np.arcsin(2.0 * q - 1.0) + np.pi / 2.0))
    starts = np.flatnonzero(
        np.concatenate([[True], k[1:] != k[:-1]]))
    gw = np.add.reduceat(w, starts)
    gm = np.add.reduceat(m * w, starts) / gw
    return gm, gw


def _tdigest_quantiles(means: np.ndarray, weights: np.ndarray,
                       qs) -> np.ndarray:
    """Linear interpolation between centroid means at their cumulative
    mid-weights (np.interp clamps at the extreme centroids)."""
    cum = np.cumsum(weights) - weights / 2.0
    return np.interp(np.asarray(qs) * weights.sum(), cum, means)


def events_value_quantiles_tdigest(sf_dir: str, delta: float = 100.0):
    """Approximate per-type percentiles in ONE streaming pass: each batch
    folds its values into ≤ delta centroids per type; groups merge
    centroid lists and re-compress. Shuffle volume is O(types · delta)
    floats regardless of corpus size."""

    def batch_digest(b: pa.Table) -> pa.Table:
        types = b.column("event_type").to_numpy(zero_copy_only=False)
        vals = b.column("value").to_numpy(zero_copy_only=False)
        out_t, out_m, out_w = [], [], []
        for t in np.unique(types):
            v = vals[types == t]
            gm, gw = _tdigest_compress(
                v.astype(np.float64), np.ones(len(v)), delta)
            out_t.append(str(t))
            out_m.append(gm.tolist())
            out_w.append(gw.tolist())
        return pa.table({
            "event_type": pa.array(out_t, type=pa.string()),
            "means": pa.array(out_m, type=pa.list_(pa.float64())),
            "weights": pa.array(out_w, type=pa.list_(pa.float64()))})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        m = np.concatenate([np.asarray(x) for x in df["means"]])
        w = np.concatenate([np.asarray(x) for x in df["weights"]])
        gm, gw = _tdigest_compress(m, w, delta)
        est = _tdigest_quantiles(gm, gw, _QS)
        out = {"event_type": [df["event_type"].iloc[0]]}
        for col, v in zip(_QCOLS, est):
            out[col] = [float(v)]
        return pd.DataFrame(out)

    return (_read_events(sf_dir)
            .map_batches(batch_digest, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(merge, batch_format="pandas")
            .sort("event_type"))


# -- robust outlier screen: median / MAD -------------------------------------

def events_mad_outliers(sf_dir: str, c: float = 3.0):
    """Per event type: median, median-absolute-deviation, and how many
    values sit beyond c·MAD — the robust (breakdown-point-0.5) outlier
    screen a quality pipeline runs where mean/std would be dragged by
    the very outliers it hunts.

    Partitioning assumption: same as events_value_quantiles — one
    type's VALUE COLUMN fits a task (`groupby.map_groups`
    co-location); the t-digest variant above is the constant-state
    fallback. Medians interpolate exactly like SQL median() — the mean
    of the two middle elements — and every comparison (|v−med| >
    c·MAD) is the identical IEEE-double expression in both engines, so
    the counts cannot drift. The displayed med/mad are exact at 6dp
    (values are 2-decimal, medians ≤ 3-decimal)."""
    def grp(df: pd.DataFrame) -> pd.DataFrame:
        raw = df["value"].to_numpy()
        v = np.sort(raw)
        n = len(v)
        med = (v[(n - 1) // 2] + v[n // 2]) / 2.0
        ad = np.abs(raw - med)
        sad = np.sort(ad)
        mad = (sad[(n - 1) // 2] + sad[n // 2]) / 2.0
        return pd.DataFrame({
            "event_type": [df["event_type"].iloc[0]],
            "med": [round(med, 6)], "mad": [round(mad, 6)],
            "n_outliers": np.array([(ad > c * mad).sum()],
                                   dtype=np.int64),
            "n_events": np.array([n], dtype=np.int64)})

    return (_read_events(sf_dir)
            .groupby("event_type")
            .map_groups(grp, batch_format="pandas")
            .sort("event_type"))


SQL_EVENTS_MAD_OUTLIERS = """
WITH med AS (
  SELECT event_type, median(value) AS m
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, abs(e.value - med.m) AS ad, med.m
  FROM events e JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, median(ad) AS md
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       round(any_value(d.m), 6)  AS med,
       round(any_value(a.md), 6) AS mad,
       CAST(count(*) FILTER (d.ad > 3.0 * a.md) AS BIGINT) AS n_outliers,
       CAST(count(*) AS BIGINT) AS n_events
FROM dev d JOIN mad a USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


# -- per-group quantile THRESHOLD filter (two-pass broadcast pattern) --------

def documents_above_p90_length(sf_dir: str, q: float = 0.9):
    """Keep documents strictly longer than their source's q-quantile
    length — the "keep the long tail per domain" curation filter.

    The scale pattern is the point: pass 1 reduces to per-(source,
    length) COUNTS (per-block arrow partials, one vocabulary-sized
    groupby — the exchange is bounded by |sources|×|distinct lengths|,
    never rows), the per-source thresholds are derived from the count
    histogram's cumulative sum (exact quantile_disc semantics: element
    at ceil(q*n)-1, matching DuckDB), and pass 2 filters map-only with
    the TINY threshold table broadcast via ray.put. No per-group sort
    of raw rows, no row shuffle at all. Output (doc_id, source,
    n_chars) by doc_id; DuckDB-oracled."""
    import math

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"source": b.column("source"),
                      "n_chars": b.column("n_chars"),
                      "cnt": pa.array(np.ones(len(b), dtype=np.int64))})
        return (pa.TableGroupBy(t, ["source", "n_chars"])
                .aggregate([("cnt", "sum")])
                .rename_columns(["source", "n_chars", "cnt"]))

    hist = (docs.map_batches(partial, batch_format="pyarrow")
            .groupby(["source", "n_chars"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas())

    thresholds: dict[str, int] = {}
    for src, g in hist.sort_values("n_chars").groupby("source"):
        cum = g["cnt"].cumsum()
        n = int(cum.iloc[-1])
        k = math.ceil(q * n)  # rank of the quantile element (1-based)
        thresholds[src] = int(g["n_chars"].to_numpy()[
            int(np.searchsorted(cum.to_numpy(), k))])
    ref = ray.put(thresholds)

    def keep_above(b: pa.Table) -> pa.Table:
        import ray as _ray
        th = _ray.get(ref)
        srcs = b.column("source").to_numpy(zero_copy_only=False)
        lens = b.column("n_chars").to_numpy(zero_copy_only=False)
        # batch-distinct resolve: Python touches |distinct sources| keys,
        # the row-wise compare is pure numpy
        uniq, inv = np.unique(srcs, return_inverse=True)
        th_vec = np.asarray([th[u] for u in uniq], dtype=np.int64)
        return b.filter(pa.array(lens > th_vec[inv]))

    return (docs.map_batches(keep_above, batch_format="pyarrow")
            .sort("doc_id"))


SQL_DOCUMENTS_ABOVE_P90_LENGTH = """
WITH th AS (
  SELECT source, quantile_disc(n_chars, 0.9) AS p90
  FROM documents GROUP BY source)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN th USING (source)
WHERE d.n_chars > th.p90
ORDER BY d.doc_id
"""


# -- per-group winsorization (outlier clipping for feature prep) --------------

def events_value_winsorized(sf_dir: str, q_lo: float = 0.01,
                            q_hi: float = 0.99):
    """Winsorize value per event type: clip to the group's [p01, p99]
    discrete quantiles — the outlier-robust feature-scaling prep that
    precedes z-scoring at training time. Clipped values are exact group
    ELEMENTS (quantile_disc semantics), so no interpolation arithmetic
    can diverge between engines.

    Scale shape: pass 1 is the exact per-group quantile (groupby
    co-location + in-group sort — |event_type| groups; see the t-digest
    variant above for the huge-group regime), whose |types|-sized
    result broadcasts via ray.put; pass 2 is a pure vectorized clip
    map. Output (event_id, event_type, value_w) by event_id."""
    import ray

    def bounds_group(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["value"].to_numpy())
        n = len(v)
        lo = v[max(0, int(np.ceil(q_lo * n)) - 1)]
        hi = v[max(0, int(np.ceil(q_hi * n)) - 1)]
        return pd.DataFrame({"event_type": [df["event_type"].iloc[0]],
                             "lo": [lo], "hi": [hi]})

    bounds = (_read_events(sf_dir)
              .groupby("event_type")
              .map_groups(bounds_group, batch_format="pandas")
              .to_pandas())
    ref = ray.put({r.event_type: (r.lo, r.hi)
                   for r in bounds.itertuples()})

    def clip(b: pa.Table) -> pa.Table:
        import ray as _ray
        from .mlprep import _cached_bcast
        th = _cached_bcast(ref, lambda: _ray.get(ref))
        types = b.column("event_type").to_numpy(zero_copy_only=False)
        vals = b.column("value").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(types, return_inverse=True)
        lo = np.asarray([th[u][0] for u in uniq])[inv]
        hi = np.asarray([th[u][1] for u in uniq])[inv]
        return pa.table({
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type"),
            "value_w": pa.array(np.minimum(np.maximum(vals, lo), hi),
                                pa.float64())})

    import ray.data as rd
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "event_type", "value"])
    return ds.map_batches(clip, batch_format="pyarrow").sort("event_id")


# -- exact INTERPOLATED percentiles without group co-location ----------------

def events_value_percentiles_cont(sf_dir: str, qs=(0.5, 0.9),
                                  n_buckets: int = 4096):
    """Exact INTERPOLATED percentiles (SQL quantile_cont / numpy
    'linear': the value at fractional rank h = (n-1)·q, interpolated
    between the bracketing order statistics) per event type — the
    continuous twin of events_value_quantiles, built for the regime
    where a group does NOT fit one task.

    Scale shape (the point of this operator): no group ever co-locates
    and no per-group sort of raw rows happens anywhere. Three passes,
    each map-only with a constant-size exchange:
      1. per-type (n, min, max) — per-block arrow partials;
      2. per-(type, bucket) COUNT histogram, bucket = equi-width cell of
         the type's [min, max] span — exchange ≤ |types|·n_buckets rows;
      3. the cumulative histogram brackets every needed rank (floor(h)
         and ceil(h) per q) to its bucket, and ONLY rows in those
         ≤ 2·|qs| buckets per type are re-read (expected n/n_buckets
         rows each — the narrow second read).
    The bracketing order statistics are then exact group elements, and
    `vL + (vU - vL)·frac` is the same IEEE expression DuckDB's
    quantile_cont evaluates; both sides round 6dp. A type whose values
    are all equal (width 0) short-circuits to that value. A heavily
    concentrated distribution makes its collected bucket large (worst
    case one bucket holds the type); the production path recurses the
    bracket one level — this corpus never needs it."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    from .mlprep import _cached_bcast

    ds = _read_events(sf_dir)

    def stat_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"event_type": b.column("event_type"),
                      "n": pa.array(np.ones(len(b), dtype=np.int64)),
                      "vmin": b.column("value"),
                      "vmax": b.column("value")})
        return (pa.TableGroupBy(t, "event_type")
                .aggregate([("n", "sum"), ("vmin", "min"),
                            ("vmax", "max")])
                .rename_columns(["event_type", "n", "vmin", "vmax"]))

    stats = (ds.map_batches(stat_partial, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("n", alias_name="n"),
                        Min("vmin", alias_name="vmin"),
                        Max("vmax", alias_name="vmax"))
             .to_pandas())

    # per-type bucket scale; scale 0 == degenerate all-equal type
    scales = {r.event_type: (float(r.vmin),
                             (n_buckets / (r.vmax - r.vmin)
                              if r.vmax > r.vmin else 0.0))
              for r in stats.itertuples()}
    scale_ref = ray.put(scales)

    def bucket_of(types: np.ndarray, vals: np.ndarray, lut) -> np.ndarray:
        uniq, inv = np.unique(types, return_inverse=True)
        lo = np.asarray([lut[u][0] for u in uniq])[inv]
        sc = np.asarray([lut[u][1] for u in uniq])[inv]
        return np.clip((vals - lo) * sc, 0, n_buckets - 1).astype(np.int64)

    def hist_partial(b: pa.Table) -> pa.Table:
        import ray as _ray
        lut = _cached_bcast(scale_ref, lambda: _ray.get(scale_ref))
        types = b.column("event_type").to_numpy(zero_copy_only=False)
        vals = b.column("value").to_numpy(zero_copy_only=False)
        t = pa.table({"event_type": b.column("event_type"),
                      "bucket": pa.array(bucket_of(types, vals, lut)),
                      "cnt": pa.array(np.ones(len(b), dtype=np.int64))})
        return (pa.TableGroupBy(t, ["event_type", "bucket"])
                .aggregate([("cnt", "sum")])
                .rename_columns(["event_type", "bucket", "cnt"]))

    hist = (ds.map_batches(hist_partial, batch_format="pyarrow")
            .groupby(["event_type", "bucket"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas())

    # bracket each needed rank to its bucket (order_stat below
    # recomputes the cum-before offset from the same cumsum)
    needed: dict[str, set[int]] = {}          # type -> needed buckets
    ranks: dict[str, list[tuple[float, int, int]]] = {}  # type -> (h,kL,kU)
    for r in stats.itertuples():
        et, n = r.event_type, int(r.n)
        ranks[et] = []
        for q in qs:
            h = (n - 1) * float(q)
            ranks[et].append((h, int(np.floor(h)), int(np.ceil(h))))
        if scales[et][1] == 0.0:
            needed[et] = set()
            continue
        g = hist[hist["event_type"] == et].sort_values("bucket")
        buckets = g["bucket"].to_numpy()
        cum = g["cnt"].to_numpy().cumsum()
        need: set[int] = set()
        for _, k_lo, k_hi in ranks[et]:
            for k in (k_lo, k_hi):
                j = int(np.searchsorted(cum, k, side="right"))
                need.add(int(buckets[j]))
        needed[et] = need
    need_ref = ray.put({et: np.asarray(sorted(b), dtype=np.int64)
                        for et, b in needed.items()})

    def collect(b: pa.Table) -> pa.Table:
        import ray as _ray
        lut = _cached_bcast(scale_ref, lambda: _ray.get(scale_ref))
        nd = _cached_bcast(need_ref, lambda: _ray.get(need_ref))
        types = b.column("event_type").to_numpy(zero_copy_only=False)
        vals = b.column("value").to_numpy(zero_copy_only=False)
        bk = bucket_of(types, vals, lut)
        uniq, inv = np.unique(types, return_inverse=True)
        keep = np.zeros(len(b), dtype=bool)
        for i, u in enumerate(uniq):
            want = nd.get(u)
            if want is not None and len(want):
                rows = inv == i
                keep[rows] = np.isin(bk[rows], want)
        t = b.filter(pa.array(keep))
        return t.append_column("bucket", pa.array(bk[keep]))

    picked = ds.map_batches(collect, batch_format="pyarrow").to_pandas()

    out_rows = []
    for r in stats.itertuples():
        et = r.event_type
        vmin, sc = scales[et]
        row = {"event_type": et}
        if sc == 0.0:
            for q in qs:
                row[f"p{int(q * 100)}_cont"] = \
                    np.floor(vmin * 1e6 + 0.5) * 1e-6
            out_rows.append(row)
            continue
        # order statistic at rank k = sorted(bucket values)[k - cum_before]
        bvals = {int(bk): np.sort(g["value"].to_numpy())
                 for bk, g in picked[picked["event_type"] == et]
                 .groupby("bucket")}
        cum_g = hist[hist["event_type"] == et].sort_values("bucket")
        cum = cum_g["cnt"].to_numpy().cumsum()
        buckets = cum_g["bucket"].to_numpy()

        def order_stat(k: int) -> float:
            j = int(np.searchsorted(cum, k, side="right"))
            off = int(cum[j - 1]) if j else 0
            return float(bvals[int(buckets[j])][k - off])

        for q, (h, k_lo, k_hi) in zip(qs, ranks[et]):
            v_lo = order_stat(k_lo)
            v = v_lo if k_hi == k_lo else \
                v_lo + (order_stat(k_hi) - v_lo) * (h - k_lo)
            row[f"p{int(q * 100)}_cont"] = np.floor(v * 1e6 + 0.5) * 1e-6
        out_rows.append(row)
    return pd.DataFrame(out_rows).sort_values("event_type") \
        .reset_index(drop=True)


SQL_EVENTS_VALUE_PERCENTILES_CONT = """
SELECT event_type,
       floor(quantile_cont(value, 0.5) * 1000000.0 + 0.5) * 0.000001
           AS p50_cont,
       floor(quantile_cont(value, 0.9) * 1000000.0 + 0.5) * 0.000001
           AS p90_cont
FROM events GROUP BY event_type ORDER BY event_type
"""


SQL_EVENTS_VALUE_WINSORIZED = """
WITH th AS (
  SELECT event_type, quantile_disc(value, 0.01) AS lo,
         quantile_disc(value, 0.99) AS hi
  FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type,
       least(greatest(e.value, th.lo), th.hi) AS value_w
FROM events e JOIN th USING (event_type)
ORDER BY e.event_id
"""
