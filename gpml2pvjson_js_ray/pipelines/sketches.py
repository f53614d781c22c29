"""Distinct-count operators over the events table: exact (shuffled
two-level groupby with per-batch pre-dedup) and HyperLogLog (one streaming
pass, constant memory per group — the 100-TB path).

HLL layout: p-bit bucket index (2^p registers of max leading-zero-count),
vectorized end-to-end — a numpy splitmix64 hash, branchless clz, and
np.maximum.at register folds; no Python loop touches row data. Per-batch
register blocks are tiny ((event_type, 2^p bytes) per batch) so the merge
groupby shuffles kilobytes regardless of corpus size.

Flajolet et al.'s estimator with the standard linear-counting small-range
regime; deterministic (fixed hash), so tests pin exact expected estimates.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


# -- exact: count(distinct user_id) by event_type ---------------------------

def events_distinct_users(sf_dir: str):
    """Exact distinct users per event type. Per-batch dedup shrinks the
    shuffle to unique (event_type, user_id) pairs per block; the global
    dedup+count is a groupby on the pair, then a tiny per-type count."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def batch_distinct(b: pa.Table) -> pa.Table:
        return b.group_by(["event_type", "user_id"]).aggregate([])

    pairs = (ds.map_batches(batch_distinct, batch_format="pyarrow")
             .groupby(["event_type", "user_id"])
             .aggregate(Count(alias_name="_n"))
             .drop_columns(["_n"]))
    return (pairs.groupby("event_type")
            .aggregate(Count(alias_name="distinct_users"))
            .sort("event_type"))


SQL_EVENTS_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS distinct_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# -- HyperLogLog ------------------------------------------------------------

def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants) — a
    uniform 64-bit hash of int64/uint64 keys."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def _clz64(w: np.ndarray) -> np.ndarray:
    """Branchless vectorized count-leading-zeros for uint64 (0 → 64)."""
    n = np.full(w.shape, 64, dtype=np.int64)
    x = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        big = x >> s != 0
        n = np.where(big, n - shift, n)
        x = np.where(big, x >> s, x)
    return n - np.where(w != 0, 1, 0)


def _hll_registers(keys: np.ndarray, p: int) -> np.ndarray:
    h = _splitmix64(keys)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    rho = np.minimum(_clz64(w), 64 - p).astype(np.uint8) + 1
    regs = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting regime
    return est


def events_distinct_users_hll(sf_dir: str, p: int = 14):
    """Approximate distinct users per event type in ONE streaming pass:
    each batch folds into per-type register blocks (map_batches), blocks
    merge with an elementwise max inside groupby(event_type).map_groups.
    Constant ~2^p bytes of state per (type, batch) — the shuffle carries
    kilobytes total however large the corpus is, vs the exact variant's
    shuffle of every distinct pair. Standard error ≈ 1.04/√2^p (~0.8% at
    p=14)."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def batch_regs(b: pa.Table) -> pa.Table:
        types = b.column("event_type").to_numpy(zero_copy_only=False)
        users = b.column("user_id").to_numpy(zero_copy_only=False)
        out_t, out_r = [], []
        for t in np.unique(types):
            out_t.append(str(t))
            out_r.append(_hll_registers(users[types == t].astype(np.int64),
                                        p))
        return pa.table({
            "event_type": pa.array(out_t, type=pa.string()),
            "regs": pa.array([r.tobytes() for r in out_r],
                             type=pa.binary())})

    def merge(df: "pd.DataFrame") -> "pd.DataFrame":
        regs = np.frombuffer(df["regs"].iloc[0], dtype=np.uint8).copy()
        for blob in df["regs"].iloc[1:]:
            np.maximum(regs, np.frombuffer(blob, dtype=np.uint8), out=regs)
        return pd.DataFrame({
            "event_type": [df["event_type"].iloc[0]],
            "distinct_users_est": [round(_hll_estimate(regs), 1)]})

    return (ds.map_batches(batch_regs, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(merge, batch_format="pandas")
            .sort("event_type"))


# -- heavy hitters: exact and Count-Min Sketch --------------------------------

def events_top_users(sf_dir: str, k: int = 20):
    """Exact top-k users by event count — combiner pattern: per-batch
    partial counts (rows = distinct users per block) feed the groupby,
    so the shuffle moves a user table, never the event stream."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id"])

    def partial(b: pa.Table) -> pa.Table:
        ids, cnt = np.unique(
            b.column("user_id").to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"user_id": pa.array(ids),
                         "n": pa.array(cnt.astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(Sum("n", alias_name="n_events"))
            .sort(["n_events", "user_id"], descending=[True, False])
            .limit(k))


SQL_EVENTS_TOP_USERS = """
SELECT user_id, count(*) AS n_events
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id ASC LIMIT 20
"""


_CMS_SEEDS = np.array([0x243F6A8885A308D3, 0x13198A2E03707344,
                       0xA4093822299F31D0, 0x082EFA98EC4E6C89],
                      dtype=np.uint64)  # π hex digits (nothing up sleeve)


def _cms_fold(users: np.ndarray, counts: np.ndarray, w: int) -> np.ndarray:
    """(d, w) int64 Count-Min registers for pre-counted keys."""
    d = len(_CMS_SEEDS)
    cms = np.zeros((d, w), dtype=np.int64)
    u = users.astype(np.uint64)
    for r in range(d):
        idx = (_splitmix64(u ^ _CMS_SEEDS[r]) % np.uint64(w)).astype(
            np.int64)
        np.add.at(cms[r], idx, counts)
    return cms


def events_top_users_cms(sf_dir: str, k: int = 20, w: int = 2048):
    """Approximate top-k users by event count in ONE streaming pass —
    the point-frequency sketch completing the family (HLL: cardinality,
    t-digest: quantiles, MinHash/SimHash: similarity, CMS: frequency).

    Each batch folds its local user counts into a (d×w) Count-Min grid
    and nominates its local top-4k users as candidates; the merge sums
    the constant-size grids (8 KiB each, whatever the corpus size),
    unions the candidate sets, and reads each candidate's estimate as
    the min over rows. Standard heavy-hitter assumption (a global
    heavy hitter is locally heavy somewhere): sound on skewed data —
    `tests/test_sketches.py` pins it against the exact twin."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id"])
    n_local = 4 * k

    def batch_sketch(b: pa.Table) -> pa.Table:
        ids, cnt = np.unique(
            b.column("user_id").to_numpy(zero_copy_only=False),
            return_counts=True)
        cms = _cms_fold(ids, cnt.astype(np.int64), w)
        if len(ids) > n_local:
            keep = np.argpartition(-cnt, n_local)[:n_local]
            ids = ids[keep]
        return pa.table({
            "g": pa.array([0]),
            "cms": pa.array([cms.tobytes()], type=pa.binary()),
            "cands": pa.array([np.sort(ids).astype(np.int64).tobytes()],
                              type=pa.binary())})

    def merge(df: "pd.DataFrame") -> "pd.DataFrame":
        d = len(_CMS_SEEDS)
        cms = np.zeros((d, w), dtype=np.int64)
        cand_sets = []
        for blob, cblob in zip(df["cms"], df["cands"]):
            cms += np.frombuffer(blob, dtype=np.int64).reshape(d, w)
            cand_sets.append(np.frombuffer(cblob, dtype=np.int64))
        cands = np.unique(np.concatenate(cand_sets))
        u = cands.astype(np.uint64)
        est = np.full(len(cands), np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(d):
            idx = (_splitmix64(u ^ _CMS_SEEDS[r]) % np.uint64(w)).astype(
                np.int64)
            est = np.minimum(est, cms[r][idx])
        order = np.lexsort((cands, -est))[:k]
        return pd.DataFrame({"user_id": cands[order],
                             "est_events": est[order]})

    return (ds.map_batches(batch_sketch, batch_format="pyarrow")
            .groupby("g")
            .map_groups(merge, batch_format="pandas")
            .sort(["est_events", "user_id"], descending=[True, False]))
