"""Planted semantics for the session-12 operators: Pareto skyline
(dominance ties, local-skyline combiner property), peak concurrent
users (closed-interval endpoint ties), and label-propagation
communities (bridge edge must NOT merge two cliques; refinement of
connected components). sf-scale value parity with DuckDB is swept by
test_oracles.py; these pin what the synthetic corpus can't reach."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

from gpml2pvjson_js_ray.pipelines import graph, relational, windows  # noqa: E402


def _ts(s):
    return np.datetime64(s, "us")


# -- orders_skyline -----------------------------------------------------------

@pytest.fixture(scope="module")
def sf_skyline(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_sky")
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4, 5, 6, 7],
        "o_custkey": [0] * 7,
        "o_orderstatus": ["F"] * 7,
        "o_totalprice": [100.0, 100.0, 100.0, 150.0, 150.0, 200.0, 50.0],
        "o_orderdate": [_ts("2024-01-01"), _ts("2024-01-01"),
                        _ts("2024-01-02"), _ts("2024-01-02"),
                        _ts("2024-01-03"), _ts("2024-01-03"),
                        _ts("2024-01-01")],
        "o_orderpriority": ["1-URGENT"] * 7,
    })
    orders.to_parquet(os.path.join(d, "orders.parquet"), index=False)
    return str(d)


def test_skyline_planted_with_ties(ray_session, sf_skyline):
    # 1,2: equal (date, price) — mutually non-dominating, both survive.
    # 3: same price as 1 but later date — dominated.
    # 4: frontier (pricier than anything earlier-or-equal to its date).
    # 5: same price as 4, later — dominated. 6: frontier. 7: dominated.
    out = relational.orders_skyline(sf_skyline).to_pandas()
    assert sorted(out["o_orderkey"]) == [1, 2, 4, 6]


def test_skyline_local_combiner_property(sf_skyline):
    """skyline(union of block skylines) == skyline(all rows), with the
    frontier spread adversarially across blocks."""
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_skyline, "orders.parquet"),
                      columns=["o_orderkey", "o_orderdate", "o_totalprice"])
    full = relational._skyline_block(t)
    # adversarial split: frontier members 1,4 in one block, 2,6 in other
    idx_a = [0, 3, 4]   # keys 1, 4, 5
    idx_b = [1, 2, 5, 6]  # keys 2, 3, 6, 7
    la = relational._skyline_block(t.take(idx_a))
    lb = relational._skyline_block(t.take(idx_b))
    merged = relational._skyline_block(pa.concat_tables([la, lb]))
    assert (sorted(merged.column("o_orderkey").to_pylist())
            == sorted(full.column("o_orderkey").to_pylist()))
    assert relational._skyline_block(t.slice(0, 0)).num_rows == 0


# -- events_peak_concurrent_users --------------------------------------------

@pytest.fixture(scope="module")
def sf_conc(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_conc")
    rows = [
        # day 1: u1 [00:00,02:00], u2 [01:00,03:00], u3 [02:00,04:00]
        # u1's end touches u3's start at 02:00 — closed intervals count
        # all three simultaneously → peak 3
        (1, "2024-01-01T00:00"), (1, "2024-01-01T02:00"),
        (2, "2024-01-01T01:00"), (2, "2024-01-01T03:00"),
        (3, "2024-01-01T02:00"), (3, "2024-01-01T04:00"),
        # u4: single event (zero-width span) — still counts at 05:00
        (4, "2024-01-01T05:00"),
        # day 2: two disjoint spans → peak 1
        (1, "2024-01-02T00:00"), (1, "2024-01-02T00:10"),
        (2, "2024-01-02T01:00"), (2, "2024-01-02T01:10"),
    ]
    events = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": [_ts(t) for _, t in rows],
        "user_id": [u for u, _ in rows],
        "event_type": ["click"] * len(rows),
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    events.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


def test_peak_concurrency_endpoint_touch(ray_session, sf_conc):
    out = windows.events_peak_concurrent_users(sf_conc).to_pandas()
    got = {pd.Timestamp(r["day"]).day: int(r["peak_concurrency"])
           for _, r in out.iterrows()}
    assert got == {1: 3, 2: 1}


# -- label propagation --------------------------------------------------------

def _clique(ids):
    return [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]


def test_label_propagation_bridge_does_not_merge(ray_session):
    import ray.data as rd
    E = _clique([1, 2, 3, 4]) + _clique([5, 6, 7, 8]) + [(4, 5)]
    edges = rd.from_items([{"s": a, "t": b} for a, b in E])
    nodes = rd.from_items([{"n": i} for i in range(1, 9)])
    out = (graph.label_propagation(edges, nodes, "s", "t", iters=4)
           .to_pandas())
    got = dict(zip(out["node"], out["label"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 5, 8: 5}

    # refinement invariant: communities sit INSIDE connected components,
    # which the bridge edge merges into one class
    comp = (graph.connected_components(edges, nodes, "s", "t")
            .to_pandas())
    assert set(comp["label"]) == {1}


def test_label_propagation_isolated_node_keeps_self(ray_session):
    import ray.data as rd
    edges = rd.from_items([{"s": 1, "t": 2}])
    nodes = rd.from_items([{"n": i} for i in [1, 2, 9]])
    out = (graph.label_propagation(edges, nodes, "s", "t", iters=2)
           .to_pandas())
    got = dict(zip(out["node"], out["label"]))
    assert got[9] == 9 and got[1] == 1 and got[2] == 1


# -- events_funnel_3step -------------------------------------------------------

@pytest.fixture(scope="module")
def sf_funnel(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_funnel")
    rows = [
        # u1: full chain view < click < purchase
        (1, "view", "2024-01-01T00:00"), (1, "click", "2024-01-01T00:05"),
        (1, "purchase", "2024-01-01T00:10"),
        # u2: click ties the first view exactly — strict > excludes it,
        # so the later purchase has no step-2 anchor
        (2, "view", "2024-01-01T00:00"), (2, "click", "2024-01-01T00:00"),
        (2, "purchase", "2024-01-01T01:00"),
        # u3: pre-view click ignored; purchase BEFORE the qualifying
        # click does not count
        (3, "click", "2024-01-01T00:00"), (3, "view", "2024-01-01T00:05"),
        (3, "click", "2024-01-01T00:06"),
        (3, "purchase", "2024-01-01T00:04"),
        # u4: purchase precedes the view — step 1 only
        (4, "purchase", "2024-01-01T00:00"), (4, "view", "2024-01-01T00:01"),
        # u5: never viewed — outside the funnel entirely
        (5, "click", "2024-01-01T00:00"), (5, "purchase", "2024-01-01T00:01"),
    ]
    events = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": [_ts(t) for _, _, t in rows],
        "user_id": [u for u, _, _ in rows],
        "event_type": [k for _, k, _ in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    events.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


def test_funnel_strict_ordering_and_ties(ray_session, sf_funnel):
    out = windows.events_funnel_3step(sf_funnel).to_pandas()
    got = dict(zip(out["step_idx"], out["n_users"]))
    assert got == {1: 4, 2: 2, 3: 1}
    assert list(out["step"]) == ["view", "view>click",
                                 "view>click>purchase"]


@pytest.fixture(scope="module")
def sf_funnel_null(tmp_path_factory):
    """NULL-user full chain + a lone user with no clicks at all (the
    empty-join-side bucket that crashed the first implementation)."""
    d = tmp_path_factory.mktemp("sf_funnel_null")
    rows = [
        # NULL user completes the chain — SQL counts the NULL group in
        # step 1 (GROUP BY keeps it) but the step-2/3 equality joins
        # can never match NULL, so steps 2-3 exclude it
        (None, "view", "2024-01-01T00:00"),
        (None, "click", "2024-01-01T00:05"),
        (None, "purchase", "2024-01-01T00:10"),
        # u1: view + purchase, NO click anywhere → its bucket's click
        # join side is empty
        (1, "view", "2024-01-01T00:00"),
        (1, "purchase", "2024-01-01T00:10"),
    ]
    events = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": [_ts(t) for _, _, t in rows],
        "user_id": pd.array([u for u, _, _ in rows], dtype="Int64"),
        "event_type": [k for _, k, _ in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    events.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


def test_funnel_null_user_and_empty_click_side(ray_session,
                                               sf_funnel_null):
    out = windows.events_funnel_3step(sf_funnel_null).to_pandas()
    got = dict(zip(out["step_idx"], out["n_users"]))
    assert got == {1: 2, 2: 0, 3: 0}


# -- embeddings_kcenter_coreset ------------------------------------------------

@pytest.fixture(scope="module")
def sf_kcenter(tmp_path_factory):
    """Three well-separated clusters of 4 vectors each (unit-norm
    after normalization; intra-cluster distance << inter-cluster)."""
    d = tmp_path_factory.mktemp("sf_kcenter")
    rng = np.random.default_rng(7)
    centers = np.eye(3)                      # orthogonal unit centers
    rows = []
    for ci in range(3):
        for j in range(4):
            v = centers[ci] + rng.normal(0, 0.01, 3)
            rows.append((ci * 4 + j, v))
    emb = pd.DataFrame({
        "vec_id": [i for i, _ in rows],
        "embedding": [list(map(float, v)) for _, v in rows],
        "label": [0] * len(rows),
    })
    emb.to_parquet(os.path.join(d, "embeddings.parquet"), index=False)
    return str(d)


def test_kcenter_covers_planted_clusters(ray_session, sf_kcenter):
    from gpml2pvjson_js_ray.pipelines import simops
    out = simops.embeddings_kcenter_coreset(sf_kcenter, k=3)
    assert list(out["order_idx"]) == [0, 1, 2]
    assert out["vec_id"].iloc[0] == 0        # deterministic min-id seed
    # greedy k-center picks one point per planted cluster before any
    # second point of an already-covered cluster
    assert sorted(v // 4 for v in out["vec_id"]) == [0, 1, 2]
    # coverage radius non-increasing from the first real selection on
    radii = out["radius"].to_numpy()
    assert radii[0] == -1.0
    assert all(radii[i] >= radii[i + 1] for i in range(1, len(radii) - 1))


def test_kcenter_radius_tracks_farthest(ray_session, sf_kcenter):
    from gpml2pvjson_js_ray.pipelines import simops
    out = simops.embeddings_kcenter_coreset(sf_kcenter, k=2)
    # with one center at cluster 0, the farthest point is in another
    # cluster at ~sqrt(2) for orthogonal unit vectors
    assert abs(out["radius"].iloc[1] - np.sqrt(2)) < 0.05


def test_kcenter_k_exceeds_distinct_points(ray_session, tmp_path):
    """k larger than the corpus: selection stops at the distinct-point
    budget instead of emitting duplicate vec_ids."""
    from gpml2pvjson_js_ray.pipelines import simops
    emb = pd.DataFrame({
        "vec_id": [1, 2, 3],
        "embedding": [[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]],  # 3 & 2 equal
        "label": [0, 0, 0],
    })
    emb.to_parquet(os.path.join(tmp_path, "embeddings.parquet"),
                   index=False)
    out = simops.embeddings_kcenter_coreset(str(tmp_path), k=5)
    assert out["vec_id"].is_unique
    assert len(out) == 2        # the duplicate vector adds no coverage
