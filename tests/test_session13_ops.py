"""Planted semantics for the session-13 operators: the Q6/Q9/Q16/Q20
TPC-H-shaped joins (boundary inclusivity, NOT-IN anti-join,
distinct-count dedup, grouped-HAVING semi-join) and the daily cohort
retention matrix (cohort assignment, same-day dedup, NULL users).
sf-scale value parity with DuckDB is swept by test_oracles.py; these
pin the corner semantics the synthetic corpus can't isolate."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from gpml2pvjson_js_ray.pipelines import joins, windows  # noqa: E402
from gpml2pvjson_js_ray.pipelines import webgraph as webgraph_mod  # noqa: E402


def _ts(s):
    return np.datetime64(s, "us")


def _write(d, name, df):
    df.to_parquet(os.path.join(d, f"{name}.parquet"), index=False)


# -- forecast_revenue_change (Q6) ---------------------------------------------

def test_forecast_revenue_boundaries(ray_session, tmp_path):
    # discount bounds are INCLUSIVE on both ends; quantity bound is
    # strict; shipdate window is [lo, hi)
    _write(str(tmp_path), "lineitem", pd.DataFrame({
        "l_extendedprice": [100.0, 100.0, 100.0, 100.0, 100.0, 100.0],
        "l_discount":      [0.05,  0.07,  0.049, 0.071, 0.06,  0.06],
        "l_quantity":      [10.0,  23.0,  10.0,  10.0,  24.0,  10.0],
        "l_shipdate": [_ts("1996-06-01"), _ts("1996-06-01"),
                       _ts("1996-06-01"), _ts("1996-06-01"),
                       _ts("1996-06-01"), _ts("1997-01-01")],
    }))
    out = joins.forecast_revenue_change(str(tmp_path)).to_pandas()
    # rows 0 and 1 qualify: 100*0.05 + 100*0.07 = 12.0
    assert out["revenue_change"].tolist() == [12.0]


# -- product_type_profit (Q9) -------------------------------------------------

def test_product_type_profit_planted(ray_session, tmp_path):
    d = str(tmp_path)
    _write(d, "part", pd.DataFrame({
        "p_partkey": [1, 2, 3],
        "p_name": ["red bolt", "small boltcutter", "red gear"]}))
    _write(d, "nation", pd.DataFrame({
        "n_nationkey": [0, 1], "n_name": ["A_LAND", "B_LAND"],
        "n_regionkey": [0, 0]}))
    _write(d, "supplier", pd.DataFrame({
        "s_suppkey": [10, 11], "s_nationkey": [0, 1]}))
    _write(d, "orders", pd.DataFrame({
        "o_orderkey": [100, 101],
        "o_orderdate": [_ts("1996-03-01"), _ts("1997-03-01")]}))
    # part 3 never matches "bolt"; parts 1 AND 2 both match (substring)
    _write(d, "lineitem", pd.DataFrame({
        "l_orderkey": [100, 100, 101, 101],
        "l_partkey": [1, 3, 2, 1],
        "l_suppkey": [10, 10, 11, 10],
        "l_extendedprice": [100.0, 999.0, 200.0, 50.0],
        "l_discount": [0.1, 0.0, 0.5, 0.0]}))
    out = joins.product_type_profit(d).to_pandas()
    got = {(r.nation, r.o_year): r.sum_profit
           for r in out.itertuples(index=False)}
    assert got == {("A_LAND", 1996): 90.0,   # 100*(1-0.1)
                   ("A_LAND", 1997): 50.0,   # part 1 via order 101
                   ("B_LAND", 1997): 100.0}  # 200*(1-0.5)
    # Q9 ordering: nation asc, year DESC
    assert out["nation"].tolist() == ["A_LAND", "A_LAND", "B_LAND"]
    assert out.loc[out["nation"] == "A_LAND", "o_year"].tolist() == \
        [1997, 1996]


# -- supplier_relation_counts (Q16) -------------------------------------------

def test_supplier_relation_counts_planted(ray_session, tmp_path):
    d = str(tmp_path)
    _write(d, "part", pd.DataFrame({
        "p_partkey": [1, 2, 3, 4],
        "p_brand": ["Brand#1", "Brand#13", "Brand#1", "Brand#1"],
        "p_type": ["SMALL", "SMALL", "PROMO", "SMALL"],
        "p_size": [4, 4, 4, 7]}))
    # part 2 (excluded brand), part 3 (excluded type), part 4 (size not
    # in the qualifying list) must all vanish
    _write(d, "supplier", pd.DataFrame({
        "s_suppkey": [10, 11, 12], "s_acctbal": [5.0, -1.0, 3.0]}))
    _write(d, "lineitem", pd.DataFrame({
        # supplier 10 ships part 1 TWICE (distinct-count must dedup),
        # supplier 11 is negative-balance (NOT IN drops it),
        # supplier 12 ships part 1 once
        "l_partkey": [1, 1, 1, 1, 2, 3, 4],
        "l_suppkey": [10, 10, 11, 12, 10, 10, 10]}))
    out = joins.supplier_relation_counts(d).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["p_brand"], r["p_type"], int(r["p_size"]),
            int(r["supplier_cnt"])) == ("Brand#1", "SMALL", 4, 2)


# -- potential_promotion_suppliers (Q20) --------------------------------------

def test_potential_promotion_planted(ray_session, tmp_path):
    d = str(tmp_path)
    _write(d, "part", pd.DataFrame({
        "p_partkey": [1, 2],
        "p_name": ["red widget", "blue widget"]}))
    _write(d, "supplier", pd.DataFrame({
        "s_suppkey": [10, 11, 12],
        "s_name": ["S10", "S11", "S12"]}))
    _write(d, "lineitem", pd.DataFrame({
        # supplier 10: 350 red units in-window → qualifies (>300)
        # supplier 11: 500 units but of the BLUE part → no
        # supplier 12: 400 red units OUT of the window → no
        "l_partkey": [1, 1, 2, 1],
        "l_suppkey": [10, 10, 11, 12],
        "l_quantity": [200.0, 150.0, 500.0, 400.0],
        "l_shipdate": [_ts("1996-02-01"), _ts("1996-09-01"),
                       _ts("1996-02-01"), _ts("1995-02-01")]}))
    out = joins.potential_promotion_suppliers(d).to_pandas()
    assert out["s_suppkey"].tolist() == [10]
    assert out["s_name"].tolist() == ["S10"]
    assert out["total_qty"].tolist() == [350.0]


# -- events_cohort_retention --------------------------------------------------

def test_cohort_retention_planted(ray_session, tmp_path):
    d = str(tmp_path)
    _write(d, "events", pd.DataFrame({
        "user_id": ["u1", "u1", "u1", "u2", "u2", None],
        # u1: first day Jan 1 (two events that day dedup to ONE cell
        # row), active again Jan 3 → offsets {0, 2}
        # u2: first day Jan 2, active Jan 3 → offsets {0, 1}
        # NULL user excluded entirely
        "ts": [_ts("2024-01-01T08:00"), _ts("2024-01-01T20:00"),
               _ts("2024-01-03T01:00"), _ts("2024-01-02T05:00"),
               _ts("2024-01-03T23:00"), _ts("2024-01-01T00:00")]}))
    out = windows.events_cohort_retention(d).to_pandas()
    got = {(str(np.datetime64(r.cohort_day, "D")), int(r.day_offset)):
           int(r.n_users) for r in out.itertuples(index=False)}
    assert got == {("2024-01-01", 0): 1, ("2024-01-01", 2): 1,
                   ("2024-01-02", 0): 1, ("2024-01-02", 1): 1}


# -- embeddings_ann_pq_top10 ---------------------------------------------------

def test_ann_pq_recall_and_compression(ray_session):
    """PQ+exact-rerank must (a) store exactly m uint8 codes per vector,
    (b) return EXACT cosine sims for everything it returns (rerank reads
    the raw vectors), (c) retain non-trivial recall vs brute force on
    uniform-random embeddings (ANN's worst case)."""
    import glob

    import pyarrow.parquet as pq

    from gpml2pvjson_js_ray.pipelines.relational import \
        embeddings_cosine_top10
    from gpml2pvjson_js_ray.pipelines.simops import (
        build_pq_index, embeddings_ann_pq_top10)

    sf = "/root/testdata/sf0.001"
    idx_dir, codebooks = build_pq_index(sf, m=8)
    files = glob.glob(os.path.join(idx_dir, "*.parquet"))
    t = pq.read_table(files[0])
    assert t.column("codes").type == \
        __import__("pyarrow").list_(__import__("pyarrow").uint8(), 8)

    brute = embeddings_cosine_top10(sf).to_pandas()
    ann = embeddings_ann_pq_top10(sf, m=8).to_pandas()
    assert len(ann) == 10
    overlap = set(brute["vec_id"]) & set(ann["vec_id"])
    assert len(overlap) >= 5, f"PQ recall too low: {len(overlap)}/10"
    b = brute.set_index("vec_id")["sim"]
    a = ann.set_index("vec_id")["sim"]
    for vid in overlap:  # sims are exact, not ADC approximations
        assert abs(a[vid] - b[vid]) < 1e-9


def test_ann_pq_planted_cluster(ray_session, tmp_path):
    """With a tight planted cluster around the query, PQ top-k must be
    exactly the cluster (ADC candidates + exact rerank find all planted
    neighbors before any background vector)."""
    d = str(tmp_path)
    rng = np.random.RandomState(7)
    dim = 16
    base = rng.standard_normal(dim)
    base /= np.linalg.norm(base)
    planted = base[None, :] + 0.01 * rng.standard_normal((10, dim))
    noise = rng.standard_normal((200, dim))
    emb = np.vstack([base[None, :], planted, noise]).astype(np.float32)
    pd.DataFrame({
        "vec_id": np.arange(len(emb), dtype=np.int64),
        "embedding": [list(map(float, v)) for v in emb],
        "label": np.zeros(len(emb), dtype=np.int32),
    }).to_parquet(os.path.join(d, "embeddings.parquet"), index=False)

    from gpml2pvjson_js_ray.pipelines.simops import embeddings_ann_pq_top10
    out = embeddings_ann_pq_top10(d, m=4, ksub=64).to_pandas()
    assert sorted(out["vec_id"]) == list(range(1, 11))


# -- embeddings_ann_ivfpq_top10 ------------------------------------------------

def test_ann_ivfpq_recall_vs_brute_force(ray_session):
    """IVF-PQ must read only probe partitions, return exact sims for
    its hits, and keep non-trivial recall on uniform-random vectors."""
    from gpml2pvjson_js_ray.pipelines.relational import \
        embeddings_cosine_top10
    from gpml2pvjson_js_ray.pipelines.simops import \
        embeddings_ann_ivfpq_top10

    sf = "/root/testdata/sf0.001"
    brute = embeddings_cosine_top10(sf).to_pandas()
    ann = embeddings_ann_ivfpq_top10(sf, nprobe=6, m=8).to_pandas()
    assert len(ann) == 10
    overlap = set(brute["vec_id"]) & set(ann["vec_id"])
    assert len(overlap) >= 3, f"IVF-PQ recall too low: {len(overlap)}/10"
    b = brute.set_index("vec_id")["sim"]
    a = ann.set_index("vec_id")["sim"]
    for vid in overlap:  # rerank reads raw vectors → exact sims
        assert abs(a[vid] - b[vid]) < 1e-9


def test_ann_ivfpq_planted_cluster(ray_session, tmp_path):
    """A tight planted cluster lands in the query's own inverted list,
    so IVF-PQ must recover it exactly."""
    d = str(tmp_path)
    rng = np.random.RandomState(11)
    dim = 16
    base = rng.standard_normal(dim)
    base /= np.linalg.norm(base)
    planted = base[None, :] + 0.01 * rng.standard_normal((10, dim))
    noise = rng.standard_normal((150, dim))
    emb = np.vstack([base[None, :], planted, noise]).astype(np.float32)
    pd.DataFrame({
        "vec_id": np.arange(len(emb), dtype=np.int64),
        "embedding": [list(map(float, v)) for v in emb],
        "label": np.zeros(len(emb), dtype=np.int32),
    }).to_parquet(os.path.join(d, "embeddings.parquet"), index=False)

    from gpml2pvjson_js_ray.pipelines.simops import \
        embeddings_ann_ivfpq_top10
    out = embeddings_ann_ivfpq_top10(d, nprobe=4, m=4, ksub=64).to_pandas()
    assert sorted(out["vec_id"]) == list(range(1, 11))


# -- coreness / kg_entity_kcore -------------------------------------------------

def test_coreness_planted_clique_and_path(ray_session):
    """4-clique → coreness 3; pendant path off the clique → coreness 1;
    isolated node → 0. The h-index fixpoint must match the classic
    peeling definition exactly."""
    import ray.data as rd

    from gpml2pvjson_js_ray.pipelines.graph import coreness

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    path = [(3, 4), (4, 5)]         # dangles off clique node 3
    edges = rd.from_items([{"s": a, "o": b} for a, b in clique + path])
    nodes = rd.from_items([{"node": n} for n in range(7)])  # 6 isolated
    out = coreness(edges, nodes, "s", "o").to_pandas()
    got = dict(zip(out["node"], out["core"]))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1, 6: 0}


def test_coreness_two_triangles_bridge(ray_session):
    """Two triangles joined by a bridge: every triangle vertex has
    coreness 2 (the bridge does not raise it), bridge endpoints
    included."""
    import ray.data as rd

    from gpml2pvjson_js_ray.pipelines.graph import coreness

    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(3, 4), (4, 5), (3, 5)]
    edges = rd.from_items([{"s": a, "o": b}
                           for a, b in tri1 + tri2 + [(2, 3)]])
    nodes = rd.from_items([{"node": n} for n in range(6)])
    out = coreness(edges, nodes, "s", "o").to_pandas()
    assert dict(zip(out["node"], out["core"])) == \
        {n: 2 for n in range(6)}


# -- events_purchase_followups ---------------------------------------------------

def test_purchase_followups_boundaries(ray_session, tmp_path):
    """Strict lower bound (the purchase itself is not its own
    follow-up), inclusive upper bound (exactly +10min counts), pairs
    counted per qualifying purchase, cross-user pairs excluded."""
    d = str(tmp_path)
    _write(d, "events", pd.DataFrame({
        "user_id": ["u1", "u1", "u1", "u1", "u1", "u2", "u2"],
        "event_type": ["purchase", "click", "click", "purchase", "view",
                       "purchase", "click"],
        # u1: purchases at 00:00 and 00:05.
        #   click@00:04 → follows purchase 1 only (1 pair)
        #   click@00:10 → exactly +10min of p1 (inclusive) AND +5 of p2 → 2
        #   view@00:15:00.000000 → exactly p2+10min (inclusive) and past
        #     p1's window → follows p2 only → 1
        # u2: click@00:20 is 10min after u2's OWN purchase@00:10 → 1;
        #     u1's purchases must not leak across users
        "ts": [_ts("2024-01-01T00:00"), _ts("2024-01-01T00:04"),
               _ts("2024-01-01T00:10"), _ts("2024-01-01T00:05"),
               _ts("2024-01-01T00:15:00.000000"),
               _ts("2024-01-01T00:10"), _ts("2024-01-01T00:20")]}))
    out = windows.events_purchase_followups(d).to_pandas()
    got = dict(zip(out["followup_type"], out["n_followups"]))
    # purchase@00:05 follows purchase@00:00 (within 10min) → 1
    assert got == {"click": 4, "view": 1, "purchase": 1}


# -- star_join_from_layout -------------------------------------------------------

def test_star_join_matches_full_scan_intersection(ray_session, tmp_path):
    """The PSO star join must return exactly the subjects a full-scan
    intersection finds, with the summed edge counts."""
    import glob

    import duckdb

    from gpml2pvjson_js_ray.pipelines import graph, kg
    from gpml2pvjson_js_ray.sources.pages import write_pages_parquet
    from gpml2pvjson_js_ray.stages.adjacency import write_predicate_layout

    write_pages_parquet(str(tmp_path / "pages"), 60)
    kg.run_kg_pipeline(str(tmp_path / "pages"), str(tmp_path / "out"))
    adj_dir = str(tmp_path / "out" / "adjacency")
    pso_dir = str(tmp_path / "out" / "pso")
    write_predicate_layout(adj_dir, pso_dir, num_buckets=8)

    preds = ("hasXref", "isPartOf")
    got = graph.star_join_from_layout(pso_dir, preds).to_pandas()

    files = sorted(glob.glob(adj_dir + "/**/*.parquet", recursive=True))
    want = duckdb.sql(f"""
        WITH t AS (SELECT canonical_subj, pred
                   FROM read_parquet({files!r})
                   WHERE pred IN ('hasXref', 'isPartOf'))
        SELECT canonical_subj, count(*) AS n_edges
        FROM t GROUP BY canonical_subj
        HAVING count(DISTINCT pred) = 2
        ORDER BY canonical_subj
    """).df()
    assert len(got) == len(want) and len(got) > 0
    assert got["canonical_subj"].tolist() == \
        want["canonical_subj"].tolist()
    assert got["n_edges"].tolist() == want["n_edges"].tolist()


# -- host_cocitation --------------------------------------------------------------

def test_host_cocitation_matches_independent_recount(ray_session):
    """Co-citation counts vs an independent stdlib-re recount: for every
    pair of hosts, n_cociting = |{src hosts linking to both}|, with the
    out-degree cap and min_count applied identically."""
    import itertools
    import re as _re
    from collections import Counter, defaultdict

    from gpml2pvjson_js_ray.pipelines import kg, webgraph
    from gpml2pvjson_js_ray.sources.pages import gen_page

    n = 240
    path = kg.pages_path(n)
    got = (webgraph.host_cocitation(
        kg.read_pages(path, columns=["url", "html"]))
        .to_pandas())

    href_re = _re.compile(r'href="(https?://[^/"]+)')
    host_re = _re.compile(r"^https?://([^/]+)")
    outs = defaultdict(set)
    for i in range(n):
        page = gen_page(i)
        src = host_re.match(page["url"]).group(1)
        for m in href_re.finditer(page["html"].decode("utf-8")):
            outs[src].add(m.group(1).split("://", 1)[1])
    want = Counter()
    for src, dsts in outs.items():
        if len(dsts) > 64:
            continue
        for a, b in itertools.combinations(sorted(dsts), 2):
            want[(a, b)] += 1
    want = {k: v for k, v in want.items() if v >= 2}

    got_pairs = {(r.host_a, r.host_b): r.n_cociting
                 for r in got.itertuples(index=False)}
    assert got_pairs == want and len(want) > 0
    # ordering: count desc then pair asc
    counts = got["n_cociting"].tolist()
    assert counts == sorted(counts, reverse=True)


def test_host_cocitation_caps_directory_pages(ray_session, tmp_path):
    """A source citing more than max_out_degree hosts is excluded from
    pairing entirely (documented cap), and min_count prunes 1-source
    pairs."""
    import ray.data as rd

    def page(url, hrefs):
        html = "".join(f'<a href="https://{h}/">x</a>' for h in hrefs)
        return {"url": url, "html": html.encode()}

    pages = rd.from_items([
        page("https://s1.test/a", ["x.test", "y.test"]),
        page("https://s2.test/a", ["x.test", "y.test", "z.test"]),
        page("https://spam.test/a", [f"h{i}.test" for i in range(80)]),
    ])
    out = webgraph_mod.host_cocitation(pages, max_out_degree=64,
                                       min_count=2).to_pandas()
    assert {(r.host_a, r.host_b): r.n_cociting
            for r in out.itertuples(index=False)} == \
        {("x.test", "y.test"): 2}
