"""The round-4 closure/unrolled-SQL oracles for the webgraph family
(kg_host_scc / kg_host_levels / kg_host_pagerank / kg_host_ppr) are
independent DuckDB recomputes over the host-edge checkpoint. The
synthetic corpus's host graph is ACYCLIC (crawl→site links only), so
the driver check never exercises a nontrivial SCC — these tests pin
SQL-vs-engine parity on planted CYCLIC graphs, where the two
algorithms (distributed trim + F/B min-label peeling vs closed-form
reachability closure; distributed power rounds vs unrolled CTEs)
genuinely diverge if either is wrong."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from gpml2pvjson_js_ray.pipelines.graph import (
    condensation_levels,
    pagerank,
    pagerank_oracle_sql,
    personalized_pagerank,
    strongly_connected_components,
)
from gpml2pvjson_js_ray.pipelines.webgraph import _closure_ctes


@pytest.fixture()
def cyclic_edges(tmp_path):
    """Ring {a,b,c} → bridge → ring {d,e} → tail f; source s into the
    first ring; g isolated-ish sink of s. Distinct directed edges in
    host-edge-checkpoint shape."""
    df = pd.DataFrame({
        "src_host": ["a", "b", "c", "c", "d", "e", "e", "s", "s"],
        "dst_host": ["b", "c", "a", "d", "e", "d", "f", "a", "g"],
        "n_links": [1] * 9,
    })
    p = str(tmp_path / "edges.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
    return df, p


def _edge_ds(df):
    return rd.from_pandas(df[["src_host", "dst_host"]])


def _node_ds(df):
    hosts = sorted(set(df["src_host"]) | set(df["dst_host"]))
    return rd.from_pandas(pd.DataFrame({"h": hosts}))


def test_scc_closure_sql_matches_engine_on_cycles(ray_session,
                                                  cyclic_edges):
    df, p = cyclic_edges
    eng = (strongly_connected_components(
        _edge_ds(df), _node_ds(df), "src_host", "dst_host")
        .to_pandas())
    got = dict(zip(eng["node"], eng["scc"]))
    sql = (f"WITH RECURSIVE {_closure_ctes(p)} "
           "SELECT host, scc FROM sccmap ORDER BY scc, host")
    ora = duckdb.connect().execute(sql).fetchdf()
    assert dict(zip(ora["host"], ora["scc"])) == got
    # sanity: the planted rings actually collapse
    assert got["b"] == "a" and got["c"] == "a" and got["e"] == "d"


def test_levels_closure_sql_matches_engine_on_cycles(ray_session,
                                                     cyclic_edges):
    df, p = cyclic_edges
    eng = (condensation_levels(
        _edge_ds(df), _node_ds(df), "src_host", "dst_host")
        .to_pandas())
    got = {(r.node): (r.scc, r.level)
           for r in eng.itertuples(index=False)}
    sql = f"""
WITH RECURSIVE {_closure_ctes(p)},
ce AS MATERIALIZED (
  SELECT DISTINCT sa.scc AS su, sb.scc AS sv
  FROM d JOIN sccmap sa ON sa.host = d.s
         JOIN sccmap sb ON sb.host = d.t
  WHERE sa.scc <> sb.scc),
lvl AS (
  SELECT scc AS c, 0 AS l FROM (SELECT DISTINCT scc FROM sccmap)
  WHERE scc NOT IN (SELECT sv FROM ce)
  UNION
  SELECT ce.sv, lvl.l + 1 FROM lvl JOIN ce ON ce.su = lvl.c)
SELECT m.host, m.scc, CAST(max(lvl.l) AS BIGINT) AS level
FROM sccmap m JOIN lvl ON lvl.c = m.scc
GROUP BY m.host, m.scc ORDER BY level, scc, host"""
    ora = duckdb.connect().execute(sql).fetchdf()
    assert {(r.host): (r.scc, r.level)
            for r in ora.itertuples(index=False)} == got
    # source s at level 0; ring {a,b,c} one hop in; f deepest
    assert got["s"] == ("s", 0) and got["a"] == ("a", 1)
    assert got["f"][1] == max(v[1] for v in got.values())


def test_pagerank_unrolled_sql_matches_engine_on_cycles(ray_session,
                                                        cyclic_edges):
    import pyarrow.compute as pc

    df, p = cyclic_edges
    ranks = pagerank(_edge_ds(df), _node_ds(df),
                     "src_host", "dst_host").to_pandas()
    eng = dict(zip(ranks["node"], np.round(ranks["r"], 8)))
    d_body = (f"SELECT DISTINCT src_host AS s, dst_host AS t "
              f"FROM read_parquet('{p}')")
    ora = duckdb.connect().execute(
        pagerank_oracle_sql(d_body, out_node="host")).fetchdf()
    got = dict(zip(ora["host"], ora["rank"]))
    assert set(got) == set(eng)
    for h in got:
        assert abs(got[h] - eng[h]) < 1e-9, (h, got[h], eng[h])
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_ppr_unrolled_sql_matches_engine_on_cycles(ray_session,
                                                   cyclic_edges):
    df, p = cyclic_edges
    seed = min(df["src_host"])          # host_ppr's default seed rule
    ranks = personalized_pagerank(
        _edge_ds(df), _node_ds(df), "src_host", "dst_host",
        seeds=[seed]).to_pandas()
    eng = dict(zip(ranks["node"], np.round(ranks["r"], 8)))
    d_body = (f"SELECT DISTINCT src_host AS s, dst_host AS t "
              f"FROM read_parquet('{p}')")
    ora = duckdb.connect().execute(
        pagerank_oracle_sql(d_body, out_node="host",
                            personalized=True)).fetchdf()
    got = dict(zip(ora["host"], ora["rank"]))
    assert set(got) == set(eng)
    for h in got:
        assert abs(got[h] - eng[h]) < 1e-9, (h, got[h], eng[h])
    # restart mass stays inside the seed's reachable set: hosts the
    # seed cannot reach score exactly 0 ('d' ring is downstream of the
    # ring seed 'a' feeds, 'g' is s-only)
    assert got[seed] > 0.1
    assert got["g"] == 0.0


def test_hits_unrolled_sql_matches_engine_on_cycles(ray_session,
                                                    cyclic_edges):
    from gpml2pvjson_js_ray.pipelines.graph import hits, hits_oracle_sql

    df, p = cyclic_edges
    out = hits(_edge_ds(df), _node_ds(df),
               "src_host", "dst_host").to_pandas()
    eng = {r.node: (np.round(r.hub, 8), np.round(r.authority, 8))
           for r in out.itertuples(index=False)}
    d_body = (f"SELECT DISTINCT src_host AS s, dst_host AS t "
              f"FROM read_parquet('{p}')")
    ora = duckdb.connect().execute(
        hits_oracle_sql(d_body, out_node="host")).fetchdf()
    got = {r.host: (r.hub, r.authority)
           for r in ora.itertuples(index=False)}
    assert set(got) == set(eng)
    for h in got:
        assert abs(got[h][0] - eng[h][0]) < 1e-9, (h, got[h], eng[h])
        assert abs(got[h][1] - eng[h][1]) < 1e-9, (h, got[h], eng[h])
    # sinks f/g emit nothing → hub 0; source s is never cited → auth 0
    assert got["f"][0] == 0.0 and got["g"][0] == 0.0
    assert got["s"][1] == 0.0


def test_reciprocity_planted(ray_session, cyclic_edges):
    from gpml2pvjson_js_ray.pipelines.webgraph import reciprocity_from_edges

    df, _p = cyclic_edges
    out = reciprocity_from_edges(_edge_ds(df)).to_pandas()
    by = out.set_index("host")
    # d→e and e→d reciprocate; e also links f (unreciprocated)
    assert by.loc["d", "n_out"] == 1 and by.loc["d", "n_reciprocal"] == 1
    assert by.loc["d", "reciprocity"] == 1.0
    assert by.loc["e", "n_out"] == 2 and by.loc["e", "n_reciprocal"] == 1
    assert by.loc["e", "reciprocity"] == 0.5
    # ring a→b→c→a: no 2-cycles anywhere
    assert by.loc["a", "n_reciprocal"] == 0
    # only linking hosts appear (f and g are sinks)
    assert "f" not in by.index and "g" not in by.index


def test_bowtie_planted(ray_session, cyclic_edges):
    from gpml2pvjson_js_ray.pipelines.webgraph import bowtie_from_edges

    df, _p = cyclic_edges
    out = bowtie_from_edges(_edge_ds(df), _node_ds(df)).to_pandas()
    got = dict(zip(out["host"], out["region"]))
    # largest SCC = {a,b,c} (ring); s feeds it → 'in'; the {d,e} ring,
    # f and g hang downstream/off-side → 'out'/'other'
    assert got == {"a": "scc", "b": "scc", "c": "scc",
                   "s": "in", "d": "out", "e": "out", "f": "out",
                   "g": "other"}


def test_canonical_url_planted_messy(ray_session, tmp_path):
    """URL canonicalization vs the DuckDB oracle on adversarial URLs
    the synthetic corpus lacks: host case, default ports, tracking
    params (first/middle/last), fragments, trailing slashes — and
    newest-capture collapse across the variants."""
    from gpml2pvjson_js_ray.pipelines.kg import (
        canonical_pages_dataset)

    rows = pd.DataFrame({
        "url": [
            "https://EXAMPLE.test:443/a/b?utm_source=x&id=2#frag",
            "https://example.test/a/b?id=2",
            "http://Example.test:80/c/",
            "http://example.test/c",
            "https://example.test/d?utm_campaign=y",
            "https://example.test/d",
            "https://example.test/e?id=1&gclid=zzz&x=2",
            "https://other.test/",                      # root slash
        ],
        "warc_ts": [3, 1, 5, 9, 2, 2, 4, 7],
    })
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pa.Table.from_pandas(rows, preserve_index=False), p)

    eng = canonical_pages_dataset(rd.read_parquet(p)).to_pandas()
    got = {r.canonical_url: (r.n_captures, r.url, r.warc_ts)
           for r in eng.itertuples(index=False)}
    # variants collapse; newest capture survives (warc_ts, url desc)
    assert got["https://example.test/a/b?id=2"] == (
        2, "https://EXAMPLE.test:443/a/b?utm_source=x&id=2#frag", 3)
    assert got["http://example.test/c"] == (
        2, "http://example.test/c", 9)
    assert got["https://example.test/d"][0] == 2
    assert got["https://example.test/e?id=1&x=2"][0] == 1
    assert got["https://other.test"] == (1, "https://other.test/", 7)

    # oracle parity: same SQL chain over the same parquet
    from gpml2pvjson_js_ray.pipelines import kg
    sql = kg.canonical_pages_oracle_sql_for_sf("/root/testdata/sf0.01") \
        .replace(kg.pages_glob("/root/testdata/sf0.01"), p)
    ora = duckdb.connect().execute(sql).fetchdf()
    cols = sorted(eng.columns)
    a = sorted(map(tuple, eng[cols].itertuples(index=False, name=None)))
    b = sorted(map(tuple, ora[cols].itertuples(index=False, name=None)))
    assert a == b


def test_harmonic_closure_sql_matches_engine_on_cycles(ray_session,
                                                       cyclic_edges):
    from gpml2pvjson_js_ray.pipelines.graph import harmonic_centrality
    from gpml2pvjson_js_ray.pipelines.webgraph import (
        structural_oracle_sql_for_sf, host_edges_checkpoint_path)

    df, p = cyclic_edges
    eng = harmonic_centrality(_edge_ds(df), _node_ds(df),
                              "src_host", "dst_host").to_pandas()
    got = dict(zip(eng["node"], eng["harmonic"]))
    sql = structural_oracle_sql_for_sf("/root/testdata/sf0.01")[
        "kg_host_harmonic"].replace(
            host_edges_checkpoint_path("/root/testdata/sf0.01"), p)
    ora = duckdb.connect().execute(sql).fetchdf()
    assert dict(zip(ora["host"], ora["harmonic"])) == got
    # hand-check: ring {a,b,c} — each member reached by the other two
    # at dist 1 and 2 and by s (1..3): a gets s@1,b@2,c@1 → wait, use
    # structural invariants instead of hand-sums: every ring member
    # strictly positive, g reached only by s at dist 1 → exactly 1.0
    assert got["g"] == 1.0
    assert all(got[x] > 0 for x in ("a", "b", "c", "d", "e", "f"))
    assert got["s"] == 0.0          # nothing links to the source


def test_hyperball_tracks_exact_on_planted_star(ray_session):
    """HyperBall vs exact on a 30-leaf in-star + chain: estimates are
    HLL-noisy (sigma ~13% at m=64) but must land in a loose band and
    agree exactly on zeros."""
    from gpml2pvjson_js_ray.pipelines.graph import (
        harmonic_centrality, hyperball_harmonic)

    leaves = [f"leaf{i:02d}" for i in range(30)]
    df = pd.DataFrame({
        "src_host": leaves + ["hub", "mid"],
        "dst_host": ["hub"] * 30 + ["mid", "tail"]})
    nodes = rd.from_pandas(pd.DataFrame(
        {"h": sorted(set(df["src_host"]) | set(df["dst_host"]))}))
    exact = harmonic_centrality(rd.from_pandas(df), nodes,
                                "src_host", "dst_host").to_pandas()
    approx = hyperball_harmonic(rd.from_pandas(df), nodes,
                                "src_host", "dst_host").to_pandas()
    ex = dict(zip(exact["node"], exact["harmonic"]))
    ap = dict(zip(approx["node"], approx["harmonic_est"]))
    assert set(ex) == set(ap)
    assert ex["hub"] == 30.0 and ex["mid"] == 31.0 / 2 + 1 - 0.5
    for n in ex:
        if ex[n] == 0.0:
            assert ap[n] == 0.0, n          # leaves: nothing reaches
        else:
            assert abs(ap[n] - ex[n]) / ex[n] < 0.40, (n, ap[n], ex[n])


def test_hyperball_closeness_tracks_exact_on_planted_star(ray_session):
    """hyperball_closeness vs the exact closeness on the same 30-leaf
    in-star + chain: loose HLL band on positives, exact agreement on
    zeros (nothing reaches the leaves)."""
    from gpml2pvjson_js_ray.pipelines.graph import (
        closeness_centrality, hyperball_closeness)

    leaves = [f"leaf{i:02d}" for i in range(30)]
    df = pd.DataFrame({
        "src_host": leaves + ["hub", "mid"],
        "dst_host": ["hub"] * 30 + ["mid", "tail"]})
    nodes = rd.from_pandas(pd.DataFrame(
        {"h": sorted(set(df["src_host"]) | set(df["dst_host"]))}))
    exact = closeness_centrality(rd.from_pandas(df), nodes,
                                 "src_host", "dst_host").to_pandas()
    approx = hyperball_closeness(rd.from_pandas(df), nodes,
                                 "src_host", "dst_host").to_pandas()
    ex = dict(zip(exact["node"], exact["closeness"]))
    for n in nodes.to_pandas()["h"]:
        ex.setdefault(n, 0.0)   # exact twin omits unreached nodes
    ap = dict(zip(approx["node"], approx["closeness_est"]))
    assert set(ex) == set(ap)
    assert ex["hub"] == 1.0     # 30 leaves, all at distance 1
    for n in ex:
        if ex[n] == 0.0:
            assert ap[n] == 0.0, n
        else:
            assert abs(ap[n] - ex[n]) / ex[n] < 0.40, (n, ap[n], ex[n])


def test_hyperball_histogram_and_diameter_track_exact(ray_session):
    """The neighborhood-function twins vs the exact all-pairs versions
    on the star+chain: per-distance mass within a loose HLL band,
    diameter_est exact (integer off the last live round), effective
    diameter within ±1 of the interpolated exact value."""
    from gpml2pvjson_js_ray.pipelines.graph import (
        distance_histogram, effective_diameter,
        hyperball_distance_histogram, hyperball_effective_diameter)

    leaves = [f"leaf{i:02d}" for i in range(30)]
    df = pd.DataFrame({
        "src_host": leaves + ["hub", "mid"],
        "dst_host": ["hub"] * 30 + ["mid", "tail"]})
    nodes = rd.from_pandas(pd.DataFrame(
        {"h": sorted(set(df["src_host"]) | set(df["dst_host"]))}))
    exact_h = distance_histogram(rd.from_pandas(df),
                                 "src_host", "dst_host").to_pandas()
    approx_h = hyperball_distance_histogram(
        rd.from_pandas(df), nodes, "src_host", "dst_host").to_pandas()
    ex = dict(zip(exact_h["dist"], exact_h["n_pairs"]))
    ap = dict(zip(approx_h["dist"], approx_h["n_pairs_est"]))
    # exact: 32@1 (30 leaf→hub + hub→mid + mid→tail), 31@2, 30@3
    assert ex == {1: 32, 2: 31, 3: 30}
    assert set(ap) == set(ex)
    for d in ex:
        assert abs(ap[d] - ex[d]) / ex[d] < 0.40, (d, ap[d], ex[d])

    exact_d = effective_diameter(rd.from_pandas(df),
                                 "src_host", "dst_host").to_pandas()
    approx_d = hyperball_effective_diameter(
        rd.from_pandas(df), nodes, "src_host", "dst_host").to_pandas()
    assert int(approx_d["diameter_est"].iloc[0]) == \
        int(exact_d["diameter"].iloc[0])
    assert abs(float(approx_d["effective_diameter_est"].iloc[0])
               - float(exact_d["effective_diameter"].iloc[0])) <= 1.0
    assert abs(float(approx_d["n_pairs_est"].iloc[0])
               - float(exact_d["n_pairs"].iloc[0])) \
        / float(exact_d["n_pairs"].iloc[0]) < 0.40


def test_hyperball_merge_survives_node_missing_from_nodes(ray_session):
    """Advice r4: a message target absent from the nodes Dataset must
    not IndexError inside the groupby merge — the sweep synthesizes a
    state row for it (fresh node, empty previous ball)."""
    from gpml2pvjson_js_ray.pipelines.graph import hyperball_harmonic

    df = pd.DataFrame({"src_host": ["a", "b"],
                       "dst_host": ["b", "c"]})
    nodes = rd.from_pandas(pd.DataFrame({"h": ["a", "b"]}))  # no 'c'
    out = hyperball_harmonic(rd.from_pandas(df), nodes,
                             "src_host", "dst_host").to_pandas()
    got = dict(zip(out["node"], out["harmonic_est"]))
    assert "c" in got and got["c"] > 0.0


def test_distance_histogram_planted(ray_session, cyclic_edges):
    from gpml2pvjson_js_ray.pipelines.graph import distance_histogram
    from gpml2pvjson_js_ray.pipelines.webgraph import (
        host_edges_checkpoint_path, structural_oracle_sql_for_sf)

    df, p = cyclic_edges
    eng = distance_histogram(_edge_ds(df),
                             "src_host", "dst_host").to_pandas()
    got = dict(zip(eng["dist"], eng["n_pairs"]))
    sql = structural_oracle_sql_for_sf("/root/testdata/sf0.01")[
        "kg_host_distance_histogram"].replace(
            host_edges_checkpoint_path("/root/testdata/sf0.01"), p)
    ora = duckdb.connect().execute(sql).fetchdf()
    assert dict(zip(ora["dist"], ora["n_pairs"])) == got
    # structure: the 3-ring + bridge + 2-ring + tail chain yields
    # finite pairs out to the s→…→f path length
    assert got[1] == 9 - 1 + 1 or got[1] > 0   # at least the edges
    assert max(got) >= 4                       # s→a→…→d→e→f depth


def test_closeness_closure_sql_matches_engine_on_cycles(ray_session,
                                                        cyclic_edges):
    from gpml2pvjson_js_ray.pipelines.graph import closeness_centrality
    from gpml2pvjson_js_ray.pipelines.webgraph import (
        host_edges_checkpoint_path, structural_oracle_sql_for_sf)

    df, p = cyclic_edges
    eng = closeness_centrality(_edge_ds(df), _node_ds(df),
                               "src_host", "dst_host").to_pandas()
    got = {r.host if hasattr(r, "host") else r.node:
           (r.n_reached_by, r.closeness)
           for r in eng.itertuples(index=False)}
    sql = structural_oracle_sql_for_sf("/root/testdata/sf0.01")[
        "kg_host_closeness"].replace(
            host_edges_checkpoint_path("/root/testdata/sf0.01"), p)
    ora = duckdb.connect().execute(sql).fetchdf()
    assert {r.host: (r.n_reached_by, r.closeness)
            for r in ora.itertuples(index=False)} == got
    # g reached only by s at dist 1 → (1, 1.0); s unreached → (0, 0.0)
    assert got["g"] == (1, 1.0)
    assert got["s"] == (0, 0.0)


def test_weighted_pagerank_unrolled_sql_matches_engine(ray_session,
                                                       tmp_path):
    """Weighted vs unweighted diverge on skewed weights: one heavy
    edge dominates the split. Oracle parity + a direction check."""
    from gpml2pvjson_js_ray.pipelines.graph import (
        pagerank, pagerank_oracle_sql)

    df = pd.DataFrame({
        "src_host": ["a", "a", "b", "c"],
        "dst_host": ["b", "c", "c", "a"],
        "n_links": [9, 1, 1, 1]})
    p = str(tmp_path / "w.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
    edges = rd.from_pandas(df)
    nodes = rd.from_pandas(pd.DataFrame({"h": ["a", "b", "c"]}))
    ranks = pagerank(edges, nodes, "src_host", "dst_host",
                     weight="n_links").to_pandas()
    eng = dict(zip(ranks["node"], np.round(ranks["r"], 8)))
    ora = duckdb.connect().execute(pagerank_oracle_sql(
        f"SELECT src_host AS s, dst_host AS t, "
        f"CAST(n_links AS DOUBLE) AS w FROM read_parquet('{p}')",
        out_node="host", weighted=True)).fetchdf()
    got = dict(zip(ora["host"], ora["rank"]))
    assert set(got) == set(eng)
    for h in got:
        assert abs(got[h] - eng[h]) < 1e-9, (h, got[h], eng[h])
    # a splits 0.9/0.1 toward b — weighted rank(b) must beat the
    # unweighted run where a splits evenly
    un = pagerank(edges, nodes, "src_host", "dst_host").to_pandas()
    un_b = dict(zip(un["node"], un["r"]))["b"]
    assert got["b"] > un_b


def test_effective_diameter_planted(ray_session, cyclic_edges):
    from gpml2pvjson_js_ray.pipelines.graph import effective_diameter
    from gpml2pvjson_js_ray.pipelines.webgraph import (
        host_edges_checkpoint_path, structural_oracle_sql_for_sf)

    df, p = cyclic_edges
    eng = effective_diameter(_edge_ds(df),
                             "src_host", "dst_host").to_pandas()
    sql = structural_oracle_sql_for_sf("/root/testdata/sf0.01")[
        "kg_host_effective_diameter"].replace(
            host_edges_checkpoint_path("/root/testdata/sf0.01"), p)
    ora = duckdb.connect().execute(sql).fetchdf()
    for c in ("n_pairs", "diameter", "effective_diameter"):
        assert eng[c].iloc[0] == ora[c].iloc[0], (
            c, eng[c].iloc[0], ora[c].iloc[0])
    # multi-level distances here: diameter > 1 and the interpolated
    # P90 sits strictly inside (0, diameter]
    assert eng["diameter"].iloc[0] > 1
    assert 0 < eng["effective_diameter"].iloc[0] <= eng["diameter"].iloc[0]


def test_degree_distribution_planted(ray_session, cyclic_edges):
    """The SQL oracle against hand-computed degree truth (the engine
    side is pinned against the same SQL by the driver-gate test at
    sf0.01)."""
    from gpml2pvjson_js_ray.pipelines.webgraph import (
        host_edges_checkpoint_path, structural_oracle_sql_for_sf)

    df, p = cyclic_edges
    sql = structural_oracle_sql_for_sf("/root/testdata/sf0.01")[
        "kg_host_degree_distribution"].replace(
            host_edges_checkpoint_path("/root/testdata/sf0.01"), p)
    ora = duckdb.connect().execute(sql).fetchdf()
    got = {(r.direction, r.degree): r.n_hosts
           for r in ora.itertuples(index=False)}
    # out-degrees: a1 b1 c2 d1 e2 s2, f g 0 → {0:2, 1:3, 2:3}
    assert got[("out", 0)] == 2 and got[("out", 1)] == 3 \
        and got[("out", 2)] == 3
    # in-degrees: a2 b1 c1 d2 e1 f1 g1, s 0 → {0:1, 1:5, 2:2}
    assert got[("in", 0)] == 1 and got[("in", 1)] == 5 \
        and got[("in", 2)] == 2


def test_hyperball_twins_track_exact_on_sf001_host_graph(ray_session):
    """Round-5: the three new HyperBall twins vs their exact twins on
    the REAL sf0.01 host graph (not just planted stars) — loose HLL
    accuracy bands on every statistic, exact agreement on zeros and on
    the (integer) diameter."""
    from gpml2pvjson_js_ray.pipelines import kg, webgraph

    pages = kg.read_pages(
        kg.pages_path_for_sf("/root/testdata/sf0.01"),
        columns=["url", "html"])

    # closeness: per-host relative error < 40% on positives, 0 == 0
    exact_c = webgraph.host_closeness(pages).to_pandas()
    approx_c = webgraph.host_closeness_hyperball(pages).to_pandas()
    ec = dict(zip(exact_c["host"], exact_c["closeness"]))
    ac = dict(zip(approx_c["host"], approx_c["closeness_est"]))
    for h in ac:
        ec.setdefault(h, 0.0)
    assert set(ec) == set(ac)
    errs = []
    for h in ec:
        if ec[h] == 0.0:
            assert ac[h] == 0.0, h
        else:
            errs.append(abs(ac[h] - ec[h]) / ec[h])
            assert errs[-1] < 0.40, (h, ac[h], ec[h])
    assert errs, "host graph should have reachable hosts"

    # distance histogram: same support, per-distance mass within 40%
    exact_h = webgraph.host_distance_histogram(pages).to_pandas()
    approx_h = webgraph.host_distance_histogram_hyperball(
        pages).to_pandas()
    eh = dict(zip(exact_h["dist"], exact_h["n_pairs"]))
    ah = dict(zip(approx_h["dist"], approx_h["n_pairs_est"]))
    assert set(ah) == set(eh)
    for d in eh:
        assert abs(ah[d] - eh[d]) / eh[d] < 0.40, (d, ah[d], eh[d])

    # effective diameter: integer diameter exact, interpolated P90
    # within ±1, total pair mass within 40%
    exact_d = webgraph.host_effective_diameter(pages).to_pandas()
    approx_d = webgraph.host_effective_diameter_hyperball(
        pages).to_pandas()
    assert int(approx_d["diameter_est"].iloc[0]) == \
        int(exact_d["diameter"].iloc[0])
    assert abs(float(approx_d["effective_diameter_est"].iloc[0])
               - float(exact_d["effective_diameter"].iloc[0])) <= 1.0
    assert abs(float(approx_d["n_pairs_est"].iloc[0])
               - float(exact_d["n_pairs"].iloc[0])) \
        / float(exact_d["n_pairs"].iloc[0]) < 0.40
