"""Planted semantics for the session-14 operators: Adamic-Adar
customer-pair affinity (inverse-log weights, distinct-buyer dedup,
degree-1 exclusion), hybrid RRF retrieval (per-side rank assignment,
absent-side zero term, fusion order), and directed strongly connected
components (cycle detection, trim of the DAG fringe, chain adversary,
plus a full transitive-closure cross-check on the real host graph).
sf-scale value parity with DuckDB for the two oracled ops is swept by
test_oracles.py; these pin the corner semantics."""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import ray.data as rd  # noqa: E402

from gpml2pvjson_js_ray.pipelines import joins, lexical  # noqa: E402
from gpml2pvjson_js_ray.pipelines import webgraph as webgraph_mod  # noqa: E402
from gpml2pvjson_js_ray.pipelines.graph import (  # noqa: E402
    strongly_connected_components,
)


def _write(d, name, df):
    df.to_parquet(os.path.join(d, f"{name}.parquet"), index=False)


# -- customers_common_parts_affinity ------------------------------------------

def test_adamic_adar_planted_weights(ray_session, tmp_path):
    d = str(tmp_path)
    # orders: customer c owns order 10c
    _write(d, "orders", pd.DataFrame({
        "o_orderkey": [10, 20, 30, 11],
        "o_custkey":  [1,  2,  3,  1]}))
    # part 100: buyers {1, 2} (w = 1/ln 2); part 200: buyers {1, 2, 3}
    # (w = 1/ln 3); part 300: single buyer → contributes nothing.
    # customer 1 buys part 100 twice in order 10 AND again in order 11:
    # the distinct-buyer dedup must count it once.
    _write(d, "lineitem", pd.DataFrame({
        "l_orderkey": [10, 10, 11, 20, 10, 20, 30, 30],
        "l_partkey":  [100, 100, 100, 100, 200, 200, 200, 300]}))
    out = (joins.customers_common_parts_affinity(d).to_pandas()
           .sort_values(["cust_a", "cust_b"]).reset_index(drop=True))
    w2, w3 = 1.0 / math.log(2.0), 1.0 / math.log(3.0)
    assert out["cust_a"].tolist() == [1, 1, 2]
    assert out["cust_b"].tolist() == [2, 3, 3]
    assert out["aa_score"].tolist() == [
        round(w2 + w3, 6), round(w3, 6), round(w3, 6)]


def test_adamic_adar_topk_order_and_cut(ray_session, tmp_path):
    d = str(tmp_path)
    # parts: 100 shared by (1,2) [w=1/ln2, strongest], 200 by (3,4,5)
    _write(d, "orders", pd.DataFrame({
        "o_orderkey": [10, 20, 30, 40, 50],
        "o_custkey":  [1, 2, 3, 4, 5]}))
    _write(d, "lineitem", pd.DataFrame({
        "l_orderkey": [10, 20, 30, 40, 50],
        "l_partkey":  [100, 100, 200, 200, 200]}))
    out = joins.customers_common_parts_affinity(d, k=2).to_pandas()
    # ranked: (1,2) at 1/ln2 ≈ 1.4427, then the 1/ln3 ties broken by
    # (cust_a, cust_b) asc → (3,4) beats (3,5)/(4,5) at the k-cut
    assert out["cust_a"].tolist() == [1, 3]
    assert out["cust_b"].tolist() == [2, 4]


# -- documents_hybrid_rrf_topk -------------------------------------------------

def test_hybrid_rrf_fusion_semantics(ray_session, tmp_path):
    d = str(tmp_path)
    # lexical ranking (terms merge/window): doc 0 strongest, then 1;
    # docs 2 and 3 never mention the terms but doc 2 has more tokens
    # (score 0 ties break by doc_id: 2 then 3).
    _write(d, "documents", pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["merge window merge", "merge apples",
                 "plain filler words here", "nothing"]}))
    # dense ranking vs vec 0: doc 3 is the query's twin, doc 2 next,
    # doc 1 orthogonal-ish, doc 0 is the query itself (rank 1).
    _write(d, "embeddings", pd.DataFrame({
        "vec_id": [0, 1, 2, 3],
        "embedding": [[1.0, 0.0], [0.0, 1.0],
                      [0.8, 0.6], [0.999, 0.01]]}))
    out = (lexical.documents_hybrid_rrf_topk(d, k=4, depth=2)
           .to_pandas())
    # lexical top-2: doc 0 (r1), doc 1 (r2); dense top-2: doc 0 (r1,
    # cos=1), doc 3 (r2, cos≈0.9999)
    by_id = out.set_index("doc_id")
    assert by_id.loc[0, "rank_lex"] == 1 and by_id.loc[0, "rank_vec"] == 1
    assert by_id.loc[1, "rank_lex"] == 2 and by_id.loc[1, "rank_vec"] == 0
    assert by_id.loc[3, "rank_lex"] == 0 and by_id.loc[3, "rank_vec"] == 2
    assert 2 not in by_id.index          # outside both depth-2 lists
    assert by_id.loc[0, "rrf"] == 1.0 / 61 + 1.0 / 61
    assert by_id.loc[1, "rrf"] == 1.0 / 62
    assert by_id.loc[3, "rrf"] == 1.0 / 62
    # fused order: doc 0 first; 1 vs 3 tie on rrf breaks by doc_id
    assert out["doc_id"].tolist() == [0, 1, 3]


# -- strongly connected components ---------------------------------------------

def test_scc_planted_cycles_bridge_tail(ray_session):
    # cycle {1,2,3} → one-way bridge → cycle {4,5}; tail 6→7 off the
    # second cycle; isolated node 8
    edges = rd.from_pandas(pd.DataFrame({
        "s": [1, 2, 3, 4, 5, 3, 6, 5],
        "d": [2, 3, 1, 5, 4, 4, 7, 6]}))
    nodes = rd.from_pandas(pd.DataFrame({"n": [1, 2, 3, 4, 5, 6, 7, 8]}))
    out = strongly_connected_components(edges, nodes, "s", "d").to_pandas()
    got = dict(zip(out["node"], out["scc"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 7, 8: 8}


def test_scc_long_cycle_single_component(ray_session):
    # 40-node directed cycle: needs ~40 min-label rounds, i.e. MORE
    # than the default max_inner=30. Regression for the silent inner
    # truncation that classified this as 19 components: the inner
    # bound is now sized to the active node count (and raises rather
    # than classify unconverged).
    n = 40
    edges = rd.from_pandas(pd.DataFrame(
        {"s": list(range(n)), "d": [(i + 1) % n for i in range(n)]}))
    nodes = rd.from_pandas(pd.DataFrame({"n": list(range(n))}))
    out = strongly_connected_components(edges, nodes, "s", "d").to_pandas()
    assert len(out) == n
    assert set(out["scc"]) == {0}


def test_scc_chain_adversary_all_singletons(ray_session):
    # pure DAG chain: the worst case for label peeling — TRIM (or the
    # cycle-free early exit) must classify it without O(n) outer rounds
    edges = rd.from_pandas(pd.DataFrame(
        {"s": [1, 2, 3, 4, 5], "d": [2, 3, 4, 5, 6]}))
    nodes = rd.from_pandas(pd.DataFrame({"n": [1, 2, 3, 4, 5, 6]}))
    out = (strongly_connected_components(edges, nodes, "s", "d")
           .to_pandas().sort_values("node"))
    assert (out["node"].to_numpy() == out["scc"].to_numpy()).all()


def test_scc_string_labels_nested(ray_session):
    # host-shaped string node ids; SCC {b,c} hangs off source a and
    # drains to sink d — trim peels a/d, labels classify {b,c}
    edges = rd.from_pandas(pd.DataFrame({
        "s": ["a", "b", "c", "c"],
        "d": ["b", "c", "b", "d"]}))
    nodes = rd.from_pandas(pd.DataFrame({"n": ["a", "b", "c", "d"]}))
    out = strongly_connected_components(edges, nodes, "s", "d").to_pandas()
    got = dict(zip(out["node"], out["scc"]))
    assert got == {"a": "a", "b": "b", "c": "b", "d": "d"}


def test_host_scc_matches_transitive_closure(ray_session):
    """Full independent oracle on the real sf0.001 host graph: SCC ids
    from the distributed operator must equal the ones derived from a
    dense Floyd-Warshall reachability closure."""
    from gpml2pvjson_js_ray.pipelines import kg

    path = kg.pages_path_for_sf("/root/testdata/sf0.001")
    pages = kg.read_pages(path, columns=["url", "html"])
    out = webgraph_mod.host_scc(pages).to_pandas()

    g = webgraph_mod.host_link_graph(
        kg.read_pages(path, columns=["url", "html"])).to_pandas()
    hosts = sorted(set(g["src_host"]) | set(g["dst_host"]))
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    reach = np.eye(n, dtype=bool)
    for s, t in zip(g["src_host"], g["dst_host"]):
        reach[idx[s], idx[t]] = True
    for mid in range(n):
        reach |= np.outer(reach[:, mid], reach[mid, :])
    expect = {h: min(hosts[j] for j in range(n)
                     if reach[idx[h], j] and reach[j, idx[h]])
              for h in hosts}
    got = dict(zip(out["host"], out["scc"]))
    assert got == expect
    assert len(out) == n


# -- documents_setsim_join (prefix-filtered exact Jaccard) ----------------------

def test_setsim_join_planted_boundary(ray_session, tmp_path):
    from gpml2pvjson_js_ray.pipelines import textops

    d = str(tmp_path)
    # doc 0/1: identical 12-token texts → 10 shared 3-grams, J = 1.0
    twin = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    # doc 2: shares a 6-token half with doc 3 → J below 0.3? build an
    # exact boundary instead: doc2 has 4 shingles {s1..s4}, doc3 has
    # {s1, x2, x3, x4}: inter=1, union=7, J=1/7 < 0.3 → excluded
    d2 = "one two three four five six"
    d3 = "one two three aaa bbb ccc"
    # doc 4/5: 3 of 4 shingles shared → J = 3/5 = 0.6 ≥ 0.3 → included
    d4 = "p q r s t u"            # shingles: pqr qrs rst stu
    d5 = "p q r s t zz"           # shingles: pqr qrs rst st-zz
    _write(d, "documents", pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": [twin, twin, d2, d3, d4, d5]}))
    out = (textops.documents_setsim_join(d).to_pandas()
           .reset_index(drop=True))
    got = {(a, b): j for a, b, j in
           zip(out["doc_a"], out["doc_b"], out["jaccard"])}
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert (4, 5) in got and got[(4, 5)] == 0.6
    assert (2, 3) not in got
    assert set(got) == {(0, 1), (4, 5)}


def test_setsim_join_empty_and_tiny_docs(ray_session, tmp_path):
    from gpml2pvjson_js_ray.pipelines import textops

    d = str(tmp_path)
    # sub-3-token docs collapse to a single joined shingle (the SQL
    # CASE branch); empty docs emit nothing and can never pair
    _write(d, "documents", pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["hello world", "hello world", "", None]}))
    out = textops.documents_setsim_join(d).to_pandas()
    assert out["doc_a"].tolist() == [0]
    assert out["doc_b"].tolist() == [1]
    assert out["jaccard"].tolist() == [1.0]


# -- condensation levels ---------------------------------------------------------

def test_condensation_levels_planted_bowtie(ray_session):
    from gpml2pvjson_js_ray.pipelines.graph import condensation_levels

    # IN (6) → SCC {1,2,3} → bridge → SCC {4,5} → OUT chain 7→8;
    # isolated 9. Levels: {6}=0, {1,2,3}=1, {4,5}=2, {7}=3, {8}=4, {9}=0
    edges = rd.from_pandas(pd.DataFrame({
        "s": [6, 1, 2, 3, 3, 4, 5, 5, 7],
        "d": [1, 2, 3, 1, 4, 5, 4, 7, 8]}))
    nodes = rd.from_pandas(pd.DataFrame(
        {"n": [1, 2, 3, 4, 5, 6, 7, 8, 9]}))
    out = condensation_levels(edges, nodes, "s", "d").to_pandas()
    lv = dict(zip(out["node"], out["level"]))
    assert lv == {6: 0, 1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 7: 3, 8: 4, 9: 0}
    sc = dict(zip(out["node"], out["scc"]))
    assert sc[1] == sc[2] == sc[3] == 1 and sc[4] == sc[5] == 4


def test_host_condensation_levels_runs(ray_session):
    from gpml2pvjson_js_ray.pipelines import kg

    path = kg.pages_path_for_sf("/root/testdata/sf0.001")
    pages = kg.read_pages(path, columns=["url", "html"])
    out = webgraph_mod.host_condensation_levels(pages).to_pandas()
    assert len(out) == 27                      # every host labeled
    assert (out["level"] >= 0).all()
    # a host's level must be ≥ its in-neighbors' SCC levels... minimal
    # invariant: at least one level-0 source component exists
    assert (out["level"] == 0).any()


# -- events_user_type_entropy ----------------------------------------------------

def test_user_type_entropy_planted(ray_session, tmp_path):
    from gpml2pvjson_js_ray.pipelines import windows as win

    d = str(tmp_path)
    ts = pd.Timestamp("2024-01-01")
    # user 1: uniform over 2 types → ln 2; user 2: single type → 0.0
    # (and MUST be +0.0, not -0.0); user 3: 3:1 split; NULL user dropped
    _write(d, "events", pd.DataFrame({
        "user_id": pd.array([1, 1, 2, 3, 3, 3, 3, None],
                            dtype="Int64"),
        "event_type": ["a", "b", "a", "a", "a", "a", "b", "a"],
        "ts": [ts] * 8}))
    out = (win.events_user_type_entropy(d).to_pandas()
           .set_index("user_id"))
    assert list(out.index) == [1, 2, 3]
    assert out.loc[1, "entropy"] == round(math.log(2.0), 6)
    assert out.loc[2, "entropy"] == 0.0
    assert math.copysign(1.0, out.loc[2, "entropy"]) == 1.0   # +0.0
    p = np.array([0.75, 0.25])
    assert out.loc[3, "entropy"] == np.floor(
        -(p * np.log(p)).sum() * 1e6 + 0.5) * 1e-6
    assert out.loc[3, "n_events"] == 4


# -- nation_revenue_yoy ----------------------------------------------------------

def test_nation_revenue_yoy_planted(ray_session, tmp_path):
    d = str(tmp_path)
    _write(d, "nation", pd.DataFrame({
        "n_nationkey": [0, 1], "n_name": ["A_LAND", "B_LAND"],
        "n_regionkey": [0, 0]}))
    _write(d, "customer", pd.DataFrame({
        "c_custkey": [1, 2], "c_nationkey": [0, 1]}))
    # A_LAND: 100 → 150 (+0.5) → 120 (-0.2); B_LAND: single year → no row
    _write(d, "orders", pd.DataFrame({
        "o_custkey": [1, 1, 1, 1, 2],
        "o_totalprice": [60.0, 40.0, 150.0, 120.0, 99.0],
        "o_orderdate": [_ts("1996-03-01"), _ts("1996-09-01"),
                        _ts("1997-02-01"), _ts("1998-05-01"),
                        _ts("1996-01-01")]}))
    out = joins.nation_revenue_yoy(d).to_pandas()
    assert out["nation"].tolist() == ["A_LAND", "A_LAND"]
    assert out["o_year"].tolist() == [1997, 1998]
    assert out["revenue"].tolist() == [150.0, 120.0]
    assert out["yoy_growth"].tolist() == [0.5, -0.2]


def _ts(s):
    return np.datetime64(s, "us")


# -- N-Triples sink ---------------------------------------------------------------

def test_ntriples_term_mapping_and_escaping():
    import pyarrow as pa

    from gpml2pvjson_js_ray.functions.ntriples import (
        BIOPAX_NS, RDF_NS, WP_NS, lines_batch, xref_iri_factory)

    b = pa.table({
        "subj": ["n1", "n1", "dn2", "m3", "weird id!", "m3"],
        "pred": ["rdf:type", "hasXref", "textContent", "isPartOf",
                 "cites", "hasXref"],
        "obj": ["Complex", "Ensembl:ENSG000001",
                'say "hi"\n\tback\\slash', "g9",
                "px7", "NotADb:XYZ"],
        "obj_is_node": [False, False, False, True, True, False]})
    lines = lines_batch(b, xref_iri_of=xref_iri_factory()) \
        .column("line").to_pylist()
    assert lines[0] == f"_:n1 <{RDF_NS}type> <{BIOPAX_NS}Complex> ."
    assert lines[1] == (f"_:n1 <{WP_NS}hasXref> "
                        "<http://identifiers.org/ensembl/ENSG000001> .")
    assert lines[2] == (f'_:dn2 <{WP_NS}textContent> '
                        '"say \\"hi\\"\\n\\tback\\\\slash" .')
    assert lines[3] == f"_:m3 <{WP_NS}isPartOf> _:g9 ."
    assert lines[4].startswith("_:xweirdid") and lines[4].endswith("_:px7 .")
    assert lines[5] == f'_:m3 <{WP_NS}hasXref> "NotADb:XYZ" .'


def test_ntriples_blank_sanitize_is_collision_proof():
    from gpml2pvjson_js_ray.functions.ntriples import _blank

    a, b = _blank("a b"), _blank("a:b")          # both sanitize to "ab"
    assert a != b
    assert _blank("ok123") == "_:ok123"


def test_ntriples_export_grammar_count_idempotent(ray_session, tmp_path):
    import re

    from gpml2pvjson_js_ray.pipelines import kg

    path = kg.pages_path_for_sf("/root/testdata/sf0.001")
    out = str(tmp_path / "nt")
    man = kg.write_ntriples(kg.read_pages(path), out).to_pandas()
    n_expected = kg.deduped_triples_dataset(kg.read_pages(path)).count()
    assert int(man["n_triples"].sum()) == n_expected

    term = r'(?:<[^ >]+>|_:[A-Za-z][A-Za-z0-9]*|"(?:[^"\\]|\\.)*")'
    line_re = re.compile(rf"^{term} {term} {term} \.$")
    n_lines = 0
    for shard in man["shard"]:
        with open(os.path.join(out, shard), encoding="utf-8") as f:
            for line in f:
                assert line_re.match(line.rstrip("\n")), line
                n_lines += 1
    assert n_lines == n_expected

    # idempotence: a re-run rewrites the same content-addressed shards
    man2 = kg.write_ntriples(kg.read_pages(path), out).to_pandas()
    assert sorted(man2["shard"]) == sorted(man["shard"])


def test_nquads_provenance_export(ray_session, tmp_path):
    import re

    from gpml2pvjson_js_ray.pipelines import kg

    path = kg.pages_path_for_sf("/root/testdata/sf0.001")
    out = str(tmp_path / "nq")
    man = kg.write_ntriples(kg.read_pages(path), out, quads=True) \
        .to_pandas()
    # quads carry pre-dedup provenance: one statement per LINKED triple
    n_expected = kg.linked_triples_dataset(kg.read_pages(path)).count()
    assert int(man["n_triples"].sum()) == n_expected

    term = r'(?:<[^ >]+>|_:[A-Za-z][A-Za-z0-9]*|"(?:[^"\\]|\\.)*")'
    quad_re = re.compile(rf"^{term} {term} {term} <[^ >]+> \.$")
    checked = 0
    for shard in man["shard"]:
        assert shard.endswith(".nq")
        with open(os.path.join(out, shard), encoding="utf-8") as f:
            for line in f:
                assert quad_re.match(line.rstrip("\n")), line
                checked += 1
                assert "http" in line.rsplit("<", 1)[1]  # graph = crawl url
    assert checked == n_expected


# -- optional_join_from_layout -----------------------------------------------------

def test_optional_join_matches_full_scan_left_join(ray_session, tmp_path):
    """The PSO OPTIONAL join must equal a full-scan LEFT JOIN: every
    subject with the required predicate, optional count 0 when
    absent."""
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

    got = graph.optional_join_from_layout(
        pso_dir, "hasXref", "isPartOf").to_pandas()

    files = sorted(glob.glob(adj_dir + "/**/*.parquet", recursive=True))
    want = duckdb.sql(f"""
        WITH req AS (SELECT canonical_subj, count(*) AS n_required
                     FROM read_parquet({files!r})
                     WHERE pred = 'hasXref' GROUP BY 1),
        opt AS (SELECT canonical_subj, count(*) AS n_optional
                FROM read_parquet({files!r})
                WHERE pred = 'isPartOf' GROUP BY 1)
        SELECT req.canonical_subj, req.n_required,
               coalesce(opt.n_optional, 0) AS n_optional
        FROM req LEFT JOIN opt USING (canonical_subj)
        ORDER BY canonical_subj
    """).df()
    assert len(got) == len(want) and len(got) > 0
    assert got["canonical_subj"].tolist() == want["canonical_subj"].tolist()
    assert got["n_required"].tolist() == want["n_required"].tolist()
    assert got["n_optional"].tolist() == want["n_optional"].tolist()
    # OPTIONAL must preserve required-only subjects (else it's an inner join)
    assert (got["n_optional"] == 0).any()


# -- documents_winnowing_dups -------------------------------------------------------

def test_winnowing_guarantee_catches_local_overlap(ray_session, tmp_path):
    """The winnowing guarantee: a shared verbatim run of ≥ w+k-1 tokens
    must produce a shared fingerprint — even when the surrounding
    documents are completely different (the case whole-doc MinHash
    dilutes away)."""
    from gpml2pvjson_js_ray.pipelines import textops

    d = str(tmp_path)
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]

    def prose(n):
        return " ".join(rng.choice(vocab, size=n))

    shared = ("copied passage tokens " + " ".join(
        f"c{i}" for i in range(30))).strip()          # 33-token run
    texts = [prose(200) + " " + shared + " " + prose(200),
             prose(200) + " " + shared + " " + prose(200),
             prose(400), prose(400)]
    _write(d, "documents", pd.DataFrame({
        "doc_id": [0, 1, 2, 3], "text": texts}))
    out = textops.documents_winnowing_dups(d, min_shared=2).to_pandas()
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in got
    assert all(p == (0, 1) for p in got)               # no false pairs


def test_winnowing_rightmost_tie_and_density():
    import pyarrow as pa

    from gpml2pvjson_js_ray.pipelines.textops import _winnow_batch

    b = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["a b c d e f g h i j k l m n"])})
    out = _winnow_batch(b, w=4)
    # density: ~2/(w+1) of the k-gram count; at minimum ≥1 per window
    assert 1 <= out.num_rows <= 10
    # identical docs → identical fingerprint sets regardless of block
    b2 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                   "text": pa.array(["a b c d e f g h i j k l m n"] * 2)})
    out2 = _winnow_batch(b2, w=4)
    fps = out2.to_pandas().groupby("doc_id")["fp"].apply(set)
    assert fps[1] == fps[2]


# -- vacuum_orphans ----------------------------------------------------------------

def test_vacuum_orphans_safety_rules(tmp_path):
    from gpml2pvjson_js_ray.pipelines import maintenance

    d = str(tmp_path)
    for name, body in [("part-aa.nt", b"x"), ("part-bb.nt", b"yy"),
                       ("part-cc.parquet", b"zzz"),
                       ("part-dd.nt.tmp", b"inflight"),
                       ("_manifest.json", b"{}"),
                       ("notes.txt", b"hello")]:
        with open(os.path.join(d, name), "wb") as f:
            f.write(body)

    # dry run: reports the orphans, deletes nothing
    rep = maintenance.vacuum_orphans(
        d, ["part-aa.nt"], dry_run=True).to_pandas()
    acts = dict(zip(rep["file"], rep["action"]))
    assert acts == {"part-aa.nt": "kept", "part-bb.nt": "orphan",
                    "part-cc.parquet": "orphan"}
    assert os.path.exists(os.path.join(d, "part-bb.nt"))

    # real run: orphans deleted; manifest-listed, tmp, non-data survive
    rep2 = maintenance.vacuum_orphans(d, ["part-aa.nt"]).to_pandas()
    acts2 = dict(zip(rep2["file"], rep2["action"]))
    assert acts2["part-bb.nt"] == "deleted"
    assert acts2["part-cc.parquet"] == "deleted"
    assert not os.path.exists(os.path.join(d, "part-bb.nt"))
    for survivor in ["part-aa.nt", "part-dd.nt.tmp",
                     "_manifest.json", "notes.txt"]:
        assert os.path.exists(os.path.join(d, survivor)), survivor


def test_vacuum_after_ntriples_rerun(ray_session, tmp_path):
    """End-to-end: an export whose shard set changed (simulated stale
    shard) vacuums down to exactly the manifest's files."""
    from gpml2pvjson_js_ray.pipelines import kg, maintenance

    path = kg.pages_path_for_sf("/root/testdata/sf0.001")
    out = str(tmp_path / "nt")
    man = kg.write_ntriples(kg.read_pages(path), out).to_pandas()
    stale = os.path.join(out, "part-deadbeef00000000.nt")
    with open(stale, "w") as f:
        f.write("_:a <urn:p> \"v\" .\n")
    rep = maintenance.vacuum_orphans(out, list(man["shard"])).to_pandas()
    assert dict(zip(rep["file"], rep["action"]))[
        "part-deadbeef00000000.nt"] == "deleted"
    assert sorted(f for f in os.listdir(out) if f.endswith(".nt")) \
        == sorted(man["shard"])


# -- personalized pagerank -----------------------------------------------------------

def test_ppr_mass_concentrates_at_seed(ray_session):
    from gpml2pvjson_js_ray.pipelines.graph import personalized_pagerank

    # star: seed 1 links to 2,3,4; 2,3,4 link back to 1
    edges = rd.from_pandas(pd.DataFrame({
        "s": [1, 1, 1, 2, 3, 4], "d": [2, 3, 4, 1, 1, 1]}))
    nodes = rd.from_pandas(pd.DataFrame({"n": [1, 2, 3, 4, 5]}))
    out = personalized_pagerank(edges, nodes, "s", "d",
                                seeds=[1]).to_pandas()
    r = dict(zip(out["node"], out["r"]))
    assert abs(sum(r.values()) - 1.0) < 1e-9          # mass conserved
    assert r[1] > r[2] > 0                            # seed dominates
    assert abs(r[2] - r[3]) < 1e-12 and abs(r[3] - r[4]) < 1e-12
    assert r[5] == 0.0                                # unreachable: no mass


def test_host_ppr_runs_and_sums_to_one(ray_session):
    from gpml2pvjson_js_ray.pipelines import kg

    path = kg.pages_path_for_sf("/root/testdata/sf0.001")
    out = webgraph_mod.host_ppr(
        kg.read_pages(path, columns=["url", "html"])).to_pandas()
    assert len(out) == 27
    assert abs(out["rank"].sum() - 1.0) < 1e-6
    # the seed (smallest linking host) must hold the largest rank
    assert out.iloc[0]["rank"] == out["rank"].max()


# -- documents_tfidf_related_topk ----------------------------------------------------

def test_tfidf_related_prefers_rare_term_overlap(ray_session, tmp_path):
    """tf-idf must rank overlap on a RARE term above overlap on a
    corpus-wide term — the property raw token-count cosine lacks."""
    from gpml2pvjson_js_ray.pipelines import lexical

    d = str(tmp_path)
    # every doc shares 'common'; docs 0 and 1 share the rare 'zephyr';
    # docs 0 and 2 share only 'common' (plus equal filler mass)
    _write(d, "documents", pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["common zephyr alpha beta",
                 "common zephyr gamma delta",
                 "common epsilon zeta eta",
                 "common theta iota kappa"]}))
    out = lexical.documents_tfidf_related_topk(d, query_id=0, k=3) \
        .to_pandas()
    assert out.iloc[0]["doc_id"] == 1            # rare-term partner first
    assert out.iloc[0]["score"] > out.iloc[1]["score"]
    assert 0 not in set(out["doc_id"])           # query excluded
    # docs 2 and 3 overlap q only on 'common' (df = N → idf = 0): score 0
    tail = out.set_index("doc_id")["score"]
    assert tail[2] == 0.0 and tail[3] == 0.0


# -- nation_revenue_rolling3 ---------------------------------------------------------

def test_rolling3_frame_boundaries(ray_session, tmp_path):
    d = str(tmp_path)
    _write(d, "nation", pd.DataFrame({
        "n_nationkey": [0], "n_name": ["A_LAND"], "n_regionkey": [0]}))
    _write(d, "customer", pd.DataFrame({
        "c_custkey": [1], "c_nationkey": [0]}))
    # four months 10/20/30/40: frames [10], [10,20], [10,20,30],
    # [20,30,40] — the first two rows exercise the short-frame edge
    _write(d, "orders", pd.DataFrame({
        "o_custkey": [1, 1, 1, 1],
        "o_totalprice": [10.0, 20.0, 30.0, 40.0],
        "o_orderdate": [_ts("1996-01-05"), _ts("1996-02-05"),
                        _ts("1996-03-05"), _ts("1996-04-05")]}))
    out = joins.nation_revenue_rolling3(d).to_pandas()
    assert out["o_month"].tolist() == [199601, 199602, 199603, 199604]
    assert out["revenue_3mo"].tolist() == [10.0, 30.0, 60.0, 90.0]
