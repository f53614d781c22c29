"""Web-graph operators over the pages corpus: outlink extraction, the
host-level link graph, and the structural suite over it — PageRank
(plain / weighted / personalized), HITS, SCC + condensation levels +
Broder bow-tie, co-citation, link reciprocity, harmonic + closeness
centrality (exact BFS and the HyperBall sketch), distance histogram /
effective diameter, and anchor-text mention stats.

The reference converts one GPML document at a time; a web-scale KG
pipeline also needs the page-graph side — which hosts link to which
(crawl-frontier prioritization, hub/spam detection, PageRank features
for entity salience). Extraction is vectorized polars rust-regex over
the raw html column (the same binary→str decode pattern as
stages/extract.py); per-block partial counts mean the only exchange is
the (src_host, dst_host)-keyed groupby — O(hosts²) rows, never
O(pages), so at 10^12 pages the shuffle stays constant-size while the
extraction scans stream. The iterative algorithms reuse the generic
cores in pipelines/graph.py (co-partitioned join + groupby fold per
round) over the distinct host edges; every deterministic operator
carries a first-principles DuckDB oracle over the host-edge checkpoint
(closure SQL for reachability shapes, unrolled MATERIALIZED CTEs for
the fixed-iteration power methods).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_LINKS_SCHEMA = pa.schema([
    ("src_host", pa.string()),
    ("dst_host", pa.string()),
    ("n_links", pa.int64()),
])

# full-match attribute pattern (rust regex: no lookbehind); the host is
# re-extracted per exploded element with a capture group
_HREF_ATTR = r'href="https?://[^"]+"'
_HOST_OF_URL = r"^https?://([^/]+)"
_HOST_OF_HREF = r'^href="https?://([^/"]+)'


def host_link_edges_batch(b: pa.Table) -> pa.Table:
    """pages(url, html) → per-block (src_host, dst_host, n_links)
    partial counts. Vectorized end-to-end: one extract_all over the
    block's html, explode, two capture-group extracts, one local
    group_by. Relative hrefs (no scheme) are intra-host by definition
    and excluded — the HOST graph models cross-host endorsement."""
    from ..stages.exchange import polars_capped

    pl = polars_capped()
    df = pl.from_arrow(b.select(["url", "html"]))
    if df["html"].dtype == pl.Binary:
        df = df.with_columns(pl.col("html").cast(pl.String, strict=False))
    df = df.with_columns(
        src_host=pl.col("url").str.extract(_HOST_OF_URL, 1),
        href=pl.col("html").str.extract_all(_HREF_ATTR))
    ex = (df.select(["src_host", "href"]).explode("href")
          .drop_nulls()
          .with_columns(
              dst_host=pl.col("href").str.extract(_HOST_OF_HREF, 1))
          .drop_nulls())
    agg = (ex.group_by(["src_host", "dst_host"])
           .agg(pl.len().cast(pl.Int64).alias("n_links"))
           .select(["src_host", "dst_host", "n_links"]))
    return agg.to_arrow().cast(_LINKS_SCHEMA)


def host_link_graph(pages):
    """The host-level outlink graph: (src_host, dst_host, n_links),
    sorted by (src_host, dst_host). One groupby over per-block partials
    — the wide step carries at most |hosts|² rows per block."""
    from ray.data.aggregate import Sum

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "src_host": b.column("src_host"),
            "dst_host": b.column("dst_host"),
            "n_links": b.column("sum(n_links)"),
        })

    return (pages.map_batches(host_link_edges_batch,
                              batch_format="pyarrow")
            .groupby(["src_host", "dst_host"])
            .aggregate(Sum("n_links", alias_name="sum(n_links)"))
            .map_batches(rename, batch_format="pyarrow")
            .sort(["src_host", "dst_host"]))


_HOST_EDGES_ROOT = "/tmp/gpml2pvjson_webgraph"
# bump when host_link_edges extraction semantics change (stale-checkpoint
# invalidation, same discipline as kg.KG_PIPELINE_VERSION)
HOST_EDGES_VERSION = 1


def host_edges_checkpoint_path(sf_dir: str) -> str:
    """Deterministic host-edge-list parquet path for sf_dir's corpus —
    pure string arithmetic so oracle_sql() can embed it."""
    import os

    from .kg import SF_TO_N_PAGES
    from ..sources.pages import GEN_VERSION, SEED
    override = os.environ.get("GRAFT_N_PAGES")
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    n = int(override) if override else SF_TO_N_PAGES.get(sf_name, 2400)
    return os.path.join(
        _HOST_EDGES_ROOT,
        f"hostedges_n{n}_s{SEED}_v{GEN_VERSION}_h{HOST_EDGES_VERSION}"
        ".parquet")


def anchor_checkpoint_path(sf_dir: str) -> str:
    """Deterministic anchor-stats parquet path for sf_dir's corpus —
    pure string arithmetic so oracle_sql() can embed it."""
    import os

    from .kg import SF_TO_N_PAGES
    from ..sources.pages import GEN_VERSION, SEED
    override = os.environ.get("GRAFT_N_PAGES")
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    n = int(override) if override else SF_TO_N_PAGES.get(sf_name, 2400)
    return os.path.join(
        _HOST_EDGES_ROOT,
        f"anchors_n{n}_s{SEED}_v{GEN_VERSION}_h{HOST_EDGES_VERSION}"
        ".parquet")


def checkpoint_anchor_stats(pages, path: str):
    """Write the anchor-text stats to ONE byte-stable parquet (already
    sorted by anchor_text_stats). Driver-side collect is fine: the
    table is bounded by the distinct-mention vocabulary, never
    page-scale."""
    import os

    import pyarrow.parquet as pq
    t = pa.Table.from_pandas(anchor_text_stats(pages).to_pandas(),
                             preserve_index=False)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


def checkpoint_host_link_graph(pages, path: str):
    """Write the host link graph to ONE byte-stable parquet (already
    sorted by host_link_graph). Driver-side collect is fine: the edge
    list is |hosts|²-bounded (dozens of rows on the synthetic corpus),
    never page-scale."""
    import os

    import pyarrow.parquet as pq
    t = pa.Table.from_pandas(host_link_graph(pages).to_pandas(),
                             preserve_index=False)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


def _closure_ctes(p: str) -> str:
    """Shared CTE prefix: distinct host edges, node set, the full
    reachability closure (recursive CTE — fine here: the host graph is
    |hosts|²-bounded, never page-scale), and the SCC map scc(v) =
    lexicographically smallest u with v→u AND u→v (reflexive pairs
    seed the recursion, so singletons label themselves) — the same
    component representative graph.strongly_connected_components
    emits."""
    return f"""
d AS MATERIALIZED (SELECT DISTINCT src_host AS s, dst_host AS t
                   FROM read_parquet('{p}')),
-- explicit DISTINCT: under WITH RECURSIVE DuckDB compiles UNION in
-- non-recursive CTEs WITHOUT the implicit dedup (harmless here only
-- because every consumer aggregates — made explicit anyway)
nodes AS MATERIALIZED (SELECT DISTINCT h FROM (
  SELECT s AS h FROM d UNION ALL SELECT t FROM d)),
reach AS (SELECT h AS a, h AS b FROM nodes
          UNION
          SELECT r.a, d.t FROM reach r JOIN d ON d.s = r.b),
sccmap AS MATERIALIZED (
  SELECT n.h AS host, min(r1.b) AS scc
  FROM nodes n
  JOIN reach r1 ON r1.a = n.h
  JOIN reach r2 ON r2.a = r1.b AND r2.b = n.h
  GROUP BY n.h)"""


def webgraph_oracle_sql_for_sf(sf_dir: str = "/root/testdata/sf0.01",
                               max_out_degree: int = 64,
                               min_count: int = 2) -> dict:
    """DuckDB oracles over the engine-written host edge checkpoint:
    kg_host_link_graph is the identity-under-recompute determinism
    gate; every other entry is an independent first-principles
    recompute — co-citation wedge pairs by self-join, SCC/condensation
    levels by closed-form reachability closure (vs the engine's
    distributed trim + forward/backward min-label peeling), PageRank /
    personalized PageRank by the unrolled 8-iteration power method
    (vs the engine's co-partitioned join + groupby-sum rounds), anchor
    stats by an independent RE2 recount over the RAW pages html
    (round-5: the identity checkpoint read is gone — the driver gate
    now recomputes extraction + counting from source)."""
    from .graph import pagerank_oracle_sql
    from .kg import pages_glob

    p = host_edges_checkpoint_path(sf_dir)
    d_body = (f"SELECT DISTINCT src_host AS s, dst_host AS t "
              f"FROM read_parquet('{p}')")
    pg = pages_glob(sf_dir)
    return {
        "kg_host_scc": f"""
WITH RECURSIVE {_closure_ctes(p)}
SELECT host, scc FROM sccmap ORDER BY scc, host""",
        "kg_host_levels": f"""
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
GROUP BY m.host, m.scc ORDER BY level, scc, host""",
        "kg_host_pagerank": pagerank_oracle_sql(d_body, out_node="host"),
        "kg_host_pagerank_weighted": pagerank_oracle_sql(
            f"SELECT src_host AS s, dst_host AS t, "
            f"CAST(n_links AS DOUBLE) AS w FROM read_parquet('{p}')",
            out_node="host", weighted=True),
        "kg_host_ppr": pagerank_oracle_sql(d_body, out_node="host",
                                           personalized=True),
        # first-principles recount from the raw html: the same three
        # regexes (anchor element / host capture / text capture) in
        # RE2; regexp_extract's ''-on-no-match mirrors polars'
        # null + drop_nulls because both sub-patterns require >= 1 char
        "kg_anchor_texts": f"""
SELECT anchor_text, dst_host, CAST(count(*) AS BIGINT) AS n_mentions
FROM (SELECT regexp_extract(a, '{_ANCHOR_TEXT_RE}', 1) AS anchor_text,
             regexp_extract(a, '{_ANCHOR_HOST_RE}', 1) AS dst_host
      FROM (SELECT unnest(regexp_extract_all(decode(html),
                '{_ANCHOR_RE}')) AS a
            FROM read_parquet('{pg}')))
WHERE anchor_text <> '' AND dst_host <> ''
GROUP BY anchor_text, dst_host
ORDER BY anchor_text, dst_host""",
        "kg_host_link_graph":
            f"SELECT src_host, dst_host, n_links FROM read_parquet('{p}')",
        "kg_host_cocitation": f"""
WITH d AS (SELECT DISTINCT src_host, dst_host FROM read_parquet('{p}')),
deg AS (SELECT src_host, count(*) AS od FROM d GROUP BY src_host),
ok AS (SELECT d.* FROM d JOIN deg USING (src_host)
       WHERE od BETWEEN 2 AND {max_out_degree})
SELECT a.dst_host AS host_a, b.dst_host AS host_b,
       CAST(count(*) AS BIGINT) AS n_cociting
FROM ok a JOIN ok b
  ON a.src_host = b.src_host AND a.dst_host < b.dst_host
GROUP BY 1, 2 HAVING count(*) >= {min_count}""",
    }


_ANCHOR_SCHEMA = pa.schema([
    ("anchor_text", pa.string()),
    ("dst_host", pa.string()),
    ("n_mentions", pa.int64()),
])

# anchor element with an absolute href and non-empty tag-free text
_ANCHOR_RE = r'<a href="https?://[^"]+">[^<]+</a>'
_ANCHOR_HOST_RE = r'^<a href="https?://([^/"]+)'
_ANCHOR_TEXT_RE = r">([^<]+)</a>$"


def anchor_text_stats(pages):
    """(anchor_text, dst_host, n_mentions) over every absolute-href
    anchor in the corpus — the classic web-KG surface-form dictionary
    source (anchor text ≈ human-curated entity mention of the link
    target; mention counts weight the linker's candidate priors, the
    same role the BridgeDb xref dictionary plays for GPML islands in
    stages/link.py). Vectorized extract_all + two capture-group
    extracts per block; the exchange carries per-block partials keyed
    by (anchor_text, dst_host) — bounded by the distinct-mention
    vocabulary, not the corpus."""
    from ray.data.aggregate import Sum

    from ..stages.exchange import polars_capped

    def partial(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        df = pl.from_arrow(b.select(["html"]))
        if df["html"].dtype == pl.Binary:
            df = df.with_columns(
                pl.col("html").cast(pl.String, strict=False))
        ex = (df.with_columns(a=pl.col("html").str.extract_all(_ANCHOR_RE))
              .select(["a"]).explode("a").drop_nulls()
              .with_columns(
                  anchor_text=pl.col("a").str.extract(_ANCHOR_TEXT_RE, 1),
                  dst_host=pl.col("a").str.extract(_ANCHOR_HOST_RE, 1))
              .drop_nulls())
        agg = (ex.group_by(["anchor_text", "dst_host"])
               .agg(pl.len().cast(pl.Int64).alias("n_mentions"))
               .select(["anchor_text", "dst_host", "n_mentions"]))
        return agg.to_arrow().cast(_ANCHOR_SCHEMA)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "anchor_text": b.column("anchor_text"),
            "dst_host": b.column("dst_host"),
            "n_mentions": b.column("sum(n_mentions)"),
        })

    return (pages.map_batches(partial, batch_format="pyarrow")
            .groupby(["anchor_text", "dst_host"])
            .aggregate(Sum("n_mentions", alias_name="sum(n_mentions)"))
            .map_batches(rename, batch_format="pyarrow")
            .sort(["anchor_text", "dst_host"]))


def host_pagerank(pages, damping: float = 0.85, iters: int = 8,
                  num_partitions: int = 4):
    """PageRank over the distinct host edges (unweighted, the classic
    formulation — each outlinking host splits its rank evenly over the
    hosts it links to; dangling hosts redistribute uniformly). Returns
    (host, rank) sorted by rank desc then host; Σrank = 1."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from .graph import pagerank

    g = host_link_graph(pages).materialize()

    def side(col):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({"n": b.column(col)})
        return f

    nodes = (g.map_batches(side("src_host"), batch_format="pyarrow")
             .union(g.map_batches(side("dst_host"),
                                  batch_format="pyarrow"))
             .groupby("n").aggregate(Count(alias_name="c"))
             .map_batches(lambda b: b.select(["n"]),
                          batch_format="pyarrow"))

    ranks = pagerank(g, nodes, "src_host", "dst_host",
                     damping=damping, iters=iters,
                     num_partitions=num_partitions)

    def final_b(b: pa.Table) -> pa.Table:
        return pa.table({"host": b.column("node"),
                         "rank": pc.round(b.column("r"), ndigits=8)})

    return (ranks.map_batches(final_b, batch_format="pyarrow")
            .sort(["rank", "host"], descending=[True, False]))


_COCITE_SCHEMA = pa.schema([
    ("host_a", pa.string()),
    ("host_b", pa.string()),
    ("n_cociting", pa.int64()),
])


def host_cocitation(pages, max_out_degree: int = 64, min_count: int = 2):
    """Co-citation similarity edges between hosts: (host_a, host_b,
    n_cociting) = how many distinct source hosts link to BOTH — the
    classic related-site signal (Small 1973; Dean & Henzinger's related
    pages) and the edge set host-level entity resolution clusters over.

    Plan: the distinct host link graph folds per source host; pairs are
    generated INSIDE each source group (groupby(src_host).map_groups,
    vectorized triu indices), so the only exchanges are the distinct
    groupby and the pair-count groupby. The wedge blow-up is capped:
    source hosts citing more than `max_out_degree` distinct hosts are
    dropped BEFORE pairing (a directory page citing 10^4 hosts would
    emit 10^8 pairs and dominate the result with noise — the standard
    co-citation cap; the cap is a documented semantic, not a silent
    truncation). Pair count ≤ hosts × max_out_degree², independent of
    page count."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    def distinct(b: pa.Table) -> pa.Table:
        t = pa.table({"src_host": b.column("src_host"),
                      "dst_host": b.column("dst_host")})
        return t.group_by(["src_host", "dst_host"]).aggregate([])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        dsts = np.unique(df["dst_host"].to_numpy())
        if len(dsts) < 2 or len(dsts) > max_out_degree:
            return pd.DataFrame({
                "host_a": pd.Series([], dtype=str),
                "host_b": pd.Series([], dtype=str),
                "n": pd.Series([], dtype="int64")})
        i, j = np.triu_indices(len(dsts), k=1)
        return pd.DataFrame({"host_a": dsts[i], "host_b": dsts[j],
                             "n": np.ones(len(i), dtype=np.int64)})

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return (b.filter(pc.greater_equal(b.column("n_cociting"),
                                          pa.scalar(min_count)))
                .select(["host_a", "host_b", "n_cociting"]))

    return (pages.map_batches(host_link_edges_batch,
                              batch_format="pyarrow")
            .map_batches(distinct, batch_format="pyarrow")
            .groupby("src_host")
            .map_groups(pairs, batch_format="pandas")
            .groupby(["host_a", "host_b"])
            .aggregate(Sum("n", alias_name="n_cociting"))
            .map_batches(finish, batch_format="pyarrow")
            .sort(["n_cociting", "host_a", "host_b"],
                  descending=[True, False, False]))


def host_scc(pages, num_partitions: int = 4):
    """Strongly connected components of the directed host link graph —
    the mutual-reachability cores (link rings, partner networks,
    mirror clusters) that co-citation and PageRank treat as one unit;
    the directed refinement of the undirected components the entity
    resolver uses. Host-level SCC is the classic web-graph structure
    probe (Broder et al. 2000's bow-tie: one giant SCC + IN/OUT DAG
    fringe — exactly the shape the operator's TRIM step exploits).

    Plan: the distinct host edge list (constant-size host exchange,
    same as host_pagerank) feeds graph.strongly_connected_components;
    nodes = every host seen on either side, so link-less hosts label
    themselves. Returns (host, scc) sorted by (scc, host), scc = the
    lexicographically smallest host of the component."""
    from ray.data.aggregate import Count

    from .graph import strongly_connected_components

    g = (pages.map_batches(host_link_edges_batch, batch_format="pyarrow")
         .map_batches(lambda b: pa.table({"src_host": b.column("src_host"),
                                          "dst_host": b.column("dst_host")})
                      .group_by(["src_host", "dst_host"]).aggregate([]),
                      batch_format="pyarrow")
         .repartition(num_partitions).materialize())
    nodes = (g.map_batches(lambda b: pa.table({"h": b.column("src_host")}),
                           batch_format="pyarrow")
             .union(g.map_batches(
                 lambda b: pa.table({"h": b.column("dst_host")}),
                 batch_format="pyarrow"))
             .map_batches(lambda b: b.group_by(["h"]).aggregate([]),
                          batch_format="pyarrow")
             # global distinct: key column lands first in the output,
             # which is exactly what scc's nodes contract (column 0) reads
             .groupby("h").aggregate(Count(alias_name="_n")))
    scc = strongly_connected_components(g, nodes, "src_host", "dst_host",
                                        num_partitions=num_partitions)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"host": b.column("node"),
                         "scc": b.column("scc")})

    return (scc.map_batches(rename, batch_format="pyarrow")
            .sort(["scc", "host"]))


def host_condensation_levels(pages, num_partitions: int = 4):
    """Crawl-frontier stratification of the host graph: collapse SCCs
    (mirror rings, mutual-link cores) and report each host's depth in
    the acyclic condensation — level 0 = source components nothing
    links into, level k = longest condensed link chain from any
    source. The bow-tie IN→SCC→OUT picture of Broder et al. 2000 as a
    per-host integer. Same distinct host edge list as host_scc; see
    graph.condensation_levels for the fixpoint shape. Returns (host,
    scc, level) sorted by (level, scc, host)."""
    from ray.data.aggregate import Count

    from .graph import condensation_levels

    g = (pages.map_batches(host_link_edges_batch, batch_format="pyarrow")
         .map_batches(lambda b: pa.table({"src_host": b.column("src_host"),
                                          "dst_host": b.column("dst_host")})
                      .group_by(["src_host", "dst_host"]).aggregate([]),
                      batch_format="pyarrow")
         .repartition(num_partitions).materialize())
    nodes = (g.map_batches(lambda b: pa.table({"h": b.column("src_host")}),
                           batch_format="pyarrow")
             .union(g.map_batches(
                 lambda b: pa.table({"h": b.column("dst_host")}),
                 batch_format="pyarrow"))
             .map_batches(lambda b: b.group_by(["h"]).aggregate([]),
                          batch_format="pyarrow")
             .groupby("h").aggregate(Count(alias_name="_n")))
    lv = condensation_levels(g, nodes, "src_host", "dst_host",
                             num_partitions=num_partitions)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"host": b.column("node"),
                         "scc": b.column("scc"),
                         "level": b.column("level")})

    return (lv.map_batches(rename, batch_format="pyarrow")
            .sort(["level", "scc", "host"]))



def host_ppr(pages, seed_host: str | None = None, damping: float = 0.85,
             iters: int = 8, num_partitions: int = 4):
    """Personalized PageRank from a seed host — "hosts most related to
    X" by random-walk-with-restart over the distinct host link graph
    (the local-ranking dual of the global host_pagerank). Default seed:
    the lexicographically smallest linking host, so the query is
    deterministic without configuration. Returns (host, rank) sorted
    by rank desc then host; Σrank = 1."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from .graph import personalized_pagerank

    g = host_link_graph(pages).materialize()
    if seed_host is None:
        # distributed Min aggregate — one scalar to the driver, never
        # the edge rows
        seed_host = g.min("src_host")

    def side(col):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({"n": b.column(col)})
        return f

    nodes = (g.map_batches(side("src_host"), batch_format="pyarrow")
             .union(g.map_batches(side("dst_host"),
                                  batch_format="pyarrow"))
             .groupby("n").aggregate(Count(alias_name="c"))
             .map_batches(lambda b: b.select(["n"]),
                          batch_format="pyarrow"))

    ranks = personalized_pagerank(g, nodes, "src_host", "dst_host",
                                  seeds=[seed_host], damping=damping,
                                  iters=iters,
                                  num_partitions=num_partitions)

    def final_b(b: pa.Table) -> pa.Table:
        return pa.table({"host": b.column("node"),
                         "rank": pc.round(b.column("r"), ndigits=8)})

    return (ranks.map_batches(final_b, batch_format="pyarrow")
            .sort(["rank", "host"], descending=[True, False]))


def _distinct_host_edges(pages, num_partitions: int = 4):
    """GLOBALLY distinct (src_host, dst_host) edge Dataset +
    distinct-host node Dataset — the shared front end of the structural
    host-graph ops. host_scc's per-block distinct is NOT enough here:
    HITS sums and reciprocity counts are multiplicity-sensitive, so the
    edge list reuses host_link_graph's global groupby (the same
    constant-size host exchange)."""
    from ray.data.aggregate import Count

    g = (host_link_graph(pages)
         .map_batches(lambda b: b.select(["src_host", "dst_host"]),
                      batch_format="pyarrow")
         .repartition(num_partitions).materialize())
    nodes = (g.map_batches(lambda b: pa.table({"h": b.column("src_host")}),
                           batch_format="pyarrow")
             .union(g.map_batches(
                 lambda b: pa.table({"h": b.column("dst_host")}),
                 batch_format="pyarrow"))
             .map_batches(lambda b: b.group_by(["h"]).aggregate([]),
                          batch_format="pyarrow")
             .groupby("h").aggregate(Count(alias_name="_n"))
             .map_batches(lambda b: pa.table({"h": b.column("h")}),
                          batch_format="pyarrow")
             .repartition(num_partitions).materialize())
    return g, nodes


def host_hits(pages, iters: int = 8, num_partitions: int = 4):
    """HITS over the distinct host link graph: (host, hub, authority),
    authorities ≈ heavily-cited content hosts, hubs ≈ directory hosts —
    the role-separating companion to host_pagerank (Kleinberg JACM'99).
    Sorted authority desc then host; scores L1-normalized, rounded to
    10 decimals (same output discipline as host_pagerank)."""
    import pyarrow.compute as pc

    from .graph import hits

    g, nodes = _distinct_host_edges(pages, num_partitions)
    out = hits(g, nodes, "src_host", "dst_host", iters=iters,
               num_partitions=num_partitions)

    def final_b(b: pa.Table) -> pa.Table:
        return pa.table({"host": b.column("node"),
                         "hub": pc.round(b.column("hub"), ndigits=8),
                         "authority": pc.round(b.column("authority"),
                                               ndigits=8)})

    return (out.map_batches(final_b, batch_format="pyarrow")
            .sort(["authority", "host"], descending=[True, False]))


def host_reciprocity(pages, num_partitions: int = 4):
    """Per-host link reciprocity: of the distinct hosts a host links
    to, what fraction link back — the classic link-ring / partner-
    network signal (a spam farm reciprocates ~1.0, editorial linking
    much lower). Returns (host, n_out, n_reciprocal, reciprocity)
    sorted by host; the ratio is an exact float64 division (no
    rounding needed for oracle parity — both engines compute the same
    single IEEE op)."""
    g, _nodes = _distinct_host_edges(pages, num_partitions)
    return reciprocity_from_edges(g, num_partitions)


def reciprocity_from_edges(g, num_partitions: int = 4):
    """host_reciprocity's body over a prepared globally-distinct
    (src_host, dst_host) edge Dataset (planted-graph tests drive this
    directly)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    rev = g.map_batches(
        lambda b: pa.table({"rsrc": b.column("dst_host"),
                            "rdst": b.column("src_host"),
                            "flag": pa.array(
                                np.ones(b.num_rows, dtype=np.int64))}),
        batch_format="pyarrow").repartition(num_partitions).materialize()
    j = g.join(rev, join_type="left_outer",
               num_partitions=num_partitions,
               on=("src_host", "dst_host"), right_on=("rsrc", "rdst"))

    def flags(b: pa.Table) -> pa.Table:
        return pa.table({
            "host": b.column("src_host"),
            "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "rec": pc.fill_null(b.column("flag"), 0).cast(pa.int64())})

    agg = (j.map_batches(flags, batch_format="pyarrow")
           .groupby("host")
           .aggregate(Sum("one", alias_name="n_out"),
                      Sum("rec", alias_name="n_reciprocal")))

    def final_b(b: pa.Table) -> pa.Table:
        return pa.table({
            "host": b.column("host"),
            "n_out": b.column("n_out").cast(pa.int64()),
            "n_reciprocal": b.column("n_reciprocal").cast(pa.int64()),
            "reciprocity": pc.divide(
                pc.cast(b.column("n_reciprocal"), pa.float64()),
                pc.cast(b.column("n_out"), pa.float64()))})

    return agg.map_batches(final_b, batch_format="pyarrow").sort("host")


def host_bowtie(pages, num_partitions: int = 4):
    """Broder et al. (WWW'00) bow-tie decomposition of the host graph:
    every host classified relative to the LARGEST strongly connected
    component — 'scc' (core member), 'in' (reaches the core), 'out'
    (reachable from the core), 'other' (tendrils + disconnected). The
    canonical macro-structure probe of a crawl corpus; core = the
    biggest SCC, smallest representative id on ties. Returns
    (host, region) sorted by (region, host)."""
    g, nodes = _distinct_host_edges(pages, num_partitions)
    return bowtie_from_edges(g, nodes, num_partitions)


def bowtie_from_edges(g, nodes, num_partitions: int = 4):
    """host_bowtie's body over prepared globally-distinct edges + node
    Datasets (planted-graph tests drive this directly)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from .graph import directed_reachable, strongly_connected_components

    scc = strongly_connected_components(
        g, nodes, "src_host", "dst_host",
        num_partitions=num_partitions).materialize()
    top = (scc.groupby("scc").aggregate(Count(alias_name="n"))
           .sort(["n", "scc"], descending=[True, False]).limit(1).take(1))
    core_id = top[0]["scc"]

    def core_b(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("scc"), pa.scalar(core_id))
        return pa.table({"node": b.filter(keep).column("node")})

    core = scc.map_batches(core_b, batch_format="pyarrow").materialize()
    fwd = directed_reachable(g, core, "src_host", "dst_host",
                             num_partitions=num_partitions)
    bwd = directed_reachable(g, core, "dst_host", "src_host",
                             num_partitions=num_partitions)

    def flag(ds, name):
        return ds.map_batches(
            lambda b, n=name: pa.table({
                "fn": b.column("node"),
                n: pa.array(np.ones(b.num_rows, dtype=np.int8))}),
            batch_format="pyarrow").repartition(num_partitions) \
            .materialize()

    out = (scc.join(flag(fwd, "f"), join_type="left_outer",
                    num_partitions=num_partitions,
                    on=("node",), right_on=("fn",))
           # merge away the first join's zero-column empty partitions
           # (the chained-join pitfall documented at
           # graph.condensation_levels)
           .repartition(num_partitions)
           .join(flag(bwd, "b"), join_type="left_outer",
                 num_partitions=num_partitions,
                 on=("node",), right_on=("fn",)))

    def classify(b: pa.Table) -> pa.Table:
        in_core = pc.equal(b.column("scc"), pa.scalar(core_id))
        f = pc.fill_null(b.column("f"), 0)
        bb = pc.fill_null(b.column("b"), 0)
        region = pc.if_else(
            in_core, pa.scalar("scc"),
            pc.if_else(pc.equal(f, 1), pa.scalar("out"),
                       pc.if_else(pc.equal(bb, 1), pa.scalar("in"),
                                  pa.scalar("other"))))
        return pa.table({"host": b.column("node"), "region": region})

    return (out.map_batches(classify, batch_format="pyarrow")
            .sort(["region", "host"]))


def structural_oracle_sql_for_sf(sf_dir: str) -> dict:
    """DuckDB oracles for the structural host-graph additions — HITS by
    the unrolled fixed-iteration recompute, reciprocity by a relational
    self-join, bow-tie by the reachability closure (core = largest SCC,
    min id on ties; 'in'/'out' membership from the same closure the SCC
    map derives from)."""
    from .graph import hits_oracle_sql

    p = host_edges_checkpoint_path(sf_dir)
    d_body = (f"SELECT DISTINCT src_host AS s, dst_host AS t "
              f"FROM read_parquet('{p}')")
    return {
        # exact harmonic centrality: bounded-depth shortest-path walk
        # (the depth guard terminates cyclic walks; min(dist) per pair)
        "kg_host_harmonic": f"""
WITH RECURSIVE
d AS MATERIALIZED ({d_body}),
-- explicit DISTINCT: under WITH RECURSIVE DuckDB compiles UNION in
-- non-recursive CTEs WITHOUT the implicit dedup
nodes AS MATERIALIZED (SELECT DISTINCT h FROM (
  SELECT s AS h FROM d UNION ALL SELECT t FROM d)),
nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
walk AS (
  SELECT s AS a, t AS b, 1 AS dist FROM d
  UNION
  SELECT w.a, d.t, w.dist + 1 FROM walk w JOIN d ON d.s = w.b
  WHERE w.dist + 1 < (SELECT n FROM nn)),
sp AS (SELECT b, sum(1.0 / md) AS hm FROM (
         SELECT a, b, min(dist) AS md FROM walk
         WHERE a <> b GROUP BY a, b)
       GROUP BY b)
SELECT nodes.h AS host, round(coalesce(sp.hm, 0.0), 8) AS harmonic
FROM nodes LEFT JOIN sp ON sp.b = nodes.h
ORDER BY harmonic DESC, host""",
        # in-closeness off the same bounded walk: n/S per target with
        # zero-fill for unreached hosts (int inputs → the one float
        # division is bit-identical, no rounding needed)
        "kg_host_closeness": f"""
WITH RECURSIVE
d AS MATERIALIZED ({d_body}),
nodes AS MATERIALIZED (SELECT DISTINCT h FROM (
  SELECT s AS h FROM d UNION ALL SELECT t FROM d)),
nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
walk AS (
  SELECT s AS a, t AS b, 1 AS dist FROM d
  UNION
  SELECT w.a, d.t, w.dist + 1 FROM walk w JOIN d ON d.s = w.b
  WHERE w.dist + 1 < (SELECT n FROM nn)),
sp AS (SELECT b, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(md) AS BIGINT) AS s
       FROM (SELECT a, b, min(dist) AS md FROM walk
             WHERE a <> b GROUP BY a, b)
       GROUP BY b)
SELECT nodes.h AS host,
       coalesce(sp.n, 0) AS n_reached_by,
       CASE WHEN sp.n IS NULL THEN 0.0
            ELSE CAST(sp.n AS DOUBLE) / CAST(sp.s AS DOUBLE) END
           AS closeness
FROM nodes LEFT JOIN sp ON sp.b = nodes.h
ORDER BY closeness DESC, host""",
        # joint in/out degree distribution with zero-degree rows
        "kg_host_degree_distribution": f"""
WITH d AS MATERIALIZED ({d_body}),
nodes AS (SELECT s AS h FROM d UNION SELECT t FROM d),
outd AS (SELECT nodes.h, count(d.s) AS deg
         FROM nodes LEFT JOIN d ON d.s = nodes.h GROUP BY nodes.h),
ind AS (SELECT nodes.h, count(d.t) AS deg
        FROM nodes LEFT JOIN d ON d.t = nodes.h GROUP BY nodes.h),
dirs AS (
  SELECT 'out' AS direction, deg FROM outd
  UNION ALL
  SELECT 'in', deg FROM ind)
SELECT direction, CAST(deg AS BIGINT) AS degree,
       CAST(count(*) AS BIGINT) AS n_hosts
FROM dirs GROUP BY direction, deg ORDER BY direction, degree""",
        # one-row diameter summary: the same histogram folded to
        # (n_pairs, diameter, interpolated effective diameter) — the
        # interpolation expression mirrors graph.effective_diameter's
        # op order exactly (int operands promote identically)
        "kg_host_effective_diameter": f"""
WITH RECURSIVE
d AS MATERIALIZED ({d_body}),
nodes AS MATERIALIZED (SELECT DISTINCT h FROM (
  SELECT s AS h FROM d UNION ALL SELECT t FROM d)),
nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
walk AS (
  SELECT s AS a, t AS b, 1 AS dist FROM d
  UNION
  SELECT w.a, d.t, w.dist + 1 FROM walk w JOIN d ON d.s = w.b
  WHERE w.dist + 1 < (SELECT n FROM nn)),
hist AS MATERIALIZED (
  SELECT md AS dist, count(*) AS n_pairs
  FROM (SELECT a, b, min(dist) AS md FROM walk
        WHERE a <> b GROUP BY a, b)
  GROUP BY md),
c1 AS (SELECT dist, sum(n_pairs) OVER (ORDER BY dist) AS cum FROM hist),
c2 AS (SELECT dist, cum,
              coalesce(lag(dist) OVER (ORDER BY dist), 0) AS pd,
              coalesce(lag(cum) OVER (ORDER BY dist), 0) AS pc
       FROM c1),
t AS (SELECT 0.9 * CAST(sum(n_pairs) AS DOUBLE) AS target,
             CAST(sum(n_pairs) AS BIGINT) AS total FROM hist),
pick AS (SELECT c2.* FROM c2, t WHERE cum >= target
         ORDER BY dist LIMIT 1)
SELECT t.total AS n_pairs,
       (SELECT CAST(max(dist) AS BIGINT) FROM hist) AS diameter,
       CAST(pick.pd + (pick.dist - pick.pd) *
            ((t.target - pick.pc) / (pick.cum - pick.pc)) AS DOUBLE)
           AS effective_diameter
FROM pick, t""",
        # pairwise distance distribution from the same bounded walk
        "kg_host_distance_histogram": f"""
WITH RECURSIVE
d AS MATERIALIZED ({d_body}),
nodes AS MATERIALIZED (SELECT DISTINCT h FROM (
  SELECT s AS h FROM d UNION ALL SELECT t FROM d)),
nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
walk AS (
  SELECT s AS a, t AS b, 1 AS dist FROM d
  UNION
  SELECT w.a, d.t, w.dist + 1 FROM walk w JOIN d ON d.s = w.b
  WHERE w.dist + 1 < (SELECT n FROM nn))
SELECT CAST(md AS BIGINT) AS dist, CAST(count(*) AS BIGINT) AS n_pairs
FROM (SELECT a, b, min(dist) AS md FROM walk
      WHERE a <> b GROUP BY a, b)
GROUP BY md ORDER BY md""",
        "kg_host_hits": hits_oracle_sql(d_body, out_node="host"),
        "kg_host_reciprocity": f"""
WITH d AS MATERIALIZED ({d_body})
SELECT a.s AS host, CAST(count(*) AS BIGINT) AS n_out,
       CAST(count(r.s) AS BIGINT) AS n_reciprocal,
       CAST(count(r.s) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           AS reciprocity
FROM d a LEFT JOIN d r ON r.s = a.t AND r.t = a.s
GROUP BY a.s ORDER BY host""",
        "kg_host_bowtie": f"""
WITH RECURSIVE {_closure_ctes(p)},
core AS MATERIALIZED (
  SELECT host FROM sccmap WHERE scc = (
    SELECT scc FROM sccmap GROUP BY scc
    ORDER BY count(*) DESC, scc LIMIT 1)),
fwd AS MATERIALIZED (
  SELECT DISTINCT r.b AS host FROM reach r
  JOIN core c ON r.a = c.host),
bwd AS MATERIALIZED (
  SELECT DISTINCT r.a AS host FROM reach r
  JOIN core c ON r.b = c.host)
SELECT m.host,
       CASE WHEN m.host IN (SELECT host FROM core) THEN 'scc'
            WHEN m.host IN (SELECT host FROM fwd) THEN 'out'
            WHEN m.host IN (SELECT host FROM bwd) THEN 'in'
            ELSE 'other' END AS region
FROM sccmap m ORDER BY region, host""",
    }


def host_harmonic(pages, num_partitions: int = 4):
    """Exact harmonic centrality of every host over the distinct host
    link graph — Boldi-Vigna's centrality of choice for web graphs
    (finite under disconnection). Engine: level-synchronous
    multi-source BFS (graph.harmonic_centrality); oracle: bounded-
    depth shortest-path closure SQL. Returns (host, harmonic) sorted
    desc then host. O(V·reach) pair state; at 100× the host graph run
    host_harmonic_hyperball instead."""
    from .graph import harmonic_centrality

    g, nodes = _distinct_host_edges(pages, num_partitions)
    out = harmonic_centrality(g, nodes, "src_host", "dst_host",
                              num_partitions=num_partitions)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"host": b.column("node"),
                         "harmonic": b.column("harmonic")})

    return (out.map_batches(rename, batch_format="pyarrow")
            .sort(["harmonic", "host"], descending=[True, False]))


def host_harmonic_hyperball(pages, num_partitions: int = 4):
    """HyperBall approximation of host_harmonic (64-register HLL
    in-balls; see graph.hyperball_harmonic) — the O(V × 64 B) scale
    path; rows-only for the driver, accuracy pinned against the exact
    twin in pytest."""
    from .graph import hyperball_harmonic

    g, nodes = _distinct_host_edges(pages, num_partitions)
    out = hyperball_harmonic(g, nodes, "src_host", "dst_host",
                             num_partitions=num_partitions)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"host": b.column("node"),
                         "harmonic_est": b.column("harmonic_est")})

    return (out.map_batches(rename, batch_format="pyarrow")
            .sort(["harmonic_est", "host"], descending=[True, False]))


def host_closeness_hyperball(pages, num_partitions: int = 4):
    """HyperBall approximation of host_closeness (nreach/sdist off the
    shared register sweep; graph.hyperball_closeness) — the O(V × 64 B)
    scale path for the Lin-corrected in-closeness; rows-only for the
    driver, accuracy pinned against the exact twin in pytest."""
    from .graph import hyperball_closeness

    g, nodes = _distinct_host_edges(pages, num_partitions)
    out = hyperball_closeness(g, nodes, "src_host", "dst_host",
                              num_partitions=num_partitions)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"host": b.column("node"),
                         "n_reached_by_est": b.column("n_reached_by_est"),
                         "closeness_est": b.column("closeness_est")})

    return (out.map_batches(rename, batch_format="pyarrow")
            .sort(["closeness_est", "host"], descending=[True, False]))


def host_distance_histogram(pages, num_partitions: int = 4):
    """Pairwise shortest-path distance distribution of the host graph
    (dist, n_pairs) — the Broder et al. structure probe behind
    diameter / effective-diameter claims; integer-valued, so the
    closure SQL oracle checks it hash-exact. O(V·reach) pair state by
    construction (the exact form IS the oracle); at 100× the host
    graph run host_distance_histogram_hyperball instead."""
    from .graph import distance_histogram

    g, _nodes = _distinct_host_edges(pages, num_partitions)
    return distance_histogram(g, "src_host", "dst_host",
                              num_partitions=num_partitions)


def host_distance_histogram_hyperball(pages, num_partitions: int = 4):
    """HyperBall approximation of host_distance_histogram: the global
    neighborhood-function increments N(k) - N(k-1) (Boldi-Vigna
    HyperANF) as (dist, n_pairs_est) — O(V × 64 B) state and one float
    per distance on the driver; the 100× path. Rows-only for the
    driver, accuracy pinned against the exact twin in pytest."""
    from .graph import hyperball_distance_histogram

    g, nodes = _distinct_host_edges(pages, num_partitions)
    return hyperball_distance_histogram(g, nodes, "src_host",
                                        "dst_host",
                                        num_partitions=num_partitions)


def host_closeness(pages, num_partitions: int = 4):
    """Directed in-closeness of every host (Lin-corrected n/S; see
    graph.closeness_centrality) — off the same multi-source BFS as
    host_harmonic; integer-exact inputs make the oracle division
    bit-identical. O(V·reach) pair state; at 100× the host graph run
    host_closeness_hyperball instead."""
    from .graph import closeness_centrality

    g, nodes = _distinct_host_edges(pages, num_partitions)
    out = closeness_centrality(g, nodes, "src_host", "dst_host",
                               num_partitions=num_partitions)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"host": b.column("node"),
                         "n_reached_by": b.column("n_reached_by"),
                         "closeness": b.column("closeness")})

    return (out.map_batches(rename, batch_format="pyarrow")
            .sort(["closeness", "host"], descending=[True, False]))


def host_pagerank_weighted(pages, damping: float = 0.85, iters: int = 8,
                           num_partitions: int = 4):
    """Link-count-weighted host PageRank: each host splits its rank
    over its outlinks IN PROPORTION to n_links (the weighted random
    surfer) — ten links to one partner host count ten times the
    endorsement of one, where host_pagerank's distinct-edge walk
    counts them equally. Same round shape; oracle: the weighted
    unrolled power method. Returns (host, rank), Σrank = 1."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from .graph import pagerank

    g = host_link_graph(pages).materialize()

    def side(col):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({"n": b.column(col)})
        return f

    nodes = (g.map_batches(side("src_host"), batch_format="pyarrow")
             .union(g.map_batches(side("dst_host"),
                                  batch_format="pyarrow"))
             .groupby("n").aggregate(Count(alias_name="c"))
             .map_batches(lambda b: b.select(["n"]),
                          batch_format="pyarrow"))

    ranks = pagerank(g, nodes, "src_host", "dst_host",
                     damping=damping, iters=iters,
                     num_partitions=num_partitions, weight="n_links")

    def final_b(b: pa.Table) -> pa.Table:
        return pa.table({"host": b.column("node"),
                         "rank": pc.round(b.column("r"), ndigits=8)})

    return (ranks.map_batches(final_b, batch_format="pyarrow")
            .sort(["rank", "host"], descending=[True, False]))


def host_effective_diameter(pages, q: float = 0.9,
                            num_partitions: int = 4):
    """One-row host-graph summary: pair count, exact diameter, and the
    interpolated effective diameter at q (graph.effective_diameter) —
    the canonical small-world statistic of the crawl. O(V·reach) pair
    state; at 100× the host graph run
    host_effective_diameter_hyperball instead."""
    from .graph import effective_diameter

    g, _nodes = _distinct_host_edges(pages, num_partitions)
    return effective_diameter(g, "src_host", "dst_host", q=q,
                              num_partitions=num_partitions)


def host_effective_diameter_hyperball(pages, q: float = 0.9,
                                      num_partitions: int = 4):
    """HyperBall approximation of host_effective_diameter (the
    HyperANF use-case itself: effective diameter from the HLL
    neighborhood function, Boldi-Vigna WWW'13) — O(V × 64 B) state, the
    100× path. Rows-only for the driver, accuracy pinned against the
    exact twin in pytest."""
    from .graph import hyperball_effective_diameter

    g, nodes = _distinct_host_edges(pages, num_partitions)
    return hyperball_effective_diameter(g, nodes, "src_host",
                                        "dst_host", q=q,
                                        num_partitions=num_partitions)


def host_degree_distribution(pages, num_partitions: int = 4):
    """Joint degree distribution of the host graph: one row per
    (direction, degree) with the number of hosts at that degree —
    direction 'in' or 'out', distinct edges, zero-degree hosts
    included (a host with no outlinks appears at out-degree 0). The
    power-law probe behind crawl-prioritization and spam heuristics;
    pure-integer output, hash-exact SQL oracle."""
    from ray.data.aggregate import Count

    g, nodes = _distinct_host_edges(pages, num_partitions)

    def deg_of(col, label):
        d = (g.map_batches(lambda b, c=col: pa.table(
                {"h": b.column(c)}), batch_format="pyarrow")
             .groupby("h").aggregate(Count(alias_name="deg"))
             .map_batches(lambda b: pa.table({
                 "rh": b.column("h"),
                 "deg": b.column("deg").cast(pa.int64())}),
                 batch_format="pyarrow")
             .repartition(num_partitions).materialize())
        full = nodes.join(d, join_type="left_outer",
                          num_partitions=num_partitions,
                          on=("h",), right_on=("rh",))

        def fill(b: pa.Table, _l=label) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({
                "direction": pa.array([_l] * b.num_rows),
                "degree": pc.fill_null(b.column("deg"), 0)
                .cast(pa.int64())})
        return full.map_batches(fill, batch_format="pyarrow")

    both = deg_of("src_host", "out").union(deg_of("dst_host", "in"))
    out = (both.groupby(["direction", "degree"])
           .aggregate(Count(alias_name="n_hosts")))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"direction": b.column("direction"),
                         "degree": b.column("degree"),
                         "n_hosts": b.column("n_hosts").cast(pa.int64())})

    return (out.map_batches(fin, batch_format="pyarrow")
            .sort(["direction", "degree"]))
