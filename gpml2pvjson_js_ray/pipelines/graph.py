"""Distributed graph operators: connected components over an edge
Dataset (hash-min label propagation).

The KG-construction companion to the dedup surface: near-duplicate
PAIRS (MinHash / n-gram Jaccard) become duplicate CLUSTERS only after a
transitive closure, and entity-resolution merges need the same
operator over alias edges. Ray Data has no built-in for it.

Algorithm: iterative hash-min label propagation expressed purely in
Dataset ops — per round, every node's label flows across its edges
(one hash `join` edges⋈labels), and each node keeps the minimum label
seen (`groupby(node).min`). Rounds = graph diameter; near-dup clusters
and alias groups have tiny diameters, so 3-5 rounds close real
corpora. Convergence is detected by the label-sum fixpoint (labels
only ever decrease, so an unchanged sum ⟺ no label moved).

Scale shape: the working set per round is the (node, label) table and
the static undirected edge list — both hash-partitioned by the SAME
key (`node` / `a`), so each round is one co-partitioned join plus one
shuffle-combine groupby; nothing ever gathers on the driver. For
web-scale graphs with adversarial diameters, swap the propagation body
for the large-star/small-star rounds of Kiveris et al., "Connected
Components in MapReduce and Beyond" (SOCC'14) — same data layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .relational import _read


def connected_components(edges, nodes, src: str, dst: str,
                         max_iters: int = 128, num_partitions: int = 8):
    """Label every node with the smallest node id reachable from it.

    `edges`: Dataset with columns [src, dst]; `nodes`: single-column
    Dataset of node ids (defines the output domain — isolated nodes
    label themselves). Returns a Dataset (node, component)."""
    from ray.data.aggregate import Min

    def init(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(0), "label": b.column(0)})

    labels = (nodes.map_batches(init, batch_format="pyarrow")
              .materialize())

    def fwd(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column(src), "b": b.column(dst)})

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column(dst), "b": b.column(src)})

    # repartition merges away any empty zero-column blocks the edge
    # pipeline produced (see the aggregate note below)
    und = (edges.map_batches(fwd, batch_format="pyarrow")
           .union(edges.map_batches(rev, batch_format="pyarrow"))
           .repartition(num_partitions)
           .materialize())

    def msg(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("b"), "label": b.column("label")})

    prev = labels.sum("label")
    for _ in range(max_iters):
        moved = (und.join(labels, join_type="inner",
                          num_partitions=num_partitions,
                          on=("a",), right_on=("node",))
                 .map_batches(msg, batch_format="pyarrow"))
        # the repartition merges away the aggregate's empty zero-column
        # blocks (map_batches skips empty blocks, so a schema-fix UDF
        # can't); the next join's per-partition pa.Table.join would
        # otherwise fail on a key-less right-side table.
        labels = (labels.union(moved)
                  .groupby("node")
                  .aggregate(Min("label", alias_name="label"))
                  .repartition(num_partitions)
                  .materialize())
        cur = labels.sum("label")
        if cur == prev:
            break
        prev = cur
    else:
        # mirror strongly_connected_components' guard: returning
        # unconverged labels silently splits one true component into
        # several (observed: the sf0.01 entity graph's 1397-node
        # component needs ~30 rounds, and the old max_iters=15 default
        # truncated it into 32 spurious components)
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iters} "
            "rounds — raise max_iters (label propagation needs about "
            "one round per unit of component diameter)")
    return labels


def documents_similarity_components(sf_dir: str, threshold: float = 0.3):
    """Duplicate clusters: connected components over the exact
    n-gram-Jaccard near-dup pairs (threshold 0.3, the oracled pair
    set of documents_ngram_jaccard). Every document gets a component
    id = the smallest doc_id in its cluster; singletons label
    themselves."""
    from .textops import documents_ngram_jaccard

    pairs = documents_ngram_jaccard(sf_dir, threshold=threshold)
    nodes = _read(sf_dir, "documents", ["doc_id"])
    comp = connected_components(pairs, nodes, "doc_a", "doc_b")

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("node"),
                         "component": b.column("label")})

    return (comp.map_batches(rename, batch_format="pyarrow")
            .sort("doc_id"))


def pagerank(edges, nodes, src: str, dst: str, damping: float = 0.85,
             iters: int = 8, num_partitions: int = 8,
             weight: str | None = None):
    """Distributed PageRank (power iteration with dangling-mass
    redistribution), pure Dataset ops.

    Per iteration: one co-partitioned join (static (src, dst, deg)
    edge table ⋈ ranks) emits contrib = r/deg per edge — or
    r·w/W(src) when a `weight` column is given (W = the source's total
    outlink weight; the weighted random surfer) — a groupby(dst).sum
    folds in-neighbor mass; the dangling mass is the scalar
    1 - Σcontrib (rank held by sink nodes), redistributed uniformly.
    Fixed iteration count — ranking applications don't need the
    fixpoint test CC uses. Returns (node, rank) with Σrank = 1."""
    from ray.data.aggregate import Count, Sum

    def e_b(b: pa.Table) -> pa.Table:
        cols = {"src": b.column(src), "dst": b.column(dst)}
        if weight is not None:
            cols["w"] = pc.cast(b.column(weight), pa.float64())
        return pa.table(cols)

    ed = edges.map_batches(e_b, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    if weight is not None:
        deg = (ed.groupby("src").aggregate(Sum("w", alias_name="deg"))
               .repartition(num_partitions))
    else:
        deg = (ed.groupby("src").aggregate(Count(alias_name="deg"))
               .repartition(num_partitions))
    ed = (ed.join(deg, join_type="inner", num_partitions=num_partitions,
                  on=("src",), right_on=("src",))
          .repartition(num_partitions).materialize())

    def n_b(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(0)})

    base = nodes.map_batches(n_b, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    n_nodes = base.count()

    def init_r(b: pa.Table) -> pa.Table:
        r = np.full(len(b), 1.0 / n_nodes)
        return b.append_column("r", pa.array(r))

    ranks = base.map_batches(init_r, batch_format="pyarrow").materialize()

    def contrib_b(b: pa.Table) -> pa.Table:
        if weight is not None:
            # (r*w)/W, left-to-right — mirrored verbatim in the SQL
            # oracle so the float64 op sequence is identical
            c = pc.divide(pc.multiply(b.column("r"), b.column("w")),
                          pc.cast(b.column("deg"), pa.float64()))
        else:
            c = pc.divide(b.column("r"),
                          pc.cast(b.column("deg"), pa.float64()))
        return pa.table({"node": b.column("dst"), "r": c})

    def zero_b(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"),
                         "r": pa.array(np.zeros(len(b)))})

    for _ in range(iters):
        msgs = (ed.join(ranks, join_type="inner",
                        num_partitions=num_partitions,
                        on=("src",), right_on=("node",))
                .map_batches(contrib_b, batch_format="pyarrow")
                .materialize())
        emitted = msgs.sum("r") or 0.0
        dangling = max(0.0, 1.0 - emitted)
        add = (1.0 - damping) / n_nodes + damping * dangling / n_nodes

        def finish_b(b: pa.Table, _add=add) -> pa.Table:
            r = pc.add(pc.multiply(b.column("r"), pa.scalar(damping)),
                       pa.scalar(_add))
            return pa.table({"node": b.column("node"), "r": r})

        ranks = (msgs.union(base.map_batches(zero_b,
                                             batch_format="pyarrow"))
                 .groupby("node")
                 .aggregate(Sum("r", alias_name="r"))
                 .map_batches(finish_b, batch_format="pyarrow")
                 .repartition(num_partitions)
                 .materialize())
    return ranks


def _hashed_entity_edges(adjacency, num_partitions: int = 8):
    """Entity-graph edges from an adjacency Dataset: rows whose object
    is itself an entity, on canonical ids, self-loops dropped. String
    ids are hashed to int64 (polars seed-0 hash) so propagation loops
    shuffle fixed-width ints; returns (hashed edges, hash→iri mapping,
    node hash Dataset)."""
    import polars as pl

    def edge_b(b: pa.Table) -> pa.Table:
        keep = pc.and_(b.column("obj_is_node"),
                       pc.not_equal(b.column("canonical_subj"),
                                    b.column("canonical_obj")))
        t = b.filter(keep)

        def h(col):
            return pl.from_arrow(t.column(col)).hash(seed=0) \
                .reinterpret(signed=True).to_arrow()

        return pa.table({"sh": h("canonical_subj"),
                         "oh": h("canonical_obj"),
                         "s": t.column("canonical_subj"),
                         "o": t.column("canonical_obj")})

    hashed = adjacency.map_batches(edge_b, batch_format="pyarrow") \
        .materialize()

    def side(hcol, icol):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({"h": b.column(hcol), "iri": b.column(icol)})
        return f

    from ray.data.aggregate import Min
    mapping = (hashed.map_batches(side("sh", "s"), batch_format="pyarrow")
               .union(hashed.map_batches(side("oh", "o"),
                                         batch_format="pyarrow"))
               .groupby("h")
               .aggregate(Min("iri", alias_name="iri"))
               .repartition(num_partitions)
               .materialize())

    def nodes_b(b: pa.Table) -> pa.Table:
        return pa.table({"n": b.column("h")})

    nodes = mapping.map_batches(nodes_b, batch_format="pyarrow")
    return hashed, mapping, nodes


def entity_pagerank(adjacency, num_partitions: int = 8,
                    damping: float = 0.85, iters: int = 8):
    """PageRank over the KG entity graph: entity importance by
    interaction in-links. Returns (entity, rank) sorted by rank desc
    then entity (rank rounded to 8 decimals so ties order stably)."""
    hashed, mapping, nodes = _hashed_entity_edges(adjacency,
                                                  num_partitions)
    ranks = pagerank(hashed, nodes, "sh", "oh", damping=damping,
                     iters=iters, num_partitions=num_partitions)
    ent = ranks.join(mapping, join_type="inner",
                     num_partitions=num_partitions,
                     on=("node",), right_on=("h",))

    def final_b(b: pa.Table) -> pa.Table:
        return pa.table({"entity": b.column("iri"),
                         "rank": pc.round(b.column("r"), ndigits=8)})

    return (ent.map_batches(final_b, batch_format="pyarrow")
            .sort(["rank", "entity"], descending=[True, False]))


def entity_components(adjacency, num_partitions: int = 8,
                      max_iters: int = 128):
    """Connected components over the KG entity graph: edges are the
    adjacency rows whose object is itself an entity
    (`obj_is_node`), keyed by the canonical ids the exchange already
    unified. Returns (entity, component) with component = the
    lexicographically smallest member IRI of the cluster — i.e.
    interaction-connected reaction-network clusters per corpus, with a
    hash-free canonical label (DuckDB-oracled since round 4 by an
    undirected reachability closure over the triples checkpoint).

    String ids are hashed to int64 (polars seed-0 hash) for the
    propagation rounds — min/sum over fixed-width ints, no string
    shuffling in the loop. The canonical label costs one extra
    component-sized groupby + co-partitioned join after the fixpoint
    (the label hash's own IRI would be cheaper but hash-order-
    dependent, hence un-oracle-able)."""
    from ray.data.aggregate import Min

    hashed, mapping, nodes = _hashed_entity_edges(adjacency,
                                                  num_partitions)
    comp = connected_components(hashed, nodes, "sh", "oh",
                                max_iters=max_iters,
                                num_partitions=num_partitions)

    ent = comp.join(mapping, join_type="inner",
                    num_partitions=num_partitions,
                    on=("node",), right_on=("h",))

    def ent_b(b: pa.Table) -> pa.Table:
        return pa.table({"label": b.column("label"),
                         "entity": b.column("iri")})

    members = (ent.map_batches(ent_b, batch_format="pyarrow")
               .repartition(num_partitions).materialize())
    reps = (members.groupby("label")
            .aggregate(Min("entity", alias_name="component"))
            .repartition(num_partitions))
    out = members.join(reps, join_type="inner",
                       num_partitions=num_partitions,
                       on=("label",), right_on=("label",))

    def final_b(b: pa.Table) -> pa.Table:
        return pa.table({"entity": b.column("entity"),
                         "component": b.column("component")})

    return (out.map_batches(final_b, batch_format="pyarrow")
            .sort("entity"))


def documents_dedup_survivors(sf_dir: str, threshold: float = 0.3):
    """The near-dup 'keep list': one representative document per
    similarity cluster (its smallest doc_id) with the cluster size —
    what a curation pipeline actually consumes after transitive-closure
    dedup. One tiny groupby over the components output."""
    from ray.data.aggregate import Count

    comp = documents_similarity_components(sf_dir, threshold=threshold)
    return (comp.groupby("component")
            .aggregate(Count(alias_name="n_members"))
            .sort("component"))


# Recursive-CTE transitive closure over the SAME SQL pair set the
# n-gram-Jaccard oracle uses: comp labels propagate along edges until
# the (node, reachable-label) fixpoint, then min per node.
from .textops import SQL_DOCUMENTS_NGRAM_JACCARD as _SQL_PAIRS  # noqa: E402

SQL_DOCUMENTS_SIMILARITY_COMPONENTS = f"""
WITH RECURSIVE pairs AS ({_SQL_PAIRS}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
walk(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, w.comp FROM walk w JOIN edges e ON w.node = e.a
  WHERE w.comp < e.b
)
SELECT node AS doc_id, CAST(min(comp) AS BIGINT) AS component
FROM walk GROUP BY node ORDER BY doc_id
"""

SQL_DOCUMENTS_DEDUP_SURVIVORS = f"""
SELECT component, CAST(count(*) AS BIGINT) AS n_members
FROM ({SQL_DOCUMENTS_SIMILARITY_COMPONENTS}) comp
GROUP BY component ORDER BY component
"""


def documents_dedup_keep_best(sf_dir: str, threshold: float = 0.3,
                              num_partitions: int = 8,
                              num_buckets: int = 32):
    """Quality-aware near-dup representative selection: per similarity
    cluster keep the member with the HIGHEST composite quality score
    (tie → smallest doc_id) — what curation pipelines actually do after
    transitive-closure dedup (keep-best, not keep-first; cf.
    documents_dedup_survivors, the min-id variant). One hash-partitioned
    join (components ⋈ quality on doc_id), then argmax inside
    component-hash buckets — one vectorized pandas groupby per BUCKET,
    never a task per cluster. Returns (component, doc_id, quality_score,
    n_members)."""
    import pandas as pd

    from ..stages.exchange import hash_rows_mod
    from .textops import documents_quality

    comp = documents_similarity_components(sf_dir, threshold=threshold)
    qual = documents_quality(sf_dir).map_batches(
        lambda b: b.select(["doc_id", "quality_score"]),
        batch_format="pyarrow")

    j = (comp.repartition(num_partitions)
         .join(qual.repartition(num_partitions), join_type="inner",
               num_partitions=num_partitions, on=("doc_id",)))

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = hash_rows_mod(b, ["component"], num_buckets)
        return b.append_column("bucket", pa.array(ids, type=pa.int32()))

    def best(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["quality_score", "doc_id"],
                            ascending=[False, True])
        g = df.groupby("component", sort=True)
        out = g.head(1)[["component", "doc_id", "quality_score"]] \
            .set_index("component")
        out["n_members"] = g.size().astype("int64")
        return out.reset_index()

    return (j.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(best, batch_format="pandas")
            .sort("component"))


# concatenated (not .format/f-string): the quality SQL contains literal
# regex braces (\p{L}) that str.format would try to interpolate
from .textops import SQL_DOCUMENTS_QUALITY as _SQL_QUALITY  # noqa: E402

SQL_DOCUMENTS_DEDUP_KEEP_BEST = (
    "WITH comp AS (" + SQL_DOCUMENTS_SIMILARITY_COMPONENTS + "),\n"
    "qual AS (" + _SQL_QUALITY + "),\n"
    """j AS (
  SELECT c.component, c.doc_id, q.quality_score
  FROM comp c JOIN qual q USING (doc_id)
)
SELECT component, doc_id, quality_score, n_members FROM (
  SELECT component, doc_id, quality_score,
         CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
             AS n_members,
         row_number() OVER (PARTITION BY component
                            ORDER BY quality_score DESC, doc_id) AS rn
  FROM j)
WHERE rn = 1 ORDER BY component
""")


def embeddings_semantic_components(sf_dir: str, threshold: float = 0.5):
    """SemDeDup-style semantic duplicate clusters: connected components
    over the exact embedding-cosine near-dup pairs (the oracled pair
    set of embeddings_near_dups_exact). Every vector gets a component
    id = the smallest vec_id in its cluster. Scale path: swap the exact
    pair source for the LSH-bucketed embeddings_near_dups — identical
    downstream graph, sublinear pair generation."""
    from .simops import embeddings_near_dups_exact

    pairs = embeddings_near_dups_exact(sf_dir, threshold=threshold)
    nodes = _read(sf_dir, "embeddings", ["vec_id"])
    comp = connected_components(pairs, nodes, "vec_a", "vec_b")

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"vec_id": b.column("node"),
                         "component": b.column("label")})

    return (comp.map_batches(rename, batch_format="pyarrow")
            .sort("vec_id"))


def embeddings_semantic_survivors(sf_dir: str, threshold: float = 0.5):
    """The semantic keep-list: one representative vector per cosine
    cluster (smallest vec_id) with the cluster size."""
    from ray.data.aggregate import Count

    comp = embeddings_semantic_components(sf_dir, threshold=threshold)
    return (comp.groupby("component")
            .aggregate(Count(alias_name="n_members"))
            .sort("component"))


from .simops import SQL_EMBEDDINGS_NEAR_DUPS_EXACT as _SQL_EPAIRS  # noqa: E402

SQL_EMBEDDINGS_SEMANTIC_COMPONENTS = f"""
WITH RECURSIVE pairs AS ({_SQL_EPAIRS}),
edges AS (
  SELECT vec_a AS a, vec_b AS b FROM pairs
  UNION ALL
  SELECT vec_b, vec_a FROM pairs
),
walk(node, comp) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.b, w.comp FROM walk w JOIN edges e ON w.node = e.a
  WHERE w.comp < e.b
)
SELECT node AS vec_id, CAST(min(comp) AS BIGINT) AS component
FROM walk GROUP BY node ORDER BY vec_id
"""

SQL_EMBEDDINGS_SEMANTIC_SURVIVORS = f"""
SELECT component, CAST(count(*) AS BIGINT) AS n_members
FROM ({SQL_EMBEDDINGS_SEMANTIC_COMPONENTS}) comp
GROUP BY component ORDER BY component
"""


def documents_semantic_keep(sf_dir: str, threshold: float = 0.5,
                            num_partitions: int = 8):
    """The cross-table SemDeDup keep-list: each semantic cluster's
    representative (component id == smallest vec_id == its doc_id in
    this corpus) joined back to the documents table for curation
    metadata. Inner hash join on the dense doc_id key."""
    import ray.data as rd
    import os

    surv = embeddings_semantic_survivors(sf_dir, threshold=threshold)

    def as_doc(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("component"),
                         "n_members": b.column("n_members")})

    meta = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "lang", "source"])
    out = (surv.map_batches(as_doc, batch_format="pyarrow")
           # defensive: merge away any zero-column empty blocks from
           # the upstream aggregate before they feed a join side (the
           # pitfall documented at connected_components)
           .repartition(num_partitions)
           .join(meta, join_type="inner",
                 num_partitions=num_partitions, on=("doc_id",)))
    return (out.map_batches(
        lambda b: b.select(["doc_id", "lang", "source", "n_members"]),
        batch_format="pyarrow")
        .sort("doc_id"))


SQL_DOCUMENTS_SEMANTIC_KEEP = f"""
WITH surv AS ({SQL_EMBEDDINGS_SEMANTIC_SURVIVORS})
SELECT surv.component AS doc_id, d.lang, d.source, surv.n_members
FROM surv JOIN documents d ON d.doc_id = surv.component
ORDER BY doc_id
"""


def entity_degree_hist(adjacency):
    """Out-degree histogram of the KG entity graph: (degree,
    n_entities) — the structural summary that sizes downstream joins
    and flags hub skew (the salting decision input). Per-batch polars
    partial counts make the first exchange carry (subject, partial)
    rows; the second exchange is histogram-sized. Cross-checked against
    DuckDB on identical adjacency rows in tests/test_graph.py."""
    from ray.data.aggregate import Count, Sum

    from ..stages.exchange import polars_capped

    def partial(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        out = (pl.from_arrow(b.select(["canonical_subj"]))
               .group_by("canonical_subj")
               .agg(n=pl.len().cast(pl.Int64)))
        return out.to_arrow().cast(pa.schema([
            ("canonical_subj", pa.string()), ("n", pa.int64())]))

    degrees = (adjacency.map_batches(partial, batch_format="pyarrow")
               .groupby("canonical_subj")
               .aggregate(Sum("n", alias_name="degree")))
    return (degrees.groupby("degree")
            .aggregate(Count(alias_name="n_entities"))
            .sort("degree"))


# -- bucket-pruned graph traversal over the adjacency layout ------------------

def two_hop_from_adjacency(adj_dir: str, seed: str | None = None,
                           hops: int = 2):
    """BFS neighborhood of one entity over the subject-bucketed
    adjacency layout, reading ONLY the buckets that can contain the
    frontier — the point-lookup dividend of the O4 layout: per hop the
    I/O is |frontier| × salt_factor buckets, not the table.

    Bucket probing: the layout sidecar (_layout.json, written by
    adjacency_exchange_spec) fixes num_buckets + salt_factor; a
    subject's rows live at (hash(subj) + s) % N for s ∈ [0,
    salt_factor) (s = 0 when the subject wasn't salted), so probing
    that superset is exact regardless of which subjects were hot at
    write time. Frontier expansion follows obj_is_node edges (the same
    entity-graph rule as entity_components).

    The frontier itself is driver-resident — sound for the seeded
    neighborhood queries this serves (a 2-hop ego net is ≪ the graph);
    an unbounded multi-source BFS belongs to connected_components
    above. Returns (entity, hop) for hop 1..`hops`, seed excluded,
    sorted."""
    import json
    import os

    import ray.data as rd

    from ..stages.exchange import hash_rows_mod

    with open(os.path.join(adj_dir, "_layout.json")) as fh:
        layout = json.load(fh)
    n_buckets = int(layout["num_buckets"])
    salt_factor = int(layout["salt_factor"])

    if seed is None:
        # deterministic default: smallest entity-edged subject in the
        # first non-empty bucket (one file's metadata-cheap read)
        import pyarrow.parquet as pq
        for k in range(n_buckets):
            f = os.path.join(adj_dir, f"subj_bucket={k}", "part-0.parquet")
            if not os.path.exists(f):
                continue
            t = pq.read_table(f, columns=["canonical_subj", "obj_is_node"])
            t = t.filter(t.column("obj_is_node"))
            if t.num_rows:
                seed = pc.min(t.column("canonical_subj")).as_py()
                break
        if seed is None:
            return pa.table({"entity": pa.array([], pa.string()),
                             "hop": pa.array([], pa.int64())})

    seen = {seed}
    frontier = [seed]
    out_entities: list[str] = []
    out_hops: list[int] = []
    for hop in range(1, hops + 1):
        if not frontier:
            break
        ft = pa.table({"canonical_subj": pa.array(sorted(frontier))})
        base = hash_rows_mod(ft, ["canonical_subj"], n_buckets)
        probe = sorted({(int(b) + s) % n_buckets
                        for b in base for s in range(salt_factor)})
        files = [os.path.join(adj_dir, f"subj_bucket={k}", "part-0.parquet")
                 for k in probe]
        files = [f for f in files if os.path.exists(f)]
        if not files:
            break
        fset = pa.array(sorted(frontier))

        def expand(b: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.is_in(b.column("canonical_subj"), value_set=fset),
                pc.and_(b.column("obj_is_node"),
                        pc.not_equal(b.column("canonical_subj"),
                                     b.column("canonical_obj"))))
            t = b.filter(keep)
            return pa.table({"o": pc.unique(t.column("canonical_obj"))})

        import ray as _ray
        nbrs = set()
        ds = (rd.read_parquet(files, columns=["canonical_subj",
                                              "canonical_obj",
                                              "obj_is_node"])
              .map_batches(expand, batch_format="pyarrow"))
        for t in _ray.get(ds.to_arrow_refs()):
            if len(t):
                nbrs.update(t.column("o").to_pylist())
        new = sorted(nbrs - seen)
        out_entities += new
        out_hops += [hop] * len(new)
        seen.update(new)
        frontier = new
    return pa.table({"entity": pa.array(out_entities, pa.string()),
                     "hop": pa.array(out_hops, pa.int64())})


def predicate_counts(adjacency):
    """Per-predicate triple counts over the adjacency rows — the KG's
    relation-type profile (what a schema/ontology report reads first,
    and the skew signal that sizes the PSO index's hot buckets).

    Scale shape: predicate cardinality is tiny (dozens-hundreds) next
    to triples, so each block folds to ≤|preds| partial rows and the
    only exchange is a predicate-sized groupby. DuckDB cross-check on
    identical rows in tests/test_graph.py."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"pred": b.column("pred"),
                      "one": pa.array(np.ones(len(b), dtype=np.int64))})
        return (pa.TableGroupBy(t, "pred").aggregate([("one", "sum")])
                .rename_columns(["pred", "n_triples"]))

    return (adjacency.map_batches(partial, batch_format="pyarrow")
            .groupby("pred")
            .aggregate(Sum("n_triples", alias_name="n_triples"))
            .sort("n_triples", descending=True))


def predicate_edges_from_layout(pso_dir: str, predicate: str | None = None):
    """All (subj, obj) edges of ONE predicate, reading ONLY the
    pred-hash partition the PSO layout sidecar points at — the
    predicate-driven point lookup the secondary index exists for
    (write_predicate_layout). I/O = one bucket ≈ that predicate's edge
    share, never the table. Full-scan equality pinned in
    tests/test_graph.py."""
    import json
    import os

    import ray.data as rd

    from ..stages.exchange import hash_rows_mod

    with open(os.path.join(pso_dir, "_pso_layout.json")) as fh:
        layout = json.load(fh)
    n_buckets = int(layout["num_buckets"])

    if predicate is None:
        # deterministic default: min predicate in the first non-empty
        # bucket (one partition's single-column metadata-cheap read)
        import pyarrow.parquet as pq
        for k in range(n_buckets):
            d = os.path.join(pso_dir, f"pred_bucket={k}")
            if not os.path.isdir(d):
                continue
            parts = [os.path.join(d, n) for n in sorted(os.listdir(d))
                     if n.endswith(".parquet")]
            cols = [pq.read_table(f, columns=["pred"]) for f in parts]
            t = pa.concat_tables(cols) if cols else None
            if t is not None and t.num_rows:
                predicate = pc.min(t.column("pred")).as_py()
                break
        if predicate is None:
            return rd.from_arrow(pa.table(
                {"canonical_subj": pa.array([], pa.string()),
                 "pred": pa.array([], pa.string()),
                 "canonical_obj": pa.array([], pa.string())}))

    probe = int(hash_rows_mod(
        pa.table({"pred": pa.array([predicate])}), ["pred"], n_buckets)[0])
    d = os.path.join(pso_dir, f"pred_bucket={probe}")
    files = [os.path.join(d, n) for n in sorted(os.listdir(d))
             if n.endswith(".parquet")] if os.path.isdir(d) else []
    if not files:
        return rd.from_arrow(pa.table(
            {"canonical_subj": pa.array([], pa.string()),
             "pred": pa.array([], pa.string()),
             "canonical_obj": pa.array([], pa.string())}))
    want = pa.scalar(predicate)
    return (rd.read_parquet(files, columns=["canonical_subj", "pred",
                                            "canonical_obj"])
            .map_batches(lambda b: b.filter(
                pc.equal(b.column("pred"), want)),
                batch_format="pyarrow")
            .sort(["canonical_subj", "canonical_obj"]))


# -- triangle counting (kNN-graph cohesion) -------------------------------------

def embeddings_knn_triangles(sf_dir: str, k: int = 3,
                             num_buckets: int = 32):
    """Count triangles in the undirected exact-kNN graph — the local
    clustering signal a corpus-graph audit reads (near-dup clusters and
    topic clumps close triangles; random corpora don't).

    Scale shape (node-iterator with DEGREE-ORDERED orientation —
    Chiba-Nishizeki / Latapy): the oracled kNN edge list
    (lexical.embeddings_knn_graph — reused verbatim so the edge set is
    cross-engine-exact) is undirected and deduped by one (a, b)
    groupby; each edge is then oriented from its (degree, id)-smaller
    endpoint toward the larger, so every triangle generates its wedge
    exactly once at its order-minimum vertex and per-node wedge
    fan-out is bounded by out-degree² with Σ out-deg² = O(m^1.5) —
    hub-safe (a raw smallest-ID rule would give a popular vector an
    undirected adjacency of O(N) and a quadratic wedge blow-up in one
    task, since kNN IN-degree is unbounded). Wedges and edges
    co-locate via ONE hash-bucket exchange; each bucket counts
    wedge∩edge vectorized (polars semi-join). The degree map rides the
    same broadcast regime as the op's own exact-kNN baseline (one
    int per node); at index-backed candidate-generation scale it
    becomes a co-partitioned degree join. Output: (n_triangles)."""
    # materialize (inside the helper): the edge table (≤ N·k rows —
    # tiny relative to the corpus) feeds the degree count, the wedge
    # build AND the membership probe; without it the brute-force kNN
    # scan would execute three times
    edges = _knn_undirected_edges(sf_dir, k)
    n_tri, _ = _triangle_census(edges, num_buckets)
    return pa.table({"n_triangles": pa.array([n_tri], pa.int64())})


def _knn_undirected_edges(sf_dir: str, k: int = 3):
    """Materialized deduped undirected edge set of the exact-kNN graph
    (shared by the triangle count and the transitivity op)."""
    from ray.data.aggregate import Count

    from .lexical import embeddings_knn_graph

    def undirect(b: pa.Table) -> pa.Table:
        u = b.column("vec_id").to_numpy(zero_copy_only=False)
        v = b.column("neighbor_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array(np.minimum(u, v).astype(np.int64)),
            "b": pa.array(np.maximum(u, v).astype(np.int64))})

    return (embeddings_knn_graph(sf_dir, k=k)
            .map_batches(undirect, batch_format="pyarrow")
            .groupby(["a", "b"]).aggregate(Count(alias_name="_n"))
            .drop_columns(["_n"])
            .materialize())


def embeddings_knn_transitivity(sf_dir: str, k: int = 3,
                                num_buckets: int = 32):
    """Global clustering coefficient (transitivity) of the exact-kNN
    graph: C = 3·triangles / wedges, wedges = Σ_v deg(v)·(deg(v)-1)/2 —
    the one-number clumping audit of a corpus similarity graph (topic
    clusters and near-dup families push C up; a random geometric kNN
    graph sits low). Triangles reuse _triangle_census (degree-ordered
    wedge probe); the wedge total folds from the census's own degree
    table — driver-side over the NODE-sized degree list, never edges.
    DuckDB-oracled end to end (count + ratio)."""
    edges = _knn_undirected_edges(sf_dir, k)
    n_tri, deg_df = _triangle_census(edges, num_buckets)
    d = deg_df["deg"].to_numpy().astype(np.int64)
    n_wed = int((d * (d - 1) // 2).sum())
    trans = (3.0 * n_tri / n_wed) if n_wed else 0.0
    return pa.table({
        "n_triangles": pa.array([n_tri], pa.int64()),
        "n_wedges": pa.array([n_wed], pa.int64()),
        "transitivity": pa.array([float(np.round(trans, 6) + 0.0)])})


SQL_EMBEDDINGS_KNN_TRANSITIVITY = """
WITH sims AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM sims),
knn AS (SELECT vec_id, neighbor_id FROM ranked WHERE rank <= 3),
e AS (
  SELECT DISTINCT least(vec_id, neighbor_id) AS a,
         greatest(vec_id, neighbor_id) AS b
  FROM knn),
tri AS (
  SELECT count(*) AS n_tri
  FROM e ab JOIN e bc ON bc.a = ab.b
            JOIN e ac ON ac.a = ab.a AND ac.b = bc.b),
deg AS (
  SELECT node, count(*) AS d
  FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
  GROUP BY node),
w AS (SELECT sum(d * (d - 1) // 2) AS n_wed FROM deg)
SELECT CAST(tri.n_tri AS BIGINT) AS n_triangles,
       CAST(w.n_wed AS BIGINT) AS n_wedges,
       round(3.0 * tri.n_tri / w.n_wed, 6) + 0 AS transitivity
FROM tri CROSS JOIN w
"""


def _triangle_census(edges, num_buckets: int = 32):
    """Shared triangle-count core over a MATERIALIZED undirected deduped
    (a, b) edge Dataset: degree-ordered orientation, in-group wedge
    generation, one hash-bucket wedge∩edge probe (see
    embeddings_knn_triangles for the full scale argument). Returns
    (n_triangles, degree DataFrame) — the degree table is a by-product
    every census consumer (transitivity, degeneracy audits) also needs."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Count

    from ..stages.exchange import hash_rows_mod, polars_capped

    def ends(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            b.column("a").combine_chunks(),
            b.column("b").combine_chunks()])})

    deg_df = (edges.map_batches(ends, batch_format="pyarrow")
              .groupby("node").aggregate(Count(alias_name="deg"))
              .to_pandas())
    deg_nodes = deg_df["node"].to_numpy()
    order = np.argsort(deg_nodes)
    deg_ref = ray.put((deg_nodes[order],
                       deg_df["deg"].to_numpy()[order].astype(np.int64)))

    def orient(b: pa.Table) -> pa.Table:
        import ray as _ray
        nodes, degs = _ray.get(deg_ref)
        a = b.column("a").to_numpy(zero_copy_only=False)
        c = b.column("b").to_numpy(zero_copy_only=False)
        da = degs[np.searchsorted(nodes, a)]
        db = degs[np.searchsorted(nodes, c)]
        # orient low→high under the (degree, id) total order
        a_first = (da < db) | ((da == db) & (a < c))
        return pa.table({
            "src": pa.array(np.where(a_first, a, c).astype(np.int64)),
            "dst": pa.array(np.where(a_first, c, a).astype(np.int64))})

    def wedges(df: "pd.DataFrame") -> "pd.DataFrame":
        # out-neighbors of the group's source; every pair is a wedge
        # whose closing edge is probed in canonical (min, max) form
        nb = df["dst"].to_numpy()
        iy, iz = np.triu_indices(len(nb), k=1)
        y, z = nb[iy], nb[iz]
        return pd.DataFrame({
            "a": np.minimum(y, z).astype("int64"),
            "b": np.maximum(y, z).astype("int64")})

    wedge_ds = (edges.map_batches(orient, batch_format="pyarrow")
                .groupby("src")
                .map_groups(wedges, batch_format="pandas"))

    def tag(src: int):
        def fn(b: pa.Table) -> pa.Table:
            b = b.select(["a", "b"]).append_column(
                "src", pa.array(np.full(b.num_rows, src, dtype=np.int8)))
            return b.append_column(
                "bucket", pa.array(hash_rows_mod(b, ["a", "b"],
                                                 num_buckets)))
        return fn

    def count_hits(g: pa.Table) -> pa.Table:
        pl = polars_capped()
        f = pl.from_arrow(g.select(["a", "b", "src"]))
        e = f.filter(pl.col("src") == 0).select("a", "b").unique()
        w = f.filter(pl.col("src") == 1).select("a", "b")
        n = w.join(e, on=["a", "b"], how="semi").height
        return pa.table({"part": pa.array([n], pa.int64())})

    parts = (edges.map_batches(tag(0), batch_format="pyarrow")
             .union(wedge_ds.map_batches(tag(1), batch_format="pyarrow"))
             .groupby("bucket")
             .map_groups(count_hits, batch_format="pyarrow")
             .to_pandas())
    return int(parts["part"].sum()), deg_df


SQL_EMBEDDINGS_KNN_TRIANGLES = """
WITH sims AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM sims),
knn AS (SELECT vec_id, neighbor_id FROM ranked WHERE rank <= 3),
e AS (
  SELECT DISTINCT least(vec_id, neighbor_id) AS a,
         greatest(vec_id, neighbor_id) AS b
  FROM knn)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e ab JOIN e bc ON bc.a = ab.b
          JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
"""


# -- label-propagation communities --------------------------------------------

def label_propagation(edges, nodes, src: str, dst: str, iters: int = 4,
                      num_partitions: int = 8, num_buckets: int = 32):
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over an int64-id edge Dataset: per round every node
    adopts the most frequent label among its neighbours PLUS one
    self-vote for its current label (the self-vote damps the
    two-colour oscillation synchronous LPA is prone to); ties break to
    the smallest label, so the whole procedure is deterministic at a
    fixed iteration count.

    Per round: one co-partitioned hash join (undirected edges ⋈
    labels) emits neighbour votes, then ONE bucketed groupby runs the
    vectorized count/argmax per node-hash bucket — a pandas groupby
    per BUCKET, never a task per node (same shape as
    documents_dedup_keep_best). Unlike connected components, labels do
    not spread past direct vote majorities, so dense subgraphs keep
    distinct labels instead of collapsing into one reachability class.

    Returns a Dataset (node, label); community id = the label's node id."""
    import pandas as pd

    from ..stages.exchange import hash_rows_mod

    def init(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(0), "label": b.column(0)})

    labels = nodes.map_batches(init, batch_format="pyarrow").materialize()

    def fwd(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column(src), "b": b.column(dst)})

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column(dst), "b": b.column(src)})

    und = (edges.map_batches(fwd, batch_format="pyarrow")
           .union(edges.map_batches(rev, batch_format="pyarrow"))
           .repartition(num_partitions)
           .materialize())

    def msg(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("b"), "label": b.column("label")})

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = hash_rows_mod(b, ["node"], num_buckets)
        return b.append_column("bucket", pa.array(ids, type=pa.int32()))

    def vote(df: "pd.DataFrame") -> "pd.DataFrame":
        c = (df.groupby(["node", "label"], sort=False)
             .size().reset_index(name="votes"))
        c = c.sort_values(["node", "votes", "label"],
                          ascending=[True, False, True], kind="mergesort")
        return c.groupby("node", sort=False).head(1)[["node", "label"]]

    for _ in range(iters):
        moved = (und.join(labels, join_type="inner",
                          num_partitions=num_partitions,
                          on=("a",), right_on=("node",))
                 .map_batches(msg, batch_format="pyarrow"))
        labels = (labels.union(moved)          # self-vote + neighbour votes
                  .map_batches(add_bucket, batch_format="pyarrow")
                  .groupby("bucket")
                  .map_groups(vote, batch_format="pandas")
                  .repartition(num_partitions)
                  .materialize())
    return labels


def entity_communities(adjacency, num_partitions: int = 8,
                       iters: int = 4):
    """Community detection over the KG entity graph: label-propagation
    clusters of densely-interacting entities (finer than
    entity_components' reachability classes — a bridge edge between two
    dense groups does NOT merge them). Returns (entity, community)
    where community is the representative entity's IRI."""
    hashed, mapping, nodes = _hashed_entity_edges(adjacency,
                                                  num_partitions)
    lab = label_propagation(hashed, nodes, "sh", "oh", iters=iters,
                            num_partitions=num_partitions)

    ent = lab.join(mapping, join_type="inner",
                   num_partitions=num_partitions,
                   on=("node",), right_on=("h",))

    def ent_b(b: pa.Table) -> pa.Table:
        return pa.table({"label": b.column("label"),
                         "entity": b.column("iri")})

    rep = ent.map_batches(ent_b, batch_format="pyarrow") \
        .repartition(num_partitions) \
        .join(mapping, join_type="inner", num_partitions=num_partitions,
              on=("label",), right_on=("h",))

    def final_b(b: pa.Table) -> pa.Table:
        return pa.table({"entity": b.column("entity"),
                         "community": b.column("iri")})

    return (rep.map_batches(final_b, batch_format="pyarrow")
            .sort("entity"))


# -- k-core decomposition (coreness) -------------------------------------------

def coreness(edges, nodes, src: str, dst: str, max_iters: int = 128,
             num_partitions: int = 8, num_buckets: int = 32):
    """Core number of every node — the largest k such that the node
    survives in the k-core (the maximal subgraph of minimum degree k).
    The standard density-peeling signal for graph cleanup: coreness 1 =
    tree fringe, high coreness = dense interaction kernels.

    Algorithm: the distributed h-index fixpoint (Lü et al., "The
    H-index of a network node and its relation to degree and coreness",
    Nat. Commun. 2016) — init every node at its degree, then repeatedly
    set v(u) ← min(v(u), H{v(w) : w∼u}); the sequence is monotone
    non-increasing and its fixpoint is exactly the coreness. No
    sequential peeling order is needed, so every round is pure Dataset
    ops: one co-partitioned edges⋈values hash join emits neighbour
    values, one bucketed groupby computes the vectorized h-index per
    node-hash BUCKET (a pandas groupby per bucket, never a task per
    node), and a left join folds min(old, h) so message-less (isolated)
    nodes keep value 0. Convergence = integer value-sum fixpoint
    (values only decrease, so an unchanged sum ⟺ no node moved).

    Returns a Dataset (node, core) with core int64."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    from ..stages.exchange import hash_rows_mod

    def fwd(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column(src), "b": b.column(dst)})

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column(dst), "b": b.column(src)})

    und = (edges.map_batches(fwd, batch_format="pyarrow")
           .union(edges.map_batches(rev, batch_format="pyarrow"))
           .repartition(num_partitions)
           .materialize())

    # repartition merges away the aggregate's empty zero-column blocks,
    # which break Dataset.join (same pitfall as joins.py rich_churned)
    deg = (und.map_batches(
        lambda b: pa.table({"dn": b.column("a")}),
        batch_format="pyarrow")
        .groupby("dn").aggregate(Count(alias_name="core"))
        .repartition(num_partitions))
    vals = (nodes.map_batches(
        lambda b: pa.table({"node": b.column(0)}), batch_format="pyarrow")
        .join(deg, join_type="left_outer", num_partitions=num_partitions,
              on=("node",), right_on=("dn",))
        .map_batches(lambda b: pa.table({
            "node": b.column("node"),
            "core": pc.fill_null(b.column("core"), 0).cast(pa.int64())}),
            batch_format="pyarrow")
        .materialize())

    def msg(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("b"), "nv": b.column("core")})

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = hash_rows_mod(b, ["node"], num_buckets)
        return b.append_column("bucket", pa.array(ids, type=pa.int32()))

    def h_index(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["node", "nv"], ascending=[True, False],
                            kind="mergesort")
        rank = df.groupby("node", sort=False).cumcount() + 1
        ok = (df["nv"].to_numpy() >= rank.to_numpy()).astype(np.int64)
        h = pd.DataFrame({"hn": df["node"].to_numpy(), "ok": ok}) \
            .groupby("hn", sort=False)["ok"].sum().reset_index(name="h")
        return h

    prev_sum = None
    for _ in range(max_iters):
        msgs = (und.join(vals, join_type="inner",
                         num_partitions=num_partitions,
                         on=("a",), right_on=("node",))
                .map_batches(msg, batch_format="pyarrow"))
        hvals = (msgs.map_batches(add_bucket, batch_format="pyarrow")
                 .groupby("bucket")
                 .map_groups(h_index, batch_format="pandas")
                 .repartition(num_partitions))
        vals = (vals.join(hvals, join_type="left_outer",
                          num_partitions=num_partitions,
                          on=("node",), right_on=("hn",))
                .map_batches(lambda b: pa.table({
                    "node": b.column("node"),
                    "core": pc.min_element_wise(
                        b.column("core"),
                        pc.fill_null(b.column("h"),
                                     0).cast(pa.int64()))}),
                    batch_format="pyarrow")
                .materialize())
        cur = int(vals.aggregate(Sum("core"))["sum(core)"] or 0)
        if cur == prev_sum:
            break
        prev_sum = cur
    else:
        # same guard as connected_components: unconverged h-index
        # values are NOT coreness — fail loudly instead
        raise RuntimeError(
            f"coreness: no fixpoint after {max_iters} rounds — "
            "raise max_iters")
    return vals


def entity_kcore(adjacency, num_partitions: int = 8):
    """Coreness of every KG entity over the deduped interaction graph:
    which entities sit in dense interaction kernels vs the tree fringe.
    Returns (entity, core) sorted core desc then entity."""
    hashed, mapping, nodes = _hashed_entity_edges(adjacency,
                                                  num_partitions)
    cores = coreness(hashed, nodes, "sh", "oh",
                     num_partitions=num_partitions)
    ent = cores.join(mapping, join_type="inner",
                     num_partitions=num_partitions,
                     on=("node",), right_on=("h",))

    def final_b(b: pa.Table) -> pa.Table:
        return pa.table({"entity": b.column("iri"),
                         "core": b.column("core")})

    return (ent.map_batches(final_b, batch_format="pyarrow")
            .sort(["core", "entity"], descending=[True, False]))


# -- star join over the PSO layout ---------------------------------------------

def star_join_from_layout(pso_dir: str,
                          predicates=("hasXref", "isPartOf")):
    """Subjects that carry ALL the given predicates — the SPARQL
    star-pattern `?s p1 ?o1 . ?s p2 ?o2 . …` answered from the PSO
    secondary index: each predicate's edges come from ONE pred-hash
    bucket (predicate_edges_from_layout's point-lookup I/O), are folded
    to (subj, n_objs) per predicate, and the star closes with a single
    subject-key groupby that keeps subjects present in every arm
    (count == #predicates). I/O is Σ predicate shares, never the
    triple table; the exchange carries one row per (subj, predicate).

    Returns (canonical_subj, n_edges) — n_edges = total objects across
    the star's arms — sorted by subject."""
    from ray.data.aggregate import Count, Sum

    arms = []
    for p in predicates:
        edges = predicate_edges_from_layout(pso_dir, p)

        def fold(b: pa.Table) -> pa.Table:
            t = pa.table({"canonical_subj": b.column("canonical_subj")})
            return (t.group_by(["canonical_subj"])
                    .aggregate([([], "count_all")])
                    .rename_columns(["canonical_subj", "n"]))

        arms.append(edges.map_batches(fold, batch_format="pyarrow")
                    .groupby("canonical_subj")
                    .aggregate(Sum("n", alias_name="n"))
                    .repartition(4))
    star = arms[0]
    for a in arms[1:]:
        star = star.union(a)
    out = (star.groupby("canonical_subj")
           .aggregate(Count(alias_name="n_arms"),
                      Sum("n", alias_name="n_edges")))

    k = len(predicates)

    def close(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("n_arms"), pa.scalar(k)))
        return pa.table({"canonical_subj": b.column("canonical_subj"),
                         "n_edges": b.column("n_edges").cast(pa.int64())})

    return (out.map_batches(close, batch_format="pyarrow")
            .sort("canonical_subj"))


# -- strongly connected components (directed) ---------------------------------

def strongly_connected_components(edges, nodes, src: str, dst: str,
                                  max_outer: int = 30,
                                  max_inner: int = 30,
                                  num_partitions: int = 4):
    """Strongly connected components of a DIRECTED graph — the
    cycle-detection companion of `connected_components` (which ignores
    direction): mutual-link cores of a web host graph, circular
    redirect/citation rings, strongly-cyclic KG predicate clusters.

    Algorithm (trim + forward/backward min-label — the MultiStep shape
    of Slota/Rajamanickam/Madduri IPDPS'14, with min-label coloring in
    place of pivot BFS): per outer round over the still-active
    subgraph,

    1. TRIM — a node with no active in-edge or no active out-edge can
       sit on no cycle, so it is a singleton SCC: classified at once
       (two distinct-endpoint sets + semi/anti joins). This eats the
       DAG fringe that pure label peeling handles slowly.
    2. Directed min-label fixpoints both ways: F(v) = min node id that
       REACHES v (labels flow src→dst), B(v) = min node id v reaches
       (flow dst→src) — each is exactly the `connected_components`
       round body without the reversed-edge union, with an EXACT
       changed-row convergence check (node-key join, works for any
       orderable label type incl. host strings — the int-sum trick
       doesn't).
    3. Classify: F(v) == B(v) == m ⟺ m→v and v→m, so
       {v : F(v) = B(v) = m} is the ENTIRE SCC of m. Emit those, peel
       them and their edges (semi-joins), repeat. Each weakly-connected
       region's minimum node always classifies, so every round makes
       progress and the loop terminates.

    Every step is a co-partitioned hash join or groupby-min on the same
    node key; nothing dataset-sized gathers on the driver. Known
    adversary: a long CHAIN of SCCs peels O(chain) rounds — real
    web/KG graphs are shallow (one giant mutual core + DAG fringe,
    which TRIM eats); for adversarial diameters swap step 2 for FW-BW
    pivot BFS on the same layout. Returns (node, scc), scc = min node
    id of the component; isolated nodes are their own SCC."""
    from ray.data.aggregate import Count, Min

    def _nodes_init(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(0)})

    def _edges_init(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column(src), "b": b.column(dst)})

    def _self_scc(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"),
                         "scc": b.column("node")})

    active = (nodes.map_batches(_nodes_init, batch_format="pyarrow")
              .repartition(num_partitions).materialize())
    e = (edges.map_batches(_edges_init, batch_format="pyarrow")
         .repartition(num_partitions).materialize())
    done = []                       # materialized (node, scc) fragments

    def _distinct(ds, col):
        def proj(b: pa.Table) -> pa.Table:
            return (pa.table({"node": b.column(col)})
                    .group_by(["node"]).aggregate([]))
        # repartition+materialize merges away the aggregate's empty
        # zero-column blocks, which would break the per-partition
        # pa.Table.join downstream (same hazard as connected_components)
        return (ds.map_batches(proj, batch_format="pyarrow")
                .groupby("node").aggregate(Count(alias_name="_n"))
                .repartition(num_partitions).materialize())

    def _semi(left, right, key):
        return (left.join(right, join_type="left_semi",
                          num_partitions=num_partitions,
                          on=(key,), right_on=("node",))
                .repartition(num_partitions).materialize())

    def _restrict_edges(e, active):
        return _semi(_semi(e, active, "a"), active, "b")

    def _changed(new, old, col):
        """Exact count of moved labels (co-partitioned node-key join)."""
        def ren(b: pa.Table) -> pa.Table:
            return pa.table({"_node": b.column("node"),
                             "_old": b.column(col)})

        def diff(b: pa.Table) -> pa.Table:
            n = pc.sum(pc.invert(pc.equal(
                b.column(col), b.column("_old")))).as_py() or 0
            return pa.table({"n": pa.array([n], type=pa.int64())})

        return (new.join(old.map_batches(ren, batch_format="pyarrow"),
                         join_type="inner",
                         num_partitions=num_partitions,
                         on=("node",), right_on=("_node",))
                .map_batches(diff, batch_format="pyarrow")
                .sum("n"))

    for _ in range(max_outer):
        n_active = active.count()
        if n_active == 0:
            break

        # ---- 1. TRIM --------------------------------------------------
        if e.count() == 0:
            done.append(active.map_batches(
                _self_scc, batch_format="pyarrow").materialize())
            break
        both = _semi(_distinct(e, "a"), _distinct(e, "b"), "node")
        if both.count() == 0:
            # no node has both an in- and an out-edge → the active
            # subgraph is cycle-free: every node is a singleton SCC
            # (also dodges joining against an empty schema-less side)
            done.append(active.map_batches(
                _self_scc, batch_format="pyarrow").materialize())
            break
        trimmed = (active.join(both, join_type="left_anti",
                               num_partitions=num_partitions,
                               on=("node",), right_on=("node",))
                   .map_batches(_self_scc, batch_format="pyarrow")
                   .repartition(num_partitions).materialize())
        if trimmed.count() > 0:
            done.append(trimmed)
            active = _semi(active, both, "node")
            if active.count() == 0:
                break
            e = _restrict_edges(e, active)
            if e.count() == 0:
                continue            # next round trims the remainder

        # ---- 2. F / B min-label fixpoints -----------------------------
        fixed = {}
        for col, flow_from, flow_to in (("f", "a", "b"),
                                        ("b_", "b", "a")):
            lab = active.map_batches(
                lambda b, c=col: pa.table({"node": b.column("node"),
                                           c: b.column("node")}),
                batch_format="pyarrow").materialize()
            # Min-label propagation converges in <= n_active rounds
            # (label path length is bounded by the node count), so
            # sizing the inner bound to the live subgraph makes silent
            # truncation impossible: classifying from UNconverged
            # labels splits one SCC into many with no error signal
            # (a 40-node cycle once came back as 19 "components").
            inner_bound = max(max_inner, n_active)
            moved = 0
            for _i in range(inner_bound):
                msgs = (e.join(lab, join_type="inner",
                               num_partitions=num_partitions,
                               on=(flow_from,), right_on=("node",))
                        .map_batches(
                            lambda b, c=col, t=flow_to: pa.table(
                                {"node": b.column(t),
                                 c: b.column(c)}),
                            batch_format="pyarrow"))
                new = (lab.union(msgs).groupby("node")
                       .aggregate(Min(col, alias_name=col))
                       .repartition(num_partitions).materialize())
                moved = _changed(new, lab, col)
                lab = new
                if not moved:
                    break
            if moved:
                # mirrors the max_outer guard below: NEVER classify
                # from unconverged labels
                raise RuntimeError(
                    f"strongly_connected_components: {col} min-label "
                    f"fixpoint did not converge in {inner_bound} rounds "
                    f"over {n_active} active nodes")
            fixed[col] = lab

        # ---- 3. classify F == B ---------------------------------------
        fb = (fixed["f"].join(fixed["b_"], join_type="inner",
                              num_partitions=num_partitions,
                              on=("node",), right_on=("node",))
              .repartition(num_partitions).materialize())

        def classified(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b.column("f"), b.column("b_")))
            return pa.table({"node": t.column("node"),
                             "scc": t.column("f")})

        def unclassified(b: pa.Table) -> pa.Table:
            t = b.filter(pc.invert(pc.equal(b.column("f"),
                                            b.column("b_"))))
            return pa.table({"node": t.column("node")})

        done.append(fb.map_batches(classified,
                                   batch_format="pyarrow").materialize())
        active = (fb.map_batches(unclassified, batch_format="pyarrow")
                  .repartition(num_partitions).materialize())
        if active.count() == 0:
            break
        e = _restrict_edges(e, active)
    else:
        raise RuntimeError(
            "strongly_connected_components: did not converge within "
            f"max_outer={max_outer} rounds (chain-of-SCCs adversary? "
            "raise max_outer or swap step 2 for pivot BFS)")

    if not done:                    # empty node domain
        return active.map_batches(_self_scc, batch_format="pyarrow")
    out = done[0]
    for d in done[1:]:
        out = out.union(d)
    return out


def condensation_levels(edges, nodes, src: str, dst: str,
                        max_levels: int = 64, num_partitions: int = 4):
    """Topological depth of every node's SCC in the condensation DAG —
    collapse each strongly connected component to one super-node (the
    condensation is always acyclic), then level(C) = length of the
    longest path from any source component to C. The classic web-graph
    stratification (how "deep" into the crawl frontier a mirror
    cluster sits) and the scheduling depth of a cyclic dependency
    graph after cycle collapse.

    Plan: reuse strongly_connected_components for (node, scc); two
    scc-keyed joins rewrite each edge to (scc_a, scc_b), self-loops
    drop and duplicates collapse (per-block distinct + groupby — the
    condensed edge set is ≤ the original, usually ≪). Levels then run
    the longest-path fixpoint: per round one co-partitioned join ships
    level(s)+1 along condensed edges and a groupby-max folds, exactly
    the CC round body with Max for Min; levels only grow and are
    bounded by the DAG depth, so the integer-sum fixpoint check is
    exact. Returns (node, scc, level); source/isolated components are
    level 0."""
    from ray.data.aggregate import Count, Max

    scc = strongly_connected_components(
        edges, nodes, src, dst,
        num_partitions=num_partitions).materialize()
    if scc.count() == 0:            # empty node domain
        return scc.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "scc": b.column("scc"),
                                "level": pa.array([], pa.int64())}),
            batch_format="pyarrow")

    def eproj(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column(src), "b": b.column(dst)})

    e = (edges.map_batches(eproj, batch_format="pyarrow")
         .repartition(num_partitions).materialize())

    def scc_as(node_col, scc_col):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({node_col: b.column("node"),
                             scc_col: b.column("scc")})
        return scc.map_batches(f, batch_format="pyarrow") \
            .repartition(num_partitions).materialize()

    ce = (e.join(scc_as("_a", "scc_a"), join_type="inner",
                 num_partitions=num_partitions,
                 on=("a",), right_on=("_a",))
          # merge away the first join's zero-column empty partitions
          # before the second join reads them as a schema-less side
          # (same pitfall as connected_components' post-aggregate
          # repartition; surfaced by small planted graphs where a
          # hash partition goes empty)
          .repartition(num_partitions)
          .join(scc_as("_b", "scc_b"), join_type="inner",
                num_partitions=num_partitions,
                on=("b",), right_on=("_b",))
          .map_batches(lambda b: (
              pa.table({"scc_a": b.column("scc_a"),
                        "scc_b": b.column("scc_b")})
              .filter(pc.invert(pc.equal(b.column("scc_a"),
                                         b.column("scc_b"))))
              .group_by(["scc_a", "scc_b"]).aggregate([])),
              batch_format="pyarrow")
          .repartition(num_partitions).materialize())

    comps = (scc.map_batches(
        lambda b: pa.table({"c": b.column("scc")})
        .group_by(["c"]).aggregate([]), batch_format="pyarrow")
        .groupby("c").aggregate(Count(alias_name="_n"))
        .map_batches(lambda b: pa.table(
            {"c": b.column("c"),
             "level": pa.array(np.zeros(len(b), dtype=np.int64))}),
            batch_format="pyarrow")
        .repartition(num_partitions).materialize())

    levels = comps
    prev = levels.sum("level")
    if ce.count() > 0:
        for _ in range(max_levels):
            msgs = (ce.join(levels, join_type="inner",
                            num_partitions=num_partitions,
                            on=("scc_a",), right_on=("c",))
                    .map_batches(lambda b: pa.table(
                        {"c": b.column("scc_b"),
                         "level": pc.add(b.column("level"),
                                         pa.scalar(1, pa.int64()))}),
                        batch_format="pyarrow"))
            levels = (levels.union(msgs).groupby("c")
                      .aggregate(Max("level", alias_name="level"))
                      .repartition(num_partitions).materialize())
            cur = levels.sum("level")
            if cur == prev:
                break
            prev = cur
        else:
            raise RuntimeError(
                "condensation_levels: depth exceeds max_levels "
                f"({max_levels}) — not a finite-depth DAG?")

    out = scc.join(levels, join_type="inner",
                   num_partitions=num_partitions,
                   on=("scc",), right_on=("c",))
    return out.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "scc": b.column("scc"),
                            "level": b.column("level")}),
        batch_format="pyarrow")


def optional_join_from_layout(pso_dir: str, required: str = "hasXref",
                              optional: str = "isPartOf"):
    """SPARQL OPTIONAL answered from the PSO secondary index:
    `?s <required> ?o . OPTIONAL { ?s <optional> ?o2 }` — every subject
    carrying the required predicate, with its optional-predicate edge
    count attached LEFT-JOIN style (0 when the optional pattern has no
    match; the star join's mandatory-arms dual). Same I/O shape as
    star_join_from_layout: each predicate reads ONE pred-hash bucket,
    folds to (subj, count) per arm, and the left join closes in a
    single subject-key groupby — the required arm tags n_req, the
    optional arm n_opt, and subjects missing the required tag drop.

    Returns (canonical_subj, n_required, n_optional) sorted by
    subject."""
    from ray.data.aggregate import Sum

    def arm(pred, col):
        edges = predicate_edges_from_layout(pso_dir, pred)

        def fold(b: pa.Table) -> pa.Table:
            t = pa.table({"canonical_subj": b.column("canonical_subj")})
            g = (t.group_by(["canonical_subj"])
                 .aggregate([([], "count_all")]))
            g = g.rename_columns(["canonical_subj", col])
            other = "n_optional" if col == "n_required" else "n_required"
            return g.append_column(
                other, pa.array(np.zeros(len(g), dtype=np.int64)))

        return edges.map_batches(fold, batch_format="pyarrow")

    both = (arm(required, "n_required").union(arm(optional, "n_optional"))
            .groupby("canonical_subj")
            .aggregate(Sum("n_required", alias_name="n_required"),
                       Sum("n_optional", alias_name="n_optional")))

    def close(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("n_required"), pa.scalar(0)))
        return pa.table({
            "canonical_subj": b.column("canonical_subj"),
            "n_required": b.column("n_required").cast(pa.int64()),
            "n_optional": b.column("n_optional").cast(pa.int64())})

    return (both.map_batches(close, batch_format="pyarrow")
            .sort("canonical_subj"))



def personalized_pagerank(edges, nodes, src: str, dst: str, seeds,
                          damping: float = 0.85, iters: int = 8,
                          num_partitions: int = 8):
    """Personalized PageRank: the random walk restarts at the SEED set
    instead of uniformly — the standard related-entity / local-ranking
    primitive (Jeh & Widom WWW'03 rooted PageRank; what "similar
    hosts to X" and seed-expanded entity salience run on). Identical
    per-round dataflow to `pagerank` (one co-partitioned join + one
    groupby-sum; dangling mass also returns to the seeds), only the
    teleport vector changes: (1-d+d·dangling) lands entirely on
    `seeds`, uniformly across them. Σrank stays 1; non-seed nodes
    reachable only via the seeds' out-links get mass ∝ walk length."""
    from ray.data.aggregate import Count, Sum

    seeds = sorted(set(seeds))

    def e_b(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column(src), "dst": b.column(dst)})

    ed = edges.map_batches(e_b, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    deg = (ed.groupby("src").aggregate(Count(alias_name="deg"))
           .repartition(num_partitions))
    ed = (ed.join(deg, join_type="inner", num_partitions=num_partitions,
                  on=("src",), right_on=("src",))
          .repartition(num_partitions).materialize())

    def n_b(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(0)})

    base = nodes.map_batches(n_b, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    n_seeds = len(seeds)
    seed_set = set(seeds)

    seed_arr = pa.array(sorted(seed_set), type=None)

    def init_r(b: pa.Table) -> pa.Table:
        # vectorized membership (pc.is_in), not a per-row Python list
        m = pc.is_in(b.column("node"), value_set=seed_arr)
        vals = pc.if_else(m, pa.scalar(1.0 / n_seeds), pa.scalar(0.0))
        return b.append_column("r", pc.cast(vals, pa.float64()))

    ranks = base.map_batches(init_r, batch_format="pyarrow").materialize()

    def contrib_b(b: pa.Table) -> pa.Table:
        c = pc.divide(b.column("r"),
                      pc.cast(b.column("deg"), pa.float64()))
        return pa.table({"node": b.column("dst"), "r": c})

    def zero_b(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"),
                         "r": pa.array(np.zeros(len(b)))})

    for _ in range(iters):
        msgs = (ed.join(ranks, join_type="inner",
                        num_partitions=num_partitions,
                        on=("src",), right_on=("node",))
                .map_batches(contrib_b, batch_format="pyarrow")
                .materialize())
        emitted = msgs.sum("r") or 0.0
        teleport = (1.0 - damping) + damping * max(0.0, 1.0 - emitted)
        add_seed = teleport / n_seeds

        def finish_b(b: pa.Table, _a=add_seed) -> pa.Table:
            r = pc.multiply(b.column("r"), pa.scalar(damping))
            m = pc.is_in(b.column("node"), value_set=seed_arr)
            bump = pc.if_else(m, pa.scalar(_a), pa.scalar(0.0))
            return pa.table({"node": b.column("node"),
                             "r": pc.add(r, pc.cast(bump, pa.float64()))})

        ranks = (msgs.union(base.map_batches(zero_b,
                                             batch_format="pyarrow"))
                 .groupby("node")
                 .aggregate(Sum("r", alias_name="r"))
                 .map_batches(finish_b, batch_format="pyarrow")
                 .repartition(num_partitions)
                 .materialize())
    return ranks


def pagerank_oracle_sql(d_body: str, out_node: str = "host",
                        damping: float = 0.85, iters: int = 8,
                        round_digits: int = 8,
                        personalized: bool = False,
                        weighted: bool = False) -> str:
    """DuckDB recompute of the fixed-iteration power method in
    `pagerank` / `personalized_pagerank`, unrolled as one CTE triple
    per iteration — DuckDB 1.0 recursive CTEs cannot aggregate in the
    recursive term, and plain CTEs are inlined once per reference, so
    without the MATERIALIZED hints the unrolled plan re-evaluates the
    whole prefix exponentially (measured: the 8-iteration query never
    finishes un-hinted, 0.3 s hinted).

    `d_body` must SELECT the distinct edge list as columns (s, t).
    With `personalized`, the teleport mass lands entirely on the
    lexicographically smallest linking host min(s) — exactly
    `host_ppr`'s default seed; otherwise teleport is uniform over the
    node set (`pagerank`).

    Float parity with the distributed engine holds because both sides
    run the same float64 recurrence (contrib = r/deg, fold by dst,
    dangling mass redistributed each round) and only the OUTPUT is
    rounded (engine: pc.round ndigits=8 in host_pagerank /
    entity_pagerank / host_ppr); distributed summation order diverges
    at ~1e-16 relative, ten orders below the rounding grain (grain
    coarsened 10→8 digits in round 5 so a rank landing within ~1e-15
    of a half-way boundary is ~100× less likely to round differently
    on the two engines — round-4 advice)."""
    ctes = [
        f"d AS MATERIALIZED ({d_body})",
        "nodes AS MATERIALIZED (SELECT s AS h FROM d UNION SELECT t FROM d)",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n "
        "FROM nodes)",
        ("deg AS MATERIALIZED (SELECT s, sum(w) AS deg FROM d GROUP BY s)"
         if weighted else
         "deg AS MATERIALIZED (SELECT s, CAST(count(*) AS DOUBLE) AS deg "
         "FROM d GROUP BY s)"),
    ]
    # with `weighted`, d_body must also SELECT a DOUBLE weight column w;
    # contrib becomes (r*w)/W — the exact op order of the engine's
    # contrib_b
    if personalized:
        ctes.append("seed AS MATERIALIZED (SELECT min(s) AS v FROM d)")
        ctes.append("r0 AS MATERIALIZED (SELECT h, CASE WHEN "
                    "h = (SELECT v FROM seed) THEN 1.0 ELSE 0.0 END AS r "
                    "FROM nodes)")
    else:
        ctes.append("r0 AS MATERIALIZED (SELECT h, "
                    "1.0/(SELECT n FROM nn) AS r FROM nodes)")
    contrib = (f"r{{prev}}.r * d.w / deg.deg" if weighted
               else f"r{{prev}}.r / deg.deg")
    for i in range(1, iters + 1):
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT d.t AS h, "
            f"{contrib.format(prev=i-1)} AS c "
            f"FROM d JOIN deg ON deg.s = d.s "
            f"JOIN r{i-1} ON r{i-1}.h = d.s)")
        # dangling mass = 1 - Σcontrib, clamped at 0 like the engine
        if personalized:
            ctes.append(
                f"a{i} AS MATERIALIZED (SELECT ({1.0 - damping!r}) + "
                f"{damping!r} * greatest(0.0, 1.0 - "
                f"(SELECT coalesce(sum(c), 0.0) FROM m{i})) AS v)")
            bump = (f"CASE WHEN nodes.h = (SELECT v FROM seed) "
                    f"THEN (SELECT v FROM a{i}) ELSE 0.0 END")
        else:
            ctes.append(
                f"a{i} AS MATERIALIZED (SELECT "
                f"({1.0 - damping!r})/(SELECT n FROM nn) + {damping!r} * "
                f"greatest(0.0, 1.0 - "
                f"(SELECT coalesce(sum(c), 0.0) FROM m{i}))"
                f"/(SELECT n FROM nn) AS v)")
            bump = f"(SELECT v FROM a{i})"
        ctes.append(
            f"r{i} AS MATERIALIZED (SELECT nodes.h, "
            f"{damping!r} * coalesce(s.c, 0.0) + {bump} AS r "
            f"FROM nodes LEFT JOIN (SELECT h, sum(c) AS c FROM m{i} "
            f"GROUP BY h) s ON s.h = nodes.h)")
    return ("WITH " + ",\n".join(ctes) +
            f"\nSELECT h AS {out_node}, round(r, {round_digits}) AS rank "
            f"FROM r{iters} ORDER BY rank DESC, {out_node}")


def hits(edges, nodes, src: str, dst: str, iters: int = 8,
         num_partitions: int = 8):
    """HITS hubs-and-authorities (Kleinberg JACM'99) over a directed
    edge Dataset — the classic companion score to PageRank for web-KG
    host ranking (authorities ≈ heavily-cited content hosts, hubs ≈
    directory/portal hosts; PageRank conflates the two roles).

    Per iteration: authority(v) = Σ hub(u) over in-edges then
    L1-normalize, hub(u) = Σ authority(v) over out-edges then
    L1-normalize — each step one co-partitioned join + one groupby-sum
    + one scalar Sum to the driver, the exact round shape of
    `pagerank` (L1 rather than the textbook L2 normalization: identical
    fixpoint direction, and the normalizing scalar is the plain
    distributed Sum the engine already has). Fixed iteration count,
    like pagerank. Returns (node, hub, authority)."""
    from ray.data.aggregate import Sum

    def e_b(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column(src), "dst": b.column(dst)})

    ed = edges.map_batches(e_b, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    def n_b(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(0)})

    base = nodes.map_batches(n_b, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    def init_b(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"),
                         "v": pa.array(np.ones(len(b)))})

    def zero_b(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"),
                         "v": pa.array(np.zeros(len(b)))})

    zeros = base.map_batches(zero_b, batch_format="pyarrow").materialize()
    hub = base.map_batches(init_b, batch_format="pyarrow").materialize()
    auth = zeros

    def _push(scores, key_on, emit_col):
        """scores joined onto edges at `key_on`, mass lands on
        `emit_col`; returns the un-normalized groupby-sum."""
        def m(b: pa.Table) -> pa.Table:
            return pa.table({"node": b.column(emit_col),
                             "v": b.column("v")})
        return (ed.join(scores, join_type="inner",
                        num_partitions=num_partitions,
                        on=(key_on,), right_on=("node",))
                .map_batches(m, batch_format="pyarrow")
                .union(zeros)
                .groupby("node")
                .aggregate(Sum("v", alias_name="v"))
                .repartition(num_partitions)
                .materialize())

    def _l1(scores):
        total = scores.sum("v") or 0.0
        if total <= 0:
            return scores
        inv = 1.0 / total

        def n(b: pa.Table) -> pa.Table:
            return pa.table({"node": b.column("node"),
                             "v": pc.multiply(b.column("v"),
                                              pa.scalar(inv))})
        return scores.map_batches(n, batch_format="pyarrow").materialize()

    for _ in range(iters):
        auth = _l1(_push(hub, "src", "dst"))
        hub = _l1(_push(auth, "dst", "src"))

    # rename each side's score before the final join (both carry "v")
    def rename_h(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"),
                         "hub": b.column("v")})

    hub_named = hub.map_batches(rename_h, batch_format="pyarrow")

    def rename_a(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"),
                         "authority": b.column("v")})

    auth_named = auth.map_batches(rename_a, batch_format="pyarrow") \
        .repartition(num_partitions)
    return hub_named.repartition(num_partitions) \
        .join(auth_named, join_type="inner",
              num_partitions=num_partitions,
              on=("node",), right_on=("node",))


def directed_reachable(edges, seeds, src: str, dst: str,
                       num_partitions: int = 4, max_iters: int = 128):
    """The set of nodes reachable FROM `seeds` along directed edges
    (seeds included) — frontier-fixpoint flag propagation: per round
    one co-partitioned join ships the flag across edges and a
    groupby-max folds; converges in depth rounds (int-sum fixpoint,
    raising on non-convergence like connected_components). `seeds`:
    single-column Dataset. Returns a single-column Dataset `node`."""
    from ray.data.aggregate import Max

    def e_b(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column(src), "b": b.column(dst)})

    ed = edges.map_batches(e_b, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    def s_b(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(0)})

    flags = seeds.map_batches(s_b, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    prev = flags.count()
    for _ in range(max_iters):
        def m(b: pa.Table) -> pa.Table:
            return pa.table({"node": b.column("b")})

        moved = (ed.join(flags, join_type="inner",
                         num_partitions=num_partitions,
                         on=("a",), right_on=("node",))
                 .map_batches(m, batch_format="pyarrow"))
        flags = (flags.union(moved)
                 .groupby("node").aggregate(Max("node", alias_name="_"))
                 .map_batches(lambda b: pa.table({"node": b.column("node")}),
                              batch_format="pyarrow")
                 .repartition(num_partitions).materialize())
        cur = flags.count()
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"directed_reachable: no fixpoint after {max_iters} rounds")
    return flags


def hits_oracle_sql(d_body: str, out_node: str = "host",
                    iters: int = 8, round_digits: int = 8) -> str:
    """DuckDB recompute of `hits`, unrolled like pagerank_oracle_sql
    (same MATERIALIZED-hint rationale). Float parity: both sides run
    sum-fold then multiply-by-reciprocal (1.0/total) in float64 and
    round only the output."""
    ctes = [
        f"d AS MATERIALIZED ({d_body})",
        "nodes AS MATERIALIZED (SELECT s AS h FROM d UNION SELECT t FROM d)",
        "h0 AS MATERIALIZED (SELECT h, 1.0 AS v FROM nodes)",
    ]

    def _step(name, i, prev, key, emit):
        # un-normalized push + L1 normalize (skip when total <= 0)
        ctes.append(
            f"u{name}{i} AS MATERIALIZED (SELECT nodes.h, "
            f"coalesce(s.v, 0.0) AS v FROM nodes LEFT JOIN "
            f"(SELECT d.{emit} AS h, sum({prev}.v) AS v "
            f"FROM d JOIN {prev} ON {prev}.h = d.{key} "
            f"GROUP BY d.{emit}) s ON s.h = nodes.h)")
        ctes.append(
            f"s{name}{i} AS MATERIALIZED "
            f"(SELECT coalesce(sum(v), 0.0) AS t FROM u{name}{i})")
        ctes.append(
            f"{name}{i} AS MATERIALIZED (SELECT h, CASE WHEN "
            f"(SELECT t FROM s{name}{i}) > 0.0 THEN "
            f"v * (1.0 / (SELECT t FROM s{name}{i})) ELSE v END AS v "
            f"FROM u{name}{i})")

    for i in range(1, iters + 1):
        _step("a", i, f"h{i-1}", "s", "t")     # authority ← hubs
        _step("h", i, f"a{i}", "t", "s")       # hub ← authorities
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT h{iters}.h AS {out_node},
       round(h{iters}.v, {round_digits}) AS hub,
       round(a{iters}.v, {round_digits}) AS authority
FROM h{iters} JOIN a{iters} ON a{iters}.h = h{iters}.h
ORDER BY authority DESC, {out_node}""")


def path_join_from_layout(pso_dir: str, pred_a: str = "Interaction",
                          pred_b: str = "isPartOf",
                          num_partitions: int = 4):
    """SPARQL property path `?a <pred_a>/<pred_b> ?c` answered from the
    PSO secondary index: each predicate's edges come from ONE pred-hash
    bucket (point-lookup I/O, like star_join_from_layout), and the path
    closes with a single mid-node co-partitioned join — I/O is the two
    predicates' shares, never the triple table. With the defaults:
    "entities whose interaction partner is a member of a complex/group"
    (Interaction then isPartOf). Returns distinct
    (canonical_subj, mid, canonical_obj) sorted — distinct for free
    because both edge sets are deduped."""
    a = predicate_edges_from_layout(pso_dir, pred_a)
    b = predicate_edges_from_layout(pso_dir, pred_b)

    def left(t: pa.Table) -> pa.Table:
        return pa.table({"canonical_subj": t.column("canonical_subj"),
                         "mid": t.column("canonical_obj")})

    def right(t: pa.Table) -> pa.Table:
        return pa.table({"rmid": t.column("canonical_subj"),
                         "canonical_obj": t.column("canonical_obj")})

    j = (a.map_batches(left, batch_format="pyarrow")
         .repartition(num_partitions)
         .join(b.map_batches(right, batch_format="pyarrow")
               .repartition(num_partitions).materialize(),
               join_type="inner", num_partitions=num_partitions,
               on=("mid",), right_on=("rmid",)))

    def order(t: pa.Table) -> pa.Table:
        return t.select(["canonical_subj", "mid", "canonical_obj"])

    return (j.map_batches(order, batch_format="pyarrow")
            .sort(["canonical_subj", "mid", "canonical_obj"]))


def transitive_closure(edges, src: str, dst: str, max_iters: int = 32,
                       num_partitions: int = 4):
    """All reachable pairs (a, b), 1+ hops, over a directed edge
    Dataset — path-doubling fixpoint: per round, paths ⋈ paths extends
    every known path by every known path (log₂(diameter) rounds, vs
    linear for edge-extension), then a pair-key groupby dedups; the
    pair-count fixpoint detects convergence and raises on a blown
    iteration cap (the connected_components discipline). Intended for
    HIERARCHICAL relations (containment, subclass) where the closure
    is O(depth × edges), not dense-graph reachability — document the
    blow-up before pointing it at a cyclic web graph."""
    from ray.data.aggregate import Count

    def e_b(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column(src), "b": b.column(dst)})

    def dedup(ds):
        return (ds.groupby(["a", "b"]).aggregate(Count(alias_name="_n"))
                .map_batches(lambda t: pa.table({"a": t.column("a"),
                                                 "b": t.column("b")}),
                             batch_format="pyarrow")
                .repartition(num_partitions).materialize())

    paths = dedup(edges.map_batches(e_b, batch_format="pyarrow"))
    prev = paths.count()
    for _ in range(max_iters):
        def rn(t: pa.Table) -> pa.Table:
            return pa.table({"ra": t.column("a"), "rb": t.column("b")})

        ext = (paths.join(paths.map_batches(rn, batch_format="pyarrow")
                          .repartition(num_partitions).materialize(),
                          join_type="inner",
                          num_partitions=num_partitions,
                          on=("b",), right_on=("ra",))
               .map_batches(lambda t: pa.table({"a": t.column("a"),
                                                "b": t.column("rb")}),
                            batch_format="pyarrow"))
        paths = dedup(paths.union(ext))
        cur = paths.count()
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"transitive_closure: no fixpoint after {max_iters} "
            "doubling rounds")
    return paths


def all_pairs_distances(edges, src: str, dst: str,
                        num_partitions: int = 4, max_iters: int = 128):
    """All finite shortest-path distances (srcn, node, dist ≥ 1) over a
    directed edge Dataset by level-synchronous multi-source BFS. The
    pair state is O(V·reach) — right for host-bounded graphs; sketch
    paths (HyperBall) are the web-scale approximation.

    No anti-join: min-dist dedup keeps the FIRST visit, so a pair is
    newly reached this round iff its folded dist equals the round's
    level — a filter, not a second join (join-consuming-join chains
    hit the zero-column empty-partition pitfall documented at
    condensation_levels; union+groupby consuming a join is the
    proven-safe round shape of pagerank/connected_components)."""
    from ray.data.aggregate import Min

    def e_b(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column(src), "b": b.column(dst)})

    ed = edges.map_batches(e_b, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    def init_f(b: pa.Table) -> pa.Table:
        return pa.table({"srcn": b.column("a"), "node": b.column("b"),
                         "dist": pa.array(
                             np.ones(b.num_rows, dtype=np.int64))})

    def dedup_pairs(ds):
        return (ds.groupby(["srcn", "node"])
                .aggregate(Min("dist", alias_name="dist"))
                .repartition(num_partitions).materialize())

    frontier = dedup_pairs(ed.map_batches(init_f,
                                          batch_format="pyarrow"))
    visited = frontier
    for k in range(1, max_iters + 1):
        ext = (frontier.join(ed, join_type="inner",
                             num_partitions=num_partitions,
                             on=("node",), right_on=("a",))
               .map_batches(lambda t: pa.table({
                   "srcn": t.column("srcn"), "node": t.column("b"),
                   "dist": pc.add(t.column("dist"),
                                  pa.scalar(1, pa.int64()))}),
                   batch_format="pyarrow"))
        visited = dedup_pairs(visited.union(ext))

        def lvl(b: pa.Table, _d=k + 1) -> pa.Table:
            return b.filter(pc.equal(b.column("dist"),
                                     pa.scalar(_d, pa.int64())))

        frontier = visited.map_batches(lvl, batch_format="pyarrow") \
            .repartition(num_partitions).materialize()
        if frontier.count() == 0:
            break
    else:
        raise RuntimeError(
            f"all_pairs_distances: frontier alive after {max_iters} "
            "rounds — raise max_iters")
    return visited


def distance_histogram(edges, src: str, dst: str,
                       num_partitions: int = 4, max_iters: int = 128):
    """The pairwise shortest-path distance distribution (dist,
    n_pairs), u ≠ v, finite distances only — the Broder-style
    structure probe the diameter/effective-diameter statistics read
    off. Integer-valued, so the DuckDB closure oracle checks it
    hash-exact. Sorted by dist."""
    from ray.data.aggregate import Count

    visited = all_pairs_distances(edges, src, dst,
                                  num_partitions=num_partitions,
                                  max_iters=max_iters)

    def noself(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(b.column("srcn"), b.column("node")))
        return pa.table({"dist": b.filter(keep).column("dist")})

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"dist": b.column("dist"),
                         "n_pairs": b.column("n").cast(pa.int64())})

    return (visited.map_batches(noself, batch_format="pyarrow")
            .groupby("dist").aggregate(Count(alias_name="n"))
            .map_batches(fin, batch_format="pyarrow")
            .sort("dist"))


def harmonic_centrality(edges, nodes, src: str, dst: str,
                        num_partitions: int = 4, max_iters: int = 128):
    """Exact harmonic centrality H(v) = Σ_{u≠v, d(u,v)<∞} 1/d(u,v)
    over directed edges (Boldi-Vigna's preferred centrality for web
    graphs — finite under disconnection where closeness is not).

    Level-synchronous multi-source BFS over (source, node) pairs
    (all_pairs_distances), folded by one groupby-sum of 1/dist per
    target. The pair state is O(V·reach) —
    right for the |hosts|-bounded host graph; at web scale the
    HyperBall register sweep (host_harmonic_hyperball) is the
    documented approximation path (Boldi & Vigna, WWW'13 'In-Core
    Computation of Geometric Centralities with HyperBall').

    Returns (node, harmonic) for EVERY node (0.0 when nothing reaches
    it), harmonic rounded to 10 decimals, sorted desc then node."""
    from ray.data.aggregate import Sum

    visited = all_pairs_distances(edges, src, dst,
                                  num_partitions=num_partitions,
                                  max_iters=max_iters)

    def inv(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(b.column("srcn"), b.column("node")))
        t = b.filter(keep)
        return pa.table({"node": t.column("node"),
                         "h": pc.divide(pa.scalar(1.0),
                                        pc.cast(t.column("dist"),
                                                pa.float64()))})

    def zero_b(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(0),
                         "h": pa.array(np.zeros(b.num_rows))})

    agg = (visited.map_batches(inv, batch_format="pyarrow")
           .union(nodes.map_batches(zero_b, batch_format="pyarrow"))
           .groupby("node").aggregate(Sum("h", alias_name="h")))

    def final_b(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"),
                         "harmonic": pc.round(b.column("h"),
                                              ndigits=8)})

    return (agg.map_batches(final_b, batch_format="pyarrow")
            .sort(["harmonic", "node"], descending=[True, False]))


# -- HyperBall (HLL neighborhood function) --------------------------------------

_HB_M = 64                       # registers per node (b = 6 index bits)
_HB_ALPHA = 0.709                # alpha_64 (Flajolet et al. 2007)
_POPCOUNT_TABLE = np.array([bin(i).count("1") for i in range(256)],
                           dtype=np.uint8)


_HB_REG_COLS = [f"hb{i:02d}" for i in range(_HB_M)]


def _hb_init_regs(node_arr: pa.Array) -> np.ndarray:
    """(n, 64) uint8 register matrix, one HLL register set per node with
    the node's own hash inserted (polars seed-0 hash — the repo's
    cross-process-stable primitive): index = low 6 bits,
    rho = ctz(remaining bits) + 1 (geometric(1/2), capped; ctz via the
    (w & -w) - 1 popcount trick — vectorizable on numpy 1.x where clz
    is not)."""
    import polars as pl

    h = pl.from_arrow(node_arr).hash(seed=0).to_numpy() \
        .astype(np.uint64, copy=False)
    idx = (h & np.uint64(_HB_M - 1)).astype(np.int64)
    w = h >> np.uint64(6)
    lsb = w & (~w + np.uint64(1))
    m1 = (lsb - np.uint64(1))
    pc8 = _POPCOUNT_TABLE[m1.view(np.uint8).reshape(-1, 8)].sum(axis=1)
    rho = np.where(w > 0, pc8 + 1, 59).astype(np.uint8)
    regs = np.zeros((len(h), _HB_M), dtype=np.uint8)
    regs[np.arange(len(h)), idx] = rho
    return regs


def _hb_cols_matrix(b: pa.Table) -> np.ndarray:
    """The 64 hbNN uint8 columns of a state block as an (n, 64) uint8
    matrix (one column gather each — no per-row Python)."""
    return np.stack(
        [b.column(c).to_numpy(zero_copy_only=False)
         for c in _HB_REG_COLS], axis=1).astype(np.uint8, copy=False)


def _hb_estimate(regs: np.ndarray) -> np.ndarray:
    """Standard HLL estimate per register set (with the small-range
    linear-counting correction) — vectorized across nodes; input is the
    (n, 64) uint8 register matrix."""
    regs = regs.astype(np.float64, copy=False)
    est = _HB_ALPHA * _HB_M * _HB_M / np.power(2.0, -regs).sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * _HB_M) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = _HB_M * np.log(_HB_M / np.maximum(zeros, 1e-12))
    return np.where(small, lin, est)


def hyperball_harmonic(edges, nodes, src: str, dst: str,
                       num_partitions: int = 4, max_iters: int = 64):
    """Approximate harmonic centrality by HyperBall (Boldi & Vigna
    WWW'13) — see _hyperball_sweep for the register mechanics. Returns
    (node, harmonic_est) sorted desc then node - approximate values
    (HLL sigma ~ 13% at m=64); the exact twin is the oracle-checked
    reference."""
    state, _ = _hyperball_sweep(edges, nodes, src, dst,
                                num_partitions=num_partitions,
                                max_iters=max_iters)

    def final_b(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"),
                         "harmonic_est": pc.round(b.column("harm"),
                                                  ndigits=6)})

    return (state.map_batches(final_b, batch_format="pyarrow")
            .sort(["harmonic_est", "node"], descending=[True, False]))


def _hyperball_sweep(edges, nodes, src: str, dst: str,
                     num_partitions: int = 4, max_iters: int = 64):
    """The shared HyperBall register sweep (Boldi & Vigna WWW'13): each
    node carries a 64-register HLL of its in-ball {u : d(u,v) <= k};
    per round every register set ships along its out-edges, a per-node
    groupby MAX-merges them, and per-node accumulators fold the ball
    growth (|ball_k| - |ball_{k-1}|, clamped at 0) into the three
    geometric-centrality sums. State is O(V x 64 bytes) and each round
    is one co-partitioned join + one groupby; the accumulators ride IN
    the state table — the driver holds only the register-sum fixpoint
    scalar plus one float per round. Converges when no register changes
    (integer register-sum fixpoint, exact).

    Returns (state, nf_inc) where state has columns
      node, regs, prev_est (final |ball| estimate incl. self),
      harm   (Σ inc_k / k      — harmonic centrality),
      nreach (Σ inc_k          — #nodes that reach v, excl. self),
      sdist  (Σ inc_k * k      — total in-distance),
    and nf_inc = [I_1, .., I_K], the GLOBAL neighborhood-function
    increments (I_k ≈ #ordered pairs u≠v with d(u,v) = k) — the
    Boldi-Vigna neighborhood function as O(diameter) driver-side
    floats, never pair rows. All_pairs twins (harmonic_centrality,
    closeness_centrality, distance_histogram, effective_diameter) are
    the exact small-graph oracles; this sweep is their 100× path.

    Register layout (round 5): the 64 registers travel as 64 uint8
    COLUMNS so the per-round merge is a NATIVE groupby Max over 68
    columns — no per-node Python. (The first cut used a binary regs
    blob + a pandas map_groups fold: one Python call per node per
    round, which is exactly the per-row trap this sweep exists to
    avoid at 100×.) The accumulator columns ride the same Max: message
    rows carry prev_est = -1 and zero accumulators, the self row's
    values are ≥ 0, so Max selects the self row — and a message-only
    group (target absent from the nodes Dataset, advice r4) yields
    prev_est = -1, which bump clamps to an empty previous ball."""
    from ray.data.aggregate import Max, Sum

    def e_b(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column(src), "b": b.column(dst)})

    ed = edges.map_batches(e_b, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    acc_cols = ["prev_est", "harm", "nreach", "sdist"]

    def _table(node_col, reg_matrix, prev_est, harm, nreach, sdist):
        cols = {"node": node_col}
        cols.update({c: pa.array(reg_matrix[:, i], type=pa.uint8())
                     for i, c in enumerate(_HB_REG_COLS)})
        cols["prev_est"] = pa.array(prev_est, pa.float64())
        cols["harm"] = pa.array(harm, pa.float64())
        cols["nreach"] = pa.array(nreach, pa.float64())
        cols["sdist"] = pa.array(sdist, pa.float64())
        return pa.table(cols)

    def init_b(b: pa.Table) -> pa.Table:
        col = b.column(0).combine_chunks()
        m = _hb_init_regs(col)
        est = _hb_estimate(m)
        z = np.zeros(len(est))
        return _table(col, m, est, z, z, z)

    state = nodes.map_batches(init_b, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    def totals(ds) -> tuple:
        """(Σ register values, Σ nreach) in ONE pass — the register sum
        is the integer convergence fixpoint, the nreach sum yields the
        per-round neighborhood-function increment."""
        def s(b: pa.Table) -> pa.Table:
            regt = int(_hb_cols_matrix(b).sum())
            nr = float(np.sum(b.column("nreach")
                              .to_numpy(zero_copy_only=False)))
            return pa.table({"t": pa.array([regt], pa.int64()),
                             "nr": pa.array([nr], pa.float64())})
        row = (ds.map_batches(s, batch_format="pyarrow")
               .aggregate(Sum("t", alias_name="t"),
                          Sum("nr", alias_name="nr")))
        return int(row["t"] or 0), float(row["nr"] or 0.0)

    def msg_b(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {"node": t.column("b")}
        cols.update({c: t.column(c) for c in _HB_REG_COLS})
        # marker rows: prev_est < 0 means "not the self row"
        cols["prev_est"] = pa.array(np.full(n, -1.0), pa.float64())
        z = pa.array(np.zeros(n), pa.float64())
        cols["harm"] = z
        cols["nreach"] = z
        cols["sdist"] = z
        return pa.table(cols)

    aggs = ([Max(c, alias_name=c) for c in _HB_REG_COLS]
            + [Max(c, alias_name=c) for c in acc_cols])

    prev_tot, prev_nr = totals(state)
    nf_inc: list[float] = []
    for k in range(1, max_iters + 1):
        msgs = (ed.join(state, join_type="inner",
                        num_partitions=num_partitions,
                        on=("a",), right_on=("node",))
                .map_batches(msg_b, batch_format="pyarrow"))

        def bump(b: pa.Table, _k=k) -> pa.Table:
            m = _hb_cols_matrix(b)
            est = _hb_estimate(m)
            # message-only groups (node absent from `nodes`) surface as
            # prev_est = -1 after the Max merge: clamp to an empty ball
            prev = np.maximum(
                0.0, b.column("prev_est").to_numpy(zero_copy_only=False))
            inc = np.maximum(0.0, est - prev)
            harm = b.column("harm").to_numpy(zero_copy_only=False) \
                + inc / _k
            nre = b.column("nreach").to_numpy(zero_copy_only=False) \
                + inc
            sd = b.column("sdist").to_numpy(zero_copy_only=False) \
                + inc * _k
            return _table(b.column("node"), m, est, harm, nre, sd)

        state = (state.union(msgs)
                 .groupby("node").aggregate(*aggs)
                 .map_batches(bump, batch_format="pyarrow")
                 .repartition(num_partitions).materialize())
        cur_tot, cur_nr = totals(state)
        nf_inc.append(cur_nr - prev_nr)
        prev_nr = cur_nr
        if cur_tot == prev_tot:
            break
        prev_tot = cur_tot
    else:
        raise RuntimeError(
            f"_hyperball_sweep: registers alive after {max_iters} "
            "rounds")
    return state, nf_inc


def hyperball_closeness(edges, nodes, src: str, dst: str,
                        num_partitions: int = 4, max_iters: int = 64):
    """Approximate Lin-corrected in-closeness off the HyperBall sweep:
    n ≈ Σ ball increments (nreach), S ≈ Σ increments × distance
    (sdist), closeness ≈ n / S — the sketch twin of the exact
    closeness_centrality (whose O(V·reach) pair BFS is the small-graph
    oracle; this is the 100× path). Returns (node, n_reached_by_est,
    closeness_est) sorted closeness desc then node."""
    state, _ = _hyperball_sweep(edges, nodes, src, dst,
                                num_partitions=num_partitions,
                                max_iters=max_iters)

    def final_b(b: pa.Table) -> pa.Table:
        n = b.column("nreach").to_numpy(zero_copy_only=False)
        s = b.column("sdist").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            clo = np.where(s > 0.0, n / np.maximum(s, 1e-300), 0.0)
        return pa.table({
            "node": b.column("node"),
            "n_reached_by_est": pa.array(np.round(n, 3), pa.float64()),
            "closeness_est": pa.array(np.round(clo, 6), pa.float64())})

    return (state.map_batches(final_b, batch_format="pyarrow")
            .sort(["closeness_est", "node"], descending=[True, False]))


def hyperball_distance_histogram(edges, nodes, src: str, dst: str,
                                 num_partitions: int = 4,
                                 max_iters: int = 64):
    """Approximate pairwise distance distribution (dist, n_pairs_est)
    from the HyperBall neighborhood function: I_k = N(k) - N(k-1)
    summed over nodes (per-node clamped increments, so the series is
    non-negative). The sketch twin of distance_histogram, whose exact
    all-pairs BFS is the small-graph oracle; state here is O(V × 64 B)
    — the 100× path. Rows with estimated mass < 0.5 pairs are dropped
    (HLL noise floor). Sorted by dist."""
    import ray.data as rd
    _, nf_inc = _hyperball_sweep(edges, nodes, src, dst,
                                 num_partitions=num_partitions,
                                 max_iters=max_iters)
    ds_, ns_ = [], []
    for k, inc in enumerate(nf_inc, start=1):
        if inc >= 0.5:
            ds_.append(k)
            ns_.append(round(inc, 3))
    return rd.from_arrow(pa.table({
        "dist": pa.array(ds_, pa.int64()),
        "n_pairs_est": pa.array(ns_, pa.float64())}))


def hyperball_effective_diameter(edges, nodes, src: str, dst: str,
                                 q: float = 0.9,
                                 num_partitions: int = 4,
                                 max_iters: int = 64):
    """Approximate one-row graph summary (n_pairs_est, diameter_est,
    effective_diameter_est) off the HyperBall neighborhood function —
    exactly what Boldi-Vigna built HyperBall for (HyperANF / WWW'13
    §5: the effective-diameter of the web graph from HLL ball counts).
    Interpolation mirrors the exact effective_diameter; diameter_est is
    the largest distance with ≥ 0.5 estimated pairs. The exact
    all-pairs twin is the small-graph oracle; this is the 100× path."""
    import pandas as pd

    import ray.data as rd
    _, nf_inc = _hyperball_sweep(edges, nodes, src, dst,
                                 num_partitions=num_partitions,
                                 max_iters=max_iters)
    series = [(k, inc) for k, inc in enumerate(nf_inc, start=1)
              if inc >= 0.5]
    if not series:
        return rd.from_pandas(pd.DataFrame({
            "n_pairs_est": pd.Series([0.0], dtype="float64"),
            "diameter_est": pd.Series([0], dtype="int64"),
            "effective_diameter_est": pd.Series([0.0],
                                                dtype="float64")}))
    total = sum(inc for _, inc in series)
    target = q * total
    cum = 0.0
    eff = float(series[-1][0])
    prev_d, prev_cum = 0, 0.0
    for d, n in series:
        cum += n
        if cum >= target:
            span = cum - prev_cum
            frac = (target - prev_cum) / span if span else 0.0
            eff = prev_d + (d - prev_d) * frac
            break
        prev_d, prev_cum = d, cum
    return rd.from_pandas(pd.DataFrame({
        "n_pairs_est": pd.Series([round(total, 3)], dtype="float64"),
        "diameter_est": pd.Series([series[-1][0]], dtype="int64"),
        "effective_diameter_est": pd.Series([round(eff, 4)],
                                            dtype="float64")}))


def closeness_centrality(edges, nodes, src: str, dst: str,
                         num_partitions: int = 4, max_iters: int = 128):
    """Directed in-closeness with the Lin/Wasserman-Faust reachability
    correction: for each node v reached by n ≥ 1 sources at total
    distance S, closeness(v) = n / S (0.0 when nothing reaches it) —
    the companion statistic to harmonic centrality off the same
    multi-source BFS (all_pairs_distances). n and S are exact ints, so
    the single int→float division is bit-identical across engines and
    the oracle needs no rounding. Returns (node, n_reached_by,
    closeness) sorted closeness desc then node."""
    from ray.data.aggregate import Count, Sum

    visited = all_pairs_distances(edges, src, dst,
                                  num_partitions=num_partitions,
                                  max_iters=max_iters)

    def noself(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(b.column("srcn"), b.column("node")))
        t = b.filter(keep)
        return pa.table({"node": t.column("node"),
                         "dist": t.column("dist")})

    agg = (visited.map_batches(noself, batch_format="pyarrow")
           .groupby("node")
           .aggregate(Count(alias_name="n"),
                      Sum("dist", alias_name="s")))

    def score(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.int64())
        return pa.table({
            "node": b.column("node"),
            "n_reached_by": n,
            "closeness": pc.divide(pc.cast(n, pa.float64()),
                                   pc.cast(b.column("s"),
                                           pa.float64()))})

    reached = (agg.map_batches(score, batch_format="pyarrow")
               .map_batches(lambda b: pa.table({
                   "rn": b.column("node"),
                   "n_reached_by": b.column("n_reached_by"),
                   "closeness": b.column("closeness")}),
                   batch_format="pyarrow")
               # defensive repartition before serving as a join side
               # (aggregate-output empty-block pitfall)
               .repartition(num_partitions).materialize())

    base = nodes.map_batches(
        lambda b: pa.table({"node": b.column(0)}),
        batch_format="pyarrow").repartition(num_partitions).materialize()

    out = base.join(reached, join_type="left_outer",
                    num_partitions=num_partitions,
                    on=("node",), right_on=("rn",))

    def fill(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b.column("node"),
            "n_reached_by": pc.fill_null(
                b.column("n_reached_by"), 0).cast(pa.int64()),
            "closeness": pc.fill_null(b.column("closeness"), 0.0)})

    return (out.map_batches(fill, batch_format="pyarrow")
            .sort(["closeness", "node"], descending=[True, False]))


def effective_diameter(edges, src: str, dst: str, q: float = 0.9,
                       num_partitions: int = 4, max_iters: int = 128):
    """One-row graph summary off the distance distribution: n_pairs,
    the exact diameter (max finite distance), and the linearly
    interpolated effective diameter at quantile q (the smallest d such
    that ≥ q of finite pairs sit within d, interpolated between the
    bracketing integer distances — the standard web-graph statistic of
    Palmer et al. / Leskovec's densification papers). The histogram is
    tiny (≤ diameter rows), so the interpolation folds on the driver
    from the aggregated counts — never from pair rows."""
    hist = distance_histogram(edges, src, dst,
                              num_partitions=num_partitions,
                              max_iters=max_iters).to_pandas()
    import pandas as pd

    import ray.data as rd
    if len(hist) == 0:
        return rd.from_pandas(pd.DataFrame({
            "n_pairs": pd.Series([0], dtype="int64"),
            "diameter": pd.Series([0], dtype="int64"),
            "effective_diameter": pd.Series([0.0], dtype="float64")}))
    total = int(hist["n_pairs"].sum())
    target = q * total
    cum = 0
    eff = float(hist["dist"].iloc[-1])
    prev_d, prev_cum = 0, 0
    for d, n in zip(hist["dist"], hist["n_pairs"]):
        cum += int(n)
        if cum >= target:
            # interpolate between prev_d (prev_cum pairs) and d (cum)
            span = cum - prev_cum
            frac = (target - prev_cum) / span if span else 0.0
            eff = prev_d + (d - prev_d) * frac
            break
        prev_d, prev_cum = d, cum
    return rd.from_pandas(pd.DataFrame({
        "n_pairs": pd.Series([total], dtype="int64"),
        "diameter": pd.Series([int(hist["dist"].max())], dtype="int64"),
        "effective_diameter": pd.Series([eff], dtype="float64")}))
