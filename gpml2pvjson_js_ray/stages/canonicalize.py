"""Ray Data stages: exact triple dedup (D5) + canonical-entity unification
(A6) — the two wide shuffles of the KG pipeline.

Both follow the pre-aggregate pattern (ray_guide: combine inside
map_batches, then a small groupby): a within-batch combiner shrinks the
all-to-all exchange before the global `groupby`, which matters at 10^12-row
scale where the raw triple stream is orders of magnitude larger than the
distinct-key space.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

TRIPLE_KEY = ["canonical_subj", "pred", "canonical_obj"]


def dedup_triples_within_batch(batch: pa.Table) -> pa.Table:
    """Combiner: drop duplicate (s,p,o) rows inside one batch, keeping the
    lexically-smallest url for deterministic provenance."""
    if batch.num_rows == 0:
        return batch
    # sort by key+url, then keep the first row of each key run — fully
    # vectorized: adjacent-row inequality on each key column
    sort_keys = [(k, "ascending") for k in TRIPLE_KEY] + [("url", "ascending")]
    batch = batch.sort_by(sort_keys)
    n = batch.num_rows
    if n <= 1:
        return batch
    differs = None
    for k in TRIPLE_KEY:
        col = batch.column(k).combine_chunks()
        d = pc.not_equal(col.slice(1), col.slice(0, n - 1))
        differs = d if differs is None else pc.or_(differs, d)
    mask = pa.concat_arrays([pa.array([True]),
                             differs.combine_chunks()
                             if isinstance(differs, pa.ChunkedArray)
                             else differs])
    return batch.filter(mask)


def dedup_triples_global(ds):
    """Global exact dedup: hash-partitioned groupby on (s,p,o), first row per
    group (deterministic min-url)."""
    import pandas as pd

    def first_per_group(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.sort_values("url").head(1)

    return ds.groupby(TRIPLE_KEY).map_groups(first_per_group,
                                             batch_format="pandas")


# ---------------------------------------------------------------------------
# canonical entity unification
# ---------------------------------------------------------------------------

MAX_ALIASES = 32  # cap alias payload per canonical id (hot entities)

ENTITY_PARTIAL_SCHEMA = pa.schema([
    ("canonical_id", pa.string()),
    ("aliases_json", pa.string()),
    ("n_mentions", pa.int64()),
    ("first_url", pa.string()),
])


def entity_partials_batch(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch partial aggregation of entity mentions keyed by
    canonical id (subject and object sides both contribute)."""
    acc: dict[str, dict] = {}
    for side, xref_side, node_side in (
            ("canonical_subj", "subj_xref", "subj_is_node"),
            ("canonical_obj", "obj_xref", "obj_is_node")):
        ids = batch.column(side).to_pylist()
        xrefs = batch.column(xref_side).to_pylist()
        urls = batch.column("url").to_pylist()
        nodes = batch.column(node_side).to_pylist()
        for cid, xref, url, is_node in zip(ids, xrefs, urls, nodes):
            if not cid or not (is_node or xref):
                continue  # literals (classes, citation ids) are not entities
            slot = acc.get(cid)
            if slot is None:
                slot = acc[cid] = {"aliases": set(), "n": 0, "url": url}
            slot["n"] += 1
            if xref:
                if len(slot["aliases"]) < MAX_ALIASES:
                    slot["aliases"].add(xref)
            if url < slot["url"]:
                slot["url"] = url
    return pa.Table.from_pydict({
        "canonical_id": list(acc.keys()),
        "aliases_json": [json.dumps(sorted(v["aliases"]))
                         for v in acc.values()],
        "n_mentions": [v["n"] for v in acc.values()],
        "first_url": [v["url"] for v in acc.values()],
    }, schema=ENTITY_PARTIAL_SCHEMA)


def merge_entity_partials(ds):
    """Global merge: groupby canonical_id over the (already small) partials;
    deterministic sorted-union of aliases, sum of mentions, min first_url
    (SURVEY.md §2.5 A6)."""
    import pandas as pd

    def merge(df: "pd.DataFrame") -> "pd.DataFrame":
        aliases: set = set()
        for blob in df["aliases_json"]:
            aliases.update(json.loads(blob))
        return pd.DataFrame({
            "canonical_id": [df["canonical_id"].iloc[0]],
            "aliases_json": [json.dumps(sorted(aliases)[:MAX_ALIASES])],
            "n_mentions": [int(df["n_mentions"].sum())],
            "first_url": [df["first_url"].min()],
        })

    return ds.groupby("canonical_id").map_groups(merge,
                                                 batch_format="pandas")
