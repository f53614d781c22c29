"""Ray Data stage: triple emission from converted documents (explode)."""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions.triples import emit_triples

TRIPLES_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("url", pa.string()),
    ("pathway_id", pa.string()),
    ("entity_id", pa.string()),
    ("subj_xref", pa.string()),
    ("obj_xref", pa.string()),
    ("subj_is_node", pa.bool_()),
    ("obj_is_node", pa.bool_()),
    ("biopax_type", pa.string()),
    ("control_type", pa.string()),
    ("conversion_direction", pa.string()),
])

_BOOL_COLS = {"subj_is_node", "obj_is_node"}


def emit_triples_batch(batch: pa.Table) -> pa.Table:
    out = {name: [] for name in TRIPLES_SCHEMA.names}
    pvjsons = batch.column("pvjson").to_pylist()
    urls = batch.column("url").to_pylist()
    errors = batch.column("error").to_pylist() \
        if "error" in batch.schema.names else [""] * len(urls)
    for url, blob, error in zip(urls, pvjsons, errors):
        if error or not blob:
            continue
        doc = json.loads(blob)
        for t in emit_triples(doc, url, copy_entities=False):
            for name in TRIPLES_SCHEMA.names:
                if name in _BOOL_COLS:
                    out[name].append(bool(t.get(name)))
                else:
                    out[name].append(t.get(name) or "")
    return pa.Table.from_pydict(out, schema=TRIPLES_SCHEMA)


def make_triples_writer(triples_dir: str):
    """Passthrough checkpoint stage: writes each linked-triples block to
    the partition's triples directory INSIDE the task (content-addressed
    name -> idempotent on retry) and passes the block through unchanged,
    so the downstream exchange consumes the same in-memory blocks instead
    of re-reading the checkpoint."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    def write_passthrough(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            # content-derived name: vectorized per-row hash of the full
            # triple key folded through sha1. Idempotent under task retry
            # (same block -> same digest) but cannot collide across
            # distinct blocks the way the old (first_url, last_url,
            # num_rows) key could (e.g. re-crawl duplicates at block
            # endpoints), which silently dropped a checkpoint on resume.
            from .exchange import polars_capped
            pl = polars_capped()
            row_h = (pl.from_arrow(
                batch.select(["subj", "pred", "obj", "url"]))
                .hash_rows(seed=0).to_numpy())
            key = hashlib.sha1(row_h.tobytes()).hexdigest()[:16]
            pq.write_table(batch,
                           os.path.join(triples_dir,
                                        f"triples-{key}.parquet"),
                           compression="zstd")
        return batch

    return write_passthrough
