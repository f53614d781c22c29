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
