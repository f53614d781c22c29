"""Multi-format document sources: one loader that yields the SAME
normalized documents Dataset from parquet, ndjson/jsonl, or CSV inputs.

The reference engine ingests exactly one wire format (a GPML XML
stream on stdin, SURVEY.md §2.1 S1-S2); a corpus engine meets data
where it lands — crawler dumps are ndjson, vendor drops are CSV, the
lake is parquet. Every reader feeds the identical downstream pipeline
because the schema is normalized HERE (casts in one map_batches), not
per consumer.

Scale notes: all three readers are Ray Data native (streaming,
splittable); the normalize step is zero-copy for already-conforming
parquet (cast is a no-op on matching types). CSV/JSON text parsing
costs real CPU at 100 TB — land hot corpora as parquet and keep these
readers for ingest edges.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

DOCUMENT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("source", pa.string()),
    ("n_chars", pa.int64()),
])

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".ndjson": "ndjson", ".jsonl": "ndjson", ".json": "ndjson",
    ".csv": "csv",
}


def _detect_format(path: str) -> str:
    """Extension sniff over a file or the files inside a directory."""
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            ext = os.path.splitext(name)[1].lower()
            if ext in _EXT_FORMAT:
                return _EXT_FORMAT[ext]
        raise ValueError(f"no recognized document files under {path}")
    ext = os.path.splitext(path)[1].lower()
    if ext not in _EXT_FORMAT:
        raise ValueError(f"unrecognized document format: {path}")
    return _EXT_FORMAT[ext]


def normalize_documents_batch(b: pa.Table) -> pa.Table:
    """Project + cast to DOCUMENT_SCHEMA; derive n_chars when the
    source format lacks it (ndjson/csv exports often drop it)."""
    cols = {}
    for field in DOCUMENT_SCHEMA:
        if field.name in b.schema.names:
            cols[field.name] = pc.cast(b.column(field.name), field.type)
        elif field.name == "n_chars":
            cols["n_chars"] = pc.cast(
                pc.utf8_length(pc.cast(b.column("text"), pa.string())),
                pa.int64())
        else:
            raise ValueError(f"document input missing column {field.name}")
    return pa.table(cols, schema=DOCUMENT_SCHEMA)


def read_documents(path: str, fmt: str | None = None):
    """→ normalized documents Dataset from parquet / ndjson / csv.

    `path` is a file or directory; `fmt` overrides extension
    detection. Column order, types and derived n_chars are identical
    across formats, so every documents_* pipeline accepts the result
    unchanged."""
    import ray.data as rd

    fmt = fmt or _detect_format(path)
    if fmt == "parquet":
        ds = rd.read_parquet(path)
    elif fmt == "ndjson":
        ds = rd.read_json(path,
                          file_extensions=["json", "jsonl", "ndjson"])
    elif fmt == "csv":
        ds = rd.read_csv(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    return ds.map_batches(normalize_documents_batch, batch_format="pyarrow")
