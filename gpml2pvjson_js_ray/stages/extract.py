"""Ray Data stages: island extraction + text extraction.

Stateless `map_batches` transforms over Arrow batches
(batch_format="pyarrow"). The html column is dropped as early as possible —
it dominates row width (SURVEY.md §7.5 "project early").
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..functions.textextract import extract_text

ISLANDS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("island_idx", pa.int32()),
    ("doc_id", pa.string()),
    ("island", pa.large_string()),
])


def extract_islands_batch(batch: pa.Table) -> pa.Table:
    """pages(url, warc_ts, html, ...) → island rows (explode: one page may
    yield 0..N islands). The sha256 doc id matches the reference CLI's
    fallback id over the exact island bytes (bin/gpml2pvjson:99-113).

    Fully vectorized: an Arrow-kernel substring prefilter drops pages that
    cannot contain an island, then polars' rust regex extracts every
    island across the whole batch at once (extract_all + explode). The
    only per-island Python left is the sha256 doc id, which is the
    operator's defined semantic (one digest per island, not per page —
    round 2 ran the extraction regex in a per-page Python loop)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.islands import ISLAND_PATTERN_RUST
    from .exchange import polars_capped
    try:
        # match_substring accepts string AND binary columns
        batch = batch.filter(
            pc.match_substring(batch.column("html"), "<Pathway"))
    except pa.ArrowNotImplementedError:
        pass  # unexpected column type: decode below still correct
    if batch.num_rows == 0:
        return ISLANDS_SCHEMA.empty_table()

    pl = polars_capped()
    df = pl.from_arrow(batch.select(["url", "warc_ts", "html"]))
    if df["html"].dtype == pl.Binary:
        df = df.with_columns(text=pl.col("html")
                             .cast(pl.String, strict=False))
        if df["text"].null_count():
            # rare non-UTF8 pages: python decode with errors="replace"
            # keeps byte parity with the row loop this replaced
            idxs = df["text"].is_null().arg_true()
            fixed = [df["html"][int(i)].decode("utf-8", errors="replace")
                     for i in idxs]
            df = df.with_columns(
                df["text"].scatter(idxs, fixed).alias("text"))
    else:
        df = df.with_columns(text=pl.col("html").cast(pl.String)
                             .fill_null(""))
    df = df.with_columns(
        isl=pl.col("text").str.extract_all(ISLAND_PATTERN_RUST))
    # explode (empty lists become one null row, filtered after the index
    # assignment so island_idx stays per-page positional)
    lens = df["isl"].list.len().to_numpy().astype(np.int64)
    plens = np.maximum(lens, 1)
    offs = np.zeros(len(plens), dtype=np.int64)
    if len(plens) > 1:
        np.cumsum(plens[:-1], out=offs[1:])
    idx = (np.arange(int(plens.sum()), dtype=np.int64)
           - np.repeat(offs, plens)).astype(np.int32)
    ex = (df.select(["url", "warc_ts", "isl"]).explode("isl")
          .with_columns(pl.Series("island_idx", idx, dtype=pl.Int32))
          .filter(pl.col("isl").is_not_null()))
    islands = ex["isl"].to_list()
    doc_ids = ["hash://sha256/" + hashlib.sha256(s.encode()).hexdigest()
               for s in islands]
    t = ex.to_arrow()
    return pa.table({
        "url": t.column("url"),
        "warc_ts": t.column("warc_ts"),
        "island_idx": t.column("island_idx"),
        "doc_id": pa.array(doc_ids, type=pa.string()),
        "island": t.column("isl"),
    }).cast(ISLANDS_SCHEMA)


TEXTS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("lang", pa.string()),
    ("text_extracted", pa.large_string()),
    ("text_matches", pa.bool_()),
])


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """pages → per-url extracted text + the byte-identity invariant flag
    against the corpus `text` column (BASELINE.json per-row invariant)."""
    urls = batch.column("url").to_pylist()
    langs = batch.column("lang").to_pylist()
    htmls = batch.column("html").to_pylist()
    oracle = batch.column("text").to_pylist() \
        if "text" in batch.schema.names else [None] * len(urls)
    texts, matches = [], []
    for html, expected in zip(htmls, oracle):
        s = html.decode("utf-8", errors="replace") \
            if isinstance(html, (bytes, bytearray)) else (html or "")
        t = extract_text(s)
        texts.append(t)
        matches.append(expected is None or t == expected)
    return pa.Table.from_pydict(
        {"url": urls, "lang": langs, "text_extracted": texts,
         "text_matches": matches},
        schema=TEXTS_SCHEMA)
