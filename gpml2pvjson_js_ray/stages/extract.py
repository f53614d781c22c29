"""Ray Data stages: island extraction + text extraction.

Stateless `map_batches` transforms over Arrow batches
(batch_format="pyarrow"). The html column is dropped as early as possible —
it dominates row width (SURVEY.md §7.5 "project early").
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..functions.islands import extract_islands
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

    An Arrow-kernel substring prefilter drops pages that cannot contain an
    island before any Python-side work: on a real web crawl the vast
    majority of pages have no GPML at all, and this keeps them entirely in
    the vectorized path."""
    import pyarrow.compute as pc
    try:
        # match_substring accepts string AND binary columns
        batch = batch.filter(
            pc.match_substring(batch.column("html"), "<Pathway"))
    except pa.ArrowNotImplementedError:
        pass  # unexpected column type: per-row path below still correct

    urls, tss, idxs, doc_ids, islands = [], [], [], [], []
    url_col = batch.column("url").to_pylist()
    ts_col = batch.column("warc_ts").to_pylist()
    html_col = batch.column("html").to_pylist()
    for url, ts, html in zip(url_col, ts_col, html_col):
        text = html.decode("utf-8", errors="replace") \
            if isinstance(html, (bytes, bytearray)) else (html or "")
        for idx, island in enumerate(extract_islands(text)):
            urls.append(url)
            tss.append(ts)
            idxs.append(idx)
            doc_ids.append("hash://sha256/"
                           + hashlib.sha256(island.encode()).hexdigest())
            islands.append(island)
    return pa.Table.from_pydict(
        {"url": urls, "warc_ts": tss, "island_idx": idxs,
         "doc_id": doc_ids, "island": islands},
        schema=ISLANDS_SCHEMA)


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
