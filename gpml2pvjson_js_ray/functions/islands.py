"""GPML island extraction from web-page HTML.

Generalizes the reference CLI's multi-document splitter
(bin/gpml2pvjson:61-96): the reference splits a concatenated byte stream on
the XML header (case-insensitive utf-8, single- or double-quoted — the
lowercase-utf-8 / single-quotes fixtures) and on </Pathway>, re-appending the
closing tag. Here a page's html may embed zero or more <Pathway …>…</Pathway>
structured islands; each is extracted verbatim (byte-for-byte, so the sha256
document id is stable) for downstream conversion.
"""

from __future__ import annotations

import re

# The XML header the reference splits on (bin/gpml2pvjson:61): version 1.0,
# UTF-8 in any case, single or double quotes.
XML_HEADER_RE = re.compile(
    r"""<\?xml\ version=["']1.0["']\ encoding=["']UTF-8["']\?>""",
    re.IGNORECASE)

# A GPML island: a <Pathway …> element whose xmlns is one of the supported
# GPML namespaces, through its closing tag. DOTALL because islands span lines.
# The body is shared between the Python regex (per-row fallback paths) and
# the rust-regex form used by the vectorized polars extractor
# (stages/extract.py) — identical semantics: \b, non-greedy, dotall.
ISLAND_PATTERN_BODY = (
    r"<Pathway\b[^>]*xmlns=[\"'](?:http://pathvisio\.org/GPML/2013a"
    r"|http://genmapp\.org/GPML/20(?:10a|08a|07))[\"'][^>]*>"
    r".*?</Pathway>")
ISLAND_RE = re.compile(ISLAND_PATTERN_BODY, re.DOTALL)
ISLAND_PATTERN_RUST = "(?s)" + ISLAND_PATTERN_BODY


def extract_islands(html: str) -> list[str]:
    """All GPML islands in a page, in document order, verbatim."""
    return ISLAND_RE.findall(html)


def split_concatenated_gpml(stream_text: str) -> list[str]:
    """The reference CLI's stdin splitter semantics (bin/gpml2pvjson:61-96):
    drop everything before the first XML header, split on </Pathway>
    (re-appending it), drop empty trailers."""
    parts = XML_HEADER_RE.split(stream_text)
    if len(parts) > 1:
        parts = parts[1:]
    body = "".join(parts)
    out = []
    for chunk in re.split(r"</Pathway>[\r\n]*", body):
        if not chunk.strip():
            continue
        out.append(chunk + "</Pathway>")
    return out

_TAIL_RE = re.compile(r"</Pathway>[\r\n]*")

_HEADER_PROBE = '<?xml version="1.0" encoding="utf-8"?>'


def _could_be_header_prefix(s: str) -> bool:
    """Whether `s` might still grow into an XML header (delimiters span
    chunk boundaries)."""
    norm = s[:len(_HEADER_PROBE)].lower().replace("'", '"')
    return _HEADER_PROBE.startswith(norm)


def iter_split_gpml_stream(chunks):
    """Incremental form of split_concatenated_gpml: consume an iterable of
    text chunks (arbitrary boundaries — delimiters may span chunks) and
    yield each GPML document as soon as its closing tag arrives, holding
    only the unfinished tail in memory. Byte-equivalent to the batch
    splitter (property-tested across chunkings), mirroring the reference
    CLI's highland pipeline (bin/gpml2pvjson:61-96): documents before the
    first XML header are dropped (so nothing is emitted until the first
    header arrives or the stream ends headerless), later headers are
    removed wherever they appear, newlines trailing a closing tag are
    consumed even across removed headers, and the closing tag is
    re-appended to each split piece — including a trailing fragment at
    EOF."""
    buf = ""
    header_seen = False
    swallow_nl = False  # inside a delimiter's trailing-newline run

    def strip_headers():
        nonlocal buf, header_seen
        while True:
            m = XML_HEADER_RE.search(buf)
            if not m:
                return
            buf = (buf[:m.start()] + buf[m.end():]) if header_seen \
                else buf[m.end():]
            header_seen = True

    for chunk in chunks:
        buf += chunk
        strip_headers()
        if not header_seen:
            continue  # a future header would drop this prefix — hold it
        while True:
            if swallow_nl:
                buf = buf.lstrip("\r\n")
                if not buf or _could_be_header_prefix(buf):
                    break  # more delimiter newlines / a header may follow
                swallow_nl = False
            m = _TAIL_RE.search(buf)
            if not m:
                break
            doc = buf[:m.start()]
            if doc.strip():
                yield doc + "</Pathway>"
            buf = buf[m.end():]
            swallow_nl = True
            strip_headers()  # a removed header keeps the swallow active
    if swallow_nl:
        buf = buf.lstrip("\r\n")
    for piece in re.split(r"</Pathway>[\r\n]*", buf):
        if piece.strip():
            yield piece + "</Pathway>"
