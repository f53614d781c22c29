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
ISLAND_RE = re.compile(
    r"<Pathway\b[^>]*xmlns=[\"'](?:http://pathvisio\.org/GPML/2013a"
    r"|http://genmapp\.org/GPML/20(?:10a|08a|07))[\"'][^>]*>"
    r".*?</Pathway>",
    re.DOTALL)


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
