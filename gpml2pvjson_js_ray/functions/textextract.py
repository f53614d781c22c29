"""Plain-text extraction from page HTML.

The per-row invariant (BASELINE.json input_hint): the extracted text for a
url must be byte-identical to the `text` column the corpus carries. The
extraction pipeline: drop <script>/<style> subtrees and GPML islands, strip
tags, decode HTML entities, collapse whitespace runs to single spaces,
strip. Vectorization note: this runs per row inside map_batches over the
`html` column (large_binary); regexes are module-level compiled constants so
actor/task setup cost is zero per batch.
"""

from __future__ import annotations

import html as _html
import re

from .islands import ISLAND_RE

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1>", re.DOTALL | re.IGNORECASE)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_text(page_html: str) -> str:
    s = _SCRIPT_STYLE_RE.sub(" ", page_html)
    s = _COMMENT_RE.sub(" ", s)
    s = ISLAND_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    s = _WS_RE.sub(" ", s).strip()
    return s
