"""lodash-compatible word splitting / case functions.

The reference relies on lodash `camelCase` for fallback key naming
(Processor.ts:542) and `kebabCase` for enum values
(2013a/ValueConverters.ts:289-306). This is a from-scratch implementation of
the documented lodash behavior (split on non-alphanumerics and case
boundaries; letters/digits boundaries split words)."""

from __future__ import annotations

import re
from functools import lru_cache

# ASCII-ish word splitter modeled on lodash's unicodeWords for the simple
# cases GPML keys use: runs of upper, Capitalized runs, lower runs, digit runs.
_WORD_RE = re.compile(
    r"[A-Z]+(?=[A-Z][a-z])"   # leading acronym before a capitalized word
    r"|[A-Z]?[a-z]+"          # Capitalized or lower word
    r"|[A-Z]+"                # acronym
    r"|[0-9]+"                # digits
)


def words(s: str):
    return _WORD_RE.findall(s or "")


@lru_cache(maxsize=4096)
def camel_case(s: str) -> str:
    ws = words(s)
    if not ws:
        return ""
    head = ws[0].lower()
    rest = [w[:1].upper() + w[1:].lower() for w in ws[1:]]
    return head + "".join(rest)


@lru_cache(maxsize=4096)
def kebab_case(s: str) -> str:
    return "-".join(w.lower() for w in words(s))


@lru_cache(maxsize=4096)
def start_case(s: str) -> str:
    return " ".join(w[:1].upper() + w[1:] for w in words(s))
