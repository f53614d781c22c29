"""Field-level pvjson document comparison for the regression harness.

Re-expresses the reference's compare harness semantics
(/root/reference/test/compare/compare-streaming.js:1-769 — convert a
corpus, deep-diff each document against a golden copy, report per-file
and aggregate results) as a pure function the distributed CLI `compare`
command maps over a corpus.

`IGNORED_PATHWAY_KEYS` mirrors the two known-stale golden keys (see
FIXTURES.md): `id` is a sha256 of the exact input bytes (differs for
any regenerated GPML) and `textContent` is stale in the reference's own
goldens.
"""

from __future__ import annotations

from typing import Iterable

IGNORED_PATHWAY_KEYS = ("id", "textContent")


def diff_documents(mine: dict, expected: dict,
                   ignored_pathway_keys: Iterable[str]
                   = IGNORED_PATHWAY_KEYS) -> list[dict]:
    """Return one record per differing field between two pvjson docs.

    Compares the entity map (missing/extra entities and per-field
    values), the pathway's z-ordered `contains` membership, and the
    pathway's own scalar fields minus the ignored keys."""
    diffs: list[dict] = []
    mine_ents = mine.get("entitiesById", {})
    exp_ents = expected.get("entitiesById", {})

    for eid in sorted(set(exp_ents) - set(mine_ents)):
        diffs.append({"entity": eid, "field": "<entity>",
                      "mine": None, "expected": "<present>"})
    for eid in sorted(set(mine_ents) - set(exp_ents)):
        diffs.append({"entity": eid, "field": "<entity>",
                      "mine": "<present>", "expected": None})

    for eid in sorted(set(mine_ents) & set(exp_ents)):
        a, b = mine_ents[eid], exp_ents[eid]
        for key in sorted(set(a) | set(b)):
            if a.get(key) != b.get(key):
                diffs.append({"entity": eid, "field": key,
                              "mine": _clip(a.get(key)),
                              "expected": _clip(b.get(key))})

    ignored = set(ignored_pathway_keys)
    pw_a = mine.get("pathway", {})
    pw_b = expected.get("pathway", {})
    if set(pw_a.get("contains", [])) != set(pw_b.get("contains", [])):
        diffs.append({"entity": "<pathway>", "field": "contains",
                      "mine": _clip(pw_a.get("contains")),
                      "expected": _clip(pw_b.get("contains"))})
    for key in sorted((set(pw_a) | set(pw_b)) - ignored - {"contains"}):
        if pw_a.get(key) != pw_b.get(key):
            diffs.append({"entity": "<pathway>", "field": key,
                          "mine": _clip(pw_a.get(key)),
                          "expected": _clip(pw_b.get(key))})
    return diffs


def _clip(value, limit: int = 120) -> str | None:
    if value is None:
        return None
    s = str(value)
    return s if len(s) <= limit else s[:limit] + "…"
