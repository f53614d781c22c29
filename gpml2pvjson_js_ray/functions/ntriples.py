"""N-Triples serialization of the KG triple stream — the line-oriented
RDF sink next to the JSON-LD one (reference parity: the reference emits
JSON-LD with the pvjs @context, `src/jsonld.ts`; N-Triples is the
interchange format every triple store bulk-loads, so a KG engine needs
both).

Term-mapping convention (documented, lossless, mirrors the JSON-LD
@context roles):

- subjects / node objects: the linker's collision-free
  `canonical_subj` / `canonical_obj` (identifiers.org IRI, or the
  doc-scoped `pathwayId#localId` form for nodes without an xref) when
  those columns are present. Blank-node labels are FILE-scoped in
  N-Triples, and the dedup shuffle scatters one entity's triples
  across content-addressed shards — raw GraphIdManager ids (which
  repeat per document) would merge distinct entities within a shard
  and break co-reference across shards on bulk load. IRIs pass
  through; the doc-scoped form is skolemized into a stable
  `urn:wp:genid:<pathwayId>:<localId>` IRI (RDF 1.1 §3.5 skolem-IRI
  convention, URN-shaped because this engine has no HTTP authority),
  matching the per-document scoping the reference's JSON-LD relies
  on. Batches WITHOUT canonical columns (unit-level use) fall back to
  document-local blank nodes `_:<id>` (sanitized with a
  collision-proof hash suffix when outside the safe label alphabet);
- predicates: `rdf:type` → the rdf namespace; every other predicate is
  a wp-vocabulary term → `http://vocabularies.wikipathways.org/wp#`
  (the same vocabulary the reference's JSON-LD context resolves
  against);
- `rdf:type` objects are BioPAX/wp class names →
  `http://www.biopax.org/release/biopax-level3.owl#<Class>`
  (`functions/mappings.py` PvjsonToBioPAX, reference
  `src/spinoffs/...`);
- `hasXref` objects `DataSource:ID` expand through the SAME
  identifiers.org namespace table the entity linker broadcasts
  (`sources/xrefs.py` DATASOURCES) when the datasource is known — the
  canonical-IRI convention of the north star; unknown datasources stay
  literals;
- every other object is a literal with N-Triples escaping (\\ \" \\n
  \\r \\t, other controls as \\u00XX; UTF-8 pass-through otherwise).

The formatter is pure (batch table in, line column out) so the sink
stage in pipelines/kg.py stays a trivial map_batches; escaping runs
vectorized in polars with a per-string Python fallback only for rows
carrying raw control characters (never seen in GPML attribute values —
ET normalizes them — but correctness must not depend on that).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
WP_NS = "http://vocabularies.wikipathways.org/wp#"
BIOPAX_NS = "http://www.biopax.org/release/biopax-level3.owl#"

_BLANK_OK = re.compile(r"^[A-Za-z][A-Za-z0-9]*$")
_CTRL = re.compile(r"[\x00-\x1f\x7f]")
_PNAME_OK = re.compile(r"^[A-Za-z][A-Za-z0-9_.-]*$")


def _blank(label: str) -> str:
    """Blank-node term for a local graph id; ids outside the safe label
    alphabet get a deterministic, collision-proof rewrite (sanitized
    head + blake2 of the original, so distinct ids can never merge)."""
    if _BLANK_OK.match(label):
        return f"_:{label}"
    safe = re.sub(r"[^A-Za-z0-9]", "", label) or "b"
    h = hashlib.blake2b(label.encode("utf-8"), digest_size=6).hexdigest()
    return f"_:x{safe[:24]}{h}"


def _escape_literal(s: str) -> str:
    s = (s.replace("\\", "\\\\").replace('"', '\\"')
         .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))
    if _CTRL.search(s):
        s = _CTRL.sub(lambda m: "\\u%04X" % ord(m.group()), s)
    return s


def _pred_iri(pred: str) -> str:
    if pred == "rdf:type":
        return RDF_NS + "type"
    if _PNAME_OK.match(pred):
        return WP_NS + pred
    # defensive: a predicate outside the vocabulary alphabet cannot be
    # silently mangled into a colliding IRI — hash-disambiguate
    h = hashlib.blake2b(pred.encode("utf-8"), digest_size=6).hexdigest()
    return WP_NS + "p" + h


def _iri_term(iri: str) -> str:
    # IRIREF forbids space, quotes, angle brackets and controls — the
    # page-url graph labels come from untrusted HTML, so escape them
    return "<" + re.sub(r'[\x00-\x20<>"{}|^`\\]',
                        lambda m: "%%%02X" % ord(m.group()), iri) + ">"


SKOLEM_PREFIX = "urn:wp:genid:"


def _node_term(canonical: str) -> str:
    """Canonical node id → N-Triples term. The linker emits exactly
    three shapes (stages/link.py _canonical): an identifiers.org /
    wikidata IRI, an `unknown:<DataSource:ID>` URN for unmatched
    xrefs, or the doc-scoped `pathwayId#localId` form for nodes with
    no xref. The first two are IRIs already; the doc-scoped form is
    skolemized (pathway ids are hex, local ids alnum — neither
    contains ':', so the rewrite cannot collide across documents)."""
    if canonical.startswith(("http://", "https://", "urn:", "unknown:")):
        return _iri_term(canonical)
    if "#" in canonical:
        return _iri_term(SKOLEM_PREFIX + canonical.replace("#", ":", 1))
    return _blank(canonical)


def lines_batch(b: pa.Table, xref_iri_of=None,
                graph_col: str | None = None) -> pa.Table:
    """(subj, pred, obj[, obj_is_node]) batch → single-column `line`
    table of N-Triples lines — or N-QUADS when `graph_col` names a
    column of graph-label IRIs (the per-page provenance export: the
    crawl URL each triple was extracted from, the lineage RDF stores
    query with GRAPH ?g). `xref_iri_of`: optional callable
    "DataSource:ID" → IRI or None (the linker's namespace table);
    when absent, hasXref objects stay literals.

    When the linker's `canonical_subj`/`canonical_obj` columns are
    present (every corpus-level export path), node terms come from
    THEM via `_node_term` — blank-node labels are file-scoped, so the
    raw doc-local ids cannot survive the corpus-level dedup shuffle
    (see module docstring). The raw-id blank-node path remains for
    canonical-less unit batches."""
    names = b.schema.names
    canonical = "canonical_subj" in names and "canonical_obj" in names
    subs = b.column("canonical_subj" if canonical else "subj").to_pylist()
    preds = b.column("pred").to_pylist()
    objs = b.column("obj").to_pylist()
    cobjs = b.column("canonical_obj").to_pylist() if canonical else objs
    if "obj_is_node" in names:
        is_node = b.column("obj_is_node").to_pylist()
    else:
        is_node = [False] * len(subs)
    if canonical and "obj_xref" in names:
        oxrefs = b.column("obj_xref").to_pylist()
    else:
        oxrefs = [""] * len(subs)
    graphs = (b.column(graph_col).to_pylist() if graph_col is not None
              else [None] * len(subs))

    subj_term = _node_term if canonical else _blank
    lines = []
    for s, p, o, co, ox, node, g in zip(subs, preds, objs, cobjs,
                                        oxrefs, is_node, graphs):
        st = subj_term(s)
        pt = f"<{_pred_iri(p)}>"
        if p == "rdf:type":
            ot = f"<{BIOPAX_NS}{o}>" if _PNAME_OK.match(o) \
                else f'"{_escape_literal(o)}"'
        elif node:
            ot = _node_term(co) if canonical else _blank(o)
        elif ox:
            # xref-valued object (hasXref): the linker already resolved
            # it — canonical_obj is the identifiers.org IRI or the
            # unknown: URN; both serialize as IRIs
            ot = _node_term(co)
        else:
            iri = xref_iri_of(o) if (xref_iri_of is not None
                                     and not canonical
                                     and p == "hasXref") else None
            ot = f"<{iri}>" if iri else f'"{_escape_literal(o)}"'
        if g is None:
            lines.append(f"{st} {pt} {ot} .")
        else:
            lines.append(f"{st} {pt} {ot} {_iri_term(g)} .")
    return pa.table({"line": pa.array(lines, pa.string())})


def xref_iri_factory():
    """Build the "DataSource:ID" → identifiers.org IRI resolver from the
    same namespace table the entity linker uses (sources/xrefs.py) —
    one dict per process, probed per distinct object."""
    from ..sources.xrefs import IRI

    low = {k.lower(): v for k, v in IRI.items()}

    def resolve(o: str):
        head, sep, ident = o.partition(":")
        if not sep or not ident:
            return None
        ns = low.get(head.lower())
        return ns + ident if ns else None

    return resolve
