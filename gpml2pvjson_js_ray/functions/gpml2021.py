"""GPML2021 → 2013a-shaped parse adapter (the second shipped
ConversionProfile instance).

The reference converter is 2013a-only; GPML2021 is the published
successor schema (PathVisio/libGPML, pathvisio.org/GPML/2021). Its
differences from 2013a are mechanical renames plus container grouping,
which makes it an ideal adapter profile over the existing table set:

- namespace ``http://pathvisio.org/GPML/2021``;
- id attributes: ``GraphId`` → ``elementId``, ``GraphRef`` →
  ``elementRef``, ``GroupRef`` → ``groupRef``;
- ``Xref`` attributes: ``Database`` → ``dataSource``, ``ID`` →
  ``identifier``;
- element attributes move to lowerCamelCase (``CenterX`` → ``centerX``,
  ``TextLabel`` → ``textLabel``, ``ArrowHead`` → ``arrowHead``, …);
- per-class elements sit in PLURAL container elements (``<DataNodes>``,
  ``<Interactions>``, ``<Labels>``, ``<Shapes>``, ``<Groups>``,
  ``<GraphicalLines>``) instead of directly under ``<Pathway>``;
- the pathway title attribute is ``title`` (2013a ``Name``).

The adapter rewrites a parsed GPML2021 ElementTree into the 2013a shape
IN PLACE (tags keep the 2021 namespace — the Processor keys on local
names; the namespace gate is the profile's ``supported_namespaces``),
so every downstream table (KeyMappings, converters, marker/group
enrichment — the 2013a semantics the 93 golden fixtures pin) applies
unchanged. Beyond the renames the adapter also maps the 2021 models that
REPLACED 2013a constructs (round-5):

- ``Waypoints`` containers: a 2021 edge keeps its ``Point``/``Anchor``
  children inside ``<Waypoints>``; they move into the edge's
  ``<Graphics>`` where the 2013a converter reads them;
- the Annotation/Citation model: ``<Citations><Citation elementId=…>``
  (with its ``Xref dataSource/identifier``) becomes a 2013a Biopax
  ``PublicationXref`` (elementId → rdf ``$ID``, identifier → ``ID``,
  dataSource → ``DB``); ``<CitationRef elementRef=…/>`` becomes the
  text-form ``<BiopaxRef>`` the 2013a reference shape uses;
  ``<Annotations><Annotation value=… type=…>`` becomes an
  ``openControlledVocabulary`` (value → TERM, Xref identifier → ID,
  Xref dataSource → Ontology). Per-element ``AnnotationRef``s are
  dropped: 2013a has no per-element vocabulary references — the
  controlled vocabulary is a pathway-level list (A4 vocab collect),
  which is exactly where the converted entries land.
"""

from __future__ import annotations

import re

# lowerCamelCase attr → 2013a attr, applied to EVERY element; renames
# that are not simple case changes listed explicitly first
_EXPLICIT_RENAMES = {
    "elementId": "GraphId",
    "elementRef": "GraphRef",
    "groupRef": "GroupRef",
    "dataSource": "Database",
    "identifier": "ID",
    "title": "Name",
    "textLabel": "TextLabel",
}

# plural 2021 containers whose children are hoisted directly under
# <Pathway>, in container document order (document order inside each
# container is preserved; _docOrder determinism comes from the hoisted
# sequence)
_CONTAINERS = {"DataNodes", "Interactions", "GraphicalLines", "Labels",
               "Shapes", "Groups", "States", "Anchors"}

_CAMEL = re.compile(r"^[a-z][A-Za-z0-9]*$")


def _upper_first(name: str) -> str:
    return name[0].upper() + name[1:]


def _rename_attrs(el) -> None:
    items = list(el.attrib.items())
    for key, val in items:
        if key.startswith("{"):        # namespaced attrs (rdf:id) untouched
            continue
        new = _EXPLICIT_RENAMES.get(key)
        if new is None and _CAMEL.match(key):
            new = _upper_first(key)
        if new and new != key:
            del el.attrib[key]
            el.attrib[new] = val


def _localname(tag) -> str:
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else str(tag)


def _adapt_annotations_citations(root) -> None:
    """2021 Annotation/Citation model → the 2013a Biopax fragment +
    text-form BiopaxRef children (runs BEFORE attribute renames, so it
    reads 2021 attribute names). See module docstring for the field
    mapping."""
    from xml.etree import ElementTree as ET

    def _xref_of(el):
        return next((c for c in el if _localname(c.tag) == "Xref"), None)

    publication_xrefs, vocabularies = [], []
    for child in list(root):
        ln = _localname(child.tag)
        if ln == "Citations":
            for cit in child:
                if _localname(cit.tag) != "Citation":
                    continue
                xref = _xref_of(cit)
                # bare tags: the 2013a parser keys Biopax children on
                # local names, and the bare "ID" attribute satisfies
                # its rdf-ID localname check ($ID)
                px = ET.Element("PublicationXref",
                                {"ID": cit.attrib.get("elementId", "")})
                ET.SubElement(px, "ID").text = (
                    xref.attrib.get("identifier", "")
                    if xref is not None else "")
                ET.SubElement(px, "DB").text = (
                    xref.attrib.get("dataSource", "")
                    if xref is not None else "")
                publication_xrefs.append(px)
            root.remove(child)
        elif ln == "Annotations":
            for ann in child:
                if _localname(ann.tag) != "Annotation":
                    continue
                xref = _xref_of(ann)
                ocv = ET.Element("openControlledVocabulary")
                ET.SubElement(ocv, "TERM").text = \
                    ann.attrib.get("value", "")
                ET.SubElement(ocv, "ID").text = (
                    xref.attrib.get("identifier", "")
                    if xref is not None else "")
                ET.SubElement(ocv, "Ontology").text = (
                    xref.attrib.get("dataSource", "")
                    if xref is not None else "")
                vocabularies.append(ocv)
            root.remove(child)
    if publication_xrefs or vocabularies:
        bp = ET.SubElement(root, "Biopax")
        for el in publication_xrefs + vocabularies:
            bp.append(el)

    # CitationRef → text-form BiopaxRef in place (order preserved:
    # BiopaxRef position matters for the citation-rank numbering);
    # AnnotationRef dropped (pathway-level vocabulary in 2013a)
    for el in list(root.iter()):
        for child in list(el):
            ln = _localname(child.tag)
            if ln == "CitationRef":
                idx = list(el).index(child)
                el.remove(child)
                bref = ET.Element("BiopaxRef")
                bref.text = child.attrib.get("elementRef", "")
                el.insert(idx, bref)
            elif ln == "AnnotationRef":
                el.remove(child)


def adapt_gpml2021_tree(root):
    """Rewrite a GPML2021 ElementTree into 2013a attribute/topology
    shape (in place; returns root). Safe on already-2013a trees only in
    the trivial sense — the profile applies it solely to documents the
    2021 namespace gate admitted."""
    # 1. hoist plural-container children under <Pathway>, preserving
    # relative document order
    new_children = []
    for child in list(root):
        if _localname(child.tag) in _CONTAINERS:
            new_children.extend(list(child))
            root.remove(child)
        else:
            new_children.append(child)
    for child in list(root):
        root.remove(child)
    for child in new_children:
        root.append(child)

    # 1b. Annotation/Citation model → Biopax fragment + BiopaxRef
    _adapt_annotations_citations(root)

    # 2. 2021 edges keep their Points/Anchors in a <Waypoints>
    # container; 2013a expects them inside <Graphics>
    for el in root:
        if _localname(el.tag) not in ("Interaction", "GraphicalLine"):
            continue
        # both edge-level containers: <Waypoints> (Points) and, in
        # documents that emit them separately, <Anchors> (Anchor
        # elements) — 2013a expects both kinds inside <Graphics>
        waypoints = [c for c in el
                     if _localname(c.tag) in ("Waypoints", "Anchors")]
        if not waypoints:
            continue
        graphics = next((c for c in el
                         if _localname(c.tag) == "Graphics"), None)
        if graphics is None:
            from xml.etree import ElementTree as ET
            ns = el.tag.rsplit("}", 1)[0] + "}" \
                if el.tag.startswith("{") else ""
            graphics = ET.SubElement(el, f"{ns}Graphics")
        for wp in waypoints:
            for pt in list(wp):
                graphics.append(pt)
            el.remove(wp)

    # 3. attribute renames, every element in the tree
    _rename_attrs(root)
    for el in root.iter():
        _rename_attrs(el)
    return root
