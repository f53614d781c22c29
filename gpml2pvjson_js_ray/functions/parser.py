"""GPML 2013a XML → plain-dict element tree.

Replaces the reference's cxsd/CXML SAX pipeline (spinoffs/cxml-xpath.ts,
selector table 2013a/toPvjson.ts:169-198) with a per-island parse using the
stdlib ElementTree. One GPML island is small (a single <Pathway> document);
document-level parallelism is provided by Ray Data upstream, so a full parse
per island is the right granularity.

Output shapes mirror what the CXML selectors hand to the Processor:
  * attributes become dict keys (XSD-numeric attributes coerced to numbers)
  * child elements become nested dicts / lists per GPML cardinality
  * Biopax PublicationXref children become {"content": text} records and the
    rdf:ID attribute becomes the "$ID" key (after the rdf:id→rdf:ID fixup,
    2013a/toPvjson.ts:163-167)
  * per-class GPML defaults are merged in (element wins, deep), standing in
    for the reference's prototype-level extendDeep (2013a/toPvjson.ts:145-156)
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from .mappings import GPML_DEFAULTS

# XSD-numeric GPML attributes (GPML2013a.xsd via the cxsd-generated types the
# reference imports at 2013a/toPvjson.ts:50).
_NUMERIC_ATTRS = {
    "BoardWidth", "BoardHeight", "CenterX", "CenterY", "X", "Y",
    "Width", "Height", "FontSize", "LineThickness", "Rotation",
    "RelX", "RelY", "Position", "ZOrder", "FillOpacity",
}

# Children that are lists per the GPML schema.
_LIST_CHILDREN = {"Comment", "Attribute", "BiopaxRef", "Point", "Anchor",
                  "PublicationXref", "openControlledVocabulary", "AUTHORS"}

RDF_ID_FIXUP_RE = re.compile(r' rdf:id="')

_CLASS_LISTS = {
    "DataNode": "data_nodes",
    "State": "states",
    "Interaction": "interactions",
    "GraphicalLine": "graphical_lines",
    "Label": "labels",
    "Shape": "shapes",
    "Group": "groups",
}


def fixup_rdf_id(xml_text: str) -> str:
    """GPML2013a incorrectly uses rdf:id instead of rdf:ID
    (2013a/toPvjson.ts:163-167)."""
    return RDF_ID_FIXUP_RE.sub(' rdf:ID="', xml_text)


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _namespace(tag: str) -> str:
    if tag.startswith("{"):
        return tag[1:].split("}", 1)[0]
    return ""


def coerce_number(value: str):
    """JS Number()-like coercion used for XSD numeric attrs; integral floats
    normalize to int to match JS JSON serialization (32768, not 32768.0)."""
    try:
        f = float(value)
    except (TypeError, ValueError):
        return value
    if f.is_integer() and abs(f) < 2**53:
        return int(f)
    return f


def _attrs_to_dict(el: ET.Element) -> dict:
    out = {}
    for k, v in el.attrib.items():
        name = _localname(k)
        if name in _NUMERIC_ATTRS:
            out[name] = coerce_number(v)
        else:
            out[name] = v
    return out


def _add_child(parent: dict, name: str, value):
    if name in _LIST_CHILDREN:
        parent.setdefault(name, []).append(value)
    else:
        parent[name] = value


def _parse_generic(el: ET.Element) -> dict:
    """Attributes + recursively parsed children + text content."""
    d = _attrs_to_dict(el)
    for child in el:
        name = _localname(child.tag)
        _add_child(d, name, _parse_generic(child))
    text = (el.text or "").strip()
    if text:
        d["content"] = text
    return d


def _parse_comment(el: ET.Element) -> dict:
    d = _attrs_to_dict(el)
    d["content"] = el.text or ""
    return d


def _parse_biopax_ref(el: ET.Element) -> str:
    return (el.text or "").strip()


def _parse_publication_xref(el: ET.Element) -> dict:
    d = {}
    for k, v in el.attrib.items():
        if _localname(k) == "ID":
            # rdf:ID; CXML exposes it as $ID because the element also has an
            # ID child (2013a/ValueConverters.ts:69-76)
            d["$ID"] = v
    for child in el:
        name = _localname(child.tag)
        text = (child.text or "").strip()
        # bp:YEAR is numeric in the Biopax fragment (the reference's year
        # sort does parseInt, and expected pvjson carries it as a number)
        record = {"content": coerce_number(text) if name == "YEAR" else text}
        _add_child(d, name, record)
    return d


def _parse_open_controlled_vocabulary(el: ET.Element) -> dict:
    d = {}
    for child in el:
        # TERM / ID / Ontology are simple xsd:string content
        d[_localname(child.tag)] = (child.text or "").strip()
    return d


def _copy_default(dv):
    """Independent copy of a JSON-ish defaults subtree. The defaults
    tables hold only dicts/lists/scalars, so a structural copy replaces
    deepcopy's generic machinery (measured: deepcopy was ~4% of the whole
    convert stage); scalars are immutable and shared."""
    if isinstance(dv, dict):
        return {k: _copy_default(v) for k, v in dv.items()}
    if isinstance(dv, list):
        return [_copy_default(v) for v in dv]
    return dv


def _defaults_deep(target: dict, defaults: dict) -> dict:
    """Element-wins deep merge (stands in for prototype extendDeep)."""
    for k, dv in defaults.items():
        if k not in target:
            target[k] = _copy_default(dv) if isinstance(dv, (dict, list)) \
                else dv
        elif isinstance(target[k], dict) and isinstance(dv, dict):
            _defaults_deep(target[k], dv)
    return target


def apply_class_defaults(element: dict, gpml_element_name: str,
                         defaults_table: dict | None = None) -> dict:
    table = GPML_DEFAULTS if defaults_table is None else defaults_table
    defaults = table.get(gpml_element_name)
    if defaults:
        _defaults_deep(element, defaults)
        if gpml_element_name in ("Interaction", "GraphicalLine"):
            for anchor in element.get("Graphics", {}).get("Anchor", []) or []:
                _defaults_deep(anchor, table["Anchor"])
    return element


class GPMLParseResult:
    """Parsed island: pathway metadata + per-class element lists, in
    document order (the order the CXML selectors would emit)."""

    __slots__ = ("pathway", "graphics", "comments", "data_nodes", "states",
                 "interactions", "graphical_lines", "labels", "shapes",
                 "groups", "publication_xrefs",
                 "open_controlled_vocabularies")

    def __init__(self):
        self.pathway = {}
        self.graphics = {}
        self.comments = []
        self.data_nodes = []
        self.states = []
        self.interactions = []
        self.graphical_lines = []
        self.labels = []
        self.shapes = []
        self.groups = []
        self.publication_xrefs = []
        self.open_controlled_vocabularies = []


def parse_gpml(xml_text: str,
               defaults_table: dict | None = None,
               adapter=None) -> GPMLParseResult:
    """Parse one GPML island (string) into per-class element dicts.

    defaults_table overrides the schema profile's XSD attribute defaults
    (functions/profile.py); None = GPML2013a. `adapter` (profile
    parse_adapter) rewrites the raw tree into the 2013a shape before
    dict extraction — the GPML2021 profile's seam."""
    root = ET.fromstring(fixup_rdf_id(xml_text))
    if _localname(root.tag) != "Pathway":
        raise ValueError(f"Expected <Pathway> root, got <{_localname(root.tag)}>")
    if adapter is not None:
        root = adapter(root)

    res = GPMLParseResult()
    res.pathway = _attrs_to_dict(root)
    res.pathway["_namespace"] = _namespace(root.tag)
    apply_class_defaults(res.pathway, "Pathway", defaults_table)

    for doc_order, child in enumerate(root):
        name = _localname(child.tag)
        if name == "Graphics":
            res.graphics = _attrs_to_dict(child)
        elif name == "Comment":
            res.comments.append(_parse_comment(child))
        elif name in _CLASS_LISTS:
            el = apply_class_defaults(_parse_generic(child), name,
                                      defaults_table)
            # "_"-prefixed keys are private and dropped by the key-mapping
            # engine (Processor.ts:499-506); used to preserve document order
            # across classes for id-generation determinism.
            el["_docOrder"] = doc_order
            getattr(res, _CLASS_LISTS[name]).append(el)
        elif name == "Biopax":
            for bp_child in child:
                bp_name = _localname(bp_child.tag)
                if bp_name == "PublicationXref":
                    res.publication_xrefs.append(
                        _parse_publication_xref(bp_child))
                elif bp_name == "openControlledVocabulary":
                    res.open_controlled_vocabularies.append(
                        _parse_open_controlled_vocabulary(bp_child))
        # InfoBox / Legend intentionally ignored (2013a/toPvjson.ts:982-985)

    # Parsed Comment / BiopaxRef / Attribute children of GPML elements are
    # handled generically by _parse_generic; Comment children there need the
    # comment shape ({content, Source?}) rather than the generic shape.
    for lst in (res.data_nodes, res.states, res.interactions,
                res.graphical_lines, res.labels, res.shapes, res.groups):
        for el in lst:
            if "BiopaxRef" in el:
                el["BiopaxRef"] = [
                    b.get("content", "") if isinstance(b, dict) else b
                    for b in el["BiopaxRef"]
                ]
    return res
