"""Per-island GPML→pvjson conversion driver.

Re-expresses the reference's stream assembly (2013a/toPvjson.ts:159-1000) as
a straight-line pass over a fully parsed island: metadata fold → per-class
property/type conversion in stream order → dependency (topological) ordering
with the reference's RECURSION_LIMIT guard → postprocess dispatch (burr
attach, edge finalize, group finalize) → citations/vocabularies.

All state is per-document (one Processor per island); this function is pure
and is invoked from Ray Data `map_batches` UDFs — document-level parallelism
lives entirely in Ray.
"""

from __future__ import annotations

import functools
import hashlib
import urllib.parse

from .edge import postprocess_edge_pvjson, preprocess_edge_gpml
from .group import postprocess_group_pvjson, preprocess_group_gpml
from .jsonld import (arrayify, insert_if_not_exists, intersects_lsv,
                     sort_by_map, union_lsv)
from .mappings import VOCABULARY_NAME_TO_IRI
from .parser import parse_gpml
from .processor import Processor

RECURSION_LIMIT = 1000  # 2013a/toPvjson.ts:103 (WP2037 rev 90015 guard)

JSONLD_CONTEXT = \
    "https://cdn.rawgit.com/wikipathways/WpVocabularies/7a46a05/contexts/pvjs.jsonld"

_ENCODE_URI_SAFE = ";,/?:@&=+$-_.!~*'()#"


class ConversionError(Exception):
    """Raised for malformed islands; callers quarantine instead of aborting
    (the reference CLI exits the process, bin/gpml2pvjson:115-118)."""


def _encode_uri(s: str) -> str:
    return urllib.parse.quote(s, safe=_ENCODE_URI_SAFE)


def _is_burr(entity) -> bool:
    return intersects_lsv(entity.get("type"), "Burr")


def _is_edge(entity) -> bool:
    return "points" in entity


def _is_group(entity) -> bool:
    return "contains" in entity and intersects_lsv(entity.get("type"), "Group")


def _is_node(entity) -> bool:
    return entity.get("kaavioType") in ("SingleFreeNode", "Burr", "Group")


def sha256_island_id(island_text: str) -> str:
    """CLI fallback document id (bin/gpml2pvjson:99-113)."""
    digest = hashlib.sha256(island_text.encode("utf-8")).hexdigest()
    return f"hash://sha256/{digest}"


def _process_pathway_metadata(processor: Processor, parsed, pathway_iri):
    pathway = processor.pathway
    if pathway_iri:
        pathway["id"] = pathway_iri

    ns = parsed.pathway.get("_namespace")
    if ns not in processor.profile.supported_namespaces:
        raise ConversionError(f"Unsupported namespace: {ns}")

    metadata = processor.process_properties(parsed.pathway)
    if parsed.graphics:
        metadata.update(processor.process_properties(parsed.graphics))
    pathway.update(metadata)

    name = pathway.get("name", "")
    split_name = name.split(" (")
    if (len(split_name) == 2 and name.count("(") == 1
            and name.count(")") == 1):
        pathway["standardName"] = split_name[0]
        pathway["displayName"] = split_name[1].replace(")", "")
    else:
        pathway["standardName"] = name
        pathway["displayName"] = name

    context = [JSONLD_CONTEXT]
    if pathway.get("id"):
        context.append({"@base": pathway["id"] + "/"})
    else:
        organism_component = (f'&species={pathway["organism"]}'
                              if "organism" in pathway else "")
        pathway["isSimilarTo"] = _encode_uri(
            "http://wikipathways.org/index.php/Special:SearchPathways"
            f"?query={name}{organism_component}&doSearch=1")
    # @context leads the key order in the reference output
    processor.pathway = {"@context": context, **pathway}
    return processor.pathway


class _TopoAccumulator:
    """postprocessAll's {sortedIds, unsorted} accumulator with one
    sortUnsortedOnce pass per arrival (2013a/toPvjson.ts:542-637)."""

    def __init__(self, processor: Processor):
        self.processor = processor
        self.sorted_ids: list[str] = []
        self.unsorted: list[dict] = []

    def _dependencies(self, entity):
        return union_lsv(entity.get("contains"),
                         entity.get("isAttachedToOrVia"),
                         entity.get("isAttachedTo"))

    def _one_pass(self):
        sorted_set = set(self.sorted_ids)
        ready, still_unsorted = [], []
        for entity in self.unsorted:
            deps = self._dependencies(entity)
            if all(d in sorted_set for d in deps):
                ready.append(entity)
            else:
                still_unsorted.append(entity)
        for entity in ready:
            self.sorted_ids.append(entity["id"])
        self.unsorted = still_unsorted
        return bool(ready)

    def push(self, entity: dict):
        self.unsorted.append(entity)
        self._one_pass()

    def finish(self) -> list[dict]:
        i = 0
        while self.unsorted and i <= RECURSION_LIMIT:
            if not self._one_pass():
                # No progress possible; the recursive version would spin to
                # the limit — exit early with identical output.
                break
            i += 1
        ordered = [self.processor.entities_by_id[eid]
                   for eid in self.sorted_ids]
        ordered.extend(self.unsorted)  # leftover tail, unsorted
        return ordered


def _postprocess_entities(processor: Processor, ordered_entities):
    """The postprocess dispatch flatMap (2013a/toPvjson.ts:650-883)."""
    pathway = processor.pathway
    entities_by_id = processor.entities_by_id
    z_map = processor.graph_id_to_z_index

    def insert_sorted(lst, eid):
        insert_if_not_exists(eid, lst)
        return sort_by_map(z_map, lst)

    for entity in ordered_entities:
        eid = entity["id"]
        if _is_burr(entity) or (_is_edge(entity) and not _is_group(entity)):
            is_attached_to = entity.get("isAttachedTo")
            for graph_ref in arrayify(is_attached_to):
                refs = processor.graph_ids_by_graph_ref.setdefault(
                    graph_ref, [])
                if eid not in refs:
                    refs.append(eid)

            if _is_burr(entity):
                referenced = entities_by_id.get(is_attached_to)
                if referenced is None:
                    raise ConversionError(
                        f"Burr {eid} attached to missing entity "
                        f"{is_attached_to!r}")
                if _is_node(referenced):
                    attachment_display = entity["attachmentDisplay"]
                    rel_x, rel_y = attachment_display["relativeOffset"]
                    attachment_display["offset"] = [
                        rel_x * referenced["width"],
                        rel_y * referenced["height"],
                    ]
                    entity["attachmentDisplay"] = {
                        k: v for k, v in attachment_display.items()
                        if k != "relativeOffset"}
                processor.set_pvjson_entity(entity)
                burrs = referenced.setdefault("burrs", [])
                referenced["burrs"] = insert_sorted(burrs, eid)
                processor.set_pvjson_entity(referenced)
            else:
                edge = postprocess_edge_pvjson(
                    entities_by_id, entity,
                    marker_mappings=processor.profile.marker_mappings)
                pathway["contains"] = insert_sorted(pathway["contains"], eid)
                processor.set_pvjson_entity(edge)
        elif _is_group(entity):
            contained_count = len(entity.get("contains") or [])
            if contained_count == 0:
                raise ConversionError(f"Encountered empty Group: {eid}")
            if "groupRef" in entity:
                raise ConversionError(f"Encountered nested Group: {eid}")
            group_id = eid
            grouped = [entities_by_id[cid] for cid in entity["contains"]]
            grouped = [g for g in grouped if g.get("kaavioType") != "Group"]
            group = postprocess_group_pvjson(grouped, entity)
            group["contains"] = sort_by_map(z_map, [g["id"] for g in grouped])
            gx, gy = group["x"], group["y"]
            member_ids = []
            for member in grouped:
                if _is_edge(member):
                    for point in member["points"]:
                        point["x"] -= gx
                        point["y"] -= gy
                elif member.get("kaavioType") == "SingleFreeNode":
                    member["x"] -= gx
                    member["y"] -= gy
                else:
                    raise ConversionError(
                        f"Unexpected entity {member.get('id')} in group "
                        f"{group_id}")
                member["isPartOf"] = group_id
                member.pop("groupRef", None)
                processor.set_pvjson_entity(member)
                member_ids.append(member["id"])
            processor.set_pvjson_entity(group)
            remaining = [cid for cid in pathway["contains"]
                         if cid not in member_ids]
            pathway["contains"] = insert_sorted(remaining, group_id)
        else:
            processor.set_pvjson_entity(entity)
            pathway["contains"] = insert_sorted(pathway["contains"], eid)


def _process_vocab_and_citations(processor: Processor, parsed):
    pathway = processor.pathway
    for ocv_el in parsed.open_controlled_vocabularies:
        ocv = processor.process_properties_and_type(
            "openControlledVocabulary", ocv_el)
        vocabulary_name = ocv.get("ontology")
        vocabulary_iri = VOCABULARY_NAME_TO_IRI.get(vocabulary_name)
        if not vocabulary_iri:
            raise ConversionError(
                f'Unexpected name "{vocabulary_name}" for '
                f"openControlledVocabulary")
        ocv["id"] = vocabulary_iri + ocv.get("xrefIdentifier", "")
        processor.entities_by_id[ocv["id"]] = ocv
        if vocabulary_name == "Pathway Ontology":
            pathway["type"].append(ocv["id"])

    xrefs = [processor.process_properties_and_type("PublicationXref", el)
             for el in parsed.publication_xrefs]

    def _year_cmp(a, b):
        # parseInt semantics: non-numeric years compare equal (NaN)
        try:
            ya, yb = int(str(a.get("year"))[:16]), int(str(b.get("year"))[:16])
        except (TypeError, ValueError):
            return 0
        return (ya > yb) - (ya < yb)

    xrefs.sort(key=functools.cmp_to_key(_year_cmp))
    for i, xref in enumerate(xrefs):
        xref["textContent"] = str(i + 1)
        processor.entities_by_id[xref["id"]] = xref


def convert_island(island_text: str, pathway_iri: str | None = None,
                   profile=None) -> dict:
    """Convert one GPML island to {"pathway", "entitiesById"}.

    `profile` (functions/profile.py ConversionProfile) selects the schema
    version's table set; None = GPML2013a, matching the reference's
    exported GPML2013aToPVJSON plug-in (index.ts:5).
    Raises ConversionError on malformed islands (callers quarantine)."""
    if profile is None:
        from .profile import GPML2013A
        profile = GPML2013A
    try:
        parsed = parse_gpml(island_text,
                            defaults_table=profile.gpml_defaults,
                            adapter=getattr(profile, "parse_adapter", None))
    except Exception as exc:
        raise ConversionError(f"GPML parse failed: {exc}") from exc

    processor = Processor(profile=profile)
    _process_pathway_metadata(processor, parsed, pathway_iri)
    pathway = processor.pathway

    for comment_el in parsed.comments:
        pathway.setdefault("comments", []).append(
            processor.process_properties(comment_el))

    # ---- entity conversion, in the reference's stream order ----------------
    topo = _TopoAccumulator(processor)

    def emit(entity):
        processor.set_pvjson_entity(entity)
        topo.push(entity)

    # Phase A: DataNode / State / Shape / Label in document order.
    phase_a = sorted(
        [("DataNode", el) for el in parsed.data_nodes]
        + [("State", el) for el in parsed.states]
        + [("Shape", el) for el in parsed.shapes]
        + [("Label", el) for el in parsed.labels],
        key=lambda pair: pair[1].get("_docOrder", 0))
    for name, el in phase_a:
        processor.preprocess_gpml_element(el)
    for name, el in phase_a:
        if name == "DataNode":
            entity = processor.process_properties_and_type("DataNode", el)
            entity["type"] = union_lsv(entity.get("type"),
                                       entity.get("wpType"))
        elif name == "State":
            parent = processor.gpml_element_by_graph_id.get(el.get("GraphRef"))
            if parent is None:
                raise ConversionError(
                    f"State {el.get('GraphId')} references missing "
                    f"DataNode {el.get('GraphRef')!r}")
            # NOTE: the reference calls fillInGPMLPropertiesFromParent here
            # (Processor.ts:251-276) but it observably never lands: NO State
            # in any reference fixture carries a zIndex, even when its
            # parent does (the cxml sentinel on State.Graphics.ZOrder blocks
            # lodash defaultsDeep). States therefore get no zIndex.
            entity = processor.process_properties_and_type("State", el)
        elif name == "Shape":
            entity = processor.process_properties_and_type("Shape", el)
            cellular_component = entity.get("cellularComponent")
            if cellular_component:
                entity["type"] = union_lsv(
                    entity["type"], "PhysicalEntity", "CellularComponent",
                    cellular_component)
        else:
            entity = processor.process_properties_and_type("Label", el)
        emit(entity)

    # Phase B: edges then their anchors (interleaved per edge, matching the
    # synchronous pull order of the forked streams, toPvjson.ts:379-454).
    edges = sorted(
        [("Interaction", el) for el in parsed.interactions]
        + [("GraphicalLine", el) for el in parsed.graphical_lines],
        key=lambda pair: pair[1].get("_docOrder", 0))
    anchor_batches = []
    for name, el in edges:
        processor.preprocess_gpml_element(el)
        graphics = el.get("Graphics", {})
        anchors = graphics.get("Anchor") or []
        prepared = []
        for anchor in anchors:
            shape = anchor.get("Shape")
            if shape == "None":
                if anchor.get("GraphId"):
                    anchor.setdefault("Graphics", {}).update(
                        {"Height": 0, "Width": 0})
                else:
                    anchor["Shape"] = "Rectangle"
                    anchor.setdefault("Graphics", {}).update(
                        {"Height": 4, "Width": 4})
            elif shape == "Circle":
                anchor.setdefault("Graphics", {}).update(
                    {"Height": 8, "Width": 8})
            else:
                raise ConversionError(
                    f'Anchor Shape "{shape}" is not supported.')
            processor.preprocess_gpml_element(anchor)
            # anchors keep their own XSD-default ZOrder (12288, see
            # mappings.GPML_DEFAULTS) — the parent fill-in never lands in
            # the reference either (interactions.json: anchors stay 12288
            # under edges with explicit different ZOrder)
            anchor["GraphRef"] = el["GraphId"]
            prepared.append(anchor)
        anchor_batches.append(prepared)

    for (name, el), anchors in zip(edges, anchor_batches):
        preprocess_edge_gpml(el)
        emit(processor.process_properties_and_type(name, el))
        for anchor in anchors:
            emit(processor.process_properties_and_type("Anchor", anchor))

    # Phase C: groups (style defaults applied, empty groups dropped,
    # toPvjson.ts:456-465).
    for group_el in parsed.groups:
        preprocess_group_gpml(processor, group_el)
        if not group_el.get("Contains"):
            continue
        emit(processor.process_gpml_and_properties_and_type("Group",
                                                            group_el))

    # ---- ordering barrier + postprocess dispatch ---------------------------
    ordered = topo.finish()
    _postprocess_entities(processor, ordered)

    _process_vocab_and_citations(processor, parsed)

    pathway = processor.pathway
    # JS JSON.stringify drops undefined values (e.g. id when no IRI given)
    processor.pathway = {k: v for k, v in pathway.items() if v is not None}
    return {"pathway": processor.pathway,
            "entitiesById": processor.entities_by_id}
