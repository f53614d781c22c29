"""(subj, pred, obj) triple emission from a converted pvjson document.

Derived rule set (SURVEY.md §2.9) over the reference's edge-type tables:
  * per postprocessed edge: (source, wpInteractionType ∨ biopaxType, target)
    with roles assigned per pvjsonToBioPAX/Interaction.ts:203-232; role
    triples for controller/controlled and left/right
  * per node with an xref: (graphId, hasXref, "<DataSource>:<ID>")
    (Processor.ts:381-386) and (graphId, rdf:type, <BioPAX class>)
    (PvjsonToBioPAX.json:8-15)
  * per group member: (member, isPartOf, group) (2013a/toPvjson.ts:835)
  * per burr: (burr, isAttachedTo, parent) (2013a/toPvjson.ts:680-710)
  * per citation link: (entity, cites, publicationXref id)

Each triple carries provenance: the pathway id and the entity that produced
it. Output is a list of plain dicts (columnar assembly happens in the Ray
stage)."""

from __future__ import annotations

from copy import deepcopy

from .biopax import assign_group_biopax_type, assign_interaction_roles
from .jsonld import arrayify


def _pred_for_edge(edge) -> str:
    return edge.get("wpInteractionType") or edge.get("biopaxType") \
        or "Interaction"


def emit_triples(pvjson: dict, url: str = "",
                 copy_entities: bool = True) -> list[dict]:
    """pvjson {pathway, entitiesById} → triple dicts.

    copy_entities=False skips the defensive deepcopy (role assignment
    mutates edge/controlled entities); pass it when the caller owns the
    dict, e.g. fresh from json.loads in the Ray stage hot path."""
    pathway = pvjson["pathway"]
    entities_by_id = pvjson["entitiesById"]
    pathway_id = pathway.get("id") or ""
    triples: list[dict] = []

    # graphId → "DataSource:ID" for entity-linking downstream (the linker
    # actor pool canonicalizes these against the broadcast xref dictionary)
    xref_by_id = {
        eid: f'{e["xrefDataSource"]}:{e["xrefIdentifier"]}'
        for eid, e in entities_by_id.items()
        if e.get("xrefDataSource") and e.get("xrefIdentifier")
    }

    def emit(subj, pred, obj, entity_id, **extra):
        if not subj or not obj or subj == obj is None:
            return
        t = {"subj": str(subj), "pred": str(pred), "obj": str(obj),
             "url": url, "pathway_id": pathway_id,
             "entity_id": str(entity_id),
             "subj_xref": xref_by_id.get(subj, ""),
             "obj_xref": xref_by_id.get(obj, ""),
             # node flags drive canonicalization: only graph-id endpoints
             # get the doc-scoped fallback id; literals (classes, xref
             # strings, citation ids) pass through untouched
             "subj_is_node": subj in entities_by_id,
             "obj_is_node": obj in entities_by_id}
        if pred == "hasXref":
            t["obj_xref"] = str(obj)
        t.update(extra)
        triples.append(t)

    # role assignment mutates edges/controlled entities → copy unless the
    # caller owns the dict
    enriched = deepcopy(entities_by_id) if copy_entities else entities_by_id
    for eid, entity in enriched.items():
        if "points" in entity and entity.get("kaavioType") == "Edge":
            assign_interaction_roles(enriched, entity)

    for eid, entity in enriched.items():
        kaavio_type = entity.get("kaavioType")
        gpml_name = entity.get("gpmlElementName")

        # xref triples
        xref_ds = entity.get("xrefDataSource")
        xref_id = entity.get("xrefIdentifier")
        if xref_ds and xref_id:
            emit(eid, "hasXref", f"{xref_ds}:{xref_id}", eid)

        # node typing triples
        wp_type = entity.get("wpType")
        if wp_type:
            from .mappings import PVJSON_TO_BIOPAX
            biopax_class = PVJSON_TO_BIOPAX.get(wp_type)
            if biopax_class:
                emit(eid, "rdf:type", biopax_class, eid)

        # group typing (pvjsonToBioPAX/Group.ts:16-42): contains an
        # edge ⇒ Pathway, else Complex — groups carry no wpType, so
        # this is their only rdf:type source
        if kaavio_type == "Group":
            members = [enriched.get(cid)
                       for cid in (entity.get("contains") or [])]
            assign_group_biopax_type([m for m in members if m], entity)
            group_class = ("Pathway" if "Pathway" in (entity["type"] or [])
                           else "Complex")
            emit(eid, "rdf:type", group_class, eid)

        # burr attachment
        if kaavio_type == "Burr":
            parent = entity.get("isAttachedTo")
            if parent:
                emit(eid, "isAttachedTo", parent, eid)

        # group membership
        if entity.get("isPartOf"):
            emit(eid, "isPartOf", entity["isPartOf"], eid)

        # citations
        for citation in arrayify(entity.get("citations")):
            emit(eid, "cites", citation, eid)

        # edge triples
        if kaavio_type == "Edge" and gpml_name == "Interaction":
            pred = _pred_for_edge(entity)
            if "controller" in entity and "controlled" in entity:
                emit(entity["controller"], pred, entity["controlled"], eid,
                     biopax_type=entity.get("biopaxType"),
                     control_type=entity.get("controlType"))
            elif "left" in entity and "right" in entity:
                emit(entity["left"], pred, entity["right"], eid,
                     biopax_type=entity.get("biopaxType"),
                     conversion_direction=entity.get("conversionDirection"))
            elif isinstance(entity.get("participants"), list) \
                    and len(entity["participants"]) == 2:
                emit(entity["participants"][0], pred,
                     entity["participants"][1], eid,
                     biopax_type=entity.get("biopaxType"))

    return triples
