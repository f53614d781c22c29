"""BioPAX interaction typing / role assignment.

Re-expresses /root/reference/src/pvjsonToBioPAX/Interaction.ts:94-276:
direction from markerStart vs markerEnd; plain "Arrow" disambiguated by
source/target BioPAX classes; roles assigned per biopaxType
(participants | controller/controlled | left/right + conversionDirection);
invalid Catalysis downgraded to generic Interaction.

Operates on a *converted* pvjson entity map; used by the triple emitter
(the pvjson document output itself does not carry roles, matching the
reference where this pass lives in a separate converter).
"""

from __future__ import annotations

from .jsonld import intersects_lsv, union_lsv
from .mappings import (ARROW_HEAD_MAPPINGS, BIOPAX_NODE_TYPES,
                       BIOPAX_PHYSICAL_ENTITY_TYPES, PVJSON_TO_BIOPAX)


def _biopax_types_of(entity) -> list:
    return [PVJSON_TO_BIOPAX[t] for t in (entity.get("type") or [])
            if t in PVJSON_TO_BIOPAX]


# /root/reference/src/pvjsonToBioPAX/Group.ts:9-14 — static style table
GPML2013A_GROUP_STYLE_TO_BIOPAX = {
    "None": "Pathway",
    "Group": "Pathway",
    "Complex": "Complex",
    "Pathway": "Pathway",
}


def assign_group_biopax_type(contained_entities: list, group: dict) -> dict:
    """BioPAX-compliant group typing
    (/root/reference/src/pvjsonToBioPAX/Group.ts:16-42): BioPAX knows
    only two group classes — a group that contains an edge (an entity
    with `points`, gpml-utilities.ts:91-93 isPvjsonEdge) is a Pathway,
    otherwise a Complex. Union the winner into `group["type"]` and
    filter the loser out. Mutates and returns `group`. Lives in the
    triple-emission pass, not the pvjson conversion, matching where
    the reference applies it (the pvjson fixtures are unaffected)."""
    contains_edge = any("points" in e for e in contained_entities
                        if isinstance(e, dict))
    winner, loser = (("Pathway", "Complex") if contains_edge
                     else ("Complex", "Pathway"))
    group["type"] = [t for t in union_lsv(group.get("type"), winner)
                     if t != loser]
    return group


def _convert_conversion_to_generic(conversion: dict) -> dict:
    left, right = conversion.get("left"), conversion.get("right")
    for key in ("left", "right", "conversionDirection", "sboInteractionType",
                "wpInteractionType"):
        conversion.pop(key, None)
    conversion["type"] = ["Interaction"]
    conversion["participants"] = [left, right]
    return conversion


def _convert_catalysis_to_generic(catalysis: dict) -> dict:
    controlled = catalysis.get("controlled")
    controller = catalysis.get("controller")
    for key in ("controlled", "controller", "interactionType"):
        catalysis.pop(key, None)
    catalysis["type"] = ["Interaction"]
    catalysis["participants"] = [controlled, controller]
    return catalysis


def assign_interaction_roles(referenced_entities: dict,
                             interaction: dict) -> dict:
    """Mutates and returns `interaction` with biopaxType/controlType/roles."""
    points = interaction.get("points") or []
    if not points:
        return interaction

    if interaction.get("markerStart"):
        marker = interaction["markerStart"]
        # graphical start marker means the logical source is the LAST point
        source_id = points[-1].get("isAttachedTo")
        target_id = points[0].get("isAttachedTo")
    elif interaction.get("markerEnd"):
        marker = interaction["markerEnd"]
        source_id = points[0].get("isAttachedTo")
        target_id = points[-1].get("isAttachedTo")
    else:
        marker = "none"
        source_id = points[0].get("isAttachedTo")
        target_id = points[-1].get("isAttachedTo")

    if not source_id or not target_id:
        # unconnected interaction: no roles
        return interaction

    source_node = referenced_entities.get(source_id)
    target_node = referenced_entities.get(target_id)
    if source_node is None or target_node is None:
        return interaction

    if marker == "Arrow":
        source_is_edge = "points" in source_node
        target_is_edge = "points" in target_node
        source_is_pe = intersects_lsv(BIOPAX_PHYSICAL_ENTITY_TYPES,
                                      _biopax_types_of(source_node))
        target_is_pe = intersects_lsv(BIOPAX_PHYSICAL_ENTITY_TYPES,
                                      _biopax_types_of(target_node))
        source_is_pe_or_pathway = source_is_pe or intersects_lsv(
            "Pathway", source_node.get("type"))
        target_is_pe_or_pathway = target_is_pe or intersects_lsv(
            "Pathway", target_node.get("type"))
        if source_is_pe and target_is_pe:
            marker = "mim-conversion"
        elif ((source_is_edge and target_is_pe_or_pathway)
              or (source_is_pe_or_pathway and target_is_edge)):
            marker = "mim-stimulation"

    identifier_mappings = ARROW_HEAD_MAPPINGS.get(marker)
    biopax_type = None
    if identifier_mappings:
        biopax_mappings = identifier_mappings.get("bp") or {}
        if biopax_mappings.get("name"):
            biopax_type = interaction["biopaxType"] = biopax_mappings["name"]
            if biopax_mappings.get("controlType"):
                interaction["controlType"] = biopax_mappings["controlType"]
        if identifier_mappings.get("wp"):
            interaction["wpInteractionType"] = identifier_mappings["wp"]
        if identifier_mappings.get("sbo"):
            interaction["sboInteractionType"] = identifier_mappings["sbo"]
        interaction["type"] = union_lsv(
            interaction.get("type"), biopax_type,
            identifier_mappings.get("wp"), identifier_mappings.get("sbo"))

    if intersects_lsv(["Interaction", "MolecularInteraction"], biopax_type):
        interaction["participants"] = [source_id, target_id]
    elif intersects_lsv(["Control", "Catalysis"], biopax_type):
        interaction["controller"] = source_id
        interaction["controlled"] = target_id
    elif intersects_lsv(["Conversion", "BiochemicalReaction", "Degradation"],
                        biopax_type):
        if interaction.get("markerStart") and interaction.get("markerEnd"):
            interaction["conversionDirection"] = "REVERSIBLE"
        else:
            interaction["conversionDirection"] = "LEFT-TO-RIGHT"
        interaction["left"] = source_id
        interaction["right"] = target_id
    else:
        interaction["participants"] = [source_id, target_id]

    if intersects_lsv(interaction.get("type"), "Catalysis"):
        controlled = referenced_entities.get(interaction.get("controlled"))
        controller = referenced_entities.get(interaction.get("controller"))
        if controller is not None and not intersects_lsv(
                BIOPAX_NODE_TYPES, _biopax_types_of(controller)):
            _convert_catalysis_to_generic(interaction)
        if (controlled is not None
                and intersects_lsv("Catalysis", interaction.get("type"))
                and intersects_lsv("Interaction", controlled.get("type"))):
            controlled["type"] = union_lsv(controlled.get("type"),
                                           "Conversion")
            participants = controlled.get("participants")
            if isinstance(participants, list) and len(participants) >= 2:
                controlled["left"] = participants[0]
                controlled["right"] = participants[1]
                controlled.pop("participants", None)
            else:
                _convert_conversion_to_generic(controlled)
                _convert_catalysis_to_generic(interaction)

    return interaction
