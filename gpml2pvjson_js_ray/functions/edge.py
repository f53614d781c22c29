"""Edge pre/postprocessing: marker capture, point attachment resolution,
orientation/offset scalars, implicit-point synthesis dispatch.

Re-expresses /root/reference/src/edge/edge.ts:30-383.
"""

from __future__ import annotations

import math

from .calculate_points import calculate_all_points
from .jsonld import union_lsv
from .mappings import MARKER_MAPPINGS


def is_attachable_point(point: dict) -> bool:
    return "attachmentDisplay" in point


def is_gpml_anchor(entity) -> bool:
    return bool(entity) and entity.get("gpmlElementName") == "Anchor"


def _is_node_like(entity) -> bool:
    return entity.get("kaavioType") in ("SingleFreeNode", "Group", "Burr")


def preprocess_edge_gpml(edge: dict) -> dict:
    """Collect Point GraphRefs into isAttachedToOrVia (edge/edge.ts:92-106)."""
    points = edge.get("Graphics", {}).get("Point", []) or []
    attached = [p["GraphRef"] for p in points if p.get("GraphRef")]
    if attached:
        edge["isAttachedToOrVia"] = attached
    return edge


def _offset_and_orientation_scalars(position_scalar, relative_offset_scalar,
                                    axis, referenced_entity):
    """edge/edge.ts:40-84."""
    size = referenced_entity["width"] if axis == "x" \
        else referenced_entity["height"]
    offset_scalar = relative_offset_scalar * size
    if not math.isfinite(offset_scalar):
        raise ValueError(
            f"Got non-finite offsetScalar {offset_scalar} along {axis} axis")
    if position_scalar == 0:
        orientation_scalar = -1
    elif position_scalar == 1:
        orientation_scalar = 1
    else:
        orientation_scalar = 0
    return offset_scalar, orientation_scalar


def postprocess_edge_pvjson(referenced_entities: dict, edge: dict,
                            marker_mappings: dict | None = None) -> dict:
    """edge/edge.ts:115-383 — resolve point attachments, set markers and
    marker-derived types, compute orientations, synthesize implicit points
    for Elbow/Curved, and set edge-level isAttachedTo.

    marker_mappings overrides the profile's marker→type table; None =
    GPML2013a MarkerMappings."""
    mm = MARKER_MAPPINGS if marker_mappings is None else marker_mappings
    points = edge["points"]
    point_count = len(points)
    draw_as = edge.get("drawAs")
    edge_is_attached_to = []

    provided_points = []
    for index, point in enumerate(points):
        marker = point.get("marker")
        if marker:
            if index == 0:
                edge["markerStart"] = marker
            elif index == point_count - 1:
                edge["markerEnd"] = marker
            if marker in mm:
                for _, more_types in mm[marker].items():
                    edge["type"] = union_lsv(edge["type"], more_types)

        if is_attachable_point(point):
            attachment_display = point["attachmentDisplay"]
            if "offset" not in attachment_display:
                raise ValueError(
                    "attachmentDisplay for a Point has no offset property")
            is_attached_to = point.get("isAttachedTo")
            entity_referenced_by_point = (
                referenced_entities.get(is_attached_to)
                if is_attached_to else None)
            if entity_referenced_by_point is None:
                raise ValueError(
                    f"Point references missing entity {is_attached_to!r}")

            if is_gpml_anchor(entity_referenced_by_point):
                entity_id_referenced_by_edge = \
                    entity_referenced_by_point["isAttachedTo"]
            else:
                entity_id_referenced_by_edge = entity_referenced_by_point["id"]
            edge_is_attached_to.append(entity_id_referenced_by_edge)
            entity_referenced_by_edge = referenced_entities.get(
                entity_id_referenced_by_edge)

            orientation = point.setdefault("orientation", [])

            if entity_referenced_by_edge is not None and \
                    _is_node_like(entity_referenced_by_edge):
                position = attachment_display["position"]
                relative_offset = attachment_display.get(
                    "relativeOffset", [0, 0])
                off_x, orient_x = _offset_and_orientation_scalars(
                    position[0], relative_offset[0], "x",
                    entity_referenced_by_edge)
                off_y, orient_y = _offset_and_orientation_scalars(
                    position[1], relative_offset[1], "y",
                    entity_referenced_by_edge)
                if index == 0:
                    orientation[:] = [orient_x, orient_y]
                else:
                    orientation[:] = [-1 * orient_x, -1 * orient_y]
                attachment_display["offset"] = [off_x, off_y]
                attachment_display.pop("relativeOffset", None)
            elif is_gpml_anchor(entity_referenced_by_point):
                # edge connected to another edge via an anchor
                attachment_display["position"] = \
                    entity_referenced_by_point["attachmentDisplay"]["position"]
            else:
                raise ValueError("Edge or Point attached to unexpected entity")
            # NOTE: the orientation key stays even when empty (an
            # anchor-attached point on a straight edge keeps []), matching
            # edge/edge.ts:184-185.

        new_point = {k: v for k, v in point.items() if k != "marker"}
        provided_points.append(new_point)

    if edge_is_attached_to:
        edge["isAttachedTo"] = edge_is_attached_to

    if draw_as in ("StraightLine", "SegmentedLine"):
        all_points = provided_points
    elif draw_as in ("ElbowLine", "CurvedLine"):
        source_entity = None
        target_entity = None
        if len(edge_is_attached_to) == 2:
            source_entity = referenced_entities.get(edge_is_attached_to[0])
            target_entity = referenced_entities.get(edge_is_attached_to[1])
        elif len(edge_is_attached_to) == 1:
            if "isAttachedTo" in provided_points[0]:
                source_entity = referenced_entities.get(edge_is_attached_to[0])
            elif "isAttachedTo" in provided_points[-1]:
                target_entity = referenced_entities.get(edge_is_attached_to[0])
            else:
                raise ValueError(
                    f'edge "{edge.get("id")}" is attached but neither first '
                    f'nor last point has isAttachedTo')
        all_points = calculate_all_points(provided_points, source_entity,
                                          target_entity)
    else:
        raise ValueError(f'Unknown edge drawer "{draw_as}"')

    edge["points"] = all_points
    edge.pop("isAttachedToOrVia", None)
    return edge
