"""Implicit waypoint synthesis for Elbow/Curved edges + hyperedge
orientation scoring.

Re-expresses /root/reference/src/edge/calculateAllPoints.ts:75-406 and
/root/reference/src/edge/orientation.ts:30-181. PathVisio only records the
first and last points of an Elbow/Curved edge unless the user dragged a
waypoint; the renderer needs every point, so the implicit ones are computed
from the two endpoint orientations (which side of the node each end leaves).
"""

from __future__ import annotations

import math

from .angle import distance
from .geometry import (START_SEGMENT_DETAILS_MAPS, flip_orientation,
                       get_start_side_by_orientation, path_position,
                       same_side, validate_orientation, vector_sum_angle)

DEFAULT_STUB_LENGTH = 20  # edge/edge.ts:30

_INDEX_TO_DIMENSION = ["x", "y"]


def _sign(x):
    return (x > 0) - (x < 0)


def _active_orientation(orientation):
    """(active index, active dim, other dim) (calculateAllPoints.ts:39-52)."""
    idx = next((i for i, s in enumerate(orientation) if s != 0), -1)
    active = _INDEX_TO_DIMENSION[idx]
    other = "y" if active == "x" else "x"
    return idx, active, other


def get_orientation_of_hyperedge_start_point(referenced_edge, start_point,
                                             end_point):
    """Orientation of an edge start point attached (via anchor) to another
    edge: candidate sides scored by (same-side, perpendicularity to the
    referenced edge's tangent, alignment with the current edge direction)
    (edge/orientation.ts:30-173)."""
    if not referenced_edge:
        raise ValueError(
            "Missing referencedEdge when calculating orientation of point "
            "attached to other edge.")

    angle_of_current_vector_sum = vector_sum_angle(start_point, end_point)
    ref_points = referenced_edge["points"]
    angle_at_point = path_position(
        ref_points, start_point["attachmentDisplay"]["position"][0],
        draw_as=referenced_edge.get("drawAs"))[2]

    candidates = []
    for detail in START_SEGMENT_DETAILS_MAPS:
        ox, oy = detail["orientation"]
        first_segment_end = {
            "x": start_point["x"] + DEFAULT_STUB_LENGTH * ox,
            "y": start_point["y"] + DEFAULT_STUB_LENGTH * oy,
        }
        emanation_angle = detail["angle"]
        is_same_side = same_side(ref_points[0], ref_points[-1],
                                 first_segment_end, end_point)
        angle_to_current = distance(emanation_angle,
                                    angle_of_current_vector_sum)
        angle_to_ref = distance(angle_at_point, emanation_angle)
        candidates.append({
            "isSameSide": is_same_side,
            "toCurrent": angle_to_current,
            "toPerpendicular": abs(angle_to_ref - math.pi / 2),
            "orientation": list(detail["orientation"]),
        })

    # Quantize the angular scores before comparing: the reference resolves
    # ill-conditioned ties (candidates whose scores agree to ~1e-16, e.g. a
    # point attached to a nearly-vertical edge in WP2211) by its stable
    # sort over candidate order, and sub-picoradian score differences are
    # float noise from the tangent computation, not signal. 12 decimals
    # keeps every real ordering decision while making the tie-break follow
    # START_SEGMENT_DETAILS_MAPS order exactly as the reference does
    # (edge/orientation.ts:117-152; verified field-exact across all 13 WP
    # fixtures including both WP2211 hyperedges).
    candidates.sort(key=lambda c: (not c["isSameSide"],
                                   round(c["toPerpendicular"], 12),
                                   round(c["toCurrent"], 12)))
    return candidates[0]["orientation"]


def get_orientation_of_hyperedge_end_point(referenced_edge, end_point,
                                           start_point):
    """Same scoring, flipped (edge/orientation.ts:178-181)."""
    return flip_orientation(get_orientation_of_hyperedge_start_point(
        referenced_edge, end_point, start_point))


def calculate_all_points(explicit_points, source_entity=None,
                         target_entity=None):
    """Given ≤2 explicit points (or more, passed through) with endpoint
    orientations, synthesize the implicit intermediate points for
    Elbow/Curved edges (calculateAllPoints.ts:75-406)."""
    first_point = explicit_points[0]
    last_point = explicit_points[-1]

    if not validate_orientation(first_point.get("orientation")):
        if "isAttachedTo" in first_point:
            first_point["orientation"] = get_orientation_of_hyperedge_start_point(
                source_entity, first_point, last_point)
        else:
            first_point["orientation"] = [-1, 0]

    if not validate_orientation(last_point.get("orientation")):
        if "isAttachedTo" in last_point:
            last_point["orientation"] = get_orientation_of_hyperedge_end_point(
                target_entity, last_point, first_point)
        else:
            x0, y0 = first_point["x"], first_point["y"]
            x1 = last_point["x"]
            first_side = get_start_side_by_orientation(
                first_point["orientation"])
            if first_side == "left":
                if x0 >= x1 and x0 < x1 + DEFAULT_STUB_LENGTH:
                    last_point["orientation"] = [1, 0]
                else:
                    last_point["orientation"] = [-1, 0]
            elif first_side == "right":
                if x0 + DEFAULT_STUB_LENGTH <= x1:
                    last_point["orientation"] = [1, 0]
                else:
                    last_point["orientation"] = [-1, 0]
            else:
                last_point["orientation"] = [-1, 0]

    if len(explicit_points) > 2:
        return explicit_points

    if validate_orientation(first_point.get("orientation")):
        point_order_reversed = False
        start_point, end_point = first_point, last_point
    elif validate_orientation(last_point.get("orientation")):
        point_order_reversed = True
        start_point, end_point = last_point, first_point
    else:
        raise ValueError(
            "Either first or last point (or both) should have a valid "
            "orientation by now in calculate_all_points")

    start_orientation = start_point["orientation"]
    end_orientation = end_point["orientation"]

    vector_sum_orientation = [
        _sign(end_point["x"] - start_point["x"]),
        _sign(end_point["y"] - start_point["y"]),
    ]

    a_idx, a_dim, o_dim = _active_orientation(start_orientation)
    e_idx, e_dim, eo_dim = _active_orientation(end_orientation)

    pvjson_points = [start_point]

    if a_idx == e_idx:
        # parallel start/end orientations (calculateAllPoints.ts:220-325)
        displacement = end_point[o_dim] - start_point[o_dim]
        if start_orientation[a_idx] == vector_sum_orientation[a_idx]:
            # no need to route around the start side
            p1 = {}
            p1[o_dim] = start_point[o_dim] + displacement / 2
            if start_orientation[a_idx] == end_orientation[a_idx]:
                p1[a_dim] = (start_point[a_dim]
                             + start_orientation[a_idx] * DEFAULT_STUB_LENGTH)
            else:
                p1[a_dim] = (end_point[a_dim]
                             - end_orientation[e_idx] * DEFAULT_STUB_LENGTH)
            pvjson_points.append(p1)
        else:
            # must initially route around the start side
            if start_orientation[a_idx] == end_orientation[a_idx]:
                p1 = {
                    a_dim: (start_point[a_dim]
                            + start_orientation[a_idx] * DEFAULT_STUB_LENGTH),
                    o_dim: start_point[o_dim] + displacement / 4,
                }
                p2 = {
                    a_dim: (start_point[a_dim] + end_point[a_dim]) / 2,
                    o_dim: start_point[o_dim] + displacement / 2,
                }
                p3 = {
                    a_dim: (end_point[a_dim]
                            - end_orientation[e_idx] * DEFAULT_STUB_LENGTH),
                    o_dim: start_point[o_dim] + 3 * displacement / 4,
                }
                pvjson_points.extend([p1, p2, p3])
            else:
                p1 = {
                    a_dim: (start_point[a_dim]
                            + start_orientation[a_idx] * DEFAULT_STUB_LENGTH),
                    o_dim: start_point[o_dim] + displacement / 2,
                }
                pvjson_points.append(p1)
    else:
        # perpendicular start/end orientations (calculateAllPoints.ts:326-401)
        if (start_orientation[a_idx] == vector_sum_orientation[a_idx]
                and end_orientation[e_idx] == vector_sum_orientation[e_idx]):
            pass  # single corner implied by the two stubs; no extra points
        else:
            other_start_displacement = (
                end_point[o_dim]
                - end_orientation[e_idx] * DEFAULT_STUB_LENGTH
                - start_point[o_dim])
            p1 = {
                a_dim: (start_point[a_dim]
                        + start_orientation[a_idx] * DEFAULT_STUB_LENGTH),
                o_dim: start_point[o_dim] + other_start_displacement / 2,
            }
            pvjson_points.append(p1)
            p2 = {
                e_dim: (end_point[e_dim]
                        - end_orientation[e_idx] * DEFAULT_STUB_LENGTH),
                eo_dim: (p1[eo_dim] + end_point[eo_dim]) / 2,
            }
            pvjson_points.append(p2)

    pvjson_points.append(end_point)
    return list(reversed(pvjson_points)) if point_order_reversed \
        else pvjson_points
