"""Group preprocessing (style defaults) and bbox aggregation.

Re-expresses /root/reference/src/group.ts:28-191.
"""

from __future__ import annotations

import math

from .jsonld import union_lsv
from .mappings import GROUP_MAPPINGS_BY_STYLE


def is_pvjson_edge(entity: dict) -> bool:
    return "points" in entity


def is_pvjson_single_free_node(entity: dict) -> bool:
    return entity.get("kaavioType") == "SingleFreeNode"


def preprocess_group_gpml(processor, group: dict) -> dict:
    """Apply per-Style defaults (group.ts:153-181): dict values shallow-assign
    with the style winning; the style's `type` list unions with any existing;
    scalars only fill when absent. Then resolve Contains."""
    style = group.get("Style", "None")
    table = getattr(getattr(processor, "profile", None),
                    "group_mappings_by_style", None)
    if table is None:
        table = GROUP_MAPPINGS_BY_STYLE
    mappings = table.get(style, {})
    for mapping_key, mapping_value in mappings.items():
        old_value = group.get(mapping_key)
        if isinstance(mapping_value, dict):
            new_value = dict(old_value or {})
            new_value.update(mapping_value)
        elif mapping_key in group:
            if isinstance(mapping_value, list):
                new_value = union_lsv(mapping_value, old_value)
            else:
                new_value = old_value
        else:
            new_value = mapping_value
        group[mapping_key] = new_value
    group["Contains"] = processor.contained_graph_ids_by_group_group_id.get(
        group.get("GroupId"))
    return group


def get_group_dimensions(padding, stroke_width, contained_entities) -> dict:
    """min/max fold over members; edges contribute first/last points, nodes
    contribute their box; plus padding+strokeWidth margin and the min zIndex
    (group.ts:28-150). Non-finite results raise."""
    if not contained_entities:
        return {"x": 0, "y": 0, "width": 0, "height": 0, "zIndex": 0}
    if not _finite(padding):
        raise ValueError(f"Invalid padding value: {padding}")
    if not _finite(stroke_width):
        raise ValueError(f"Invalid strokeWidth value: {stroke_width}")

    tl_x = tl_y = math.inf
    br_x = br_y = 0.0
    z_index = math.inf
    dims: dict = {}
    for entity in contained_entities:
        if not (is_pvjson_single_free_node(entity) or is_pvjson_edge(entity)):
            continue
        z = entity.get("zIndex")
        if _finite(z):
            z_index = z if not _finite(z_index) else min(z, z_index)
        if is_pvjson_edge(entity):
            points = entity["points"]
            first, last = points[0], points[-1]
            tl_x = min(tl_x, first["x"], last["x"])
            tl_y = min(tl_y, first["y"], last["y"])
            br_x = max(br_x, first["x"], last["x"])
            br_y = max(br_y, first["y"], last["y"])
        else:
            tl_x = min(tl_x, entity["x"])
            tl_y = min(tl_y, entity["y"])
            br_x = max(br_x, entity["x"] + entity["width"])
            br_y = max(br_y, entity["y"] + entity["height"])
        dims = {
            "x": tl_x - padding - stroke_width,
            "y": tl_y - padding - stroke_width,
            "width": br_x - tl_x + 2 * (padding + stroke_width),
            "height": br_y - tl_y + 2 * (padding + stroke_width),
            "zIndex": z_index,
        }

    non_finites = {k: v for k, v in dims.items() if not _finite(v)}
    if non_finites or not dims:
        raise ValueError(
            f"Got non-finite value(s) {non_finites} in get_group_dimensions")
    return dims


def postprocess_group_pvjson(contained_entities, group: dict) -> dict:
    """group.ts:183-191."""
    group.update(get_group_dimensions(group.get("padding"),
                                      group.get("strokeWidth"),
                                      contained_entities))
    return group


def _finite(x) -> bool:
    try:
        return x is not None and math.isfinite(x)
    except TypeError:
        return False
