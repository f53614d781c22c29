"""GPML attribute → pvjson value converters.

Each converter receives the *containing element dict* (not the raw value),
exactly like the reference's ValueConverters (2013a/ValueConverters.ts) which
are keyed by GPML attribute name and read what they need off the element.
Registry is built at module bottom.
"""

from __future__ import annotations

import html
import math
import urllib.parse

from .angle import normalize, radians_to_degrees
from .colors import gpml_color_to_css_color

# Rotation side keywords → radians (2013a/ValueConverters.ts:31-36)
GPML_ROTATION_SIDE_TO_RAD = {
    "Top": 0.0,
    "Right": 0.5 * math.pi,
    "Bottom": math.pi,
    "Left": (3.0 / 2.0) * math.pi,
}


def generate_publication_xref_id(original_id: str) -> str:
    """gpml-utilities.ts:36-38 — rdf:id values and GraphIds are not disjoint
    namespaces (WP306), so citation ids get a prefix."""
    return "publicationXref" + str(original_id)


def decode_if_not_empty(value):
    """he.decode stand-in: HTML-entity decode non-empty strings
    (2013a/ValueConverters.ts:38-40)."""
    if value is None or value == "":
        return value
    if isinstance(value, str):
        return html.unescape(value)
    return value


def _parse_non_nan_number(v):
    parsed = float(v)
    if math.isnan(parsed):
        raise ValueError(f'Cannot parse "{v}" as non-NaN number')
    return parsed


# --- xref / citation field converters (2013a/ValueConverters.ts:61-107) ----

def conv_ID(el):
    if "ID" in el:
        ID = el["ID"]
        return ID if isinstance(ID, str) else ID.get("content")
    return el["Xref"]["ID"]


def conv_dollar_ID(el):
    return generate_publication_xref_id(el.get("$ID"))


def _content_of(el, key):
    v = el.get(key)
    if isinstance(v, dict):
        return v.get("content")
    return v


def conv_DB(el):
    return decode_if_not_empty(_content_of(el, "DB"))


def conv_TITLE(el):
    return decode_if_not_empty(_content_of(el, "TITLE"))


def conv_SOURCE(el):
    return decode_if_not_empty(_content_of(el, "SOURCE"))


def conv_YEAR(el):
    return _content_of(el, "YEAR")


def conv_AUTHORS(el):
    return [decode_if_not_empty(a.get("content") if isinstance(a, dict) else a)
            for a in el.get("AUTHORS", [])]


def conv_BiopaxRef(el):
    return [generate_publication_xref_id(ref) for ref in el.get("BiopaxRef", [])]


# --- geometry converters (2013a/ValueConverters.ts:166-222) ----------------

def _has_double_line(el) -> bool:
    for attr in el.get("Attribute", []) or []:
        if attr.get("Key") == "org.pathvisio.DoubleLineProperty":
            return True
    return False


def _dimension(name, el):
    dim = el["Graphics"][name]
    if _has_double_line(el):
        return dim + conv_LineThickness(el)
    return dim


def conv_Height(el):
    return _dimension("Height", el)


def conv_Width(el):
    return _dimension("Width", el)


def conv_CenterX(el):
    return el["Graphics"]["CenterX"] - conv_Width(el) / 2


def conv_CenterY(el):
    return el["Graphics"]["CenterY"] - conv_Height(el) / 2


def conv_Rotation(el):
    """GPML radians (or side keyword) → normalized degrees [0, 360)
    (2013a/ValueConverters.ts:191-222)."""
    graphics = el["Graphics"]
    rotation = graphics.get("Rotation")
    if rotation is None:
        rotation = 0
    if isinstance(rotation, str) and rotation in GPML_ROTATION_SIDE_TO_RAD:
        rad = GPML_ROTATION_SIDE_TO_RAD[rotation]
    else:
        rad = _parse_non_nan_number(rotation)
    return _normalize_number(radians_to_degrees(normalize(rad)))


def _normalize_number(x):
    """Match JS JSON output: integral floats serialize as ints."""
    if isinstance(x, float) and x.is_integer() and abs(x) < 2**53:
        return int(x)
    return x


def conv_LineStyle(el):
    ls = el["Graphics"].get("LineStyle")
    if ls == "Solid":
        return None  # omitted from output
    if ls == "Broken":
        return "5,3"
    raise ValueError(f"Unrecognized LineStyle: {ls}")


# --- decoded string attrs (2013a/ValueConverters.ts:240-264) ---------------

def conv_Author(el):
    return decode_if_not_empty(el.get("Author"))


def conv_DataSource(el):
    return decode_if_not_empty(el.get("Data-Source"))


def conv_Email(el):
    return decode_if_not_empty(el.get("Email"))


def conv_Maintainer(el):
    return decode_if_not_empty(el.get("Maintainer"))


def conv_Name(el):
    return decode_if_not_empty(el.get("Name"))


def conv_TextLabel(el):
    return decode_if_not_empty(el.get("TextLabel"))


# --- font / text attrs (2013a/ValueConverters.ts:270-306) ------------------

def _text_decoration(el):
    g = el["Graphics"]
    font_decoration = g.get("FontDecoration")
    font_strikethru = g.get("FontStrikethru")
    chunks = []
    decoration = font_decoration == "Underline"
    strikethru = font_strikethru == "Strikethru"
    if decoration or strikethru:
        if decoration:
            chunks.append("underline")
        if strikethru:
            chunks.append("line-through")
    else:
        chunks.append("none")
    return " ".join(chunks)


def _kebab(s):
    from .camel import kebab_case
    return kebab_case(s)


def conv_Align(el):
    return _kebab(el["Graphics"].get("Align"))


def conv_FontStyle(el):
    return _kebab(el["Graphics"].get("FontStyle"))


def conv_FontWeight(el):
    return _kebab(el["Graphics"].get("FontWeight"))


def conv_Valign(el):
    return _kebab(el["Graphics"].get("Valign"))


def conv_Href(el):
    return urllib.parse.quote(
        decode_if_not_empty(el.get("Href")) or "",
        safe=";,/?:@&=+$-_.!~*'()#")  # encodeURI-compatible safe set


# --- color / stroke attrs (2013a/ValueConverters.ts:314-386) ---------------

def conv_Color(el):
    return gpml_color_to_css_color(el["Graphics"].get("Color"))


def conv_FillColor(el):
    g = el["Graphics"]
    fill_color = g.get("FillColor")
    shape_type = g.get("ShapeType")
    # An edge (has Point) can have a fill without a ShapeType; a node needs a
    # non-none ShapeType for its fill to be visible.
    if (shape_type and str(shape_type).lower() != "none") or "Point" in g:
        return gpml_color_to_css_color(fill_color)
    return "transparent"


def conv_LineThickness(el):
    g = el["Graphics"]
    lt = g.get("LineThickness")
    shape_type = g.get("ShapeType")
    if lt is None:
        return 0
    if shape_type is not None and str(shape_type).lower() != "none":
        return lt
    if "Point" in g:
        return lt
    return 0


def conv_ConnectorType(el):
    return el["Graphics"]["ConnectorType"] + "Line"


# --- attachment display (2013a/ValueConverters.ts:390-463) -----------------

def conv_Position(el):
    return {"position": [el["Position"], 0], "offset": [0, 0]}


def position_and_relative_offset_scalars_along_axis(rel_value):
    """rel ∈ [-1,1] maps to position ∈ [0,1]; out-of-bounds remainder goes to
    relativeOffset (2013a/ValueConverters.ts:405-432)."""
    relative_to_upper_left_corner = (rel_value + 1) / 2
    if relative_to_upper_left_corner < 0:
        position_scalar = 0
        relative_offset_scalar = relative_to_upper_left_corner
    elif relative_to_upper_left_corner > 1:
        position_scalar = 1
        relative_offset_scalar = relative_to_upper_left_corner - 1
    else:
        position_scalar = relative_to_upper_left_corner
        relative_offset_scalar = 0
    if not (math.isfinite(position_scalar)
            and math.isfinite(relative_offset_scalar)):
        raise ValueError(
            f"Expected finite position/relativeOffset scalars, got "
            f"{position_scalar}, {relative_offset_scalar}")
    return relative_offset_scalar, position_scalar


def conv_RelX(el):
    """Handles RelX and RelY together; RelY is pvjson:delete'd."""
    container = el["Graphics"] if isinstance(el.get("Graphics"), dict) and \
        "RelX" in el.get("Graphics", {}) else el
    rel_x = container["RelX"]
    rel_y = container["RelY"]
    ro_x, pos_x = position_and_relative_offset_scalars_along_axis(rel_x)
    ro_y, pos_y = position_and_relative_offset_scalars_along_axis(rel_y)
    return {
        "position": [pos_x, pos_y],
        "offset": [],  # filled in once referenced element dims are known
        "relativeOffset": [ro_x, ro_y],
    }


# --- key-value converters (2013a/KeyValueConverters.ts:5-18) ---------------

def kv_ShapeType(el, key_mappings, value_mappings):
    shape_type = el["Graphics"]["ShapeType"]
    pvjson_key = key_mappings["ShapeType"]
    out = [[pvjson_key, value_mappings.get(shape_type, shape_type)]]
    if shape_type == "RoundedRectangle":
        out.append(["rx", 15])
        out.append(["ry", 15])
    return out


VALUE_CONVERTERS = {
    "ID": conv_ID,
    "$ID": conv_dollar_ID,
    "DB": conv_DB,
    "TITLE": conv_TITLE,
    "SOURCE": conv_SOURCE,
    "YEAR": conv_YEAR,
    "AUTHORS": conv_AUTHORS,
    "BiopaxRef": conv_BiopaxRef,
    "Height": conv_Height,
    "Width": conv_Width,
    "CenterX": conv_CenterX,
    "CenterY": conv_CenterY,
    "Rotation": conv_Rotation,
    "LineStyle": conv_LineStyle,
    "Author": conv_Author,
    # "Data-Source" is looked up by its JS-function-safe name
    # (Processor.ts:414-420 strips "-")
    "DataSource": conv_DataSource,
    "Email": conv_Email,
    "Maintainer": conv_Maintainer,
    "Name": conv_Name,
    "TextLabel": conv_TextLabel,
    "Align": conv_Align,
    "FontDecoration": _text_decoration,
    "FontStrikethru": _text_decoration,
    "FontStyle": conv_FontStyle,
    "FontWeight": conv_FontWeight,
    "Valign": conv_Valign,
    "Href": conv_Href,
    "Color": conv_Color,
    "FillColor": conv_FillColor,
    "LineThickness": conv_LineThickness,
    "ConnectorType": conv_ConnectorType,
    "Position": conv_Position,
    "RelX": conv_RelX,
}

KEY_VALUE_CONVERTERS = {
    "ShapeType": kv_ShapeType,
}
