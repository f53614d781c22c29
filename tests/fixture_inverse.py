"""Inverse transform: reference expected-pvjson node entities → GPML.

The reference ships only expected OUTPUT JSON (test/expected/*.json); the
GPML inputs live in a sibling repo. For fixtures composed purely of
SingleFreeNodes (Shape / Label / DataNode), the conversion is invertible:
this module reconstructs a GPML island whose conversion must reproduce the
expected entities field-for-field — giving us parity coverage over the
styling fixture families (z-index, fill-and-stroke, text-and-font,
size-and-proportion, shapes, labels) without the original inputs."""

from __future__ import annotations

import math
from xml.sax.saxutils import escape

# pvjson drawAs → GPML ShapeType (inverse of ValueMappings.json)
DRAW_AS_TO_SHAPE_TYPE = {
    "rect": "Rectangle",
    "none": "None",
    "Ellipse": "Oval",
    "TrianglePathVisio": "Triangle",
    "HexagonPathVisio": "Hexagon",
    "PentagonPathVisio": "Pentagon",
    "Octagon": "Octagon",
    "ArcPathVisio": "Arc",
    "Brace": "Brace",
    "Mitochondria": "Mitochondria",
    "EndoplasmicReticulum": "Endoplasmic Reticulum",
    "GolgiApparatus": "Golgi Apparatus",
    "SarcoplasmicReticulum": "Sarcoplasmic Reticulum",
    "MimDegradation": "mim-degradation",
}

KEBAB_INVERSE = {"middle": "Middle", "top": "Top", "bottom": "Bottom",
                 "center": "Center", "left": "Left", "right": "Right",
                 "normal": "Normal", "bold": "Bold", "italic": "Italic"}


def _attr(value) -> str:
    s = str(value)
    s = escape(s, {'"': "&quot;"})
    s = s.replace("\n", "&#xA;")
    return s


def _color_to_gpml(css: str) -> str:
    if css in ("transparent", "none"):
        return css.capitalize()
    return css.lstrip("#")


def entity_to_gpml(e: dict) -> str:
    """One SingleFreeNode pvjson entity → GPML element string."""
    name = e["gpmlElementName"]
    assert name in ("Shape", "Label", "DataNode"), name

    double = e.get("strokeStyle") == "double"
    stroke_w = e.get("strokeWidth", 0)
    width = e["width"] - (stroke_w if double else 0)
    height = e["height"] - (stroke_w if double else 0)
    cx = e["x"] + e["width"] / 2
    cy = e["y"] + e["height"] / 2

    attrs = [f'GraphId="{e["id"]}"']
    if "textContent" in e:
        attrs.append(f'TextLabel="{_attr(e["textContent"])}"')
    if name == "DataNode" and e.get("wpType"):
        attrs.append(f'Type="{_attr(e["wpType"])}"')
    if e.get("href"):
        attrs.append(f'Href="{_attr(e["href"])}"')

    g = [f'CenterX="{cx!r}"', f'CenterY="{cy!r}"', f'Width="{width!r}"',
         f'Height="{height!r}"', f'ZOrder="{e["zIndex"]}"',
         f'FontSize="{e.get("fontSize", 12)}"']
    if "verticalAlign" in e:
        g.append(f'Valign="{KEBAB_INVERSE[e["verticalAlign"]]}"')
    if "textAlign" in e:
        g.append(f'Align="{KEBAB_INVERSE[e["textAlign"]]}"')
    if e.get("fontWeight") and e["fontWeight"] != "normal":
        g.append(f'FontWeight="{KEBAB_INVERSE[e["fontWeight"]]}"')
    if e.get("fontStyle") and e["fontStyle"] != "normal":
        g.append(f'FontStyle="{KEBAB_INVERSE[e["fontStyle"]]}"')
    if e.get("fontFamily") and e["fontFamily"] != "Arial":
        g.append(f'FontName="{_attr(e["fontFamily"])}"')
    if e.get("textDecoration") and e["textDecoration"] != "none":
        parts = e["textDecoration"].split()
        if "underline" in parts:
            g.append('FontDecoration="Underline"')
        if "line-through" in parts:
            g.append('FontStrikethru="Strikethru"')
    if "stroke" in e:
        g.append(f'Color="{_color_to_gpml(e["stroke"])}"')
    g.append(f'LineThickness="{stroke_w}"')
    if "fill" in e:
        g.append(f'FillColor="{_color_to_gpml(e["fill"])}"')
    if "rx" in e:
        g.append('ShapeType="RoundedRectangle"')
    elif "drawAs" in e:
        g.append(f'ShapeType="{DRAW_AS_TO_SHAPE_TYPE[e["drawAs"]]}"')
    if "strokeDasharray" in e and e["strokeDasharray"] == "5,3":
        g.append('LineStyle="Broken"')
    if "rotation" in e:
        g.append(f'Rotation="{math.radians(e["rotation"])!r}"')

    children = [f'    <Graphics {" ".join(g)} />']
    attributes = []
    if double:
        attributes.append(
            '    <Attribute Key="org.pathvisio.DoubleLineProperty" '
            'Value="Double" />')
    if e.get("cellularComponent"):
        attributes.append(
            '    <Attribute Key="org.pathvisio.CellularComponentProperty" '
            f'Value="{_attr(e["cellularComponent"])}" />')
    if name == "DataNode":
        ds = e.get("xrefDataSource", "")
        xid = e.get("xrefIdentifier", "")
        children.append(f'    <Xref Database="{_attr(ds)}" '
                        f'ID="{_attr(xid)}" />')
    body = "\n".join(attributes + children)
    return f'  <{name} {" ".join(attrs)}>\n{body}\n  </{name}>\n'


DRAW_AS_TO_CONNECTOR = {
    "StraightLine": "Straight",
    "ElbowLine": "Elbow",
    "CurvedLine": "Curved",
    "SegmentedLine": "Segmented",
}


def edge_to_gpml(e: dict, offset=(0.0, 0.0)) -> str:
    """Unattached GraphicalLine/Interaction → GPML. For Elbow/Curved,
    implicit middle points are regenerated by the converter, so only the
    explicit endpoints are emitted; Straight/Segmented keep all points.
    `offset` shifts group-relative coordinates back to absolute."""
    name = e["gpmlElementName"]
    g = [f'ZOrder="{e["zIndex"]}"',
         f'LineThickness="{e.get("strokeWidth", 1)}"']
    if "stroke" in e:
        g.append(f'Color="{_color_to_gpml(e["stroke"])}"')
    if e.get("strokeDasharray") == "5,3":
        g.append('LineStyle="Broken"')
    connector = DRAW_AS_TO_CONNECTOR[e["drawAs"]]
    if connector != "Straight":
        g.append(f'ConnectorType="{connector}"')
    points = e["points"]
    if e["drawAs"] in ("ElbowLine", "CurvedLine") and len(points) > 2:
        points = [points[0], points[-1]]
    ox, oy = offset
    pts = "".join(
        f'      <Point X="{p["x"] + ox!r}" Y="{p["y"] + oy!r}" />\n'
        for p in points)
    xref = '    <Xref Database="" ID="" />\n' if name == "Interaction" else ""
    return (f'  <{name} GraphId="{e["id"]}">\n'
            f'    <Graphics {" ".join(g)}>\n{pts}    </Graphics>\n'
            f"{xref}  </{name}>\n")


GROUP_TYPE_TO_STYLE = {"GroupNone": "None", "GroupGroup": "Group",
                       "GroupComplex": "Complex", "GroupPathway": "Pathway"}


def expected_to_gpml(expected: dict) -> str:
    """Whole fixture → GPML island: SingleFreeNodes, unattached
    GraphicalLines and Groups (members carry group-relative coordinates in
    pvjson, shifted back to absolute here). Elements emitted per-class in
    pathway.contains (zIndex) order."""
    pathway = expected["pathway"]
    ents = expected["entitiesById"]

    groups = {eid: e for eid, e in ents.items()
              if e.get("kaavioType") == "Group"}
    group_of_member = {}
    for gid, group in groups.items():
        for member_id in group.get("contains", []):
            group_of_member[member_id] = gid

    def emit(eid: str) -> str:
        e = ents[eid]
        gid = group_of_member.get(eid)
        offset = (0.0, 0.0)
        group_ref = ""
        if gid is not None:
            offset = (groups[gid]["x"], groups[gid]["y"])
            group_ref = gid
        if "points" in e:
            return edge_to_gpml(e, offset)
        e2 = dict(e)
        if gid is not None:
            e2["x"] = e["x"] + offset[0]
            e2["y"] = e["y"] + offset[1]
        out = entity_to_gpml(e2)
        if group_ref:
            # inject GroupRef attribute (the converter re-derives isPartOf)
            out = out.replace(f'GraphId="{e["id"]}"',
                              f'GraphId="{e["id"]}" GroupRef="grp_{gid}"', 1)
        return out

    emit_order = {"DataNode": 0, "Label": 1, "Shape": 2, "Interaction": 3,
                  "GraphicalLine": 4}
    node_ids = [eid for eid in ents
                if ents[eid].get("kaavioType") != "Group"]
    node_ids.sort(key=lambda i: (emit_order[ents[i]["gpmlElementName"]],
                                 ents[i].get("zIndex", 0)))
    body = "".join(emit(eid) for eid in node_ids)
    for gid, group in groups.items():
        style = next((GROUP_TYPE_TO_STYLE[t] for t in group.get("type", [])
                      if t in GROUP_TYPE_TO_STYLE), "None")
        body += (f'  <Group GroupId="grp_{gid}" GraphId="{gid}" '
                 f'Style="{style}" />\n')

    version = pathway.get("dataSourceVersion", "20130813")
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<Pathway xmlns="http://pathvisio.org/GPML/2013a" '
        f'Name="{_attr(pathway["name"])}" Version="{version}">\n'
        f'  <Graphics BoardWidth="{pathway["width"]!r}" '
        f'BoardHeight="{pathway["height"]!r}" />\n'
        + body
        + '  <InfoBox CenterX="0.0" CenterY="0.0" />\n'
        + "</Pathway>")
