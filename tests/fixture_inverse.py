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
    # several GPML arrowheads map to canonical "none" (Line, Receptor, …);
    # "Line" is the schema-default spelling
    "none": "Line",
}

KEBAB_INVERSE = {"middle": "Middle", "top": "Top", "bottom": "Bottom",
                 "center": "Center", "left": "Left", "right": "Right",
                 "normal": "Normal", "bold": "Bold", "italic": "Italic"}


def _attr(value) -> str:
    s = str(value)
    s = escape(s, {'"': "&quot;"})
    s = s.replace("\n", "&#xA;")
    return s


def _comments_xml(e: dict) -> str:
    out = ""
    for c in e.get("comments", []):
        src = f' Source="{_attr(c["source"])}"' if "source" in c else ""
        out += (f'    <Comment{src}>{escape(c.get("content", ""))}'
                '</Comment>\n')
    return out


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
         f'Height="{height!r}"', f'FontSize="{e.get("fontSize", 12)}"']
    if "zIndex" in e:
        g.append(f'ZOrder="{e["zIndex"]}"')
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

    children = [_comments_xml(e).rstrip("\n")] if e.get("comments") else []
    children += [f'    <BiopaxRef>{c[len("publicationXref"):]}</BiopaxRef>'
                 for c in e.get("citations", [])]
    children.append(f'    <Graphics {" ".join(g)} />')
    attributes = []
    if double:
        attributes.append(
            '    <Attribute Key="org.pathvisio.DoubleLineProperty" '
            'Value="Double" />')
    if e.get("cellularComponent"):
        attributes.append(
            '    <Attribute Key="org.pathvisio.CellularComponentProperty" '
            f'Value="{_attr(e["cellularComponent"])}" />')
    if e.get("backpageHead"):
        attributes.append(
            '    <Attribute Key="org.pathvisio.model.BackpageHead" '
            f'Value="{_attr(e["backpageHead"])}" />')
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

# canonical marker (pvjson) → GPML ArrowHead (inverse of ValueMappings)
MARKER_TO_ARROWHEAD = {
    "Arrow": "Arrow", "TBar": "TBar",
    "MimBinding": "mim-binding", "MimBranchingLeft": "mim-branching-left",
    "MimBranchingRight": "mim-branching-right",
    "MimCatalysis": "mim-catalysis", "MimCleavage": "mim-cleavage",
    "MimConversion": "mim-conversion",
    "MimCovalentBond": "mim-covalent-bond", "MimGap": "mim-gap",
    "MimInhibition": "mim-inhibition",
    "MimModification": "mim-modification",
    "MimNecessaryStimulation": "mim-necessary-stimulation",
    "MimStimulation": "mim-stimulation",
    "MimTranscriptionTranslation": "mim-transcription-translation",
    "MimDegradation": "mim-degradation",
    # several GPML arrowheads map to canonical "none" (Line, Receptor, …);
    # "Line" is the schema-default spelling
    "none": "Line",
}


def _rel_from_attachment(point: dict, ref_entity: dict):
    """Invert RelX/RelY from attachmentDisplay position+offset
    (2013a/ValueConverters.ts:405-463 / edge/edge.ts:40-84)."""
    ad = point["attachmentDisplay"]
    px, py = ad["position"]
    off = ad.get("offset") or [0, 0]
    w = ref_entity.get("width") or 1
    h = ref_entity.get("height") or 1
    off_x = off[0] if len(off) > 0 else 0
    off_y = off[1] if len(off) > 1 else 0
    rel_x = (px * 2 - 1) + 2 * off_x / w
    rel_y = (py * 2 - 1) + 2 * off_y / h
    return rel_x, rel_y


def edge_to_gpml(e: dict, ents: dict | None = None,
                 offset=(0.0, 0.0)) -> str:
    """GraphicalLine/Interaction → GPML, including point attachments
    (GraphRef/RelX/RelY), arrowhead markers and Anchor children. For
    Elbow/Curved, implicit middle points are regenerated by the converter,
    so only the explicit endpoints are emitted; Straight/Segmented keep all
    points. `offset` shifts group-relative coordinates back to absolute."""
    ents = ents or {}
    name = e["gpmlElementName"]
    g = [f'LineThickness="{e.get("strokeWidth", 1)}"']
    if "zIndex" in e and e["zIndex"] != 12288:
        # 12288 is the XSD default; omitting it exercises the default path
        g.insert(0, f'ZOrder="{e["zIndex"]}"')
    if "stroke" in e:
        g.append(f'Color="{_color_to_gpml(e["stroke"])}"')
    if e.get("strokeDasharray") == "5,3":
        g.append('LineStyle="Broken"')
    connector = DRAW_AS_TO_CONNECTOR[e["drawAs"]]
    if connector != "Straight":
        g.append(f'ConnectorType="{connector}"')
    # emit ALL points: >2 explicit points pass through the converter
    # unchanged (calculateAllPoints.ts:142-144), so computed output points
    # are always a valid explicit input reproducing themselves
    points = e["points"]
    ox, oy = offset
    lines = []
    last = len(points) - 1
    for idx, p in enumerate(points):
        attrs = f'X="{p["x"] + ox!r}" Y="{p["y"] + oy!r}"'
        if "isAttachedTo" in p:
            ref = ents.get(p["isAttachedTo"], {})
            if ref.get("gpmlElementName") == "Anchor":
                # anchor-attached: position was REPLACED by the anchor's,
                # but relativeOffset survives — invert the out-of-bounds
                # Rel value from it (ValueConverters.ts:405-432)
                ro = p["attachmentDisplay"].get("relativeOffset", [0, 0])

                def _inv_rel(r):
                    if r > 0:
                        return 2 * (1 + r) - 1
                    if r < 0:
                        return 2 * r - 1
                    return 0.0
                attrs += (f' GraphRef="{p["isAttachedTo"]}" '
                          f'RelX="{_inv_rel(ro[0])!r}" '
                          f'RelY="{_inv_rel(ro[1])!r}"')
            else:
                rel_x, rel_y = _rel_from_attachment(p, ref)
                attrs += (f' GraphRef="{p["isAttachedTo"]}" '
                          f'RelX="{rel_x!r}" RelY="{rel_y!r}"')
        marker = e.get("markerStart") if idx == 0 else (
            e.get("markerEnd") if idx == last else None)
        if marker:
            attrs += f' ArrowHead="{MARKER_TO_ARROWHEAD[marker]}"'
        lines.append(f"      <Point {attrs} />")
    # Anchor children: burrs attached to this edge
    for aid, a in ents.items():
        if a.get("gpmlElementName") == "Anchor" \
                and a.get("isAttachedTo") == e["id"]:
            pos = a["attachmentDisplay"]["position"][0]
            if a.get("drawAs") == "Ellipse":
                lines.append(f'      <Anchor Position="{pos!r}" '
                             f'Shape="Circle" GraphId="{aid}" />')
            elif a.get("width", 0) == 0:
                lines.append(f'      <Anchor Position="{pos!r}" '
                             f'GraphId="{aid}" />')
            else:
                # 4x4 None-shape anchor: original had no GraphId; the
                # converter regenerates one deterministically
                lines.append(f'      <Anchor Position="{pos!r}" />')
    pts = "\n".join(lines) + "\n"
    refs = _comments_xml(e)
    refs += "".join(f'    <BiopaxRef>{c[len("publicationXref"):]}</BiopaxRef>\n'
                    for c in e.get("citations", []))
    if e.get("strokeStyle") == "double":
        refs += ('    <Attribute Key="org.pathvisio.DoubleLineProperty" '
                 'Value="Double" />\n')
    xref = ""
    if name == "Interaction":
        ds = e.get("xrefDataSource", "")
        xid = e.get("xrefIdentifier", "")
        xref = (f'    <Xref Database="{_attr(ds)}" '
                f'ID="{_attr(xid)}" />\n')
    return (f'  <{name} GraphId="{e["id"]}">\n{refs}'
            f'    <Graphics {" ".join(g)}>\n{pts}    </Graphics>\n'
            f"{xref}  </{name}>\n")


def state_to_gpml(e: dict, ents: dict) -> str:
    """State burr → GPML (RelX/RelY from position + offset vs parent)."""
    parent = ents.get(e.get("isAttachedTo"), {})
    rel_x, rel_y = _rel_from_attachment({"attachmentDisplay":
                                         e["attachmentDisplay"]}, parent)
    attrs = [f'GraphId="{e["id"]}"', f'GraphRef="{e["isAttachedTo"]}"']
    if "textContent" in e:
        attrs.append(f'TextLabel="{_attr(e["textContent"])}"')
    g = [f'RelX="{rel_x!r}"', f'RelY="{rel_y!r}"',
         f'Width="{e["width"]!r}"', f'Height="{e["height"]!r}"']
    if "fill" in e:
        g.append(f'FillColor="{_color_to_gpml(e["fill"])}"')
    if "rx" in e:
        g.append('ShapeType="RoundedRectangle"')
    elif "drawAs" in e:
        g.append(f'ShapeType="{DRAW_AS_TO_SHAPE_TYPE[e["drawAs"]]}"')
    ds = e.get("xrefDataSource", "")
    xid = e.get("xrefIdentifier", "")
    return (f'  <State {" ".join(attrs)}>\n'
            + _comments_xml(e)
            + f'    <Graphics {" ".join(g)} />\n'
            f'    <Xref Database="{_attr(ds)}" ID="{_attr(xid)}" />\n'
            f"  </State>\n")


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
            out = edge_to_gpml(e, ents, offset)
        elif e["gpmlElementName"] == "State":
            out = state_to_gpml(e, ents)
        else:
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

    emit_order = {"DataNode": 0, "State": 1, "Label": 2, "Shape": 3,
                  "Interaction": 4, "GraphicalLine": 5}
    node_ids = [eid for eid in ents
                if ents[eid].get("kaavioType") != "Group"
                and ents[eid].get("gpmlElementName")
                not in ("Anchor", "PublicationXref",
                        "openControlledVocabulary")]
    node_ids.sort(key=lambda i: (emit_order[ents[i]["gpmlElementName"]],
                                 ents[i].get("zIndex", 0)))
    body = "".join(emit(eid) for eid in node_ids)
    for gid, group in groups.items():
        style = next((GROUP_TYPE_TO_STYLE[t] for t in group.get("type", [])
                      if t in GROUP_TYPE_TO_STYLE), "None")
        gattrs = (f'GroupId="grp_{gid}" GraphId="{gid}" '
                  f'Style="{style}"')
        if "textContent" in group:
            gattrs += f' TextLabel="{_attr(group["textContent"])}"'
        children = _comments_xml(group)
        children += "".join(
            f'    <BiopaxRef>{c[len("publicationXref"):]}</BiopaxRef>\n'
            for c in group.get("citations", []))
        if children:
            body += f'  <Group {gattrs}>\n{children}  </Group>\n'
        else:
            body += f'  <Group {gattrs} />\n'


    # citations → Biopax PublicationXref block (rank order so the year sort
    # reproduces textContent numbering)
    ocvs = [e for e in ents.values()
            if e.get("gpmlElementName") == "openControlledVocabulary"]
    ocv_xml = ""
    for e in ocvs:
        ocv_xml += (
            '    <bp:openControlledVocabulary xmlns:bp="http://www.biopax'
            '.org/release/biopax-level3.owl#">\n'
            f'      <bp:TERM>{escape(e.get("term", ""))}</bp:TERM>\n'
            f'      <bp:ID>{escape(str(e.get("xrefIdentifier", "")))}'
            '</bp:ID>\n'
            f'      <bp:Ontology>{escape(e.get("ontology", ""))}'
            '</bp:Ontology>\n'
            '    </bp:openControlledVocabulary>\n')
    pubs = [e for e in ents.values()
            if e.get("gpmlElementName") == "PublicationXref"]
    if ocv_xml and not pubs:
        body += "  <Biopax>\n" + ocv_xml + "  </Biopax>\n"
    if pubs:
        pubs.sort(key=lambda e: int(e.get("textContent", "0")))
        bp = ['  <Biopax>']
        for e in pubs:
            rid = e["id"][len("publicationXref"):]
            authors = "".join(
                f"      <bp:AUTHORS>{_attr(a)}</bp:AUTHORS>\n"
                for a in e.get("authors", []))
            bp.append(
                '    <bp:PublicationXref xmlns:bp="http://www.biopax.org/'
                'release/biopax-level3.owl#" xmlns:rdf="http://www.w3.org/'
                f'1999/02/22-rdf-syntax-ns#" rdf:id="{rid}">\n'
                f'      <bp:ID>{_attr(e.get("xrefIdentifier", ""))}</bp:ID>\n'
                f'      <bp:DB>{_attr(e.get("xrefDataSource", ""))}</bp:DB>\n'
                f'      <bp:TITLE>{_attr(e.get("standardName", ""))}'
                '</bp:TITLE>\n'
                f'      <bp:SOURCE>{_attr(e.get("source", ""))}</bp:SOURCE>\n'
                f'      <bp:YEAR>{_attr(e.get("year", ""))}</bp:YEAR>\n'
                f'{authors}    </bp:PublicationXref>')
        if ocv_xml:
            bp.append(ocv_xml.rstrip("\n"))
        bp.append('  </Biopax>')
        body += "\n".join(bp) + "\n"

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
