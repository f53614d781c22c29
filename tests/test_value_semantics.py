"""Value-converter semantics (SURVEY.md §2.2 M5-M15) verified end-to-end
through convert_island on constructed GPML."""

from __future__ import annotations

import math

import pytest

from gpml2pvjson_js_ray.functions.convert import convert_island
from gpml2pvjson_js_ray.functions.colors import gpml_color_to_css_color
from gpml2pvjson_js_ray.functions.value_converters import (
    position_and_relative_offset_scalars_along_axis)

from tests.test_convert_micro import GPML_HEADER


def _convert(body: str):
    gpml = GPML_HEADER + f"""
<Pathway xmlns="http://pathvisio.org/GPML/2013a" Name="test case" Version="20240101">
  <Graphics BoardWidth="800.0" BoardHeight="600.0" />
{body}
</Pathway>"""
    return convert_island(gpml)


def test_double_line_dimensions_and_rounded_rect():
    # reference double-edge fixture semantics: Width/Height gain
    # LineThickness when org.pathvisio.DoubleLineProperty present
    # (2013a/ValueConverters.ts:166-189), RoundedRectangle → rect + rx/ry 15
    body = """
  <Shape GraphId="sh001">
    <Attribute Key="org.pathvisio.DoubleLineProperty" Value="Double" />
    <Graphics CenterX="126.5787464504289" CenterY="148.03174123914125" Width="63.08503401360538" Height="63.08503401360531" ZOrder="28690" FontSize="10" Valign="Middle" ShapeType="RoundedRectangle" LineThickness="2.0" Color="999999" Rotation="0.0" FillColor="ffcccc" />
  </Shape>
"""
    out = _convert(body)
    e = out["entitiesById"]["sh001"]
    assert e["strokeStyle"] == "double"
    assert e["width"] == pytest.approx(65.08503401360538)
    assert e["height"] == pytest.approx(65.08503401360531)
    assert e["x"] == pytest.approx(126.5787464504289 - 65.08503401360538 / 2)
    assert e["drawAs"] == "rect"
    assert e["rx"] == 15 and e["ry"] == 15
    assert e["strokeWidth"] == 2
    assert e["stroke"] == "#999999"
    assert e["fill"] == "#ffcccc"
    assert e["rotation"] == 0


def test_rotation_radians_to_degrees_and_text_rotation():
    body = """
  <Shape GraphId="sh002">
    <Graphics CenterX="100" CenterY="100" Width="40" Height="20" ZOrder="1" FontSize="10" ShapeType="Rectangle" Rotation="1.5707963267948966" />
  </Shape>
"""
    e = _convert(body)["entitiesById"]["sh002"]
    assert e["rotation"] == pytest.approx(90)
    assert e["textRotation"] == pytest.approx(-90)


def test_rotation_negative_normalizes():
    body = """
  <Shape GraphId="sh003">
    <Graphics CenterX="100" CenterY="100" Width="40" Height="20" ZOrder="1" FontSize="10" ShapeType="Rectangle" Rotation="-1.5707963267948966" />
  </Shape>
"""
    e = _convert(body)["entitiesById"]["sh003"]
    assert e["rotation"] == pytest.approx(270)


def test_label_fill_transparent_and_stroke_zero():
    # Label defaults: ShapeType None → fill transparent, strokeWidth 0
    body = """
  <Label TextLabel="Note" GraphId="lb001">
    <Graphics CenterX="100" CenterY="50" Width="120" Height="25" ZOrder="28672" FillColor="ffffff" FontSize="12" Valign="Middle" />
  </Label>
"""
    e = _convert(body)["entitiesById"]["lb001"]
    assert e["fill"] == "transparent"   # ShapeType None blocks FillColor
    assert e["strokeWidth"] == 0
    assert e["drawAs"] == "none"
    assert e["verticalAlign"] == "middle"
    assert e["textAlign"] == "center"


def test_graphical_line_untyped_edge():
    body = """
  <GraphicalLine GraphId="gl001">
    <Graphics ZOrder="12288" LineThickness="1.0" LineStyle="Broken">
      <Point X="10" Y="10" />
      <Point X="60" Y="80" />
    </Graphics>
  </GraphicalLine>
"""
    e = _convert(body)["entitiesById"]["gl001"]
    assert e["type"] == ["GraphicalLine", "Edge"]
    assert e["strokeDasharray"] == "5,3"
    assert e["drawAs"] == "StraightLine"
    assert e["fill"] == "none"


def test_curved_connector_draw_as_and_implicit_points():
    body = """
  <DataNode TextLabel="S" GraphId="n0001" Type="GeneProduct">
    <Graphics CenterX="100" CenterY="300" Width="80" Height="20" ZOrder="32768" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <DataNode TextLabel="T" GraphId="n0002" Type="GeneProduct">
    <Graphics CenterX="400" CenterY="100" Width="80" Height="20" ZOrder="32769" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <Interaction GraphId="ed001">
    <Graphics ZOrder="12288" LineThickness="1.0" ConnectorType="Curved">
      <Point X="100" Y="290" GraphRef="n0001" RelX="0.0" RelY="-1.0" />
      <Point X="360" Y="100" GraphRef="n0002" RelX="-1.0" RelY="0.0" ArrowHead="Arrow" />
    </Graphics>
    <Xref Database="" ID="" />
  </Interaction>
"""
    e = _convert(body)["entitiesById"]["ed001"]
    assert e["drawAs"] == "CurvedLine"
    # start top (0,-1), end left→(1,0): perpendicular, both agree with
    # vector sum → no extra implicit points (calculateAllPoints.ts:328-342)
    assert len(e["points"]) == 2
    assert e["points"][0]["orientation"] == [0, -1]
    assert e["points"][1]["orientation"] == [1, 0]
    assert e["markerEnd"] == "Arrow"
    assert "DirectedInteraction" in e["type"]


def test_curved_route_around_gives_waypoints():
    # start bottom but target is above → must route around: 2 extra points
    body = """
  <DataNode TextLabel="S" GraphId="n0001" Type="GeneProduct">
    <Graphics CenterX="100" CenterY="300" Width="80" Height="20" ZOrder="32768" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <DataNode TextLabel="T" GraphId="n0002" Type="GeneProduct">
    <Graphics CenterX="400" CenterY="100" Width="80" Height="20" ZOrder="32769" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <Interaction GraphId="ed002">
    <Graphics ZOrder="12288" LineThickness="1.0" ConnectorType="Elbow">
      <Point X="100" Y="310" GraphRef="n0001" RelX="0.0" RelY="1.0" />
      <Point X="360" Y="100" GraphRef="n0002" RelX="-1.0" RelY="0.0" ArrowHead="Arrow" />
    </Graphics>
    <Xref Database="" ID="" />
  </Interaction>
"""
    e = _convert(body)["entitiesById"]["ed002"]
    pts = e["points"]
    assert len(pts) == 4  # start, two implicit, end
    # first implicit point is one stub below the start
    assert pts[1]["y"] == pytest.approx(310 + 20)


def test_color_conversion_table():
    assert gpml_color_to_css_color("White") == "#ffffff"
    assert gpml_color_to_css_color("ffcc00") == "#ffcc00"
    assert gpml_color_to_css_color("Transparent") == "transparent"
    assert gpml_color_to_css_color("None") == "none"
    assert gpml_color_to_css_color("#14961e") == "#14961e"
    with pytest.raises(ValueError):
        gpml_color_to_css_color("notacolor!!")


def test_rel_scalar_split():
    # in-bounds
    assert position_and_relative_offset_scalars_along_axis(0.0) == (0, 0.5)
    assert position_and_relative_offset_scalars_along_axis(1.0) == (0, 1.0)
    # out-of-bounds: remainder goes to relativeOffset
    ro, pos = position_and_relative_offset_scalars_along_axis(1.5)
    assert pos == 1 and ro == pytest.approx(0.25)
    ro, pos = position_and_relative_offset_scalars_along_axis(-1.5)
    assert pos == 0 and ro == pytest.approx(-0.25)


def test_pathway_contains_sorted_by_z_index():
    # zIndex-sorted insertion (O1): document order b,a,c but zOrders 3,1,2
    body = """
  <DataNode TextLabel="B" GraphId="bbb01" Type="Protein">
    <Graphics CenterX="100" CenterY="100" Width="80" Height="20" ZOrder="3" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <DataNode TextLabel="A" GraphId="aaa02" Type="Protein">
    <Graphics CenterX="200" CenterY="100" Width="80" Height="20" ZOrder="1" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <DataNode TextLabel="C" GraphId="ccc03" Type="Protein">
    <Graphics CenterX="300" CenterY="100" Width="80" Height="20" ZOrder="2" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
"""
    out = _convert(body)
    assert out["pathway"]["contains"] == ["aaa02", "ccc03", "bbb01"]


def test_comments_and_href():
    body = """
  <Label TextLabel="L" GraphId="lb002" Href="http://example.org/a b?c=1&amp;d=2">
    <Graphics CenterX="10" CenterY="10" Width="10" Height="10" ZOrder="1" FontSize="10" />
  </Label>
"""
    gpml = GPML_HEADER + f"""
<Pathway xmlns="http://pathvisio.org/GPML/2013a" Name="test case" Version="1">
  <Graphics BoardWidth="800.0" BoardHeight="600.0" />
  <Comment Source="WikiPathways-description">A &amp; B pathway</Comment>
{body}
</Pathway>"""
    out = convert_island(gpml)
    assert out["pathway"]["comments"] == [
        {"source": "WikiPathways-description", "content": "A & B pathway"}]
    e = out["entitiesById"]["lb002"]
    assert e["href"] == "http://example.org/a%20b?c=1&d=2"
