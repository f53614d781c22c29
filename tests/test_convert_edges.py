"""Edge geometry fixtures: elbow implicit-point synthesis, anchors/burrs,
hyperedges, markers. Inputs reconstructed from the reference expected JSON
(see test_convert_micro.py header for the comparison policy)."""

from __future__ import annotations

from gpml2pvjson_js_ray.functions.convert import convert_island

from tests.test_convert_micro import (GPML_HEADER, assert_entity_matches,
                                      assert_pathway_matches, load_expected)


def test_edge_elbow_top1_to_right1():
    gpml = GPML_HEADER + """
<Pathway xmlns="http://pathvisio.org/GPML/2013a" Name="test case" Version="20130813">
  <Graphics BoardWidth="1047.7865523249097" BoardHeight="825.09187756604" />
  <DataNode TextLabel="GeneProduct" GraphId="af9e0" Type="GeneProduct">
    <Graphics CenterX="236.7289428223533" CenterY="124.44624526539923" Width="80.0" Height="20.0" ZOrder="32954" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <DataNode TextLabel="0006" GraphId="a0723" Type="GeneProduct">
    <Graphics CenterX="54.993106861058784" CenterY="94.27400896748527" Width="80.0" Height="20.0" ZOrder="32955" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <Interaction GraphId="d6ee8">
    <Graphics ZOrder="32953" LineThickness="1.0" ConnectorType="Elbow">
      <Point X="54.993106861058784" Y="84.27400896748527" GraphRef="a0723" RelX="0.0" RelY="-1.0" ArrowHead="TBar" />
      <Point X="196.7289428223533" Y="124.44624526539923" GraphRef="af9e0" RelX="-1.0" RelY="0.0" ArrowHead="Arrow" />
    </Graphics>
    <Xref Database="" ID="" />
  </Interaction>
  <InfoBox CenterX="0.0" CenterY="0.0" />
</Pathway>"""
    out = convert_island(gpml)
    expected = load_expected("edge-elbow-top1-to-right1")
    assert_pathway_matches(out, expected)
    for eid in expected["entitiesById"]:
        assert_entity_matches(out, expected, eid)


def test_edge_curved_bottom1_to_top1():
    gpml = GPML_HEADER + """
<Pathway xmlns="http://pathvisio.org/GPML/2013a" Name="test case" Version="20130813">
  <Graphics BoardWidth="1047.7865523249097" BoardHeight="825.09187756604" />
  <DataNode TextLabel="GeneProduct" GraphId="d5cad" Type="GeneProduct">
    <Graphics CenterX="200.68118567178323" CenterY="125.33238139805435" Width="80.0" Height="20.0" ZOrder="33005" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <DataNode TextLabel="0021" GraphId="cf964" Type="GeneProduct">
    <Graphics CenterX="52.46064141579781" CenterY="66.50135987235078" Width="80.0" Height="20.0" ZOrder="33006" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <Interaction GraphId="e3b17">
    <Graphics ZOrder="33004" LineThickness="1.0" ConnectorType="Curved">
      <Point X="32.46064141579781" Y="76.50135987235078" GraphRef="cf964" RelX="-0.5" RelY="1.0" ArrowHead="TBar" />
      <Point X="200.68118567178323" Y="115.33238139805434" GraphRef="d5cad" RelX="0.0" RelY="-1.0" ArrowHead="Arrow" />
    </Graphics>
    <Xref Database="" ID="" />
  </Interaction>
  <InfoBox CenterX="0.0" CenterY="0.0" />
</Pathway>"""
    out = convert_island(gpml)
    expected = load_expected("edge-curved-bottom1-to-top1")
    for eid in expected["entitiesById"]:
        assert_entity_matches(out, expected, eid,
                              ignore={"x", "y"} if eid in ("d5cad", "cf964")
                              else ())
    # node geometry matches to float precision of the reconstruction
    e = out["entitiesById"]["e3b17"]
    assert e["points"] == expected["entitiesById"]["e3b17"]["points"]


def test_edge_elbow_waypoints_pass_through():
    # "waypoint" fixture family: >2 explicit points pass through unchanged
    # (calculateAllPoints.ts:142-144), endpoint orientations still assigned
    gpml = GPML_HEADER + """
<Pathway xmlns="http://pathvisio.org/GPML/2013a" Name="test case" Version="20130813">
  <Graphics BoardWidth="1047.7865523249097" BoardHeight="825.09187756604" />
  <DataNode TextLabel="A" GraphId="fe12c" Type="GeneProduct">
    <Graphics CenterX="213.9937029287637" CenterY="104.91908337772578" Width="80.0" Height="20.0" ZOrder="32972" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <DataNode TextLabel="B" GraphId="fc22c" Type="GeneProduct">
    <Graphics CenterX="63.354108824975164" CenterY="85.64749377680056" Width="80.0" Height="20.0" ZOrder="32973" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <Interaction GraphId="c0fac">
    <Graphics ZOrder="32971" LineThickness="1.0" ConnectorType="Elbow">
      <Point X="63.354108824975164" Y="75.64749377680056" GraphRef="fc22c" RelX="0.0" RelY="-1.0" />
      <Point X="182.6889787043376" Y="66.33070321840864" />
      <Point X="302.0238485837" Y="85.6248932980672" />
      <Point X="253.9937029287637" Y="104.91908337772578" GraphRef="fe12c" RelX="1.0" RelY="0.0" />
    </Graphics>
    <Xref Database="" ID="" />
  </Interaction>
  <InfoBox CenterX="0.0" CenterY="0.0" />
</Pathway>"""
    out = convert_island(gpml)
    expected = load_expected("edge-elbow-top1-to-right1-waypoint")
    e = out["entitiesById"]["c0fac"]
    assert e["points"] == expected["entitiesById"]["c0fac"]["points"]
    assert e["isAttachedTo"] == ["fc22c", "fe12c"]


def test_hyperedge_singleend_depth1_elbow():
    """Edge attached via anchor to an ELBOW edge: exercises polyline path
    position + the hyperedge orientation scoring on a multi-segment path
    (edge/orientation.ts:30-173). NOTE the reference quirk reproduced here:
    mim-* arrowheads convert to 'Mim*' but MarkerMappings is keyed 'MIM*',
    so mim-* markers never enrich the edge type (only Arrow/TBar do)."""
    gpml = GPML_HEADER + """
<Pathway xmlns="http://pathvisio.org/GPML/2013a" Name="test case" Version="20130715">
  <Graphics BoardWidth="193.78600823045275" BoardHeight="183.20987654320976" />
  <DataNode TextLabel="GeneProduct" GraphId="faa53" Type="GeneProduct">
    <Graphics CenterX="70.71829405162859" CenterY="153.20987654320973" Width="80.0" Height="20.0" ZOrder="32768" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <Interaction GraphId="idaf905386">
    <Graphics ZOrder="12288" LineThickness="1.0" ConnectorType="Elbow">
      <Point X="30.452674897119397" Y="66.6666666666666" />
      <Point X="10.452674897119397" Y="81.06060606060603" />
      <Point X="99.31724653946877" Y="95.45454545454545" />
      <Point X="188.18181818181816" Y="81.06060606060602" />
      <Point X="163.78600823045275" Y="66.66666666666659" />
      <Anchor Position="0.5617283950617287" GraphId="e0874" />
    </Graphics>
    <Xref Database="" ID="" />
  </Interaction>
  <Interaction GraphId="id28382a1c">
    <Graphics ZOrder="12288" LineThickness="1.0" ConnectorType="Elbow">
      <Point X="70.71829405162859" Y="143.20987654320973" GraphRef="faa53" RelX="0.0" RelY="-1.0" />
      <Point X="94.74946077140926" Y="123.20987654320973" />
      <Point X="118.78062749118993" Y="95.45454545454545" GraphRef="e0874" RelX="0.0" RelY="0.0" ArrowHead="mim-catalysis" />
    </Graphics>
    <Xref Database="" ID="" />
  </Interaction>
  <InfoBox CenterX="0.0" CenterY="0.0" />
</Pathway>"""
    out = convert_island(gpml)
    expected = load_expected("hyperedge-singleend-depth1-elbow.updated")
    for eid in expected["entitiesById"]:
        assert_entity_matches(out, expected, eid)


def test_hyperedge_singleend_depth1_straight():
    gpml = GPML_HEADER + """
<Pathway xmlns="http://pathvisio.org/GPML/2013a" Name="test case" Version="20130715">
  <Graphics BoardWidth="193.78600823045275" BoardHeight="183.20987654320976" />
  <DataNode TextLabel="GeneProduct" GraphId="faa53" Type="GeneProduct">
    <Graphics CenterX="106.17283950617399" CenterY="143.20987654320976" Width="80.0" Height="20.0" ZOrder="32768" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <Interaction GraphId="idaf905386">
    <Graphics ZOrder="12288" LineThickness="1.0">
      <Point X="30.452674897119397" Y="66.6666666666666" />
      <Point X="163.78600823045275" Y="66.66666666666659" />
      <Anchor Position="0.5617283950617287" GraphId="e0874" />
    </Graphics>
    <Xref Database="" ID="" />
  </Interaction>
  <Interaction GraphId="id28382a1c">
    <Graphics ZOrder="12288" LineThickness="1.0">
      <Point X="106.172839506174" Y="133.20987654320976" GraphRef="faa53" RelX="0.0" RelY="-1.0" />
      <Point X="105.34979423868322" Y="66.66666666666659" GraphRef="e0874" RelX="0.0" RelY="0.0" ArrowHead="mim-catalysis" />
    </Graphics>
    <Xref Database="" ID="" />
  </Interaction>
  <InfoBox CenterX="0.0" CenterY="0.0" />
</Pathway>"""
    out = convert_island(gpml)
    expected = load_expected("hyperedge-singleend-depth1-straight")
    assert_pathway_matches(out, expected)
    for eid in expected["entitiesById"]:
        assert_entity_matches(out, expected, eid)
    # the anchor is a burr on the referenced edge, not in pathway.contains
    assert out["entitiesById"]["idaf905386"]["burrs"] == ["e0874"]
    assert out["pathway"]["contains"] == expected["pathway"]["contains"]
