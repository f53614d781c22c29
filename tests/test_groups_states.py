"""Semantic tests for group finalization (style defaults, bbox, relative
member coordinates, isPartOf) and state/burr attachment — reference
semantics per group.ts:28-191 and 2013a/toPvjson.ts:680-710,746-869."""

from __future__ import annotations

import pytest

from gpml2pvjson_js_ray.functions.convert import ConversionError, convert_island

from tests.test_convert_micro import GPML_HEADER


def _convert(body: str, extra=""):
    gpml = GPML_HEADER + f"""
<Pathway xmlns="http://pathvisio.org/GPML/2013a" Name="test case" Version="20240101"{extra}>
  <Graphics BoardWidth="800.0" BoardHeight="600.0" />
{body}
  <InfoBox CenterX="0.0" CenterY="0.0" />
</Pathway>"""
    return convert_island(gpml)


GROUP_BODY = """
  <DataNode TextLabel="A" GraphId="aaa01" GroupRef="grp1" Type="GeneProduct">
    <Graphics CenterX="200.0" CenterY="300.0" Width="80.0" Height="20.0" ZOrder="32768" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <DataNode TextLabel="B" GraphId="bbb02" GroupRef="grp1" Type="Metabolite">
    <Graphics CenterX="290.0" CenterY="300.0" Width="80.0" Height="20.0" ZOrder="32769" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <Group GroupId="grp1" GraphId="ggg03" Style="Complex" />
"""


def test_group_complex_style_and_bbox():
    out = _convert(GROUP_BODY)
    group = out["entitiesById"]["ggg03"]
    # Complex style defaults (GroupMappingsByStyle.json:28-41)
    assert group["drawAs"] == "Octagon"
    assert "GroupComplex" in group["type"] and "Complex" in group["type"]
    assert group["padding"] == 11
    assert group["strokeWidth"] == 1
    # bbox: members span x 160..330, y 290..310; margin padding+strokeWidth=12
    assert group["x"] == pytest.approx(160 - 12)
    assert group["y"] == pytest.approx(290 - 12)
    assert group["width"] == pytest.approx((330 - 160) + 24)
    assert group["height"] == pytest.approx(20 + 24)
    # min member zIndex
    assert group["zIndex"] == 32768
    # contains sorted by zIndex
    assert group["contains"] == ["aaa01", "bbb02"]

    # members got group-relative coordinates + isPartOf, groupRef dropped
    a = out["entitiesById"]["aaa01"]
    assert a["isPartOf"] == "ggg03"
    assert "groupRef" not in a
    assert a["x"] == pytest.approx(160 - group["x"])
    # pathway.contains holds the group but not its members
    assert "ggg03" in out["pathway"]["contains"]
    assert "aaa01" not in out["pathway"]["contains"]


def test_group_none_style_defaults():
    out = _convert(GROUP_BODY.replace('Style="Complex"', 'Style="None"'))
    group = out["entitiesById"]["ggg03"]
    assert group["drawAs"] == "rect"          # Rectangle
    assert group["strokeDasharray"] == "5,3"  # Broken
    assert "GroupNone" in group["type"]
    assert group["padding"] == 8


def test_empty_group_dropped_silently():
    body = '  <Group GroupId="lonely" GraphId="ggg99" Style="Group" />\n'
    out = _convert(body)
    assert "ggg99" not in out["entitiesById"]


def test_state_burr_attachment():
    body = """
  <DataNode TextLabel="P" GraphId="par01" Type="Protein">
    <Graphics CenterX="300.0" CenterY="200.0" Width="80.0" Height="20.0" ZOrder="32768" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <State GraphRef="par01" TextLabel="P" GraphId="sta02">
    <Graphics RelX="1.0" RelY="1.0" Width="15.0" Height="15.0" ShapeType="Oval" />
    <Xref Database="" ID="" />
  </State>
"""
    out = _convert(body)
    state = out["entitiesById"]["sta02"]
    parent = out["entitiesById"]["par01"]
    # burr registered on the parent, not in pathway.contains
    assert parent["burrs"] == ["sta02"]
    assert "sta02" not in out["pathway"]["contains"]
    # RelX/RelY = 1.0 → position [1,1], offset [0,0] (relativeOffset 0 × dims)
    ad = state["attachmentDisplay"]
    assert ad["position"] == [1, 1]
    assert ad["offset"] == [0, 0]
    assert "relativeOffset" not in ad
    # states carry NO zIndex (reference fixtures: the parent ZOrder fill-in
    # never lands — see functions/convert.py note)
    assert "zIndex" not in state
    assert state["kaavioType"] == "Burr"
    assert state["drawAs"] == "Ellipse"  # Oval → Ellipse


def test_state_out_of_bounds_rel_gives_offset():
    body = """
  <DataNode TextLabel="P" GraphId="par01" Type="Protein">
    <Graphics CenterX="300.0" CenterY="200.0" Width="80.0" Height="20.0" ZOrder="32768" FontSize="10" Valign="Middle" />
    <Xref Database="" ID="" />
  </DataNode>
  <State GraphRef="par01" TextLabel="P" GraphId="sta02">
    <Graphics RelX="1.5" RelY="-1.5" Width="10.0" Height="10.0" ShapeType="Oval" />
    <Xref Database="" ID="" />
  </State>
"""
    out = _convert(body)
    ad = out["entitiesById"]["sta02"]["attachmentDisplay"]
    # rel 1.5 → (1.5+1)/2 = 1.25 → position 1, relOffset 0.25 → offset 0.25*80
    assert ad["position"] == [1, 0]
    assert ad["offset"] == [pytest.approx(0.25 * 80),
                            pytest.approx(-0.25 * 20)]


def test_publication_xrefs_year_sort_and_ids():
    body = """
  <DataNode TextLabel="Cited" GraphId="nnn01" Type="Protein">
    <BiopaxRef>b1</BiopaxRef>
    <BiopaxRef>b2</BiopaxRef>
    <Graphics CenterX="200.0" CenterY="200.0" Width="80.0" Height="20.0" ZOrder="32768" FontSize="10" Valign="Middle" />
    <Xref Database="Entrez Gene" ID="1234" />
  </DataNode>
  <Biopax>
    <bp:PublicationXref xmlns:bp="http://www.biopax.org/release/biopax-level3.owl#" xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" rdf:id="b2">
      <bp:ID>222</bp:ID>
      <bp:DB>PubMed</bp:DB>
      <bp:TITLE>Later</bp:TITLE>
      <bp:SOURCE>J</bp:SOURCE>
      <bp:YEAR>2010</bp:YEAR>
      <bp:AUTHORS>B &amp; C</bp:AUTHORS>
    </bp:PublicationXref>
    <bp:PublicationXref xmlns:bp="http://www.biopax.org/release/biopax-level3.owl#" xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" rdf:id="b1">
      <bp:ID>111</bp:ID>
      <bp:DB>PubMed</bp:DB>
      <bp:TITLE>Earlier</bp:TITLE>
      <bp:SOURCE>J</bp:SOURCE>
      <bp:YEAR>1999</bp:YEAR>
      <bp:AUTHORS>A</bp:AUTHORS>
    </bp:PublicationXref>
    <bp:openControlledVocabulary xmlns:bp="http://www.biopax.org/release/biopax-level3.owl#">
      <bp:TERM>signaling</bp:TERM>
      <bp:ID>PW:0000003</bp:ID>
      <bp:Ontology>Pathway Ontology</bp:Ontology>
    </bp:openControlledVocabulary>
  </Biopax>
"""
    out = _convert(body)
    ents = out["entitiesById"]
    # citation ids carry the publicationXref prefix (gpml-utilities.ts:36-38)
    node = ents["nnn01"]
    assert node["citations"] == ["publicationXrefb1", "publicationXrefb2"]
    assert "Entrez Gene:1234" in node["type"]
    # year sort → 1-based numbering
    assert ents["publicationXrefb1"]["textContent"] == "1"  # 1999
    assert ents["publicationXrefb2"]["textContent"] == "2"  # 2010
    assert ents["publicationXrefb2"]["xrefIdentifier"] == "222"
    assert ents["publicationXrefb2"]["xrefDataSource"] == "PubMed"
    assert ents["publicationXrefb2"]["standardName"] == "Later"
    assert ents["publicationXrefb2"]["authors"] == ["B & C"]
    # vocabulary: IRI id + pathway.type append
    vocab_id = "http://identifiers.org/pw/PW:0000003"
    assert vocab_id in ents
    assert ents[vocab_id]["term"] == "signaling"
    assert vocab_id in out["pathway"]["type"]


def test_unknown_vocabulary_raises():
    body = """
  <Biopax>
    <bp:openControlledVocabulary xmlns:bp="http://www.biopax.org/release/biopax-level3.owl#">
      <bp:TERM>x</bp:TERM>
      <bp:ID>XX:1</bp:ID>
      <bp:Ontology>Made Up Ontology</bp:Ontology>
    </bp:openControlledVocabulary>
  </Biopax>
"""
    with pytest.raises(ConversionError):
        _convert(body)
