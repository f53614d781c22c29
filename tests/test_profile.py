"""ConversionProfile seam (SURVEY.md §2.11): the schema-version table set
is a pluggable parameter of conversion, mirroring the reference Processor's
table constructor (Processor.ts:148-166) and its GPML2013aToPVJSON export
(index.ts:5). A toy variant profile must change conversion behavior without
touching converter code; the default must stay GPML2013a."""

from __future__ import annotations

from dataclasses import replace

import pytest

from gpml2pvjson_js_ray.functions.convert import ConversionError, convert_island
from gpml2pvjson_js_ray.functions.profile import GPML2013A, ConversionProfile

GPML_TEMPLATE = (
    '<Pathway xmlns="{ns}" Name="t" Version="1">\n'
    '<Graphics BoardWidth="100.0" BoardHeight="100.0" />\n'
    '<DataNode TextLabel="A" GraphId="aaa11" Type="Protein">\n'
    '<Graphics CenterX="20.0" CenterY="20.0" Width="20.0" Height="10.0" '
    'ZOrder="32768" FontSize="10" Valign="Middle" />\n'
    '<Xref Database="Entrez Gene" ID="1" /></DataNode>\n'
    '<DataNode TextLabel="B" GraphId="bbb22" Type="Protein">\n'
    '<Graphics CenterX="80.0" CenterY="20.0" Width="20.0" Height="10.0" '
    'ZOrder="32768" FontSize="10" Valign="Middle" />\n'
    '<Xref Database="Entrez Gene" ID="2" /></DataNode>\n'
    '<Interaction GraphId="eee33"><Graphics ZOrder="12288" '
    'LineThickness="1.0">\n'
    '<Point X="30.0" Y="20.0" GraphRef="aaa11" RelX="1.0" RelY="0.0" />\n'
    '<Point X="70.0" Y="20.0" GraphRef="bbb22" RelX="-1.0" RelY="0.0" '
    'ArrowHead="Arrow" />\n'
    '</Graphics><Xref Database="" ID="" /></Interaction>\n'
    '</Pathway>'
)
GPML_2013A = GPML_TEMPLATE.format(ns="http://pathvisio.org/GPML/2013a")


def test_default_profile_is_2013a():
    doc = convert_island(GPML_2013A)
    assert doc["pathway"]["gpmlElementName"] == "Pathway"
    # Arrow marker enriches the edge type via MarkerMappings
    assert "Interaction" in doc["entitiesById"]["eee33"]["type"]


def test_variant_namespace_profile():
    """A profile accepting a different namespace converts documents the
    default profile rejects — the seam a GPML2021 profile would use."""
    future_ns = "http://pathvisio.org/GPML/2021"
    gpml = GPML_TEMPLATE.format(ns=future_ns)
    with pytest.raises(ConversionError, match="Unsupported namespace"):
        convert_island(gpml)
    variant = replace(
        GPML2013A, name="GPML2021-toy",
        supported_namespaces=GPML2013A.supported_namespaces + (future_ns,))
    doc = convert_island(gpml, profile=variant)
    assert set(doc["entitiesById"]) == {"aaa11", "bbb22", "eee33"}


def test_variant_marker_table_profile():
    """Emptying the marker table removes marker-derived type enrichment —
    output changes purely through the profile's tables."""
    variant = replace(GPML2013A, name="no-markers", marker_mappings={})
    base = convert_island(GPML_2013A)
    out = convert_island(GPML_2013A, profile=variant)
    assert base["entitiesById"]["eee33"]["markerEnd"] == "Arrow"
    assert out["entitiesById"]["eee33"]["markerEnd"] == "Arrow"
    base_types = set(base["entitiesById"]["eee33"]["type"])
    out_types = set(out["entitiesById"]["eee33"]["type"])
    assert out_types < base_types  # enrichment gone, identity types remain


def test_profile_is_complete_bundle():
    assert isinstance(GPML2013A, ConversionProfile)
    for field_name in ("key_mappings", "key_value_converters",
                      "value_mappings", "value_converters",
                      "gpml_defaults", "marker_mappings",
                      "group_mappings_by_style", "supported_namespaces"):
        assert getattr(GPML2013A, field_name)


GPML_2021 = '''<?xml version="1.0" encoding="UTF-8"?>
<Pathway xmlns="http://pathvisio.org/GPML/2021" title="t" version="1">
<Graphics boardWidth="100.0" boardHeight="100.0" />
<DataNodes>
<DataNode textLabel="A" elementId="aaa11" type="Protein">
<Graphics centerX="20.0" centerY="20.0" width="20.0" height="10.0" \
zOrder="32768" fontSize="10" valign="Middle" />
<Xref dataSource="Entrez Gene" identifier="1" /></DataNode>
<DataNode textLabel="B" elementId="bbb22" type="Protein">
<Graphics centerX="80.0" centerY="20.0" width="20.0" height="10.0" \
zOrder="32768" fontSize="10" valign="Middle" />
<Xref dataSource="Entrez Gene" identifier="2" /></DataNode>
</DataNodes>
<Interactions>
<Interaction elementId="eee33"><Graphics zOrder="12288" \
lineThickness="1.0" />
<Waypoints>
<Point x="30.0" y="20.0" elementRef="aaa11" relX="1.0" relY="0.0" />
<Point x="70.0" y="20.0" elementRef="bbb22" relX="-1.0" relY="0.0" \
arrowHead="Arrow" />
</Waypoints>
<Xref dataSource="" identifier="" /></Interaction>
</Interactions>
</Pathway>'''


def test_gpml2021_profile_end_to_end_matches_2013a_twin():
    """The shipped GPML2021 profile: the same pathway expressed in the
    2021 schema (elementId/elementRef, lowerCamelCase attrs, Xref
    dataSource/identifier, plural containers, Waypoints) converts to
    the SAME pvjson as its 2013a twin — every entity field equal; only
    pathway.id (sha256 of the exact input text) may differ."""
    from gpml2pvjson_js_ray.functions.profile import GPML2021, PROFILES

    base = convert_island(GPML_2013A)
    out = convert_island(GPML_2021, profile=GPML2021)
    assert out["entitiesById"] == base["entitiesById"]
    pw_a = {k: v for k, v in base["pathway"].items() if k != "id"}
    pw_b = {k: v for k, v in out["pathway"].items() if k != "id"}
    assert pw_a == pw_b
    assert PROFILES["gpml2021"] is GPML2021


def test_gpml2021_rejected_by_default_profile():
    with pytest.raises(ConversionError, match="Unsupported namespace"):
        convert_island(GPML_2021)


def test_cli_convert_gpml2021_profile(tmp_path):
    """convert --profile gpml2021 end-to-end through the CLI surface."""
    import json
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable, "-m", "gpml2pvjson_js_ray", "convert",
         "--profile", "gpml2021", "--id", "http://example.org/WP2021"],
        input=GPML_2021.encode(), capture_output=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr.decode()
    doc = json.loads(r.stdout.decode().strip())
    assert set(doc["entitiesById"]) == {"aaa11", "bbb22", "eee33"}
    assert doc["entitiesById"]["eee33"]["markerEnd"] == "Arrow"


# -- 2021 Annotation/Citation model + Anchors (round-5) ------------------------

GPML_2013A_CITED = '''<?xml version="1.0" encoding="UTF-8"?>
<Pathway xmlns="http://pathvisio.org/GPML/2013a" Name="t" Version="1">
<Graphics BoardWidth="100.0" BoardHeight="100.0" />
<DataNode TextLabel="A" GraphId="aaa11" Type="Protein">
<BiopaxRef>c1</BiopaxRef>
<Graphics CenterX="20.0" CenterY="20.0" Width="20.0" Height="10.0" \
ZOrder="32768" FontSize="10" Valign="Middle" />
<Xref Database="Entrez Gene" ID="1" /></DataNode>
<Interaction GraphId="eee33"><Graphics ZOrder="12288" LineThickness="1.0">
<Point X="30.0" Y="20.0" GraphRef="aaa11" RelX="1.0" RelY="0.0" />
<Point X="70.0" Y="20.0" />
<Anchor Position="0.5" GraphId="anc44" Shape="None" />
</Graphics><Xref Database="" ID="" /></Interaction>
<Biopax>
<bp:PublicationXref xmlns:bp="http://www.biopax.org/release/biopax-level3.owl#" \
xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" rdf:id="c1">
<bp:ID>12345</bp:ID>
<bp:DB>PubMed</bp:DB>
</bp:PublicationXref>
<bp:openControlledVocabulary \
xmlns:bp="http://www.biopax.org/release/biopax-level3.owl#">
<bp:TERM>signaling pathway</bp:TERM>
<bp:ID>PW:0000003</bp:ID>
<bp:Ontology>Pathway Ontology</bp:Ontology>
</bp:openControlledVocabulary>
</Biopax>
</Pathway>'''

GPML_2021_CITED = '''<?xml version="1.0" encoding="UTF-8"?>
<Pathway xmlns="http://pathvisio.org/GPML/2021" title="t" version="1">
<Graphics boardWidth="100.0" boardHeight="100.0" />
<DataNodes>
<DataNode textLabel="A" elementId="aaa11" type="Protein">
<CitationRef elementRef="c1" />
<AnnotationRef elementRef="ann1" />
<Graphics centerX="20.0" centerY="20.0" width="20.0" height="10.0" \
zOrder="32768" fontSize="10" valign="Middle" />
<Xref dataSource="Entrez Gene" identifier="1" /></DataNode>
</DataNodes>
<Interactions>
<Interaction elementId="eee33"><Graphics zOrder="12288" \
lineThickness="1.0" />
<Waypoints>
<Point x="30.0" y="20.0" elementRef="aaa11" relX="1.0" relY="0.0" />
<Point x="70.0" y="20.0" />
<Anchor position="0.5" elementId="anc44" shape="None" />
</Waypoints>
<Xref dataSource="" identifier="" /></Interaction>
</Interactions>
<Annotations>
<Annotation elementId="ann1" value="signaling pathway" type="Ontology">
<Xref dataSource="Pathway Ontology" identifier="PW:0000003" /></Annotation>
</Annotations>
<Citations>
<Citation elementId="c1"><Xref dataSource="PubMed" \
identifier="12345" /></Citation>
</Citations>
</Pathway>'''


def test_gpml2021_annotation_citation_model_matches_2013a_twin():
    """The 2021 Annotation/Citation model and Waypoints-held Anchors
    (round-5): Citations become Biopax PublicationXrefs (with the
    citation-rank wiring via CitationRef→BiopaxRef), Annotations become
    the pathway-level controlled vocabulary, Anchors convert to the
    same burr entity — field-for-field equal to the 2013a twin."""
    from gpml2pvjson_js_ray.functions.profile import GPML2021

    base = convert_island(GPML_2013A_CITED)
    out = convert_island(GPML_2021_CITED, profile=GPML2021)
    assert out["entitiesById"] == base["entitiesById"]
    pw_a = {k: v for k, v in base["pathway"].items() if k != "id"}
    pw_b = {k: v for k, v in out["pathway"].items() if k != "id"}
    assert pw_a == pw_b
    # the interesting structure really is there, not vacuously equal:
    ents = out["entitiesById"]
    assert "anc44" in ents                       # Anchor → burr entity
    cited = ents["aaa11"]
    assert any("12345" in str(v) for v in cited.get("xrefs", [])) or \
        "citedBy" in str(cited) or "c1" in str(cited)
