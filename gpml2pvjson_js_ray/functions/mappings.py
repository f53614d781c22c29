"""Mapping tables driving GPML→pvjson conversion and triple emission.

These tables are the *semantics* of the conversion (what to compute); they
are re-expressed here as Python constants from the reference's JSON/TS data
files. Citations:

  KEY_MAPPINGS                 ← /root/reference/src/2013a/KeyMappings.json:1-47
  VALUE_MAPPINGS               ← /root/reference/src/2013a/ValueMappings.json:1-43
  GROUP_MAPPINGS_BY_STYLE      ← /root/reference/src/2013a/GroupMappingsByStyle.json:1-56
  MARKER_MAPPINGS              ← /root/reference/src/edge/MarkerMappings.json:1-140
  ARROW_HEAD_MAPPINGS          ← /root/reference/src/pvjsonToBioPAX/ArrowHeadMappings.json:1-140
  PVJSON_TO_BIOPAX             ← /root/reference/src/pvjsonToBioPAX/PvjsonToBioPAX.json:1-15
  VOCABULARY_NAME_TO_IRI       ← /root/reference/src/spinoffs/VOCABULARY_NAME_TO_IRI.json:1-5
  GPML_ELEMENT_NAME_TO_KAAVIO_TYPE ← /root/reference/src/Processor.ts:46-58
  defaults                     ← /root/reference/src/GPMLDefaults.ts:62-157
  supported namespaces         ← /root/reference/src/gpml-utilities.ts:114-119
"""

from __future__ import annotations

GPML_ELEMENT_NAME_TO_KAAVIO_TYPE = {
    "Anchor": "Burr",
    "BiopaxRef": "Citation",
    "DataNode": "SingleFreeNode",
    "GraphicalLine": "Edge",
    "Group": "Group",
    "Interaction": "Edge",
    "Label": "SingleFreeNode",
    "Shape": "SingleFreeNode",
    "State": "Burr",
}

# GPML key → pvjson key; special directives:
#   "pvjson:merge"  flatten the nested record into the parent
#   "pvjson:each"   explode GPML Attribute Key/Value children
#   "pvjson:delete" drop
KEY_MAPPINGS = {
    "Align": "textAlign",
    "Anchor": "pvjson:delete",
    "Attribute": "pvjson:each",
    "ArrowHead": "marker",
    "AUTHORS": "authors",
    "BiopaxRef": "citations",
    "BoardHeight": "height",
    "BoardWidth": "width",
    "CenterX": "x",
    "CenterY": "y",
    "Color": "stroke",
    "Comment": "comments",
    "ConnectorType": "drawAs",
    "DB": "xrefDataSource",
    "Database": "xrefDataSource",
    "FillColor": "fill",
    "FontName": "fontFamily",
    "FontDecoration": "textDecoration",
    "FontStrikethru": "textDecoration",
    "Graphics": "pvjson:merge",
    "GraphId": "id",
    "GraphRef": "isAttachedTo",
    "GroupId": "pvjson:delete",
    "$ID": "id",
    "ID": "xrefIdentifier",
    "LineStyle": "strokeDasharray",
    "LineThickness": "strokeWidth",
    "org.pathvisio.CellularComponentProperty": "cellularComponent",
    "org.pathvisio.DoubleLineProperty": "strokeStyle",
    "org.pathvisio.model.BackpageHead": "backpageHead",
    "Point": "points",
    "Position": "attachmentDisplay",
    "RelX": "attachmentDisplay",
    "RelY": "pvjson:delete",
    "Shape": "drawAs",
    "ShapeType": "drawAs",
    "Style": "pvjson:delete",
    "TextLabel": "textContent",
    "Title": "name",
    "TITLE": "standardName",
    "Type": "wpType",
    "Version": "dataSourceVersion",
    "Valign": "verticalAlign",
    "Xref": "pvjson:merge",
    "ZOrder": "zIndex",
}

# GPML enum value → pvjson value (shape names → kaavio drawAs names,
# arrowheads → canonical marker names, wpTypes → canonical wpTypes).
VALUE_MAPPINGS = {
    "GeneProdKegg enzymeuct": "Protein",
    "SimplePhysicalEntity": "Unknown",
    "Modifier": "Metabolite",
    "State": "Metabolite",
    "Arrow": "Arrow",
    "TBar": "TBar",
    "LigandRound": "none",
    "LigandSquare": "none",
    "Line": "none",
    "mim-binding": "MimBinding",
    "mim-branching-left": "MimBranchingLeft",
    "mim-branching-right": "MimBranchingRight",
    "mim-catalysis": "MimCatalysis",
    "mim-cleavage": "MimCleavage",
    "mim-conversion": "MimConversion",
    "mim-covalent-bond": "MimCovalentBond",
    "mim-gap": "MimGap",
    "mim-inhibition": "MimInhibition",
    "mim-modification": "MimModification",
    "mim-necessary-stimulation": "MimNecessaryStimulation",
    "mim-stimulation": "MimStimulation",
    "mim-transcription-translation": "MimTranscriptionTranslation",
    "Receptor": "none",
    "ReceptorSquare": "none",
    "Double": "double",
    "Arc": "ArcPathVisio",
    "Brace": "Brace",
    "Circle": "Ellipse",
    "Endoplasmic Reticulum": "EndoplasmicReticulum",
    "Golgi Apparatus": "GolgiApparatus",
    "Hexagon": "HexagonPathVisio",
    "mim-degradation": "MimDegradation",
    "Mitochondria": "Mitochondria",
    "Oval": "Ellipse",
    "Octagon": "Octagon",
    "Pentagon": "PentagonPathVisio",
    "Rectangle": "rect",
    "RoundedRectangle": "rect",
    "Triangle": "TrianglePathVisio",
    "Sarcoplasmic Reticulum": "SarcoplasmicReticulum",
    "None": "none",
}

# Group Style → GPML-level defaults applied before key mapping.
GROUP_MAPPINGS_BY_STYLE = {
    "None": {
        "Graphics": {
            "Padding": 8, "ShapeType": "Rectangle", "LineStyle": "Broken",
            "LineThickness": 1, "FillColor": "B4B464",
        },
        "type": ["Group", "GroupNone"],
    },
    "Group": {
        "Graphics": {
            "Padding": 8, "ShapeType": "None", "LineStyle": "Broken",
            "LineThickness": 0, "FillColor": "Transparent",
        },
        "type": ["Group", "GroupGroup"],
    },
    "Complex": {
        "Graphics": {
            "Padding": 11, "ShapeType": "Octagon", "LineStyle": "Solid",
            "LineThickness": 1, "FillColor": "B4B464",
        },
        "type": ["Group", "Complex", "GroupComplex"],
    },
    "Pathway": {
        "Graphics": {
            "Padding": 8, "ShapeType": "Rectangle", "LineStyle": "Broken",
            "LineThickness": 0.5, "FillColor": "00FF00",
        },
        "type": ["Group", "Pathway", "GroupPathway"],
    },
}

# Canonical marker name → per-vocabulary interaction types, merged into the
# edge's `type` LSV when an arrowhead is seen (edge/edge.ts:130-146). The
# "bp" member is a dict and therefore dropped by union_lsv, exactly as in the
# reference; only sbo + wp survive.
MARKER_MAPPINGS = {
    "Arrow": {
        "bp": {"name": "Interaction"},
        "sbo": ["SBO:0000167", "SBO:0000393", "SBO:0000394"],
        "wp": "DirectedInteraction",
    },
    "TBar": {
        "bp": {"name": "Control", "controlType": "INHIBITION"},
        "sbo": ["SBO:0000169"],
        "wp": "Inhibition",
    },
    "MIMGap": {"bp": {"name": "Interaction"}},
    "MIMBranchingRight": {"bp": {"name": "Interaction"}},
    "MIMBranchingLeft": {"bp": {"name": "Interaction"}},
    "MIMInhibition": {
        "bp": {"name": "Control", "controlType": "INHIBITION"},
        "sbo": ["SBO:0000169"],
        "wp": "Inhibition",
    },
    "MIMConversion": {
        "bp": {"name": "Conversion"},
        "sbo": ["SBO:0000182"],
        "wp": "Conversion",
    },
    "MIMNecessaryStimulation": {
        "bp": {"name": "Control", "controlType": "ACTIVATION"},
        "sbo": ["SBO:0000171"],
        "wp": "Stimulation",
    },
    "MIMBinding": {
        "bp": {"name": "MolecularInteraction"},
        "sbo": ["SBO:0000177"],
        "wp": "Binding",
    },
    "MIMStimulation": {
        "bp": {"name": "Control", "controlType": "ACTIVATION"},
        "sbo": ["SBO:0000170"],
        "wp": "Stimulation",
    },
    "MIMModification": {
        "bp": {"name": "BiochemicalReaction"},
        "sbo": ["SBO:0000210"],
        "wp": "DirectedInteraction",
    },
    "MIMCatalysis": {
        "bp": {"name": "Catalysis"},
        "sbo": ["SBO:0000172"],
        "wp": "Catalysis",
    },
    "MIMCleavage": {
        "bp": {"name": "Degradation"},
        "sbo": ["SBO:0000178"],
        "wp": "DirectedInteraction",
    },
    "MIMCovalentBond": {
        "bp": {"name": "BiochemicalReaction"},
        "sbo": ["SBO:0000210"],
        "wp": "DirectedInteraction",
    },
    "MIMTranscriptionTranslation": {
        "bp": {"name": "GeneticInteraction"},
        "sbo": ["SBO:0000183", "SBO:0000184"],
    },
    "none": {
        "bp": {"name": "Interaction"},
        "sbo": ["SBO:0000374"],
        "wp": "TranscriptionTranslation",
    },
}

# Lower-case mim-* keyed variant used by the BioPAX role-assignment pass
# (pvjsonToBioPAX/Interaction.ts:167-192). Same payloads as MARKER_MAPPINGS
# but keyed by the raw GPML arrowhead name.
ARROW_HEAD_MAPPINGS = {
    "Arrow": MARKER_MAPPINGS["Arrow"],
    "TBar": MARKER_MAPPINGS["TBar"],
    "mim-gap": MARKER_MAPPINGS["MIMGap"],
    "mim-branching-right": MARKER_MAPPINGS["MIMBranchingRight"],
    "mim-branching-left": MARKER_MAPPINGS["MIMBranchingLeft"],
    "mim-inhibition": MARKER_MAPPINGS["MIMInhibition"],
    "mim-conversion": MARKER_MAPPINGS["MIMConversion"],
    "mim-necessary-stimulation": MARKER_MAPPINGS["MIMNecessaryStimulation"],
    "mim-binding": MARKER_MAPPINGS["MIMBinding"],
    "mim-stimulation": MARKER_MAPPINGS["MIMStimulation"],
    "mim-modification": MARKER_MAPPINGS["MIMModification"],
    "mim-catalysis": MARKER_MAPPINGS["MIMCatalysis"],
    "mim-cleavage": MARKER_MAPPINGS["MIMCleavage"],
    "mim-covalent-bond": MARKER_MAPPINGS["MIMCovalentBond"],
    "mim-transcription-translation": MARKER_MAPPINGS["MIMTranscriptionTranslation"],
    "none": MARKER_MAPPINGS["none"],
}

# wpType / pvjson key → BioPAX class or pvjson key.
PVJSON_TO_BIOPAX = {
    "xrefIdentifier": "id",
    "xrefDataSource": "db",
    "title": "title",
    "source": "source",
    "year": "year",
    "author": "author",
    "Complex": "Complex",
    "GeneProduct": "Dna",
    "Metabolite": "SmallMolecule",
    "Pathway": "Pathway",
    "Protein": "Protein",
    "Rna": "Rna",
    "Unknown": "PhysicalEntity",
}

VOCABULARY_NAME_TO_IRI = {
    "Cell Type": "http://identifiers.org/cl/",
    "Disease": "http://identifiers.org/doid/",
    "Pathway Ontology": "http://identifiers.org/pw/",
}

SUPPORTED_NAMESPACES = [
    "http://pathvisio.org/GPML/2013a",
    "http://genmapp.org/GPML/2010a",
    "http://genmapp.org/GPML/2008a",
    "http://genmapp.org/GPML/2007",
]

BIOPAX_EDGE_TYPES = [
    "Interaction", "Control", "TemplateReactionRegulation", "Catalysis",
    "Modulation", "Conversion", "BiochemicalReaction",
    "TransportWithBiochemicalReaction", "ComplexAssembly", "Degradation",
    "Transport", "GeneticInteraction", "MolecularInteraction",
    "TemplateReaction",
]

BIOPAX_PHYSICAL_ENTITY_TYPES = [
    "Protein", "Dna", "Rna", "SmallMolecule", "Gene", "PhysicalEntity",
    "Complex",
]

BIOPAX_NODE_TYPES = BIOPAX_PHYSICAL_ENTITY_TYPES + [
    "PublicationXref", "UnificationXref", "RelationshipXref",
    "ProteinReference", "DnaReference", "RnaReference",
    "SmallMoleculeReference", "Pathway",
]

# ---------------------------------------------------------------------------
# Per-class GPML defaults (GPMLDefaults.ts). Applied as deep "defaults":
# values already present on the element win; nested dicts merge recursively.
# ---------------------------------------------------------------------------

FONT_ATTRIBUTES = {
    "Align": "Center",
    "FontDecoration": "Normal",
    "FontName": "Arial",
    "FontSize": 12,
    "FontStrikethru": "Normal",
    "FontStyle": "Normal",
    "FontWeight": "Normal",
    "lineHeight": 1.1,
    "overflow": "hidden",
    "textOverflow": "clip",
    "Valign": "Top",
    "whiteSpace": "pre",
}

SHAPE_STYLE_ATTRIBUTES = {
    "Color": "Black",
    "LineStyle": "Solid",
    "LineThickness": 1,
    "Padding": 8,
}


def _defaults_deep_all(dicts):
    out: dict = {}
    for d in dicts:
        for k, v in d.items():
            if k not in out:
                out[k] = v
    return out


GPML_DEFAULTS = {
    "Pathway": {"BoardHeight": 500, "Name": "Untitled Pathway"},
    "DataNode": {
        "Type": "Unknown",
        "Graphics": _defaults_deep_all([
            {"FillColor": "White", "ShapeType": "Rectangle"},
            FONT_ATTRIBUTES,
            SHAPE_STYLE_ATTRIBUTES,
        ]),
    },
    "Group": {
        "Graphics": {
            "Align": "Center", "Color": "808080", "Valign": "Middle",
            "FontSize": 1, "FontWeight": "Bold", "LineThickness": 1,
            "FillOpacity": 0.1,
        },
        "Style": "None",
    },
    # ZOrder 12288 is the XSD schema default the cxsd-generated Anchor and
    # edge-Graphics prototypes carry (observed in interactions.json: anchors
    # keep 12288 even when their parent edge has an explicit different
    # ZOrder — the prototype default preempts the parent fill-in,
    # Processor.ts:251-276)
    "Anchor": {"Shape": "None",
               "Graphics": {"LineThickness": 0, "ZOrder": 12288}},
    "Interaction": {
        "Graphics": {
            "Color": "Black", "LineStyle": "Solid",
            "ConnectorType": "Straight", "FillColor": "None",
            "LineThickness": 1, "ZOrder": 12288,
        },
    },
    "Label": {
        "Graphics": _defaults_deep_all([
            {"FillColor": "Transparent", "ShapeType": "None"},
            FONT_ATTRIBUTES,
            SHAPE_STYLE_ATTRIBUTES,
        ]),
    },
    "Shape": {
        "Graphics": _defaults_deep_all([
            {"FillColor": "Transparent", "FontSize": 10, "Rotation": "Top"},
            FONT_ATTRIBUTES,
            SHAPE_STYLE_ATTRIBUTES,
        ]),
    },
    "State": {
        "StateType": "Unknown",
        "Graphics": _defaults_deep_all([
            {"Align": "Center", "Padding": 1, "FillColor": "White",
             "FontSize": 10, "ShapeType": "Rectangle", "Valign": "Middle"},
            SHAPE_STYLE_ATTRIBUTES,
        ]),
    },
}
GPML_DEFAULTS["GraphicalLine"] = GPML_DEFAULTS["Interaction"]
