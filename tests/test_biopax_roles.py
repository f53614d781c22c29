"""BioPAX interaction typing / role assignment
(pvjsonToBioPAX/Interaction.ts:94-276 semantics)."""

from __future__ import annotations

from gpml2pvjson_js_ray.functions.biopax import assign_interaction_roles


def _node(eid, wp_type, extra_types=()):
    return {"id": eid, "kaavioType": "SingleFreeNode",
            "type": [wp_type, *extra_types], "wpType": wp_type,
            "width": 80, "height": 20}


def _edge(eid, src, tgt, marker_end=None, marker_start=None, types=None):
    e = {"id": eid, "kaavioType": "Edge", "gpmlElementName": "Interaction",
         "type": types or ["Interaction", "Edge"],
         "points": [{"isAttachedTo": src}, {"isAttachedTo": tgt}]}
    if marker_end:
        e["markerEnd"] = marker_end
    if marker_start:
        e["markerStart"] = marker_start
    return e


def test_tbar_is_inhibition_control():
    ents = {"a": _node("a", "Protein"), "b": _node("b", "GeneProduct"),
            "e": _edge("e", "a", "b", marker_end="TBar")}
    out = assign_interaction_roles(ents, ents["e"])
    assert out["biopaxType"] == "Control"
    assert out["controlType"] == "INHIBITION"
    assert out["controller"] == "a" and out["controlled"] == "b"
    assert out["wpInteractionType"] == "Inhibition"


def test_plain_arrow_between_physical_entities_becomes_conversion():
    # Arrow + both ends PhysicalEntity → mim-conversion → Conversion with
    # left/right and LEFT-TO-RIGHT (Interaction.ts:128-165,213-227)
    ents = {"a": _node("a", "Metabolite"), "b": _node("b", "Metabolite"),
            "e": _edge("e", "a", "b", marker_end="Arrow")}
    out = assign_interaction_roles(ents, ents["e"])
    assert out["biopaxType"] == "Conversion"
    assert out["left"] == "a" and out["right"] == "b"
    assert out["conversionDirection"] == "LEFT-TO-RIGHT"


def test_double_arrow_is_reversible():
    ents = {"a": _node("a", "Metabolite"), "b": _node("b", "Metabolite"),
            "e": _edge("e", "a", "b", marker_end="Arrow",
                       marker_start="Arrow")}
    out = assign_interaction_roles(ents, ents["e"])
    assert out["conversionDirection"] == "REVERSIBLE"


def test_marker_start_flips_source_and_target():
    # graphical start marker → logical source is the LAST point
    ents = {"a": _node("a", "Protein"), "b": _node("b", "Protein"),
            "e": _edge("e", "a", "b", marker_start="TBar")}
    out = assign_interaction_roles(ents, ents["e"])
    assert out["controller"] == "b" and out["controlled"] == "a"


def test_arrow_onto_edge_becomes_stimulation():
    # node → (anchor on) another edge: source PE, target edge →
    # mim-stimulation → Control ACTIVATION
    other_edge = {"id": "x", "kaavioType": "Edge", "type": ["Interaction"],
                  "points": [{}, {}]}
    ents = {"a": _node("a", "Protein"), "x": other_edge,
            "e": _edge("e", "a", "x", marker_end="Arrow")}
    out = assign_interaction_roles(ents, ents["e"])
    assert out["biopaxType"] == "Control"
    assert out["controlType"] == "ACTIVATION"


def test_catalysis_on_generic_interaction_promotes_conversion():
    # mim-catalysis onto an interaction with 2 participants → the controlled
    # interaction is promoted to Conversion with left/right
    # (Interaction.ts:255-271)
    controlled = _edge("c", "m1", "m2", types=["Interaction", "Edge"])
    controlled["participants"] = ["m1", "m2"]
    ents = {"enz": _node("enz", "Protein"),
            "m1": _node("m1", "Metabolite"), "m2": _node("m2", "Metabolite"),
            "c": controlled,
            "e": _edge("e", "enz", "c", marker_end="mim-catalysis")}
    out = assign_interaction_roles(ents, ents["e"])
    assert out["biopaxType"] == "Catalysis"
    assert out["controller"] == "enz" and out["controlled"] == "c"
    assert "Conversion" in ents["c"]["type"]
    assert ents["c"]["left"] == "m1" and ents["c"]["right"] == "m2"
    assert "participants" not in ents["c"]


def test_invalid_catalysis_downgrades_to_generic():
    # controller that maps to no BioPAX node class (e.g. a Label with no
    # wpType) → Catalysis downgraded to generic Interaction
    # (Interaction.ts:240-253)
    label = {"id": "lab", "kaavioType": "SingleFreeNode",
             "type": ["Label", "SingleFreeNode"], "width": 10, "height": 10}
    ents = {"lab": label, "b": _node("b", "Metabolite"),
            "e": _edge("e", "lab", "b", marker_end="mim-catalysis")}
    out = assign_interaction_roles(ents, ents["e"])
    assert out["type"] == ["Interaction"]
    assert out["participants"] == ["b", None] or "participants" in out


def test_unconnected_interaction_gets_no_roles():
    ents = {"e": {"id": "e", "kaavioType": "Edge", "type": ["Interaction"],
                  "points": [{"x": 0, "y": 0}, {"x": 1, "y": 1}]}}
    out = assign_interaction_roles(ents, ents["e"])
    assert "participants" not in out and "controller" not in out


# -- group typing (pvjsonToBioPAX/Group.ts:16-42) ---------------------------

def test_group_with_edge_is_pathway_else_complex():
    from gpml2pvjson_js_ray.functions.biopax import assign_group_biopax_type

    edge = {"id": "e", "points": [{"x": 0, "y": 0}]}
    node = {"id": "n", "width": 10, "height": 10}

    g = {"id": "g", "type": ["Group", "GroupComplex", "Complex"]}
    assign_group_biopax_type([node, edge], g)
    assert "Pathway" in g["type"] and "Complex" not in g["type"]

    g2 = {"id": "g2", "type": ["Group", "GroupPathway", "Pathway"]}
    assign_group_biopax_type([node], g2)
    assert "Complex" in g2["type"] and "Pathway" not in g2["type"]


def test_groups_fixture_emits_group_rdf_type_triples():
    """The groups fixture: every group gets exactly one rdf:type triple,
    Pathway iff it contains an edge (Group.ts:16-42); the pvjson output
    itself stays untyped (the rule lives in the BioPAX emission pass)."""
    import json

    from tests.fixture_inverse import expected_to_gpml
    from gpml2pvjson_js_ray.functions.convert import convert_island
    from gpml2pvjson_js_ray.functions.triples import emit_triples

    exp = json.load(open("/root/reference/test/expected/groups.json"))
    out = convert_island(expected_to_gpml(exp))
    ents = out["entitiesById"]
    triples = emit_triples(out, "u")
    typed = {t["subj"]: t["obj"] for t in triples if t["pred"] == "rdf:type"
             and ents.get(t["subj"], {}).get("kaavioType") == "Group"}
    groups = {eid: e for eid, e in ents.items()
              if e.get("kaavioType") == "Group"}
    assert set(typed) == set(groups)
    for gid, g in groups.items():
        has_edge = any("points" in ents[cid]
                       for cid in g.get("contains", []) if cid in ents)
        assert typed[gid] == ("Pathway" if has_edge else "Complex"), gid
        # conversion output unmutated: still the static style types
        assert g["type"][0] == "Group"
