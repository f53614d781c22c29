"""Round-trip parity over the reference styling fixture families: invert
expected pvjson → GPML (tests/fixture_inverse.py), convert with our engine,
and require field-exact equality with the reference expected JSON."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from gpml2pvjson_js_ray.functions.convert import convert_island

from tests.fixture_inverse import expected_to_gpml

EXPECTED_DIR = Path("/root/reference/test/expected")

# fixtures composed purely of Shape/Label/DataNode SingleFreeNodes
NODE_ONLY_FIXTURES = ["z-index", "fill-and-stroke", "text-and-font",
                      "size-and-proportion", "shapes", "labels",
                      "data-nodes", "double-edge", "graphical-lines",
                      "publication-xrefs"]

# fixtures whose pathway.contains has zIndex TIES between entities emitted
# on different reference streams: the reference's highland merge interleaves
# arrival non-deterministically for ties, so only set-equality (plus the
# zIndex sort invariant) is comparable
TIE_ORDER_FIXTURES = ["groups", "interactions"]

# pvjson keys whose values cannot be recovered from the expected output
# (pathway.id is a hash of the unavailable original bytes; textContent on
# the pathway is a stale golden key — see test_convert_micro.py)
PATHWAY_IGNORE = {"id", "textContent", "isSimilarTo", "@context"}


@pytest.mark.parametrize("name", NODE_ONLY_FIXTURES)
def test_styling_fixture_round_trip(name):
    expected = json.loads((EXPECTED_DIR / f"{name}.json").read_text())
    gpml = expected_to_gpml(expected)
    out = convert_island(gpml)

    assert set(out["entitiesById"]) == set(expected["entitiesById"])
    mismatches = []
    for eid, exp_entity in expected["entitiesById"].items():
        mine = out["entitiesById"][eid]
        for key in set(mine) | set(exp_entity):
            if mine.get(key) != exp_entity.get(key):
                mismatches.append((eid, key, mine.get(key),
                                   exp_entity.get(key)))
    assert not mismatches, f"{len(mismatches)} field diffs: {mismatches[:6]}"
    assert out["pathway"]["contains"] == expected["pathway"]["contains"]


@pytest.mark.parametrize("name", TIE_ORDER_FIXTURES)
def test_tie_order_fixture_round_trip(name):
    expected = json.loads((EXPECTED_DIR / f"{name}.json").read_text())
    gpml = expected_to_gpml(expected)
    out = convert_island(gpml)

    assert set(out["entitiesById"]) == set(expected["entitiesById"])
    mismatches = []
    for eid, exp_entity in expected["entitiesById"].items():
        mine = out["entitiesById"][eid]
        for key in set(mine) | set(exp_entity):
            if mine.get(key) != exp_entity.get(key):
                mismatches.append((eid, key, mine.get(key),
                                   exp_entity.get(key)))
    assert not mismatches, f"{len(mismatches)} field diffs: {mismatches[:6]}"
    # contains: same membership; ordering comparable only up to zIndex ties
    assert set(out["pathway"]["contains"]) == \
        set(expected["pathway"]["contains"])
    z = {eid: out["entitiesById"][eid].get("zIndex")
         for eid in out["pathway"]["contains"]}
    keyed = [z[eid] for eid in out["pathway"]["contains"]
             if z[eid] is not None]
    assert keyed == sorted(keyed)
