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
                      "size-and-proportion", "shapes", "labels"]

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
