"""Complete reference golden-corpus sweep: EVERY expected fixture in
/root/reference/test/expected/ (≈94 files: the 22-case elbow matrix, the
22-case curved matrix, 8 hyperedge variants, all micro fixtures, and the 14
full WikiPathways pathways) is inverted to GPML, converted by this engine,
and compared field-for-field.

Round-1 status: every fixture passes; the only allowed diffs in the entire
corpus are the two WP2211 orientation ulp-ties (see test_wp_fixtures.py)."""

from __future__ import annotations

import glob
import json
from pathlib import Path

import pytest

from gpml2pvjson_js_ray.functions.convert import convert_island

from tests.fixture_inverse import expected_to_gpml
from tests.test_wp_fixtures import ALLOWED_DIFFS

EXPECTED_DIR = Path("/root/reference/test/expected")

ALL_FIXTURES = sorted(
    Path(p).stem for p in glob.glob(str(EXPECTED_DIR / "*.json")))


@pytest.mark.parametrize("name", ALL_FIXTURES)
def test_every_reference_fixture_round_trips(name):
    expected = json.loads((EXPECTED_DIR / f"{name}.json").read_text())
    out = convert_island(expected_to_gpml(expected))

    assert set(out["entitiesById"]) == set(expected["entitiesById"])
    allowed = ALLOWED_DIFFS.get(name, set())
    mismatches = []
    for eid, exp_entity in expected["entitiesById"].items():
        mine = out["entitiesById"][eid]
        for key in set(mine) | set(exp_entity):
            if mine.get(key) != exp_entity.get(key) \
                    and (eid, key) not in allowed:
                mismatches.append((eid, key, str(mine.get(key))[:80],
                                   str(exp_entity.get(key))[:80]))
    assert not mismatches, f"{len(mismatches)} diffs: {mismatches[:5]}"
    assert set(out["pathway"]["contains"]) == \
        set(expected["pathway"]["contains"])
