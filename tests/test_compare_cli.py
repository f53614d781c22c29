"""Drive the distributed regression-compare harness end-to-end on a
slice of the reference golden corpus (clean case, planted-diff case,
and missing-golden case)."""
import glob
import io
import json
import os
from contextlib import redirect_stdout
from pathlib import Path

import pytest

from gpml2pvjson_js_ray import cli
from gpml2pvjson_js_ray.functions.diffing import diff_documents

from tests.fixture_inverse import expected_to_gpml

EXPECTED_DIR = Path("/root/reference/test/expected")
# micro fixtures with no known golden quirks (covered clean by the
# full-corpus sweep in test_all_fixtures.py)
NAMES = ["one-node", "one-edge", "shapes"]


@pytest.fixture(scope="module")
def compare_dirs(tmp_path_factory):
    d = tmp_path_factory.mktemp("cmp")
    gpml, golden = d / "gpml", d / "golden"
    gpml.mkdir(), golden.mkdir()
    for name in NAMES:
        expected = json.loads((EXPECTED_DIR / f"{name}.json").read_text())
        (gpml / f"{name}.gpml").write_text(expected_to_gpml(expected))
        # goldens with the sha-of-input id dropped (harness ignores it)
        (golden / f"{name}.json").write_text(json.dumps(expected))
    return str(gpml), str(golden)


def _run(gpml, golden):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(["compare", "--gpml", gpml, "--expected", golden,
                       "--num-cpus", "4"])
    lines = [json.loads(x) for x in buf.getvalue().splitlines()]
    return rc, lines[:-1], lines[-1]


def test_compare_clean_corpus(ray_session, compare_dirs):
    gpml, golden = compare_dirs
    rc, rows, summary = _run(gpml, golden)
    assert rc == 0
    assert summary == {"compared": 3, "clean": 3,
                       "with_diffs_or_errors": 0}
    assert all(r["n_diffs"] == 0 and not r["error"] for r in rows)
    assert all(r["n_entities"] > 0 for r in rows)


def test_compare_flags_planted_diff_and_missing_golden(
        ray_session, compare_dirs, tmp_path):
    gpml_src, golden_src = compare_dirs
    gpml, golden = tmp_path / "gpml", tmp_path / "golden"
    gpml.mkdir(), golden.mkdir()
    for p in glob.glob(os.path.join(gpml_src, "*.gpml")):
        (gpml / os.path.basename(p)).write_text(open(p).read())
    for p in glob.glob(os.path.join(golden_src, "*.json")):
        (golden / os.path.basename(p)).write_text(open(p).read())
    # plant a wrong field in one golden
    doc = json.loads((golden / f"{NAMES[0]}.json").read_text())
    eid = next(iter(doc["entitiesById"]))
    doc["entitiesById"][eid]["height"] = -1
    (golden / f"{NAMES[0]}.json").write_text(json.dumps(doc))
    # remove another golden entirely
    os.unlink(golden / f"{NAMES[1]}.json")

    rc, rows, summary = _run(str(gpml), str(golden))
    assert rc == 1
    assert summary["with_diffs_or_errors"] == 2
    by_name = {r["name"]: r for r in rows}
    assert by_name[NAMES[0]]["n_diffs"] == 1
    assert by_name[NAMES[0]]["first_diffs"][0]["field"] == "height"
    assert by_name[NAMES[1]]["error"] == "missing-golden"
    assert by_name[NAMES[2]]["n_diffs"] == 0


def test_diff_documents_symmetry():
    a = {"entitiesById": {"x": {"k": 1}}, "pathway": {"contains": ["x"]}}
    b = {"entitiesById": {"x": {"k": 2}, "y": {}},
         "pathway": {"contains": ["x", "y"]}}
    d = diff_documents(a, b)
    fields = {(r["entity"], r["field"]) for r in d}
    assert ("y", "<entity>") in fields
    assert ("x", "k") in fields
    assert ("<pathway>", "contains") in fields
