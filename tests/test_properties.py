"""Property-based tests: determinism, idempotence, robustness."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from gpml2pvjson_js_ray.functions.convert import (ConversionError,
                                                  convert_island)
from gpml2pvjson_js_ray.functions.islands import extract_islands
from gpml2pvjson_js_ray.functions.jsonld import (intersects_lsv, sort_by_map,
                                                 union_lsv)
from gpml2pvjson_js_ray.functions.processor import (GraphIdManager,
                                                    _parse_int_hex)
from gpml2pvjson_js_ray.functions.textextract import extract_text
from gpml2pvjson_js_ray.sources.pages import gen_page


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=5000))
def test_generator_is_deterministic_and_text_invariant_holds(i):
    a = gen_page(i)
    b = gen_page(i)
    assert a == b
    assert extract_text(a["html"].decode()) == a["text"]


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=3000))
def test_conversion_is_deterministic_per_island(i):
    page = gen_page(i)
    for island in extract_islands(page["html"].decode()):
        try:
            out1 = convert_island(island)
            out2 = convert_island(island)
        except ConversionError:
            continue
        assert json.dumps(out1, sort_keys=True) == \
            json.dumps(out2, sort_keys=True)
        # generated ids are stable and namespaced
        for eid in out1["entitiesById"]:
            assert isinstance(eid, str) and eid


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=200))
def test_convert_never_crashes_unexpectedly(text):
    """Arbitrary garbage must raise ConversionError, never anything else."""
    try:
        convert_island(text)
    except ConversionError:
        pass


@given(st.lists(st.one_of(st.text(max_size=5), st.integers(), st.none()),
                max_size=10),
       st.lists(st.one_of(st.text(max_size=5), st.integers()), max_size=10))
def test_union_lsv_properties(a, b):
    u = union_lsv(a, b)
    # no duplicates, order-preserving, superset membership
    assert len(u) == len(set(u))
    for v in u:
        assert v in a or v in b
    if any(v in u for v in b):
        assert intersects_lsv(u, b)


@given(st.text(alphabet="0123456789abcdefxyz-", max_size=12))
def test_parse_int_hex_matches_js_semantics(s):
    """parseInt(s, 16): longest valid hex prefix or NaN."""
    out = _parse_int_hex(s)
    stripped = s.strip()
    i = 1 if stripped[:1] in "+-" else 0
    j = i
    while j < len(stripped) and stripped[j] in "0123456789abcdefABCDEF":
        j += 1
    if j == i:
        assert out is None
    else:
        expected = int(stripped[:j], 16)
        if stripped[:1] == "-":
            expected = expected  # sign handled inside int()
        assert out == expected


def test_graph_id_manager_stability():
    m = GraphIdManager()
    assert m.generate_and_record() == "pvjsgeneratedida01"
    m.record_existing("d6efe")          # hex-parseable, bumps counter
    assert m.generate_and_record() == "pvjsgeneratedid" + format(0xD6EFE + 1,
                                                                 "x")
    m.record_existing("idabc")          # 'i' not hex → ignored
    before = m.value
    m.record_existing("zzz")
    assert m.value == before


@given(st.dictionaries(st.text(max_size=4), st.integers(), max_size=8),
       st.lists(st.text(max_size=4), max_size=8))
def test_sort_by_map_stable_and_total(z_map, ids):
    out = sort_by_map(z_map, ids)
    assert sorted(out) == sorted(ids)
    keyed = [z_map[i] for i in out if i in z_map]
    assert keyed == sorted(keyed)
