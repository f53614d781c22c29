"""G6 affine utilities (geom-utils.ts:303-538,596-686 semantics)."""

from __future__ import annotations

import math

import pytest

from gpml2pvjson_js_ray.functions.affine import (
    get_transformation_matrix, invert_matrix, multiply_matrices,
    multiply_matrix_by_vector, rotate, scale, transform, translate)


def _approx_mat(a, b, tol=1e-9):
    return all(abs(x - y) <= tol for ra, rb in zip(a, b)
               for x, y in zip(ra, rb))


def test_invert_matrix_roundtrip_and_edge_cases():
    m = [[2.0, 1.0, 0.0], [0.0, 1.0, 4.0], [1.0, 0.0, 1.0]]
    inv = invert_matrix(m)
    assert _approx_mat(multiply_matrices(m, inv),
                       [[1, 0, 0], [0, 1, 0], [0, 0, 1]])
    # zero pivot forces the row swap branch
    swap = [[0.0, 1.0], [1.0, 0.0]]
    assert _approx_mat(invert_matrix(swap), [[0, 1], [1, 0]])
    # non-square → None (reference returns undefined)
    assert invert_matrix([[1, 2, 3], [4, 5, 6]]) is None


def test_rotation_is_clockwise_for_y_down_axis():
    # 90° clockwise on a y-down canvas sends +x to +y
    v = multiply_matrix_by_vector(rotate(math.pi / 2), [[1], [0], [1]])
    assert v[0][0] == pytest.approx(0, abs=1e-12)
    assert v[1][0] == pytest.approx(1)


def test_transform_composition_and_origin():
    # scale 2x about the element CENTER (default origin): box grows
    # symmetrically around (15, 25)
    el = {"x": 10.0, "y": 20.0, "width": 10.0, "height": 10.0}
    out = transform(el, transformation_sequence=[
        {"key": "scale", "value": [2.0, 2.0]}])
    assert out["x"] == pytest.approx(5.0)
    assert out["y"] == pytest.approx(15.0)
    assert out["width"] == pytest.approx(20.0)
    assert out["height"] == pytest.approx(20.0)
    # scale about the top-left origin keeps x/y fixed
    el2 = {"x": 10.0, "y": 20.0, "width": 10.0, "height": 10.0}
    out2 = transform(el2, transform_origin="left top",
                     transformation_sequence=[
                         {"key": "scale", "value": [2.0, 2.0]}])
    assert (out2["x"], out2["y"]) == (pytest.approx(10.0),
                                      pytest.approx(20.0))
    assert out2["width"] == pytest.approx(20.0)


def test_transform_translate_and_em_origin():
    el = {"x": 0.0, "y": 0.0, "width": 12.0, "height": 12.0}
    out = transform(el, transformation_sequence=[
        {"key": "translate", "value": [3.0, 4.0]}])
    assert (out["x"], out["y"]) == (pytest.approx(3.0), pytest.approx(4.0))
    assert out["width"] == pytest.approx(12.0)
    # em origin: 1em == 12px (the reference's hacky rule), so origin
    # "1em 1em" == "100% 100%" for this 12x12 box — same scale result
    el_em = {"x": 0.0, "y": 0.0, "width": 12.0, "height": 12.0}
    el_pct = {"x": 0.0, "y": 0.0, "width": 12.0, "height": 12.0}
    seq = [{"key": "scale", "value": [0.5, 0.5]}]
    assert transform(el_em, "1em 1em", list(seq)) == \
        transform(el_pct, "100% 100%", list(seq))


def test_finite_guards_raise():
    for fn, bad in ((rotate, float("nan")),
                    (scale, [1.0, float("inf")]),
                    (translate, [float("nan"), 0.0])):
        with pytest.raises(ValueError):
            fn(bad)


def test_get_transformation_matrix_order():
    # translate then scale != scale then translate
    a = get_transformation_matrix([
        {"key": "translate", "value": [1.0, 0.0]},
        {"key": "scale", "value": [2.0, 2.0]}])
    b = get_transformation_matrix([
        {"key": "scale", "value": [2.0, 2.0]},
        {"key": "translate", "value": [1.0, 0.0]}])
    va = multiply_matrix_by_vector(a, [[1], [1], [1]])
    vb = multiply_matrix_by_vector(b, [[1], [1], [1]])
    assert va == [[3.0], [2.0], [1.0]]
    assert vb == [[4.0], [2.0], [1.0]]
