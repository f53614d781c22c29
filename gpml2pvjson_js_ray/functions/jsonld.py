"""JSON-LD list/set-value helpers.

Semantics match the reference's spinoffs/jsonld-utils.ts:47-89
(arrayify / getValuesLSV / intersectsLSV / unionLSV): an LSV is either a
scalar or a list; union preserves first-seen order and drops non-primitive
members (dicts without "@value")."""

from __future__ import annotations

_PRIMITIVES = (str, int, float, bool)


def arrayify(x):
    """None -> []; list -> list; scalar -> [scalar]."""
    if x is None:
        return []
    if isinstance(x, list):
        return x
    return [x]


def _unwrap(x):
    if isinstance(x, dict) and "@value" in x:
        return x["@value"]
    return x


def _is_primitive(x):
    return x is None or isinstance(x, _PRIMITIVES)


def get_values_lsv(x):
    """Arrayify, unwrap {"@value": v}, drop non-primitive members."""
    return [v for v in (_unwrap(i) for i in arrayify(x)) if _is_primitive(v)]


def intersects_lsv(a, b) -> bool:
    sa = set(get_values_lsv(a))
    return any(v in sa for v in get_values_lsv(b))


def union_lsv(*inputs):
    """Order-preserving set union of the primitive values of all inputs."""
    out = []
    seen = set()
    for inp in inputs:
        for v in get_values_lsv(inp):
            if v not in seen:
                seen.add(v)
                out.append(v)
    return out


def insert_if_not_exists(item, lst):
    """Reference gpml-utilities.ts:40-45 — idempotent append, in place."""
    if item not in lst:
        lst.append(item)
    return lst


def sort_by_map(map_to_sort_by, list_to_sort):
    """Reference gpml-utilities.ts:105-112 — stable sort of ids by a
    {id: zIndex} map (missing ids sort last, as undefined does in lodash)."""
    def key(item):
        v = map_to_sort_by.get(item)
        # lodash sortBy places undefined last
        return (v is None, v if v is not None else 0)
    return sorted(list_to_sort, key=key)
