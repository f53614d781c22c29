"""Per-document conversion state + the key/value mapping engine.

From-scratch re-expression of the reference Processor (Processor.ts:87-561).
The reference resolves forward references with promise caches over highland
streams; since we parse a whole island before converting (document-level
parallelism lives in Ray Data), those collapse to plain dict lookups.
State is strictly per-document — a fresh Processor per island, never shared
across documents (SURVEY.md §2.3 ST1/ST2).
"""

from __future__ import annotations

from .camel import camel_case
from .jsonld import union_lsv
from .mappings import (GPML_ELEMENT_NAME_TO_KAAVIO_TYPE, KEY_MAPPINGS,
                       VALUE_MAPPINGS)
from .value_converters import (KEY_VALUE_CONVERTERS, VALUE_CONVERTERS,
                               _normalize_number)

_SKIP = ("", None)


def _is_skippable(v) -> bool:
    return v is None or v == ""


class GraphIdManager:
    """Deterministic id synthesis (GraphIdManager.ts:31-53): namespace
    'pvjsgeneratedid' + an incrementing hex counter seeded at 0xa00 and kept
    above the largest hex-parseable existing id."""

    NAMESPACE = "pvjsgeneratedid"

    def __init__(self):
        self.value = 0xA00

    def generate_and_record(self) -> str:
        self.value += 1
        return self.NAMESPACE + format(self.value, "x")

    def record_existing(self, graph_id: str):
        parsed = _parse_int_hex(graph_id)
        if parsed is not None and parsed > self.value:
            self.value = parsed


def _parse_int_hex(s):
    """JS parseInt(s, 16): parse the longest valid hex prefix; None if the
    first character is not a hex digit."""
    if not isinstance(s, str):
        return None
    s = s.strip()
    i = 0
    if i < len(s) and s[i] in "+-":
        i += 1
    j = i
    while j < len(s) and s[j] in "0123456789abcdefABCDEF":
        j += 1
    if j == i:
        return None
    return int(s[:j], 16)


class Processor:
    def __init__(self,
                 key_mappings=None,
                 key_value_converters=None,
                 value_mappings=None,
                 value_converters=None,
                 profile=None):
        """Tables default from the ConversionProfile (functions/profile.py;
        GPML2013a when neither tables nor profile are given) — the
        reference's pluggable-table constructor (Processor.ts:148-166)."""
        if profile is None:
            from .profile import GPML2013A
            profile = GPML2013A
        self.profile = profile
        self.key_mappings = (key_mappings if key_mappings is not None
                             else profile.key_mappings)
        self.key_value_converters = (
            key_value_converters if key_value_converters is not None
            else profile.key_value_converters)
        self.value_mappings = (value_mappings if value_mappings is not None
                               else profile.value_mappings)
        self.value_converters = (value_converters
                                 if value_converters is not None
                                 else profile.value_converters)

        self.graph_id_manager = GraphIdManager()
        self.graph_ids_by_graph_ref: dict[str, list] = {}
        self.contained_graph_ids_by_group_group_id: dict[str, list] = {}
        self.gpml_element_by_graph_id: dict[str, dict] = {}
        self.graph_id_by_group_id: dict[str, str] = {}
        self.graph_id_to_z_index: dict[str, float] = {}

        self.entities_by_id: dict[str, dict] = {}
        self.pathway: dict = {
            # PathwayStarter defaults (Processor.ts:88-121)
            "fill": "white",
            "strokeWidth": 0,
            "stroke": "black",
            "contains": [],
            "drawAs": "rect",
            "gpmlElementName": "Pathway",
            "height": 0,
            "id": None,
            "kaavioType": "Group",
            "name": "New Pathway",
            "padding": 5,
            "type": ["Pathway"],
            "width": 0,
            "x": 0,
            "y": 0,
            "zIndex": 0,
            "fontSize": 12,
            "fontWeight": "bold",
            "textAlign": "left",
            "verticalAlign": "top",
        }

    # -- element bookkeeping (Processor.ts:212-326) -------------------------

    def ensure_graph_id_exists(self, gpml_element: dict) -> dict:
        graph_id = gpml_element.get("GraphId")
        if graph_id is None or graph_id == "":
            graph_id = self.graph_id_manager.generate_and_record()
            gpml_element["GraphId"] = graph_id
        else:
            self.graph_id_manager.record_existing(graph_id)

        group_ref = gpml_element.get("GroupRef")
        if group_ref:
            self.contained_graph_ids_by_group_group_id.setdefault(
                group_ref, []).append(graph_id)

        group_id = gpml_element.get("GroupId")
        if group_id:
            self.graph_id_by_group_id[group_id] = graph_id
        return gpml_element

    def preprocess_gpml_element(self, gpml_element: dict) -> dict:
        el = self.ensure_graph_id_exists(gpml_element)
        self.gpml_element_by_graph_id[el["GraphId"]] = el
        return el

    def fill_in_gpml_properties_from_parent(self, parent: dict,
                                            child: dict) -> dict:
        """defaultsDeep the parent's Graphics.ZOrder into the child
        (Processor.ts:251-276).

        NOTE: retained for API parity but NOT called by the conversion
        driver — across every reference fixture this fill-in observably
        never lands (States carry no zIndex even under parents that do;
        Anchors keep their XSD-default 12288 under edges with different
        explicit ZOrder), because the cxml prototype sentinels defeat
        lodash defaultsDeep in the reference."""
        z = parent.get("Graphics", {}).get("ZOrder")
        graphics = child.setdefault("Graphics", {})
        if "ZOrder" not in graphics and z is not None:
            graphics["ZOrder"] = z
        return child

    # -- the key/value mapping engine (Processor.ts:342-560) ----------------

    def process_properties(self, gpml_element: dict) -> dict:
        pairs = []
        for kv in gpml_element.items():
            pairs.extend(self.process_kv(gpml_element, kv))
        entity = dict(pairs)
        if entity.get("rotation"):
            entity["textRotation"] = _normalize_number(
                -1 * entity["rotation"])
        return entity

    def process_type(self, gpml_element_name: str, processed: dict) -> dict:
        kaavio_type = GPML_ELEMENT_NAME_TO_KAAVIO_TYPE.get(gpml_element_name)
        processed["type"] = union_lsv(
            processed.get("type"), gpml_element_name, kaavio_type)
        if processed.get("xrefDataSource") and processed.get("xrefIdentifier"):
            processed["type"] = union_lsv(
                processed["type"],
                f'{processed["xrefDataSource"]}:{processed["xrefIdentifier"]}')
        if kaavio_type:
            processed["kaavioType"] = kaavio_type
        processed["gpmlElementName"] = gpml_element_name
        return processed

    def process_properties_and_type(self, gpml_element_name: str,
                                    gpml_element: dict) -> dict:
        entity = self.process_type(gpml_element_name,
                                   self.process_properties(gpml_element))
        z = entity.get("zIndex")
        eid = entity.get("id")
        if eid is not None:
            self.graph_id_to_z_index[eid] = z
        return entity

    def process_gpml_and_properties_and_type(self, gpml_element_name: str,
                                             gpml_element: dict) -> dict:
        return self.process_properties_and_type(
            gpml_element_name, self.preprocess_gpml_element(gpml_element))

    def get_pvjson_value(self, gpml_element, gpml_key: str, gpml_value):
        fn_name = gpml_key.replace("-", "", 1)
        converter = self.value_converters.get(fn_name)
        if converter is not None:
            return converter(gpml_element)
        if isinstance(gpml_value, str):
            return self.value_mappings.get(gpml_value, gpml_value)
        if isinstance(gpml_value, list):
            return [self.get_pvjson_value(item, gpml_key, item)
                    for item in gpml_value]
        if isinstance(gpml_value, dict):
            pairs = []
            for kv in gpml_value.items():
                pairs.extend(self.process_kv(gpml_value, kv))
            return dict(pairs)
        return gpml_value

    def process_kv(self, gpml_element, key_value) -> list:
        gpml_key, gpml_value = key_value
        fn_name = gpml_key.replace("-", "", 1)

        if _is_skippable(gpml_value):
            return []

        kv_converter = self.key_value_converters.get(fn_name)
        if kv_converter is not None:
            return kv_converter(gpml_element, self.key_mappings,
                                self.value_mappings)

        pvjson_key = self.key_mappings.get(gpml_key)

        if gpml_key.startswith("_") or pvjson_key == "pvjson:delete":
            return []
        if pvjson_key == "pvjson:merge":
            pairs = []
            for kv in gpml_value.items():
                pairs.extend(self.process_kv(gpml_element, kv))
            return pairs
        if pvjson_key == "pvjson:each":
            # GPML Attribute elements: explode Key/Value children, unioning
            # duplicate Keys (Processor.ts:512-537)
            acc: dict = {}
            for attr in gpml_value:
                if _is_skippable(attr.get("Value")):
                    continue
                processed = self.process_kv(
                    gpml_element, [attr.get("Key"), attr.get("Value")])
                if not processed:
                    continue
                processed_key, processed_value = processed[0]
                if processed_key in acc:
                    acc[processed_key] = union_lsv(acc[processed_key],
                                                   processed_value)
                else:
                    acc[processed_key] = processed_value
            return list(acc.items())

        pvjson_value = self.get_pvjson_value(gpml_element, gpml_key,
                                             gpml_value)
        if _is_skippable(pvjson_value):
            return []
        return [[pvjson_key or camel_case(gpml_key), pvjson_value]]

    # -- entity output (Processor.ts:395-412) -------------------------------

    def set_pvjson_entity(self, entity: dict):
        self.graph_id_to_z_index[entity["id"]] = entity.get("zIndex")
        self.entities_by_id[entity["id"]] = entity
