"""ConversionProfile: the pluggable-schema seam (SURVEY.md §2.11).

The reference's extension surface is its pluggable table set — the
Processor takes (KeyMappings, KeyValueConverters, ValueMappings,
ValueConverters) as constructor arguments (Processor.ts:148-166) and
`index.ts:5` exports GPML2013aToPVJSON as one such plug-in. This module
re-expresses that surface as a frozen dataclass bundling every table a
schema profile differs in: the four processor tables, the parser's
attribute defaults, the accepted namespaces, and the marker/group
enrichment tables. GPML2013a is the default (and, as in the reference,
only shipped) instance; a GPML2021-style profile plugs in by constructing
another instance — no converter code changes.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace  # noqa: F401 (replace is
# part of the public seam: variant profiles are built with
# dataclasses.replace(GPML2013A, ...))

from . import mappings
from .value_converters import KEY_VALUE_CONVERTERS, VALUE_CONVERTERS


@dataclass(frozen=True)
class ConversionProfile:
    """Everything schema-version-specific about GPML→pvjson conversion."""
    name: str
    supported_namespaces: tuple[str, ...]
    # the four Processor tables (Processor.ts:148-166)
    key_mappings: dict
    key_value_converters: dict
    value_mappings: dict
    value_converters: object
    # parser-side XSD attribute defaults (2013a/defaults applied at parse)
    gpml_defaults: dict
    # edge/group enrichment tables
    marker_mappings: dict = field(default_factory=dict)
    group_mappings_by_style: dict = field(default_factory=dict)
    # optional post-parse tree adapter (ET root → ET root), the seam a
    # successor schema uses to map onto the shared table set
    parse_adapter: object = None


def _gpml2021_adapter(root):
    from .gpml2021 import adapt_gpml2021_tree
    return adapt_gpml2021_tree(root)


GPML2013A = ConversionProfile(
    name="GPML2013a",
    supported_namespaces=tuple(mappings.SUPPORTED_NAMESPACES),
    key_mappings=mappings.KEY_MAPPINGS,
    key_value_converters=KEY_VALUE_CONVERTERS,
    value_mappings=mappings.VALUE_MAPPINGS,
    value_converters=VALUE_CONVERTERS,
    gpml_defaults=mappings.GPML_DEFAULTS,
    marker_mappings=mappings.MARKER_MAPPINGS,
    group_mappings_by_style=mappings.GROUP_MAPPINGS_BY_STYLE,
)

# the published successor schema (pathvisio.org/GPML/2021): mechanical
# renames + container grouping over the same conversion semantics — an
# adapter profile mapping 2021 documents onto the 2013a table set (see
# functions/gpml2021.py for exactly what is and is not claimed)
GPML2021 = replace(
    GPML2013A,
    name="GPML2021",
    supported_namespaces=("http://pathvisio.org/GPML/2021",),
    parse_adapter=_gpml2021_adapter,
)

PROFILES = {"gpml2013a": GPML2013A, "gpml2021": GPML2021}
