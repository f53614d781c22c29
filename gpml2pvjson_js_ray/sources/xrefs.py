"""BridgeDb-style xref dictionary (synthetic, deterministic).

Maps "DataSource:ID" strings to identifiers.org IRIs (SURVEY.md §2.3 ST4 /
§2.4 J7). Covers exactly the ranges the synthetic corpus generator draws
from. Even-numbered Ensembl genes alias to an NCBI gene IRI so that the
canonicalization groupby (A6) has real alias merges to do.

At 100 TB scale this dictionary is the one large broadcast-side object:
build it ONCE on the driver, `ray.put` it, and hand the ObjectRef to the
linker actor pool — each actor deserializes once in __init__, never per
batch. Wikidata ids are linked by rule (no dictionary entry needed),
demonstrating hybrid rule+dictionary linking.
"""

from __future__ import annotations

IRI = {
    "ncbigene": "http://identifiers.org/ncbigene/",
    "ensembl": "http://identifiers.org/ensembl/",
    "hmdb": "http://identifiers.org/hmdb/",
    "uniprot": "http://identifiers.org/uniprot/",
    "chebi": "http://identifiers.org/chebi/CHEBI:",
    "wikidata": "http://identifiers.org/wikidata/",
}

UNKNOWN_PREFIX = "unknown:"  # wikidata-like unknown namespace for unmatched


def build_xref_dict() -> dict[str, str]:
    d: dict[str, str] = {}
    for n in range(1000, 100000):  # Entrez Gene generator range
        d[f"Entrez Gene:{n}"] = IRI["ncbigene"] + str(n)
    for n in range(1, 100000):  # Ensembl generator range
        key = "Ensembl:ENSG%011d" % n
        if n % 2 == 0:
            # alias: even ENSG ids resolve to an NCBI gene (canonical)
            d[key] = IRI["ncbigene"] + str(n % 98999 + 1000)
        else:
            d[key] = IRI["ensembl"] + "ENSG%011d" % n
    for n in range(1, 70000):  # HMDB generator range
        d["HMDB:HMDB%07d" % n] = IRI["hmdb"] + "HMDB%07d" % n
    for n in range(10000, 100000):  # Uniprot generator range
        d[f"Uniprot-TrEMBL:P{n:05d}"] = IRI["uniprot"] + f"P{n:05d}"
    for n in range(100, 100000):  # ChEBI generator range
        d[f"ChEBI:{n}"] = IRI["chebi"] + str(n)
    return d


def link_xref(xref: str, xref_dict: dict[str, str]) -> str:
    """One xref string → canonical IRI (dict, then rules, then unknown)."""
    hit = xref_dict.get(xref)
    if hit is not None:
        return hit
    if xref.startswith("Wikidata:Q"):
        return IRI["wikidata"] + xref.split(":", 1)[1]
    return UNKNOWN_PREFIX + xref


# ---------------------------------------------------------------------------
# Zero-copy broadcast form: numpy hash index
# ---------------------------------------------------------------------------
#
# A Python dict of ~360k strings costs ~1-2 s to deserialize PER ACTOR from
# the object store. Actor pools are re-created per Dataset execution, so that
# cost multiplies by (actors × partitions). The index below is three numpy
# arrays + one bytes blob — Ray's plasma store hands numpy arrays to workers
# ZERO-COPY, so actor __init__ cost is ~0 regardless of dictionary size, and
# lookups are vectorized searchsorted. This is the shape a 100 TB run needs.

import hashlib as _hashlib

import numpy as np


def _hash64(s: str) -> int:
    return int.from_bytes(
        _hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


class XrefIndex:
    """Immutable sorted-hash index: key → value via searchsorted."""

    def __init__(self, hashes: "np.ndarray", offsets: "np.ndarray",
                 blob: "np.ndarray"):
        self.hashes = hashes      # uint64, sorted
        self.offsets = offsets    # int64, len = n+1
        self.blob = blob          # uint8 array: utf-8 values in hash order

    @classmethod
    def from_dict(cls, d: dict[str, str]) -> "XrefIndex":
        items = sorted(((_hash64(k), v) for k, v in d.items()))
        hashes = np.fromiter((h for h, _ in items), dtype=np.uint64,
                             count=len(items))
        values = [v.encode() for _, v in items]
        offsets = np.zeros(len(values) + 1, dtype=np.int64)
        np.cumsum([len(v) for v in values], out=offsets[1:])
        blob = np.frombuffer(b"".join(values), dtype=np.uint8)
        return cls(hashes, offsets, blob)

    def get(self, key: str):
        h = np.uint64(_hash64(key))
        i = int(np.searchsorted(self.hashes, h))
        if i < len(self.hashes) and self.hashes[i] == h:
            return self.blob[self.offsets[i]:self.offsets[i + 1]] \
                .tobytes().decode()
        return None


def build_xref_index() -> XrefIndex:
    return XrefIndex.from_dict(build_xref_dict())


def link_xref_index(xref: str, index: XrefIndex) -> str:
    hit = index.get(xref)
    if hit is not None:
        return hit
    if xref.startswith("Wikidata:Q"):
        return IRI["wikidata"] + xref.split(":", 1)[1]
    return UNKNOWN_PREFIX + xref


# ---------------------------------------------------------------------------
# Parquet export: first-principles SQL oracle for the linking layer (J7)
# ---------------------------------------------------------------------------
#
# Exporting the (xref, iri) dictionary as a parquet lets DuckDB RECOMPUTE
# canonical IRIs (dict left-join + the Wikidata/unknown rules + the
# doc-scoped-node rule as CASE arms) instead of identity-reading the
# engine's own linked output — the kg_linked_triples oracle becomes a
# genuine semantic recompute of the linking layer (round-4 verdict #5).

XREF_EXPORT_VERSION = 1


def xref_dict_parquet_path() -> str:
    """Deterministic export path — pure string arithmetic so
    oracle_sql() can embed it without running anything."""
    import os
    return os.path.join(
        "/tmp/gpml2pvjson_xrefs",
        f"xref_dict_v{XREF_EXPORT_VERSION}.parquet")


def export_xref_dict_parquet(path: str | None = None) -> str:
    """Write the full dictionary as one sorted (xref, iri) parquet
    (~460k rows, a few MB). Idempotent: skips when the file exists —
    the dictionary is a pure function of this module, versioned by
    XREF_EXPORT_VERSION."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    path = path or xref_dict_parquet_path()
    if os.path.exists(path):
        return path
    d = build_xref_dict()
    keys = sorted(d)
    t = pa.table({"xref": pa.array(keys, pa.string()),
                  "iri": pa.array([d[k] for k in keys], pa.string())})
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path
