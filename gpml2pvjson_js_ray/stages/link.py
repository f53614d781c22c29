"""Ray Data stage: entity linking (stateful actor pool).

The one stage that holds large shared state: the BridgeDb-style xref
dictionary. The dictionary is broadcast with `ray.put` on the driver and
each actor materializes it ONCE in __init__ (never per batch) — the
canonical small-side broadcast-join pattern; no shuffle
(SURVEY.md §2.3 ST4, §2.4 J7).

Usage:
    xref_ref = ray.put(build_xref_dict())
    triples.map_batches(XrefLinker, fn_constructor_args=(xref_ref,),
                        batch_format="pyarrow", batch_size=8192,
                        concurrency=(2, 8), num_cpus=1)
"""

from __future__ import annotations

import pyarrow as pa

from ..sources.xrefs import link_xref


class _ProcessIndexCache:
    """Per-worker-process lazy materialization of the broadcast index.
    Because the XrefIndex is numpy-backed, ray.get from local plasma is
    zero-copy, so STATELESS TASKS + this cache beat an actor pool: no pool
    sizing, no per-execution actor spin-up, fully elastic scheduling. (An
    actor pool remains the right shape when per-actor state is expensive to
    materialize — see stages/multimodal.py.)"""
    index = None
    cache: dict = {}


def make_link_fn(xref_ref):
    """Build a stateless map_batches function closing over the ObjectRef."""

    def link_batch(batch: pa.Table) -> pa.Table:
        if _ProcessIndexCache.index is None:
            import ray
            from ..sources.xrefs import XrefIndex
            _ProcessIndexCache.index = (
                xref_ref if isinstance(xref_ref, (dict, XrefIndex))
                else ray.get(xref_ref))
            _ProcessIndexCache.cache = {}
        linker = XrefLinker.__new__(XrefLinker)
        linker.xrefs = _ProcessIndexCache.index
        linker._cache = _ProcessIndexCache.cache
        return linker(batch)

    return link_batch


class XrefLinker:
    def __init__(self, xref_ref):
        import ray
        from ..sources.xrefs import XrefIndex
        # ObjectRef → materialize once per actor. The XrefIndex form is
        # numpy-backed, so ray.get is effectively ZERO-COPY from plasma —
        # actor init stays O(1) no matter how large the dictionary is.
        # A plain dict/index is accepted too (unit tests without Ray).
        if isinstance(xref_ref, (dict, XrefIndex)):
            self.xrefs = xref_ref
        else:
            self.xrefs = ray.get(xref_ref)
        # memoize xref→IRI: corpora have heavy-hitter entities
        self._cache: dict[str, str] = {}

    def _canonical(self, xref: str, raw: str, is_node: bool,
                   pathway_id: str) -> str:
        """xref → dictionary/rule IRI; xref-less node → doc-scoped id;
        literal (class name, citation id) → unchanged."""
        if xref:
            hit = self._cache.get(xref)
            if hit is None:
                from ..sources.xrefs import XrefIndex, link_xref_index
                if isinstance(self.xrefs, XrefIndex):
                    hit = link_xref_index(xref, self.xrefs)
                else:
                    hit = link_xref(xref, self.xrefs)
                self._cache[xref] = hit
            return hit
        if is_node:
            return f"{pathway_id}#{raw}"
        return raw

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj = batch.column("subj").to_pylist()
        obj = batch.column("obj").to_pylist()
        subj_xref = batch.column("subj_xref").to_pylist()
        obj_xref = batch.column("obj_xref").to_pylist()
        subj_is_node = batch.column("subj_is_node").to_pylist()
        obj_is_node = batch.column("obj_is_node").to_pylist()
        pathway_id = batch.column("pathway_id").to_pylist()

        canonical_subj = []
        canonical_obj = []
        for s, o, sx, ox, sn, on, pid in zip(subj, obj, subj_xref, obj_xref,
                                             subj_is_node, obj_is_node,
                                             pathway_id):
            canonical_subj.append(self._canonical(sx, s, sn, pid))
            canonical_obj.append(self._canonical(ox, o, on, pid))
        batch = batch.append_column(
            "canonical_subj", pa.array(canonical_subj, type=pa.string()))
        batch = batch.append_column(
            "canonical_obj", pa.array(canonical_obj, type=pa.string()))
        return batch
