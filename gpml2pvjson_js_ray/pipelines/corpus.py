"""End-to-end training-corpus preparation: the composition a real
LLM-data pipeline runs — quality scoring → threshold filter → exact
dedup → metadata join — expressed as one Ray Data graph over the
documents table.

Each link reuses an already-oracled operator (textops.documents_quality,
relational.documents_exact_dedup), so the composite inherits their
bitwise cross-engine parity; the oracle here is the same components
nested as CTEs. Scale shape: the quality filter runs BEFORE any join
(selectivity pushdown — only surviving docs enter the exchange), and both
joins hash-partition on the one shared key (doc_id), so the two
exchanges reuse the same partitioning instead of introducing a second
key.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


def documents_corpus_prep(sf_dir: str, min_quality: float = 0.5,
                          min_tokens: int = 5, num_partitions: int = 8):
    """Surviving corpus after quality + length filtering and exact
    deduplication (min-doc_id winner per distinct text), with language
    metadata re-attached."""
    from . import relational, textops

    qual = textops.documents_quality(sf_dir)

    def keep(b: pa.Table) -> pa.Table:
        good = pc.and_(
            pc.greater_equal(b.column("quality_score"),
                             pa.scalar(float(min_quality))),
            pc.greater_equal(b.column("n_tokens"),
                             pa.scalar(min_tokens, type=pa.int64())))
        return b.filter(good).select(
            ["doc_id", "n_tokens", "quality_score"])

    filtered = qual.map_batches(keep, batch_format="pyarrow")

    winners = (relational.documents_exact_dedup(sf_dir)
               .map_batches(lambda b: b.select(["doc_id"]),
                            batch_format="pyarrow"))

    import ray.data as rd
    meta = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "lang"])

    out = filtered.join(winners, join_type="inner",
                        num_partitions=num_partitions, on=("doc_id",))
    out = out.join(meta, join_type="inner",
                   num_partitions=num_partitions, on=("doc_id",))
    return (out.map_batches(
        lambda b: b.select(["doc_id", "lang", "n_tokens",
                            "quality_score"]),
        batch_format="pyarrow")
        .sort("doc_id"))


def _sql() -> str:
    from .textops import SQL_DOCUMENTS_QUALITY
    return f"""
WITH q AS ({SQL_DOCUMENTS_QUALITY}),
dedup AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
SELECT q.doc_id, doc.lang, q.n_tokens, q.quality_score
FROM q
JOIN dedup USING (doc_id)
JOIN documents doc USING (doc_id)
WHERE q.quality_score >= 0.5 AND q.n_tokens >= 5
ORDER BY q.doc_id
"""


SQL_DOCUMENTS_CORPUS_PREP = _sql()
