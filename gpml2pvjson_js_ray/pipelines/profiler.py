"""Distributed table profiler: per-column row count, null count and
exact distinct count — the data-quality pass an ingest pipeline runs
before anything else touches a new 100-TB drop.

Two lineages over one read:
- rows/nulls fold per batch into (column_name, n, nulls) PARTIALS —
  the exchange carries ncols rows per block, nothing value-sized.
- distinct counts explode each batch into per-column DISTINCT value
  rows (string-cast — Arrow's float→string is shortest-roundtrip and
  injective, so distinctness is preserved), then two groupbys: dedupe
  on (column, value), count per column. The shuffle carries per-block
  distinct values only — the per-batch dedupe is the combiner.

Both aggregates are column-count-sized at the driver, so the final
merge is a tiny pandas join — never a dataset-sized materialization.
NULLs are excluded from distinct (count(DISTINCT col) semantics).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def profile_table(sf_dir: str, table: str,
                  columns: list[str] | None = None) -> pd.DataFrame:
    """Profile every column (or `columns`) of `table`: returns a pandas
    frame (column_name, n_rows, n_nulls, n_distinct) sorted by name."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                         columns=columns)

    def counts_partial(b: pa.Table) -> pa.Table:
        names, ns, nulls = [], [], []
        for name in b.schema.names:
            col = b.column(name)
            names.append(name)
            ns.append(b.num_rows)
            nulls.append(col.null_count)
        return pa.table({"column_name": names,
                         "n": pa.array(ns, type=pa.int64()),
                         "nulls": pa.array(nulls, type=pa.int64())})

    def distinct_partial(b: pa.Table) -> pa.Table:
        names, vals = [], []
        for name in b.schema.names:
            col = b.column(name).combine_chunks()
            if pa.types.is_list(col.type) or \
                    pa.types.is_large_list(col.type):
                # list columns (e.g. embeddings) have no unique kernel:
                # stringify first (element cast is shortest-roundtrip →
                # injective, join with a separator keeps boundaries),
                # then unique on the strings — still fully vectorized
                col = pc.binary_join(
                    pc.cast(col, pa.list_(pa.string()), safe=False),
                    ",")
            sv = pc.unique(col.drop_null())
            if not pa.types.is_string(sv.type):
                sv = pc.cast(sv, pa.string(), safe=False)
            names.extend([name] * len(sv))
            vals.append(sv)
        merged = (pa.concat_arrays([v.combine_chunks() if
                                    isinstance(v, pa.ChunkedArray) else v
                                    for v in vals])
                  if vals else pa.array([], type=pa.string()))
        return pa.table({"column_name": pa.array(names),
                         "val": merged})

    totals = (ds.map_batches(counts_partial, batch_format="pyarrow")
              .groupby("column_name")
              .aggregate(Sum("n", alias_name="n_rows"),
                         Sum("nulls", alias_name="n_nulls"))
              .to_pandas())

    distinct = (ds.map_batches(distinct_partial, batch_format="pyarrow")
                .groupby(["column_name", "val"])
                .aggregate(Count(alias_name="_dup"))
                .groupby("column_name")
                .aggregate(Count(alias_name="n_distinct"))
                .to_pandas())

    out = totals.merge(distinct, on="column_name", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    return (out[["column_name", "n_rows", "n_nulls", "n_distinct"]]
            .sort_values("column_name").reset_index(drop=True))


def events_profile(sf_dir: str) -> pd.DataFrame:
    """Profile of the events table (scalar columns only — the list
    profile path is covered by profile_table on embeddings in tests)."""
    return profile_table(sf_dir, "events")


def _sql_profile(table: str, cols: list[str]) -> str:
    parts = [
        f"SELECT '{c}' AS column_name, count(*) AS n_rows, "
        f"count(*) - count({c}) AS n_nulls, "
        f"count(DISTINCT {c}) AS n_distinct FROM {table}"
        for c in cols]
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


SQL_EVENTS_PROFILE = _sql_profile(
    "events", ["event_id", "ts", "user_id", "event_type", "value",
               "props"])


# -- per-source token-distribution drift ------------------------------------

_TERM_RE = "[a-zA-ZÀ-ÿ]+"  # shared token recipe (see mlprep._TERM_RE)


def documents_source_divergence(sf_dir: str) -> pd.DataFrame:
    """Jensen-Shannon divergence (natural log) of each source's unigram
    distribution against the whole-corpus distribution — the domain-mix
    drift monitor a training pipeline runs per ingest batch.

    Distributed part: per-batch polars group_by((source, term)) count
    partials, then one Ray groupby-sum — the exchange carries
    vocabulary-sized partials, never tokens. The finish runs on the
    (|sources| × |vocab|)-sized aggregate (driver-side by design: it IS
    the reduced result, constant in corpus bytes for a natural-language
    vocabulary). Output: (source, n_tokens, js_divergence) rounded to
    6 dp, source-sorted."""
    import ray.data as rd
    from ray.data.aggregate import Sum
    from ..stages.exchange import polars_capped

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        pl = polars_capped()
        out = (pl.from_arrow(b).select(
            "source",
            term=pl.col("text").fill_null("").str.to_lowercase()
            .str.extract_all(_TERM_RE))
            .explode("term").drop_nulls("term")
            .group_by(["source", "term"])
            .agg(n=pl.len().cast(pl.Int64)))
        return out.to_arrow().cast(pa.schema([
            ("source", pa.string()), ("term", pa.string()),
            ("n", pa.int64())]))

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["source", "term"])
              .aggregate(Sum("n", alias_name="n"))
              .to_pandas())

    import numpy as np
    pivot = counts.pivot_table(index="term", columns="source", values="n",
                               aggfunc="sum", fill_value=0)
    totals = pivot.sum(axis=0)
    q = pivot.sum(axis=1).to_numpy(dtype=np.float64)
    q = q / q.sum()
    rows = []
    for source in sorted(pivot.columns):
        n_src = pivot[source].to_numpy(dtype=np.float64)
        p = n_src / n_src.sum()
        m = 0.5 * (p + q)
        kl_pm = float(np.sum(np.where(p > 0, p * np.log(p / m), 0.0)))
        kl_qm = float(np.sum(np.where(q > 0, q * np.log(q / m), 0.0)))
        rows.append({"source": source,
                     "n_tokens": int(totals[source]),
                     "js_divergence":
                         float(np.round(0.5 * (kl_pm + kl_qm), 6))})
    return pd.DataFrame(rows, columns=["source", "n_tokens",
                                       "js_divergence"])


SQL_DOCUMENTS_SOURCE_DIVERGENCE = """
WITH toks AS (
  SELECT source,
         unnest(regexp_extract_all(lower(coalesce(text, '')),
                                   '[a-zA-ZÀ-ÿ]+')) AS term
  FROM documents),
counts AS (SELECT source, term, count(*) AS n FROM toks
           GROUP BY source, term),
grid AS (
  SELECT s.source, t.term, coalesce(c.n, 0) AS n
  FROM (SELECT DISTINCT source FROM counts) s
  CROSS JOIN (SELECT DISTINCT term FROM counts) t
  LEFT JOIN counts c ON c.source = s.source AND c.term = t.term),
src_tot AS (SELECT source, sum(n) AS tot FROM grid GROUP BY source),
term_tot AS (SELECT term, sum(n) AS gn FROM grid GROUP BY term),
gt AS (SELECT sum(n) AS gtot FROM grid),
probs AS (
  SELECT g.source,
         g.n / CAST(st.tot AS DOUBLE) AS p,
         tt.gn / CAST(gt.gtot AS DOUBLE) AS q
  FROM grid g
  JOIN src_tot st USING (source)
  JOIN term_tot tt USING (term)
  CROSS JOIN gt)
SELECT p.source, CAST(st.tot AS BIGINT) AS n_tokens,
       round(0.5 * sum(CASE WHEN p > 0
                            THEN p * ln(p / (0.5 * (p + q))) ELSE 0 END)
           + 0.5 * sum(CASE WHEN q > 0
                            THEN q * ln(q / (0.5 * (p + q))) ELSE 0 END),
             6) AS js_divergence
FROM probs p JOIN src_tot st USING (source)
GROUP BY p.source, st.tot ORDER BY p.source
"""


# -- declarative constraint validation (expectations gate) ---------------------

# rule set shared verbatim with the SQL oracle; a rule with zero
# violations still emits its row (the gate reports green, not silence)
_EVENT_TYPES_OK = ("click", "purchase", "signup", "view", "login",
                   "logout", "search", "error")
_TS_LO, _TS_HI = "1995-01-01", "2030-01-01"


def events_constraint_violations(sf_dir: str):
    """Declarative data-quality gate over the events stream: count
    violations of a fixed expectation suite (null key, negative value,
    unknown enum, out-of-range timestamp) — the validation pass an
    ingest pipeline runs before promoting a new drop, per rule.

    Scale shape: pure map — each block folds into ≤ |rules| partial
    rows (vectorized arrow kernels, no Python per row), and the
    exchange carries |rules| rows per block into one tiny groupby.
    Every rule always reports (LEFT-JOIN-like semantics via explicit
    zero partials), so a silent column drop can't masquerade as
    clean. Output: (rule, n_violations) ordered by rule."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type", "value", "ts"])
    lo = np.datetime64(_TS_LO, "us").astype(np.int64)
    hi = np.datetime64(_TS_HI, "us").astype(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"rule": pa.array([], pa.string()),
                             "part": pa.array([], pa.int64())})
        n_null = b.column("user_id").null_count
        val = b.column("value").to_numpy(zero_copy_only=False)
        n_neg = int(np.sum(val < 0.0))
        known = pc.fill_null(pc.is_in(
            b.column("event_type"),
            value_set=pa.array(_EVENT_TYPES_OK)), False)
        # NULL or NOT IN — everything that is not a known enum value
        n_unknown = int(b.num_rows - pc.sum(known).as_py())
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        n_ts = int(np.sum((ts < lo) | (ts > hi)))
        return pa.table({
            "rule": pa.array(["negative_value", "null_user_id",
                              "ts_out_of_range", "unknown_event_type"]),
            "part": pa.array([n_neg, n_null, n_ts, n_unknown],
                             pa.int64())})

    def finish(b: pa.Table) -> pa.Table:
        return b.rename_columns(["rule", "n_violations"])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("rule")
            .aggregate(Sum("part", alias_name="part"))
            .map_batches(finish, batch_format="pyarrow")
            .sort("rule"))


SQL_EVENTS_CONSTRAINT_VIOLATIONS = f"""
SELECT rule, n_violations FROM (
  SELECT 'null_user_id' AS rule,
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_violations FROM events
  UNION ALL
  SELECT 'negative_value',
         CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
  FROM events
  UNION ALL
  SELECT 'unknown_event_type',
         CAST(sum(CASE WHEN event_type IS NULL OR event_type NOT IN
                  {_EVENT_TYPES_OK!r} THEN 1 ELSE 0 END) AS BIGINT)
  FROM events
  UNION ALL
  SELECT 'ts_out_of_range',
         CAST(sum(CASE WHEN ts < TIMESTAMP '{_TS_LO}'
                        OR ts > TIMESTAMP '{_TS_HI}'
                  THEN 1 ELSE 0 END) AS BIGINT)
  FROM events)
ORDER BY rule
"""
