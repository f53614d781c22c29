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
