"""Round-5 (advice #2): canonical-URL normalization edge cases that
previously diverged between the polars engine and the DuckDB oracle —
prefix-less URLs (polars extract → null vs RE2 extract → '') and the
'&'→'?' repair firing on a literal '&' in a query-less path when no
tracking param was removed. Both engines must agree byte-for-byte."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

URLS = [
    "ftp://weird.example/path/",             # non-http scheme
    "nohost-relative/path&literal",          # no scheme, literal '&'
    "https://Host.Example:443/A&B",          # literal '&', nothing removed
    "https://host.example/p?utm_source=x&keep=1#frag",
    "https://host.example/p&q?utm_source=x",  # documented approximation
    "http://host.example:80/x/",
]

EXPECTED = {
    "ftp://weird.example/path/": "ftp://weird.example/path",
    "nohost-relative/path&literal": "nohost-relative/path&literal",
    "https://Host.Example:443/A&B": "https://host.example/A&B",
    "https://host.example/p?utm_source=x&keep=1#frag":
        "https://host.example/p?keep=1",
    "https://host.example/p&q?utm_source=x":
        "https://host.example/p?q",
    "http://host.example:80/x/": "http://host.example/x",
}


def test_canonical_url_edge_cases_engine_oracle_parity(ray_session,
                                                       tmp_path):
    import ray.data as rd

    from gpml2pvjson_js_ray.pipelines import kg

    t = pa.table({
        "url": URLS,
        "warc_ts": pa.array(
            [pd.Timestamp("2024-01-01")] * len(URLS)).cast(
                pa.timestamp("us")),
        "html": ["<html></html>"] * len(URLS)})
    pq.write_table(t, str(tmp_path / "p.parquet"))

    eng = kg.canonical_pages_dataset(
        rd.read_parquet(str(tmp_path / "p.parquet"))).to_pandas()
    sf = "/root/testdata/sf0.001"
    sql = kg.canonical_pages_oracle_sql_for_sf(sf).replace(
        kg.pages_glob(sf), os.path.join(str(tmp_path), "*.parquet"))
    ora = duckdb.connect().execute(sql).fetchdf()

    e = dict(zip(eng["url"], eng["canonical_url"]))
    o = dict(zip(ora["url"], ora["canonical_url"]))
    assert e == o == EXPECTED
