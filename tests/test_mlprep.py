"""Targeted tests for pipelines/mlprep.py and the weighted sampler —
behaviors the synthetic driver corpus can't exercise (it contains no
PII; its weights are near-uniform). The cross-engine value parity of
every mlprep operator is covered by the auto-parametrized
tests/test_oracles.py sweep."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts, n_chars=None):
    table = pa.table({
        "doc_id": list(range(len(texts))),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["t"] * len(texts),
        "n_chars": n_chars or [len(t or "") for t in texts],
    })
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


def test_pii_redact_planted(ray_session, tmp_path):
    texts = [
        "contact Jane.Doe+spam@example-mail.org or bob@x.io today",
        "order 1234567890 shipped; ref 000042 ok, short 12345 stays",
        "no pii here at all",
        None,
    ]
    d = _write_docs(tmp_path, texts)
    from gpml2pvjson_js_ray.pipelines.mlprep import documents_pii_redact
    out = documents_pii_redact(d).to_pandas().set_index("doc_id")
    assert out.loc[0, "clean_text"] == "contact <EMAIL> or <EMAIL> today"
    assert out.loc[0, "n_emails"] == 2 and out.loc[0, "n_numbers"] == 0
    # 1234567890 redacted; 000042 is 6 digits → redacted; 12345 kept
    assert out.loc[1, "clean_text"] == \
        "order <NUM> shipped; ref <NUM> ok, short 12345 stays"
    assert out.loc[1, "n_numbers"] == 2 and out.loc[1, "n_emails"] == 0
    assert out.loc[2, "clean_text"] == texts[2]
    assert out.loc[3, "clean_text"] == ""  # NULL text → empty, not crash


def test_tfidf_prefers_rare_terms(ray_session, tmp_path):
    # 'zebra' appears once in doc0 only; 'common' is in every doc, so its
    # idf is ln(1)=0 and it can never win despite the higher tf.
    texts = [
        "common common common zebra",
        "common common apple apple",
        "common banana",
    ]
    d = _write_docs(tmp_path, texts)
    from gpml2pvjson_js_ray.pipelines.mlprep import documents_tfidf_top_term
    out = documents_tfidf_top_term(d).to_pandas().set_index("doc_id")
    assert out.loc[0, "term"] == "zebra"
    assert out.loc[1, "term"] == "apple"
    assert out.loc[2, "term"] == "banana"
    assert (out["tfidf"] > 0).all()


def test_weighted_sample_prefers_heavy_docs(ray_session, tmp_path):
    # One doc carries ~10^6× the weight of the rest: its E–S key
    # u^(1/w) ≈ 1 dominates any realistic uniform draw, so a k=5 sample
    # must include it; with k = n the sample is the whole corpus.
    texts = [f"doc number {i}" for i in range(40)]
    weights = [10] * 40
    weights[17] = 10_000_000
    d = _write_docs(tmp_path, texts, n_chars=weights)
    from gpml2pvjson_js_ray.pipelines.sampling import \
        documents_weighted_sample
    out = documents_weighted_sample(d, k=5).to_pandas()
    assert 17 in set(out["doc_id"])
    assert len(out) == 5
    full = documents_weighted_sample(d, k=40).to_pandas()
    assert set(full["doc_id"]) == set(range(40))


def test_ntile_remainder_distribution(ray_session, tmp_path):
    # 10 events into 8 tiles: NTILE gives the first 2 tiles 2 rows each
    # and 1 row to the rest (remainder to the front).
    events = pa.table({
        "event_id": list(range(10)),
        "ts": pa.array([0] * 10, pa.timestamp("us")),
        "user_id": [1] * 10,
        "event_type": ["a"] * 10,
        "value": [float(i) for i in range(10)],
        "props": [""] * 10,
    })
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(events, str(d / "events.parquet"))
    from gpml2pvjson_js_ray.pipelines.mlprep import events_value_ntile
    out = events_value_ntile(str(d)).to_pandas().sort_values("event_id")
    assert list(out["tile"]) == [1, 1, 2, 2, 3, 4, 5, 6, 7, 8]


def test_linear_score_topk_tie_break(ray_session, tmp_path):
    # Identical embeddings → every rounded score ties; the per-block
    # prefilter must keep ALL tied rows so the global (score DESC,
    # vec_id ASC) order can pick vec_ids 0..k-1, matching SQL ROW ORDER.
    import numpy as np

    n, dim = 40, 8
    emb = [list(np.full(dim, 0.1, dtype=np.float32)) for _ in range(n)]
    t = pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": pa.array(emb, pa.list_(pa.float32())),
        "label": pa.array(np.zeros(n, dtype=np.int32))})
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))
    from gpml2pvjson_js_ray.pipelines.mlprep import \
        embeddings_linear_score_topk
    out = embeddings_linear_score_topk(str(d), k=5).to_pandas()
    assert list(out["vec_id"]) == [0, 1, 2, 3, 4]


def test_token_stats_parity_on_unicode_whitespace(ray_session, tmp_path):
    """Regression for the rust-regex-vs-RE2 whitespace divergence: NBSP
    and thin-space must be token CHARS on both engines (ASCII \\s only)."""
    import duckdb

    texts = ["foo bar baz", "a b c", "plain text", None]
    d = _write_docs(tmp_path, texts)
    from gpml2pvjson_js_ray.pipelines.relational import (
        SQL_DOCUMENTS_TOKEN_STATS, documents_token_stats)
    mine = (documents_token_stats(d).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    theirs = (con.execute(SQL_DOCUMENTS_TOKEN_STATS).fetchdf()
              .sort_values("doc_id").reset_index(drop=True))
    m = mine.fillna(-1)
    t = theirs[m.columns].fillna(-1)
    assert m.equals(t), (mine, theirs)
    # NBSP doc: 'foo\xa0bar' + 'baz' → 2 tokens, not 3
    assert mine.loc[0, "n_tokens"] == 2


def test_median_by_priority_exact_selection(ray_session, tmp_path):
    """Per-group exact median via distributed selection: odd group
    (exact middle), even group (interpolated), and a group whose values
    all collapse into one range bucket (bracket pass must still find
    the order statistics inside it)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gpml2pvjson_js_ray.pipelines.mlprep import (
        orders_price_median_by_priority)

    prios, prices = [], []
    # odd-sized group: median is the exact middle element
    prios += ["1-ODD"] * 5
    prices += [10.0, 50.0, 30.0, 20.0, 40.0]        # median 30
    # even-sized group: interpolation between the two middles
    prios += ["2-EVEN"] * 4
    prices += [1.0, 2.0, 100.0, 200.0]               # median 51
    # one-bucket group: tight cluster far from the global range edges
    prios += ["3-TIGHT"] * 3
    prices += [500.0, 500.5, 501.0]                  # median 500.5
    t = pa.table({
        "o_orderkey": pa.array(np.arange(len(prios), dtype=np.int64)),
        "o_custkey": pa.array(np.zeros(len(prios), dtype=np.int64)),
        "o_orderstatus": pa.array(["O"] * len(prios)),
        "o_totalprice": pa.array(prices, pa.float64()),
        "o_orderdate": pa.array([0] * len(prios),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(prios),
    })
    d = tmp_path / "ord"
    d.mkdir()
    pq.write_table(t, str(d / "orders.parquet"))
    out = orders_price_median_by_priority(str(d)).to_pandas() \
        .set_index("o_orderpriority")["median_price"]
    assert out["1-ODD"] == 30.0
    assert out["2-EVEN"] == 51.0
    assert out["3-TIGHT"] == 500.5


def test_order_count_histogram_includes_zero_bucket(ray_session, tmp_path):
    """Q13 shape: customers with no orders land in the derived
    c_count=0 row (no outer join anywhere)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gpml2pvjson_js_ray.pipelines.joins import (
        customers_order_count_histogram)

    d = tmp_path / "q13"
    d.mkdir()
    # 6 customers; orders only for 1 (x3), 2 (x1), 3 (x1)
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(1, 7, dtype=np.int64)),
        "c_name": pa.array([f"c{i}" for i in range(1, 7)]),
        "c_nationkey": pa.array(np.zeros(6, dtype=np.int64)),
        "c_acctbal": pa.array(np.zeros(6)),
        "c_mktsegment": pa.array(["B"] * 6),
    }), str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(5, dtype=np.int64)),
        "o_custkey": pa.array([1, 1, 1, 2, 3], type=pa.int64()),
        "o_orderstatus": pa.array(["O"] * 5),
        "o_totalprice": pa.array(np.ones(5)),
        "o_orderdate": pa.array([0] * 5, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * 5),
    }), str(d / "orders.parquet"))
    df = customers_order_count_histogram(str(d)).to_pandas() \
        .set_index("c_count")["n_custs"]
    assert df[0] == 3      # customers 4, 5, 6
    assert df[1] == 2      # customers 2, 3
    assert df[3] == 1      # customer 1
    # sorted n_custs DESC, c_count DESC
    out = customers_order_count_histogram(str(d)).to_pandas()
    assert list(out["n_custs"]) == sorted(out["n_custs"], reverse=True) or \
        all(out["n_custs"].iloc[i] > out["n_custs"].iloc[i + 1] or
            out["c_count"].iloc[i] > out["c_count"].iloc[i + 1]
            for i in range(len(out) - 1))


def test_source_report_entropy_and_midpoint_rounding(ray_session, tmp_path):
    """Source A: 50/50 en/de → entropy ln 2; source B: monolingual →
    entropy 0; B's avg length 5/3 exercises the floor-form rounding."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gpml2pvjson_js_ray.pipelines.relational import (
        documents_source_report)

    langs = ["en", "en", "de", "de", "en", "en", "en"]
    srcs = ["A"] * 4 + ["B"] * 3
    chars = [10, 20, 30, 40, 1, 2, 2]
    d = tmp_path / "rep"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(7, dtype=np.int64)),
        "text": pa.array(["x"] * 7),
        "lang": pa.array(langs),
        "source": pa.array(srcs),
        "n_chars": pa.array(chars, pa.int64()),
    }), str(d / "documents.parquet"))
    out = (documents_source_report(str(d)).to_pandas()
           .set_index("source"))
    assert out.loc["A", "n_docs"] == 4
    assert out.loc["A", "avg_chars"] == 25.0
    assert abs(out.loc["A", "lang_entropy"] - round(math.log(2), 6)) < 1e-9
    assert out.loc["B", "n_docs"] == 3
    assert out.loc["B", "avg_chars"] == 1.6667   # floor(5/3·1e4 + .5)/1e4
    assert out.loc["B", "lang_entropy"] == 0.0


def test_rich_churned_anti_join_planted(ray_session, tmp_path):
    """4 customers, avg balance 2.5 → rich = {c3 (bal 3), c4 (bal 4)}.
    c3 ordered after the cutoff (active, excluded); c4's only order is
    ancient (churned, kept). c1/c2 fail the balance bar regardless."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gpml2pvjson_js_ray.pipelines.joins import rich_churned_by_segment

    d = tmp_path / "churn"
    d.mkdir()
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_name": pa.array(["a", "b", "c", "d"]),
        "c_nationkey": pa.array([0] * 4, pa.int64()),
        "c_acctbal": pa.array([1.0, 2.0, 3.0, 4.0]),
        "c_mktsegment": pa.array(["S1", "S1", "S2", "S2"]),
    }), str(d / "customer.parquet"))
    ts = lambda s: np.datetime64(s, "us")  # noqa: E731
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([3, 4, 1], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 3),
        "o_totalprice": pa.array([1.0, 1.0, 1.0]),
        "o_orderdate": pa.array([ts("2000-06-01"),   # c3: recent → active
                                 ts("1996-01-01"),   # c4: ancient → churned
                                 ts("2000-06-01")]),
        "o_orderpriority": pa.array(["1"] * 3),
    }), str(d / "orders.parquet"))
    out = (rich_churned_by_segment(str(d), cutoff="2000-01-01")
           .to_pandas().set_index("c_mktsegment"))
    assert list(out.index) == ["S2"]
    assert out.loc["S2", "n_custs"] == 1          # only c4
    assert out.loc["S2", "total_bal"] == 4.0


def test_top_large_quantity_orders_empty_threshold(ray_session):
    """An unreachable HAVING threshold yields an empty result with the
    full output schema (the empty-concat path must not crash)."""
    from gpml2pvjson_js_ray.pipelines.joins import top_large_quantity_orders

    out = top_large_quantity_orders("/root/testdata/sf0.001",
                                    qty_threshold=1e9)
    assert out.count() == 0
    # NB: Ray's to_pandas() drops columns on zero-row datasets, so the
    # schema check must read the Dataset schema, not the DataFrame
    assert sorted(out.schema().names) == sorted([
        "c_name", "o_custkey", "o_orderkey", "o_orderdate",
        "o_totalprice", "total_qty"])


def test_dedup_incremental_planted_overlap(ray_session, tmp_path):
    """Incremental dedup drops exactly the incoming (odd-id) docs whose
    text exists in the known (even-id) corpus; new-vs-new duplicates
    both survive (the filter models 'already ingested', not a full
    dedup — that is documents_exact_dedup's job)."""
    from gpml2pvjson_js_ray.pipelines.relational import (
        documents_dedup_incremental)

    texts = [
        "alpha beta gamma",     # 0 known
        "alpha beta gamma",     # 1 new — exact overlap with known → drop
        "delta epsilon",        # 2 known
        "zeta eta theta",       # 3 new — unseen → keep
        "iota kappa",           # 4 known
        "zeta eta theta",       # 5 new — dup of NEW doc 3 only → keep
    ]
    d = _write_docs(tmp_path, texts)
    df = documents_dedup_incremental(d, num_buckets=4).to_pandas()
    assert df["doc_id"].tolist() == [3, 5]


def test_rag_chunks_overlap_and_tail_coverage(ray_session, tmp_path):
    """Planted docs pin the chunk grid: a 100-token doc yields chunks
    [0,64) and [48,100) (16-token overlap, tail covered), a short doc
    yields one whole-doc chunk, an empty doc yields one empty chunk."""
    import pyarrow.parquet as pq

    from gpml2pvjson_js_ray.pipelines.mlprep import documents_rag_chunks

    toks = [chr(97 + i // 26) + chr(97 + i % 26) for i in range(100)]
    table = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": [" ".join(toks), " ".join(toks[:10]), ""],
        "lang": ["en"] * 3, "source": ["t"] * 3,
        "n_chars": pa.array([0, 0, 0], pa.int64())})
    d = tmp_path / "docs"
    d.mkdir(exist_ok=True)
    pq.write_table(table, str(d / "documents.parquet"))

    out = documents_rag_chunks(str(d)).to_pandas()
    d0 = out[out["doc_id"] == 0]
    assert d0["chunk_id"].tolist() == [0, 1]
    assert d0["n_tokens"].tolist() == [64, 52]
    assert d0["chunk_text"].iloc[0] == " ".join(toks[:64])
    assert d0["chunk_text"].iloc[1] == " ".join(toks[48:100])
    d1 = out[out["doc_id"] == 1]
    assert d1["n_tokens"].tolist() == [10]
    assert d1["chunk_text"].iloc[0] == " ".join(toks[:10])
    d2 = out[out["doc_id"] == 2]
    assert d2["chunk_id"].tolist() == [0]
    assert d2["n_tokens"].tolist() == [0]
    assert d2["chunk_text"].iloc[0] == ""
