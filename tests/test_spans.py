"""Planted-case tests for pipelines/spans.py — cross-doc span dedup,
within-doc repetition stats, and event-type transitions. Cross-engine
value parity at sf0.01 is covered by the auto-parametrized
tests/test_oracles.py sweep; these tests pin the semantics on corpora
the synthetic driver data can't exercise (planted shared spans, heavy
repetition, short docs, None text)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts):
    table = pa.table({
        "doc_id": list(range(len(texts))),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["t"] * len(texts),
        "n_chars": [len(t or "") for t in texts],
    })
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


def test_span_dedup_planted_shared_span(ray_session, tmp_path):
    shared = "alpha beta gamma delta epsilon"  # exactly one 5-gram
    texts = [
        f"{shared} zeta eta theta",        # grams: 4 (8 words)
        f"iota kappa {shared} mu",         # shares the planted span
        "nu xi omicron pi rho sigma tau",  # 3 grams, all unique
        "too short here",                  # <5 words → no row
        None,                              # no tokens → no row
    ]
    d = _write_docs(tmp_path, texts)
    from gpml2pvjson_js_ray.pipelines.spans import \
        documents_span_dedup_stats
    out = (documents_span_dedup_stats(d).to_pandas()
           .set_index("doc_id"))
    assert sorted(out.index) == [0, 1, 2]
    assert out.loc[0, "n_grams"] == 4
    assert out.loc[1, "n_grams"] == 4
    assert out.loc[2, "n_grams"] == 3
    # only the planted "alpha beta gamma delta epsilon" occurrence in
    # each of doc 0 and doc 1 is cross-duplicated
    assert out.loc[0, "n_cross_dup_grams"] == 1
    assert out.loc[1, "n_cross_dup_grams"] == 1
    assert out.loc[2, "n_cross_dup_grams"] == 0


def test_span_dedup_within_doc_repeat_not_cross(ray_session, tmp_path):
    # the same 5-gram repeated INSIDE one doc is not a cross-doc dup
    texts = ["a b c d e a b c d e", "f g h i j"]
    d = _write_docs(tmp_path, texts)
    from gpml2pvjson_js_ray.pipelines.spans import \
        documents_span_dedup_stats
    out = (documents_span_dedup_stats(d).to_pandas()
           .set_index("doc_id"))
    assert out.loc[0, "n_grams"] == 6  # 10 words → 6 windows
    assert out.loc[0, "n_cross_dup_grams"] == 0
    assert out.loc[1, "n_cross_dup_grams"] == 0


def test_repetition_stats_planted(ray_session, tmp_path):
    texts = [
        "spam spam spam spam eggs",   # 5 words, 2 distinct, top=4
        "one two three four",         # all distinct
        None,                         # no row
    ]
    d = _write_docs(tmp_path, texts)
    from gpml2pvjson_js_ray.pipelines.spans import \
        documents_repetition_stats
    out = (documents_repetition_stats(d).to_pandas()
           .set_index("doc_id"))
    assert sorted(out.index) == [0, 1]
    assert out.loc[0, "n_words"] == 5
    assert out.loc[0, "n_distinct_words"] == 2
    assert out.loc[0, "top_word_count"] == 4
    assert abs(out.loc[0, "dup_word_frac"] - (1 - 2 / 5)) < 1e-12
    assert abs(out.loc[0, "top_word_frac"] - 4 / 5) < 1e-12
    assert out.loc[1, "dup_word_frac"] == 0.0


def test_event_transitions_planted(ray_session, tmp_path):
    import datetime as dt
    base = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: view → click → purchase
        (1, base, 1, "view"),
        (2, base + dt.timedelta(minutes=1), 1, "click"),
        (3, base + dt.timedelta(minutes=2), 1, "purchase"),
        # user 2: view → click (tie on ts broken by event_id: 4 then 5)
        (5, base, 2, "click"),
        (4, base, 2, "view"),
        # user 3: single event → no transition
        (6, base, 3, "view"),
    ]
    table = pa.table({
        "event_id": [r[0] for r in rows],
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "user_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))
    from gpml2pvjson_js_ray.pipelines.spans import events_type_transitions
    out = events_type_transitions(str(d)).to_pandas()
    got = {(r.from_type, r.to_type): r.n_transitions
           for r in out.itertuples()}
    assert got == {("view", "click"): 2, ("click", "purchase"): 1}


def test_span_dedup_filter_drops_heavy_dup(ray_session, tmp_path):
    shared = "alpha beta gamma delta epsilon"
    texts = [
        shared,                              # 1 gram, 100% dup → dropped
        f"{shared} unique tail words here",  # dup_frac 1/5 → kept
        "all fresh words in this document",  # 0% dup → kept
    ]
    d = _write_docs(tmp_path, texts + [shared])  # doc 3 repeats doc 0
    from gpml2pvjson_js_ray.pipelines.spans import \
        documents_span_dedup_filter
    out = (documents_span_dedup_filter(d, max_dup_frac=0.5).to_pandas()
           .set_index("doc_id"))
    assert sorted(out.index) == [1, 2]
    assert out.loc[1, "dup_frac"] == 0.2
    assert out.loc[2, "dup_frac"] == 0.0


def test_char_lm_score_planted(ray_session, tmp_path):
    """Hand-check: corpus 'ab ab' + 'ab cd'. Bigram counts: ab×3, cd×1.
    Prefix totals: a·=3, c·=1 → logp(ab)=ln(1)=0, logp(cd)=ln(1)=0...
    make it non-trivial: add 'ac' so a-prefix splits."""
    texts = ["ab ab", "ab cd", "ac"]
    import math
    d = _write_docs(tmp_path, texts)
    from gpml2pvjson_js_ray.pipelines.textops import \
        documents_char_lm_score
    out = (documents_char_lm_score(d).to_pandas().set_index("doc_id"))
    # model: ab→3, ac→1 (a·=4); cd→1 (c·=1)
    lp_ab = math.log(3 / 4)
    lp_ac = math.log(1 / 4)
    assert out.loc[0, "n_bigrams"] == 2
    assert abs(out.loc[0, "avg_logp"] - round(lp_ab, 6)) < 2e-6
    assert out.loc[1, "n_bigrams"] == 2
    assert abs(out.loc[1, "avg_logp"] - round((lp_ab + 0.0) / 2, 6)) < 2e-6
    assert out.loc[2, "n_bigrams"] == 1
    assert abs(out.loc[2, "avg_logp"] - round(lp_ac, 6)) < 2e-6


def test_profile_table_with_nulls_and_lists(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path / "p"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["a", None, "a", "b"],
        "lang": ["en", "en", None, None],
        "source": ["s"] * 4,
        "n_chars": [1, 0, 1, 1],
    }), str(d / "documents.parquet"))
    pq.write_table(pa.table({
        "vec_id": [0, 1, 2],
        "embedding": pa.array([[1.0, 2.0], [1.0, 2.0], [3.0, 4.0]],
                              type=pa.list_(pa.float32())),
        "label": ["x", "y", "x"],
    }), str(d / "embeddings.parquet"))
    from gpml2pvjson_js_ray.pipelines.profiler import profile_table
    out = profile_table(str(d), "documents").set_index("column_name")
    assert out.loc["text", "n_nulls"] == 1
    assert out.loc["text", "n_distinct"] == 2   # 'a', 'b' (NULL excluded)
    assert out.loc["lang", "n_nulls"] == 2
    assert out.loc["lang", "n_distinct"] == 1
    assert out.loc["source", "n_distinct"] == 1
    assert (out["n_rows"] == 4).all()
    emb = profile_table(str(d), "embeddings").set_index("column_name")
    assert emb.loc["embedding", "n_distinct"] == 2  # list column dedup
    assert emb.loc["label", "n_distinct"] == 2


def test_gopher_filter_planted_cases(ray_session, tmp_path):
    """Short docs, duplicate-heavy docs and top-word-heavy docs are
    dropped; ordinary prose passes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # letter-only words: the shared token regex drops digits
    import itertools
    import string
    vocab = ["".join(p) for p in
             itertools.product(string.ascii_lowercase, repeat=2)]
    ok = " ".join(vocab[:40])                              # diverse, long
    short = "tiny doc"                                     # < 20 words
    dupey = " ".join(["spam"] * 30 + ["ham"] * 10)         # dup 0.95
    toppy = " ".join(["filler"] * 15 + vocab[100:125])     # top 0.375
    table = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [ok, short, dupey, toppy],
        "lang": ["en"] * 4,
        "source": ["t"] * 4,
        "n_chars": [len(t) for t in [ok, short, dupey, toppy]],
    })
    d = tmp_path / "gf"
    d.mkdir()
    pq.write_table(table, str(d / "documents.parquet"))
    from gpml2pvjson_js_ray.pipelines.spans import documents_gopher_filter
    out = (documents_gopher_filter(str(d)).to_pandas()
           .set_index("doc_id"))
    assert bool(out.loc[0, "keep"])
    assert not bool(out.loc[1, "keep"])   # word-count floor
    assert not bool(out.loc[2, "keep"])   # dup_word_frac cap
    assert not bool(out.loc[3, "keep"])   # top_word_frac cap


def test_ccnet_buckets_planted(ray_session, tmp_path):
    """Three engineered score levels in 'en' (2 low / 4 mid / 2 high →
    tail/middle/head at p25/p75) plus a 'de' lang whose docs all tie
    (everything <= t_lo → all tail). Verifies per-lang independence and
    the discrete-quantile threshold semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = (["ad"] * 2 + ["ab ad"] * 4 + ["ab ab"] * 2   # en
             + ["xy"] * 2 + ["xz"] * 2)                   # de (all tie)
    langs = ["en"] * 8 + ["de"] * 4
    d = tmp_path / "ccnet"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": list(range(len(texts))),
        "text": texts,
        "lang": langs,
        "source": ["s"] * len(texts),
        "n_chars": [len(t) for t in texts],
    }), str(d / "documents.parquet"))
    from gpml2pvjson_js_ray.pipelines.textops import documents_ccnet_buckets
    out = (documents_ccnet_buckets(str(d)).to_pandas()
           .set_index(["lang", "bucket"])["n_docs"])
    assert out[("en", "tail")] == 2      # the two pure-'ad' docs
    assert out[("en", "middle")] == 4    # the mixed docs
    assert out[("en", "head")] == 2      # the two pure-'ab' docs
    assert out[("de", "tail")] == 4      # identical scores collapse to tail
    assert ("de", "head") not in out.index
