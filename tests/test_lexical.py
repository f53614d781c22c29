"""Targeted tests for pipelines/lexical.py — planted-data behaviors
(mention counting, AND-intersection, BPE pair math, kNN tie-breaks).
Cross-engine value parity on the driver corpus is covered by the
auto-parametrized tests/test_oracles.py sweep."""

from __future__ import annotations

import numpy as np
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
    d.mkdir(exist_ok=True)
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


def _write_embeddings(tmp_path, vecs):
    table = pa.table({
        "vec_id": pa.array(list(range(len(vecs))), type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), type=pa.int32()),
    })
    d = tmp_path / "emb"
    d.mkdir(exist_ok=True)
    pq.write_table(table, str(d / "embeddings.parquet"))
    return str(d)


def test_entity_mentions_counts_and_case(ray_session, tmp_path):
    d = _write_docs(tmp_path, [
        "customer customer dup likes the Table",
        "Spark TABLE table tAbLe!",
        "nothing relevant here",
        None,
    ])
    from gpml2pvjson_js_ray.pipelines.lexical import documents_entity_mentions
    out = documents_entity_mentions(d).to_pandas()
    got = {(r.doc_id, r.term): (r.iri, r.n_mentions)
           for r in out.itertuples()}
    assert got[(0, "customer")] == ("urn:kb:ent:0001", 2)
    assert got[(0, "dup")] == ("urn:kb:ent:0005", 1)
    assert got[(0, "table")] == ("urn:kb:ent:0004", 1)
    assert got[(1, "spark")] == ("urn:kb:ent:0002", 1)
    assert got[(1, "table")][1] == 3  # case-folded, punctuation-split
    assert not any(doc == 2 or doc == 3 for doc, _ in got)
    # non-dictionary terms never appear
    assert set(out["term"]) <= {"customer", "spark", "vector", "table",
                                "dup", "window"}


def test_search_and_requires_every_term(ray_session, tmp_path):
    d = _write_docs(tmp_path, [
        "dup key vector",          # all three → match
        "dup dup key",             # missing vector
        "vector key",              # missing dup
        "key dup vector vector",   # all three → match
        "",
    ])
    from gpml2pvjson_js_ray.pipelines.lexical import documents_search_and
    out = documents_search_and(d).to_pandas()
    assert out["doc_id"].tolist() == [0, 3]


def test_bpe_pair_counts_word_boundaries(ray_session, tmp_path):
    # "abab ab" → within-word pairs ab,ba,ab + ab; the space-crossing
    # "b a" pair must NOT count
    d = _write_docs(tmp_path, ["abab ab", None])
    from gpml2pvjson_js_ray.pipelines.lexical import documents_bpe_pair_stats
    out = documents_bpe_pair_stats(d).to_pandas()
    counts = dict(zip(out["pair"], out["n"]))
    assert counts == {"ab": 3, "ba": 1}
    # ordering: n desc, then pair asc
    assert out["pair"].tolist() == ["ab", "ba"]


def test_knn_graph_ranks_and_tie_break(ray_session, tmp_path):
    # v1 and v2 are identical ⇒ equal cosine to v0: the tie must resolve
    # to the smaller neighbor_id at rank 1/2.
    d = _write_embeddings(tmp_path, [
        [1.0, 0.0], [0.0, 1.0], [0.0, 1.0], [-1.0, 0.0]])
    from gpml2pvjson_js_ray.pipelines.lexical import embeddings_knn_graph
    out = embeddings_knn_graph(d, k=2).to_pandas()
    by_vec = {v: g.sort_values("rank") for v, g in out.groupby("vec_id")}
    assert by_vec[0]["neighbor_id"].tolist() == [1, 2]  # tie → id asc
    assert by_vec[0]["cosine"].tolist() == [0.0, 0.0]
    # v1's nearest is its duplicate v2 (cosine 1), never itself
    assert by_vec[1]["neighbor_id"].tolist() == [2, 0]
    assert by_vec[1]["cosine"].tolist()[0] == 1.0
    assert (out["neighbor_id"] != out["vec_id"]).all()
    # matches a serial exact recompute of the same ranking rule
    vecs = np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 1.0], [-1.0, 0.0]])
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sims = np.round(unit @ unit.T, 6)
    for v in range(4):
        cand = sorted((-(sims[v, j]), j) for j in range(4) if j != v)
        assert by_vec[v]["neighbor_id"].tolist() == \
            [j for _, j in cand[:2]]


def test_dsir_weights_prefer_target_domain(ray_session, tmp_path):
    """Docs that look like the target source score a higher log weight
    than docs that look like the rest of the corpus."""
    table = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["zyx zyx zyxzyx", "zyx zyxzyx zyx",   # target domain
                 "abc abcabc cab", "cab abc abcabc"],  # background
        "lang": ["en"] * 4,
        "source": ["src0", "src0", "srcA", "srcB"],
        "n_chars": [14] * 4,
    })
    d = tmp_path / "dsir"
    d.mkdir()
    pq.write_table(table, str(d / "documents.parquet"))
    from gpml2pvjson_js_ray.pipelines.textops import documents_dsir_weights
    out = (documents_dsir_weights(str(d)).to_pandas()
           .set_index("doc_id")["log_weight"])
    assert min(out[0], out[1]) > max(out[2], out[3])
    assert out[0] > 0 and out[2] < 0


def test_bpe_train_classic_merge_sequence(ray_session, tmp_path):
    """Sennrich's low/lower/newest corpus: first merges must be
    ('l','o') [count 5, lex tiebreak over ('o','w')], then
    ('lo','w') [5], then ('e','r') [2, lex tiebreak over ('low','e')]."""
    table = pa.table({
        "doc_id": [0, 1, 2],
        "text": ["low low low", "lower lower", "newest"],
        "lang": ["en"] * 3,
        "source": ["s"] * 3,
        "n_chars": [11, 11, 6],
    })
    d = tmp_path / "bpe"
    d.mkdir()
    pq.write_table(table, str(d / "documents.parquet"))
    from gpml2pvjson_js_ray.pipelines.lexical import documents_bpe_train
    out = documents_bpe_train(str(d), n_merges=3).to_pandas()
    assert list(zip(out["left"], out["right"], out["pair_count"])) == [
        ("l", "o", 5), ("lo", "w", 5), ("e", "r", 2)]
    assert out["rank"].tolist() == [1, 2, 3]


def test_read_documents_three_formats_identical(ray_session, tmp_path):
    """parquet, ndjson and csv inputs of the same corpus normalize to
    byte-identical Datasets (n_chars derived where the format lacks
    it), so every documents_* pipeline is format-agnostic."""
    import json

    import pandas as pd

    from gpml2pvjson_js_ray.sources.formats import read_documents

    rows = [
        {"doc_id": 1, "text": "héllo world", "lang": "en", "source": "s1"},
        {"doc_id": 2, "text": "zwei wörter", "lang": "de", "source": "s2"},
    ]
    base = pd.DataFrame(rows)
    base["n_chars"] = base["text"].str.len()

    pdir = tmp_path / "p"; pdir.mkdir()
    base.to_parquet(str(pdir / "docs.parquet"), index=False)
    jdir = tmp_path / "j"; jdir.mkdir()
    with open(jdir / "docs.ndjson", "w") as fh:
        for r in rows:  # no n_chars on purpose — must be derived
            fh.write(json.dumps(r) + "\n")
    cdir = tmp_path / "c"; cdir.mkdir()
    base.drop(columns=["n_chars"]).to_csv(str(cdir / "docs.csv"),
                                          index=False)

    frames = {}
    for name, d in [("parquet", pdir), ("ndjson", jdir), ("csv", cdir)]:
        df = (read_documents(str(d)).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
        frames[name] = df
        assert df["n_chars"].tolist() == [11, 11], name  # unicode len
    assert frames["parquet"].equals(frames["ndjson"])
    assert frames["parquet"].equals(frames["csv"])


def test_bm25_ranks_tf_and_length_normalized(ray_session, tmp_path):
    """Planted corpus with hand-checkable BM25 math: the doc hitting
    both terms with the highest tf ranks first, a no-hit doc scores
    exactly 0, and scores are non-increasing down the ranking (value
    parity vs the SQL formula runs in test_oracles.py)."""
    from gpml2pvjson_js_ray.pipelines.lexical import documents_bm25_topk

    sf = _write_docs(tmp_path, [
        "merge merge merge window x y z a",       # both terms, high tf
        "merge alpha beta gamma",                 # one hit
        "alpha beta gamma delta",                 # no hits -> 0
        "window window window window alpha beta"  # one term, tf 4
    ])
    out = documents_bm25_topk(sf).to_pandas()
    assert out["doc_id"].tolist() == [0, 3, 1, 2]
    assert out["score"].iloc[-1] == 0.0
    assert (out["score"].diff().dropna() <= 0).all()
    assert out["score"].iloc[0] > 1.0


def test_comention_pmi_planted(ray_session, tmp_path):
    """4 docs (one with no gazetteer hits): df(spark)=3, df(vector)=2,
    n_ab(spark,vector)=2 -> PMI = ln(2·4/(3·2)) = ln(4/3); terms never
    sharing a doc emit no edge."""
    import numpy as np

    from gpml2pvjson_js_ray.pipelines.lexical import documents_comention_pmi

    sf = _write_docs(tmp_path, [
        "spark vector xxx",
        "spark vector yyy",
        "spark table zzz",
        "alpha beta gamma"])
    out = documents_comention_pmi(sf).to_pandas()
    out = out.set_index(["term_a", "term_b"])
    assert ("spark", "vector") in out.index
    got = out.loc[("spark", "vector")]
    assert got["n_ab"] == 2
    assert abs(got["pmi"]
               - np.floor(np.log(4.0 / 3.0) * 1e4 + 0.5) * 1e-4) < 1e-12
    assert ("spark", "table") in out.index
    assert ("table", "vector") not in out.index
