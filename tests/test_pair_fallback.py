"""Round-5 (advice #6): the candidate-pair driver-collect size guard.

The near-dup verifiers (documents_minhash_dups, documents_setsim_join)
collect the candidate-pair table on the driver only when its COUNTED
size is under _pair_collect_cap(); forcing the cap to 0 simulates an
adversarially dense candidate set and must switch both to the fully
distributed union+groupby verify (_distributed_shingle_verify) with
IDENTICAL results — the fallback is an enforced branch, not a comment.
"""

import pandas as pd
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


def _key(df):
    return sorted(map(tuple, df[["doc_a", "doc_b", "jaccard"]]
                      .itertuples(index=False)))


def test_minhash_pair_collect_fallback_matches(ray_session, tmp_path,
                                               monkeypatch):
    from gpml2pvjson_js_ray.pipelines import textops

    base = " ".join(f"tok{i}" for i in range(40))
    texts = ([base, base + " phi", base + " rho"]
             + [f"unrelated text number {i} with words "
                + " ".join(f"w{i}{j}" for j in range(30))
                for i in range(8)])
    d = _write_docs(tmp_path, texts)

    fast = textops.documents_minhash_dups(d).to_pandas()
    assert len(fast) >= 3          # the planted triple pairs up

    monkeypatch.setenv("GRAFT_PAIR_COLLECT_CAP", "0")
    slow = textops.documents_minhash_dups(d).to_pandas()
    assert _key(slow) == _key(fast)


def test_setsim_pair_collect_fallback_matches(ray_session, tmp_path,
                                              monkeypatch):
    from gpml2pvjson_js_ray.pipelines import textops

    twin = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lam mu")
    texts = [twin, twin, "p q r s t u", "p q r s t zz",
             "one two three four five six", "one two three aaa bbb ccc"]
    d = _write_docs(tmp_path, texts)

    fast = textops.documents_setsim_join(d).to_pandas()
    assert len(fast) >= 2          # (0,1) exact twin + (2,3) 0.6 pair

    monkeypatch.setenv("GRAFT_PAIR_COLLECT_CAP", "0")
    slow = textops.documents_setsim_join(d).to_pandas()
    assert _key(slow) == _key(fast)
