"""Tests for deterministic split / stratified sample / sequence packing."""
import os

import numpy as np
import pandas as pd
import pytest

from gpml2pvjson_js_ray.pipelines import sampling


@pytest.fixture(scope="module")
def samp_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("samp_sf")
    n = 40
    pd.DataFrame({
        "doc_id": range(n),
        "text": ["x"] * n,
        "lang": (["en", "de", "xx", "zh"] * 10),
        "source": ["s"] * n,
        # lengths exercise multi-chunk spans: doc 1 is longer than one
        # 10-char window, doc 3 is empty
        "n_chars": [4, 25, 7, 0] * 10,
    }).to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return str(d)


def test_split_assign_deterministic_and_partitioned(ray_session, samp_sf):
    out = sampling.documents_split_assign(samp_sf).to_pandas()
    assert len(out) == 40
    # recompute the hash rule directly
    h = (out["doc_id"].to_numpy() * sampling._SPLIT_MULT) % (1 << 32) % 100
    want = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
    assert list(out["split"]) == list(want)
    # rerun → identical assignment (determinism)
    again = sampling.documents_split_assign(samp_sf).to_pandas()
    assert list(again["split"]) == list(out["split"])


def test_stratified_sample_respects_rates(ray_session, samp_sf):
    out = sampling.documents_stratified_sample(samp_sf).to_pandas()
    h = (out["doc_id"].to_numpy() * sampling._SAMPLE_MULT) % (1 << 32) % 1000
    rates = out["lang"].map(
        lambda x: sampling._LANG_RATE_PMIL.get(
            x, sampling._DEFAULT_RATE_PMIL)).to_numpy()
    assert (h < rates).all()
    # unknown lang 'xx' uses the default rate; at least verify the
    # sampled set is exactly the brute-force recompute over all docs
    full = pd.read_parquet(os.path.join(samp_sf, "documents.parquet"))
    fh = (full["doc_id"].to_numpy() * sampling._SAMPLE_MULT) \
        % (1 << 32) % 1000
    fr = full["lang"].map(
        lambda x: sampling._LANG_RATE_PMIL.get(
            x, sampling._DEFAULT_RATE_PMIL)).to_numpy()
    assert set(out["doc_id"]) == set(full.loc[fh < fr, "doc_id"])


def test_mixture_interleave_density(ray_session, tmp_path):
    """src2 (weight 2) must interleave twice as densely as src1:
    its rank-k doc lands at pos 500k vs 1000k."""
    n = 12
    pd.DataFrame({
        "doc_id": range(n),
        "text": ["x"] * n,
        "lang": ["en"] * n,
        "source": ["src1", "src2"] * 6,
        "n_chars": [5] * n,
    }).to_parquet(os.path.join(tmp_path, "documents.parquet"), index=False)
    out = sampling.documents_mixture_interleave(str(tmp_path)).to_pandas()
    w1 = out[out["source"] == "src1"]
    w2 = out[out["source"] == "src2"]
    assert list(w1["pos"]) == [1000 * k for k in range(1, 7)]
    assert list(w2["pos"]) == [500 * k for k in range(1, 7)]
    # global order: the first three rows are src2 rank1, src2 rank2 and
    # src1 rank1 (ties at 1000 broken by doc_id)
    assert list(out["pos"][:3]) == [500, 1000, 1000]


def test_uniform_k_sample_is_hash_smallest(ray_session, samp_sf):
    out = sampling.documents_uniform_k_sample(samp_sf, k=5).to_pandas()
    assert len(out) == 5
    full = pd.read_parquet(os.path.join(samp_sf, "documents.parquet"))
    h = (full["doc_id"].to_numpy() * sampling._SAMPLE_MULT) % (1 << 32)
    want = full.assign(h=h).sort_values(["h", "doc_id"]).head(5)
    assert list(out["doc_id"]) == list(want["doc_id"])


def test_concat_chunks_matches_serial_scan(ray_session, samp_sf):
    out = (sampling.documents_concat_chunks(samp_sf, capacity=10,
                                            bucket_docs=7)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    full = pd.read_parquet(os.path.join(samp_sf, "documents.parquet")) \
        .sort_values("doc_id")
    n = full["n_chars"].to_numpy()
    start = np.cumsum(n) - n
    end = start + np.maximum(n, 1) - 1
    assert list(out["chunk_start"]) == list(start // 10)
    assert list(out["chunk_end"]) == list(end // 10)
    assert list(out["chunk_offset"]) == list(start % 10)
    # doc 1 (25 chars) must span 3 windows somewhere in the packing
    spans = out["chunk_end"] - out["chunk_start"]
    assert spans.max() >= 2


def test_negative_pairs_deterministic_and_self_free(ray_session):
    """Every doc gets exactly k negatives, none equal to itself, all in
    [0, N); re-running yields the identical pair set (no RNG state)."""
    from gpml2pvjson_js_ray.pipelines.sampling import (
        documents_negative_pairs)

    a = documents_negative_pairs("/root/testdata/sf0.001").to_pandas()
    b = documents_negative_pairs("/root/testdata/sf0.001").to_pandas()
    assert a.equals(b)
    n = a["doc_id"].nunique()
    assert (a.groupby("doc_id").size() == 2).all()
    assert (a["neg_doc_id"] != a["doc_id"]).all()
    assert a["neg_doc_id"].between(0, n - 1).all()
