"""Table maintenance: small-file compaction + snapshot diff + MMR rerank.

The oracle equality of documents_compact / documents_snapshot_diff vs
DuckDB runs in tests/test_oracles.py; these tests pin the parts SQL
can't see — file-count coalescing, atomic publish, manifest contents,
and the MMR diversity behavior on a planted corpus.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gpml2pvjson_js_ray.pipelines import maintenance


def test_compact_coalesces_small_files(ray_session, tmp_path):
    src = tmp_path / "shards"
    src.mkdir()
    rows_per = 200
    for i in range(20):  # 20 small files
        t = pa.table({
            "doc_id": pa.array(
                np.arange(i * rows_per, (i + 1) * rows_per), pa.int64()),
            "text": pa.array([f"doc {j} " + "x" * 50
                              for j in range(i * rows_per,
                                             (i + 1) * rows_per)])})
        pq.write_table(t, src / f"part-{i:03d}.parquet")

    sizes = [os.path.getsize(src / f) for f in os.listdir(src)]
    target = sum(sizes) // 3  # aim for ~3 output files
    out = str(tmp_path / "compacted")
    manifest = maintenance.compact_parquet(str(src), out,
                                           target_bytes=target)

    assert manifest["n_input_files"] == 20
    assert manifest["planned_output_files"] in (3, 4)
    assert 1 <= manifest["n_output_files"] <= manifest[
        "planned_output_files"] + 1
    assert manifest["n_output_files"] < 20
    # lossless: same rows, same content
    before = pq.read_table(str(src)).sort_by("doc_id")
    after = pq.read_table(out).select(
        ["doc_id", "text"]).sort_by("doc_id")
    assert after.equals(before.select(["doc_id", "text"]))
    # no leftover tmp dir from the atomic publish
    assert not os.path.exists(out + ".tmp")


def test_compact_reuses_existing_output(ray_session, tmp_path):
    src = tmp_path / "one"
    src.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array([1, 2, 3], pa.int64())}),
                   src / "a.parquet")
    out = str(tmp_path / "c")
    m1 = maintenance.compact_parquet(str(src), out)
    marker = os.path.join(out, "marker")
    open(marker, "w").close()
    m2 = maintenance.compact_parquet(str(src), out)  # no rebuild
    assert os.path.exists(marker)
    assert m1["n_output_files"] == m2["n_output_files"]


def _write_embeddings(path, vecs):
    ids = pa.array(np.arange(len(vecs)), pa.int64())
    emb = pa.array([list(map(float, v)) for v in vecs],
                   type=pa.list_(pa.float32()))
    pq.write_table(pa.table({"vec_id": ids, "embedding": emb}), path)


def test_mmr_prefers_diverse_over_redundant(ray_session, tmp_path):
    """Corpus: query q=e0; A and A' nearly identical and closest to q;
    B moderately similar to q but orthogonal to A. Plain top-2 is
    {A, A'}; MMR with lam=0.5 must pick A then B."""
    from gpml2pvjson_js_ray.pipelines.simops import embeddings_mmr_top10

    q = np.array([1.0, 0.0, 0.0, 0.0])
    a = np.array([0.98, 0.17, 0.0, 0.0])   # sim ~0.985
    a2 = np.array([0.97, 0.18, 0.0, 0.0])  # near-duplicate of a
    b = np.array([0.55, 0.0, 0.83, 0.0])   # sim ~0.55, diverse
    far = np.array([0.0, 0.0, 0.0, 1.0])
    _write_embeddings(str(tmp_path / "embeddings.parquet"),
                      [q, a, a2, b, far])

    out = embeddings_mmr_top10(str(tmp_path), query_id=0, k=3,
                               lam=0.5).to_pandas()
    assert list(out["rank"]) == [1, 2, 3]
    # A first (relevance argmax), then diverse B; the near-duplicate A'
    # is pushed BELOW even the orthogonal doc (its redundancy penalty
    # ~1.0 exceeds its relevance) — relevance-only top-3 would be
    # A, A', B.
    assert list(out["vec_id"]) == [1, 3, 4]
    assert out["sim"].iloc[0] == pytest.approx(
        float(np.dot(q, a) / np.linalg.norm(a)), abs=1e-5)
    # mmr_score is non-increasing
    assert (np.diff(out["mmr_score"]) <= 1e-12).all()

    # relevance-dominant weighting restores the similarity ordering
    out_hi = embeddings_mmr_top10(str(tmp_path), query_id=0, k=3,
                                  lam=0.9).to_pandas()
    assert list(out_hi["vec_id"]) == [1, 2, 3]  # A, A', then B


def test_mmr_first_pick_is_relevance_argmax(ray_session, tmp_path):
    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(30, 8))
    _write_embeddings(str(tmp_path / "embeddings.parquet"), vecs)
    from gpml2pvjson_js_ray.pipelines.simops import embeddings_mmr_top10
    out = embeddings_mmr_top10(str(tmp_path), query_id=0, k=5,
                               lam=0.7).to_pandas()
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sims = np.round(unit[1:] @ unit[0], 6)
    assert out["vec_id"].iloc[0] == 1 + int(
        np.lexsort((np.arange(1, 30), -sims))[0])
    assert len(out) == 5
    assert out["vec_id"].is_unique


def test_incremental_source_report_reuses_state(ray_session):
    """Second refresh must reuse the materialized base partials (state
    files untouched) and still equal the one-shot full report."""
    from gpml2pvjson_js_ray.pipelines import maintenance
    from gpml2pvjson_js_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    out1 = maintenance.documents_source_report_incremental(sf)
    import hashlib
    src = os.path.abspath(os.path.join(sf, "documents.parquet"))
    key = hashlib.sha1(
        f"{src}|{os.path.getmtime(src)}|src_report|5|0"
        .encode()).hexdigest()[:16]
    state_dir = os.path.join(maintenance._VIEW_ROOT, key)
    assert os.path.isdir(state_dir)
    stamps = sorted((f, os.path.getmtime(os.path.join(state_dir, f)))
                    for f in os.listdir(state_dir))
    out2 = maintenance.documents_source_report_incremental(sf)
    assert sorted((f, os.path.getmtime(os.path.join(state_dir, f)))
                  for f in os.listdir(state_dir)) == stamps
    assert out1.equals(out2)
    full = relational.documents_source_report(sf)
    assert out1.equals(full)


def test_ivf_append_visibility_and_recall(ray_session):
    """Vectors ingested through ivf_append (the held-out vec_id%10==7
    slice) must be reachable by the probe path exactly like base
    vectors, with exact sims for whatever the probes return."""
    from gpml2pvjson_js_ray.pipelines.relational import \
        embeddings_cosine_top10
    from gpml2pvjson_js_ray.pipelines.simops import (
        _ivf_append_demo_index, embeddings_ann_ivf_appended_top10)

    sf = "/root/testdata/sf0.001"
    ann = embeddings_ann_ivf_appended_top10(sf, nprobe=6).to_pandas()
    assert len(ann) == 10
    brute = embeddings_cosine_top10(sf).to_pandas()
    overlap = set(brute["vec_id"]) & set(ann["vec_id"])
    assert len(overlap) >= 3, f"recall too low: {len(overlap)}/10"
    b = brute.set_index("vec_id")["sim"]
    a = ann.set_index("vec_id")["sim"]
    for vid in overlap:
        assert abs(a[vid] - b[vid]) < 1e-9

    # appended vectors live in the SAME hive layout and are readable:
    # every held-out id assigned somewhere, none lost
    import glob
    import pyarrow.parquet as _pq
    idx_dir, _ = _ivf_append_demo_index(sf)
    idx_ids = np.concatenate([
        _pq.read_table(f, columns=["vec_id"])["vec_id"].to_numpy()
        for f in glob.glob(os.path.join(idx_dir, "ivf_list=*",
                                        "*.parquet"))])
    src_ids = _pq.read_table(
        os.path.join(sf, "embeddings.parquet"),
        columns=["vec_id"])["vec_id"].to_numpy()
    assert sorted(idx_ids) == sorted(src_ids)
    held = src_ids[src_ids % 10 == 7]
    assert len(held) > 0 and set(held) <= set(idx_ids)


def test_cluster_profile_mass_and_cohesion(ray_session, tmp_path):
    """Two tight planted directions: every vector lands in some cluster
    (mass conserved) and every cluster is cohesive (mean_sim high)."""
    rng = np.random.RandomState(3)
    a = np.array([1.0, 0, 0, 0])
    b = np.array([0, 1.0, 0, 0])
    vecs = [d + rng.normal(scale=0.01, size=4)
            for d in ([a] * 40 + [b] * 40)]
    _write_embeddings(str(tmp_path / "embeddings.parquet"), vecs)
    from gpml2pvjson_js_ray.pipelines.simops import \
        embeddings_cluster_profile
    prof = embeddings_cluster_profile(str(tmp_path)).to_pandas()
    assert prof["n_vectors"].sum() == 80
    assert (prof["mean_sim"] > 0.98).all()
    assert prof["cluster"].is_monotonic_increasing


def test_quarantine_report_counts_planted_malformed(ray_session):
    """The synthetic corpus plants malformed islands; the report must
    classify them and its total must equal the docs error-row count."""
    from gpml2pvjson_js_ray.pipelines import kg
    pages = kg.read_pages(kg.pages_path_for_sf("/root/testdata/sf0.001"))
    rep = kg.quarantine_report(pages).to_pandas()
    docs = kg.docs_dataset(
        kg.read_pages(kg.pages_path_for_sf("/root/testdata/sf0.001")))
    import pyarrow.compute as pc
    n_err = sum(
        pc.sum(pc.cast(pc.not_equal(b["error"], ""), "int64")).as_py() or 0
        for b in docs.select_columns(["error"])
        .iter_batches(batch_format="pyarrow"))
    assert n_err > 0  # the corpus really plants malformed islands
    assert int(rep["n"].sum()) == n_err
    assert (rep["error_class"].str.len() <= 60).all()
    assert "GPML parse failed" in set(rep["error_class"])


def test_zorder_clusters_both_columns(ray_session, tmp_path):
    """Z-order layout makes file-level min/max pruning effective on BOTH
    cluster columns: for a point/band predicate on either column, only a
    minority of files' [min,max] spans can match — unlike a layout
    sorted by a single column, where the non-leading column's spans
    cover everything. Losslessness is pinned by the events_zorder
    DuckDB oracle in test_oracles.py."""
    rng = np.random.RandomState(7)
    n = 40_000
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.randint(0, 1000, size=n), pa.int64()),
        "value": pa.array(rng.uniform(0.0, 500.0, size=n),
                          pa.float64())})
    src = tmp_path / "events.parquet"
    pq.write_table(t, src)

    out = str(tmp_path / "zordered")
    manifest = maintenance.zorder_parquet(str(src), out, "user_id",
                                          "value", num_files=16)
    n_files = manifest["n_files"]
    assert n_files >= 8

    # pruning power: a mid-range point lookup on user_id and a narrow
    # band on value must each match a minority of files' spans
    hit_user = sum(1 for f in manifest["files"]
                   if f["user_id_min"] <= 500 <= f["user_id_max"])
    hit_value = sum(1 for f in manifest["files"]
                    if not (f["value_max"] < 250.0
                            or f["value_min"] > 251.0))
    assert hit_user <= n_files // 2, manifest["files"]
    assert hit_value <= n_files // 2, manifest["files"]

    # lossless: every row survives the rewrite
    after = pq.read_table(out)
    assert after.num_rows == n
    assert set(after.column_names) == {"event_id", "user_id", "value"}


def test_merge_upsert_applies_all_three_ops(ray_session):
    """Spot-check the CDC fold on sf0.001: deleted keys vanish, updated
    keys carry the 'upd ' prefix, inserted keys exist above the offset
    with the 'ins ' prefix (full value equality vs the SQL MERGE runs in
    test_oracles.py at sf0.01)."""
    out = maintenance.documents_merge_upsert(
        "/root/testdata/sf0.001").to_pandas()
    ids = set(out["doc_id"])
    assert not any(i % maintenance._M_DEL_MOD == maintenance._M_DEL_REM
                   for i in ids if i >= 0)
    upd = out[(out["doc_id"] >= 0)
              & (out["doc_id"] % maintenance._M_UPD_MOD
                 == maintenance._M_UPD_REM)]
    assert len(upd) and upd["text"].str.startswith("upd ").all()
    ins = out[out["doc_id"] < 0]  # inserts live in the negative space
    assert len(ins) and ins["text"].str.startswith("ins ").all()
    assert ((-ins["doc_id"] - 1)
            % maintenance._M_INS_MOD == maintenance._M_INS_REM).all()
