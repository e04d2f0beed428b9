"""Embedding similarity: brute-force top-k vs numpy, sign-LSH pairs, and
the OR-amplified multi-table variant's recall guarantee."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.operators.similarity import (
    cosine_dup_pairs,
    cosine_pairs_lsh,
    cosine_pairs_lsh_multi,
    cosine_topk,
)


def _make_vectors(n_clusters=6, per_cluster=8, dim=16, noise=0.05, seed=3):
    """Clustered unit vectors: same-cluster pairs have very high cosine."""
    rng = np.random.RandomState(seed)
    rows = []
    vid = 0
    for _ in range(n_clusters):
        center = rng.standard_normal(dim)
        center /= np.linalg.norm(center)
        for _ in range(per_cluster):
            v = center + noise * rng.standard_normal(dim)
            rows.append((vid, (v / np.linalg.norm(v)).tolist()))
            vid += 1
    return rows


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.createDataFrame(
        _make_vectors(), "vec_id long, embedding array<double>"
    ).cache()
    df.count()
    return df


def _true_pairs(rows, threshold):
    vecs = {i: np.array(v) for i, v in rows}
    out = set()
    ids = sorted(vecs)
    for i in ids:
        for j in ids:
            if i < j:
                c = float(vecs[i] @ vecs[j] / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[j])))
                if round(c, 4) >= threshold:
                    out.add((i, j))
    return out


def test_cosine_topk_matches_numpy(spark, emb):
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    vecs = {i: np.array(v) for i, v in rows}
    q = vecs[0]
    scored = sorted(
        (
            (-round(float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), 4), i)
            for i, v in vecs.items()
            if i != 0
        ),
    )[:10]
    want = [(i, -s) for s, i in scored]
    got = [(r["vec_id"], r["cosine"]) for r in cosine_topk(emb, 0, 10).collect()]
    assert got == [(i, pytest.approx(s)) for i, s in want]


def test_multi_table_recall_dominates_single(spark, emb):
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    truth = _true_pairs(rows, 0.9)
    single = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_pairs_lsh(emb, n_planes=8, threshold=0.9).collect()
    }
    multi = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_pairs_lsh_multi(emb, n_tables=6, n_planes=8, threshold=0.9).collect()
    }
    # no false positives on either path (exact verification)
    assert single <= truth and multi <= truth
    # OR-amplification can only help: every single-table hit that used
    # table seed 42's planes is found by the multi-table union too when
    # table 0 shares that seed (seed + t, t=0)
    assert single <= multi
    # and with 6 tables the recall must be high on tightly-clustered data
    assert len(truth) > 0
    assert len(multi) / len(truth) >= 0.9


def test_cosine_dup_pairs_exact_vs_numpy(spark, emb):
    """The exact path IS the truth set (recall 1.0 by construction), and
    the LSH scale paths are subsets of it (no false positives)."""
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    truth = _true_pairs(rows, 0.9)
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_dup_pairs(emb, threshold=0.9).collect()
    }
    assert exact == truth
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_pairs_lsh_multi(emb, n_tables=6, n_planes=8, threshold=0.9).collect()
    }
    assert lsh <= exact


def test_cosine_dup_pairs_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    got = cosine_dup_pairs(df, threshold=0.5)
    assert got.columns == ["vec_a", "vec_b", "cosine"]
    assert got.count() == 0


def test_multi_table_exact_duplicates_always_found(spark):
    v = (np.ones(8) / np.sqrt(8)).tolist()
    w = (np.concatenate([np.ones(4), -np.ones(4)]) / np.sqrt(8)).tolist()
    df = spark.createDataFrame(
        [(0, v), (1, v), (2, w)], "vec_id long, embedding array<double>"
    )
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in cosine_pairs_lsh_multi(df, n_tables=2, n_planes=4, threshold=0.99).collect()
    }
    # identical vectors share every bucket in every table
    assert got == {(0, 1): pytest.approx(1.0)}


def test_ivf_topk_recall_and_exactness(spark, emb, tmp_path):
    from search_engine_spark.operators.similarity import ivf_topk

    path = str(tmp_path / "ivf")
    exact = [(r["vec_id"], r["cosine"]) for r in cosine_topk(emb, 0, 10).collect()]
    # full probing degenerates to exact brute force
    full = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk(emb, 0, 10, n_centroids=6, n_probe=6, index_path=path).collect()
    ]
    assert full == exact
    # partial probing: high recall on clustered data (the query's own
    # cluster is always probed, and same-cluster vectors dominate top-k);
    # the index at `path` is REUSED (no second KMeans fit)
    part = {
        r["vec_id"]
        for r in ivf_topk(emb, 0, 10, n_centroids=6, n_probe=2, index_path=path).collect()
    }
    assert len(part) == 10
    recall = len(part & {i for i, _ in exact}) / 10
    assert recall >= 0.7
    # missing query id -> empty result, stable schema
    assert ivf_topk(emb, 99999, 10, index_path=path).count() == 0


def test_ivf_build_probe_split(spark, emb, tmp_path):
    """VERDICT r02 #1: quantizer fit happens ONCE at build; probes are
    partition-pruned scans of the persisted centroid-partitioned lists."""
    import json
    import os

    from search_engine_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe,
        ivf_probe_by_id,
    )

    path = str(tmp_path / "ivf_idx")
    manifest = build_ivf_index(emb, path, n_centroids=6, seed=42)
    assert manifest["n_centroids"] == 6
    # persisted artifacts: centroid-partitioned lists + manifest
    assert os.path.exists(os.path.join(path, "centroids.json"))
    subdirs = {d for d in os.listdir(os.path.join(path, "lists")) if d.startswith("list_id=")}
    assert len(subdirs) >= 2  # clustered data spreads over lists
    with open(os.path.join(path, "centroids.json")) as f:
        assert len(json.load(f)["centroids"]) == 6

    # full probe == brute force, regardless of the assignment
    exact = [(r["vec_id"], r["cosine"]) for r in cosine_topk(emb, 0, 10).collect()]
    got = [
        (r["vec_id"], r["cosine"])
        for r in ivf_probe_by_id(spark, path, 0, k=10, n_probe=6).collect()
    ]
    assert got == exact

    # narrow probe: the scan is PARTITION-pruned on list_id (the whole
    # point of the persisted layout) and returns a subset of the lists
    qv = [r["embedding"] for r in emb.filter("vec_id = 0").collect()][0]
    narrow = ivf_probe(spark, path, qv, k=10, n_probe=1, exclude_vec_id=0)
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan  # pruned scan
    assert narrow.count() <= 10

    # unknown id raises cleanly
    import pytest as _pytest

    with _pytest.raises(KeyError):
        ivf_probe_by_id(spark, path, 424242, k=5)


def test_ivf_build_clamps_centroids(spark, tmp_path):
    """ADVICE r02: n_centroids > n_vectors must not break the fit."""
    from search_engine_spark.operators.similarity import build_ivf_index, ivf_probe

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "tiny")
    manifest = build_ivf_index(df, path, n_centroids=16)
    assert manifest["n_centroids"] == 3  # clamped to n_vectors
    got = ivf_probe(spark, path, [1.0, 0.0], k=2, n_probe=99)
    assert got.count() == 2


def test_lsh_pairs_empty_input(spark):
    """ADVICE r02: empty embeddings -> empty pair result, not TypeError."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    for fn in (cosine_pairs_lsh, cosine_pairs_lsh_multi):
        out = fn(empty)
        assert out.columns == ["vec_a", "vec_b", "cosine"]
        assert out.count() == 0


def test_null_vectors_dropped_not_fatal(spark):
    """ADVICE r03: a NULL embedding in whatever row first() returns must
    not zero out the result — NULL vectors are dropped, pairs among the
    non-null rows still come back, for all three pair operators."""
    v = (np.ones(8) / np.sqrt(8)).tolist()
    # single partition with the NULL row first so first() sees it
    df = spark.createDataFrame(
        [(0, None), (1, v), (2, v)], "vec_id long, embedding array<double>"
    ).coalesce(1)
    for fn in (
        lambda d: cosine_dup_pairs(d, threshold=0.99),
        lambda d: cosine_pairs_lsh(d, n_planes=4, threshold=0.99),
        lambda d: cosine_pairs_lsh_multi(d, n_tables=2, n_planes=4, threshold=0.99),
    ):
        got = {(r["vec_a"], r["vec_b"]) for r in fn(df).collect()}
        assert got == {(1, 2)}
    # all-NULL input behaves like empty
    allnull = spark.createDataFrame(
        [(0, None), (1, None)], "vec_id long, embedding array<double>"
    )
    for fn in (cosine_pairs_lsh, cosine_pairs_lsh_multi):
        assert fn(allnull).count() == 0
