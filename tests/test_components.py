"""Connected components (large-star/small-star) vs a union-find oracle."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from search_engine_spark.operators.components import (
    connected_components,
    dup_clusters,
)


def _union_find_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Oracle: component = min node id of each connected component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _spark_components(spark, pairs: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    out = connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


def test_components_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = rng.randint(5, 40)
        m = rng.randint(1, 2 * n)
        pairs = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(m)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            continue
        assert _spark_components(spark, pairs) == _union_find_components(pairs), (
            f"trial {trial}: {pairs}"
        )


def test_components_chain_worst_case_diameter(spark):
    # a 32-node path: naive min-label propagation needs 31 rounds; the
    # alternating-star algorithm must converge inside max_rounds=25
    pairs = [(i, i + 1) for i in range(31)]
    got = _spark_components(spark, pairs)
    assert got == {i: 0 for i in range(32)}


def test_components_cliques_and_order_independence(spark):
    # two cliques + one bridge-free pair, shuffled edge order
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    pairs += [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    pairs += [(100, 200)]
    random.Random(7).shuffle(pairs)
    got = _spark_components(spark, pairs)
    assert got == _union_find_components(pairs)
    assert got[200] == 100 and got[4] == 0 and got[13] == 10


def test_components_empty_pairs(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(df).count() == 0


def test_components_raises_when_rounds_exhausted(spark):
    # a 64-node path cannot converge in 1 round; silent non-convergence
    # would return wrong components (ADVICE r03) — it must raise instead
    import pytest as _pytest

    pairs = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=1).collect()


def test_dup_clusters_includes_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame([(1, 3), (3, 5), (2, 6)], "doc_a long, doc_b long")
    rows = {r["doc_id"]: r for r in dup_clusters(docs, pairs).collect()}
    assert len(rows) == 8
    assert rows[1]["component"] == 1 and rows[5]["component"] == 1
    assert rows[1]["cluster_size"] == 3 and rows[3]["cluster_size"] == 3
    assert rows[2]["component"] == 2 and rows[6]["component"] == 2
    assert rows[6]["cluster_size"] == 2
    for singleton in (0, 4, 7):
        assert rows[singleton]["component"] == singleton
        assert rows[singleton]["cluster_size"] == 1


def test_components_string_ids(spark):
    # ids need only be orderable; canonical = lexicographic min
    pairs = [("urlB", "urlC"), ("urlC", "urlA"), ("urlX", "urlY")]
    df = spark.createDataFrame(pairs, "doc_a string, doc_b string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {
        "urlA": "urlA",
        "urlB": "urlA",
        "urlC": "urlA",
        "urlX": "urlX",
        "urlY": "urlX",
    }


def test_canonical_docs_keeps_best_by_score(spark):
    from search_engine_spark.operators.components import canonical_docs

    docs = spark.createDataFrame(
        [
            (1, 0.5), (3, 0.9), (5, 0.9),   # cluster {1,3,5}: 3 wins (score tie -> min id)
            (2, 0.1), (6, 0.8),             # cluster {2,6}: 6 wins despite larger id
            (0, 0.4), (4, 0.7), (7, 0.2),   # singletons keep themselves
        ],
        "doc_id long, quality_score double",
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 6)], "doc_a long, doc_b long"
    )
    rows = {r["component"]: r for r in canonical_docs(docs, pairs).collect()}
    assert len(rows) == 5  # one row per cluster
    assert rows[1]["doc_id"] == 3 and rows[1]["cluster_size"] == 3
    assert rows[2]["doc_id"] == 6 and rows[2]["cluster_size"] == 2
    for singleton in (0, 4, 7):
        assert rows[singleton]["doc_id"] == singleton
        assert rows[singleton]["cluster_size"] == 1


def test_canonical_docs_plans_window_group_limit(spark):
    # the rank-1 selection must push below the sort (WindowGroupLimit),
    # so only per-cluster winners survive the exchange
    from search_engine_spark.operators.components import canonical_docs

    docs = spark.createDataFrame(
        [(i, float(i % 7) / 7) for i in range(40)],
        "doc_id long, quality_score double",
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 38, 2)], "doc_a long, doc_b long"
    )
    plan = (
        canonical_docs(docs, pairs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
