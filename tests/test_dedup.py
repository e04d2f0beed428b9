"""MinHash dedup: the xxhash64 scale path (the md5 path is oracled by the
driver's DuckDB contract, plans/driver_queries.py minhash_*)."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.dedup import minhash_dup_pairs, minhash_signatures


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "the quick brown fox jumps over the lazy dog tonight"),   # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat tonight"),   # near dup
        (3, "completely different content about spark shuffle joins"),
        (4, "completely different content about spark shuffle joins"),  # exact dup of 3
        (5, "unrelated gardening tulips roses compost soil text"),
    ]
    return spark.createDataFrame(base, "doc_id long, text string").cache()


def test_xxhash64_signatures_shape(dup_docs):
    sig = minhash_signatures(dup_docs, num_hashes=8, hash_fn="xxhash64")
    assert dict(sig.dtypes)["minhash"] == "bigint"
    assert sig.count() == 6 * 8
    # equal token sets => equal signatures
    rows = {(r["doc_id"], r["h"]): r["minhash"] for r in sig.collect()}
    for h in range(8):
        assert rows[(0, h)] == rows[(1, h)]
        assert rows[(3, h)] == rows[(4, h)]


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
def test_dup_pairs_find_exact_dups(dup_docs, hash_fn):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_dup_pairs(dup_docs, threshold=0.5, hash_fn=hash_fn).collect()
    }
    # exact duplicates are guaranteed hits with jaccard 1.0 on either path
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert pairs[(3, 4)] == pytest.approx(1.0)
    # every returned pair is exact-verified above the threshold
    assert all(j >= 0.5 for j in pairs.values())
    # the unrelated doc never pairs with the fox docs
    assert not any(5 in p for p in pairs)


def test_bad_hash_fn_rejected(dup_docs):
    with pytest.raises(ValueError):
        minhash_signatures(dup_docs, hash_fn="sha9000")
