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


def test_unpersist_dedup_caches(dup_docs):
    """ADVICE r02: pipeline caches are tracked and releasable — a
    long-lived session can reclaim the persisted band-key/term relations."""
    from search_engine_spark.operators.dedup import (
        _LIVE_CACHES,
        unpersist_dedup_caches,
    )

    unpersist_dedup_caches()  # clean slate
    out = minhash_dup_pairs(dup_docs, threshold=0.5)
    n_rows = out.count()
    assert n_rows >= 2
    assert len(_LIVE_CACHES) >= 2  # terms + band_keys registered
    assert any(df.storageLevel.useMemory for df in _LIVE_CACHES)
    released = unpersist_dedup_caches()
    assert released >= 2
    assert _LIVE_CACHES == []
    # result is still recomputable after the release (lazy plans survive)
    assert out.count() == n_rows


def test_shingle_terms_order_sensitivity(spark):
    """Same vocabulary, different word order -> disjoint trigram shingles."""
    from search_engine_spark.operators.dedup import shingle_terms

    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),
            (1, "epsilon delta gamma beta alpha"),  # reversed order
            (2, "alpha beta gamma delta epsilon"),  # identical to 0
        ],
        "doc_id long, text string",
    )
    sh = {(r["doc_id"], r["term"]) for r in shingle_terms(df, n=3).collect()}
    s0 = {t for d, t in sh if d == 0}
    s1 = {t for d, t in sh if d == 1}
    s2 = {t for d, t in sh if d == 2}
    assert s0 == {"alpha beta gamma", "beta gamma delta", "gamma delta epsilon"}
    assert s0 == s2
    assert not (s0 & s1)  # order flip shares no trigram
    # short docs (< n tokens) produce no shingles
    short = spark.createDataFrame([(9, "alpha beta")], "doc_id long, text string")
    assert shingle_terms(short, n=3).count() == 0


def test_shingle_dup_pairs_exact_dups(dup_docs):
    from search_engine_spark.operators.dedup import shingle_dup_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in shingle_dup_pairs(dup_docs, n=3, threshold=0.5).collect()
    }
    import pytest as _pt

    assert pairs[(0, 1)] == _pt.approx(1.0)
    assert pairs[(3, 4)] == _pt.approx(1.0)
    # the near-dup pair (0,2) differs by one word -> shares SOME but not
    # all shingles; whatever is returned must be exact-verified >= 0.5
    assert all(j >= 0.5 for j in pairs.values())
    assert not any(5 in p for p in pairs)


def test_token_counts_bpe_regex(spark):
    """BPE-ish counts: contractions split, letter/digit/punct runs, and
    cross-engine agreement is driver-oracled (token_counts entry)."""
    from search_engine_spark.operators.text_quality import token_counts

    df = spark.createDataFrame(
        [
            (0, "I'll go"),            # I | 'll | _go            -> 3
            (1, "abc123 x-y"),         # abc | 123 | _x | - | y   -> 5
            (2, ""),                   # empty                     -> 0
            (3, "one two  three"),     # one | _two | ws-run | three -> 4
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"]) for r in token_counts(df).collect()}
    assert got[0] == (2, 3)
    assert got[1] == (2, 5)
    assert got[2] == (0, 0)
    assert got[3] == (3, 4)
    assert got[0][1] >= got[0][0]  # BPE-ish never coarser than whitespace


def test_max_bucket_size_drops_mega_buckets(spark):
    """Web-scale guard: a bucket of m docs emits m^2 candidates inside ONE
    join key (an unsplittable straggler task). With the cap, mega-bucket
    members stop pairing through that bucket, while near-dups living in
    small buckets are untouched. Identical docs collapse ALL their buckets
    together, so they model the boilerplate pathology exactly — and they
    are the exact-dedup family's job upstream, not LSH's."""
    boiler = "cookie consent banner accept all manage preferences privacy"
    rows = [(i, boiler) for i in range(100, 112)]  # 12 identical docs
    rows += [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "the quick brown fox jumps over the lazy cat tonight"),  # near dup of 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").cache()

    full = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dup_pairs(docs, threshold=0.5).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dup_pairs(docs, threshold=0.5, max_bucket_size=10).collect()
    }
    mega = {(a, b) for a in range(100, 112) for b in range(a + 1, 112)}
    assert mega <= full          # uncapped finds the whole clique (66 pairs)
    assert (0, 1) in full
    assert capped & mega == set()  # all mega-bucket pairs suppressed
    assert (0, 1) in capped        # small-bucket near-dup survives
    assert capped <= full          # cap only ever removes pairs
    docs.unpersist()
