"""Composed curation cascade: filter-then-dedup semantics, canonical
selection, and parity of the shared expression builders with the
standalone operators they were refactored from."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.curation import curate_docs
from search_engine_spark.operators.text_quality import (
    lang_id,
    quality_features,
    token_counts,
)

EN = (
    "the quick brown fox jumps over the lazy dog and it is that good "
    "for all of us to see in the morning light with friends"
)
DE = (
    "der hund und die katze das ist nicht ein problem mit der welt "
    "von heute und morgen für alle"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, EN),            # passes all filters; dup of 3
        (1, DE),            # rejected: wrong language
        (2, EN + " extra words here to change the fingerprint slightly"),
        (3, EN),            # dup of 0 -> deduped (0 is canonical)
        (4, "x " * 200),    # rejected: token budget + quality
        (5, ""),            # rejected: empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_curate_filter_then_dedup(spark, docs):
    got = {r["doc_id"]: r for r in curate_docs(
        docs, lang="en", min_quality=0.2, min_tokens=5, max_tokens=100
    ).collect()}
    # 0 survives as canonical of {0, 3}; 2 survives alone
    assert set(got) == {0, 2}
    assert all(r["pred_lang"] == "en" for r in got.values())
    assert got[0]["fp"] == docs.selectExpr("md5(text)").collect()[3][0]


def test_curate_dup_of_rejected_does_not_survive(spark):
    # doc 10 fails the token floor; its duplicate 11 also fails -> neither
    # survives, and crucially the dup link cannot resurrect either
    rows = [(10, "the of and"), (11, "the of and"), (12, EN)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"] for r in curate_docs(
        df, lang="en", min_quality=0.0, min_tokens=5, max_tokens=100
    ).collect()}
    assert got == {12}


def test_curate_columns_match_standalone_operators(spark, docs):
    """The single-projection pipeline reuses the EXACT expressions of the
    standalone oracled operators: per-doc values must be identical."""
    cur = {r["doc_id"]: r for r in curate_docs(
        docs, lang="en", min_quality=0.2, min_tokens=5, max_tokens=100
    ).collect()}
    q = {r["doc_id"]: r["quality_score"] for r in quality_features(docs).collect()}
    l = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    t = {r["doc_id"]: r["n_bpe_tokens"] for r in token_counts(docs).collect()}
    for doc_id, r in cur.items():
        assert r["quality_score"] == q[doc_id]
        assert r["pred_lang"] == l[doc_id]
        assert r["n_bpe_tokens"] == t[doc_id]


def test_hash_split_deterministic_and_proportional(spark):
    from search_engine_spark.operators.curation import hash_split

    docs = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    assert a == b  # pure function of doc_id
    from collections import Counter

    frac = Counter(a.values())
    assert abs(frac["train"] / 2000 - 0.8) < 0.03
    assert abs(frac["val"] / 2000 - 0.1) < 0.02
    assert abs(frac["test"] / 2000 - 0.1) < 0.02


def test_hash_split_stable_under_corpus_growth(spark):
    # adding documents must never move an existing doc between splits
    from search_engine_spark.operators.curation import hash_split

    small = {r["doc_id"]: r["split"]
             for r in hash_split(spark.range(100).withColumnRenamed("id", "doc_id")).collect()}
    big = {r["doc_id"]: r["split"]
           for r in hash_split(spark.range(500).withColumnRenamed("id", "doc_id")).collect()}
    assert all(big[k] == v for k, v in small.items())


def test_hash_split_salt_gives_independent_assignment(spark):
    from search_engine_spark.operators.curation import hash_split

    docs = spark.range(500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, salt="v2").collect()}
    assert a != b  # different salt reshuffles membership
    # but the salted split is itself deterministic
    c = {r["doc_id"]: r["split"] for r in hash_split(docs, salt="v2").collect()}
    assert b == c


def test_hash_split_validates_names(spark):
    import pytest as _pytest

    from search_engine_spark.operators.curation import hash_split

    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    with _pytest.raises(ValueError):
        hash_split(docs, fractions=(0.5,), names=("a",))
    # fractions summing to >= 1.0 would render a 5-char '10000' boundary
    # that silently starves the last fraction (ADVICE r03)
    with _pytest.raises(ValueError):
        hash_split(docs, fractions=(0.8, 0.2), names=("train", "val", "test"))
    with _pytest.raises(ValueError):
        hash_split(docs, fractions=(0.7, 0.4), names=("train", "val", "test"))


def test_ngram_counts_matches_python(spark):
    from collections import Counter

    from search_engine_spark.config import load_stopwords
    from search_engine_spark.operators.text_quality import ngram_counts
    from search_engine_spark.oracle.pyref import oracle_tokenize_index

    rows = [
        (0, "alpha beta gamma alpha beta"),
        (1, "beta gamma delta!! beta gamma"),
        (2, "a of the"),  # all filtered -> no bigrams
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["ngram"], r["n_occurrences"]) for r in ngram_counts(df, 2, 50).collect()]

    stop = load_stopwords()
    exp = Counter()
    for _, text in rows:
        toks = oracle_tokenize_index(text, stop)
        for i in range(len(toks) - 1):
            exp[f"{toks[i]} {toks[i+1]}"] += 1
    expected = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert got == expected


def _py_repetition(text: str):
    """Pure-Python oracle for repetition_features on one document."""
    from collections import Counter

    lines = [ln.strip() for ln in text.split("\n")]
    lines = [ln for ln in lines if ln != ""]
    lc = Counter(lines)
    n_lines = len(lines)
    line_chars = sum(len(ln) for ln in lines)
    dup_lines = n_lines - len(lc)
    dup_line_chars = sum((c - 1) * len(ln) for ln, c in lc.items())
    toks = [t for t in text.lower().split() if t]
    grams = Counter(
        f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)
    )
    n_chars = len(text)
    top = max((c * len(g) for g, c in grams.items()), default=0)
    dupg = sum((c - 1) * len(g) for g, c in grams.items())
    r = lambda x: round(x, 6)
    return (
        n_lines,
        r(dup_lines / n_lines) if n_lines else 0.0,
        r(dup_line_chars / line_chars) if line_chars else 0.0,
        r(top / n_chars) if n_chars else 0.0,
        r(dupg / n_chars) if n_chars else 0.0,
    )


def test_repetition_features_matches_python(spark):
    from search_engine_spark.operators.text_quality import repetition_features

    rows = [
        (0, "hello world\nhello world\nunique line\n\n  hello world  "),
        (1, "a b a b a b"),
        (2, ""),
        (3, "one two three four"),
        (4, "spam spam spam spam spam spam spam spam"),
        (5, "x\ny\nx\ny\nx"),
        (6, "   \n\n  "),  # whitespace-only lines all drop
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_lines"],
            r["dup_line_frac"],
            r["dup_line_char_frac"],
            r["top_bigram_char_frac"],
            r["dup_bigram_char_frac"],
        )
        for r in repetition_features(df).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _py_repetition(text), (doc_id, text)


def test_repetition_features_flags_boilerplate(spark):
    # a boilerplate-heavy doc must score far above organic text on every signal
    from search_engine_spark.operators.text_quality import repetition_features

    organic = "the quick brown fox jumps over the lazy dog near the river bank"
    spammy = "\n".join(["click here to win a prize now"] * 9 + ["real content once"])
    df = spark.createDataFrame(
        [(0, organic), (1, spammy)], "doc_id long, text string"
    )
    r = {x["doc_id"]: x for x in repetition_features(df).collect()}
    assert r[1]["dup_line_frac"] > 0.7 > r[0]["dup_line_frac"]
    assert r[1]["dup_line_char_frac"] > 0.7 > r[0]["dup_line_char_frac"]
    assert r[1]["dup_bigram_char_frac"] > 0.5 > r[0]["dup_bigram_char_frac"]


def test_scrub_pii_redacts_and_counts(spark):
    from search_engine_spark.operators.curation import scrub_pii

    rows = [
        (0, "mail john.doe+spam@example.co.uk or visit 192.168.1.1 now"),
        (1, "call +14155551234 or +44-20-7946-0958 today"),
        (2, "no pii here"),
        (3, "a@b.io and c@d.org; servers 10.0.0.255, 8.8.8.8"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert got[0]["clean_text"] == "mail <EMAIL> or visit <IP> now"
    assert (got[0]["n_emails"], got[0]["n_ipv4"], got[0]["n_phones"]) == (1, 1, 0)
    assert got[1]["clean_text"] == "call <PHONE> or <PHONE> today"
    assert got[1]["n_phones"] == 2
    assert got[2]["clean_text"] == "no pii here"
    assert (got[2]["n_emails"], got[2]["n_ipv4"], got[2]["n_phones"]) == (0, 0, 0)
    assert got[3]["clean_text"] == "<EMAIL> and <EMAIL>; servers <IP>, <IP>"
    assert (got[3]["n_emails"], got[3]["n_ipv4"]) == (2, 2)
    assert got[4]["clean_text"] == ""


def test_scrub_pii_email_local_digits_not_rematched(spark):
    # the email is scrubbed FIRST, so digits inside it never count as
    # IPs/phones; counts run on the text state their replacement sees
    from search_engine_spark.operators.curation import scrub_pii

    df = spark.createDataFrame(
        [(0, "reach 1.2.3.4.5.6.7.8@mail.com at +12223334444")],
        "doc_id long, text string",
    )
    r = scrub_pii(df).collect()[0]
    assert r["clean_text"] == "reach <EMAIL> at <PHONE>"
    assert (r["n_emails"], r["n_ipv4"], r["n_phones"]) == (1, 0, 1)


def test_contamination_matches_python(spark):
    from search_engine_spark.operators.curation import contamination

    docs_rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "quick brown fox is a benchmark phrase somewhere"),
        (2, "totally unrelated content with zero overlap"),
        (3, "the quick brown fox jumps again and again"),
        (4, "short"),
    ]
    bench_rows = [(100, "a quick brown fox jumps test item")]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in contamination(docs, bench, n=3).collect()}

    def grams(text, n=3):
        toks = [t for t in text.lower().split() if t]
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bench_g = set().union(*(grams(t) for _, t in bench_rows))
    for doc_id, text in docs_rows:
        expect = len(grams(text) & bench_g)
        assert got[doc_id]["n_contaminated_ngrams"] == expect, (doc_id, text)
        assert got[doc_id]["contaminated"] == (1 if expect else 0)
    assert len(got) == len(docs_rows)  # zero-overlap docs still present


def test_contamination_broadcasts_benchmark(spark):
    # the benchmark gram set must broadcast: no shuffle of the corpus grams
    from search_engine_spark.operators.curation import contamination

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(50)],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id % 10 = 0")
    plan = (
        contamination(docs, bench, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_stratified_sample_rates_and_nesting(spark):
    from search_engine_spark.operators.curation import stratified_sample

    rows = [(i, "s%d" % (i % 4)) for i in range(4000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    kept = stratified_sample(
        docs, rates={"s0": 1.0, "s1": 0.5, "s2": 0.0}, default_rate=0.25
    ).collect()
    by = {}
    for r in kept:
        by.setdefault(r["stratum"], set()).add(r["doc_id"])
    assert len(by.get("s0", ())) == 1000  # rate 1.0 keeps the whole stratum
    assert "s2" not in by  # rate 0.0 drops it entirely
    assert abs(len(by["s1"]) / 1000 - 0.5) < 0.06
    assert abs(len(by["s3"]) / 1000 - 0.25) < 0.06

    # nested-sample property: the 0.25 sample of a stratum is an exact
    # subset of its 0.5 sample (same hash space, lower boundary)
    k25 = {
        r["doc_id"]
        for r in stratified_sample(docs, rates={"s1": 0.25}, default_rate=0.0).collect()
    }
    assert k25 <= by["s1"]
    assert len(k25) < len(by["s1"])


def test_stratified_sample_deterministic_and_salted(spark):
    from search_engine_spark.operators.curation import stratified_sample

    docs = spark.createDataFrame(
        [(i, "x") for i in range(500)], "doc_id long, source string"
    )
    a = {r["doc_id"] for r in stratified_sample(docs, {}, default_rate=0.3).collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, {}, default_rate=0.3).collect()}
    assert a == b
    c = {
        r["doc_id"]
        for r in stratified_sample(docs, {}, default_rate=0.3, salt="v2").collect()
    }
    assert a != c  # independent sample under a different salt
