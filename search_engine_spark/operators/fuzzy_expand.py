"""Fuzzy query expansion (A7/W2) + word suggestions (A8).

Reference semantics:
- ``_get_fuzzy_matches`` (service/text_search.py:61-86): scan the whole
  vocabulary, skip exact match and terms shorter than 3 chars, keep Indel
  ratio >= threshold (default 80), top 3 by similarity.
- ``get_word_suggestions`` (service/text_search.py:254-293): only for OOV
  words of length >= 3; top 3 vocabulary terms by ratio (NO length/threshold
  pre-filter), valid iff ratio >= 90 OR (ratio >= 80 AND likely
  misspelling). For an OOV word, ``_is_likely_misspelling``
  (:295-326) is ALWAYS true via the frequency rule (suggestion_freq > 0 and
  original_freq == 0 — any vocabulary term appears in >= 1 doc), so
  validity reduces to ratio >= min_similarity; the typo-pattern heuristics
  (:328-387) can never change the outcome on this path.

Spark shape: the tiny query-term relation is broadcast against the
DISTRIBUTED vocabulary (term_stats) — a map-side crossJoin; similarity is
the Arrow-vectorized Indel UDF; per-term top-3 is a window over qterm
(row_number, sim desc / term asc deterministic tie policy — the reference
iterates a Python set, SURVEY.md §2.5 W2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from search_engine_spark.functions.fuzzy import indel_ratio_udf
from search_engine_spark.operators.corpus_stats import BM25Index


def fuzzy_matches_df(
    vocab: DataFrame,
    qterms: list[str],
    threshold: float = 80.0,
    max_matches: int = 3,
    min_vocab_len: int = 3,
) -> DataFrame:
    """(qterm, term, sim): top fuzzy matches per query term."""
    spark = vocab.sparkSession
    q = spark.createDataFrame([(t,) for t in sorted(set(qterms))], "qterm string")
    scored = (
        vocab.filter(F.length("term") >= min_vocab_len)
        .crossJoin(F.broadcast(q))
        .filter(F.col("term") != F.col("qterm"))
        .withColumn("sim", indel_ratio_udf(F.lower("qterm"), F.lower("term")))
        .filter(F.col("sim") >= threshold)
    )
    w = Window.partitionBy("qterm").orderBy(F.col("sim").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_matches)
        .select("qterm", "term", "sim")
    )


def expand_query_tokens(index: BM25Index, tokens: list[str]) -> list[str]:
    """Reference query expansion: each token followed by its fuzzy matches
    (service/text_search.py:142-152). Preserves token multiplicity."""
    cfg = index.cfg
    uniq = sorted(set(tokens))
    if not uniq:
        return []
    matches = fuzzy_matches_df(
        index.vocabulary(), uniq, cfg.fuzzy_threshold, cfg.fuzzy_max_matches, cfg.min_fuzzy_term_len
    ).collect()
    per_term: dict[str, list[tuple[float, str]]] = {}
    for r in matches:
        per_term.setdefault(r["qterm"], []).append((-r["sim"], r["term"]))
    out: list[str] = []
    for t in tokens:
        out.append(t)
        out.extend(term for _, term in sorted(per_term.get(t, [])))
    return out


def has_common_typo_pattern(original: str, suggestion: str) -> bool:
    """A8 typo-pattern heuristic, reference-faithful INCLUDING its quirks
    (service/text_search.py:327-387, re-derived from observed behavior):

    - the "repeated letters" check tests whether the literal regex SOURCE
      string appears in the word — never true for real words (kept as-is);
    - the "missing letter" check builds the shared-character subsequences
      and substring-tests them against the words — vacuously TRUE when the
      words share no characters (empty string is a substring of anything);
    - positional transposition and leet-substitution (0->o, 1->l, 5->s,
      $->s, 4->a, 3->e, 7->t) checks.

    These quirks cannot change any reachable ``get_word_suggestions``
    outcome (the frequency rule decides first for OOV words — module
    docstring), but the public predicate matches the reference exactly.
    """
    if len(original) < 3:
        return False
    original = original.lower()
    suggestion = suggestion.lower()

    if r"(.)\1{2,}" in original and r"\1\1" in suggestion:
        return True  # the reference's literal-regex-source quirk
    shared_o = "".join(c for c in original if c in suggestion)
    shared_s = "".join(c for c in suggestion if c in original)
    if shared_o in original and shared_s in suggestion:
        return True

    for i in range(len(original) - 1):
        if i < len(suggestion) - 1:
            op, sp = original[i : i + 2], suggestion[i : i + 2]
            if op != sp and sorted(op) == sorted(sp):
                return True

    subs = {"0": "o", "1": "l", "5": "s", "$": "s", "4": "a", "3": "e", "7": "t"}
    for i, ch in enumerate(original):
        if i < len(suggestion):
            if ch in subs and suggestion[i] == subs[ch]:
                return True
            if suggestion[i] in subs and ch == subs[suggestion[i]]:
                return True
    return False


def likely_misspelling_from_stats(
    original_in_vocab: bool,
    typo_pattern: bool,
    original_freq: int,
    suggestion_freq: int,
) -> bool:
    """The pure decision core of ``_is_likely_misspelling``
    (service/text_search.py:295-326): in-vocab originals are never
    misspellings; then typo pattern; then the document-frequency rules
    (suggestion seen while original unseen, or suggestion >10x more
    frequent)."""
    if original_in_vocab:
        return False
    if typo_pattern:
        return True
    if suggestion_freq > 0 and original_freq == 0:
        return True
    return suggestion_freq > original_freq * 10


def term_dfs(index: BM25Index, words: list[str]) -> dict[str, int]:
    """Document frequency for a handful of words via ONE broadcast join
    against term_stats (the reference scans every tokenized doc per word,
    text_search.py:315-316 — at corpus scale that is two full passes; the
    stats table lookup is the same number exactly, since postings are
    distinct per (doc, term))."""
    if not words:
        return {}
    spark = index.postings.sparkSession
    q = spark.createDataFrame([(w,) for w in sorted(set(words))], "term string")
    rows = index.term_stats.join(F.broadcast(q), "term").select("term", "df").collect()
    out = {w: 0 for w in words}
    out.update({r["term"]: int(r["df"]) for r in rows})
    return out


def is_likely_misspelling(index: BM25Index, original: str, suggestion: str) -> bool:
    """Reference ``_is_likely_misspelling`` over the stats tables."""
    dfs = term_dfs(index, [original, suggestion])
    return likely_misspelling_from_stats(
        original_in_vocab=dfs.get(original, 0) > 0,
        typo_pattern=has_common_typo_pattern(original, suggestion),
        original_freq=dfs.get(original, 0),
        suggestion_freq=dfs.get(suggestion, 0),
    )


def word_suggestions_df(
    index: BM25Index,
    words: list[str],
    num_suggestions: int = 3,
    min_similarity: float = 80.0,
) -> DataFrame:
    """(word, suggested_word, similarity) for OOV words.

    Top-N vocabulary terms by ratio (no pre-filter), then validity:
    ratio >= 90 OR (ratio >= min_similarity AND likely-misspelling). The
    misspelling predicate is computed relationally: every candidate's df
    comes from the term_stats broadcast join already in the plan, and the
    caller passes OOV words (original_freq = 0), so the frequency rule
    reduces to suggestion_df > 0 — true for every vocabulary term. The
    full predicate incl. typo patterns is exposed as
    ``is_likely_misspelling`` for direct (reference-public-API) use.
    """
    spark = index.postings.sparkSession
    q = spark.createDataFrame([(w,) for w in sorted(set(words))], "word string")
    scored = (
        index.vocabulary()
        .crossJoin(F.broadcast(q))
        .withColumn("similarity", indel_ratio_udf(F.lower("word"), F.lower("term")))
    )
    w = Window.partitionBy("word").orderBy(F.col("similarity").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= num_suggestions)
        .filter(
            (F.col("similarity") >= 90.0) | (F.col("similarity") >= min_similarity)
        )
        .select(F.col("word"), F.col("term").alias("suggested_word"), "similarity")
    )
