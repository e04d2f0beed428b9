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


def word_suggestions_df(
    index: BM25Index,
    words: list[str],
    num_suggestions: int = 3,
    min_similarity: float = 80.0,
) -> DataFrame:
    """(word, suggested_word, similarity) for OOV words.

    Top-N vocabulary terms by ratio (no pre-filter), then validity:
    ratio >= 90 OR ratio >= min_similarity (the frequency rule is always
    true for OOV words — see module docstring).
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
