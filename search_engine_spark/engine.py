"""SearchEngine facade — the reference's full query lifecycle (§3.2) over
either the logical (DataFrame) index or the materialized compressed index.

Flow (reference service/text_search.py:389-477):
  search_with_suggestions(query):
    1. strip [,?!.] from the raw query (:403)
    2. suggest_and_search: tokenize; for each OOV token of len > 2, compute
       word suggestions; run search(query) with fuzzy expansion ON
    3. if any token has a valid suggestion, substitute each such token with
       its TOP suggestion and re-run search on the corrected query; return
       those results instead

The query-side stopword filter is a no-op (quirk F5) — kept as such.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from search_engine_spark.functions.tokenize import query_tokens_py
from search_engine_spark.index.query import CompressedIndex
from search_engine_spark.operators.corpus_stats import BM25Index
from search_engine_spark.operators.fuzzy_expand import (
    expand_query_tokens,
    fuzzy_matches_df,
    word_suggestions_df,
)
from search_engine_spark.operators.scoring import search_topk

_PUNCT_CLEAN = re.compile(r"[,?!.]")


@dataclass
class SearchEngine:
    index: BM25Index
    compressed: CompressedIndex | None = None
    use_wand: bool = False
    _vocab_cache: set[str] | None = field(default=None, repr=False)

    def _search_tokens(self, tokens: list[str], top_k=None, min_score=None) -> DataFrame:
        if self.compressed is not None:
            return self.compressed.search_topk(
                tokens, top_k=top_k, min_score=min_score, use_wand=self.use_wand
            )
        return search_topk(self.index, tokens, top_k=top_k, min_score=min_score)

    def _in_vocab(self, terms: list[str]) -> set[str]:
        """Vocabulary membership for a handful of query terms.

        Broadcast-join the tiny term set against the distributed vocabulary
        (never collect the vocabulary itself — it is |V|-sized).
        """
        from pyspark.sql import functions as F

        if not terms:
            return set()
        spark = self.index.postings.sparkSession
        q = spark.createDataFrame([(t,) for t in sorted(set(terms))], "term string")
        hit = self.index.vocabulary().join(F.broadcast(q), "term").collect()
        return {r["term"] for r in hit}

    def search(self, query: str, use_fuzzy: bool = True, top_k=None, min_score=None) -> DataFrame:
        """BM25 top-k with optional fuzzy expansion — reference ``search``."""
        tokens = query_tokens_py(query)
        if use_fuzzy:
            tokens = expand_query_tokens(self.index, tokens)
        return self._search_tokens(tokens, top_k=top_k, min_score=min_score)

    def word_suggestions(self, word: str) -> list[tuple[str, float]]:
        """Valid suggestions for one word — reference get_word_suggestions."""
        if len(word) < 3 or word in self._in_vocab([word]):
            return []
        rows = word_suggestions_df(self.index, [word]).collect()
        return sorted(((r["suggested_word"], r["similarity"]) for r in rows), key=lambda x: (-x[1], x[0]))

    def search_with_suggestions(self, query: str, min_score: float | None = None) -> dict:
        clean = _PUNCT_CLEAN.sub(" ", query).strip()
        tokens = query_tokens_py(clean)
        vocab_hits = self._in_vocab(tokens)
        oov = [t for t in dict.fromkeys(tokens) if t not in vocab_hits and len(t) > 2]
        suggestions: dict[str, list[tuple[str, float]]] = {}
        if oov:
            rows = word_suggestions_df(self.index, oov).collect()
            for r in rows:
                suggestions.setdefault(r["word"], []).append((r["suggested_word"], r["similarity"]))
            for w in suggestions:
                suggestions[w].sort(key=lambda x: (-x[1], x[0]))
        results = self.search(clean, use_fuzzy=True, min_score=min_score)

        replacements = {w: s[0][0] for w, s in suggestions.items() if s}
        suggested_query = None
        if replacements:
            suggested_tokens = [replacements.get(t, t) for t in tokens]
            cand = " ".join(suggested_tokens)
            if cand != clean:
                suggested_query = cand
                results = self.search(cand, use_fuzzy=True, min_score=min_score)
        return {
            "original_query": query,
            "suggested_query": suggested_query,
            "suggestions": suggestions,
            "used_suggestion": suggested_query is not None,
            "results": results,
        }
