"""Extractive summarization (A15/W3): TF-IDF sentence similarity row-sums,
top-N sentences re-ordered by document position.

Reference (service/text_summarizer.py):
- sentence split: protect Mr./Dr./Mrs./Ms. abbreviations, split on
  ``[.!?]+\\s+(?=[A-Z])``, strip empties (:21-36)
- preprocess: lower, strip ``[^\\w\\s.]``, collapse whitespace, drop
  stopwords (:38-54)
- TF-IDF (sklearn TfidfVectorizer semantics: token pattern
  ``(?u)\\b\\w\\w+\\b``, smooth idf ln((1+n)/(1+df))+1, l2-normalized
  rows, max_features by term frequency), similarity = M @ M.T, sentence
  score = row sum normalized by max (:56-77)
- selection: sort (score, index, sentence) tuples DESCENDING — note the
  reference's tuple sort breaks score ties by LARGER index first — take N,
  re-sort by position, join with spaces (:113-127); documents with <= N
  sentences are returned verbatim (:100-101)

sklearn is not installed here; the vectorizer semantics above are
re-implemented in numpy (verified against the published TfidfVectorizer
formulae). Execution: summarization is per-document work (a doc's sentence
matrix fits in memory), so the Spark operator is an Arrow-batched
mapInPandas over documents — embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import re

import numpy as np

from search_engine_spark.config import DEFAULT_CONFIG, EngineConfig

_ABBREVS = ("Mr", "Dr", "Mrs", "Ms")
_SENT_SPLIT = re.compile(r"[.!?]+\s+(?=[A-Z])")
_TOKEN = re.compile(r"(?u)\b\w\w+\b")
_NONWORD = re.compile(r"[^\w\s.]")


def split_sentences(text: str) -> list[str]:
    for a in _ABBREVS:
        text = re.sub(rf"(?<={a})\.", "@@@", text)
    parts = _SENT_SPLIT.split(text)
    parts = [s.replace("@@@", ".") for s in parts]
    return [s.strip() for s in parts if s.strip()]


def _preprocess(text: str, stopwords: frozenset[str]) -> str:
    text = _NONWORD.sub("", text.lower())
    words = [w for w in text.split() if w not in stopwords]
    return " ".join(words)


def _tfidf_rows(docs: list[str], max_features: int = 5000) -> np.ndarray:
    """l2-normalized TF-IDF matrix with sklearn TfidfVectorizer semantics."""
    tokenized = [_TOKEN.findall(d.lower()) for d in docs]
    from collections import Counter

    df_counts: Counter[str] = Counter()
    tf_total: Counter[str] = Counter()
    for toks in tokenized:
        tf_total.update(toks)
        df_counts.update(set(toks))
    vocab_terms = sorted(tf_total, key=lambda t: (-tf_total[t], t))[:max_features]
    vocab = {t: i for i, t in enumerate(sorted(vocab_terms))}
    n = len(docs)
    m = np.zeros((n, len(vocab)))
    for i, toks in enumerate(tokenized):
        c = Counter(t for t in toks if t in vocab)
        for t, tf in c.items():
            m[i, vocab[t]] = tf
    idf = np.array(
        [np.log((1 + n) / (1 + df_counts[t])) + 1 for t in sorted(vocab, key=vocab.get)]
    )
    m = m * idf
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def summarize_py(
    text: str,
    num_sentences: int = 3,
    stopwords: frozenset[str] | None = None,
    max_sentences: int = 10000,
) -> str:
    """Single-document summary, reference-faithful incl. tie order."""
    stop = stopwords if stopwords is not None else DEFAULT_CONFIG.stopwords
    sentences = split_sentences(text)
    if len(sentences) <= num_sentences:
        return text
    if len(sentences) > max_sentences:
        intro = max_sentences // 4
        concl = max_sentences // 4
        mid = max_sentences - intro - concl
        half = len(sentences) // 2
        sentences = (
            sentences[:intro]
            + sentences[half - mid // 2 : half + mid // 2]
            + sentences[-concl:]
        )
    m = _tfidf_rows([_preprocess(s, stop) for s in sentences])
    sim = m @ m.T
    scores = sim.sum(axis=1)
    mx = scores.max() if scores.size else 1.0
    if mx != 0:
        scores = scores / mx
    ranked = sorted(
        [(float(s), i, sent) for i, (s, sent) in enumerate(zip(scores, sentences))],
        reverse=True,
    )
    selected = sorted(ranked[:num_sentences], key=lambda x: x[1])
    return " ".join(sent for _, _, sent in selected)


def summarize_docs(
    docs,
    num_sentences: int = 3,
    cfg: EngineConfig = DEFAULT_CONFIG,
    doc_col: str = "doc_id",
    text_col: str = "text",
):
    """(doc_id, summary) — Arrow-batched per-document summarization."""
    stop = cfg.stopwords
    out_schema = f"doc_id {docs.schema[doc_col].dataType.simpleString()}, summary string"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[doc_col],
                    "summary": [
                        summarize_py(t or "", num_sentences, stop)
                        for t in pdf[text_col]
                    ],
                }
            )

    return docs.select(doc_col, text_col).mapInPandas(run, out_schema)
