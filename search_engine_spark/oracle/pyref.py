"""Vendored pure-Python oracle for the reference engine's semantics.

Re-derives (from observed behavior, written fresh — functional style, no
shared code) the computations of:

- index-side tokenizer: reference service/build_text_index.py:106-111
  (lower -> strip punctuation -> split -> drop stopwords and len<=1 tokens)
- query-side tokenizer: reference service/text_search.py:110-123
  (lower -> strip punctuation -> split, keep everything non-empty)
- weighted Okapi BM25 with epsilon IDF floor:
  reference utils/bm250kapi_weighted.py:35-71 + the rank-bm25 0.2.2
  ``_initialize`` statistics (doc_freqs / doc_len / avgdl / corpus_size)
- dense scoring + top-k slice + strict min_score filter:
  reference service/text_search.py:156-219
- fuzzy expansion via RapidFuzz ``fuzz.ratio`` (normalized Indel
  similarity), threshold 80, top 3, vocabulary terms of len>=3:
  reference service/text_search.py:61-86,125-154
- weighted PageRank with count-based out-degree normalization:
  reference service/scrape_web.py:939-978
- document rank score: reference service/build_text_index.py:143-177

Tie policy: the reference's top-k order under score ties depends on numpy's
unstable argsort; per SURVEY.md §5 we assert rank-identity under the
documented deterministic policy (score desc, url asc) applied to BOTH sides,
and score-identity to 1e-9 unconditionally.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from search_engine_spark.config import snap_zero

_PUNCT_RE = re.compile(r"[^\w\s]")


def oracle_tokenize_index(text: str, stopwords: frozenset[str]) -> list[str]:
    """Index-side tokenizer (drops stopwords and tokens of length <= 1)."""
    cleaned = _PUNCT_RE.sub(" ", text.lower())
    return [t for t in cleaned.split() if len(t) > 1 and t not in stopwords]


def oracle_tokenize_query(text: str) -> list[str]:
    """Query-side tokenizer (keeps everything non-empty, incl. stopwords)."""
    cleaned = _PUNCT_RE.sub(" ", text.lower())
    return [t for t in cleaned.split() if t]


def indel_ratio(a: str, b: str) -> float:
    """Normalized Indel similarity * 100 == RapidFuzz ``fuzz.ratio``.

    ratio = 100 * 2*LCS(a,b) / (len(a)+len(b)); Indel distance counts
    insertions+deletions only (no substitutions).
    """
    la, lb = len(a), len(b)
    if la + lb == 0:
        return 100.0
    if la == 0 or lb == 0:
        return 0.0
    # O(la*lb) LCS length, two-row DP
    prev = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur = [0] * (lb + 1)
        ca = a[i - 1]
        for j in range(1, lb + 1):
            if ca == b[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = cur[j - 1] if cur[j - 1] >= prev[j] else prev[j]
        prev = cur
    return 200.0 * prev[lb] / (la + lb)


@dataclass
class OracleIndex:
    urls: list[str]
    doc_freqs: list[dict[str, int]]
    doc_len: list[int]
    doc_weights: list[float]
    idf: dict[str, float] = field(default_factory=dict)
    avgdl: float = 0.0
    corpus_size: int = 0
    average_idf: float = 0.0
    k1: float = 1.5
    b: float = 0.75
    epsilon: float = 0.25
    vocabulary: frozenset[str] = frozenset()


def build_oracle_index(
    docs: list[tuple[str, str]],
    stopwords: frozenset[str],
    doc_weights: list[float] | None = None,
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = 0.25,
) -> OracleIndex:
    """docs: list of (url, text). Empty-text docs must be pre-filtered by the
    caller (reference drops them at load, service/build_text_index.py:302)."""
    urls = [u for u, _ in docs]
    tokenized = [oracle_tokenize_index(t, stopwords) for _, t in docs]
    doc_freqs: list[dict[str, int]] = []
    nd: dict[str, int] = {}
    doc_len: list[int] = []
    for toks in tokenized:
        freqs: dict[str, int] = {}
        for t in toks:
            freqs[t] = freqs.get(t, 0) + 1
        doc_freqs.append(freqs)
        doc_len.append(len(toks))
        for t in freqs:
            nd[t] = nd.get(t, 0) + 1
    n = len(docs)
    avgdl = (sum(doc_len) / n) if n else 0.0
    # epsilon-floored IDF; the average includes negative raw idfs and divides
    # by |V| (reference utils/bm250kapi_weighted.py:35-54)
    idf: dict[str, float] = {}
    total = 0.0
    negative: list[str] = []
    for term, df in nd.items():
        v = math.log(n - df + 0.5) - math.log(df + 0.5)
        idf[term] = v
        total += v
        if v < 0:
            negative.append(term)
    # snap_zero deadband (config.AVERAGE_IDF_ZERO_TOL): when raw idfs cancel,
    # the residue's sign depends on loop order vs Spark's partial-agg order;
    # both engines snap to exactly 0.0 so the floor cannot amplify float
    # noise into a rank flip (round-4 property-suite finding)
    average_idf = snap_zero(total / len(idf)) if idf else 0.0
    floor = epsilon * average_idf
    for term in negative:
        idf[term] = floor
    weights = doc_weights if doc_weights is not None else [1.0] * n
    vocab = frozenset(nd)
    return OracleIndex(
        urls=urls, doc_freqs=doc_freqs, doc_len=doc_len, doc_weights=list(weights),
        idf=idf, avgdl=avgdl, corpus_size=n, average_idf=average_idf,
        k1=k1, b=b, epsilon=epsilon, vocabulary=vocab,
    )


def oracle_scores(index: OracleIndex, query_tokens: list[str]) -> list[float]:
    """Dense per-document weighted BM25 scores, summing over query tokens
    WITH multiplicity (a repeated token contributes twice)."""
    k1, b, avgdl = index.k1, index.b, index.avgdl
    out = [0.0] * index.corpus_size
    for q in query_tokens:
        w = index.idf.get(q) or 0.0
        if w == 0.0:
            # the reference still iterates, adding idf*...=0; skipping is
            # numerically identical
            continue
        for i in range(index.corpus_size):
            tf = index.doc_freqs[i].get(q) or 0
            denom = tf + k1 * (1 - b + b * index.doc_len[i] / avgdl)
            out[i] += w * (tf * (k1 + 1) / denom)
    return [s * wt for s, wt in zip(out, index.doc_weights)]


def oracle_fuzzy_matches(
    index: OracleIndex, term: str, threshold: float = 80.0, max_matches: int = 3,
) -> list[tuple[str, float]]:
    """Vocabulary fuzzy matches: skip exact and len<3 terms, Indel ratio >=
    threshold, top max_matches by (sim desc, term asc) — deterministic
    version of reference service/text_search.py:61-86."""
    cand = []
    for w in index.vocabulary:
        if w == term or len(w) < 3:
            continue
        sim = indel_ratio(term.lower(), w.lower())
        if sim >= threshold:
            cand.append((w, sim))
    cand.sort(key=lambda x: (-x[1], x[0]))
    return cand[:max_matches]


def oracle_expand_query(
    index: OracleIndex, query: str, threshold: float = 80.0, max_matches: int = 3,
) -> list[str]:
    """Query preprocessing with fuzzy expansion ON. The stopword filter is a
    no-op (reference quirk F5) so every token survives."""
    tokens = oracle_tokenize_query(query)
    out: list[str] = []
    for t in tokens:
        out.append(t)
        out.extend(w for w, _ in oracle_fuzzy_matches(index, t, threshold, max_matches))
    return out


def oracle_search(
    index: OracleIndex,
    query: str,
    top_k: int = 5,
    min_score: float = -30.0,
    use_fuzzy: bool = True,
) -> list[tuple[str, float]]:
    """Returns [(url, score)] ranked by (score desc, url asc), top_k rows,
    then strict score > min_score filter — reference
    service/text_search.py:156-219 under the deterministic tie policy."""
    tokens = (
        oracle_expand_query(index, query)
        if use_fuzzy
        else oracle_tokenize_query(query)
    )
    if not tokens:
        return []
    scores = oracle_scores(index, tokens)
    ranked = sorted(zip(index.urls, scores), key=lambda x: (-x[1], x[0]))
    return [(u, s) for u, s in ranked[:top_k] if s > min_score]


def oracle_word_suggestions(
    index: OracleIndex,
    word: str,
    num_suggestions: int = 3,
    min_similarity: float = 80.0,
    min_word_length: int = 3,
) -> list[tuple[str, float]]:
    """Reference get_word_suggestions (service/text_search.py:254-293):
    top-N vocabulary terms by Indel ratio (no length/threshold pre-filter),
    valid iff ratio >= 90 OR (ratio >= min_similarity AND likely
    misspelling). For OOV words the frequency rule of
    _is_likely_misspelling (:315-323) is always true (any vocab term has
    df >= 1, the OOV word has df 0), so validity == ratio >= min_similarity.
    Deterministic tie policy (sim desc, term asc)."""
    if len(word) < min_word_length or word in index.vocabulary:
        return []
    cand = [(w, indel_ratio(word, w)) for w in index.vocabulary]
    cand.sort(key=lambda x: (-x[1], x[0]))
    top = cand[:num_suggestions]
    return [(w, s) for w, s in top if s >= 90.0 or s >= min_similarity]


def oracle_search_with_suggestions(
    index: OracleIndex,
    query: str,
    top_k: int = 5,
    min_score: float = -30.0,
) -> dict:
    """Reference search_with_suggestions flow (service/text_search.py:389-477):
    strip [,?!.]; suggestions for OOV tokens len > 2; fuzzy search; if any
    token has a valid suggestion, substitute the top one and re-search."""
    clean = re.sub(r"[,?!.]", " ", query).strip()
    tokens = oracle_tokenize_query(clean)
    suggestions = {
        t: oracle_word_suggestions(index, t)
        for t in dict.fromkeys(tokens)
        if t not in index.vocabulary and len(t) > 2
    }
    suggestions = {t: s for t, s in suggestions.items() if s}
    results = oracle_search(index, clean, top_k=top_k, min_score=min_score)
    suggested_query = None
    replacements = {t: s[0][0] for t, s in suggestions.items()}
    if replacements:
        cand = " ".join(replacements.get(t, t) for t in tokens)
        if cand != clean:
            suggested_query = cand
            results = oracle_search(index, cand, top_k=top_k, min_score=min_score)
    return {
        "suggested_query": suggested_query,
        "suggestions": suggestions,
        "used_suggestion": suggested_query is not None,
        "results": results,
    }


def pagerank_oracle(
    nodes: list[str],
    edges: list[tuple[str, str, float]],
    damping: float = 0.85,
    max_iterations: int = 100,
    tolerance: float = 1e-6,
) -> dict[str, float]:
    """Weighted PageRank exactly as the reference computes it
    (service/scrape_web.py:939-978): contribution of edge (s,t,w) is
    damping * prev[s] * w / out_degree_count(s), where out-degree is the
    COUNT of outgoing edges (not the weighted sum); teleport (1-d)/n; L1
    convergence check."""
    n = len(nodes)
    if n == 0:
        return {}
    scores = {v: 1.0 / n for v in nodes}
    out_deg: dict[str, int] = {}
    for s, _, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    incoming: dict[str, list[tuple[str, float]]] = {v: [] for v in nodes}
    for s, t, w in edges:
        if t in incoming:
            incoming[t].append((s, w))
    for _ in range(max_iterations):
        prev = dict(scores)
        for v in nodes:
            rank = (1 - damping) / n
            for s, w in incoming[v]:
                d = out_deg.get(s, 0)
                if d > 0:
                    rank += damping * prev[s] * w / d
            scores[v] = rank
        if sum(abs(scores[v] - prev[v]) for v in nodes) < tolerance:
            break
    return scores


def doc_rank_score(
    final_rank: float | None = None,
    initial_rank: float | None = None,
    weight: float | None = None,
    content_length: int = 0,
    code_blocks: int = 0,
    outbound_links: int = 0,
) -> float:
    """Document weight formula (reference service/build_text_index.py:143-177).
    Returns 1.0 when no rank fields are present at all; otherwise
    0.4*final + 0.2*initial + 0.2*weight + 0.2*content_score, floored at 0.1.
    content_score = 0.4*min(len/5000,1) (0.5 base when len==0)
    + 0.3*min(code/10,1) + 0.3*min(links/20,1)."""
    if final_rank is None and initial_rank is None and weight is None:
        return 1.0
    fr = 0.0 if final_rank is None else final_rank
    ir = 1.0 if initial_rank is None else initial_rank
    w = 1.0 if weight is None else weight
    norm_len = min(content_length / 5000.0, 1.0) if content_length else 0.5
    content_score = norm_len * 0.4 + min(code_blocks / 10.0, 1.0) * 0.3 + min(outbound_links / 20.0, 1.0) * 0.3
    combined = fr * 0.4 + ir * 0.2 + w * 0.2 + content_score * 0.2
    return max(combined, 0.1)


def oracle_cluster_keywords(
    texts: dict,
    labels: dict,
    vectors: dict,
    stopwords: frozenset,
    top_n: int = 5,
    contrast_cap: int = 1000,
    urls: dict | None = None,
) -> dict:
    """A12 oracle (reference service/document_clustering.py:409-524):
    per-cluster keyword scores 0.4*path + 0.3*tf-contrast + 0.3*coherence
    with the cos<0.7 greedy diversity pick.

    texts: doc_id -> raw text; labels: doc_id -> cluster_id;
    vectors: term -> word-vector (list/ndarray); urls: doc_id -> url
    (stands in for the reference's file path).

    Deterministic policies (the reference is nondeterministic: unseeded
    np.random.choice at :448, Counter tie order): contrast sample = first
    contrast_cap other-cluster doc_ids ascending; count ties -> term asc;
    greedy score ties -> term asc. Returns {cluster_id: [(term, score)]}.
    """
    import numpy as np

    word_re = re.compile(r"\b[a-zA-Z]+\b")

    def terms_of(text: str) -> list[str]:
        return [w for w in word_re.findall(text.lower()) if len(w) > 2 and w not in stopwords]

    out: dict = {}
    for cid in sorted(set(labels.values())):
        cluster_docs = sorted(d for d, c in labels.items() if c == cid)
        word_freq: dict[str, int] = {}
        path_terms: set[str] = set()
        for d in cluster_docs:
            if urls and d in urls:
                for t in word_re.findall(str(urls[d]).lower()):
                    if len(t) > 2 and t not in stopwords:
                        path_terms.add(t)
            for w in terms_of(texts[d]):
                word_freq[w] = word_freq.get(w, 0) + 1
        other_docs = sorted(d for d, c in labels.items() if c != cid)[:contrast_cap]
        other_freq: dict[str, int] = {}
        for d in other_docs:
            for w in terms_of(texts[d]):
                other_freq[w] = other_freq.get(w, 0) + 1
        total = sum(word_freq.values()) or 1
        total_other = sum(other_freq.values()) or 1
        ranked = sorted(word_freq.items(), key=lambda x: (-x[1], x[0]))
        top100 = [(w, c) for w, c in ranked[:100] if w in vectors]
        wv = {w: np.asarray(vectors[w], dtype=np.float64) for w, _ in top100}
        scores: dict[str, float] = {}
        for w, c in ranked[:50]:
            if w not in vectors:
                continue
            tf = c / total
            other_tf = other_freq.get(w, 0) / total_other
            distinctiveness = max(0.0, tf - other_tf)
            path_score = 2.0 if w in path_terms else 0.0
            v = np.asarray(vectors[w], dtype=np.float64)
            sims = [
                float(np.dot(v, ov) / (np.linalg.norm(v) * np.linalg.norm(ov)))
                for ow, ov in wv.items()
                if ow != w
            ]
            coherence = float(np.mean(sims)) if sims else 0.0
            scores[w] = 0.4 * path_score + 0.3 * distinctiveness + 0.3 * coherence
        keywords: list[tuple[str, float]] = []
        seen: list = []
        for w, sc in sorted(scores.items(), key=lambda x: (-x[1], x[0])):
            if len(keywords) >= top_n:
                break
            v = np.asarray(vectors[w], dtype=np.float64)
            diverse = all(
                float(np.dot(v, sv) / (np.linalg.norm(v) * np.linalg.norm(sv))) <= 0.7
                for sv in seen
            )
            if diverse:
                keywords.append((w, sc))
                seen.append(v)
        out[cid] = keywords
    return out
