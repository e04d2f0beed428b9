"""Text analysis operators for corpus curation: quality scoring, language
ID, token counting, fingerprinting.

The reference computes content-quality heuristics per page (length / code
blocks / link counts, reference service/build_text_index.py:158-170 and
scrape_web.py:790-826); these generalize that into the standard
training-data quality/language columns, all as native Catalyst expressions
(JVM codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import DEFAULT_CONFIG, EngineConfig
from search_engine_spark.functions.tokenize import WS_PATTERN

# Tiny common-word lists for the n-gram-free language-ID heuristic.
# Deliberately small + hardcoded so the SQL oracle can embed the same lists.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "une", "dans", "que"),
    "es": ("el", "la", "los", "las", "es", "y", "que", "en", "por", "con"),
}


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens (no punctuation stripping) — raw token counting."""
    return F.filter(F.split(text, WS_PATTERN), lambda t: t != F.lit(""))


def quality_features(
    docs: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    doc_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, stopword_ratio,
    punct_ratio, quality_score)

    quality_score (0..1) = 0.4*min(n_tokens/500,1) + 0.3*(1-punct_ratio)
    + 0.3*min(stopword_ratio*4, 1) — length / cleanliness / naturalness,
    the shape of the reference's content score (build_text_index.py:158-170)
    adapted to text-only inputs.
    """
    cols = quality_feature_cols(F.col(text_col), cfg, round_to)
    return docs.select(
        F.col(doc_col).alias("doc_id"),
        *[c.alias(name) for name, c in cols.items()],
    )


def quality_feature_cols(
    text: Column, cfg: EngineConfig = DEFAULT_CONFIG, round_to: int = 6
) -> dict[str, Column]:
    """The per-row quality expressions as named Columns (cast/rounded
    exactly as ``quality_features`` emits them) — reusable inside composed
    single-projection pipelines (see operators/curation.py)."""
    stop = sorted(w for w in cfg.stopwords if len(w) > 1 and w.isalnum())
    toks = ws_tokens(F.lower(text))
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"(?U)[^\w\s]", ""))
    # isin over >10 literals optimizes to InSet (hash lookup per token),
    # not the O(|stopwords|) array_contains scan
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stop)))
    avg_tok = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double") / n_tokens,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    quality = (
        F.least(n_tokens.cast("double") / 500.0, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - punct_ratio) * 0.3
        + F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.3
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "avg_token_len": F.round(avg_tok, round_to),
        "stopword_ratio": F.round(stop_ratio, round_to),
        "punct_ratio": F.round(punct_ratio, round_to),
        "quality_score": F.round(quality, round_to),
    }


def lang_id(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pred_lang, lang_hits): marker-word language ID.

    pred = argmax over languages of marker-word hit count, deterministic
    tie-break lang asc. A heuristic stand-in for real n-gram language ID —
    the Spark shape (explode -> join marker table -> pivot-ish agg) is what
    matters at scale.
    """
    toks = ws_tokens(F.lower(F.col(text_col)))
    base = docs.select(F.col(doc_col).alias("doc_id"), toks.alias("toks"))
    counts = [
        F.size(F.filter(F.col("toks"), lambda t: t.isin(*words))).alias(f"hits_{lang}")
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    scored = base.select("doc_id", *counts)
    langs = sorted(LANG_MARKERS)
    m = F.greatest(*[F.col(f"hits_{l}") for l in langs])
    expr = _first_max_case([(l, F.col(f"hits_{l}")) for l in langs], m)
    return scored.select(
        "doc_id",
        expr.alias("pred_lang"),
        m.cast("long").alias("lang_hits"),
    )


def _first_max_case(hits: list[tuple[str, Column]], m: Column) -> Column:
    """First lang (asc) reaching the max -> deterministic tie-break; the
    identical CASE chain is what the SQL oracle runs."""
    expr = None
    for lang, h in hits:
        cond = h == m
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr


def lang_pred_cols(text: Column) -> tuple[Column, Column]:
    """(pred_lang, lang_hits) as a single expression tree over one text
    Column — the marker-word lang-id reusable inside composed
    single-projection pipelines (same semantics as ``lang_id``)."""
    toks = ws_tokens(F.lower(text))
    langs = sorted(LANG_MARKERS)
    hits = [
        (l, F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[l]))))
        for l in langs
    ]
    m = F.greatest(*[h for _, h in hits])
    return _first_max_case(hits, m), m.cast("long")


# BPE-ish pre-tokenization pattern: contractions, letter runs, digit runs,
# punctuation runs (each optionally preceded by one space), whitespace runs.
# The GPT-2 pattern minus its trailing-space lookahead, which RE2 (the
# DuckDB oracle engine) cannot express; both engines run THIS exact regex.
BPE_SPLIT_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_col(text: Column) -> Column:
    """BPE-ish pre-tokenization count (int) over one text Column."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), F.lit(0)))


def token_counts(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, bytes_per_bpe_token): LLM-style
    token accounting — whitespace tokens plus a BPE-ish regex
    pre-tokenization count (the standard proxy for subword token cost when
    no tokenizer model is loaded). Native regexp_extract_all, codegen'd.
    """
    ws = F.size(ws_tokens(F.col(text_col)))
    bpe = bpe_token_count_col(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    return docs.select(
        F.col(doc_col).alias("doc_id"),
        ws.cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_tokens"),
        F.round(
            F.when(bpe > 0, n_chars.cast("double") / bpe).otherwise(F.lit(0.0)), round_to
        ).alias("bytes_per_bpe_token"),
    )


# Character-trigram profiles (ASCII, space-delimited boundaries) for the
# n-gram language ID. Deliberately small + hardcoded so the SQL oracle can
# embed the identical lists; a production deployment would swap in learned
# profiles behind the same interface.
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", "ing", "ng ", "and", "nd ", " an", "ed ",
           " of", "of ", "ion", "on ", " to", "to ", "er ", " in", "in ",
           "at ", "is "),
    "de": ("er ", "en ", "ch ", "der", " de", "ein", "ich", "sch", "die",
           " di", "und", " un", "ie ", "che", "ung", " ge", "te ", "cht",
           "den", "ber"),
    "fr": (" de", "de ", "es ", "le ", " le", "ent", "nt ", "la ", " la",
           "et ", " et", "les", "ait", "que", "ue ", " qu", "re ", " co",
           "eur", "our"),
    "es": (" de", "de ", "os ", "la ", " la", "el ", " el", "es ", "ue ",
           "que", " qu", "ado", "en ", " en", "ar ", "los", " lo", "con",
           "aci", "ien"),
}


def char_trigrams(text: Column) -> Column:
    """All overlapping character 3-grams of the lowered text (array with
    multiplicity; empty for texts shorter than 3 chars)."""
    low = F.lower(text)
    n3 = F.char_length(low) - F.lit(2)
    return F.when(
        n3 >= 1,
        F.transform(F.sequence(F.lit(1), n3), lambda i: F.substring(low, i, F.lit(3))),
    ).otherwise(F.array().cast("array<string>"))


def lang_id_ngram(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    profiles: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """(doc_id, pred_lang, lang_hits): character-trigram language ID —
    the real-n-gram upgrade of ``lang_id`` behind the SAME interface.

    hits(lang) = number of the doc's trigrams (with multiplicity) found in
    that language's profile; pred = argmax, deterministic tie-break lang
    asc. Pure Catalyst codegen (transform/filter higher-order functions),
    no Python, no shuffle — scales linearly with corpus bytes.

    ``profiles`` defaults to the hardcoded ``LANG_TRIGRAMS`` stand-ins
    (which the SQL oracle embeds verbatim); pass the output of
    ``train_lang_profiles`` for LEARNED profiles — the production story
    (VERDICT r02 #4). The scoring plan is identical either way.
    """
    profs = profiles if profiles is not None else LANG_TRIGRAMS
    tris = char_trigrams(F.col(text_col))
    base = docs.select(F.col(doc_col).alias("doc_id"), tris.alias("tris"))
    counts = [
        F.size(F.filter(F.col("tris"), lambda t: t.isin(*grams))).alias(f"hits_{lang}")
        for lang, grams in sorted(profs.items())
    ]
    scored = base.select("doc_id", *counts)
    langs = sorted(profs)
    m = F.greatest(*[F.col(f"hits_{l}") for l in langs])
    expr = None
    for l in langs:
        cond = F.col(f"hits_{l}") == m
        expr = F.when(cond, F.lit(l)) if expr is None else expr.when(cond, F.lit(l))
    return scored.select(
        "doc_id",
        expr.alias("pred_lang"),
        m.cast("long").alias("lang_hits"),
    )


def train_lang_profiles(
    labeled_docs: DataFrame,
    top_n: int = 40,
    lang_col: str = "lang",
    text_col: str = "text",
    distinct_boost: float = 2.0,
) -> dict[str, tuple[str, ...]]:
    """Learn per-language trigram profiles from a LABELED sample as one
    distributed count job — the production replacement for the hardcoded
    ``LANG_TRIGRAMS`` stand-ins, behind the same ``lang_id_ngram``
    interface.

    Scoring: a trigram's weight within a language is its relative document
    frequency boosted by distinctiveness (frequency divided by the trigram's
    total frequency across ALL languages, Cavnar–Trenkle-flavored); the
    top_n per language form the profile, rank-ordered.

    Scale shape: explode trigrams -> groupBy(lang, tri) count (algebraic,
    map-side combined) -> per-lang totals broadcast-joined -> per-lang
    top_n window. Only |langs| * top_n scalar rows ever reach the driver.
    """
    from pyspark.sql.window import Window

    tris = labeled_docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(char_trigrams(F.col(text_col))).alias("tri"),
    )
    counts = tris.groupBy("lang", "tri").agg(F.count(F.lit(1)).alias("n"))
    lang_tot = counts.groupBy("lang").agg(F.sum("n").alias("lang_total"))
    tri_tot = counts.groupBy("tri").agg(F.sum("n").alias("tri_total"))
    scored = (
        counts.join(F.broadcast(lang_tot), "lang")
        .join(tri_tot, "tri")
        .withColumn("rel", F.col("n") / F.col("lang_total"))
        .withColumn("share", F.col("n") / F.col("tri_total"))
        .withColumn("w", F.col("rel") * F.pow(F.col("share"), F.lit(distinct_boost)))
    )
    rnk = Window.partitionBy("lang").orderBy(F.col("w").desc(), F.col("tri").asc())
    top = (
        scored.withColumn("rn", F.row_number().over(rnk))
        .filter(F.col("rn") <= top_n)
        .select("lang", "tri", "rn")
        .collect()  # |langs| * top_n scalar rows only
    )
    profiles: dict[str, list[tuple[int, str]]] = {}
    for r in top:
        profiles.setdefault(r["lang"], []).append((r["rn"], r["tri"]))
    return {
        lang: tuple(t for _, t in sorted(entries))
        for lang, entries in profiles.items()
    }


def doc_fingerprints(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, fp, n_chars): md5 fingerprint of whitespace-normalized text."""
    norm = F.trim(F.regexp_replace(F.col(text_col), WS_PATTERN, " "))
    return docs.select(
        F.col(doc_col).alias("doc_id"),
        F.md5(norm.cast("binary")).alias("fp"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


def word_ngrams_col(toks: Column, n: int) -> Column:
    """Word n-grams ("a b", "b c", ...) of a MATERIALIZED token-array
    column — the array must be a bound column reference, not an inlined
    expression, or Catalyst re-evaluates the tokenize per position (see
    ngram_counts' 200s-vs-3s note). Bigrams (the common case) take a
    zip_with fast path: one pass over the array zipped with its own
    1-shifted slice, no per-position slice allocation; general n falls
    back to transform over a position sequence."""
    if n == 2:
        m = F.greatest(F.size(toks) - 1, F.lit(0))
        return F.zip_with(
            F.slice(toks, 1, m),
            F.slice(toks, 2, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    ng = F.size(toks) - F.lit(n - 1)
    return F.when(
        ng >= 1,
        F.transform(
            F.sequence(F.lit(1), ng),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _sorted_run_stats(arr: Column) -> Column:
    """Multiplicity stats over a string array in ONE shuffle-free pass:
    struct(max_chars, dup_chars, n_distinct) where, per distinct value v
    with occurrence count c, max_chars = max(c * length(v)), dup_chars =
    sum((c - 1) * length(v)) and n_distinct counts distinct values.

    array_sort groups equal values into runs, then a single F.aggregate
    fold tracks the current run incrementally — O(n log n) per document
    inside codegen, vs the O(n^2) filter-count-per-distinct alternative
    (which at web-document sizes of thousands of n-grams per doc would be
    millions of string compares per row)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("max_chars"),
        F.lit(0).cast("long").alias("dup_chars"),
        F.lit(0).cast("long").alias("n_distinct"),
    )

    def merge(acc: Column, x: Column) -> Column:
        same = acc["prev"].eqNullSafe(x)
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["max_chars"], run * F.length(x)).alias("max_chars"),
            (acc["dup_chars"] + F.when(same, F.length(x)).otherwise(F.lit(0)))
            .cast("long")
            .alias("dup_chars"),
            (acc["n_distinct"] + F.when(same, F.lit(0)).otherwise(F.lit(1)))
            .cast("long")
            .alias("n_distinct"),
        )

    return F.aggregate(F.array_sort(arr), init, merge)


def repetition_features(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """(doc_id, n_lines, dup_line_frac, dup_line_char_frac,
    top_bigram_char_frac, dup_bigram_char_frac): Gopher-style repetition
    signals (Rae et al. 2021 §A1.1), the standard boilerplate/spam screen
    in web-corpus curation.

    - dup_line_frac: fraction of (trimmed, non-empty) lines that are
      repeats of an earlier identical line.
    - dup_line_char_frac: characters in those repeated lines / total line
      characters.
    - top_bigram_char_frac: characters covered by the most frequent word
      bigram (count * bigram length) / document characters.
    - dup_bigram_char_frac: characters in non-first bigram occurrences /
      document characters. Consecutive bigrams overlap by one token, so
      this can exceed 1.0 on degenerate corpora; curation thresholds
      (Gopher uses ~0.2) sit far below.

    Bigrams use the same lowercased whitespace tokens as
    ``quality_features`` (raw stream — repetition screens must see
    stopwords). Entirely per-row Catalyst: no shuffle, no UDF; per-doc
    cost is O(n log n) via the sorted-run fold (see _sorted_run_stats).
    """
    text = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    # materialize toks/lines before the per-position lambdas (see
    # ngram_counts: an inlined tokenize re-evaluates per element)
    base = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.length(text).cast("long").alias("n_chars"),
        lines.alias("lines"),
        ws_tokens(F.lower(text)).alias("toks"),
    )
    grams = word_ngrams_col(F.col("toks"), 2)
    stats = base.select(
        "doc_id",
        "n_chars",
        F.size("lines").cast("long").alias("n_lines"),
        F.aggregate(
            F.col("lines"), F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ).alias("line_chars"),
        _sorted_run_stats(F.col("lines")).alias("ls"),
        _sorted_run_stats(grams).alias("gs"),
    )

    def frac(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > F.lit(0), num.cast("double") / den).otherwise(F.lit(0.0)),
            round_to,
        )

    n_lines = F.col("n_lines")
    return stats.select(
        "doc_id",
        n_lines.alias("n_lines"),
        frac(n_lines - F.col("ls")["n_distinct"], n_lines).alias("dup_line_frac"),
        frac(F.col("ls")["dup_chars"], F.col("line_chars")).alias(
            "dup_line_char_frac"
        ),
        frac(F.col("gs")["max_chars"], F.col("n_chars")).alias(
            "top_bigram_char_frac"
        ),
        frac(F.col("gs")["dup_chars"], F.col("n_chars")).alias(
            "dup_bigram_char_frac"
        ),
    )


def ngram_counts(
    docs: DataFrame,
    n: int = 2,
    top: int = 50,
    cfg: EngineConfig = DEFAULT_CONFIG,
    text_col: str = "text",
) -> DataFrame:
    """(ngram, n_occurrences): corpus-wide word n-gram frequency, top-N.

    The language-model staple (n-gram LM stats, contamination screens,
    boilerplate detection all start from this table). Built from the
    ORDERED index-side token stream (len>1, stopwords dropped) with pure
    Catalyst higher-order functions — one explode, one hash aggregate
    with map-side partial counts, then TakeOrderedAndProject for the
    top-N; ties broken (count desc, ngram asc) for determinism. Unlike
    shingle_terms this keeps per-doc MULTIPLICITY: these are frequency
    counts, not set membership.
    """
    from search_engine_spark.functions.tokenize import index_tokens_col

    # materialize the token array BEFORE the per-position lambda: an inlined
    # tokenize expression would be re-evaluated once per sequence element
    # (O(tokens^2) re-tokenization per doc — measured 200s vs 3s at sf0.1)
    tokenized = docs.select(
        index_tokens_col(F.col(text_col), cfg.stopwords).alias("toks")
    )
    grams = word_ngrams_col(F.col("toks"), n)
    return (
        tokenized.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(top)
    )
