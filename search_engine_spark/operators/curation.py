"""Composed training-data curation pipeline over the documents table.

Beyond the reference's scope (its pipeline stops at indexing,
reference service/build_text_index.py): an LLM training-data pipeline
chains the per-row filters (language, quality, token budget) with exact
dedup into ONE dataflow. This module composes the already-oracled
building blocks (operators/text_quality.py, operators/dedup.py semantics)
into that dataflow with the shape it must have at 100 TB:

- ALL per-row signals (md5 fingerprint, marker-word lang, quality score,
  BPE-ish token count) are computed in a SINGLE projection over a single
  scan of the corpus — text is read once and never carried past it.
- Row-local filters run BEFORE the dedup exchange, so only survivors'
  SLIM rows (doc_id, fp, three scalars — no text) are shuffled.
- Canonical selection (min doc_id per fingerprint) is a rank-1 window on
  fp: Spark plans it as WindowGroupLimit (top-1 per group pushed below
  the sort), one exchange total for the whole pipeline.

Filter-then-dedup is the deliberate semantic: a duplicate of a rejected
document should not survive via a passing twin; dedup applies among
documents that individually qualify (the order used by open web-corpus
pipelines, e.g. the C4/Gopher-style quality-then-dedup cascades).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.config import DEFAULT_CONFIG, EngineConfig
from search_engine_spark.operators.text_quality import (
    bpe_token_count_col,
    lang_pred_cols,
    quality_feature_cols,
)


def curate_docs(
    docs: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    lang: str = "en",
    min_quality: float = 0.35,
    min_tokens: int = 20,
    max_tokens: int = 80,
    doc_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """(doc_id, fp, pred_lang, n_bpe_tokens, quality_score) — documents
    that survive the curation cascade: pred_lang == lang, rounded
    quality_score >= min_quality, BPE token count within
    [min_tokens, max_tokens], then exact-dedup keeping the min doc_id per
    md5(text) fingerprint among survivors.

    Thresholds compare the ROUNDED score (identical rounding in the SQL
    oracle) so cross-engine float noise can't flip boundary membership.
    """
    text = F.col(text_col)
    pred_lang, _hits = lang_pred_cols(text)
    quality = quality_feature_cols(text, cfg, round_to)["quality_score"]
    n_bpe = bpe_token_count_col(text).cast("long")
    feats = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.md5(text).alias("fp"),
        pred_lang.alias("pred_lang"),
        n_bpe.alias("n_bpe_tokens"),
        quality.alias("quality_score"),
    )
    kept = feats.filter(
        (F.col("pred_lang") == lang)
        & (F.col("quality_score") >= min_quality)
        & F.col("n_bpe_tokens").between(min_tokens, max_tokens)
    )
    w = Window.partitionBy("fp").orderBy(F.col("doc_id").asc())
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def hash_split(
    docs: DataFrame,
    fractions: tuple[float, ...] = (0.8, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    doc_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """(doc_id, fp_prefix, split): deterministic train/val/test assignment.

    The training-data staple Spark's randomSplit cannot provide: a split
    that is STABLE across runs, cluster sizes, row order, and engines —
    membership is a pure function of the document id, so a re-run of the
    pipeline (or a different engine; the DuckDB oracle reproduces it
    byte-for-byte) assigns every document identically, and incremental
    corpus additions never reshuffle existing assignments.

    Mechanism: the first 4 hex chars of md5(doc_id || salt) partition the
    65536-bucket hash space by lexicographic boundaries. Fractions are
    quantized to 1/65536 (boundary = floor(cum_fraction * 65536) rendered
    as 4 hex chars): exactly reproducible in any engine with md5 and
    string comparison, with quantization error <= 0.002%. The last split
    named in ``names`` takes the remainder. Narrow, shuffle-free, scales
    linearly; ``salt`` derives independent splits from the same corpus.
    """
    if len(names) != len(fractions) + 1:
        raise ValueError("need exactly one more name than fractions")
    if sum(fractions) >= 1.0:
        # cum >= 1.0 would render a 5-char boundary ('10000') that sorts
        # BELOW every 4-hex-char prefix, silently starving that split;
        # the remainder split owns whatever the fractions leave.
        raise ValueError(
            f"fractions must sum to < 1.0 (the last name takes the "
            f"remainder); got sum={sum(fractions)}"
        )
    fp = F.md5(F.concat(F.col(doc_col).cast("string"), F.lit(salt)).cast("binary"))
    prefix = F.substring(fp, 1, 4)
    cum = 0.0
    expr = None
    for name, frac in zip(names, fractions):
        cum += frac
        bound = format(int(cum * 65536), "04x")
        cond = prefix < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(names[-1])
    return docs.select(
        F.col(doc_col).alias("doc_id"),
        prefix.alias("fp_prefix"),
        expr.alias("split"),
    )


# Portable across Java regex (Spark) and RE2 (DuckDB oracle): no
# lookarounds, no backreferences, character classes and bounded repeats
# only. Order matters — emails are scrubbed before IPs/phones so their
# local parts can't be re-matched as numbers; each counter runs on the
# text state its own replacement sees.
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d[\d\-]{7,14}\d"


def scrub_pii(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ipv4, n_phones): PII redaction.

    The compliance staple of every web-corpus pipeline: emails, IPv4
    addresses and international-format phone numbers are replaced with
    <EMAIL> / <IP> / <PHONE> tokens, with per-doc match counts kept for
    audit tables. Pure JVM-side regexp_replace/regexp_count in one
    projection — no shuffle, no UDF, linear in bytes; the patterns are
    deliberately RE2-compatible so the DuckDB oracle replays them
    byte-for-byte.
    """
    text = F.col(text_col)
    clean1 = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    clean2 = F.regexp_replace(clean1, PII_IPV4, "<IP>")
    clean3 = F.regexp_replace(clean2, PII_PHONE, "<PHONE>")
    return docs.select(
        F.col(doc_col).alias("doc_id"),
        clean3.alias("clean_text"),
        F.regexp_count(text, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(clean1, F.lit(PII_IPV4)).cast("long").alias("n_ipv4"),
        F.regexp_count(clean2, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    doc_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_contaminated_ngrams, contaminated): benchmark overlap.

    The eval-hygiene staple: before training, every document sharing any
    word n-gram with an evaluation benchmark must be flagged (the
    GPT-3/PaLM-style n-gram contamination screen). Counts DISTINCT
    contaminated n-grams per document and flags contaminated (0/1).

    Scale shape: per-doc n-grams are deduped row-locally (array_distinct,
    no shuffle) BEFORE the explode; the benchmark side is tiny relative
    to any corpus, so its distinct gram set broadcasts — the only
    exchange is the slim (doc_id, count) aggregation. Tokenization is
    the lowercased whitespace stream (contamination must see stopwords).
    """
    from search_engine_spark.operators.text_quality import (
        word_ngrams_col,
        ws_tokens,
    )

    tokenized = docs.select(
        F.col(doc_col).alias("doc_id"),
        ws_tokens(F.lower(F.col(text_col))).alias("toks"),
    )
    doc_grams = tokenized.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams_col(F.col("toks"), n))).alias("gram"),
    )
    bench_tok = benchmark.select(
        ws_tokens(F.lower(F.col(bench_text_col))).alias("toks")
    )
    bench_grams = (
        bench_tok.select(
            F.explode(F.array_distinct(word_ngrams_col(F.col("toks"), n))).alias("gram")
        )
        .distinct()
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )
    return (
        docs.select(F.col(doc_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_contaminated_ngrams", F.lit(0))
            .cast("long")
            .alias("n_contaminated_ngrams"),
            (F.coalesce("n_contaminated_ngrams", F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    default_rate: float = 0.0,
    doc_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """(doc_id, stratum): deterministic per-stratum subsample.

    The domain-rebalancing staple (up/down-weighting sources or languages
    in a training mix): each document is kept iff the first 4 hex chars
    of md5(doc_id || salt) fall below its stratum's rate boundary — the
    same engine-portable mechanism as ``hash_split``, so membership is a
    pure function of (doc_id, salt): stable across runs, engines,
    cluster sizes, and corpus growth, and REUSING the hash space means a
    rate-0.25 sample is an exact subset of the rate-0.5 sample (nested
    samples, the property Monte-Carlo-style rate sweeps need). Rates are
    quantized to 1/65536; rate >= 1 keeps the whole stratum, rate <= 0
    drops it (the hex-boundary compare cannot express either endpoint:
    format(65536) = '10000' sorts BELOW 'ffff' lexicographically).
    Shuffle-free narrow filter; scales linearly.
    """
    fp = F.md5(F.concat(F.col(doc_col).cast("string"), F.lit(salt)).cast("binary"))
    prefix = F.substring(fp, 1, 4)

    def keep(rate: float):
        if rate >= 1.0:
            return F.lit(True)
        if rate <= 0.0:
            return F.lit(False)
        return prefix < F.lit(format(int(rate * 65536), "04x"))

    expr = None
    for stratum, rate in sorted(rates.items()):
        cond = F.col(stratum_col) == stratum
        expr = (
            F.when(cond, keep(rate))
            if expr is None
            else expr.when(cond, keep(rate))
        )
    expr = keep(default_rate) if expr is None else expr.otherwise(keep(default_rate))
    return docs.filter(expr).select(
        F.col(doc_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
    )
