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
