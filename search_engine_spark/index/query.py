"""Query engine over the materialized compressed index.

Plan: filter encoded blocks to the query terms (parquet row-group pruning —
the postings files are range-sorted by term, so min/max stats skip
non-matching row groups), decode + score inside a vectorized mapInPandas
(blocks are self-contained: deltas, tfs, doc lens, weights — no doc join),
hash-aggregate per doc_int, TakeOrderedAndProject top-k, then map the k
winners back to doc_ids via a broadcast-of-k-rows join.

Block-max pruning (``use_wand=True``) — result-identical top-k using the
stored per-block ``max_score`` upper bounds (block-max WAND adapted to a
shuffle engine):

1. theta: decode only each term's best few blocks, compute PARTIAL doc
   scores (lower bounds of true scores); theta = k-th largest partial.
   Pointwise lower bounds give order-statistic lower bounds, so theta <=
   true k-th best score.
2. survivors: keep block b of term t iff
   max_score_t(b) + sum_{t' != t} global_max(t') >= theta.
   A doc contained only in pruned blocks has
   score <= sum_t max_score_t(block_t(doc)) < theta — provably outside
   top-k.
3. exact rescue: decode survivors, partial-score their docs; finalists =
   docs with partial + sum_t pruned_max(t) >= theta_k (k-th partial);
   rescore finalists EXACTLY by decoding every block whose [first,last]
   range intersects a finalist id. Non-finalists cannot reach top-k
   because exact >= partial for everyone.

All pruning metadata (term, block ranges, max_score) is a column-pruned
scan — the binary payload columns are never read for pruned blocks.
"""

from __future__ import annotations

import json
import os
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from search_engine_spark.config import DEFAULT_CONFIG, EngineConfig
from search_engine_spark.index.codec import varbyte_decode

_SCORE_SCHEMA = StructType(
    [
        StructField("doc_int", LongType()),
        StructField("contrib", DoubleType()),
        StructField("weight", DoubleType()),
    ]
)


class CompressedIndex:
    """Loaded materialized index (lazy DataFrames + corpus scalars)."""

    def __init__(self, spark: SparkSession, path: str, cfg: EngineConfig = DEFAULT_CONFIG):
        self.spark = spark
        self.path = path
        self.cfg = cfg
        with open(os.path.join(path, "corpus.json")) as f:
            c = json.load(f)
        self.corpus_size = int(c["corpus_size"])
        self.avgdl = float(c["avgdl"])
        self.average_idf = float(c["average_idf"])
        self.k1 = float(c["k1"])
        self.b = float(c["b"])
        self.postings = spark.read.parquet(os.path.join(path, "postings"))
        self.doc_dim = spark.read.parquet(os.path.join(path, "doc_dim"))
        self.term_stats = spark.read.parquet(os.path.join(path, "term_stats"))

    # ---------------------------------------------------------------- decode

    def _decode_score_udf(self, qtf: dict[str, int]):
        """mapInPandas: encoded blocks -> (doc_int, contrib, weight).

        Closes over plain scalars only (never ``self`` — it holds the
        SparkSession and is not serializable to workers).
        """
        k1, b, avgdl = self.k1, self.b, self.avgdl
        qtf = dict(qtf)

        def run(batches):
            for pdf in batches:
                outs = []
                for row in pdf.itertuples(index=False):
                    n = int(row.n)
                    docs = np.empty(n, dtype=np.int64)
                    docs[0] = row.first_doc
                    if n > 1:
                        docs[1:] = row.first_doc + np.cumsum(
                            varbyte_decode(row.doc_deltas).astype(np.int64)
                        )
                    tfs = varbyte_decode(row.tfs).astype(np.float64)
                    dls = varbyte_decode(row.dls).astype(np.float64)
                    wts = np.frombuffer(row.weights, dtype=np.float64)
                    mult = float(qtf.get(row.term, 1)) * float(row.idf)
                    contrib = mult * (tfs * (k1 + 1)) / (
                        tfs + k1 * (1 - b + b * dls / avgdl)
                    )
                    outs.append(
                        pd.DataFrame(
                            {"doc_int": docs, "contrib": contrib, "weight": wts}
                        )
                    )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        return run

    def _blocks_for_terms(self, terms: list[str]) -> DataFrame:
        return self.postings.filter(F.col("term").isin(terms))

    def _decode_blocks(self, blocks: DataFrame, qtf: dict[str, int]) -> DataFrame:
        with_idf = blocks.join(
            F.broadcast(self.term_stats.select("term", "idf")), "term"
        )
        return with_idf.mapInPandas(self._decode_score_udf(qtf), _SCORE_SCHEMA)

    def _agg_scores(self, decoded: DataFrame) -> DataFrame:
        return decoded.groupBy("doc_int").agg(
            (F.sum("contrib") * F.first("weight")).alias("score")
        )

    # ---------------------------------------------------------------- search

    def search_topk(
        self,
        tokens: list[str],
        top_k: int | None = None,
        min_score: float | None = None,
        use_wand: bool = False,
    ) -> DataFrame:
        """(rank, doc_id, score) — same contract/semantics as the logical
        path (operators/scoring.search_topk), incl. dense zero-padding."""
        cfg = self.cfg
        k = top_k if top_k is not None else cfg.top_k
        ms = min_score if min_score is not None else cfg.min_score
        doc_field = self.doc_dim.schema["doc_id"]
        schema = StructType(
            [
                StructField("rank", IntegerType(), False),
                StructField("doc_id", doc_field.dataType, doc_field.nullable),
                StructField("score", DoubleType(), False),
            ]
        )
        qtf = dict(Counter(tokens))
        terms = sorted(qtf)
        if not terms:
            return self.spark.createDataFrame([], schema=schema)

        if use_wand:
            scored = self._wand_scores(qtf, k)
        else:
            scored = self._agg_scores(self._decode_blocks(self._blocks_for_terms(terms), qtf))

        top_rows = [
            (int(r["doc_int"]), float(r["score"]))
            for r in scored.orderBy(F.col("score").desc(), F.col("doc_int").asc()).limit(k).collect()
        ]
        positives = sum(1 for _, s in top_rows if s > 0.0)
        if positives < k and self.corpus_size > 0:
            have = {d for d, _ in top_rows}
            # zero-pad: smallest doc_ints NOT matched by any query term.
            # matched doc set = scored; anti-join then TakeOrdered.
            pad = (
                self.doc_dim.join(scored.select("doc_int"), "doc_int", "left_anti")
                .select("doc_int")
                .orderBy("doc_int")
                .limit(k - positives)
                .collect()
            )
            top_rows += [(int(r["doc_int"]), 0.0) for r in pad if int(r["doc_int"]) not in have]
        merged = sorted(top_rows, key=lambda x: (-x[1], x[0]))[:k]
        winners = [d for d, _ in merged]
        if not winners:
            return self.spark.createDataFrame([], schema=schema)
        win_df = self.spark.createDataFrame([(int(d),) for d in winners], "doc_int long")
        id_map = {
            int(r["doc_int"]): r["doc_id"]
            for r in self.doc_dim.join(F.broadcast(win_df), "doc_int").select("doc_int", "doc_id").collect()
        }
        out = [
            (i + 1, id_map[d], s)
            for i, (d, s) in enumerate(merged)
            if s > ms
        ]
        return self.spark.createDataFrame(out, schema=schema)

    # ----------------------------------------------------------------- WAND

    def _wand_scores(self, qtf: dict[str, int], k: int) -> DataFrame:
        """Block-max-pruned sparse scores, result-identical to full decode."""
        terms = sorted(qtf)
        meta = (
            self._blocks_for_terms(terms)
            .select("term", "part_id", "block_id", "max_score")
            .withColumn("qmult", F.lit(1.0))
            .collect()
        )
        if not meta:
            return self._agg_scores(self._decode_blocks(self._blocks_for_terms(terms), qtf))
        # per-term block maxima scaled by query-term multiplicity
        per_term: dict[str, list] = {}
        for r in meta:
            per_term.setdefault(r["term"], []).append(
                (float(r["max_score"]) * qtf[r["term"]], int(r["part_id"]), int(r["block_id"]))
            )
        global_max = {t: max(m for m, _, _ in v) for t, v in per_term.items()}
        total_blocks = sum(len(v) for v in per_term.values())
        # WAND precondition: non-negative contributions. A negative
        # epsilon-floored IDF (average_idf < 0 corpora) makes partial sums
        # UPPER bounds instead of lower bounds — pruning would be unsound,
        # so fall back to the full decode (rare, pathological corpora).
        if any(m < 0 for m in global_max.values()):
            return self._agg_scores(self._decode_blocks(self._blocks_for_terms(terms), qtf))

        # phase 1: theta from each term's best block (true partial scores)
        best = {t: max(v) for t, v in per_term.items()}
        cond = None
        for t, (_, pid, bid) in best.items():
            c = (F.col("term") == t) & (F.col("part_id") == pid) & (F.col("block_id") == bid)
            cond = c if cond is None else (cond | c)
        phase1 = self._agg_scores(
            self._decode_blocks(self._blocks_for_terms(terms).filter(cond), qtf)
        )
        theta_rows = phase1.orderBy(F.col("score").desc()).limit(k).collect()
        if len(theta_rows) < k:
            theta = float("-inf")  # not enough candidates to bound — no pruning
        else:
            theta = float(theta_rows[-1]["score"])

        # phase 2: survivor blocks (slack clamps at 0: a doc missing term t'
        # contributes 0, never less)
        sum_gm = sum(max(m, 0.0) for m in global_max.values())
        keep: list[tuple[str, int, int]] = []
        for t, v in per_term.items():
            slack = sum_gm - max(global_max[t], 0.0)
            for m, pid, bid in v:
                if m + slack >= theta:
                    keep.append((t, pid, bid))
        if not keep or len(keep) == total_blocks or theta == float("-inf"):
            return self._agg_scores(self._decode_blocks(self._blocks_for_terms(terms), qtf))

        keep_df = self.spark.createDataFrame(keep, "term string, part_id int, block_id int")
        surv_blocks = self._blocks_for_terms(terms).join(
            F.broadcast(keep_df), ["term", "part_id", "block_id"]
        )
        partial = self._agg_scores(self._decode_blocks(surv_blocks, qtf)).cache()

        # phase 3: finalists + exact rescore
        theta_k_rows = partial.orderBy(F.col("score").desc()).limit(k).collect()
        theta_k = float(theta_k_rows[-1]["score"]) if len(theta_k_rows) >= k else float("-inf")
        kept_set = set(keep)
        pruned_max = {
            t: max((m for m, pid, bid in v if (t, pid, bid) not in kept_set), default=0.0)
            for t, v in per_term.items()
        }
        slack_all = sum(max(m, 0.0) for m in pruned_max.values())
        finalists = partial.filter(F.col("score") + F.lit(slack_all) >= F.lit(theta_k))
        fin_ids = [int(r["doc_int"]) for r in finalists.select("doc_int").collect()]
        if not fin_ids:
            return partial
        fin_arr = np.array(sorted(fin_ids), dtype=np.int64)
        # decode only blocks whose [first_doc, last_doc] range contains a
        # finalist (searchsorted membership test — column-pruned metadata),
        # restricted to finalist docs, for EXACT scores
        fin_df = self.spark.createDataFrame([(int(d),) for d in fin_arr], "doc_int long")

        @F.pandas_udf(BooleanType())
        def touches(first: pd.Series, last: pd.Series) -> pd.Series:
            lo = np.searchsorted(fin_arr, first.to_numpy(dtype=np.int64), side="left")
            hi = np.searchsorted(fin_arr, last.to_numpy(dtype=np.int64), side="right")
            return pd.Series(hi > lo)

        touching = self._blocks_for_terms(terms).filter(
            touches(F.col("first_doc"), F.col("last_doc"))
        )
        rescored = self._decode_blocks(touching, qtf).join(F.broadcast(fin_df), "doc_int")
        exact = rescored.groupBy("doc_int").agg(
            (F.sum("contrib") * F.first("weight")).alias("score")
        )
        non_final = partial.join(F.broadcast(fin_df), "doc_int", "left_anti")
        return exact.unionByName(non_final)
