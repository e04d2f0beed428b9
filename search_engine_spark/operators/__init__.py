from search_engine_spark.operators.corpus_stats import BM25Index, build_bm25_index
from search_engine_spark.operators.scoring import score_query, search_topk

__all__ = ["BM25Index", "build_bm25_index", "score_query", "search_topk"]
