"""search_engine_spark — a PySpark-native full-text index + BM25 query engine.

Brand-new implementation (NOT a port) with the query/data-processing
capabilities of the reference engine (sherwinwater/search-engine):

- HTML -> text extraction (byte-identical per url, vectorized pandas UDF)
- tokenization + stopword filtering (native Catalyst expressions)
- inverted index construction: postings(term, doc_id, tf), doc/term/corpus
  statistics, delta+varbyte compressed block-max postings, lineage manifests
- weighted BM25 top-k retrieval as DataFrame joins + aggregations
- fuzzy query expansion (Indel ratio) and word suggestions
- PageRank over the link graph, document weights
- training-data-pipeline extras: dedup (exact/minhash/simhash/jaccard),
  embedding similarity search, text quality analysis, clustering, summarizer

All computation is declared with the DataFrame API so Catalyst/Tungsten pick
physical strategies; Python appears only inside Arrow-vectorized pandas UDFs.
"""

from search_engine_spark.config import EngineConfig
from search_engine_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark"]
__version__ = "0.1.0"
