"""In-process serving layer over the materialized compressed index.

Spark builds the index (index/build.py); this package answers queries from
it WITHOUT a SparkSession — the deployment the reference itself uses
(an always-warm in-memory index behind a web service,
reference service/text_search.py:35-53 + utils/bm250kapi_weighted.py),
and the serving recommendation of BENCH.md's qps study: Spark's per-job
scheduling floor (~1-3 s) makes it the wrong tool for interactive p50;
the index files are the hand-off contract.
"""

from search_engine_spark.serving.sharded import IndexShard, ShardedWarmReader
from search_engine_spark.serving.warm_reader import WarmIndexReader

__all__ = ["WarmIndexReader", "ShardedWarmReader", "IndexShard"]
