"""Pure-Python oracle replicating the reference engine's semantics exactly.

Used only in tests/benchmark verification — never in the Spark execution
path. See pyref.py.
"""

from search_engine_spark.oracle.pyref import (
    OracleIndex,
    build_oracle_index,
    indel_ratio,
    oracle_search,
    oracle_tokenize_index,
    oracle_tokenize_query,
    pagerank_oracle,
)

__all__ = [
    "OracleIndex",
    "build_oracle_index",
    "indel_ratio",
    "oracle_search",
    "oracle_tokenize_index",
    "oracle_tokenize_query",
    "pagerank_oracle",
]
