from search_engine_spark.functions.html_extract import extract_text_udf, extract_text_py
from search_engine_spark.functions.tokenize import (
    index_tokens_col,
    query_tokens_py,
    tokens_col,
)
from search_engine_spark.functions.fuzzy import indel_ratio_udf

__all__ = [
    "extract_text_udf",
    "extract_text_py",
    "index_tokens_col",
    "query_tokens_py",
    "tokens_col",
    "indel_ratio_udf",
]
