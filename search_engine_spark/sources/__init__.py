from search_engine_spark.sources.synth import (
    REFERENCE_QUERY_SET,
    gen_page_record,
    synth_graph_edges,
    synth_pages_df,
    synth_pages_local,
)

__all__ = [
    "REFERENCE_QUERY_SET",
    "gen_page_record",
    "synth_graph_edges",
    "synth_pages_df",
    "synth_pages_local",
]
