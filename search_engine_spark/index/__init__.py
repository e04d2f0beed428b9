from search_engine_spark.index.codec import (
    decode_block,
    encode_blocks_for_term,
    varbyte_decode,
    varbyte_encode,
)

__all__ = [
    "decode_block",
    "encode_blocks_for_term",
    "varbyte_decode",
    "varbyte_encode",
]
