from search_engine_spark.multimodal.media import (
    MEDIA_SCHEMA,
    decode_image_batch,
    extract_media_features,
    frame_sample_video,
    media_table_from_binaries,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_image_batch",
    "extract_media_features",
    "frame_sample_video",
    "media_table_from_binaries",
]
