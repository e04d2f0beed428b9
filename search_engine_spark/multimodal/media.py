"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A training-data pipeline at corpus scale carries media as ``binary`` columns
with a typed metadata struct; decode/feature-extraction runs as Arrow-batched
pandas UDFs (mapInPandas). The image/audio libraries are NOT installed in
this container, so the decode kernels are STUBBED:

- ``decode_image_batch`` raises NotImplementedError unless PIL is importable
  (gated import), falling back to a clearly-marked DETERMINISTIC FAKE
  decode (content-hash-derived pseudo-pixels) when ``allow_fake=True`` so
  the Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
  shape — is real and tested end-to-end.
- ``extract_media_features`` produces a deterministic feature vector from
  the bytes (rolling-hash moments): a stand-in with the exact shape a real
  embedding UDF would have (binary -> array<float>).
- ``frame_sample_video`` emits (media_id, frame_no, frame_bytes) rows: the
  explode-shaped mapInPandas used for frame-level processing; the frame
  splitter is a deterministic byte-chunker standing in for a real demuxer.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
)

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:long, sample_rate:int>"
)


def media_table_from_binaries(spark, rows: list[tuple]) -> DataFrame:
    """rows: (media_id, kind, payload, (mime, width, height, duration_ms,
    sample_rate)) -> typed media table."""
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_gray(b: bytes, use_fake: bool) -> np.ndarray:
    """payload -> uint8 grayscale pixel matrix (h, w). Fake branch derives
    deterministic pseudo-pixels from the content hash; real branch is PIL."""
    if use_fake:
        h = hashlib.sha256(b).digest()
        w = 16 + h[0] % 64
        ht = 16 + h[1] % 64
        rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
        return rng.randint(0, 256, size=(ht, w), dtype=np.uint8)
    import io  # pragma: no cover - PIL not present in this env

    from PIL import Image  # pragma: no cover

    img = Image.open(io.BytesIO(b)).convert("L")  # pragma: no cover
    return np.asarray(img)  # pragma: no cover


def decode_image_batch(media: DataFrame, allow_fake: bool = False) -> DataFrame:
    """(media_id, width, height, pixels_digest) — image decode.

    Real path requires PIL (not installed here -> NotImplementedError);
    fake path derives deterministic pseudo-dimensions/pixels from the
    payload hash. The mapInPandas plumbing is identical either way.
    """
    use_fake = not _pil_available()
    if use_fake and not allow_fake:
        raise NotImplementedError(
            "image decode requires PIL which is not installed; pass "
            "allow_fake=True for the deterministic stand-in decode"
        )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, ws, hs, digs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pixels = _decode_gray(bytes(payload or b""), use_fake)
                ids.append(mid)
                ws.append(pixels.shape[1])
                hs.append(pixels.shape[0])
                digs.append(hashlib.sha256(pixels.tobytes()).hexdigest()[:16])
            yield pd.DataFrame(
                {"media_id": ids, "width": ws, "height": hs, "pixels_digest": digs}
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, "media_id long, width int, height int, pixels_digest string"
    )


@F.pandas_udf(ArrayType(FloatType()))
def extract_media_features(payload):  # type: ignore[no-untyped-def]
    """binary -> 8-dim deterministic feature vector (rolling-hash moments).

    Stand-in with the exact signature/shape of a real embedding UDF; swap
    the body for a model call when the runtime has one.
    """
    import pandas as pd

    out = []
    for b in payload:
        b = bytes(b or b"")
        if not b:
            out.append([0.0] * 8)
            continue
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
        h = int(hashlib.sha256(b).hexdigest()[:8], 16) / 0xFFFFFFFF
        out.append(
            [
                float(arr.mean() / 255.0),
                float(arr.std() / 255.0),
                float(arr.min() / 255.0),
                float(arr.max() / 255.0),
                float(len(b) % 997) / 997.0,
                float(np.diff(arr).mean() / 255.0) if len(arr) > 1 else 0.0,
                h,
                float(arr[:: max(1, len(arr) // 16)].sum() % 1009) / 1009.0,
            ]
        )
    return pd.Series(out)


def resize_image_batch(
    media: DataFrame,
    target_w: int = 32,
    target_h: int = 32,
    allow_fake: bool = False,
) -> DataFrame:
    """(media_id, width, height, pixels) — decode + nearest-neighbor resize
    to (target_h, target_w), the preprocessing step before a vision-model
    batch. The DECODE shares ``decode_image_batch``'s gate (PIL preferred,
    deterministic fake behind ``allow_fake``); the RESIZE kernel itself is
    pure numpy index sampling and runs for real in both branches. Resized
    pixels ship back as row-major uint8 bytes so downstream UDFs can
    ``np.frombuffer(..).reshape(target_h, target_w)`` without re-decoding.

    Scale shape: one Arrow-batched mapInPandas pass, no shuffle; output
    rows are fixed-size (target_h*target_w bytes), so downstream batch
    sizing is exact regardless of source image dimensions.
    """
    use_fake = not _pil_available()
    if use_fake and not allow_fake:
        raise NotImplementedError(
            "image decode requires PIL which is not installed; pass "
            "allow_fake=True for the deterministic stand-in decode"
        )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, ws, hs, pix = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pixels = _decode_gray(bytes(payload or b""), use_fake)
                src_h, src_w = pixels.shape
                rows = (np.arange(target_h) * src_h) // target_h
                cols = (np.arange(target_w) * src_w) // target_w
                resized = pixels[np.ix_(rows, cols)]
                ids.append(mid)
                ws.append(target_w)
                hs.append(target_h)
                pix.append(resized.tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "width": ws, "height": hs, "pixels": pix}
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, "media_id long, width int, height int, pixels binary"
    )


def frame_sample_video(
    media: DataFrame, every_nth: int = 2, frame_bytes: int = 1024
) -> DataFrame:
    """(media_id, frame_no, frame) — frame sampling as an exploding
    mapInPandas. Deterministic byte-chunker stands in for a demuxer."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload or b"")
                chunks = [b[i : i + frame_bytes] for i in range(0, len(b), frame_bytes)]
                for no, ch in enumerate(chunks):
                    if no % every_nth == 0:
                        ids.append(mid)
                        nos.append(no)
                        frames.append(ch)
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, "media_id long, frame_no int, frame binary"
    )
