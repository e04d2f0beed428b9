"""PDF -> text extraction (F2, reference service/build_text_index.py:130-141).

The reference concatenates PyPDF2 per-page text with spaces, then
whitespace-collapses (clean_text). PyPDF2 is not installed in this
container, so the decode kernel is gated: the UDF raises
NotImplementedError unless pypdf/PyPDF2 is importable. The Spark plumbing
(binary column in, string column out, Arrow batches) is identical to the
HTML extractor and is what a deployment with the library installed runs
unchanged. Out of the Common-Crawl critical path (html corpus).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_WS_RE = re.compile(r"\s+")


def _pdf_reader():
    try:
        from pypdf import PdfReader  # modern name

        return PdfReader
    except ImportError:
        try:
            from PyPDF2 import PdfReader  # reference's dependency

            return PdfReader
        except ImportError:
            return None


def extract_pdf_text_py(payload: bytes | None) -> str:
    reader_cls = _pdf_reader()
    if reader_cls is None:
        raise NotImplementedError(
            "PDF extraction requires pypdf/PyPDF2, which is not installed "
            "in this environment; install it to enable this UDF"
        )
    import io

    if not payload:
        return ""
    try:
        reader = reader_cls(io.BytesIO(bytes(payload)))
        text = " ".join(page.extract_text() or "" for page in reader.pages)
    except Exception:
        return ""
    return _WS_RE.sub(" ", text).strip()


@pandas_udf(StringType())
def extract_pdf_text_udf(payload: pd.Series) -> pd.Series:
    return payload.map(extract_pdf_text_py)
