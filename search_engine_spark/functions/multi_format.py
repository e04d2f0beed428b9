"""S3: multi-format document reader dispatch (reference
service/document_clustering.py:205-231 ``load_documents``).

The reference walks a folder and dispatches on suffix: .txt -> raw read,
.pdf -> PyPDF2 pages, .docx -> python-docx paragraphs, .html/.htm ->
BeautifulSoup text. Our corpus is a table, so the dispatch is a column
operation: (payload: binary, fmt: string) -> text. Per-format kernels:

- txt:   utf-8 decode with errors ignored (reference :178-181)
- html:  the byte-identical HTML extractor (functions/html_extract)
- pdf:   gated on pypdf/PyPDF2 (functions/pdf_extract)
- docx:  gated on python-docx (paragraph texts joined with '' — the
         reference's ``"".join(...)`` quirk, :195-203); neither library
         ships in this container, so the kernels raise NotImplementedError
         while the Arrow plumbing stays real and tested via the txt/html
         paths and the dispatch unit tests.

Unknown formats yield empty text (the reference silently skips unsupported
suffixes).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from search_engine_spark.functions.html_extract import extract_text_py
from search_engine_spark.functions.pdf_extract import extract_pdf_text_py

SUPPORTED_FORMATS = ("txt", "pdf", "docx", "html", "htm")


def _docx_document():
    try:
        import docx  # python-docx, the reference's dependency

        return docx.Document
    except ImportError:
        return None


def extract_docx_text_py(payload: bytes | None) -> str:
    document_cls = _docx_document()
    if document_cls is None:
        raise NotImplementedError(
            "DOCX extraction requires python-docx, which is not installed "
            "in this environment; install it to enable this UDF"
        )
    import io

    if not payload:
        return ""
    try:
        doc = document_cls(io.BytesIO(bytes(payload)))
        # reference quirk: paragraphs joined with the EMPTY string (:199)
        return "".join(p.text for p in doc.paragraphs)
    except Exception:
        return ""


def extract_txt_text_py(payload: bytes | str | None) -> str:
    if payload is None:
        return ""
    if isinstance(payload, str):
        return payload
    return bytes(payload).decode("utf-8", errors="ignore")


def extract_any_py(payload: bytes | None, fmt: str | None) -> str:
    """Suffix dispatch (reference :212-219). Unknown formats -> ''."""
    f = (fmt or "").lower().lstrip(".")
    if f == "txt":
        return extract_txt_text_py(payload)
    if f == "pdf":
        return extract_pdf_text_py(payload)
    if f == "docx":
        return extract_docx_text_py(payload)
    if f in ("html", "htm"):
        return extract_text_py(payload)
    return ""


@pandas_udf(StringType())
def extract_any_udf(payload: pd.Series, fmt: pd.Series) -> pd.Series:
    return pd.Series([extract_any_py(p, f) for p, f in zip(payload, fmt)])
