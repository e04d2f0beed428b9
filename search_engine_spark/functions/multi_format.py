"""S3: multi-format document reader dispatch (reference
service/document_clustering.py:205-231 ``load_documents``).

The reference walks a folder and dispatches on suffix: .txt -> raw read,
.pdf -> PyPDF2 pages, .docx -> python-docx paragraphs, .html/.htm ->
BeautifulSoup text. Our corpus is a table, so the dispatch is a column
operation: (payload: binary, fmt: string) -> text. Per-format kernels:

- txt:   utf-8 decode with errors ignored (reference :178-181)
- html:  the byte-identical HTML extractor (functions/html_extract)
- pdf:   pypdf/PyPDF2 when available, else a STDLIB kernel
         (functions/pdf_extract: object scan, page-tree walk, zlib
         FlateDecode, Tj/TJ/'/" text operators). Real pdf bytes
         round-trip in tests; no third-party dependency needed.
- docx:  python-docx when available, else a STDLIB kernel (.docx is a zip
         of XML: ``zipfile`` + ``xml.etree`` over word/document.xml) that
         reproduces python-docx's paragraph.text semantics — body-level
         ``w:p`` elements, runs' ``w:t`` text with ``w:tab``/``w:br``/
         ``w:cr`` as tab/newline — joined with '' (the reference's
         ``"".join(...)`` quirk, :195-203). Real docx bytes round-trip in
         tests; no third-party dependency needed.

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


_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _docx_paragraph_texts_stdlib(payload: bytes) -> list[str]:
    """Paragraph texts from raw .docx bytes using only the stdlib.

    .docx is a zip archive; the body lives in word/document.xml. Mirrors
    python-docx's ``Document(f).paragraphs`` / ``Paragraph.text``:
    body-LEVEL ``w:p`` children only (table-nested paragraphs excluded,
    as python-docx's doc.paragraphs excludes them), and per paragraph the
    concatenation of its runs' ``w:t`` text with ``w:tab`` -> '\\t' and
    ``w:br``/``w:cr`` -> '\\n'.
    """
    import io
    import zipfile
    from xml.etree import ElementTree

    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        root = ElementTree.fromstring(zf.read("word/document.xml"))
    body = root.find(f"{{{_W_NS}}}body")
    if body is None:
        return []
    out: list[str] = []
    for p in body.findall(f"{{{_W_NS}}}p"):  # direct children only
        parts: list[str] = []
        for el in p.iter():
            tag = el.tag
            if tag == f"{{{_W_NS}}}t":
                parts.append(el.text or "")
            elif tag == f"{{{_W_NS}}}tab":
                parts.append("\t")
            elif tag in (f"{{{_W_NS}}}br", f"{{{_W_NS}}}cr"):
                parts.append("\n")
        out.append("".join(parts))
    return out


def extract_docx_text_py(payload: bytes | None) -> str:
    """DOCX -> text. Prefers python-docx (the reference's dependency);
    falls back to the stdlib zip+XML kernel when it is not installed.
    Either way paragraphs are joined with the EMPTY string — the
    reference's ``"".join(...)`` quirk (document_clustering.py:199)."""
    if not payload:
        return ""
    document_cls = _docx_document()
    try:
        if document_cls is not None:
            import io

            doc = document_cls(io.BytesIO(bytes(payload)))
            return "".join(p.text for p in doc.paragraphs)
        return "".join(_docx_paragraph_texts_stdlib(bytes(payload)))
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
