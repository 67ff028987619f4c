"""Arrow schemas for the interleaved-document data model.

Target data model per BASELINE.json ``input_hint``:
one logical table of interleaved text+media documents. The reference's
row-oriented ``(bytes, filename)`` uploads (app/services/analyze_service.py:11-25)
become media spans resolved via ``media_ref``; its flat extracted string
(app/services/ocr_service.py:117) becomes an offset-ordered span sequence.
"""

from __future__ import annotations

import pyarrow as pa

KIND_TEXT = "text"
KIND_MEDIA = "media"

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),       # "text" | "media"
        ("text", pa.string()),       # inline text; extracted text after OCR
        ("media_ref", pa.string()),  # "" for text spans
        ("offset", pa.int32()),      # 0-based position in the doc sequence
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
    ]
)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("payload", pa.binary()),
        ("media_kind", pa.string()),  # "image" | "pdf" | anything else = unsupported
        ("n_pages", pa.int32()),
    ]
)

#: Pipeline / oracle output: the sum-type OcrResponse|OcrError of the
#: reference (ocr_service.py:20) maps to a nullable (spans_out, error) pair —
#: Arrow cannot hold two row shapes in one column (SURVEY §1.2).
EXTRACTED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans_out", pa.list_(SPAN_TYPE)),  # empty list when error is set
        ("error", pa.string()),              # null on success
    ]
)

#: Extraction output + analysis columns (reference result row
#: {filename, score, summary} — app/services/analyze_service.py:84-88).
#: ``score`` is float in query mode, a seniority string in no-query mode
#: (models.py:7 Union[float,str]) → two nullable columns here.
ANALYZED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans_out", pa.list_(SPAN_TYPE)),
        ("error", pa.string()),
        ("score", pa.float64()),      # query mode; null otherwise / on error
        ("seniority", pa.string()),   # no-query mode; null otherwise / on error
        ("summary", pa.string()),     # null on error
    ]
)

#: Intermediate: one row per exploded unit (text span, media page, or
#: direct-text pdf). page_no semantics: -1 = text span, -2 = pdf direct-text
#: unit, >=0 = media page index.
EXPLODED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("media_kind", pa.string()),  # "" for text spans
        ("page_no", pa.int32()),
        ("n_pages", pa.int32()),
        ("n_spans", pa.int32()),      # spans in the parent doc (completeness check)
    ]
)

PAGE_TEXT = -1   # page_no for text spans
PAGE_DIRECT = -2  # page_no for pdf direct-text units


def spans_to_pylist(spans) -> list[dict]:
    """Normalize a spans cell (Arrow list scalar / list of dicts) to a plain list."""
    if spans is None:
        return []
    if hasattr(spans, "as_py"):
        spans = spans.as_py()
    return list(spans)
