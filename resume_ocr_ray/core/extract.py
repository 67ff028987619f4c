"""Single-process reference extractor (the correctness oracle).

Implements the reference's extraction semantics
(/root/reference/app/services/ocr_service.py:20-127) over the interleaved
document model, as PURE per-unit functions:

- image media   → validate → preprocess → OCR            (ocr_service.py:23-46)
- pdf media     → direct text layer; >200 chars → text-PDF path with text
                  validation (ocr_service.py:49-77), else rasterized pages →
                  per-page validate → preprocess → OCR → page-marker stitch
                  (ocr_service.py:79-124)
- anything else → unsupported-type error                 (ocr_service.py:126-127)

Asymmetric validation-error semantics replicated exactly (SURVEY §2.4):
image ValidationError → LOG & CONTINUE; text-PDF ValidationError → REJECT;
scanned-page ValidationError → REJECT whole doc with the page-indexed message.

Both this oracle and the Ray pipeline (engine/pipeline.py) call the SAME unit
functions; tests assert per-document span-sequence equality
(kind, text, media_ref, order) between the two executions.

Error model: the reference's OcrResponse|OcrError sum type (ocr_service.py:20)
maps to a nullable (spans_out, error) pair; any failing span rejects the whole
document (the reference's unit of failure is the uploaded file) with the FIRST
error in (offset, page) order, and spans_out = [].
"""

from __future__ import annotations

import pyarrow as pa

from .. import config as C
from . import html as H
from . import llm as L
from . import media as M
from . import schema as S


# ---------------------------------------------------------------------------
# per-unit extraction (shared by oracle and Ray UDFs)
# ---------------------------------------------------------------------------

def extract_image(payload: bytes, name: str, engine: M.OcrEngine):
    """Image media → (text, error). Reference ocr_service.py:23-46."""
    try:
        page = M.get_media_page(payload, 0)
        verdict = M.validate_image_content(page, name)
        if isinstance(verdict, M.ValidationError):
            pass  # log & continue (ocr_service.py:31-33)
        elif not verdict:
            return None, C.ERR_NOT_RESUME.format(name=name)
        processed = M.preprocess_page(page)
        return engine.image_to_string(processed), None
    except Exception as e:
        return None, C.ERR_IMAGE_PROCESS.format(name=name, err=e)


def pdf_direct_text(payload: bytes) -> str:
    """The PDF text layer (fitz analog, ocr_service.py:50-58): any failure
    yields '' and silently falls through to the scanned path."""
    try:
        return M.decode_media_header(payload).get("direct_text", "")
    except Exception:
        return ""


def extract_pdf_direct(direct_text: str, name: str):
    """Text-PDF path (>200 chars direct text) → (text, error).
    Reference ocr_service.py:60-77."""
    verdict = M.validate_text_content(direct_text, name)
    if isinstance(verdict, M.ValidationError):
        return None, C.ERR_NOT_RESUME_TEXT_WITH.format(name=name, err=verdict.error)
    if not verdict:
        return None, C.ERR_NOT_RESUME_TEXT.format(name=name)
    return direct_text, None


def extract_pdf_page(page: bytes, page_no: int, n_pages: int, name: str,
                     engine: M.OcrEngine):
    """One rasterized PDF page → (text, error). Reference ocr_service.py:94-117.

    Pure function of the page, so pages evaluate independently in parallel;
    the stitcher takes the FIRST failing page in page order, which equals the
    reference's sequential early-exit.
    """
    try:
        verdict = M.validate_image_content(page, name)
        if isinstance(verdict, M.ValidationError):
            return None, C.ERR_PAGE_VALIDATION.format(
                i=page_no + 1, n=n_pages, name=name, err=verdict.error
            )
        if not verdict:
            return None, C.ERR_NOT_RESUME_TEXT.format(name=name)
        processed = M.preprocess_page(page)
        return engine.image_to_string(processed), None
    except Exception as e:
        return None, C.ERR_PDF_CRITICAL.format(err=e)


def stitch_pdf_pages(page_texts: list) -> tuple:
    """Stitch OCR'd pages with the exact marker convention
    (ocr_service.py:117-122). Input: texts in page order."""
    ocr_text = "".join(
        C.PAGE_MARKER.format(i=i + 1) + t for i, t in enumerate(page_texts)
    )
    if not ocr_text.strip():
        return None, C.ERR_OCR_EMPTY
    return ocr_text, None


def extract_html(payload: bytes, name: str):
    """HTML media → (main_text, error): DOM-heuristic boilerplate strip
    (core/html.py — the north rule's HTML arm; no reference analog), then
    the text-PDF validation semantics (ocr_service.py:60-77) on the
    extracted main content: ValidationError → reject, False → reject."""
    try:
        doc = M.decode_media(payload)
        page_html = doc.pages[0].decode("utf-8") if doc.pages else ""
        main = H.extract_main(page_html)
    except Exception as e:
        return None, C.ERR_HTML_PROCESS.format(name=name, err=e)
    if not main.strip():
        return None, C.ERR_OCR_EMPTY
    verdict = M.validate_text_content(main, name)
    if isinstance(verdict, M.ValidationError):
        return None, C.ERR_NOT_RESUME_TEXT_WITH.format(name=name, err=verdict.error)
    if not verdict:
        return None, C.ERR_NOT_RESUME_TEXT.format(name=name)
    return main, None


def extract_media_span(media_kind: str, payload, name: str, engine: M.OcrEngine):
    """Full per-span dispatch (ocr_service.py:20-127) → (text, error)."""
    if payload is None:
        return None, C.ERR_BAD_REF.format(ref=name)
    if len(payload) == 0:
        return None, C.ERR_EMPTY_FILE.format(name=name)
    if len(payload) > C.MAX_MEDIA_BYTES:
        return None, C.ERR_TOO_LARGE.format(name=name)
    if media_kind == C.MEDIA_KIND_IMAGE:
        return extract_image(payload, name, engine)
    if media_kind == C.MEDIA_KIND_HTML:
        return extract_html(payload, name)
    if media_kind == C.MEDIA_KIND_PDF:
        direct = pdf_direct_text(payload)
        if len(direct.strip()) > C.TEXT_PDF_THRESHOLD:
            return extract_pdf_direct(direct, name)
        try:
            doc = M.decode_media(payload)
            texts = []
            for i, page in enumerate(doc.pages):
                text, err = extract_pdf_page(page, i, doc.n_pages, name, engine)
                if err is not None:
                    return None, err
                texts.append(text)
            return stitch_pdf_pages(texts)
        except Exception as e:
            return None, C.ERR_PDF_CRITICAL.format(err=e)
    return None, C.ERR_UNSUPPORTED


# ---------------------------------------------------------------------------
# document-level oracle
# ---------------------------------------------------------------------------

def extract_document(doc_id: str, spans: list, resolve, engine: M.OcrEngine) -> dict:
    """Extract one document. ``resolve(media_ref) -> bytes | None``.

    Returns {doc_id, spans_out, error}. Spans are processed in offset order
    (storage order is NOT trusted); one failing span rejects the document.
    """
    spans = sorted(S.spans_to_pylist(spans), key=lambda s: s["offset"])
    if not spans:
        return {"doc_id": doc_id, "spans_out": [],
                "error": C.ERR_EMPTY_FILE.format(name=doc_id)}
    out = []
    for sp in spans:
        if sp["kind"] == S.KIND_TEXT:
            out.append({"kind": S.KIND_TEXT, "text": sp["text"],
                        "media_ref": "", "offset": sp["offset"]})
            continue
        ref = sp["media_ref"]
        payload = resolve(ref)
        media_kind = ""
        if payload is not None:
            try:
                media_kind = M.decode_media_header(payload)["media_kind"]
            except Exception:
                media_kind = "corrupt"
        text, err = extract_media_span(media_kind, payload, ref, engine)
        if err is not None:
            return {"doc_id": doc_id, "spans_out": [], "error": err}
        out.append({"kind": S.KIND_MEDIA, "text": text,
                    "media_ref": ref, "offset": sp["offset"]})
    return {"doc_id": doc_id, "spans_out": out, "error": None}


def doc_text(spans_out: list) -> str:
    """Document text for the analysis stage: span texts in offset order."""
    return "\n".join(s["text"] for s in spans_out)


def analyze_document(row: dict, query) -> dict:
    """Analysis stage on one extracted doc (reference analyze_service.py:74-88)."""
    out = dict(row, score=None, seniority=None, summary=None)
    if row["error"] is not None:
        return out
    res = L.analyze(doc_text(row["spans_out"]), query)
    if isinstance(res, L.AnalysisError):
        out["error"] = res.error
        out["spans_out"] = row["spans_out"]
        return out
    out["score"] = res.score
    out["seniority"] = res.seniority
    out["summary"] = res.summary
    return out


def extract_table(docs: pa.Table, media_lookup: dict, query=None,
                  analyzed: bool = False) -> pa.Table:
    """Run the oracle over a whole documents table → EXTRACTED/ANALYZED table.

    Single-process by design — this is the semantics baseline the Ray
    pipeline must match, not a fast path.
    """
    engine = M.OcrEngine()
    resolve = media_lookup.get
    rows = [
        extract_document(d, s, resolve, engine)
        for d, s in zip(docs.column("doc_id").to_pylist(),
                        docs.column("spans").to_pylist())
    ]
    if analyzed:
        rows = [analyze_document(r, query) for r in rows]
        return pa.Table.from_pydict(
            {
                "doc_id": [r["doc_id"] for r in rows],
                "spans_out": [r["spans_out"] for r in rows],
                "error": [r["error"] for r in rows],
                "score": [r["score"] for r in rows],
                "seniority": [r["seniority"] for r in rows],
                "summary": [r["summary"] for r in rows],
            },
            schema=S.ANALYZED_SCHEMA,
        )
    return pa.Table.from_pydict(
        {
            "doc_id": [r["doc_id"] for r in rows],
            "spans_out": [r["spans_out"] for r in rows],
            "error": [r["error"] for r in rows],
        },
        schema=S.EXTRACTED_SCHEMA,
    )
