"""Deterministic synthetic interleaved-document corpus (FIXTURES.md families).

Two entry points:

- ``generate_corpus(n_docs, seed)`` — standalone fixture corpus cycling the
  families of FIXTURES.md (mirrors the reference's manual corpus under
  /root/reference/tests/curriculos/: text PDFs, PNG resumes, scanned
  multi-page PDFs, cake-recipe negatives, plus north-rule skew cases).
- ``corpus_from_documents(tbl, repeat)`` — derives an interleaved corpus
  deterministically from the driver's ``documents.parquet`` (doc_id, text)
  so bench scale follows the testdata scale factor.

All randomness is seeded per-doc from a stable CRC of the doc id — no
wall-clock, no process-salted ``hash()`` — so the same corpus is produced in
every process (required for the two-parallelism-level benchmark and for
checkpoint-resume idempotence).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from . import html as H
from . import media as M
from . import schema as S

_VOCAB = (
    "python java sql spark ray data backend frontend devops docker kubernetes "
    "terraform aws azure gcp api rest graphql microservices linux git ci cd "
    "postgres mongodb redis kafka airflow pandas numpy pytorch tensorflow "
    "engenheiro desenvolvedor experiencia projetos equipe lideranca agile scrum"
).split()

FAMILIES = (
    "text_only",
    "media_only_single",
    "interleaved",
    "multipage_media",
    "below_threshold",
    "negative_nonresume",
    "flaky_validation",
    "empty_doc",
    "bad_ref",
    "html_page",
)

#: bump when _build_doc / family content changes — keys the derived-corpus
#: disk cache (engine/io.py) so stale cached corpora are never served
CORPUS_VERSION = 3  # v3: docs carry media_shard (two-phase explode)


def _rng_for(doc_id: str) -> np.random.Generator:
    return np.random.default_rng(zlib.crc32(doc_id.encode("utf-8")))


def _salad(rng: np.random.Generator, n_words: int, resume: bool) -> str:
    words = [_VOCAB[i] for i in rng.integers(0, len(_VOCAB), size=max(1, n_words))]
    body = " ".join(words)
    if resume:
        return f"{M.RESUME_MARKER}\nNome: Candidato {rng.integers(0, 9999)}\n{body}"
    return f"RECEITA DE BOLO\nIngredientes: {body}"


def _media_ref(doc_id: str, k: int) -> str:
    return f"{doc_id}/m{k}"


def _image_media(doc_id: str, k: int, page_text: str):
    """One-page image media (PNG-resume analog)."""
    ref = _media_ref(doc_id, k)
    page = M.render_page(page_text, zlib.crc32(ref.encode()))
    payload = M.encode_media("image", [page])
    return ref, {"media_ref": ref, "payload": payload, "media_kind": "image", "n_pages": 1}


def _html_media(doc_id: str, k: int, body_text: str):
    """HTML media: a synthetic crawl page (seeded nav/sidebar/ads/cookie
    boilerplate, core/html.wrap_page) whose main content is body_text;
    extraction must strip the boilerplate and recover body_text exactly."""
    ref = _media_ref(doc_id, k)
    page = H.wrap_page(ref, body_text).encode("utf-8")
    payload = M.encode_media("html", [page])
    return ref, {"media_ref": ref, "payload": payload, "media_kind": "html",
                 "n_pages": 1}


def _pdf_media(doc_id: str, k: int, page_texts: list, direct_text: str = ""):
    """PDF media: direct_text simulates the PDF text layer (fitz path M4);
    pages are the rasterized fallback (convert_from_bytes path M6)."""
    ref = _media_ref(doc_id, k)
    pages = [
        M.render_page(t, zlib.crc32(f"{ref}/p{i}".encode()))
        for i, t in enumerate(page_texts)
    ]
    payload = M.encode_media("pdf", pages, direct_text=direct_text)
    return ref, {
        "media_ref": ref,
        "payload": payload,
        "media_kind": "pdf",
        "n_pages": len(pages),
    }


def _build_doc(doc_id: str, family: str, rng: np.random.Generator, text_material=None):
    """Return (spans:list[dict] in STORAGE order, media_rows:list[dict]).

    Storage order of spans is shuffled relative to offset for families that
    exercise the stitcher's sort-by-offset invariant.
    """
    spans: list[dict] = []
    media_rows: list[dict] = []

    def text_span(offset: int, txt: str):
        spans.append({"kind": "text", "text": txt, "media_ref": "", "offset": offset})

    def media_span(offset: int, ref: str):
        spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": offset})

    def salad(n_words: int, resume=True):
        if text_material:
            # derive from provided material deterministically; repeat the
            # material so the slice always reaches the requested length
            want = n_words * 6
            reps = max(3, want // max(1, len(text_material)) + 2)
            start = int(rng.integers(0, max(1, len(text_material) // 2)))
            body = (text_material * reps)[start : start + want]
            head = f"{M.RESUME_MARKER}\nNome: Candidato {rng.integers(0, 9999)}\n"
            return (head + body) if resume else ("RECEITA DE BOLO\n" + body)
        return _salad(rng, n_words, resume)

    if family == "text_only":
        n = int(rng.integers(3, 11))
        for off in range(n):
            text_span(off, salad(int(rng.integers(20, 60))))
    elif family == "media_only_single":
        ref, row = _image_media(doc_id, 0, salad(int(rng.integers(40, 90))))
        media_rows.append(row)
        media_span(0, ref)
    elif family == "interleaved":
        n = int(rng.integers(4, 9))
        for off in range(n):
            if off % 2 == 0:
                text_span(off, salad(int(rng.integers(15, 40))))
            else:
                kind_pdf = bool(rng.integers(0, 2))
                if kind_pdf:
                    npg = int(rng.integers(2, 5))
                    ref, row = _pdf_media(
                        doc_id, off, [salad(int(rng.integers(30, 70))) for _ in range(npg)]
                    )
                else:
                    ref, row = _image_media(doc_id, off, salad(int(rng.integers(30, 70))))
                media_rows.append(row)
                media_span(off, ref)
        # storage order shuffled — stitcher must sort by offset
        order = rng.permutation(len(spans))
        spans = [spans[i] for i in order]
    elif family == "multipage_media":
        npg = int(rng.integers(3, 9))
        # direct text layer below the 200-char threshold → scanned path
        ref, row = _pdf_media(
            doc_id,
            0,
            [salad(int(rng.integers(40, 80))) for _ in range(npg)],
            direct_text="short scan artifact",
        )
        media_rows.append(row)
        media_span(0, ref)
        text_span(1, salad(int(rng.integers(10, 30))))
    elif family == "below_threshold":
        # PDF whose direct text exceeds the 200-char threshold → text-PDF path
        direct = salad(60)
        assert len(direct.strip()) > 200
        ref, row = _pdf_media(doc_id, 0, [salad(30)], direct_text=direct)
        media_rows.append(row)
        media_span(0, ref)
    elif family == "negative_nonresume":
        arm = int(rng.integers(0, 3))
        if arm == 0:  # non-resume image (doc_generico.png analog)
            ref, row = _image_media(doc_id, 0, salad(40, resume=False))
        elif arm == 1:  # non-resume text PDF (receita_bolo.pdf analog)
            direct = salad(60, resume=False)
            ref, row = _pdf_media(doc_id, 0, [salad(30, resume=False)], direct_text=direct)
        else:  # non-resume scanned PDF (receita_bolo_img.pdf analog)
            ref, row = _pdf_media(
                doc_id, 0, [salad(40, resume=False) for _ in range(2)]
            )
        media_rows.append(row)
        media_span(0, ref)
    elif family == "flaky_validation":
        # validator returns ValidationError; image path continues, pdf paths reject
        arm = int(rng.integers(0, 3))
        flagged = salad(40) + " " + M.VALERR_MARKER
        if arm == 0:
            ref, row = _image_media(doc_id, 0, flagged)
        elif arm == 1:
            direct = flagged + " " + salad(50)
            ref, row = _pdf_media(doc_id, 0, [salad(30)], direct_text=direct)
        else:
            ref, row = _pdf_media(doc_id, 0, [salad(30), flagged])
        media_rows.append(row)
        media_span(0, ref)
    elif family == "html_page":
        # crawl-page doc: text span + html media span (¼ are non-resume
        # pages so the post-extraction text validation reject arm runs)
        resume = int(rng.integers(0, 4)) != 0
        text_span(0, salad(int(rng.integers(10, 25))))
        ref, row = _html_media(
            doc_id, 1, salad(int(rng.integers(40, 90)), resume=resume)
        )
        media_rows.append(row)
        media_span(1, ref)
    elif family == "empty_doc":
        pass  # zero spans → error row, never an exception
    elif family == "bad_ref":
        media_span(0, f"{doc_id}/missing")
    else:
        raise ValueError(f"unknown family {family}")
    return spans, media_rows


def make_skew_doc(doc_id: str, n_pages: int = 100):
    """North-rule skew case: one huge multi-page doc among 1-page docs."""
    rng = _rng_for(doc_id)
    ref, row = _pdf_media(
        doc_id, 0, [_salad(rng, 50, True) for _ in range(n_pages)]
    )
    spans = [{"kind": "media", "text": "", "media_ref": ref, "offset": 0}]
    return spans, [row]


def generate_corpus(n_docs: int, seed: int = 42, with_skew: bool = True):
    """Build (documents: pa.Table, media: pa.Table) cycling fixture families."""
    doc_ids, span_lists, media_rows = [], [], []
    for i in range(n_docs):
        doc_id = f"doc-{seed:04d}-{i:06d}"
        family = FAMILIES[i % len(FAMILIES)]
        spans, mrows = _build_doc(doc_id, family, _rng_for(doc_id))
        doc_ids.append(doc_id)
        span_lists.append(spans)
        media_rows.extend(mrows)
    if with_skew and n_docs >= len(FAMILIES):
        doc_id = f"doc-{seed:04d}-skew00"
        spans, mrows = make_skew_doc(doc_id)
        doc_ids.append(doc_id)
        span_lists.append(spans)
        media_rows.extend(mrows)
    docs = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": span_lists}, schema=S.DOCUMENTS_SCHEMA
    )
    media = _media_table(media_rows)
    return docs, media


#: Families used when deriving from the testdata documents table — only the
#: well-formed ones (negatives/error families stay in the fixture corpus so
#: bench throughput measures extraction, not error paths).
_DERIVE_FAMILIES = (
    "text_only",
    "media_only_single",
    "interleaved",
    "multipage_media",
    "below_threshold",
    "html_page",
)


def corpus_from_documents(tbl: pa.Table, repeat: int = 1):
    """Derive an interleaved corpus from the driver's documents table.

    ``tbl`` needs columns (doc_id, text). Each source row yields ``repeat``
    interleaved docs; family assignment and content are pure functions of the
    derived doc id, so every process regenerates the identical corpus.
    """
    src_ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    doc_ids, span_lists, media_rows = [], [], []
    for sid, text in zip(src_ids, texts):
        for r in range(repeat):
            doc_id = f"doc-{sid:08d}-r{r:02d}"
            rng = _rng_for(doc_id)
            family = _DERIVE_FAMILIES[
                zlib.crc32(doc_id.encode()) % len(_DERIVE_FAMILIES)
            ]
            spans, mrows = _build_doc(
                doc_id, family, rng, text_material=(text or "texto vazio padrao")
            )
            doc_ids.append(doc_id)
            span_lists.append(spans)
            media_rows.extend(mrows)
    docs = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": span_lists}, schema=S.DOCUMENTS_SCHEMA
    )
    return docs, _media_table(media_rows)


def _media_table(media_rows: list) -> pa.Table:
    if not media_rows:
        return pa.Table.from_pydict(
            {"media_ref": [], "payload": [], "media_kind": [], "n_pages": []},
            schema=S.MEDIA_SCHEMA,
        )
    return pa.Table.from_pydict(
        {
            "media_ref": [r["media_ref"] for r in media_rows],
            "payload": [r["payload"] for r in media_rows],
            "media_kind": [r["media_kind"] for r in media_rows],
            "n_pages": [r["n_pages"] for r in media_rows],
        },
        schema=S.MEDIA_SCHEMA,
    )
