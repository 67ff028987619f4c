"""Oracle semantics tests: corpus generation + single-process extraction."""

import pyarrow as pa
import pytest

from resume_ocr_ray import config as C
from resume_ocr_ray.core import corpus, extract, media as M, schema as S


@pytest.fixture(scope="module")
def small_corpus():
    docs, media = corpus.generate_corpus(45, seed=7)
    lookup = dict(
        zip(media.column("media_ref").to_pylist(), media.column("payload").to_pylist())
    )
    return docs, media, lookup


def test_corpus_deterministic():
    d1, m1 = corpus.generate_corpus(18, seed=3)
    d2, m2 = corpus.generate_corpus(18, seed=3)
    assert d1.equals(d2)
    assert m1.equals(m2)
    d3, _ = corpus.generate_corpus(18, seed=4)
    assert not d3.equals(d1)


def test_corpus_schema(small_corpus):
    docs, media, _ = small_corpus
    assert docs.schema.equals(S.DOCUMENTS_SCHEMA)
    assert media.schema.equals(S.MEDIA_SCHEMA)


def _family_of(doc_id: str, idx: int) -> str:
    return corpus.FAMILIES[idx % len(corpus.FAMILIES)]


def test_oracle_families(small_corpus):
    docs, media, lookup = small_corpus
    out = extract.extract_table(docs, lookup)
    assert out.schema.equals(S.EXTRACTED_SCHEMA)
    rows = out.to_pylist()
    by_id = {r["doc_id"]: r for r in rows}
    for i, doc_id in enumerate(docs.column("doc_id").to_pylist()):
        if doc_id.endswith("skew00"):
            continue
        fam = _family_of(doc_id, i)
        r = by_id[doc_id]
        if fam in ("text_only", "media_only_single", "interleaved",
                   "multipage_media", "below_threshold"):
            assert r["error"] is None, (fam, doc_id, r["error"])
            assert len(r["spans_out"]) > 0
            # offset order is ascending in the output
            offs = [s["offset"] for s in r["spans_out"]]
            assert offs == sorted(offs)
            for s in r["spans_out"]:
                assert s["text"], (fam, doc_id, s)
        elif fam == "negative_nonresume":
            assert r["error"] is not None and "currículo" in r["error"]
            assert r["spans_out"] == []
        elif fam == "flaky_validation":
            # image arm: ValidationError → continue (success);
            # pdf arms: reject. Both must be deterministic, never raise.
            assert (r["error"] is None) or ("currículo" in r["error"]) or (
                "validação" in r["error"]
            )
        elif fam == "empty_doc":
            assert r["error"] == C.ERR_EMPTY_FILE.format(name=doc_id)
        elif fam == "bad_ref":
            assert r["error"] is not None and "referência" in r["error"]


def test_multipage_markers(small_corpus):
    docs, media, lookup = small_corpus
    # find a multipage_media doc
    ids = docs.column("doc_id").to_pylist()
    idx = corpus.FAMILIES.index("multipage_media")
    doc_id = ids[idx]
    spans = docs.column("spans").to_pylist()[idx]
    eng = M.OcrEngine()
    r = extract.extract_document(doc_id, spans, lookup.get, eng)
    assert r["error"] is None
    media_span = next(s for s in r["spans_out"] if s["kind"] == "media")
    n_pages = M.decode_media_header(lookup[media_span["media_ref"]])["n_pages"]
    for i in range(n_pages):
        assert f"\n--- Página {i+1} ---\n" in media_span["text"]


def test_below_threshold_uses_direct_text(small_corpus):
    docs, media, lookup = small_corpus
    ids = docs.column("doc_id").to_pylist()
    idx = corpus.FAMILIES.index("below_threshold")
    doc_id, spans = ids[idx], docs.column("spans").to_pylist()[idx]
    r = extract.extract_document(doc_id, spans, lookup.get, M.OcrEngine())
    assert r["error"] is None
    sp = r["spans_out"][0]
    direct = M.decode_media_header(lookup[sp["media_ref"]])["direct_text"]
    assert sp["text"] == direct  # text-PDF path, no page markers
    assert "--- Página" not in sp["text"]


def test_interleaved_storage_order_shuffled_but_output_sorted(small_corpus):
    docs, _, lookup = small_corpus
    ids = docs.column("doc_id").to_pylist()
    found_shuffled = False
    for i, doc_id in enumerate(ids):
        if _family_of(doc_id, i) != "interleaved" or doc_id.endswith("skew00"):
            continue
        spans = docs.column("spans").to_pylist()[i]
        offs = [s["offset"] for s in spans]
        if offs != sorted(offs):
            found_shuffled = True
        r = extract.extract_document(doc_id, spans, lookup.get, M.OcrEngine())
        if r["error"] is None:
            out_offs = [s["offset"] for s in r["spans_out"]]
            assert out_offs == sorted(offs)
    assert found_shuffled, "expected at least one interleaved doc with shuffled storage order"


def test_analyze_modes(small_corpus):
    docs, _, lookup = small_corpus
    out_q = extract.extract_table(docs, lookup, query="python spark backend", analyzed=True)
    assert out_q.schema.equals(S.ANALYZED_SCHEMA)
    for r in out_q.to_pylist():
        if r["error"] is None:
            assert r["score"] is not None and r["seniority"] is None
            assert len(r["summary"]) >= 10
    out_nq = extract.extract_table(docs, lookup, query=None, analyzed=True)
    for r in out_nq.to_pylist():
        if r["error"] is None:
            assert r["seniority"] in ("Júnior", "Pleno", "Sênior")
            assert r["score"] is None


def test_corpus_from_documents_deterministic():
    tbl = pa.table({"doc_id": [1, 2, 3], "text": ["alpha beta " * 30, "x", "gamma " * 50]})
    d1, m1 = corpus.corpus_from_documents(tbl, repeat=2)
    d2, m2 = corpus.corpus_from_documents(tbl, repeat=2)
    assert d1.equals(d2) and m1.equals(m2)
    assert d1.num_rows == 6
    lookup = dict(zip(m1.column("media_ref").to_pylist(), m1.column("payload").to_pylist()))
    out = extract.extract_table(d1, lookup)
    assert all(r["error"] is None for r in out.to_pylist())
