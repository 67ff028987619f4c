"""Unit tests: media codec, preprocessing fallback, stand-in engines, parser."""

import pytest

from resume_ocr_ray import config as C
from resume_ocr_ray.core import llm as L
from resume_ocr_ray.core import media as M


def test_page_roundtrip():
    txt = "CURRICULUM VITAE\nNome: Alice\npython spark ray áçé 中文"
    page = M.render_page(txt, 123)
    assert M.decode_page_text(page) == txt
    # deterministic across calls
    assert M.render_page(txt, 123) == page
    # preprocessing strips noise but preserves decodability
    clean = M.preprocess_page(page)
    assert clean.startswith(M.MAGIC_CLEAN)
    assert M.decode_page_text(clean) == txt


def test_preprocess_fallback_returns_original():
    # reference parity: preprocess failure → original unmodified (M7)
    garbage = b"\x00\x01notanimage"
    assert M.preprocess_page(garbage) == garbage


def test_ocr_engine_decodes_and_raises():
    eng = M.OcrEngine()
    page = M.render_page("hello ocr", 7)
    assert eng.image_to_string(page) == "hello ocr"
    with pytest.raises(M.OcrDecodeError):
        eng.image_to_string(b"garbage-bytes")


def test_media_payload_roundtrip_and_page_slice():
    pages = [M.render_page(f"page {i}", i) for i in range(4)]
    payload = M.encode_media("pdf", pages, direct_text="layer")
    hdr = M.decode_media_header(payload)
    assert hdr == {"media_kind": "pdf", "n_pages": 4, "direct_text": "layer"}
    doc = M.decode_media(payload)
    assert doc.pages == pages
    for i in range(4):
        assert M.get_media_page(payload, i) == pages[i]
    with pytest.raises(IndexError):
        M.get_media_page(payload, 4)


def test_validators_tristate():
    ok = M.render_page("CURRICULUM VITAE ok", 1)
    bad = M.render_page("RECEITA DE BOLO", 2)
    err = M.render_page(f"CURRICULUM VITAE {M.VALERR_MARKER}", 3)
    assert M.validate_image_content(ok, "a") is True
    assert M.validate_image_content(bad, "a") is False
    assert isinstance(M.validate_image_content(err, "a"), M.ValidationError)
    # undecodable page → ValidationError (model failure arm)
    assert isinstance(M.validate_image_content(b"xx", "a"), M.ValidationError)
    assert M.validate_text_content("CURRICULUM VITAE text", "a") is True
    assert M.validate_text_content("bolo", "a") is False
    # truncation: marker beyond 3000 chars is invisible to the validator
    far = "x" * C.VALIDATION_TEXT_TRUNC + M.RESUME_MARKER
    assert M.validate_text_content(far, "a") is False


def test_llm_parser_reference_rules():
    raw = (
        "**Feedback:**\n  Score: 7.5/10\n  Resumo: Bom candidato com experiência\n"
        "Extra_comments:\n nada\n"
    )
    res = L.parse_response(raw, query="backend")
    assert res.score == 7.5
    assert res.summary == "Bom candidato com experiência"
    # no-query mode: seniority string
    raw2 = "Feedback:\n Score: Pleno\n Resumo: Perfil consistente e detalhado\nExtra comments:\n-"
    res2 = L.parse_response(raw2, query=None)
    assert res2.seniority == "Pleno"
    # short summary → retry signal
    with pytest.raises(ValueError):
        L.parse_response("Feedback:\nScore: 1\nResumo: curto\nExtra_comments:", "q")


def test_llm_analyze_deterministic():
    text = "CURRICULUM VITAE python spark ray backend docker " * 10
    a = L.analyze(text, "python backend docker")
    b = L.analyze(text, "python backend docker")
    assert a == b
    assert a.score is not None and 0.0 <= a.score <= 10.0
    s = L.analyze(text, None)
    assert s.seniority in ("Júnior", "Pleno", "Sênior")


def test_vision_payload_m10_boundary():
    """M10 analog: every validated page crosses a base64 payload boundary
    (validation_service.py:31-45); for non-raster synthetic pages the
    round-trip is the identity, so validator verdicts are unchanged."""
    import base64

    from resume_ocr_ray.core import media as M

    page = b"\x01\x02synthetic-page-bytes\xff"
    payload = M.build_vision_payload(page)
    assert payload == base64.b64encode(page)  # no PIL in sandbox: pass-through
    assert base64.b64decode(payload) == page


def test_read_documents_jsonl_and_csv_round_trip(ray_session, tmp_path):
    """Format-sniffed sources: a JSONL/CSV documents table (spans as a JSON
    string column) parses back to the canonical schema and extracts
    identically to the parquet path."""
    import json

    import pandas as pd

    from resume_ocr_ray.core import corpus, extract
    from resume_ocr_ray.engine import io as EIO
    from resume_ocr_ray.engine import pipeline as P

    docs, media = corpus.generate_corpus(12, seed=9)
    flat = pd.DataFrame(
        {
            "doc_id": docs.column("doc_id").to_pylist(),
            "spans": [json.dumps(s) for s in docs.column("spans").to_pylist()],
        }
    )
    jl = tmp_path / "docs.jsonl"
    flat.to_json(jl, orient="records", lines=True)
    cv = tmp_path / "docs.csv"
    flat.to_csv(cv, index=False)

    lookup = dict(
        zip(media.column("media_ref").to_pylist(),
            media.column("payload").to_pylist())
    )
    expected = {r["doc_id"]: r for r in extract.extract_table(docs, lookup).to_pylist()}
    store = EIO.MediaStore.from_table(media)
    for path in (str(jl), str(cv)):
        ds = P.extraction_pipeline(
            EIO.read_documents(path), store, batch_size=16, ocr_concurrency=1,
        )
        got = {r["doc_id"]: r for r in ds.to_pandas().to_dict("records")}
        assert set(got) == set(expected), path
        for d, e in expected.items():
            assert got[d]["error"] == e["error"], (path, d)


def test_write_partitioned_sink(ray_session, tmp_path):
    import os

    import ray.data as rd

    from resume_ocr_ray.engine import io as EIO

    import pyarrow as pa

    t = pa.table({"doc_id": [1, 2, 3, 4], "lang": ["en", "pt", "en", "de"],
                  "x": [1.0, 2.0, 3.0, 4.0]})
    out = EIO.write_partitioned(rd.from_arrow(t), str(tmp_path / "p"), by="lang")
    parts = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert parts == ["lang=de", "lang=en", "lang=pt"]
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == 4
