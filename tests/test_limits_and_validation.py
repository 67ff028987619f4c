"""Limits (payload size cap), query validation, jaccard-verified dedup."""

import pyarrow as pa
import pytest

from resume_ocr_ray import config as C
from resume_ocr_ray.core import extract, llm, media as M
from resume_ocr_ray.engine import io as EIO, pipeline as P
from resume_ocr_ray.ops import dedup as D


def test_oversize_payload_error_row_oracle_and_pipeline(ray_session):
    import ray.data as rd

    big_page = M.render_page("CURRICULUM VITAE " + "x" * (C.MAX_MEDIA_BYTES), 1)
    payload = M.encode_media("image", [big_page])
    assert len(payload) > C.MAX_MEDIA_BYTES
    media = pa.Table.from_pydict(
        {"media_ref": ["big/m0"], "payload": [payload],
         "media_kind": ["image"], "n_pages": [1]},
        schema=__import__("resume_ocr_ray.core.schema", fromlist=["MEDIA_SCHEMA"]).MEDIA_SCHEMA,
    )
    docs = pa.Table.from_pydict(
        {"doc_id": ["big"],
         "spans": [[{"kind": "media", "text": "", "media_ref": "big/m0", "offset": 0}]]},
        schema=__import__("resume_ocr_ray.core.schema", fromlist=["DOCUMENTS_SCHEMA"]).DOCUMENTS_SCHEMA,
    )
    # oracle
    lookup = {"big/m0": payload}
    r = extract.extract_document("big", docs.column("spans").to_pylist()[0],
                                 lookup.get, M.OcrEngine())
    assert r["error"] == C.ERR_TOO_LARGE.format(name="big/m0")
    # pipeline
    store = EIO.MediaStore.from_table(media)
    out = P.extraction_pipeline(
        rd.from_arrow(docs), store, ocr_concurrency=2
    ).take_all()
    assert out[0]["error"] == r["error"]


def test_validate_query():
    assert llm.validate_query("desenvolvedor backend python") is True
    assert llm.validate_query("backend pleno") is True
    assert llm.validate_query("x") is False
    assert llm.validate_query("") is False
    assert llm.validate_query("12345 678") is False


def test_minhash_verified_jaccard(ray_session):
    import ray.data as rd

    # non-cyclic text so the shingle set is rich; one small edit → high Jaccard
    words = [f"w{i}" for i in range(120)]
    base = " ".join(words)
    edited = " ".join(words[:60] + ["CHANGED"] + words[61:])
    tbl = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [base, edited, "totally different words here " * 20],
        }
    )
    assert D.jaccard(base, edited) > 0.5
    out = D.minhash_verified(rd.from_arrow(tbl), threshold=0.5).to_pandas()
    assert set(map(tuple, out[["a", "b"]].to_numpy())) == {(1, 2)}
    assert (out["jaccard"] >= 0.5).all()


def test_write_documents_round_trip(ray_session, tmp_path):
    """write_documents (parquet arm in-sandbox; lance arm is the gated
    seam) round-trips through read_documents unchanged."""
    import ray.data as rd

    from resume_ocr_ray.core import corpus
    from resume_ocr_ray.engine import io as EIO

    docs, _ = corpus.generate_corpus(12, seed=9)
    out = EIO.write_documents(
        rd.from_arrow(docs), str(tmp_path / "docs_out")
    )
    back = EIO.read_documents(out).to_pandas().sort_values("doc_id")
    orig = docs.to_pandas().sort_values("doc_id")
    assert list(back["doc_id"]) == list(orig["doc_id"])
    assert [len(s) for s in back["spans"]] == [len(s) for s in orig["spans"]]


# ---- strict request-level validation (reference utils.py:27-47) ------------


def _mini_corpus(tmp_path, n=5, mutate_media=None, mutate_docs=None):
    """Write an n-doc corpus to tmp_path/corpus; optional table mutators
    run before the write (simulating invalid inputs)."""
    from resume_ocr_ray.core import corpus

    docs, media = corpus.generate_corpus(n, seed=7)
    if mutate_docs is not None:
        docs = mutate_docs(docs)
    if mutate_media is not None:
        media = mutate_media(media)
    out = str(tmp_path / "corpus")
    EIO.write_corpus(out, docs, media, num_shards=2)
    return out


def test_strict_request_valid_corpus(tmp_path):
    from resume_ocr_ray.engine.job import strict_validate_request

    out = _mini_corpus(tmp_path, n=5)
    assert strict_validate_request(out, max_files=20) is None


def test_strict_request_count_cap_413(tmp_path):
    """Reference: > MAX_FILES files → 413 on the WHOLE request
    (utils.py:33-34)."""
    from resume_ocr_ray.engine.job import strict_validate_request

    out = _mini_corpus(tmp_path, n=21)
    status, detail = strict_validate_request(out)  # default cap = 20
    assert status == 413
    assert "O número máximo de arquivos é 20" in detail
    # looser cap accepts the same corpus
    assert strict_validate_request(out, max_files=25) is None


def test_strict_request_empty_and_blank_name_422(tmp_path):
    from resume_ocr_ray.engine.job import strict_validate_request

    out = _mini_corpus(
        tmp_path, n=1,
        mutate_docs=lambda d: d.slice(0, 0),
        mutate_media=lambda m: m.slice(0, 0),
    )
    assert strict_validate_request(out) == (
        422, "Pelo menos um arquivo deve ser enviado.")

    def blank_first(d):
        ids = d.column("doc_id").to_pylist()
        ids[0] = "  "
        return d.set_column(0, "doc_id", pa.array(ids, pa.string()))

    out2 = _mini_corpus(tmp_path.joinpath("b"), n=3, mutate_docs=blank_first)
    status, detail = strict_validate_request(out2)
    assert status == 422 and "sem nome" in detail


def test_strict_request_bad_kind_415_and_oversize_413(tmp_path):
    """Unsupported media kind → 415; oversize payload → 413 — both fail
    the whole batch (reference utils.py:40-47), and the check works with
    or without the media_meta sidecar (none is written here)."""
    from resume_ocr_ray import config as C
    from resume_ocr_ray.engine.job import strict_validate_request

    def bad_kind(m):
        kinds = m.column("media_kind").to_pylist()
        kinds[0] = "docx"
        i = m.schema.get_field_index("media_kind")
        return m.set_column(i, "media_kind", pa.array(kinds, pa.string()))

    out = _mini_corpus(tmp_path, n=3, mutate_media=bad_kind)
    status, detail = strict_validate_request(out)
    assert status == 415 and "não é suportado" in detail

    def oversize(m):
        pays = m.column("payload").to_pylist()
        pays[0] = b"\x00" * (C.MAX_MEDIA_BYTES + 1)
        i = m.schema.get_field_index("payload")
        return m.set_column(i, "payload", pa.array(pays, pa.binary()))

    out2 = _mini_corpus(tmp_path.joinpath("big"), n=3, mutate_media=oversize)
    status, detail = strict_validate_request(out2)
    assert status == 413 and "muito grande" in detail and "10MB" in detail


def test_strict_request_job_exit_codes(tmp_path):
    """--strict-request on engine.job: violation → mapped exit code +
    http_status in the summary JSON, BEFORE any Ray work."""
    import io as _io
    import json
    from contextlib import redirect_stdout

    from resume_ocr_ray.engine import job as J

    out = _mini_corpus(tmp_path, n=21)
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = J.main([
            "--input", out, "--out", str(tmp_path / "o"),
            "--strict-request",
        ])
    payload = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rc == 4  # 413 analog
    assert payload["http_status"] == 413
    assert payload["status"] == "invalid"
