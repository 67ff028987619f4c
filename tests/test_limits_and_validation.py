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
