"""The correctness gate: Ray pipeline output == single-process oracle output,
per-document span-sequence equality on (kind, text, media_ref, order).
"""

import pyarrow as pa
import pytest

from resume_ocr_ray.core import corpus, extract
from resume_ocr_ray.engine import io as EIO
from resume_ocr_ray.engine import pipeline as P


def _span_key(spans):
    # equality on (kind, text, media_ref) in ORDER (offset-sorted output)
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def _by_doc(tbl: pa.Table) -> dict:
    return {r["doc_id"]: r for r in tbl.to_pylist()}


@pytest.fixture(scope="module")
def fixture_corpus():
    docs, media = corpus.generate_corpus(63, seed=11)  # 7 of each family + skew
    lookup = dict(
        zip(media.column("media_ref").to_pylist(), media.column("payload").to_pylist())
    )
    return docs, media, lookup


def _run_pipeline(docs, media, analyzed=False, query=None, stitch="repartition"):
    import ray.data as rd

    store = EIO.MediaStore.from_table(media)
    docs_ds = rd.from_arrow(docs).repartition(8)
    ds = P.extraction_pipeline(
        docs_ds, store, batch_size=32, ocr_concurrency=2,
        analyzed=analyzed, query=query, scorer_concurrency=1, stitch=stitch,
    )
    return pa.concat_tables(
        [b for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow")]
    )


@pytest.mark.parametrize("stitch", ["repartition", "groupby"])
def test_span_sequence_equality(ray_session, fixture_corpus, stitch):
    docs, media, lookup = fixture_corpus
    expected = extract.extract_table(docs, lookup)
    actual = _run_pipeline(docs, media, stitch=stitch)
    assert actual.num_rows == expected.num_rows == docs.num_rows
    exp, act = _by_doc(expected), _by_doc(actual)
    for doc_id, e in exp.items():
        a = act[doc_id]
        assert a["error"] == e["error"], (doc_id, a["error"], e["error"])
        assert _span_key(a["spans_out"]) == _span_key(e["spans_out"]), doc_id


def test_analyzed_equality_query_mode(ray_session, fixture_corpus):
    docs, media, lookup = fixture_corpus
    q = "python spark backend docker kubernetes"
    expected = extract.extract_table(docs, lookup, query=q, analyzed=True)
    actual = _run_pipeline(docs, media, analyzed=True, query=q)
    exp, act = _by_doc(expected), _by_doc(actual)
    for doc_id, e in exp.items():
        a = act[doc_id]
        assert (a["score"], a["seniority"], a["summary"], a["error"]) == (
            e["score"], e["seniority"], e["summary"], e["error"]
        ), doc_id


def test_analyzed_equality_noquery_mode(ray_session, fixture_corpus):
    docs, media, lookup = fixture_corpus
    expected = extract.extract_table(docs, lookup, query=None, analyzed=True)
    actual = _run_pipeline(docs, media, analyzed=True, query=None)
    exp, act = _by_doc(expected), _by_doc(actual)
    for doc_id, e in exp.items():
        assert act[doc_id]["seniority"] == e["seniority"], doc_id


def test_rank_topk(ray_session, fixture_corpus):
    import ray.data as rd

    docs, media, lookup = fixture_corpus
    q = "python spark backend"
    store = EIO.MediaStore.from_table(media)
    ds = P.extraction_pipeline(
        rd.from_arrow(docs), store, batch_size=32, ocr_concurrency=2,
        analyzed=True, query=q, scorer_concurrency=1,
    )
    top = P.rank_topk(ds, k=5).to_pandas()
    assert len(top) == 5
    assert list(top["score"]) == sorted(top["score"], reverse=True)
    # oracle top-k (same deterministic tiebreak)
    exp = extract.extract_table(docs, lookup, query=q, analyzed=True).to_pylist()
    ok = sorted(
        (r for r in exp if r["error"] is None),
        key=lambda r: (-r["score"], r["doc_id"]),
    )[:5]
    assert list(top["doc_id"]) == [r["doc_id"] for r in ok]


def test_sharded_media_store_equality(ray_session, tmp_path):
    """Scale path: extraction over ShardedParquetMediaStore (payloads read
    from shard files by the OCR actors, LRU-bounded; no monolithic media
    broadcast) matches the oracle span-for-span."""
    import ray.data as rd

    docs, media = corpus.generate_corpus(36, seed=33)
    docs_dir, media_dir = EIO.write_corpus(
        str(tmp_path / "c"), docs, media, num_shards=4
    )
    lookup = dict(
        zip(media.column("media_ref").to_pylist(), media.column("payload").to_pylist())
    )
    store = EIO.ShardedParquetMediaStore.from_dir(media_dir, max_cached_shards=2)
    ds = P.extraction_pipeline(
        rd.read_parquet(docs_dir), store, batch_size=32, ocr_concurrency=2,
    )
    actual = pa.concat_tables(
        [b for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow")]
    )
    expected = extract.extract_table(docs, lookup)
    exp, act = _by_doc(expected), _by_doc(actual)
    assert set(exp) == set(act)
    for doc_id, e in exp.items():
        a = act[doc_id]
        assert a["error"] == e["error"], (doc_id, a["error"], e["error"])
        assert _span_key(a["spans_out"]) == _span_key(e["spans_out"]), doc_id


def test_sharded_store_dangling_ref(ray_session, tmp_path):
    """Two-phase resolve: a media_ref absent from every shard must surface
    as the oracle's ERR_BAD_REF row (the crc fallback routes it to a shard
    whose meta does not contain it), never a crash or a dropped doc."""
    import ray.data as rd

    from resume_ocr_ray import config as C
    from resume_ocr_ray.core import schema as S

    docs, media = corpus.generate_corpus(8, seed=5)
    extra = pa.Table.from_pydict(
        {
            "doc_id": ["dang-1"],
            "spans": [[{"kind": "media", "text": "",
                        "media_ref": "nowhere/m99", "offset": 0}]],
        },
        schema=S.DOCUMENTS_SCHEMA,
    )
    docs = pa.concat_tables([docs.cast(extra.schema), extra])
    docs_dir, media_dir = EIO.write_corpus(
        str(tmp_path / "c"), docs, media, num_shards=4
    )
    store = EIO.ShardedParquetMediaStore.from_dir(media_dir)
    ds = P.extraction_pipeline(
        rd.read_parquet(docs_dir), store, batch_size=32, ocr_concurrency=2,
    )
    rows = {r["doc_id"]: r for r in ds.iter_rows()}
    assert len(rows) == docs.num_rows
    assert rows["dang-1"]["error"] == C.ERR_BAD_REF.format(ref="nowhere/m99")


def test_zero_page_pdf_matches_oracle(ray_session):
    """A schema-valid PDF with n_pages=0 and short direct text must produce
    the oracle's ERR_OCR_EMPTY (stitch_pdf_pages([])), not a phantom-page
    error (round-1 ADVICE: explode synthesized page 0 and diverged)."""
    from resume_ocr_ray.core import media as M
    from resume_ocr_ray.core import schema as S

    payload = M.encode_media("pdf", [], direct_text="curto")
    docs = pa.Table.from_pydict(
        {
            "doc_id": ["zp-1"],
            "spans": [[{"kind": "media", "text": "", "media_ref": "zp-1/m0",
                        "offset": 0}]],
        },
        schema=S.DOCUMENTS_SCHEMA,
    )
    media = pa.Table.from_pydict(
        {"media_ref": ["zp-1/m0"], "payload": [payload],
         "media_kind": ["pdf"], "n_pages": [0]},
        schema=S.MEDIA_SCHEMA,
    )
    lookup = {"zp-1/m0": payload}
    expected = extract.extract_table(docs, lookup)
    actual = _run_pipeline(docs, media, stitch="groupby")
    e, a = expected.to_pylist()[0], actual.to_pylist()[0]
    assert e["error"] is not None and "OCR" in e["error"]
    assert a["error"] == e["error"]
    assert a["spans_out"] == e["spans_out"] == []


def test_pipeline_from_documents_table(ray_session):
    """Derived-corpus path used by bench/queries: everything extracts clean."""
    import ray.data as rd

    src = pa.table(
        {"doc_id": list(range(12)), "text": [f"palavra{i} dados spark " * 20 for i in range(12)]}
    )
    docs, media = corpus.corpus_from_documents(src, repeat=2)
    lookup = dict(
        zip(media.column("media_ref").to_pylist(), media.column("payload").to_pylist())
    )
    expected = extract.extract_table(docs, lookup)
    actual = _run_pipeline(docs, media)
    exp, act = _by_doc(expected), _by_doc(actual)
    assert set(exp) == set(act)
    for doc_id in exp:
        assert exp[doc_id]["error"] is None
        assert _span_key(act[doc_id]["spans_out"]) == _span_key(exp[doc_id]["spans_out"])


def test_html_unit_matches_oracle(ray_session):
    """HTML media spans: boilerplate strip in the Ray pipeline equals the
    single-process oracle, both for recovered main text and for the
    non-resume validation reject arm."""
    from resume_ocr_ray.core import corpus, extract
    from resume_ocr_ray.engine import io as EIO
    from resume_ocr_ray.engine import pipeline as P

    rows, media_rows = [], []
    for i in range(8):
        doc_id = f"html-{i:04d}"
        spans, mrows = corpus._build_doc(
            doc_id, "html_page", corpus._rng_for(doc_id)
        )
        rows.append({"doc_id": doc_id, "spans": spans})
        media_rows.extend(mrows)
    import pyarrow as pa

    from resume_ocr_ray.core import schema as S

    docs = pa.Table.from_pydict(
        {"doc_id": [r["doc_id"] for r in rows],
         "spans": [r["spans"] for r in rows]},
        schema=S.DOCUMENTS_SCHEMA,
    )
    media = corpus._media_table(media_rows)
    assert "html" in set(media.column("media_kind").to_pylist())
    lookup = dict(zip(media.column("media_ref").to_pylist(),
                      media.column("payload").to_pylist()))
    expected = extract.extract_table(docs, lookup).to_pylist()
    import ray.data as rd

    store = EIO.MediaStore.from_table(media)
    actual = {
        r["doc_id"]: r
        for r in P.extraction_pipeline(
            rd.from_arrow(docs), store, batch_size=32, ocr_concurrency=2
        ).take_all()
    }
    n_err = 0
    for e in expected:
        a = actual[e["doc_id"]]
        assert a["error"] == e["error"]
        ka = [(s["kind"], s["text"], s["media_ref"], s["offset"])
              for s in (a["spans_out"] or [])]
        ke = [(s["kind"], s["text"], s["media_ref"], s["offset"])
              for s in (e["spans_out"] or [])]
        assert ka == ke, e["doc_id"]
        n_err += e["error"] is not None
    assert 0 < n_err < len(expected)  # both arms exercised


def test_duplicate_offsets_match_oracle(ray_session):
    """Two spans at the SAME offset: the oracle emits both (stable sort);
    the stitcher must group by span position, not offset (review finding —
    grouping by offset collapsed them and raised a lineage violation)."""
    from resume_ocr_ray.core import schema as S

    docs = pa.Table.from_pydict(
        {
            "doc_id": ["dup-1"],
            "spans": [[
                {"kind": "text", "text": "primeiro span", "media_ref": "",
                 "offset": 0},
                {"kind": "text", "text": "segundo span mesmo offset",
                 "media_ref": "", "offset": 0},
                {"kind": "text", "text": "terceiro", "media_ref": "",
                 "offset": 7},
            ]],
        },
        schema=S.DOCUMENTS_SCHEMA,
    )
    media = pa.Table.from_pydict(
        {"media_ref": [], "payload": [], "media_kind": [], "n_pages": []},
        schema=S.MEDIA_SCHEMA,
    )
    expected = extract.extract_table(docs, {})
    actual = _run_pipeline(docs, media, stitch="groupby")
    e, a = expected.to_pylist()[0], actual.to_pylist()[0]
    assert e["error"] is None and a["error"] is None
    assert len(e["spans_out"]) == 3
    assert _span_key(a["spans_out"]) == _span_key(e["spans_out"])


def test_unknown_kind_matches_oracle(ray_session):
    """A span whose kind is neither 'text' nor 'media' takes the media path
    on BOTH sides (oracle: everything != 'text' resolves the ref); with a
    dangling ref both reject the doc with the same error."""
    from resume_ocr_ray.core import schema as S

    docs = pa.Table.from_pydict(
        {
            "doc_id": ["uk-1"],
            "spans": [[
                {"kind": "Text", "text": "capitalized kind", "media_ref": "",
                 "offset": 0},
            ]],
        },
        schema=S.DOCUMENTS_SCHEMA,
    )
    media = pa.Table.from_pydict(
        {"media_ref": [], "payload": [], "media_kind": [], "n_pages": []},
        schema=S.MEDIA_SCHEMA,
    )
    expected = extract.extract_table(docs, {})
    actual = _run_pipeline(docs, media, stitch="groupby")
    e, a = expected.to_pylist()[0], actual.to_pylist()[0]
    assert e["error"] is not None
    assert a["error"] == e["error"]
    assert a["spans_out"] == e["spans_out"] == []
