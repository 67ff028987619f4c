"""The Ray-Data-native extraction pipeline.

Physical plan (SURVEY §7.1), all stages streaming with backpressure:

    read (doc_id, spans)                               [sharded parquet/lance]
      → ExplodeStage          map_batches, pyarrow, actor pool
            vectorized span explosion (list_flatten/list_parent_indices) +
            per-media-page explosion so a 100-page doc parallelizes
            (the reference serializes pages in one request slot,
             ocr_service.py:94-117 — the north-rule skew source)
      → OcrStage              map_batches, pyarrow, actor pool (axis B)
            engine + media lookup loaded ONCE per actor in __init__;
            per-unit extraction via core.extract (shared with the oracle)
      → groupby(doc_id).map_groups(stitch)             [the ONE shuffle]
            sort by (offset, page_no) — order is DATA, never task order;
            page-marker stitching; first-error-wins doc rejection
      → ScorerStage           map_batches, actor pool (optional analysis)
      → rank: sort(score desc).limit(5)                [query mode only]

Scale notes (100 TB / 10^12 docs):
- the media broadcast dict becomes ``ShardedParquetMediaStore``: OCR actors
  resolve refs against hash-sharded sidecar files instead of one dict; the
  explode stage then defers page counting to a header peek inside the OCR
  actor (two-phase explode) so no global meta dict is required.
- the groupby(doc_id) shuffle carries ONLY extracted text + tiny metadata —
  media payloads never cross the shuffle boundary (they are dropped at the
  OCR stage output), so shuffle volume ≈ output text size, not input size.
- skewed multi-page docs are already page-parallel before the shuffle;
  group size is bounded by pages×text, not payload bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import config as C
from ..core import extract as X
from ..core import llm as L
from ..core import media as M
from ..core import schema as S
from .io import MediaStore

# unit kinds produced by the explode stage (pre-resolved oracle dispatch)
U_TEXT = "text"
U_EMPTY_DOC = "empty_doc"
U_IMAGE = "image"
U_PDF_DIRECT = "pdf_direct"
U_PDF_PAGE = "pdf_page"
U_BAD_REF = "bad_ref"
U_EMPTY_PAYLOAD = "empty_payload"
U_UNSUPPORTED = "unsupported"


from ..common import cached_broadcast as _cached_broadcast


def make_explode_fn(store: MediaStore):
    """Stateless explode stage (elastic tasks, no reserved actor CPUs — it is
    a cheap vectorized reshape); the meta broadcast is fetched once per
    worker process via the module cache."""
    meta_ref = store.meta_ref

    def explode(batch: pa.Table) -> pa.Table:
        return _explode_batch(batch, _cached_broadcast(meta_ref))

    return explode


class ExplodeStage:
    """Class form of the explode stage (used directly in unit tests)."""

    def __init__(self, store: MediaStore):
        self.meta = store.get_meta()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _explode_batch(batch, self.meta)


def _explode_batch(batch: pa.Table, meta: dict) -> pa.Table:
        spans = batch.column("spans").combine_chunks()
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.chunk(0) if spans.num_chunks else pa.array([], spans.type)
        doc_ids = batch.column("doc_id").combine_chunks()
        n_spans = pc.list_value_length(spans).fill_null(0)
        parent = pc.list_parent_indices(spans)
        flat = pc.list_flatten(spans)

        f_doc = pc.take(doc_ids, parent)
        f_nspans = pc.take(n_spans, parent)
        f_kind = flat.field("kind")
        f_text = flat.field("text")
        f_ref = flat.field("media_ref")
        f_off = flat.field("offset")

        n = len(flat)
        unit = np.full(n, U_TEXT, dtype=object)
        n_pages = np.ones(n, dtype=np.int32)
        kinds = f_kind.to_numpy(zero_copy_only=False)
        media_idx = np.nonzero(kinds == S.KIND_MEDIA)[0]
        if media_idx.size:
            refs = f_ref.to_numpy(zero_copy_only=False)
            get = meta.get
            for i in media_idx:  # dict lookups only; payload untouched here
                m = get(refs[i])
                if m is None:
                    unit[i] = U_BAD_REF
                else:
                    unit[i] = m[0]
                    n_pages[i] = m[1]

        # page explosion: pdf_page units repeat n_pages times
        lengths = np.where(unit == U_PDF_PAGE, np.maximum(n_pages, 1), 1)
        idx = np.repeat(np.arange(n), lengths)
        starts = np.cumsum(lengths) - lengths
        page_no = (np.arange(idx.size) - starts[idx]).astype(np.int32)
        u = unit[idx]
        page_no[u == U_TEXT] = S.PAGE_TEXT
        page_no[u == U_PDF_DIRECT] = S.PAGE_DIRECT

        take_idx = pa.array(idx)
        cols = {
            "doc_id": pc.take(f_doc, take_idx),
            "offset": pc.take(f_off, take_idx),
            "kind": pc.take(f_kind, take_idx),
            "text": pc.take(f_text, take_idx),
            "media_ref": pc.take(f_ref, take_idx),
            "unit": pa.array(u, type=pa.string()),
            "page_no": pa.array(page_no),
            "n_pages": pc.take(pa.array(n_pages), take_idx),
            "n_spans": pc.take(f_nspans, take_idx).cast(pa.int32()),
        }
        out = pa.table(cols)

        # empty docs produce no flat rows — emit sentinel rows so they
        # survive to the stitcher as error rows (never dropped silently)
        empty_sel = pc.equal(n_spans, 0)
        if pc.any(empty_sel).as_py():
            empty_ids = pc.filter(doc_ids, empty_sel)
            ne = len(empty_ids)
            empty_tbl = pa.table(
                {
                    "doc_id": empty_ids,
                    "offset": pa.array(np.zeros(ne, dtype=np.int32)),
                    "kind": pa.array([""] * ne),
                    "text": pa.array([""] * ne),
                    "media_ref": pa.array([""] * ne),
                    "unit": pa.array([U_EMPTY_DOC] * ne),
                    "page_no": pa.array(np.full(ne, -3, dtype=np.int32)),
                    "n_pages": pa.array(np.zeros(ne, dtype=np.int32)),
                    "n_spans": pa.array(np.zeros(ne, dtype=np.int32)),
                }
            )
            out = pa.concat_tables([out.cast(empty_tbl.schema), empty_tbl])
        return out


class OcrStage:
    """Stateful OCR stage (axis B): engine + media lookup in __init__, batched
    extraction in __call__. Mirrors the tesseract stage (ocr_service.py:42,116)
    with the application retry loop of analyze_service.py:61-69 (exceptions
    retry; semantic rejections return immediately)."""

    def __init__(self, store: MediaStore):
        self.lookup = store.get_lookup()
        self.engine = M.OcrEngine()

    def _unit(self, unit, ref, text, page_no, n_pages):
        if unit == U_TEXT:
            return text, None
        if unit == U_EMPTY_DOC:
            return "", None
        if unit == U_BAD_REF:
            return None, C.ERR_BAD_REF.format(ref=ref)
        if unit == U_EMPTY_PAYLOAD:
            return None, C.ERR_EMPTY_FILE.format(name=ref)
        if unit == U_UNSUPPORTED:
            return None, C.ERR_UNSUPPORTED
        payload = self.lookup.get(ref)
        if payload is None:
            return None, C.ERR_BAD_REF.format(ref=ref)
        if unit == U_IMAGE:
            return X.extract_image(payload, ref, self.engine)
        if unit == U_PDF_DIRECT:
            return X.extract_pdf_direct(X.pdf_direct_text(payload), ref)
        if unit == U_PDF_PAGE:
            try:
                page = M.get_media_page(payload, page_no)
            except Exception as e:
                return None, C.ERR_PDF_CRITICAL.format(err=e)
            return X.extract_pdf_page(page, page_no, n_pages, ref, self.engine)
        return None, C.ERR_UNSUPPORTED

    def __call__(self, batch: pa.Table) -> pa.Table:
        units = batch.column("unit").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        texts = batch.column("text").to_pylist()
        pages = batch.column("page_no").to_pylist()
        npages = batch.column("n_pages").to_pylist()
        out_text, errors = [], []
        for unit, ref, text, page_no, n_pages in zip(units, refs, texts, pages, npages):
            res = (None, "unreachable")
            for attempt in range(C.MAX_RETRIES):
                try:
                    res = self._unit(unit, ref, text, page_no, n_pages)
                    break
                except Exception as e:  # engine crash → retry (analyze_service.py:61-69)
                    if attempt == C.MAX_RETRIES - 1:
                        res = (None, C.ERR_IMAGE_PROCESS.format(name=ref, err=e))
            out_text.append(res[0])
            errors.append(res[1])
        return (
            batch.drop_columns(["text"])
            .append_column("out_text", pa.array(out_text, type=pa.string()))
            .append_column("error", pa.array(errors, type=pa.string()))
        )


def stitch_group(group: pa.Table) -> pa.Table:
    """Reassemble one document from its units (the post-shuffle reducer).

    Order comes from the (offset, page_no) DATA columns — execution order is
    never trusted. First error in (offset, page) order rejects the document,
    which equals the reference's sequential early-exit (ocr_service.py:94-117).
    """
    from itertools import groupby as it_groupby

    rows = group.sort_by([("offset", "ascending"), ("page_no", "ascending")]).to_pylist()
    doc_id = rows[0]["doc_id"]

    def emit(spans_out, error):
        return pa.Table.from_pydict(
            {"doc_id": [doc_id], "spans_out": [spans_out], "error": [error]},
            schema=S.EXTRACTED_SCHEMA,
        )

    if rows[0]["unit"] == U_EMPTY_DOC:
        return emit([], C.ERR_EMPTY_FILE.format(name=doc_id))

    n_spans = rows[0]["n_spans"]
    spans_out = []
    seen_offsets = 0
    for offset, rs in it_groupby(rows, key=lambda r: r["offset"]):
        rs = list(rs)
        seen_offsets += 1
        err_row = next((r for r in rs if r["error"] is not None), None)
        if err_row is not None:
            return emit([], err_row["error"])
        r0 = rs[0]
        if r0["unit"] == U_TEXT:
            spans_out.append(
                {"kind": S.KIND_TEXT, "text": r0["out_text"], "media_ref": "",
                 "offset": offset}
            )
        elif r0["unit"] in (U_IMAGE, U_PDF_DIRECT):
            spans_out.append(
                {"kind": S.KIND_MEDIA, "text": r0["out_text"],
                 "media_ref": r0["media_ref"], "offset": offset}
            )
        else:  # U_PDF_PAGE
            if len(rs) != r0["n_pages"]:
                raise RuntimeError(
                    f"stitch lineage violation: doc {doc_id} offset {offset} "
                    f"expected {r0['n_pages']} pages, got {len(rs)}"
                )
            text, err = X.stitch_pdf_pages([r["out_text"] for r in rs])
            if err is not None:
                return emit([], err)
            spans_out.append(
                {"kind": S.KIND_MEDIA, "text": text,
                 "media_ref": r0["media_ref"], "offset": offset}
            )
    if seen_offsets != n_spans:
        raise RuntimeError(
            f"stitch lineage violation: doc {doc_id} expected {n_spans} spans, "
            f"got {seen_offsets}"
        )
    return emit(spans_out, None)


class ScorerStage:
    """Analysis stage (reference L1, llm_service.py:26-156): deterministic
    stand-in model + verbatim M11 parser, batched over stitched docs."""

    def __init__(self, query):
        self.query = query

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = {k: [] for k in ("doc_id", "spans_out", "error", "score",
                               "seniority", "summary")}
        for r in rows:
            a = X.analyze_document(r, self.query)
            for k in out:
                out[k].append(a[k])
        return pa.Table.from_pydict(out, schema=S.ANALYZED_SCHEMA)


def extraction_pipeline(
    docs_ds,
    store: MediaStore,
    *,
    batch_size: int = C.OCR_BATCH_SIZE,
    ocr_concurrency=C.OCR_CONCURRENCY,
    analyzed: bool = False,
    query=None,
    scorer_concurrency: int = 2,
):
    """Build the lazy extraction Dataset. Consumers decide materialization.

    CPU budget note: only the OCR and scorer stages reserve actors
    (ocr_concurrency + scorer_concurrency CPUs); explode runs as elastic
    tasks so read/shuffle/write always have CPUs left — an all-actor plan
    can deadlock a small session.
    """
    exploded = docs_ds.map_batches(
        make_explode_fn(store),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    ocred = exploded.map_batches(
        OcrStage,
        fn_constructor_args=(store,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=ocr_concurrency,
    )
    stitched = ocred.groupby("doc_id").map_groups(
        stitch_group, batch_format="pyarrow"
    )
    if not analyzed:
        return stitched
    return stitched.map_batches(
        ScorerStage,
        fn_constructor_args=(query,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=scorer_concurrency,
    )


def rank_topk(analyzed_ds, k: int = C.TOP_K):
    """Query-mode ranking (reference analysis.py:541-545): successful rows
    only, score desc, top-k; doc_id tiebreak for determinism (the reference's
    completion-order ties are nondeterministic)."""
    ok = analyzed_ds.map_batches(
        lambda t: t.filter(pc.is_null(t["error"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return ok.sort(["score", "doc_id"], descending=[True, False]).limit(k)
