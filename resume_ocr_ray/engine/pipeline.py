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
- media resolution is ``ShardedParquetMediaStore`` on the scale path
  (registry/bench/job): OCR actors read only the sharded sidecar files their
  refs point into (LRU-bounded) — no monolithic media broadcast. The
  remaining 10^12-doc step is deferring page counting to a header peek
  inside the OCR actor (two-phase explode) so no global meta dict exists.
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
U_MEDIA = "media_unresolved"  # phase-1 placeholder until the resolve stage
U_EMPTY_DOC = "empty_doc"
U_IMAGE = "image"
U_HTML = "html"  # DOM-heuristic main-content extraction (north-rule HTML arm)
U_PDF_DIRECT = "pdf_direct"
U_PDF_PAGE = "pdf_page"
U_PDF_EMPTY = "pdf_empty"  # zero-page scanned PDF → ERR_OCR_EMPTY (oracle parity)
U_BAD_REF = "bad_ref"
U_EMPTY_PAYLOAD = "empty_payload"
U_TOO_LARGE = "too_large"
U_UNSUPPORTED = "unsupported"


from ..common import cached_broadcast as _cached_broadcast


def make_explode_fn(store: MediaStore):
    """Explode stage factory (elastic stateless tasks): span flatten +
    media-meta resolve + page explosion in ONE array-level pass — the
    exploded table is materialized by a single take at the end (an earlier
    split into flatten/resolve/page-explode sub-stages each building an
    intermediate table measured ~0.5 s slower on the 10k-doc headline).

    Two meta strategies behind one resolver seam:
    - BROADCAST meta (MediaStore / eager sharded store): dict lookups
      against the session-broadcast {ref: (kind, n_pages[, shard])} map.
    - TWO-PHASE lazy metas (sharded store with ``meta_ref=None`` — the
      10^12-doc path): a row's shard comes from its ``media_shard`` column
      (stamped at corpus write) or ``crc32(ref) % n_shards`` for crc-placed
      layouts; that shard's meta is built by the requesting worker from the
      plasma-shared shard table and LRU-cached (``_shard_meta``). No
      ref-keyed global structure ever exists anywhere.
    """
    if getattr(store, "meta_ref", None) is not None:
        meta_ref = store.meta_ref

        def resolve(refs, shards, unit, n_pages, midx):
            _resolve_meta(
                _cached_broadcast(meta_ref), refs, unit, n_pages, midx
            )

    else:
        import zlib as _zlib

        registry = store.registry
        n_shards = len(store.shard_paths)
        max_cached = store.max_cached_shards
        # stable public cache key: the shard-path set identifies the store's
        # content (same paths ⇒ same dispatch metas), unlike the private
        # actor-handle id the cache used to key on
        store_key = _zlib.crc32(
            "\0".join(store.shard_paths).encode("utf-8")
        )

        def resolve(refs, shards, unit, n_pages, midx):
            for i in midx[shards[midx] < 0]:  # crc-placed layout fallback
                shards[i] = (
                    _zlib.crc32(str(refs[i]).encode("utf-8")) % n_shards
                )
            for sid in np.unique(shards[midx]):
                _resolve_meta(
                    _shard_meta(registry, store_key, int(sid), max_cached),
                    refs, unit, n_pages, midx[shards[midx] == sid],
                )

    def explode(batch: pa.Table) -> pa.Table:
        return _explode_core(batch, resolve)

    return explode


class ExplodeStage:
    """Class form of the explode stage (used directly in unit tests)."""

    def __init__(self, store: MediaStore):
        self._fn = make_explode_fn(store)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._fn(batch)


def _resolve_meta(meta, refs, unit, n_pages, idx) -> None:
    """Fill unit/n_pages for the media rows ``idx`` from a ref-keyed
    dispatch meta (dict lookups only; payload bytes untouched here)."""
    get = meta.get
    for i in idx:
        m = get(refs[i])
        if m is None:
            unit[i] = U_BAD_REF
        else:
            unit[i] = m[0]
            n_pages[i] = m[1]


def _explode_core(batch: pa.Table, resolve) -> pa.Table:
    """Vectorized span explosion + media resolve + page explosion.

    Parity with the oracle (extract.py:178): kind == 'text' is a text span;
    EVERYTHING else takes the media path (an unknown kind with a dangling
    ref becomes ERR_BAD_REF on both sides). Page explosion repeats resolved
    pdf_page rows n_pages times — the skew leveler: a 100-page doc becomes
    100 parallel unit rows. Empty docs emit sentinel rows so they survive
    to the stitcher as error rows (never dropped silently)."""
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
    kinds = f_kind.to_numpy(zero_copy_only=False)
    unit = np.where(kinds == S.KIND_TEXT, U_TEXT, U_MEDIA).astype(object)
    n_pages = np.ones(n, dtype=np.int32)
    # span position within its doc: the stitcher groups on this (offsets
    # may legally repeat; the oracle emits one span per INPUT span)
    counts = n_spans.to_numpy(zero_copy_only=False).astype(np.int64)
    par = parent.to_numpy(zero_copy_only=False)
    firsts = np.concatenate(([0], np.cumsum(counts)[:-1])) if counts.size else counts
    span_idx = (np.arange(n, dtype=np.int64) - firsts[par]).astype(np.int32)
    if "media_shard" in batch.column_names:
        shards = (
            pc.take(batch.column("media_shard").combine_chunks(), parent)
            .to_numpy(zero_copy_only=False)
            .astype(np.int32)
        )
    else:
        shards = np.full(n, -1, dtype=np.int32)

    midx = np.nonzero(unit == U_MEDIA)[0]
    if midx.size:
        refs = f_ref.to_numpy(zero_copy_only=False)
        resolve(refs, shards, unit, n_pages, midx)

    # page explosion: pdf_page units repeat n_pages times
    lengths = np.where(unit == U_PDF_PAGE, np.maximum(n_pages, 1), 1)
    idx = np.repeat(np.arange(n), lengths)
    starts = np.cumsum(lengths) - lengths
    page_no = (np.arange(idx.size) - starts[idx]).astype(np.int32)
    u = unit[idx]
    page_no[u == U_TEXT] = S.PAGE_TEXT
    page_no[u == U_PDF_DIRECT] = S.PAGE_DIRECT

    take_idx = pa.array(idx)
    out = pa.table(
        {
            "doc_id": pc.take(f_doc, take_idx),
            "offset": pc.take(f_off, take_idx),
            "kind": pc.take(f_kind, take_idx),
            "text": pc.take(f_text, take_idx),
            "media_ref": pc.take(f_ref, take_idx),
            "unit": pa.array(u, type=pa.string()),
            "span_idx": pa.array(span_idx[idx]),
            "page_no": pa.array(page_no),
            "n_pages": pa.array(n_pages[idx]),
            "n_spans": pc.take(f_nspans, take_idx).cast(pa.int32()),
            "media_shard": pa.array(shards[idx]),
        }
    )

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
                "span_idx": pa.array(np.zeros(ne, dtype=np.int32)),
                "page_no": pa.array(np.full(ne, -3, dtype=np.int32)),
                "n_pages": pa.array(np.zeros(ne, dtype=np.int32)),
                "n_spans": pa.array(np.zeros(ne, dtype=np.int32)),
                "media_shard": pa.array(np.full(ne, -1, dtype=np.int32)),
            }
        )
        out = pa.concat_tables([out.cast(empty_tbl.schema), empty_tbl])
    return out


#: per-worker LRU of per-shard dispatch metas for the lazy-meta resolve:
#: {(store shard-path crc, shard id): {ref: (unit_kind, n_pages)}}
_SHARD_META_CACHE: dict = {}


def _shard_meta(registry, store_key: int, sid: int, max_cached: int) -> dict:
    import ray
    from collections import OrderedDict

    from .io import build_media_meta

    global _SHARD_META_CACHE
    if not isinstance(_SHARD_META_CACHE, OrderedDict):
        _SHARD_META_CACHE = OrderedDict(_SHARD_META_CACHE)
    key = (store_key, sid)
    meta = _SHARD_META_CACHE.get(key)
    if meta is None:
        # The registry serves only the shard TABLE (zero-copy plasma map,
        # read from disk once per session); the dispatch meta is built HERE,
        # in the requesting worker. Building it in the registry actor
        # serialized ~n_shards meta builds through one process at session
        # warmup (measured ~0.5 s on a 64-shard corpus — visible against a
        # 3 s headline); per-worker builds are ~1 ms per shard, parallel,
        # and bounded by the same LRU as the payload path.
        meta = build_media_meta(
            ray.get(ray.get(registry.shard_ref.remote(sid)))
        )
        _SHARD_META_CACHE[key] = meta
        if len(_SHARD_META_CACHE) > max_cached:
            _SHARD_META_CACHE.popitem(last=False)
    else:
        _SHARD_META_CACHE.move_to_end(key)
    return meta


#: Exceptions the per-unit retry loop is allowed to absorb into a data-error
#: row: engine/codec failures on the DOCUMENT's own bytes. Anything else
#: (import errors, broadcast fetch failures, OOM) PROPAGATES so Ray fails and
#: retries the task — converting infrastructure failures into per-row errors
#: silently corrupts results at scale (observed with worker import errors).
import struct as _struct

_EXPECTED_OCR_ERRORS = (
    M.OcrDecodeError,
    ValueError,  # codec/json/unicode decode errors subclass this
    _struct.error,
    IndexError,
    KeyError,
)


class OcrStage:
    """Stateful OCR stage (axis B): engine + media lookup in __init__, batched
    extraction in __call__. Mirrors the tesseract stage (ocr_service.py:42,116)
    with the application retry loop of analyze_service.py:61-69 (expected
    engine exceptions retry with backoff; semantic rejections return
    immediately; unexpected exceptions propagate to Ray's task retry)."""

    #: decoded-page LRU: refs whose MediaDoc was already parsed keep their
    #: page list in the actor, so a P-page doc costs ONE payload scan instead
    #: of P prefix rescans (O(pages²) bytes → O(pages)). Page rows of a doc
    #: leave the explode stage consecutively, so locality is high.
    PAGE_CACHE_REFS = 64

    def __init__(self, store: MediaStore):
        self.lookup = store.get_lookup()
        self.engine = M.OcrEngine()
        from collections import OrderedDict

        self._pages = OrderedDict()

    def _get_pages(self, ref, payload):
        pages = self._pages.get(ref)
        if pages is None:
            pages = M.decode_media(payload).pages
            self._pages[ref] = pages
            if len(self._pages) > self.PAGE_CACHE_REFS:
                self._pages.popitem(last=False)
        else:
            self._pages.move_to_end(ref)
        return pages

    def _lookup_payload(self, ref, sid):
        if sid is not None and sid >= 0:
            return self.lookup.get(ref, sid=sid)
        return self.lookup.get(ref)

    def _unit(self, unit, ref, text, page_no, n_pages, sid=None):
        if unit == U_TEXT:
            return text, None
        if unit == U_EMPTY_DOC:
            return "", None
        if unit == U_BAD_REF:
            return None, C.ERR_BAD_REF.format(ref=ref)
        if unit == U_EMPTY_PAYLOAD:
            return None, C.ERR_EMPTY_FILE.format(name=ref)
        if unit == U_TOO_LARGE:
            return None, C.ERR_TOO_LARGE.format(name=ref)
        if unit == U_UNSUPPORTED:
            return None, C.ERR_UNSUPPORTED
        if unit == U_PDF_EMPTY:
            # zero-page scanned PDF: the oracle's stitch_pdf_pages([]) arm
            # (extract.py:99-107) — no page fetch, straight to ERR_OCR_EMPTY
            return None, C.ERR_OCR_EMPTY
        payload = self._lookup_payload(ref, sid)
        if payload is None:
            return None, C.ERR_BAD_REF.format(ref=ref)
        if unit == U_IMAGE:
            return X.extract_image(payload, ref, self.engine)
        if unit == U_HTML:
            return X.extract_html(payload, ref)
        if unit == U_PDF_DIRECT:
            return X.extract_pdf_direct(X.pdf_direct_text(payload), ref)
        if unit == U_PDF_PAGE:
            try:
                page = self._get_pages(ref, payload)[page_no]
            except _EXPECTED_OCR_ERRORS as e:
                return None, C.ERR_PDF_CRITICAL.format(err=e)
            return X.extract_pdf_page(page, page_no, n_pages, ref, self.engine)
        return None, C.ERR_UNSUPPORTED

    def __call__(self, batch: pa.Table) -> pa.Table:
        units_arr = batch.column("unit")
        is_text = pc.equal(units_arr, U_TEXT)
        if pc.all(is_text).as_py():
            # vectorized fast path: pure-text batch never enters Python rows
            return (
                batch.drop_columns(["text"])
                .append_column("out_text", batch.column("text"))
                .append_column(
                    "error", pa.nulls(batch.num_rows, type=pa.string())
                )
            )
        units = units_arr.to_numpy(zero_copy_only=False)
        media_idx = np.nonzero(units != U_TEXT)[0]
        refs = batch.column("media_ref").to_pylist()
        pages = batch.column("page_no").to_pylist()
        npages = batch.column("n_pages").to_pylist()
        # two-phase explode stamps the ref's shard on the row; single-phase
        # batches lack the column and fall back to the global-meta lookup
        sids = (
            batch.column("media_shard").to_pylist()
            if "media_shard" in batch.column_names
            else None
        )
        # text rows pass through vectorized; only media rows iterate
        out_text = batch.column("text").to_numpy(zero_copy_only=False).astype(object)
        errors = np.full(batch.num_rows, None, dtype=object)
        for i in media_idx:
            unit, ref, page_no, n_pages = units[i], refs[i], pages[i], npages[i]
            sid = sids[i] if sids is not None else None
            res = (None, "unreachable")
            for attempt in range(C.MAX_RETRIES):
                try:
                    res = self._unit(unit, ref, None, page_no, n_pages, sid=sid)
                    break
                except _EXPECTED_OCR_ERRORS as e:
                    # engine crash → backoff + retry (analyze_service.py:61-69);
                    # unexpected exceptions propagate → Ray task retry
                    if attempt == C.MAX_RETRIES - 1:
                        res = (None, C.ERR_IMAGE_PROCESS.format(name=ref, err=e))
                    else:
                        import time as _time

                        _time.sleep(C.RETRY_BACKOFF * (attempt + 1))
            out_text[i] = res[0]
            errors[i] = res[1]
        return (
            batch.drop_columns(["text"])
            .append_column("out_text", pa.array(out_text, type=pa.string()))
            .append_column("error", pa.array(errors, type=pa.string()))
        )


def _stitch_rows(doc_id: str, rows: list):
    """Reassemble one document from its unit rows (already sorted by
    (offset, span_idx, page_no)). Returns (spans_out, error).

    Order comes from the (offset, span_idx, page_no) DATA columns —
    execution order is never trusted. First error in (offset, page) order rejects the document,
    which equals the reference's sequential early-exit (ocr_service.py:94-117).
    """
    from itertools import groupby as it_groupby

    if rows[0]["unit"] == U_EMPTY_DOC:
        return [], C.ERR_EMPTY_FILE.format(name=doc_id)

    n_spans = rows[0]["n_spans"]
    spans_out = []
    seen_spans = 0
    # group by span_idx, NOT offset: offsets may legally repeat within a
    # doc, and the oracle emits one output span per input span (a stable
    # sort keeps equal-offset spans in input order on both sides)
    for _sidx, rs in it_groupby(rows, key=lambda r: r["span_idx"]):
        rs = list(rs)
        seen_spans += 1
        err_row = next((r for r in rs if r["error"] is not None), None)
        if err_row is not None:
            return [], err_row["error"]
        r0 = rs[0]
        offset = r0["offset"]
        if r0["unit"] == U_TEXT:
            spans_out.append(
                {"kind": S.KIND_TEXT, "text": r0["out_text"], "media_ref": "",
                 "offset": offset}
            )
        elif r0["unit"] in (U_IMAGE, U_PDF_DIRECT, U_HTML):
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
                return [], err
            spans_out.append(
                {"kind": S.KIND_MEDIA, "text": text,
                 "media_ref": r0["media_ref"], "offset": offset}
            )
    if seen_spans != n_spans:
        raise RuntimeError(
            f"stitch lineage violation: doc {doc_id} expected {n_spans} spans, "
            f"got {seen_spans}"
        )
    return spans_out, None


def stitch_group(group: pa.Table) -> pa.Table:
    """groupby(doc_id).map_groups reducer form (one doc per call)."""
    rows = group.sort_by(
        [("offset", "ascending"), ("span_idx", "ascending"),
         ("page_no", "ascending")]
    ).to_pylist()
    doc_id = rows[0]["doc_id"]
    spans_out, error = _stitch_rows(doc_id, rows)
    return pa.Table.from_pydict(
        {"doc_id": [doc_id], "spans_out": [spans_out], "error": [error]},
        schema=S.EXTRACTED_SCHEMA,
    )


def stitch_block(batch: pa.Table) -> pa.Table:
    """Hash-repartitioned stitch: ONE call per block, many docs per block
    (all units of a doc are co-located by repartition(keys=["doc_id"])).
    Amortizes per-group Python/table overhead ~50× vs map_groups."""
    if batch.num_rows == 0:
        return pa.Table.from_pydict(
            {"doc_id": [], "spans_out": [], "error": []}, schema=S.EXTRACTED_SCHEMA
        )
    rows = batch.sort_by(
        [("doc_id", "ascending"), ("offset", "ascending"),
         ("span_idx", "ascending"), ("page_no", "ascending")]
    ).to_pylist()
    out_ids, out_spans, out_err = [], [], []
    from itertools import groupby as it_groupby

    for doc_id, doc_rows in it_groupby(rows, key=lambda r: r["doc_id"]):
        spans_out, error = _stitch_rows(doc_id, list(doc_rows))
        out_ids.append(doc_id)
        out_spans.append(spans_out)
        out_err.append(error)
    return pa.Table.from_pydict(
        {"doc_id": out_ids, "spans_out": out_spans, "error": out_err},
        schema=S.EXTRACTED_SCHEMA,
    )


def _doc_texts_vectorized(spans_col) -> list:
    """Per-doc text (span texts joined with '\\n', offset order — spans_out
    is already offset-ordered by the stitcher) computed with Arrow kernels:
    the list<struct> column is never converted to Python rows."""
    spans = spans_col.combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.chunk(0) if spans.num_chunks else pa.array([], spans.type)
    flat_text = pc.list_flatten(spans).field("text")
    offsets = spans.offsets
    list_str = pa.ListArray.from_arrays(offsets, flat_text.fill_null(""))
    return pc.binary_join(list_str, "\n").to_pylist()


def _score_batch(batch: pa.Table, query) -> pa.Table:
    """Analysis over stitched docs. spans_out passes through as Arrow
    (zero-copy); only the model call itself runs per row over the joined
    doc text (the to_pylist/from_pydict round-trip of span structs cost more
    CPU than the model stand-in)."""
    errors = batch.column("error").to_pylist()
    texts = _doc_texts_vectorized(batch.column("spans_out"))
    score_col, senior_col, summary_col = [], [], []
    for i, (err, text) in enumerate(zip(errors, texts)):
        if err is not None:
            score_col.append(None)
            senior_col.append(None)
            summary_col.append(None)
            continue
        res = L.analyze(text, query)
        if isinstance(res, L.AnalysisError):
            errors[i] = res.error
            score_col.append(None)
            senior_col.append(None)
            summary_col.append(None)
        else:
            score_col.append(res.score)
            senior_col.append(res.seniority)
            summary_col.append(res.summary)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            batch.column("spans_out"),
            pa.array(errors, type=pa.string()),
            pa.array(score_col, type=pa.float64()),
            pa.array(senior_col, type=pa.string()),
            pa.array(summary_col, type=pa.string()),
        ],
        schema=S.ANALYZED_SCHEMA,
    )


def make_scorer_fn(query):
    """Analysis stage as ELASTIC stateless tasks (reference L1,
    llm_service.py:26-156: deterministic stand-in model + verbatim M11
    parser). The stand-in scorer's only state is the broadcast query scalar,
    so tasks are the right physical form — they soak up whatever CPUs the
    post-shuffle phase has free instead of pinning a pool that idles during
    the OCR phase. A REAL model scorer (weights loaded per worker) would use
    ``ScorerStage`` with ``concurrency=(1, k)`` instead."""

    def score(batch: pa.Table) -> pa.Table:
        return _score_batch(batch, query)

    return score


class ScorerStage:
    """Actor-pool form of the scorer (for real model-holding scorers and
    direct unit tests)."""

    def __init__(self, query):
        self.query = query

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _score_batch(batch, self.query)


def extraction_pipeline(
    docs_ds,
    store: MediaStore,
    *,
    batch_size: int = C.OCR_BATCH_SIZE,
    ocr_concurrency: int | None = None,
    analyzed: bool = False,
    query=None,
    scorer_concurrency: int | None = None,
    stitch: str = "auto",
    stitch_partitions: int | None = None,
):
    """Build the lazy extraction Dataset. Consumers decide materialization.

    ``stitch`` selects the reassembly shuffle:
    - "repartition": explicit hash repartition on doc_id
      (``repartition(P, keys=["doc_id"])``) then ONE stitch call per block
      over many co-located docs — the scalable path (per-group Python and
      per-group table construction amortized away; ~6× faster than groupby
      at 60k docs).
    - "groupby": ``groupby(doc_id).map_groups`` — one Python call per doc;
      the semantic baseline, fine for tiny inputs.
    - "auto" (default): repartition when the session has ≥4 CPUs, else
      groupby. Hash-shuffle finalize tasks reserve CPU + a large memory
      block and can deadlock a tiny session whose actor pools hold the rest
      (observed: all CPUs held, finalize pending forever); the 4-CPU case is
      safe ONLY because the zero-CPU aggregator override below removes the
      aggregators' reservation — ≤3 CPUs stays on the groupby path.

    CPU budget note: only the OCR and scorer stages reserve actors
    (ocr_concurrency + scorer_concurrency CPUs); explode runs as elastic
    tasks so read/shuffle/write always have CPUs left — an all-actor plan
    can deadlock a small session. Requested pool sizes are CLAMPED so at
    least one CPU always remains for plain tasks.
    """
    import ray as _ray

    _ncpu = (
        int(_ray.cluster_resources().get("CPU", 8))
        if _ray.is_initialized()
        else 8
    )
    budget = max(1, _ncpu - 1)
    _ocr_pool_pinned = ocr_concurrency is not None
    # Pool sizes scale WITH the session so both stages parallelize
    # proportionally at every cluster size (a fixed scorer pool made the
    # scorer the serial bottleneck at low parallelism: 1.6/4 cores busy).
    # Pools AUTOSCALE (concurrency=(1, k)): the repartition stitch is a
    # barrier, so the pipeline runs in phases — statically reserved pools sit
    # idle during the other phases and starve them (observed: 1.4/4 cores
    # busy). With (1, k) pools, CPUs flow to whichever stage has work.
    import math as _math

    # ceil, not round/int: at 4 CPUs round(0.8×3)=2 caps the OCR pool at 50%
    # of the node while 16 CPUs gets 75% — that quantization skews low-end
    # utilization (measured 2.3/4 busy cores) and distorts scaling ratios.
    # 0.9 of the budget: the OCR pool carries ~90% of pipeline compute, and
    # read/stitch/score tasks interleave on the remainder (measured at 16
    # CPUs, 40k docs: pool 12 → 14 actors cut 21.5 s → 20.0 s with no
    # starvation; the budget=ncpu-1 margin still guarantees a free CPU).
    if analyzed:
        if scorer_concurrency is None:
            scorer_concurrency = max(1, _math.ceil(budget * 0.55))
        if ocr_concurrency is None:
            ocr_concurrency = max(1, _math.ceil(budget * 0.9))
        scorer_concurrency = max(1, min(scorer_concurrency, budget))
        ocr_concurrency = max(1, min(ocr_concurrency, budget))
    else:
        if ocr_concurrency is None:
            ocr_concurrency = max(2, _math.ceil(budget * 0.9))
        ocr_concurrency = max(1, min(ocr_concurrency, budget))
    # make_explode_fn picks the meta strategy from the store: broadcast
    # dict, or — when the sharded store carries no global meta — lazy
    # per-shard metas resolved inside the task (the 10^12-doc path)
    exploded = docs_ds.map_batches(
        make_explode_fn(store),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    # Pool floor is a WORKLOAD HINT (GRAFT_OCR_MIN_ACTORS): long compute-
    # dense jobs want a pre-sized pool (the autoscaler's ramp averaged 6/12
    # actors over a 20 s burn run; min=max cut it 24.3 s → 13.4 s at 16
    # CPUs — the scaling bench sets "max"), while short jobs want SOME
    # elasticity: a full floor (28 pre-started actors) costs ~60+ core-s of
    # import/init and doubles a short headline, but a floor of 1 makes the
    # autoscaler's ramp the bottleneck on those same short runs (measured
    # sf0.1 10k docs: floor 1 → 2.6 s, floor 12 → 1.77 s at 32 CPUs;
    # 2.36 → 1.95 s at 8 CPUs; wash at 4 CPUs). Default floor is therefore
    # 0.4× the CPU budget — large enough to skip most of the ramp, small
    # enough that init cost stays ~15% of the full-pool price. Deadlock
    # margin comes from the sizing either way: max ≤ 0.9×(CPUs−1), so ≥1
    # CPU stays free for read/stitch/score tasks (the all-CPU static pool
    # is what deadlocks). tif=2 below keeps tasks from piling onto one
    # actor while the pool grows.
    import os as _os2

    # The scaled floor applies only to DERIVED pool sizes: a caller pinning
    # ocr_concurrency wants a small elastic pool (floor 2 on a pinned pool
    # of 2 is min==max and trips Ray's min-actors-vs-inputs warning on
    # one-block inputs). budget < 4 (≤4-CPU session) also stays at floor 1 —
    # the ramp win was a measured wash there.
    _default_floor = (
        max(1, _math.ceil(budget * 0.4))
        if budget >= 4 and not _ocr_pool_pinned
        else 1
    )
    _min_env = _os2.environ.get("GRAFT_OCR_MIN_ACTORS", str(_default_floor))
    ocr_min = ocr_concurrency if _min_env == "max" else max(
        1, min(int(_min_env), ocr_concurrency)
    )
    ocred = exploded.map_batches(
        OcrStage,
        fn_constructor_args=(store,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(ocr_min, ocr_concurrency),
    )
    ocred.context.max_tasks_in_flight_per_actor = 2
    if stitch == "auto":
        stitch = "repartition" if _ncpu >= 4 else "groupby"
    if stitch == "repartition":
        import os as _os

        from ray.data.context import DataContext, ShuffleStrategy

        ncpu = _ncpu
        # Partition count trades per-partition shuffle overhead against the
        # straggler tail. The hash shuffle costs ~fixed work PER PARTITION
        # (measured sweeps on the 10k-doc sf0.1 stitch at 32 CPUs: 384
        # parts 3× slower than 64; 64 parts median 5.4 s vs 32→3.7, 16→3.5,
        # 8→3.4 — and at 4 CPUs under real per-page cost 8 vs 16 parts is a
        # wash because the run is compute-bound), so the default is CPUs/2
        # floored at 8; for much larger corpora pass stitch_partitions ≈
        # total_docs / 15k (stitch work is ~0.26 ms/doc, so that bounds any
        # straggler partition to a few seconds).
        nparts = stitch_partitions or int(
            _os.environ.get("GRAFT_STITCH_PARTS", 0)
        ) or max(8, ncpu // 2)
        # Key-based repartition requires the HASH_SHUFFLE strategy. Scope it
        # to THIS PLAN by mutating the plan's captured DataContext (each
        # dataset chain carries its own snapshot) — other pipelines keep the
        # default sort shuffle, whose tiny-groupby startup cost is lower.
        # Aggregator count is capped to the session CPU budget so the
        # aggregator actors never starve the OCR pool.
        plan_ctx = ocred.context
        # Per-operator resource RESERVATION splits a small session's CPUs
        # into fixed operator budgets, capping the (dominant) OCR pool at ~1
        # actor on a 4-CPU node (measured 1.3/4 busy → 2.3/4 with it off).
        # Our plan self-balances instead: elastic (1,k) pools + zero-CPU
        # shuffle aggregators. Scoped to THIS plan's context snapshot.
        plan_ctx.op_resource_reservation_enabled = False
        plan_ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        plan_ctx.max_hash_shuffle_aggregators = int(
            _os.environ.get("GRAFT_HASH_AGG", max(2, ncpu // 2))
        )
        # zero-CPU aggregator actors: they are IO/concat-bound, and any
        # fractional reservation can leave the last CPU at <1.0 so no plain
        # task ever schedules again (observed deadlock: pools 3.0 + agg 0.1
        # in a 4-CPU session leaves 0.9 — map tasks need 1.0)
        plan_ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0
        # ...and the same for hash AGGREGATES: downstream groupbys (e.g. the
        # seniority counts) inherit THIS plan context and its HASH_SHUFFLE
        # strategy; their aggregator actors reserving CPUs against a full
        # static OCR pool deadlocked an 8-CPU session (observed).
        plan_ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0
        stitched = ocred.repartition(nparts, keys=["doc_id"]).map_batches(
            stitch_block,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,  # one batch per hash-partitioned block
        )
    else:
        stitched = ocred.groupby("doc_id").map_groups(
            stitch_group, batch_format="pyarrow"
        )
    if not analyzed:
        return stitched
    return stitched.map_batches(
        make_scorer_fn(query),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def rank_topk(analyzed_ds, k: int = C.TOP_K):
    """Query-mode ranking (reference analysis.py:541-545): successful rows
    only, score desc, top-k; doc_id tiebreak for determinism (the reference's
    completion-order ties are nondeterministic). A successful row whose score
    is missing/unparseable sorts as 0.0 — the reference's safe_score_key
    coercion (utils.py:50-56, M12)."""

    def ok_rows(t: pa.Table) -> pa.Table:
        # project to the ranked-result columns BEFORE the sort: the global
        # sort is an all-to-all exchange, and spans_out is the heavyweight
        # column (all extracted text) — the reference's ranked rows are
        # {filename, score, summary} (analysis.py:541-545), no spans, so
        # carrying them through the shuffle is pure tax (measured ~2× the
        # rank query's wall at sf0.1)
        t = t.filter(pc.is_null(t["error"]))
        t = t.select(["doc_id", "score", "seniority", "summary"])
        return t.set_column(
            t.schema.get_field_index("score"), "score",
            t["score"].combine_chunks().fill_null(0.0),
        )

    from ..common import topk_exact

    ok = analyzed_ds.map_batches(
        ok_rows, batch_format="pyarrow", zero_copy_batch=True,
    )
    # Per-block partial top-k, then one ≤ k×n_blocks-row merge block —
    # identical rows to sort().limit(k) under the same total order, without
    # the all-to-all range sort (sample + shuffle of every ranked row for a
    # k-row result; measured 4.5 s → 3.3 s warm on the sf0.1 rank query).
    return topk_exact(
        ok, [("score", "descending"), ("doc_id", "ascending")], k
    )
