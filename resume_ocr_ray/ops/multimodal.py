"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The real decode libraries (PIL/cv2/ffmpeg) are not in this container, so the
DECODE KERNELS are stubbed behind an import-try (NotImplementedError when the
lib is absent, or the deterministic synthetic codec for our own payloads) —
but the Ray-side plumbing is real and tested: schema, actor-pool signature,
batch sizing for large binary rows, and output layout.

Stages:
- ``MediaProbeStage``  — header-only metadata extraction (kind, n_pages,
  payload bytes) — cheap, no full decode
- ``ImageDecodeStage`` — decode + feature-extract; real impl for the
  synthetic codec, guarded stub for true image bytes
- ``frame_sample``     — select every k-th page/frame of multi-page payloads

Batch-size guidance encoded here: binary payloads make rows wide — callers
pass small ``batch_size`` (32–128) so batch × concurrency fits worker heaps;
blocks of binary columns stay in Arrow (never pandas object dtype).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import media as M

try:  # the real-image path; absent in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


class MediaProbeStage:
    """Header-only probe of binary media payloads (no page decode)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds, n_pages, sizes = [], [], []
        for p in payloads:
            sizes.append(len(p) if p is not None else 0)
            if p is None:  # upstream error row (null payload) — probe as such
                kinds.append("missing")
                n_pages.append(0)
                continue
            try:
                hdr = M.decode_media_header(p)
                kinds.append(hdr["media_kind"])
                n_pages.append(hdr["n_pages"])
            except Exception:
                kinds.append("unknown")
                n_pages.append(0)
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "media_kind": pa.array(kinds),
                "n_pages": pa.array(n_pages, type=pa.int32()),
                "payload_bytes": pa.array(sizes, type=pa.int64()),
            }
        )


def _byte_entropy(arr: "np.ndarray") -> float:
    counts = np.bincount(arr, minlength=256).astype(np.float64)
    probs = counts[counts > 0] / max(1, arr.size)
    return float(np.round(-(probs * np.log2(probs)).sum(), 4))


class ImageDecodeStage:
    """Decode pages → per-page features. Stateful (decoder init once).

    For synthetic payloads: decodes via the deterministic codec and emits
    text-length / byte-entropy features. For real image bytes
    (``real_images=True``): decodes the payload with PIL — one feature row
    per frame (``ImageSequence`` covers multi-frame GIF/TIFF), entropy over
    the decoded 8-bit luminance pixels, ``text_len=-1`` (no OCR lib in a
    PIL-only install). Raises NotImplementedError at CONSTRUCTION when PIL
    is absent, so a misconfigured pool fails at actor start, not mid-data."""

    def __init__(self, real_images: bool = False):
        if real_images and not HAVE_PIL:
            raise NotImplementedError(
                "real image decode requires PIL, which is not installed in "
                "this container — synthetic codec path only"
            )
        self.real_images = real_images
        self.engine = M.OcrEngine()

    def _real_frames(self, payload: bytes):
        """(frame_no, text_len, entropy) rows for one real image payload."""
        import io

        from PIL import Image, ImageSequence

        with Image.open(io.BytesIO(payload)) as im:
            for i, frame in enumerate(ImageSequence.Iterator(im)):
                lum = np.asarray(frame.convert("L"), dtype=np.uint8)
                yield i, -1, _byte_entropy(lum.ravel())

    def _synthetic_frames(self, payload: bytes):
        doc = M.decode_media(payload)
        for i, page in enumerate(doc.pages):
            try:
                if doc.media_kind == "html":
                    # html pages are raw utf-8 markup, not codec images
                    text = page.decode("utf-8")
                else:
                    text = self.engine.image_to_string(page)
                tl = len(text)
            except (M.OcrDecodeError, UnicodeDecodeError):
                tl = -1
            arr = np.frombuffer(page, dtype=np.uint8)
            yield i, tl, _byte_entropy(arr)

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames = self._real_frames if self.real_images else self._synthetic_frames
        refs, pages_out, feat_len, feat_entropy = [], [], [], []
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(), batch.column("payload").to_pylist()
        ):
            try:
                rows = list(frames(payload))
            except Exception:
                continue
            for i, tl, ent in rows:
                refs.append(ref)
                pages_out.append(i)
                feat_len.append(tl)
                feat_entropy.append(ent)
        return pa.table(
            {
                "media_ref": pa.array(refs, type=pa.string()),
                "page_no": pa.array(pages_out, type=pa.int32()),
                "text_len": pa.array(feat_len, type=pa.int64()),
                "byte_entropy": pa.array(feat_entropy, type=pa.float64()),
            }
        )


def probe_media(media_ds, concurrency=(1, 2)):
    return media_ds.map_batches(
        MediaProbeStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64, concurrency=concurrency,
    )


def decode_features(media_ds, concurrency=(1, 2)):
    return media_ds.map_batches(
        ImageDecodeStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=32, concurrency=concurrency,
    )


def frame_sample(media_ds, every_k: int = 2, concurrency=(1, 2)):
    """Every k-th page of each payload, re-encoded as a smaller payload.
    Undecodable rows come out with ``error`` set and a null payload
    (explicit error-row convention — no silent drops)."""

    def sample(batch: pa.Table) -> pa.Table:
        refs, payloads, errors = [], [], []
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(), batch.column("payload").to_pylist()
        ):
            refs.append(ref)
            try:
                doc = M.decode_media(payload)
            except Exception as e:
                payloads.append(None)
                errors.append(f"{type(e).__name__}: {e}"[:200])
                continue
            kept = doc.pages[::every_k]
            payloads.append(M.encode_media(doc.media_kind, kept, doc.direct_text))
            errors.append(None)
        return pa.table(
            {"media_ref": pa.array(refs, type=pa.string()),
             "payload": pa.array(payloads, type=pa.binary()),
             "error": pa.array(errors, type=pa.string())}
        )

    return media_ds.map_batches(
        sample, batch_format="pyarrow", zero_copy_batch=True, batch_size=32,
    )


class ImageResizeStage:
    """Batched image resize — the bandwidth-reduction stage every
    multimodal training pipeline runs before feature extraction. Stateful
    actor form (transform params resolved once per actor).

    Synthetic-codec path: a deterministic byte-budget downsample per page
    (every ceil(len/budget)-th byte), preserving the plumbing contract a
    real resize has — per-page payloads shrink to ≤ budget, page COUNT and
    order are preserved, and the output re-encodes as a valid payload of
    the same media kind.

    Real-image path (``real_images=True``, requires PIL): the payload is
    one image file; ``Image.thumbnail(box, LANCZOS)`` shrinks it to fit
    ``target_box`` preserving aspect ratio (never upscales), then
    re-encodes in the ORIGINAL format (alpha/palette flattened to RGB
    first when the format is JPEG, which has no alpha channel).

    Rows whose payload fails to decode are NOT silently dropped: they come
    out with ``error`` set, a null payload and ``bytes_out=0``, matching
    the OCR path's explicit error-row convention, so bytes_in/bytes_out
    totals stay auditable. Successful rows carry ``error=None``."""

    def __init__(self, max_bytes_per_page: int = 256,
                 real_images: bool = False,
                 target_box: tuple = (512, 512)):
        if real_images and not HAVE_PIL:
            raise NotImplementedError(
                "real image resize requires PIL, which is not installed in "
                "this container — synthetic byte-budget path only"
            )
        self.real_images = real_images
        self.budget = max(1, int(max_bytes_per_page))
        self.box = (int(target_box[0]), int(target_box[1]))

    def _shrink(self, page: bytes) -> bytes:
        if len(page) <= self.budget:
            return page
        step = -(-len(page) // self.budget)  # ceil: output ≤ budget bytes
        return page[::step]

    def _resize_synthetic(self, payload: bytes) -> tuple:
        doc = M.decode_media(payload)
        small = [self._shrink(p) for p in doc.pages]
        return (
            M.encode_media(doc.media_kind, small, doc.direct_text),
            len(small),
            sum(len(p) for p in doc.pages),
            sum(len(p) for p in small),
        )

    def _resize_real(self, payload: bytes) -> tuple:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            fmt = (im.format or "PNG").upper()
            im.load()
            # thumbnail = in-place aspect-preserving fit into the box;
            # never upscales a smaller-than-box image
            im.thumbnail(self.box, Image.LANCZOS)
            if fmt in ("JPEG", "JPG") and im.mode not in ("RGB", "L"):
                im = im.convert("RGB")  # JPEG has no alpha/palette
            buf = io.BytesIO()
            im.save(buf, format=fmt)
            out = buf.getvalue()
            return out, 1, len(payload), len(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        resize = self._resize_real if self.real_images else self._resize_synthetic
        refs, payloads, n_pages, in_b, out_b, errors = [], [], [], [], [], []
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            refs.append(ref)
            try:
                out, np_, bi, bo = resize(payload)
            except Exception as e:
                payloads.append(None)
                n_pages.append(0)
                in_b.append(len(payload) if payload is not None else 0)
                out_b.append(0)
                errors.append(f"{type(e).__name__}: {e}"[:200])
                continue
            payloads.append(out)
            n_pages.append(np_)
            in_b.append(bi)
            out_b.append(bo)
            errors.append(None)
        return pa.table(
            {
                "media_ref": pa.array(refs, type=pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
                "n_pages": pa.array(n_pages, type=pa.int32()),
                "bytes_in": pa.array(in_b, type=pa.int64()),
                "bytes_out": pa.array(out_b, type=pa.int64()),
                "error": pa.array(errors, type=pa.string()),
            }
        )


def resize_images(media_ds, max_bytes_per_page: int = 256,
                  concurrency=(1, 2)):
    return media_ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"max_bytes_per_page": max_bytes_per_page},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=32, concurrency=concurrency,
    )


def page_size_hist(media_ds, bin_bytes: int = 64):
    """Equi-width histogram of DECODED page sizes across the whole media
    corpus — the capacity-planning profile (batch sizing, resize budgets,
    spill estimates) every binary-heavy pipeline computes before tuning.
    One streamed pass: full ``decode_media`` per payload (this exercises
    the real decode path, unlike the header-only probe), per-batch
    (bin, n) partial counts, then a tiny bin-keyed aggregate — only
    (int, int) pairs ever shuffle; the output is bin-cardinality.
    Undecodable / missing payloads contribute no pages (the meta sidecar
    flags them; the pages fact table likewise has no rows for them), so
    the media_pages oracle matches exactly. Output
    ``(bin, n_pages)`` ascending, bin = page_bytes // bin_bytes."""
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        counts: dict = {}
        for payload in b.column("payload").to_pylist():
            if payload is None:
                continue
            try:
                doc = M.decode_media(payload)
            except Exception:
                continue
            for page in doc.pages:
                k = len(page) // bin_bytes
                counts[k] = counts.get(k, 0) + 1
        return pa.table(
            {
                "bin": pa.array(list(counts), type=pa.int64()),
                "n": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    return (
        media_ds.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=64,
        )
        # bin cardinality is tiny → engine aggregate with a coalesce so
        # the sort ranges stay non-empty (heavy_hitters rule)
        .repartition(4)
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n_pages"))
        .sort("bin")
    )
