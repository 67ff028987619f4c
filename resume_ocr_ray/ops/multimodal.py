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
            sizes.append(len(p))
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


class ImageDecodeStage:
    """Decode pages → per-page features. Stateful (decoder init once).

    For synthetic payloads: decodes via the deterministic codec and emits
    text-length / byte-entropy features. For real image bytes: requires PIL —
    raises NotImplementedError when unavailable (clearly-marked stub)."""

    def __init__(self, real_images: bool = False):
        if real_images and not HAVE_PIL:
            raise NotImplementedError(
                "real image decode requires PIL, which is not installed in "
                "this container — synthetic codec path only"
            )
        self.real_images = real_images
        self.engine = M.OcrEngine()

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, pages_out, feat_len, feat_entropy = [], [], [], []
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(), batch.column("payload").to_pylist()
        ):
            try:
                doc = M.decode_media(payload)
            except Exception:
                continue
            for i, page in enumerate(doc.pages):
                refs.append(ref)
                pages_out.append(i)
                try:
                    if doc.media_kind == "html":
                        # html pages are raw utf-8 markup, not codec images
                        text = page.decode("utf-8")
                    else:
                        text = self.engine.image_to_string(page)
                    feat_len.append(len(text))
                except (M.OcrDecodeError, UnicodeDecodeError):
                    feat_len.append(-1)
                arr = np.frombuffer(page, dtype=np.uint8)
                counts = np.bincount(arr, minlength=256).astype(np.float64)
                probs = counts[counts > 0] / max(1, arr.size)
                feat_entropy.append(float(np.round(-(probs * np.log2(probs)).sum(), 4)))
        return pa.table(
            {
                "media_ref": pa.array(refs),
                "page_no": pa.array(pages_out, type=pa.int32()),
                "text_len": pa.array(feat_len, type=pa.int64()),
                "byte_entropy": pa.array(feat_entropy, type=pa.float64()),
            }
        )


def probe_media(media_ds, concurrency: int = 2):
    return media_ds.map_batches(
        MediaProbeStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64, concurrency=concurrency,
    )


def decode_features(media_ds, concurrency: int = 2):
    return media_ds.map_batches(
        ImageDecodeStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=32, concurrency=concurrency,
    )


def frame_sample(media_ds, every_k: int = 2, concurrency: int = 2):
    """Every k-th page of each payload, re-encoded as a smaller payload."""

    def sample(batch: pa.Table) -> pa.Table:
        refs, payloads = [], []
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(), batch.column("payload").to_pylist()
        ):
            try:
                doc = M.decode_media(payload)
            except Exception:
                continue
            kept = doc.pages[::every_k]
            refs.append(ref)
            payloads.append(M.encode_media(doc.media_kind, kept, doc.direct_text))
        return pa.table(
            {"media_ref": pa.array(refs, type=pa.string()),
             "payload": pa.array(payloads, type=pa.binary())}
        )

    return media_ds.map_batches(
        sample, batch_format="pyarrow", zero_copy_batch=True, batch_size=32,
    )


class ImageResizeStage:
    """Batched image resize — the bandwidth-reduction stage every
    multimodal training pipeline runs before feature extraction. Stateful
    actor form (transform params resolved once per actor). Real image
    bytes require PIL (``Image.resize`` per page) — honestly gated like
    ImageDecodeStage; the synthetic-codec path applies a deterministic
    byte-budget downsample per page (every ceil(len/budget)-th byte),
    which preserves the plumbing contract a real resize has: per-page
    payloads shrink to ≤ budget, page COUNT and order are preserved, and
    the output re-encodes as a valid payload of the same media kind."""

    def __init__(self, max_bytes_per_page: int = 256,
                 real_images: bool = False):
        if real_images and not HAVE_PIL:
            raise NotImplementedError(
                "real image resize requires PIL, which is not installed in "
                "this container — synthetic byte-budget path only"
            )
        self.real_images = real_images
        self.budget = max(1, int(max_bytes_per_page))

    def _shrink(self, page: bytes) -> bytes:
        if len(page) <= self.budget:
            return page
        step = -(-len(page) // self.budget)  # ceil: output ≤ budget bytes
        return page[::step]

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, payloads, n_pages, in_b, out_b = [], [], [], [], []
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            try:
                doc = M.decode_media(payload)
            except Exception:
                continue
            small = [self._shrink(p) for p in doc.pages]
            refs.append(ref)
            payloads.append(
                M.encode_media(doc.media_kind, small, doc.direct_text)
            )
            n_pages.append(len(small))
            in_b.append(sum(len(p) for p in doc.pages))
            out_b.append(sum(len(p) for p in small))
        return pa.table(
            {
                "media_ref": pa.array(refs, type=pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
                "n_pages": pa.array(n_pages, type=pa.int32()),
                "bytes_in": pa.array(in_b, type=pa.int64()),
                "bytes_out": pa.array(out_b, type=pa.int64()),
            }
        )


def resize_images(media_ds, max_bytes_per_page: int = 256,
                  concurrency: int = 2):
    return media_ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"max_bytes_per_page": max_bytes_per_page},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=32, concurrency=concurrency,
    )
