"""Real-image (PIL) arms of the multimodal stages + the error-row
convention.

The PIL tests are gated with ``importorskip``: they SKIP in this container
(no PIL wheel) and light up unchanged the moment the wheel exists — the
arms are written against PIL's actual API (Image.open / ImageSequence /
thumbnail / save), not a fake."""

import numpy as np
import pyarrow as pa
import pytest

from resume_ocr_ray.core import corpus
from resume_ocr_ray.ops import multimodal as MM


def _png_bytes(w: int, h: int, mode: str = "RGB") -> bytes:
    import io

    from PIL import Image

    arr = (np.arange(w * h) % 251).astype(np.uint8).reshape(h, w)
    im = Image.fromarray(arr, mode="L").convert(mode)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    return buf.getvalue()


def test_real_resize_fits_target_box_and_keeps_format():
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    st = MM.ImageResizeStage(real_images=True, target_box=(32, 32))
    batch = pa.table(
        {
            "media_ref": pa.array(["big", "small"]),
            "payload": pa.array(
                [_png_bytes(128, 64), _png_bytes(16, 8)], type=pa.binary()
            ),
        }
    )
    out = st(batch).to_pandas().set_index("media_ref")
    assert out["error"].isna().all()
    with Image.open(io.BytesIO(out.loc["big", "payload"])) as im:
        assert im.format == "PNG"
        assert im.width <= 32 and im.height <= 32
        # aspect preserved: 128x64 → 32x16
        assert (im.width, im.height) == (32, 16)
    with Image.open(io.BytesIO(out.loc["small", "payload"])) as im:
        # thumbnail never upscales
        assert (im.width, im.height) == (16, 8)
    assert (out["n_pages"] == 1).all()
    assert (out["bytes_in"] > 0).all() and (out["bytes_out"] > 0).all()


def test_real_resize_jpeg_alpha_flattens():
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    im = Image.new("RGBA", (64, 64), (200, 10, 10, 128))
    buf = io.BytesIO()
    im.convert("RGB").save(buf, format="JPEG")
    # round-trip a real JPEG through the stage (JPEG source stays JPEG)
    st = MM.ImageResizeStage(real_images=True, target_box=(16, 16))
    out = st(
        pa.table(
            {
                "media_ref": pa.array(["j"]),
                "payload": pa.array([buf.getvalue()], type=pa.binary()),
            }
        )
    ).to_pandas()
    with Image.open(io.BytesIO(out.loc[0, "payload"])) as got:
        assert got.format == "JPEG"
        assert got.width <= 16 and got.height <= 16


def test_real_decode_one_row_per_frame_with_entropy():
    pytest.importorskip("PIL")
    st = MM.ImageDecodeStage(real_images=True)
    out = st(
        pa.table(
            {
                "media_ref": pa.array(["p"]),
                "payload": pa.array([_png_bytes(32, 32)], type=pa.binary()),
            }
        )
    ).to_pandas()
    assert list(out["page_no"]) == [0]
    assert (out["text_len"] == -1).all()  # no OCR lib on the PIL-only path
    assert out["byte_entropy"].between(0, 8).all()


def test_resize_emits_error_rows_not_silent_drops(ray_session):
    """Undecodable payloads come out as marked error rows (ADVICE: the OCR
    path's explicit error-row convention), so bytes_in/bytes_out stats
    stay auditable."""
    import ray.data as rd

    _, media = corpus.generate_corpus(6, seed=9)
    bad = pa.table(
        {
            "media_ref": pa.array(["bad-1"]),
            "payload": pa.array([b"\xff\x00not-a-payload"], type=pa.binary()),
        }
    )
    ds = rd.from_arrow(pa.concat_tables([media.select(["media_ref", "payload"]), bad]))
    out = MM.resize_images(ds, max_bytes_per_page=64).to_pandas()
    assert len(out) == media.num_rows + 1  # nothing dropped
    err = out[out["error"].notna()]
    assert list(err["media_ref"]) == ["bad-1"]
    assert (err["bytes_out"] == 0).all() and (err["n_pages"] == 0).all()
    assert (err["bytes_in"] > 0).all()
    assert err["payload"].isna().all()
    ok = out[out["error"].isna()]
    assert (ok["bytes_out"] > 0).all()
