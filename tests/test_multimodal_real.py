"""Real-decoder multimodal path (round-7 VERDICT item 7): wherever
pillow is importable, real PNG bytes flow through decode_image ->
real_decode_features inside the extract_features mapInPandas stage and
produce the exact pixel statistics. In containers without PIL the
module skips cleanly and the NotImplementedError seam is pinned
instead."""

from __future__ import annotations

import pytest

from etl_transparencia_sergipe_spark.sources.multimodal import (
    _HAS_PIL,
    decode_image,
    extract_features,
)


@pytest.mark.skipif(_HAS_PIL, reason="pinning the no-PIL seam")
def test_decode_raises_cleanly_without_pil():
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\x89PNG\r\n\x1a\n")


def _png_bytes(PIL, w, h, value):
    import io

    img = PIL.Image.new("L", (w, h), color=value)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_real_png_through_decode_and_features(spark):
    PIL = pytest.importorskip("PIL")
    import PIL.Image  # noqa: F401

    from etl_transparencia_sergipe_spark.sources.multimodal import (
        real_decode_features,
    )

    rows = [
        (1, "image/png", _png_bytes(PIL, 8, 4, 0)),
        (2, "image/png", _png_bytes(PIL, 16, 16, 255)),
        (3, "image/png", _png_bytes(PIL, 10, 10, 128)),
    ]
    media = spark.createDataFrame(
        rows, "media_id bigint, media_type string, content binary")

    # direct decode: dimensions survive the PNG roundtrip
    img = decode_image(rows[1][2])
    assert img.size == (16, 16)

    out = {r["media_id"]: r for r in
           extract_features(media, decode_fn=real_decode_features)
           .collect()}
    assert out[1]["feat_mean"] == 0.0 and out[1]["feat_dim"] == 32
    assert out[2]["feat_mean"] == 255.0 and out[2]["feat_dim"] == 256
    assert out[3]["feat_mean"] == 128.0 and out[3]["feat_dim"] == 100
    # payload metadata comes from the raw bytes, not the decode
    assert out[2]["n_bytes"] == len(rows[1][2])
