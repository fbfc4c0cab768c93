"""Multimodal binary-column plumbing through mapInPandas (decode stubbed)."""

from __future__ import annotations

from isimip_qa_spark.operators.multimodal import (
    decode_image_stub,
    extract_features,
    pages_to_media,
    sniff_magic,
)


def test_feature_extraction_roundtrip(spark, pages_sdf, pages_pdf):
    media = pages_to_media(pages_sdf.limit(200))
    feats = extract_features(media).toPandas()
    assert len(feats) == 200
    assert (feats["magic"] == "html").all()
    assert (feats["n_bytes"] > 0).all()
    assert feats["feature"].map(len).eq(8).all()
    # deterministic: recompute one row driver-side
    row = feats.iloc[0]
    # find the matching page by byte length
    match = [
        bytes(h) for h in pages_pdf["html"] if len(bytes(h)) == row["n_bytes"]
    ][0]
    w, h, feat = decode_image_stub(match)
    assert (row["width"], row["height"]) == (w, h)


def test_magic_sniffing():
    assert sniff_magic(b"\x89PNG\r\n") == "png"
    assert sniff_magic(b"\xff\xd8\xff\xe0") == "jpeg"
    assert sniff_magic(b"<html>") == "html"
    assert sniff_magic(b"\x00\x00") == "unknown"


def test_decode_image_feature_flag():
    """decode_image: stub for non-image bytes regardless of PIL presence;
    PIL path (when importable) decodes a real PNG's true dimensions. The
    suite is green with or without PIL installed."""
    from isimip_qa_spark.operators.multimodal import (
        HAVE_PIL,
        decode_image,
        decode_image_stub,
    )

    html = b"<htm" + b"l><body>hello</body></html>"
    assert decode_image(html) == decode_image_stub(html)

    # minimal valid 1x1 black PNG (hand-assembled, no PIL needed to build)
    import struct
    import zlib

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + chunk(b"IEND", b"")
    )
    w, h, feat = decode_image(png)
    if HAVE_PIL:
        assert (w, h) == (1, 1)  # true dimensions from the real decoder
        assert abs(sum(feat) - 1.0) < 1e-9
    else:
        assert (w, h, feat) == decode_image_stub(png)  # deterministic stub
