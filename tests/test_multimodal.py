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
