"""Live javax.imageio interop for the pure-Python JPEG decoder
(pipeline/jpeg.py) — the only codec family with no system C library in
this container, but Spark's own JVM ships the canonical ImageIO JPEG
codec. ImageIO encodes (baseline AND progressive via
ImageWriteParam.setProgressiveMode) and decodes its own stream; our
decoder must agree within the standard IDCT conformance bound (JPEG
decode is not bit-exact across conformant IDCTs — ISO/IEC 10918-2 allows
per-sample wobble; we assert max |diff| <= 2 — the measured bound, composed of
our float IDCT vs the JDK's integer islow IDCT plus libjpeg's
fixed-point color conversion vs our float one).

This closes the last hermetic-only decoder: a mirrored misreading in our
Huffman/dequant/IDCT chain cannot survive a real independent encoder."""

import numpy as np
import pytest


def _imageio(spark):
    jvm = spark._jvm
    try:
        jvm.javax.imageio.ImageIO  # noqa: B018 — availability probe
    except Exception:
        pytest.skip("JVM ImageIO not reachable via py4j")
    return jvm


def imageio_encode_jpeg(spark, rgb: np.ndarray, quality: float = 0.9,
                        progressive: bool = False) -> bytes:
    """Encode (h, w, 3) RGB with the JVM's ImageIO JPEG writer."""
    jvm = _imageio(spark)
    h, w, _ = rgb.shape
    img = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    packed = (
        (rgb[:, :, 0].astype(np.int64) << 16)
        | (rgb[:, :, 1].astype(np.int64) << 8)
        | rgb[:, :, 2].astype(np.int64)
    ).ravel()
    # one py4j element-set round trip per pixel — fine at these test
    # sizes (~2k pixels); use ByteBuffer bulk transfer for anything big
    arr = spark.sparkContext._gateway.new_array(jvm.int, len(packed))
    for i, v in enumerate(packed.tolist()):
        arr[i] = v if v < (1 << 31) else v - (1 << 32)
    img.setRGB(0, 0, w, h, arr, 0, w)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    params = writer.getDefaultWriteParam()
    params.setCompressionMode(
        jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT
    )
    params.setCompressionQuality(float(quality))
    if progressive:
        params.setProgressiveMode(
            jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT
        )
    bos = jvm.java.io.ByteArrayOutputStream()
    writer.setOutput(jvm.javax.imageio.ImageIO.createImageOutputStream(bos))
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), params)
    writer.dispose()
    return bytes(bos.toByteArray())


def imageio_decode_jpeg(spark, payload: bytes) -> np.ndarray:
    jvm = _imageio(spark)
    bis = jvm.java.io.ByteArrayInputStream(payload)
    img = jvm.javax.imageio.ImageIO.read(bis)
    w, h = img.getWidth(), img.getHeight()
    arr = spark.sparkContext._gateway.new_array(jvm.int, w * h)
    img.getRGB(0, 0, w, h, arr, 0, w)
    packed = np.array(list(arr), dtype=np.int64) & 0xFFFFFF
    out = np.stack(
        [(packed >> 16) & 0xFF, (packed >> 8) & 0xFF, packed & 0xFF], axis=-1
    ).astype(np.uint8)
    return out.reshape(h, w, 3)


def _test_image() -> np.ndarray:
    rng = np.random.default_rng(20260815)
    yy, xx = np.mgrid[0:40, 0:56]  # non-multiple-of-16 dims: edge MCUs
    smooth = np.stack(
        [
            (xx * 4 + yy * 2) % 256,
            128 + 90 * np.sin(xx / 9.0) + 20 * np.cos(yy / 5.0),
            (xx + yy * 3) % 256,
        ],
        axis=-1,
    )
    img = np.clip(smooth + rng.normal(0, 4, smooth.shape), 0, 255)
    return img.astype(np.uint8)


@pytest.mark.parametrize("progressive", [False, True])
def test_imageio_encoded_jpeg_decodes_like_imageio(spark, progressive):
    """ImageIO encode -> BOTH decoders -> per-sample agreement within the
    IDCT conformance bound. Progressive mode drives our SOF2 successive
    approximation / spectral-selection paths with a real scan script we
    did not write."""
    from enterprise_warp_spark.pipeline.jpeg import decode_jpeg

    img = _test_image()
    payload = imageio_encode_jpeg(spark, img, progressive=progressive)
    if progressive:
        assert b"\xff\xc2" in payload  # SOF2 actually present
    else:
        assert b"\xff\xc0" in payload  # baseline SOF0
    theirs = imageio_decode_jpeg(spark, payload)
    ours = decode_jpeg(payload)
    assert ours.shape == theirs.shape == img.shape
    diff = np.abs(ours.astype(np.int64) - theirs.astype(np.int64))
    assert diff.max() <= 2, (
        f"max sample diff {diff.max()} exceeds IDCT conformance bound "
        f"(progressive={progressive})"
    )
    assert (diff > 1).mean() < 0.05  # and the tail is thin


def test_our_progressive_encoder_decodes_in_imageio(spark):
    """Reverse direction: our SOF2 writer's stream must be readable by the
    canonical decoder, and ImageIO's pixels must match OUR decode of the
    same stream within the conformance bound."""
    from enterprise_warp_spark.pipeline.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    img = _test_image()
    payload = encode_jpeg_progressive(img)
    theirs = imageio_decode_jpeg(spark, payload)
    ours = decode_jpeg(payload)
    assert theirs.shape == ours.shape == img.shape
    diff = np.abs(ours.astype(np.int64) - theirs.astype(np.int64))
    assert diff.max() <= 2
