"""Live-libpng interop for the pure-Python PNG codec (pipeline/codecs.py)
— the same pattern as the live-libwebp VP8L tests: a mirrored misreading
in our filter/unfilter logic would round-trip internally and pass, so both
directions are pinned against the canonical C implementation via the
stable libpng 1.6 simplified API (png_image; struct layout documented in
png.h and frozen at PNG_IMAGE_VERSION 1):

  * encode_png (each of the 5 PNG filter types) -> libpng decode
  * libpng encode (its own per-row filter heuristics) -> decode_png
"""

import ctypes

import numpy as np
import pytest

from enterprise_warp_spark.pipeline.codecs import decode_png, encode_png

PNG_IMAGE_VERSION = 1
PNG_FORMAT_GRAY = 0
PNG_FORMAT_RGB = 2  # PNG_FORMAT_FLAG_COLOR


class PngImage(ctypes.Structure):
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


def _libpng():
    try:
        lib = ctypes.CDLL("libpng16.so.16")
    except OSError:
        pytest.skip("system libpng16 not present")
    lib.png_image_begin_read_from_memory.argtypes = [
        ctypes.POINTER(PngImage), ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.png_image_finish_read.argtypes = [
        ctypes.POINTER(PngImage), ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_void_p,
    ]
    lib.png_image_write_to_memory.argtypes = [
        ctypes.POINTER(PngImage), ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_void_p,
    ]
    return lib


def libpng_decode(payload: bytes, fmt: int) -> np.ndarray:
    lib = _libpng()
    img = PngImage()
    img.version = PNG_IMAGE_VERSION
    assert lib.png_image_begin_read_from_memory(
        ctypes.byref(img), payload, len(payload)
    ), img.message
    img.format = fmt
    ch = 3 if fmt == PNG_FORMAT_RGB else 1
    buf = (ctypes.c_uint8 * (img.width * img.height * ch))()
    assert lib.png_image_finish_read(
        ctypes.byref(img), None, buf, 0, None
    ), img.message
    arr = np.frombuffer(bytes(buf), dtype=np.uint8)
    shape = (img.height, img.width, 3) if ch == 3 else (img.height, img.width)
    return arr.reshape(shape)


def libpng_encode(arr: np.ndarray) -> bytes:
    lib = _libpng()
    img = PngImage()
    img.version = PNG_IMAGE_VERSION
    img.height, img.width = arr.shape[:2]
    img.format = PNG_FORMAT_RGB if arr.ndim == 3 else PNG_FORMAT_GRAY
    raw = np.ascontiguousarray(arr, dtype=np.uint8)
    pix = raw.ctypes.data_as(ctypes.c_void_p)
    size = ctypes.c_size_t(0)
    assert lib.png_image_write_to_memory(  # size query with NULL memory
        ctypes.byref(img), None, ctypes.byref(size), 0, pix, 0, None
    ), img.message
    mem = (ctypes.c_uint8 * size.value)()
    assert lib.png_image_write_to_memory(
        ctypes.byref(img), mem, ctypes.byref(size), 0, pix, 0, None
    ), img.message
    return bytes(mem)[: size.value]


def _images():
    rng = np.random.default_rng(20260815)
    yy, xx = np.mgrid[0:37, 0:53]  # odd dims exercise edge columns
    rgb = np.stack(
        [(xx * 3 + yy) % 256, (xx + yy * 5) % 256, (xx * xx // 7 + yy) % 256],
        axis=-1,
    ).astype(np.uint8)
    noisy = np.clip(
        rgb.astype(np.int64) + rng.integers(-9, 10, rgb.shape), 0, 255
    ).astype(np.uint8)
    gray = ((xx * 7 + yy * 3) % 256).astype(np.uint8)
    flat = np.full((8, 8), 129, np.uint8)  # constant rows (filter ties)
    return {"rgb": rgb, "noisy": noisy, "gray": gray, "flat": flat}


def test_our_encoder_all_filters_decode_in_libpng():
    for name, img in _images().items():
        fmt = PNG_FORMAT_RGB if img.ndim == 3 else PNG_FORMAT_GRAY
        for filt in range(5):
            got = libpng_decode(encode_png(img, filter_type=filt), fmt)
            assert np.array_equal(got, img), (name, filt)


def test_libpng_encoder_decodes_in_ours():
    """libpng picks its own per-row filters (its heuristics mix types on
    the noisy image), so this drives our unfilter paths with filter
    choices we did not make."""
    for name, img in _images().items():
        payload = libpng_encode(img)
        got = decode_png(payload)
        assert np.array_equal(got, img), name


def test_cross_engine_roundtrip_is_stable():
    """our encode -> libpng decode -> libpng encode -> our decode: a full
    two-engine cycle must be pixel-identical (catches any silent format
    renegotiation in the simplified API calls)."""
    img = _images()["noisy"]
    step1 = libpng_decode(encode_png(img, filter_type=4), PNG_FORMAT_RGB)
    step2 = decode_png(libpng_encode(step1))
    assert np.array_equal(step2, img)
