"""Live-libtiff interop for the pure-Python TIFF codec (pipeline/tiff.py):
canonical libtiff writes LZW (with and without the horizontal predictor)
and PackBits streams that our decoder must reproduce pixel-exactly, and
our encoder's LZW output must read back through libtiff. TIFFSetField is
varargs; on x86-64 the default C promotions make c_int correct for the
uint16 tags and c_uint32 exact for the uint32 tags used here."""

import ctypes

import numpy as np
import pytest

from enterprise_warp_spark.pipeline.tiff import decode_tiff, encode_tiff

TAG = {
    "width": 256, "length": 257, "bits": 258, "compression": 259,
    "photometric": 262, "spp": 277, "rows_per_strip": 278,
    "planarconfig": 284, "predictor": 317,
}
COMPRESSION_NONE, COMPRESSION_LZW, COMPRESSION_PACKBITS = 1, 5, 32773


def _libtiff():
    try:
        lib = ctypes.CDLL("libtiff.so.6")
    except OSError:
        pytest.skip("system libtiff not present")
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFWriteScanline.restype = ctypes.c_int
    lib.TIFFWriteScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16
    ]
    lib.TIFFReadScanline.restype = ctypes.c_int
    lib.TIFFReadScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16
    ]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    return lib


def libtiff_write(path: str, img: np.ndarray, compression: int,
                  predictor: int | None = None):
    lib = _libtiff()
    h, w, ch = img.shape
    t = lib.TIFFOpen(path.encode(), b"w")
    assert t
    sf = lib.TIFFSetField
    assert sf(ctypes.c_void_p(t), ctypes.c_uint32(TAG["width"]), ctypes.c_uint32(w))
    assert sf(ctypes.c_void_p(t), ctypes.c_uint32(TAG["length"]), ctypes.c_uint32(h))
    assert sf(ctypes.c_void_p(t), ctypes.c_uint32(TAG["bits"]), ctypes.c_int(8))
    assert sf(ctypes.c_void_p(t), ctypes.c_uint32(TAG["spp"]), ctypes.c_int(ch))
    assert sf(ctypes.c_void_p(t), ctypes.c_uint32(TAG["compression"]),
              ctypes.c_int(compression))
    assert sf(ctypes.c_void_p(t), ctypes.c_uint32(TAG["photometric"]),
              ctypes.c_int(2 if ch == 3 else 1))
    assert sf(ctypes.c_void_p(t), ctypes.c_uint32(TAG["planarconfig"]), ctypes.c_int(1))
    assert sf(ctypes.c_void_p(t), ctypes.c_uint32(TAG["rows_per_strip"]),
              ctypes.c_uint32(7))  # multiple strips exercise strip stitching
    if predictor is not None:
        assert sf(ctypes.c_void_p(t), ctypes.c_uint32(TAG["predictor"]),
                  ctypes.c_int(predictor))
    rows = np.ascontiguousarray(img, np.uint8)
    for y in range(h):
        buf = rows[y].tobytes()
        assert lib.TIFFWriteScanline(t, buf, y, 0) == 1
    lib.TIFFClose(t)


def libtiff_read(path: str, w: int, h: int, ch: int) -> np.ndarray:
    lib = _libtiff()
    t = lib.TIFFOpen(path.encode(), b"r")
    assert t
    out = np.zeros((h, w * ch), np.uint8)
    buf = (ctypes.c_uint8 * (w * ch))()
    for y in range(h):
        assert lib.TIFFReadScanline(t, buf, y, 0) == 1
        out[y] = np.frombuffer(bytes(buf), np.uint8)
    lib.TIFFClose(t)
    return out.reshape(h, w, ch)


def _images():
    rng = np.random.default_rng(99)
    yy, xx = np.mgrid[0:33, 0:47]
    smooth = np.stack(
        [(xx * 2 + yy) % 256, (xx + yy * 3) % 256, (xx // 2 + yy * 2) % 256],
        axis=-1,
    ).astype(np.uint8)  # predictor-friendly gradients
    noisy = rng.integers(0, 256, (33, 47, 3)).astype(np.uint8)
    runs = np.repeat(
        rng.integers(0, 4, (33, 12, 3)) * 80, 4, axis=1
    )[:, :47].astype(np.uint8)  # PackBits-friendly runs
    return {"smooth": smooth, "noisy": noisy, "runs": runs}


@pytest.mark.parametrize("comp,pred", [
    (COMPRESSION_NONE, None),
    (COMPRESSION_LZW, None),
    (COMPRESSION_LZW, 2),
    (COMPRESSION_PACKBITS, None),
])
def test_libtiff_writes_our_decoder_reads(tmp_path, comp, pred):
    for name, img in _images().items():
        p = str(tmp_path / f"{name}_{comp}_{pred}.tif")
        libtiff_write(p, img, comp, pred)
        got = decode_tiff(open(p, "rb").read())
        assert np.array_equal(got, img), (name, comp, pred)


@pytest.mark.parametrize("pred", [1, 2])
def test_our_encoder_reads_back_in_libtiff(tmp_path, pred):
    img = _images()["smooth"]
    payload = encode_tiff(img, compression=5, predictor=pred)
    p = str(tmp_path / f"ours_{pred}.tif")
    open(p, "wb").write(payload)
    got = libtiff_read(p, img.shape[1], img.shape[0], 3)
    assert np.array_equal(got, img)
