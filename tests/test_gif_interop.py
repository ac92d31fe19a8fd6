"""Live-giflib interop for the pure-Python GIF codec (pipeline/gif.py) —
both LZW directions pinned against the canonical C implementation through
giflib's sequential APIs (opaque GifFileType handle only; geometry and
palette are ours, so no struct-field access is needed):

  * giflib encode (EGifPutScreenDesc/ImageDesc/Line) -> our decode_gif
  * our encode_gif -> giflib decode (DGifGetRecordType/ImageDesc/Line)
"""

import ctypes
import os

import numpy as np
import pytest

from enterprise_warp_spark.pipeline.gif import decode_gif, encode_gif

IMAGE_DESC_RECORD_TYPE = 2
TERMINATE_RECORD_TYPE = 4


def _giflib():
    try:
        lib = ctypes.CDLL("libgif.so.7")
    except OSError:
        pytest.skip("system giflib not present")
    lib.EGifOpenFileName.restype = ctypes.c_void_p
    lib.EGifOpenFileName.argtypes = [
        ctypes.c_char_p, ctypes.c_bool, ctypes.POINTER(ctypes.c_int)
    ]
    lib.DGifOpenFileName.restype = ctypes.c_void_p
    lib.DGifOpenFileName.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)
    ]
    lib.GifMakeMapObject.restype = ctypes.c_void_p
    lib.GifMakeMapObject.argtypes = [ctypes.c_int, ctypes.c_char_p]
    for fn in ("EGifPutScreenDesc", "EGifPutImageDesc", "EGifPutLine",
               "EGifCloseFile", "DGifGetRecordType", "DGifGetImageDesc",
               "DGifGetLine", "DGifCloseFile"):
        getattr(lib, fn).restype = ctypes.c_int
    return lib


def giflib_encode(path: str, indices: np.ndarray, palette: np.ndarray):
    """Write (h, w) palette indices + (n, 3) palette via giflib."""
    lib = _giflib()
    h, w = indices.shape
    n_pal = len(palette)
    assert n_pal & (n_pal - 1) == 0, "giflib needs a power-of-two palette"
    err = ctypes.c_int(0)
    cmap = lib.GifMakeMapObject(
        n_pal, np.ascontiguousarray(palette, np.uint8).tobytes()
    )
    assert cmap
    gif = lib.EGifOpenFileName(path.encode(), False, ctypes.byref(err))
    assert gif, err.value
    assert lib.EGifPutScreenDesc(
        ctypes.c_void_p(gif), w, h, 8, 0, ctypes.c_void_p(cmap)
    ) == 1
    assert lib.EGifPutImageDesc(
        ctypes.c_void_p(gif), 0, 0, w, h, False, None
    ) == 1
    rows = np.ascontiguousarray(indices, np.uint8)
    for y in range(h):
        line = rows[y].tobytes()
        assert lib.EGifPutLine(ctypes.c_void_p(gif), line, w) == 1
    assert lib.EGifCloseFile(ctypes.c_void_p(gif), ctypes.byref(err)) == 1
    lib.GifFreeMapObject(ctypes.c_void_p(cmap))


def giflib_decode_indices(path: str, w: int, h: int) -> np.ndarray:
    """Read back (h, w) palette indices via the sequential DGif API
    (geometry is known to the caller, so the opaque handle suffices)."""
    lib = _giflib()
    err = ctypes.c_int(0)
    gif = lib.DGifOpenFileName(path.encode(), ctypes.byref(err))
    assert gif, err.value
    rec = ctypes.c_int(0)
    out = np.zeros((h, w), np.uint8)
    try:
        while True:
            assert lib.DGifGetRecordType(
                ctypes.c_void_p(gif), ctypes.byref(rec)
            ) == 1
            if rec.value == TERMINATE_RECORD_TYPE:
                raise AssertionError("no image record found")
            if rec.value == IMAGE_DESC_RECORD_TYPE:
                assert lib.DGifGetImageDesc(ctypes.c_void_p(gif)) == 1
                buf = (ctypes.c_uint8 * w)()
                for y in range(h):
                    assert lib.DGifGetLine(ctypes.c_void_p(gif), buf, w) == 1
                    out[y] = np.frombuffer(bytes(buf), np.uint8)
                return out
    finally:
        lib.DGifCloseFile(ctypes.c_void_p(gif), ctypes.byref(err))


def _test_image():
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:41, 0:59]
    # 4-bit worth of structured colors + runs (LZW-friendly AND code-growth
    # exercising), then mapped through a 16-entry palette
    idx = ((xx // 3 + yy // 2) % 13 + (rng.integers(0, 3, (41, 59)))).astype(
        np.uint8
    ) % 16
    palette = np.array(
        [[i * 16, 255 - i * 16, (i * 37) % 256] for i in range(16)], np.uint8
    )
    return idx, palette


def test_giflib_encode_our_decode(tmp_path):
    idx, palette = _test_image()
    p = str(tmp_path / "g.gif")
    giflib_encode(p, idx, palette)
    rgb = decode_gif(open(p, "rb").read())
    assert np.array_equal(rgb, palette[idx])


def test_our_encode_giflib_decode(tmp_path):
    idx, palette = _test_image()
    rgb = palette[idx]
    payload = encode_gif(rgb)
    p = str(tmp_path / "o.gif")
    open(p, "wb").write(payload)
    h, w = idx.shape
    got_idx = giflib_decode_indices(p, w, h)
    # our encoder builds its own palette order (np.unique); compare in RGB
    # space through the payload's own global color table
    n_pal = 1 << ((payload[10] & 0x07) + 1)
    table = np.frombuffer(payload[13 : 13 + n_pal * 3], np.uint8).reshape(
        n_pal, 3
    )
    assert np.array_equal(table[got_idx], rgb)


def test_cross_engine_gif_cycle(tmp_path):
    """giflib encode -> our decode -> our encode -> giflib decode."""
    idx, palette = _test_image()
    p1 = str(tmp_path / "a.gif")
    giflib_encode(p1, idx, palette)
    rgb = decode_gif(open(p1, "rb").read())
    payload = encode_gif(rgb)
    p2 = str(tmp_path / "b.gif")
    open(p2, "wb").write(payload)
    h, w = idx.shape
    got_idx = giflib_decode_indices(p2, w, h)
    n_pal = 1 << ((payload[10] & 0x07) + 1)
    table = np.frombuffer(payload[13 : 13 + n_pal * 3], np.uint8).reshape(
        n_pal, 3
    )
    assert np.array_equal(table[got_idx], palette[idx])
