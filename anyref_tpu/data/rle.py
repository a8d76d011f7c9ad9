"""COCO RLE mask codec — ctypes bindings over native/rle.cpp, plus the COCO
string (de)compression layer and numpy fallbacks.

Replaces pycocotools.mask (decode/encode/frPyObjects/merge/area/toBbox) —
the reference's only native data dependency (utils/coco_instance.py:296-309).
The .so is built on demand with g++ (no pybind11; plain C ABI).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_HERE, "native", "rle.cpp")
_SO = os.path.join(_HERE, "native", "librle.so")

_lib = None
_load_lock = threading.Lock()


def _load():
    global _lib
    with _load_lock:   # loader worker threads race first-use in-process
        return _load_locked()


def _load_locked():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (os.path.exists(_SRC) and
                                   os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
        try:
            # build to a UNIQUE temp path then atomically rename: concurrent
            # first-use (other processes sharing the repo — in-process
            # threads are serialized by _load_lock) must never dlopen a
            # partially written .so, and two builders must never interleave
            # writes into one temp file (a PID-keyed name still collides
            # across threads; mkstemp never collides)
            import tempfile
            fd, tmp = tempfile.mkstemp(suffix=".so.tmp",
                                       dir=os.path.dirname(_SO))
            os.close(fd)
            subprocess.run(["g++", "-O3", "-march=native", "-shared", "-fPIC",
                            _SRC, "-o", tmp], check=True, capture_output=True)
            os.replace(tmp, _SO)
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_SO)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.rle_encode.restype = ctypes.c_int
        lib.rle_encode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u32p]
        lib.rle_decode.restype = None
        lib.rle_decode.argtypes = [u32p, ctypes.c_int, u8p, ctypes.c_long]
        lib.rle_area.restype = ctypes.c_ulonglong
        lib.rle_area.argtypes = [u32p, ctypes.c_int]
        lib.rle_merge_or.restype = ctypes.c_int
        lib.rle_merge_or.argtypes = [u32p, ctypes.c_int, u32p, ctypes.c_int,
                                     u32p, ctypes.c_long]
        lib.rle_to_bbox.restype = None
        lib.rle_to_bbox.argtypes = [u32p, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_double)]
        lib.rle_from_poly.restype = ctypes.c_int
        lib.rle_from_poly.argtypes = [ctypes.POINTER(ctypes.c_double),
                                      ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                      u32p]
        lib.rle_from_string.restype = ctypes.c_int
        lib.rle_from_string.argtypes = [u8p, ctypes.c_long, u32p]
        lib.rle_to_string.restype = ctypes.c_long
        lib.rle_to_string.argtypes = [u32p, ctypes.c_int, u8p]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def _u32(arr):
    return np.ascontiguousarray(arr, np.uint32)


def _counts(rle: dict) -> np.ndarray:
    """An RLE dict's counts as np.uint32, decompressing the COCO string
    encoding when present (single normalization point for all entry ops)."""
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = string_to_counts(counts)
    return _u32(counts)


# ---------------------------------------------------------------------------
# core codec
# ---------------------------------------------------------------------------
def encode(mask: np.ndarray) -> dict:
    """[H, W] {0,1} -> rle dict {"size": [h, w], "counts": np.uint32[...]}"""
    h, w = mask.shape
    fmask = np.asfortranarray(mask, np.uint8).reshape(-1, order="F")
    lib = _load()
    if lib:
        out = np.empty(h * w + 1, np.uint32)
        m = lib.rle_encode(
            fmask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
        counts = out[:m].copy()
    else:
        flat = fmask.astype(np.int8)
        change = np.flatnonzero(np.diff(flat)) + 1
        idx = np.concatenate([[0], change, [h * w]])
        counts = np.diff(idx).astype(np.uint32)
        if flat[0] == 1:
            counts = np.concatenate([[np.uint32(0)], counts])
    return {"size": [h, w], "counts": counts}


def decode(rle: dict) -> np.ndarray:
    """rle dict -> [H, W] uint8 mask."""
    h, w = rle["size"]
    counts = _counts(rle)
    lib = _load()
    if lib:
        out = np.empty(h * w, np.uint8)
        lib.rle_decode(counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                       len(counts),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       h * w)
    else:
        vals = np.zeros(len(counts), np.uint8)
        vals[1::2] = 1
        out = np.repeat(vals, counts)
        out = np.pad(out, (0, h * w - len(out)))[: h * w]
    return out.reshape(w, h).T  # column-major -> [H, W]


def area(rle: dict) -> int:
    return int(np.asarray(_counts(rle), np.uint64)[1::2].sum())


def to_bbox(rle: dict) -> np.ndarray:
    """rle -> [x, y, w, h]."""
    h, w = rle["size"]
    counts = _counts(rle)
    lib = _load()
    if lib:
        bb = np.zeros(4, np.float64)
        lib.rle_to_bbox(counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                        len(counts), h, w,
                        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return bb
    m = decode({"size": [h, w], "counts": counts})
    ys, xs = np.nonzero(m)
    if len(xs) == 0:
        return np.zeros(4)
    return np.asarray([xs.min(), ys.min(), xs.max() - xs.min() + 1,
                       ys.max() - ys.min() + 1], np.float64)


def merge(rles: Sequence[dict]) -> dict:
    """Union of RLEs (pycocotools merge(intersect=False))."""
    assert rles
    h, w = rles[0]["size"]
    lib = _load()
    cur = _counts(rles[0])
    if lib:
        for r in rles[1:]:
            b = _counts(r)
            out = np.empty(h * w + 1, np.uint32)
            m = lib.rle_merge_or(
                cur.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(cur),
                b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(b),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), h * w)
            cur = out[:m].copy()
        return {"size": [h, w], "counts": cur}
    acc = decode(rles[0])
    for r in rles[1:]:
        acc = np.maximum(acc, decode(r))
    return encode(acc)


def from_polygons(polys: List[Sequence[float]], h: int, w: int) -> List[dict]:
    """Polygon lists ([x0, y0, x1, y1, ...]) -> RLEs (pycocotools
    frPyObjects for polygon input)."""
    lib = _load()
    out = []
    for poly in polys:
        xy = np.ascontiguousarray(poly, np.float64)
        k = len(xy) // 2
        if lib:
            buf = np.empty(h * w + 2, np.uint32)
            m = lib.rle_from_poly(
                xy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), k, h, w,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
            out.append({"size": [h, w], "counts": buf[:m].copy()})
        else:
            out.append(encode(_poly_fill_np(xy.reshape(-1, 2), h, w)))
    return out


def annotation_to_mask(segmentation, h: int, w: int) -> np.ndarray:
    """COCO annotation 'segmentation' (polygons | uncompressed RLE |
    compressed RLE) -> [H, W] uint8 (reference utils/coco_instance.py:296-309
    semantics: any() over instance parts)."""
    if isinstance(segmentation, list):
        rles = from_polygons(segmentation, h, w)
        return decode(merge(rles)) if len(rles) > 1 else decode(rles[0])
    counts = segmentation["counts"]
    if isinstance(counts, list):
        return decode({"size": segmentation["size"],
                       "counts": np.asarray(counts, np.uint32)})
    return decode(segmentation)


def _poly_fill_np(pts: np.ndarray, h: int, w: int) -> np.ndarray:
    """Numpy fallback polygon fill (even-odd, pixel centers)."""
    from PIL import Image, ImageDraw
    img = Image.new("L", (w, h), 0)
    ImageDraw.Draw(img).polygon([tuple(p) for p in pts], outline=1, fill=1)
    return np.asarray(img, np.uint8)


# ---------------------------------------------------------------------------
# COCO compressed-string layer
# ---------------------------------------------------------------------------
def string_to_counts(s) -> np.ndarray:
    """COCO LEB128-style char encoding -> counts (delta-decoded). Native
    fast path (crowd/gRefCOCO annotations store compressed RLE, and the
    per-character Python loop would dominate the loader CPU budget)."""
    if isinstance(s, str):
        s = s.encode()
    lib = _load()
    if lib:
        buf = np.frombuffer(s, np.uint8)
        out = np.empty(len(s) + 1, np.uint32)   # >= one count per char
        m = lib.rle_from_string(
            np.ascontiguousarray(buf).ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)), len(s),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
        if m < 0:   # mirrors the Python fallback's IndexError on truncation
            raise ValueError("truncated COCO RLE string (continuation bit "
                             "set on the final character)")
        return out[:m].copy()
    counts = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.uint32)


def counts_to_string(counts) -> bytes:
    """counts -> COCO char encoding (delta-encoded for i > 2)."""
    counts = np.asarray(counts, np.int64)
    lib = _load()
    if lib:
        c32 = _u32(counts)
        buf = np.empty(16 * max(len(c32), 1), np.uint8)  # >= 8 chars/count
        n = lib.rle_to_string(
            c32.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(c32),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return bytes(buf[:n])
    out = bytearray()
    for i, c in enumerate(counts):
        x = int(c - counts[i - 2]) if i > 2 else int(c)
        more = True
        while more:
            chunk = x & 0x1F
            x >>= 5
            more = (x != -1) if (chunk & 0x10) else (x != 0)
            if more:
                chunk |= 0x20
            out.append(chunk + 48)
    return bytes(out)
