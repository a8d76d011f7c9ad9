"""Native RLE codec tests: roundtrips, string codec, polygon rasterization."""

import numpy as np
import pytest

from anyref_tpu.data import rle


def test_native_lib_builds():
    assert rle._load(), "native librle.so failed to build"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_encode_decode_roundtrip(seed):
    rng = np.random.default_rng(seed)
    m = (rng.random((37, 53)) > 0.7).astype(np.uint8)
    r = rle.encode(m)
    np.testing.assert_array_equal(rle.decode(r), m)
    assert rle.area(r) == m.sum()


def test_bbox():
    m = np.zeros((20, 30), np.uint8)
    m[3:8, 10:25] = 1
    bb = rle.to_bbox(rle.encode(m))
    np.testing.assert_array_equal(bb, [10, 3, 15, 5])


def test_merge_union():
    rng = np.random.default_rng(3)
    a = (rng.random((25, 25)) > 0.6).astype(np.uint8)
    b = (rng.random((25, 25)) > 0.6).astype(np.uint8)
    got = rle.decode(rle.merge([rle.encode(a), rle.encode(b)]))
    np.testing.assert_array_equal(got, np.maximum(a, b))


def test_string_codec_roundtrip():
    rng = np.random.default_rng(4)
    m = (rng.random((64, 48)) > 0.8).astype(np.uint8)
    counts = rle.encode(m)["counts"]
    s = rle.counts_to_string(counts)
    back = rle.string_to_counts(s)
    np.testing.assert_array_equal(back, counts)
    # decoding via a string-carrying annotation
    got = rle.decode({"size": [64, 48], "counts": s})
    np.testing.assert_array_equal(got, m)


def test_polygon_rasterization():
    # axis-aligned rectangle: exact expectation (COCO convention: pixels
    # whose centers fall inside; boundary follows the MaskApi upsample rule)
    poly = [2.0, 3.0, 10.0, 3.0, 10.0, 8.0, 2.0, 8.0]
    m = rle.decode(rle.from_polygons([poly], 12, 15)[0])
    assert m.shape == (12, 15)
    # interior pixels definitely set, exterior definitely not
    assert m[4:7, 3:9].all()
    assert m[:2].sum() == 0 and m[10:].sum() == 0
    assert m[:, :1].sum() == 0 and m[:, 12:].sum() == 0


def test_polygon_vs_pil_iou():
    """Statistical agreement with PIL's rasterizer (different boundary
    conventions; interiors must match)."""
    from PIL import Image, ImageDraw
    rng = np.random.default_rng(5)
    for _ in range(5):
        k = rng.integers(3, 9)
        cx, cy = rng.uniform(20, 60, 2)
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(8, 18, k)
        xs = cx + rad * np.cos(ang)
        ys = cy + rad * np.sin(ang)
        poly = np.stack([xs, ys], 1).reshape(-1).tolist()
        m = rle.decode(rle.from_polygons([poly], 80, 80)[0])
        img = Image.new("L", (80, 80), 0)
        ImageDraw.Draw(img).polygon(list(zip(xs, ys)), outline=1, fill=1)
        p = np.asarray(img, np.uint8)
        inter = (m & p).sum()
        union = (m | p).sum()
        assert union > 0
        assert inter / union > 0.85, f"IoU {inter/union:.3f} too low"


def test_annotation_to_mask_multi_part():
    polys = [[2.0, 2.0, 8.0, 2.0, 8.0, 8.0, 2.0, 8.0],
             [12.0, 12.0, 18.0, 12.0, 18.0, 18.0, 12.0, 18.0]]
    m = rle.annotation_to_mask(polys, 24, 24)
    assert m[4, 4] == 1 and m[14, 14] == 1 and m[10, 10] == 0


def test_string_codec_native_matches_python():
    """The native LEB128 layer must agree byte-for-byte with the Python
    fallback (both directions), including negative deltas and multi-chunk
    counts."""
    rng = np.random.default_rng(11)
    counts = rng.integers(0, 1 << 20, 101).astype(np.uint32)
    counts[0] = 0
    native_s = rle.counts_to_string(counts)
    native_c = rle.string_to_counts(native_s)
    lib = rle._lib
    try:
        rle._lib = False
        py_s = rle.counts_to_string(counts)
        py_c = rle.string_to_counts(native_s)
    finally:
        rle._lib = lib
    assert native_s == py_s
    np.testing.assert_array_equal(native_c, counts)
    np.testing.assert_array_equal(py_c, counts)


def test_string_codec_truncated_raises():
    """A compressed string ending mid-chunk (continuation bit set on the
    final character) must raise, not read past the buffer (native) or
    IndexError-crash inconsistently (fallback)."""
    good = rle.counts_to_string(np.asarray([0, 5, 3, 7], np.uint32))
    # force a trailing continuation bit: append a char with bit 0x20 set
    bad = good + bytes([0x20 + 48])
    with pytest.raises((ValueError, IndexError)):
        rle.string_to_counts(bad)
