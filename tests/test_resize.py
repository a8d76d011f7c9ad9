"""Bilinear resize parity vs torch F.interpolate(align_corners=False)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from anyref_tpu.ops.resize import (get_preprocess_shape, resize_bilinear,
                                   resize_bilinear_np, sam_normalize_pad)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((256, 256), (1024, 1024)),   # SAM postprocess stage 1
    ((64, 48), (256, 256)),
    ((480, 640), (224, 224)),     # CLIP force-resize
    ((1024, 768), (480, 640)),    # original-size restore
    ((7, 5), (13, 11)),
])
def test_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), out_hw, mode="bilinear",
                         align_corners=False).numpy()
    # atol 1e-4: separable two-pass accumulates fp32 rounding differently
    # from torch's fused 4-tap kernel; immaterial at mask-threshold scale.
    got = np.asarray(resize_bilinear(jnp.asarray(x), *out_hw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    got_np = resize_bilinear_np(x, *out_hw)
    np.testing.assert_allclose(got_np, want, rtol=1e-4, atol=1e-4)


def test_preprocess_shape():
    # reference utils/transforms.py:102-113
    assert get_preprocess_shape(480, 640, 1024) == (768, 1024)
    assert get_preprocess_shape(640, 480, 1024) == (1024, 768)
    assert get_preprocess_shape(427, 640, 1024) == (683, 1024)


def test_sam_normalize_pad():
    x = np.full((3, 100, 200), 123.675, np.float32)
    x[1] = 116.28
    x[2] = 103.53
    out = np.asarray(sam_normalize_pad(jnp.asarray(x), 256,
                                       (123.675, 116.28, 103.53),
                                       (58.395, 57.12, 57.375)))
    assert out.shape == (3, 256, 256)
    np.testing.assert_allclose(out[:, :100, :200], 0.0, atol=1e-6)
    # padding holds the *padded zeros normalized*? No: pad AFTER normalize -> 0
    np.testing.assert_allclose(out[:, 100:, :], 0.0)
    np.testing.assert_allclose(out[:, :, 200:], 0.0)
