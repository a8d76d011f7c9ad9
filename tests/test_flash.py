"""Pallas flash kernels vs XLA oracle (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from anyref_tpu.ops import flash
from anyref_tpu.ops.attention import (attention_with_decomposed_relpos,
                                      causal_attention)


def test_relpos_kernel_matches_oracle():
    H = W = 32
    hd, nh, B = 64, 2, 1
    L = H * W
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    rh = jnp.asarray(rng.standard_normal((H, H, hd)) * 0.1, jnp.float32)
    rw = jnp.asarray(rng.standard_normal((W, W, hd)) * 0.1, jnp.float32)

    want = attention_with_decomposed_relpos(q, k, v, rh, rw, (H, W),
                                            use_flash=False)
    got = flash.flash_relpos_attention(q, k, v, rh, rw, (H, W),
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_causal_kernel_matches_oracle():
    B, nh, L, hd = 2, 2, 256, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    want = causal_attention(q, k, v, use_flash=False)
    got = flash.flash_causal_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_supported_gates():
    assert flash.supported_relpos(64, 64, 80)       # global layers
    assert flash.supported_relpos(14, 14, 80)       # whole-window blocks
    assert not flash.supported_relpos(4, 4, 32)     # too tiny to bother
    assert flash.supported_causal(512, 512, 128)
    assert not flash.supported_causal(1, 512, 128)  # decode stays on XLA


def test_relpos_kernel_window_shape():
    """Whole-window (14x14) single-block path."""
    H = W = 14
    hd, nh, B = 80, 2, 3
    L = H * W
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    rh = jnp.asarray(rng.standard_normal((H, H, hd)) * 0.1, jnp.float32)
    rw = jnp.asarray(rng.standard_normal((W, W, hd)) * 0.1, jnp.float32)
    want = attention_with_decomposed_relpos(q, k, v, rh, rw, (H, W),
                                            use_flash=False)
    got = flash.flash_relpos_attention(q, k, v, rh, rw, (H, W),
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
