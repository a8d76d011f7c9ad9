"""Pallas flash kernels vs XLA oracle.

On the default CPU suite the kernels run in interpret mode (logic
coverage); under ANYREF_TEST_PLATFORM=axon (see conftest) the same tests
compile through Mosaic and execute on the real chip, validating the
hardware lowering against the identical XLA oracles.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anyref_tpu.ops import flash
from anyref_tpu.ops.attention import (attention_with_decomposed_relpos,
                                      causal_attention)

# interpret-mode Pallas on CPU; compiled Mosaic on a real TPU backend.
INTERP = jax.default_backend() != "tpu"


def tol(t):
    """Backend-conditional tolerances. Interpret mode compares fp32 math
    against the fp32 oracle — tight. Compiled on the chip, BOTH the kernel
    and the XLA oracle run fp32 dots at the MXU's default precision (bf16
    input passes) with different accumulation orders, so agreement is
    bf16-eps level (~5e-3 observed); the hardware run exists to catch
    LOWERING bugs (wrong windows/masks/indexing), which are O(1)."""
    t = t if INTERP else max(t, 2e-2)
    return {"rtol": t, "atol": t}


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
                                       interpret=INTERP)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               **tol(2e-4))


@pytest.mark.parametrize("mh", ["1", "0"])
def test_causal_kernel_matches_oracle(monkeypatch, mh):
    """Covers both dispatch paths: the multi-head kernel (grid (B, L/BQ),
    heads unrolled — the prefill-scale default) and the per-(batch, head)
    blocked kernel (large-L fallback, forced via ANYREF_CAUSAL_MH_KERNEL=0).
    Includes a nonzero kv_start row on each."""
    monkeypatch.setenv("ANYREF_CAUSAL_MH_KERNEL", mh)
    B, nh, L, hd = 2, 2, 256, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    want = causal_attention(q, k, v, use_flash=False)
    got = flash.flash_causal_attention(q, k, v, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               **tol(2e-4))
    kv_start = jnp.asarray([0, 70], jnp.int32)
    want = np.asarray(causal_attention(q, k, v, kv_start=kv_start,
                                       use_flash=False))
    got = np.asarray(flash.flash_causal_attention(q, k, v, kv_start=kv_start,
                                                  interpret=INTERP))
    assert not np.isnan(got).any()
    for b in range(B):
        s = int(kv_start[b])
        np.testing.assert_allclose(got[b, :, s:], want[b, :, s:],
                                   **tol(2e-4))


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
                                       interpret=INTERP)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               **tol(2e-4))


def test_causal_kernel_kv_start_no_nan():
    """Left-pad (kv_start) through the kernel at flash-eligible L.

    Regression for the -inf masking bug: fully-masked left-pad query rows
    produced m=-inf -> NaN that poisoned ALL rows in later layers via 0*NaN
    in p@v (ADVICE r1, high). Asserts no NaNs anywhere and exact agreement
    with the XLA oracle on real (non-pad) rows.
    """
    B, nh, L, hd = 2, 2, 256, 64
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    kv_start = jnp.asarray([0, 70], jnp.int32)

    got = np.asarray(flash.flash_causal_attention(q, k, v, kv_start=kv_start,
                                                  interpret=INTERP))
    assert not np.isnan(got).any(), "kernel emitted NaN (pad-row poisoning)"

    want = np.asarray(causal_attention(q, k, v, kv_start=kv_start,
                                       use_flash=False))
    for b in range(B):
        s = int(kv_start[b])
        np.testing.assert_allclose(got[b, :, s:], want[b, :, s:],
                                   **tol(2e-4))


def test_causal_kernel_kv_start_dispatch_path():
    """causal_attention(use_flash=True) routes kv_start through the kernel
    (interpret on CPU) and stays NaN-free end to end."""
    B, nh, L, hd = 2, 2, 128, 64
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
    kv_start = jnp.asarray([33, 0], jnp.int32)
    out = np.asarray(causal_attention(q, k, v, kv_start=kv_start,
                                      use_flash=True))
    assert not np.isnan(out).any()
    want = np.asarray(causal_attention(q, k, v, kv_start=kv_start,
                                       use_flash=False))
    for b in range(B):
        s = int(kv_start[b])
        np.testing.assert_allclose(out[b, :, s:], want[b, :, s:],
                                   **tol(2e-4))


def test_flash_vjp_matches_xla_grads():
    """Custom-VJP flash (training path) must match XLA attention gradients,
    including a nonzero kv_start row and a non-128-multiple length that
    exercises the pad-and-slice path."""
    B, nh, hd = 2, 2, 32
    rng = np.random.default_rng(5)
    for L, kv_start in ((256, jnp.asarray([0, 50], jnp.int32)),
                        (200, None)):
        q = jnp.asarray(rng.standard_normal((B, nh, L, hd)) * 0.3, jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, nh, L, hd)) * 0.3, jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, nh, L, hd)) * 0.3, jnp.float32)
        ct = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.float32)
        if kv_start is not None:
            # fully-masked left-pad query rows have no defined gradient (the
            # XLA oracle's finite-min masking leaks an artifact uniform-
            # softmax grad there; the kernel contributes zero). Real training
            # cotangents at those rows are zero — zero them here too.
            rows = jnp.arange(L)[None, None, :, None]
            ct = jnp.where(rows < kv_start[:, None, None, None], 0.0, ct)

        def loss_flash(q, k, v):
            out = causal_attention(q, k, v, kv_start=kv_start,
                                   use_flash=True, differentiable=True)
            return jnp.sum(out * ct)

        def loss_xla(q, k, v):
            out = causal_attention(q, k, v, kv_start=kv_start,
                                   use_flash=False)
            return jnp.sum(out * ct)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gx, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       **tol(2e-4),
                                       err_msg=f"d{name} L={L}")
        # forward agreement too
        of = causal_attention(q, k, v, kv_start=kv_start, use_flash=True,
                              differentiable=True)
        ox = causal_attention(q, k, v, kv_start=kv_start, use_flash=False)
        np.testing.assert_allclose(np.asarray(of), np.asarray(ox),
                                   **tol(2e-4))


def test_fused_layer_norm_matches_xla():
    from anyref_tpu.ops import flash
    from anyref_tpu.ops.common import layer_norm
    rng = np.random.default_rng(9)
    for shape in ((4, 7, 7, 128), (2, 16, 256), (8, 128)):
        x = jnp.asarray(rng.standard_normal(shape) * 2 + 1, jnp.float32)
        p = {"scale": jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32),
             "bias": jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)}
        want = layer_norm(p, x, eps=1e-6)
        got = flash.layer_norm_fused(x, p["scale"], p["bias"], 1e-6,
                                     interpret=INTERP)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   **tol(1e-5))
    # bf16 storage path
    xb = jnp.asarray(rng.standard_normal((4, 256)), jnp.bfloat16)
    pb = {"scale": jnp.ones((256,), jnp.bfloat16),
          "bias": jnp.zeros((256,), jnp.bfloat16)}
    want = layer_norm(pb, xb, eps=1e-6)
    got = flash.layer_norm_fused(xb, pb["scale"], pb["bias"], 1e-6,
                                 interpret=INTERP)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               **tol(1e-2))


def test_fused_rms_norm_matches_xla():
    from anyref_tpu.ops import flash
    from anyref_tpu.ops.common import rms_norm
    rng = np.random.default_rng(10)
    for shape in ((2, 640, 128), (16, 256)):
        x = jnp.asarray(rng.standard_normal(shape) * 2, jnp.float32)
        p = {"scale": jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)}
        want = rms_norm(p, x, eps=1e-6)
        got = flash.rms_norm_fused(x, p["scale"], 1e-6, interpret=INTERP)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   **tol(1e-5))


def test_relpos_qkv_kernel_matches_split_path():
    """The QKV-direct window kernel (heads as VMEM column slices) must equal
    the head-split kernel/oracle path."""
    H = W = 14
    hd, nh, B = 80, 4, 3
    L, C = H * W, 4 * 80
    rng = np.random.default_rng(12)
    qkv = jnp.asarray(rng.standard_normal((B, L, 3 * C)) * 0.3, jnp.float32)
    rh = jnp.asarray(rng.standard_normal((H, H, hd)) * 0.1, jnp.float32)
    rw = jnp.asarray(rng.standard_normal((W, W, hd)) * 0.1, jnp.float32)

    got = flash.flash_relpos_attention_qkv(qkv, rh, rw, (H, W), nh,
                                           interpret=INTERP)
    # oracle: split heads, run the reference attention, merge
    q, k, v = (qkv[..., i * C:(i + 1) * C].reshape(B, L, nh, hd)
               .transpose(0, 2, 1, 3) for i in range(3))
    want = attention_with_decomposed_relpos(q, k, v, rh, rw, (H, W),
                                            use_flash=False)
    want = np.asarray(want).transpose(0, 2, 1, 3).reshape(B, L, C)
    np.testing.assert_allclose(np.asarray(got), want, **tol(2e-4))


@pytest.mark.parametrize("wg,mlp_chunk,split,hdpad", [
    ("1", None, False, False), ("3", "256", False, False),
    ("4", "128", False, False),        # wg=4: NW=18 pads to 20
    ("1", None, True, False), ("3", "256", True, False),
    ("3", None, True, True)])          # lane-padded head width (HDPAD)
def test_fused_window_block_matches_resident_oracle(monkeypatch, wg,
                                                    mlp_chunk, split,
                                                    hdpad):
    """The whole-layer fused window kernel (LN1+mask+QKV+relpos attention+
    proj+residual+LN2+MLP) must equal the unfused resident path, including
    in-kernel pad-mask computation on overhanging edge windows. wg=3
    exercises the fori_loop-over-windows path (merged-row GEMMs with
    per-window attention iteration); mlp_chunk forces the column-chunked
    MLP (fp32 partial-sum accumulation) the 7B shapes use by default;
    split=True runs the two-kernel variant (fused_window_attn +
    fused_mlp_stream, ANYREF_FUSED_SPLIT=1)."""
    monkeypatch.setenv("ANYREF_QKV_WINDOW_KERNEL", "0")
    monkeypatch.setenv("ANYREF_FUSED_WG", wg)
    # split defaults ON (r4) — pin it both ways so the combined-kernel rows
    # keep covering the combined kernel
    monkeypatch.setenv("ANYREF_FUSED_SPLIT", "1" if split else "0")
    if hdpad:
        monkeypatch.setenv("ANYREF_FUSED_HDPAD", "1")
    if mlp_chunk is not None:
        monkeypatch.setenv("ANYREF_FUSED_MLP_CHUNK", mlp_chunk)
    from anyref_tpu.config import SamConfig
    from anyref_tpu.models.sam import image_encoder as enc

    ws, nh, hd = 8, 4, 32
    C = nh * hd
    H = W = 20                      # pads to 24 -> 3x3 windows, edges overhang
    cfg = SamConfig(encoder_embed_dim=C, encoder_depth=1,
                    encoder_num_heads=nh, encoder_global_attn_indexes=(),
                    image_size=H * 16, window_size=ws, prompt_embed_dim=32)
    rng = np.random.default_rng(5)
    mlp = int(C * cfg.mlp_ratio)

    def lin(i, o):
        return {"w": jnp.asarray(rng.standard_normal((i, o)) * i ** -0.5,
                                 jnp.float32),
                "b": jnp.asarray(rng.standard_normal((o,)) * 0.02,
                                 jnp.float32)}

    def ln(d):
        return {"scale": jnp.asarray(1 + 0.1 * rng.standard_normal((d,)),
                                     jnp.float32),
                "bias": jnp.asarray(0.05 * rng.standard_normal((d,)),
                                    jnp.float32)}

    p = {"norm1": ln(C), "norm2": ln(C),
         "attn": {"qkv": lin(C, 3 * C), "proj": lin(C, C),
                  "rel_pos_h": jnp.asarray(
                      rng.standard_normal((2 * ws - 1, hd)) * 0.1,
                      jnp.float32),
                  "rel_pos_w": jnp.asarray(
                      rng.standard_normal((2 * ws - 1, hd)) * 0.1,
                      jnp.float32)},
         "mlp": {"lin1": lin(C, mlp), "lin2": lin(mlp, C)}}

    B = 2
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.5, jnp.float32)
    xw, pad_hw = enc._window_partition(x, ws)
    pad_mask, _ = enc._window_partition(jnp.ones((1, H, W, 1), x.dtype), ws)
    mask = jnp.tile(pad_mask, (B, 1, 1, 1))

    want = enc._block_windowed_resident(p, xw, mask, cfg)
    got = enc._fused_window_layer(
        p, xw.reshape(xw.shape[0], ws * ws, C), cfg, (H, W),
        pad_hw[1] // ws).reshape(xw.shape)
    # compare on valid positions (pad rows hold path-dependent garbage that
    # is never read: re-masked next layer, cropped at unpartition)
    np.testing.assert_allclose(np.asarray(got * mask),
                               np.asarray(want * mask),
                               **tol(3e-4))
    # and the final unpartitioned (cropped) tensors agree
    a = enc._window_unpartition(got, ws, pad_hw, (H, W))
    b = enc._window_unpartition(want, ws, pad_hw, (H, W))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               **tol(3e-4))


@pytest.mark.parametrize("H,W", [(32, 32), (16, 64)])
def test_fused_global_tail_matches_unfused_block(monkeypatch, H, W):
    """The fused GLOBAL-block tail (rel-pos attention via transposed-score
    sublane-broadcast bias + proj + residual + LN2 + MLP, one Pallas call
    per image) must equal the unfused global block path. The non-square
    grid catches kh/kw axis mixups in the bias broadcast (bias_T[k, q] =
    rhT[k//W, q] + rwT[k%W, q]) that a square grid hides."""
    from anyref_tpu.config import SamConfig
    from anyref_tpu.models.sam import image_encoder as enc

    nh, hd = 2, 32
    C = nh * hd
    cfg = SamConfig(encoder_embed_dim=C, encoder_depth=1,
                    encoder_num_heads=nh, encoder_global_attn_indexes=(0,),
                    image_size=H * 16, window_size=14, prompt_embed_dim=32)
    assert flash.supported_global_fused(H, W, hd)
    rng = np.random.default_rng(17)
    mlp = int(C * cfg.mlp_ratio)

    def lin(i, o):
        return {"w": jnp.asarray(rng.standard_normal((i, o)) * i ** -0.5,
                                 jnp.float32),
                "b": jnp.asarray(rng.standard_normal((o,)) * 0.02,
                                 jnp.float32)}

    def ln(d):
        return {"scale": jnp.asarray(1 + 0.1 * rng.standard_normal((d,)),
                                     jnp.float32),
                "bias": jnp.asarray(0.05 * rng.standard_normal((d,)),
                                    jnp.float32)}

    p = {"norm1": ln(C), "norm2": ln(C),
         "attn": {"qkv": lin(C, 3 * C), "proj": lin(C, C),
                  "rel_pos_h": jnp.asarray(
                      rng.standard_normal((2 * H - 1, hd)) * 0.1,
                      jnp.float32),
                  "rel_pos_w": jnp.asarray(
                      rng.standard_normal((2 * W - 1, hd)) * 0.1,
                      jnp.float32)},
         "mlp": {"lin1": lin(C, mlp), "lin2": lin(mlp, C)}}
    x = jnp.asarray(rng.standard_normal((2, H, W, C)) * 0.5, jnp.float32)

    monkeypatch.setenv("ANYREF_FUSED_GLOBAL_BLOCK", "0")
    want = enc._block(p, x, cfg, window=False)
    monkeypatch.setenv("ANYREF_FUSED_GLOBAL_BLOCK", "1")
    got = enc._block(p, x, cfg, window=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               **tol(3e-4))


def test_mha_qkv_kernel_matches_split_oracle(monkeypatch):
    """The plain QKV-direct MHA kernel (CLIP path) must equal the
    split-head XLA oracle at CLIP's L=257 (odd, non-tile-aligned)."""
    from anyref_tpu.ops import attention as att

    B, L, nh, hd = 2, 257, 4, 64
    C = nh * hd
    rng = np.random.default_rng(21)
    qkv = jnp.asarray(rng.standard_normal((B, L, 3 * C)) * 0.3, jnp.float32)
    monkeypatch.setenv("ANYREF_QKV_MHA_KERNEL", "1")
    got = att.mha_qkv(qkv, nh)
    monkeypatch.setenv("ANYREF_QKV_MHA_KERNEL", "0")
    want = att.mha_qkv(qkv, nh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               **tol(2e-5))


def test_pallas_master_switch(monkeypatch):
    """ANYREF_PALLAS=0 must force every supported_* gate off (the multi-
    device SPMD compile path relies on this to avoid un-partitionable
    Mosaic custom calls — see ops/flash.pallas_enabled)."""
    from anyref_tpu.ops import flash

    assert flash.supported_layer_norm(256, 256)
    assert flash.supported_causal(256, 256, 64)
    monkeypatch.setenv("ANYREF_PALLAS", "0")
    assert not flash.pallas_enabled()
    assert not flash.supported_layer_norm(256, 256)
    assert not flash.supported_causal(256, 256, 64)
    assert not flash.supported_relpos(14, 14, 64)
    assert not flash.supported_global_fused(64, 64, 80)
