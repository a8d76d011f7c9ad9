"""Weight-only int8 quantization with a Pallas dequant-matmul kernel.

Measured study on v5e (this environment, single chip):
  * bf16 decode under XLA streams weights at ~684 GB/s effective
    (19.6 ms/step for the 7B = 84% of HBM peak) — already near
    speed-of-light for bf16 storage;
  * int8 paths all plateau at ~90-140 GB/s of weight bytes, regardless of
    layout (row/col-major, pre-tiled contiguous blocks), DMA depth (manual
    4-deep double buffering), or engine (this Pallas kernel, XLA
    convert-then-dot, XLA native int8xint8 dot_general). The ceiling is the
    element path: the int8->bf16 convert/reduce rate (~105 G elem/s), not
    HBM bytes — on this XLA/libtpu version there is no fast int8 GEMV path,
    so int8 storage LOSES to bf16 for decode despite halving bytes.

The kernel is therefore kept correct + tested but not enabled by default;
its HBM savings (~6.6 GiB for the 7B) are what unlocks batch>=2 serving, so
revisiting the native-MXU int8 path (or fp8 on hardware that feeds the MXU
without a VPU convert) is the top perf roadmap item.

Usage: ``quantize_llama(params)`` returns a tree consumed transparently by
``ops.common.linear``; the Pallas kernel tiles rows/outputs/reduction with
output revisiting and per-output-channel symmetric scales on the f32
accumulator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_int8(w: jax.Array) -> dict:
    """[in, out] float -> {"w_q": int8 [in, out], "scale": f32 [out]}
    (symmetric per-output-channel)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "scale": scale}


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_in_tiles: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]                                  # [RB, IB] bf16
    w = w_ref[:].astype(x.dtype)                  # [IB, OB] int8 -> bf16
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ki == n_in_tiles - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0].astype(jnp.float32)[None]
                    ).astype(o_ref.dtype)


def _pad_to(x, axis, m):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def int8_matmul(x: jax.Array, w_q: jax.Array, scale: jax.Array,
                interpret: bool = False) -> jax.Array:
    """x: [..., in] bf16; w_q: [in, out] int8; scale: [out] f32.
    Returns [..., out] in x.dtype."""
    orig_shape = x.shape
    din, dout = w_q.shape
    x2 = x.reshape(-1, din)
    rows = x2.shape[0]

    RB = 256 if rows > 256 else max(16, 1 << max(rows - 1, 0).bit_length())
    OB = 512
    IB = 2048 if din % 2048 == 0 else 1024 if din % 1024 == 0 else din
    x2 = _pad_to(x2, 0, RB)
    wq = _pad_to(_pad_to(w_q, 1, OB), 0, IB)
    sc = _pad_to(scale, 0, OB).reshape(1, -1)
    R, I, O = x2.shape[0], wq.shape[0], wq.shape[1]
    x2 = _pad_to(x2, 1, IB)

    n_in = I // IB
    out = pl.pallas_call(
        functools.partial(_kernel, n_in_tiles=n_in),
        grid=(R // RB, O // OB, n_in),
        in_specs=[
            pl.BlockSpec((RB, IB), lambda r, o, k: (r, k)),
            pl.BlockSpec((IB, OB), lambda r, o, k: (k, o)),
            pl.BlockSpec((1, OB), lambda r, o, k: (0, o)),
        ],
        out_specs=pl.BlockSpec((RB, OB), lambda r, o, k: (r, o)),
        out_shape=jax.ShapeDtypeStruct((R, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((RB, OB), jnp.float32)],
        interpret=interpret,
    )(x2, wq, sc)
    return out[:rows, :dout].reshape(*orig_shape[:-1], dout)


def int8_matmul_xla(x: jax.Array, w_q: jax.Array, scale: jax.Array) -> jax.Array:
    """XLA fallback (CPU tests / shapes the kernel doesn't cover)."""
    y = jnp.einsum("...i,io->...o", x.astype(jnp.float32),
                   w_q.astype(jnp.float32))
    return (y * scale).astype(x.dtype)


def quant_linear(p: dict, x: jax.Array) -> jax.Array:
    """linear() drop-in for {"w_q", "scale"} params."""
    from . import flash as _flash

    # multi-device: the XLA path partitions under GSPMD (quantized decoder
    # weights shard their CONTRACTION dim on row-parallel layers, which a
    # local shard_map wrap can't express without an explicit psum)
    if (jax.default_backend() == "tpu" and _flash.pallas_enabled()
            and _flash.kernel_mesh() is None):
        y = int8_matmul(x, p["w_q"], p["scale"])
    else:
        y = int8_matmul_xla(x, p["w_q"], p["scale"])
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def quantize_llama(params: dict) -> dict:
    """Quantize every decoder matmul weight (q/k/v/o/gate/up/down + lm_head)
    to int8; norms/embeddings stay as-is. Returns a new param tree consumed
    transparently by ops.common.linear."""
    out = dict(params)
    layers = []
    for layer in params["layers"]:
        new = {"input_norm": layer["input_norm"],
               "post_attn_norm": layer["post_attn_norm"],
               "attn": {}, "mlp": {}}
        for k in ("q", "k", "v", "o"):
            new["attn"][k] = quantize_int8(layer["attn"][k]["w"])
        for k in ("gate", "up", "down"):
            new["mlp"][k] = quantize_int8(layer["mlp"][k]["w"])
        layers.append(new)
    out["layers"] = layers
    lm = quantize_int8(params["lm_head"])
    out["lm_head_q"] = lm
    out["lm_head"] = None
    out["embed_tokens"] = params["embed_tokens"].astype(jnp.bfloat16)
    return out
