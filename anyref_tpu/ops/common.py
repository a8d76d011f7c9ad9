"""Shared functional NN primitives.

Parameter convention: nested dicts of jnp arrays.
  linear: {"w": [in, out], "b": [out]?}         (torch stores [out, in]; the
                                                 checkpoint converter transposes)
  layer_norm: {"scale": [d], "bias": [d]}
  conv: {"w": [out, in, kh, kw], "b": [out]?}   (torch OIHW layout kept verbatim)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as _P


def _norm_mesh(_flash, x):
    """Multi-device norm dispatch: shard the leading (batch-major) dim over
    "data" when a kernel mesh is active (Mosaic calls can't be GSPMD-auto-
    partitioned; see flash.set_kernel_mesh). Returns (mesh_or_None,
    data_axis_size) — the gate must see the per-shard row count — or
    (None, 0) when a mesh is active but the rows don't shard evenly (the
    kernel must NOT run unwrapped inside a multi-device program; d=0 fails
    the supported_layer_norm gate so the XLA norm runs instead)."""
    m = _flash.kernel_mesh()
    if m is None:
        return None, 1
    d = m.shape.get("data", 1)
    if x.shape[0] % d:
        return None, 0   # not evenly shardable: force the XLA norm
    return m, d


def linear(p, x: jax.Array) -> jax.Array:
    if "w_q" in p:  # int8-quantized weight (ops/quant.py)
        from .quant import quant_linear
        return quant_linear(p, x)
    if "w_t" in p:  # transposed [out, in] storage (serving layout option)
        y = jnp.einsum("...i,oi->...o", x, p["w_t"],
                       preferred_element_type=x.dtype)
    else:
        y = jnp.einsum("...i,io->...o", x, p["w"],
                       preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def layer_norm(p, x: jax.Array, eps: float = 1e-6,
               fused: bool = False) -> jax.Array:
    """LayerNorm over the last dim, moments in fp32.

    ``fused`` routes large aligned shapes through the Pallas kernel
    (ops/flash.py layer_norm_fused). Measured on v5e: the kernel itself runs
    at HBM-streaming speed (~0.06 ms vs 0.36 ms for XLA's convert+reduce
    fusion at SAM-H scale), but end-to-end encode time is NEUTRAL — XLA
    redistributes the surrounding per-layer fusion cost (see BASELINE.md
    profile). Kept because it makes norm cost explicit and independent of
    XLA fusion heuristics. Same fp32 math."""
    if fused:
        from . import flash as _flash
        C = x.shape[-1]
        N = x.size // max(C, 1)
        m, d = _norm_mesh(_flash, x)
        if d and _flash.supported_layer_norm(N // d, C):
            interpret = jax.default_backend() != "tpu"
            call = _flash.shard_wrap(
                lambda x_, s_, b_: _flash.layer_norm_fused(
                    x_, s_, b_, eps, interpret=interpret),
                in_specs=(_P("data"), _P(), _P()), out_specs=_P("data"),
                mesh=m)
            return call(x, p["scale"], p["bias"])
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm_2d(p, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Channel-wise LayerNorm for NCHW tensors (reference
    segment_anything/modeling/common.py:28-43)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32)[:, None, None] \
        + p["bias"].astype(jnp.float32)[:, None, None]
    return y.astype(x.dtype)


def rms_norm(p, x: jax.Array, eps: float = 1e-6,
             fused: bool = False) -> jax.Array:
    """``fused`` routes large aligned shapes through the Pallas kernel on
    INFERENCE paths (no VJP; training keeps XLA). Measured e2e-neutral on
    prefill (47 ms either way) — see layer_norm. Same fp32 math."""
    if fused:
        from . import flash as _flash
        C = x.shape[-1]
        N = x.size // max(C, 1)
        m, d = _norm_mesh(_flash, x)
        if d and _flash.supported_layer_norm(N // d, C):
            interpret = jax.default_backend() != "tpu"
            call = _flash.shard_wrap(
                lambda x_, s_: _flash.rms_norm_fused(
                    x_, s_, eps, interpret=interpret),
                in_specs=(_P("data"), _P()), out_specs=_P("data"), mesh=m)
            return call(x, p["scale"])
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


def conv2d(p, x: jax.Array, stride=(1, 1), padding="VALID") -> jax.Array:
    """NCHW conv with torch-layout OIHW weights."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)[None, :, None, None]
    return y


def conv2d_transpose(p, x: jax.Array, stride: int) -> jax.Array:
    """ConvTranspose2d with kernel_size == stride (SAM upscaling deconvs,
    reference mask_decoder.py:53-63). Non-overlapping, so it is exactly a
    matmul + depth-to-space. torch weight layout: [in, out, kh, kw]."""
    w = p["w"].astype(x.dtype)  # [in, out, k, k]
    cin, cout, k, _ = w.shape
    b, c, h, wdt = x.shape
    # [B, H, W, in] @ [in, out*k*k]
    y = jnp.einsum("bchw,cokl->bhwokl", x, w, preferred_element_type=x.dtype)
    y = y.transpose(0, 3, 1, 4, 2, 5).reshape(b, cout, h * k, wdt * k)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)[None, :, None, None]
    return y


def mha(q: jax.Array, k: jax.Array, v: jax.Array,
        bias: jax.Array | None = None,
        mask: jax.Array | None = None,
        scale: float | None = None) -> jax.Array:
    """Reference multi-head attention; q/k/v: [..., heads, len, head_dim].

    Softmax in fp32. The Pallas flash path replaces this for the hot shapes;
    this XLA version is the numerics oracle and the fallback.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", probs.astype(v.dtype), v,
                      preferred_element_type=v.dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU, matching torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP / ImageBind QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)
