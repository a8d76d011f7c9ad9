"""Attention entry points.

Two tiers, one signature:
  * XLA oracle implementations (this file) — correctness reference, used in
    tests and as fallback;
  * Pallas flash kernels (anyref_tpu/ops/flash.py) — the production path for
    the hot shapes (SAM global 4096-token attention with rel-pos bias, LLaMA
    causal prefill), selected via `use_flash`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from . import flash as _flash
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS


def _interpret() -> bool:
    # Pallas kernels compile only for TPU; CPU (tests, virtual meshes) runs
    # the interpreter.
    return jax.default_backend() != "tpu"


def attention_with_decomposed_relpos(
    q: jax.Array, k: jax.Array, v: jax.Array,
    rel_h_table: jax.Array, rel_w_table: jax.Array,
    size_hw: tuple[int, int],
    use_flash: bool = True,
) -> jax.Array:
    """SAM ViTDet attention with decomposed relative position bias
    (reference image_encoder.py:235-260, 354-392).

    q, k, v: [B, heads, H*W, head_dim]; rel_*_table: [S, S, head_dim] gathered
    tables; bias[q, k] = q . rel_h[qh, kh] + q . rel_w[qw, kw].
    Softmax in fp32.
    """
    H, W = size_hw
    B, nh, L, hd = q.shape
    scale = hd ** -0.5

    if use_flash and _flash.supported_relpos(H, W, hd):
        m = _flash.kernel_mesh()
        if m is None or B % m.shape.get(DATA_AXIS, 1) == 0:
            call = functools.partial(_flash.flash_relpos_attention,
                                     size_hw=size_hw, interpret=_interpret())
            # multi-device: batch over "data", heads local (vision towers
            # replicate over "model" — parallel/partition.py)
            call = _flash.shard_wrap(
                call, in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                                P(), P()),
                out_specs=P(DATA_AXIS), mesh=m)
            return call(q, k, v, rel_h_table, rel_w_table)
        # mesh set but batch not divisible: XLA oracle below

    qg = q.reshape(B, nh, H, W, hd)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", qg, rel_h_table.astype(q.dtype),
                       preferred_element_type=jnp.float32)
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", qg, rel_w_table.astype(q.dtype),
                       preferred_element_type=jnp.float32)
    logits = jnp.einsum("bnqd,bnkd->bnqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits.reshape(B, nh, H, W, H, W)
    logits = logits + rel_h[..., :, None] + rel_w[..., None, :]
    logits = logits.reshape(B, nh, L, L)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bnqk,bnkd->bnqd", probs, v,
                      preferred_element_type=v.dtype)


def causal_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     q_offset: int | jax.Array = 0,
                     kv_len: jax.Array | None = None,
                     kv_start: jax.Array | None = None,
                     use_flash: bool = True,
                     differentiable: bool = False) -> jax.Array:
    """Causal (prefill or single-step decode) attention.

    q: [B, heads, Lq, hd]; k/v: [B, heads, Lk, hd]. Query position i attends
    to key positions <= i + q_offset. `kv_len` masks trailing (right-padded)
    kv positions; `kv_start` [B] masks leading (left-padded) kv positions —
    the reference's batched-generate attention_masks (DataCollector left_pad,
    utils/coco_instance.py:121-160).
    """
    B, nh, Lq, hd = q.shape
    Lk = k.shape[2]
    scale = hd ** -0.5

    if (use_flash and Lq >= 128 and kv_len is None and Lq == Lk
            and isinstance(q_offset, int) and q_offset == 0):
        # flash wants 128-aligned lengths; right-pad with zeros (pad keys sit
        # at positions > every real query, so causality masks them; pad query
        # rows are sliced off)
        Lp = -(-Lq // 128) * 128
        if Lp != Lq:
            padw = ((0, 0), (0, 0), (0, Lp - Lq), (0, 0))
            qp, kp, vp = (jnp.pad(t, padw) for t in (q, k, v))
        else:
            qp, kp, vp = q, k, v
        m = _flash.kernel_mesh()
        divisible = (m is None
                     or (B % m.shape.get(DATA_AXIS, 1) == 0
                         and nh % m.shape.get(MODEL_AXIS, 1) == 0))
        if _flash.supported_causal(Lp, Lp, hd) and divisible:
            # multi-device: batch over "data", heads over "model" (LLaMA
            # attention q/k/v are Megatron column-sharded on the head dim —
            # parallel/partition.py); the kernel never contracts over either
            qkv_spec = P(DATA_AXIS, MODEL_AXIS)
            if differentiable:
                fn = lambda q_, k_, v_, ks_: _flash.flash_causal_attention_diff(  # noqa: E731,E501
                    q_, k_, v_, ks_, _interpret())
            else:
                fn = lambda q_, k_, v_, ks_: _flash.flash_causal_attention(  # noqa: E731,E501
                    q_, k_, v_, kv_start=ks_, interpret=_interpret())
            if kv_start is None:
                call = _flash.shard_wrap(
                    lambda q_, k_, v_: fn(q_, k_, v_, None),
                    in_specs=(qkv_spec,) * 3, out_specs=qkv_spec, mesh=m)
                out = call(qp, kp, vp)
            else:
                call = _flash.shard_wrap(
                    fn, in_specs=(qkv_spec,) * 3 + (P(DATA_AXIS),),
                    out_specs=qkv_spec, mesh=m)
                out = call(qp, kp, vp, kv_start)
            return out[:, :, :Lq]

    logits = jnp.einsum("bnqd,bnkd->bnqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    qpos = jnp.arange(Lq)[:, None] + q_offset
    kpos = jnp.arange(Lk)[None, :]
    mask = (kpos <= qpos)[None]                          # [1, Lq, Lk]
    if kv_len is not None:
        mask = mask & (kpos[None] < kv_len[:, None, None])
    if kv_start is not None:
        mask = mask & (kpos[None] >= kv_start[:, None, None])
    mask = jnp.broadcast_to(mask, (B, Lq, Lk))[:, None]
    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bnqk,bnkd->bnqd", probs, v,
                      preferred_element_type=v.dtype)


def mha_qkv(qkv: jax.Array, num_heads: int,
            scale: float | None = None) -> jax.Array:
    """Self-attention from the fused [B, L, 3C] QKV tensor via the Pallas
    QKV-direct kernel (heads as VMEM column slices — no head-split
    relayouts). `ANYREF_QKV_MHA_KERNEL=0` falls back to the split-head XLA
    oracle (ops.common.mha)."""
    import os

    B, L, C3 = qkv.shape
    C = C3 // 3
    hd = C // num_heads
    m = _flash.kernel_mesh()
    if (os.environ.get("ANYREF_QKV_MHA_KERNEL", "1") != "1"
            or not _flash.pallas_enabled()
            or (m is not None and B % m.shape.get(DATA_AXIS, 1))):
        q, k, v = (qkv[..., i * C:(i + 1) * C]
                   .reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3)
                   for i in range(3))
        from .common import mha
        o = mha(q, k, v, scale=scale)
        return o.transpose(0, 2, 1, 3).reshape(B, L, C)
    call = functools.partial(_flash.flash_attention_qkv,
                             num_heads=num_heads, scale=scale,
                             interpret=_interpret())
    call = _flash.shard_wrap(call, in_specs=(P(DATA_AXIS),),
                             out_specs=P(DATA_AXIS), mesh=m)
    return call(qkv)
