"""Pallas TPU attention kernels.

Two kernels cover the framework's hot attention shapes:

1. ``flash_relpos_attention`` — SAM ViTDet *global* attention (64x64 = 4096
   tokens, 16 heads, head_dim 80) with decomposed relative-position bias
   (reference image_encoder.py:354-392). The bias factorizes as
   bias[q, k] = rh[q, kh] + rw[q, kw] with kh = k // W, kw = k %% W; the
   kernel expands the factors in VMEM instead of ever materializing the
   [4096, 4096] bias in HBM. Without this, XLA materializes ~1 GiB of
   attention scores per image — which both wrecks HBM bandwidth and makes
   SAM-H + LLaMA-7B not fit on one v5e chip.

2. ``flash_causal_attention`` — LLaMA prefill. Blocks over queries with the
   full K/V resident in VMEM (prompt lengths here are <= ~900 tokens:
   512 text + 255 image expansion; reference train.py:62), causal mask via
   iota compare, fp32 softmax.

Both kernels block only the query axis: at these sequence lengths K/V for one
(batch, head) fit comfortably in VMEM (4096 x 128 bf16 = 1 MiB), so the
online-softmax machinery of long-context flash attention would add complexity
without saving anything.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bq(L: int, target: int = 512) -> int:
    bq = min(target, L)
    while L % bq:
        bq //= 2
    return max(bq, 1)


# ---------------------------------------------------------------------------
# SAM global attention with decomposed rel-pos
# ---------------------------------------------------------------------------
def pallas_enabled() -> bool:
    """Master kernel switch. ANYREF_PALLAS=0 routes every dispatch site to
    its XLA fallback path (all kernels have equivalence-tested oracles).

    Multi-device SPMD programs keep the kernels via set_kernel_mesh()
    (shard_map wrapping at the dispatch sites); ANYREF_PALLAS=0 remains the
    operational kill switch if a kernel misbehaves on new hardware, and the
    fallback for meshes the wrap specs don't cover."""
    return os.environ.get("ANYREF_PALLAS", "1") == "1"


# ---------------------------------------------------------------------------
# multi-device kernel dispatch (shard_map wrapping)
# ---------------------------------------------------------------------------
# Mosaic custom calls cannot be auto-partitioned by GSPMD ("Mosaic kernels
# cannot be automatically partitioned. Please wrap the call in a shard_map").
# When a program is built over a >1-device mesh, the model entry point
# registers the mesh here (process-global: tracing may happen on a different
# thread than the one that built the program, e.g. the serving device loop)
# and every kernel dispatch site wraps its pallas_call in a shard_map whose
# in_specs mirror the framework's standard layout (parallel/partition.py):
# activations batch-sharded over "data", LLaMA attention heads sharded over
# "model", vision-tower activations and all kernel weights replicated.
# Inside the shard_map each device runs the identical single-chip kernel on
# its local shard — no cross-shard reductions are needed because the kernels
# never contract over batch or heads.
_KERNEL_MESH = None


def set_kernel_mesh(mesh) -> None:
    """Register (or clear, with None) the mesh used to shard_map-wrap
    Pallas kernel dispatches. Call before tracing any multi-device program;
    single-device programs ignore it."""
    global _KERNEL_MESH
    _KERNEL_MESH = mesh


def kernel_mesh():
    """The active multi-device kernel mesh, or None (single-device: call
    kernels directly)."""
    m = _KERNEL_MESH
    if m is None or m.size == 1:
        return None
    return m


def mesh_rows_ok(n: int) -> bool:
    """True when a leading batch-major dim of size `n` shards evenly over
    the active kernel mesh's "data" axis (or no mesh is active). Dispatch
    sites must NOT emit an unwrapped Mosaic call when this is False — fall
    back to the XLA oracle instead."""
    m = kernel_mesh()
    return m is None or n % m.shape.get("data", 1) == 0


def shard_wrap(fn, in_specs, out_specs, mesh=None):
    """shard_map `fn` over the active kernel mesh (or `mesh`). in_specs /
    out_specs are pytree prefixes of fn's args/results. check_vma=False:
    the bodies are Mosaic custom calls whose replication the checker cannot
    see through."""
    m = mesh if mesh is not None else kernel_mesh()
    if m is None:
        return fn
    return jax.shard_map(fn, mesh=m, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def supported_relpos(H: int, W: int, head_dim: int) -> bool:
    if not pallas_enabled():
        return False
    L = H * W
    bq = _pick_bq(L, 256)
    if L >= 1024:
        # global layers: blocked queries need tiling-aligned BQ
        return bq >= 128 and bq % 8 == 0 and W % 8 == 0
    # window layers (e.g. 14x14 = 196 tokens): one whole-window block per
    # grid step — full-dimension blocks are exempt from tiling alignment
    return 64 <= L <= 1024


def _relpos_expanders(kh: int, kw: int):
    """Indicator matrices turning per-axis bias factors into the [*, L]
    key-position bias: bias = repeat(rh, kw) + tile(rw, kh), expanded via
    matmuls (always lowers on MXU; avoids reshape/relayout of the minor
    dim). Shared by all three rel-pos kernels."""
    L = kh * kw
    col = jax.lax.broadcasted_iota(jnp.int32, (kh, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (kh, L), 0)
    expand_h = (col // kw == row).astype(jnp.float32)       # [kh, L]
    colw = jax.lax.broadcasted_iota(jnp.int32, (kw, L), 1)
    roww = jax.lax.broadcasted_iota(jnp.int32, (kw, L), 0)
    expand_w = (colw % kw == roww).astype(jnp.float32)      # [kw, L]
    return expand_h, expand_w


def _relpos_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                   scale: float, kh: int, kw: int):
    q = q_ref[0]                                    # [BQ, hd]
    k = k_ref[0]                                    # [L, hd]
    v = v_ref[0]
    rh = rh_ref[0].astype(jnp.float32)              # [BQ, kh]
    rw = rw_ref[0].astype(jnp.float32)              # [BQ, kw]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [BQ, L]
    expand_h, expand_w = _relpos_expanders(kh, kw)
    s = s + jax.lax.dot_general(rh, expand_h, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    s = s + jax.lax.dot_general(rw, expand_w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _relpos_multihead_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                             scale: float, kh: int, kw: int, nh: int):
    """All heads of one window per grid step (statically unrolled): at
    window scale (L=196) the per-(window, head) grid of the blocked kernel
    is overhead-bound — 400 sequential steps/layer for SAM-H vs 25 here."""
    expand_h, expand_w = _relpos_expanders(kh, kw)
    for h in range(nh):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        rh = rh_ref[0, h].astype(jnp.float32)
        rw = rw_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + jax.lax.dot_general(rh, expand_h, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(rw, expand_w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / denom).astype(o_ref.dtype)


def flash_relpos_attention(q, k, v, rel_h_table, rel_w_table, size_hw,
                           interpret: bool = False):
    """q/k/v: [B, nh, L, hd]; rel_*_table: [S, S, hd]; returns [B, nh, L, hd].

    The q-dependent bias factors rh = q . Rh (shape [B, nh, L, H]) and
    rw = q . Rw are computed in XLA (two small einsums, ~34 MB at SAM-H
    scale); the kernel expands them across the key axis in VMEM.
    """
    H, W = size_hw
    B, nh, L, hd = q.shape
    scale = hd ** -0.5
    qg = q.reshape(B, nh, H, W, hd)
    rh = jnp.einsum("bnhwc,hkc->bnhwk", qg, rel_h_table.astype(q.dtype),
                    preferred_element_type=jnp.float32)
    rw = jnp.einsum("bnhwc,wkc->bnhwk", qg, rel_w_table.astype(q.dtype),
                    preferred_element_type=jnp.float32)

    if L < 1024:
        # window path: one grid step per window covers every head
        kernel = functools.partial(_relpos_multihead_kernel, scale=scale,
                                   kh=H, kw=W, nh=nh)
        out = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, nh, L, hd), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, nh, L, hd), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, nh, L, hd), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, nh, L, H), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, nh, L, W), lambda b: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, nh, L, hd), lambda b: (b, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, nh, L, hd), q.dtype),
            interpret=interpret,
        )(q, k, v, rh.reshape(B, nh, L, H), rw.reshape(B, nh, L, W))
        return out

    rh = rh.reshape(B * nh, L, H)
    rw = rw.reshape(B * nh, L, W)
    qf = q.reshape(B * nh, L, hd)
    kf = k.reshape(B * nh, L, hd)
    vf = v.reshape(B * nh, L, hd)
    # BQ=256 keeps the [BQ, L] fp32 score block + K/V + expansion matrices
    # inside the 16 MiB scoped-VMEM budget at SAM-H scale (L=4096)
    BQ = _pick_bq(L, 256)
    grid = (B * nh, L // BQ)
    kernel = functools.partial(_relpos_kernel, scale=scale, kh=H, kw=W)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, L, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, L, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, BQ, H), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, BQ, W), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, hd), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * nh, L, hd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, rh, rw)
    return out.reshape(B, nh, L, hd)


# ---------------------------------------------------------------------------
# causal prefill attention
# ---------------------------------------------------------------------------
def supported_causal(Lq: int, Lk: int, head_dim: int) -> bool:
    if not pallas_enabled():
        return False
    bq = _pick_bq(Lq, 256)
    return Lq == Lk and Lq >= 128 and bq >= 128 and bq % 8 == 0


def _causal_kernel(pad_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                   bq: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    q = q_ref[0]                                     # [BQ, hd]
    k = k_ref[0]                                     # [L, hd]
    v = v_ref[0]
    pad = pad_ref[b]                                 # leading-pad count (row)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    L = k.shape[0]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (bq, L), 0) + i * bq
    kpos = jax.lax.broadcasted_iota(jnp.int32, (bq, L), 1)
    # Finite mask value, NOT -inf: left-pad query rows (qpos < pad) are fully
    # masked, and with -inf they'd produce m=-inf -> s-m=NaN, poisoning every
    # row of later layers through 0*NaN in p@v. Matches the XLA oracle
    # (ops/attention.py uses finfo.min via jnp.where on logits).
    s = jnp.where((kpos <= qpos) & (kpos >= pad), s,
                  jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(denom, 1e-20)).astype(o_ref.dtype)


def _causal_mh_kernel(pad_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                      bq: int, nh: int):
    """All heads of one (batch row, query block) per grid step: at prefill
    scale (L=384, 32 heads) the per-(batch, head) grid runs 192 sequential
    steps of tiny dots — step overhead dominates. Here the grid is
    (B, L/BQ) with heads unrolled, K/V for the whole row VMEM-resident."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    pad = pad_ref[b]
    L = k_ref.shape[2]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (bq, L), 0) + i * bq
    kpos = jax.lax.broadcasted_iota(jnp.int32, (bq, L), 1)
    # finite mask value, NOT -inf (see _causal_kernel)
    keep = (kpos <= qpos) & (kpos >= pad)
    for h in range(nh):
        q = q_ref[0, h]                              # [BQ, hd]
        k = k_ref[0, h]                              # [L, hd]
        v = v_ref[0, h]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(keep, s, jnp.finfo(jnp.float32).min)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / jnp.maximum(denom, 1e-20)).astype(o_ref.dtype)


def flash_causal_attention(q, k, v, kv_start=None, interpret: bool = False):
    """q/k/v: [B, nh, L, hd] prefill attention. ``kv_start`` [B] masks
    left-padded keys per row (batched generation; right padding needs no
    mask under causality). Returns [B, nh, L, hd]."""
    B, nh, L, hd = q.shape
    scale = hd ** -0.5
    BQ = _pick_bq(L, 256)

    # multi-head path for prefill-scale shapes: K/V for all heads of one
    # batch row stay VMEM-resident (nh * L * hd * 2 tensors); the grid
    # shrinks B*nh-fold. Cap the resident bytes well under scoped VMEM.
    if (nh * L * hd * 2 * jnp.dtype(q.dtype).itemsize <= 24 << 20
            and os.environ.get("ANYREF_CAUSAL_MH_KERNEL", "1") == "1"):
        if kv_start is None:
            pad = jnp.zeros((B,), jnp.int32)
        else:
            pad = kv_start.astype(jnp.int32)
        kernel = functools.partial(_causal_mh_kernel, scale=scale, bq=BQ,
                                   nh=nh)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, L // BQ),
            in_specs=[
                pl.BlockSpec((1, nh, BQ, hd), lambda b, i, *_: (b, 0, i, 0)),
                pl.BlockSpec((1, nh, L, hd), lambda b, i, *_: (b, 0, 0, 0)),
                pl.BlockSpec((1, nh, L, hd), lambda b, i, *_: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, nh, BQ, hd),
                                   lambda b, i, *_: (b, 0, i, 0)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 << 20),
            out_shape=jax.ShapeDtypeStruct((B, nh, L, hd), q.dtype),
            interpret=interpret,
        )(pad, q, k, v)

    qf = q.reshape(B * nh, L, hd)
    kf = k.reshape(B * nh, L, hd)
    vf = v.reshape(B * nh, L, hd)
    if kv_start is None:
        pad = jnp.zeros((B * nh,), jnp.int32)
    else:
        pad = jnp.repeat(kv_start.astype(jnp.int32), nh)
    kernel = functools.partial(_causal_kernel, scale=scale, bq=BQ)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * nh, L // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, hd), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, L, hd), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, L, hd), lambda b, i, *_: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, hd), lambda b, i, *_: (b, i, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * nh, L, hd), q.dtype),
        interpret=interpret,
    )(pad, qf, kf, vf)
    return out.reshape(B, nh, L, hd)


# ---------------------------------------------------------------------------
# differentiable causal flash (training path): fwd + LSE, Pallas backward
# ---------------------------------------------------------------------------
def _causal_fwd_kernel(pad_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                       scale: float, bq: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    pad = pad_ref[b]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    L = k.shape[0]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (bq, L), 0) + i * bq
    kpos = jax.lax.broadcasted_iota(jnp.int32, (bq, L), 1)
    s = jnp.where((kpos <= qpos) & (kpos >= pad), s,
                  jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(denom, 1e-20)).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(jnp.maximum(denom, 1e-20)))[:, 0]


def _causal_dq_kernel(pad_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                      delta_ref, dq_ref, *, scale: float, bq: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)             # [BQ, hd]
    lse = lse_ref[0, 0][:, None]                   # [BQ, 1]
    delta = delta_ref[0, 0][:, None]               # [BQ, 1]
    pad = pad_ref[b]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    L = k.shape[0]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (bq, L), 0) + i * bq
    kpos = jax.lax.broadcasted_iota(jnp.int32, (bq, L), 1)
    mask = (kpos <= qpos) & (kpos >= pad)
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)     # [BQ, L]
    dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale
    dq = jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _causal_dkv_kernel(pad_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                       delta_ref, dk_ref, dv_ref, *, scale: float, bk: int):
    b = pl.program_id(0)
    j = pl.program_id(1)
    q = q_ref[0]                                   # [L, hd]
    k = k_ref[0]                                   # [BK, hd]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)             # [L, hd]
    lse = lse_ref[0, 0][None, :]                   # [1, L]
    delta = delta_ref[0, 0][None, :]               # [1, L]
    pad = pad_ref[b]
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    L = q.shape[0]
    kpos = jax.lax.broadcasted_iota(jnp.int32, (bk, L), 0) + j * bk
    qpos = jax.lax.broadcasted_iota(jnp.int32, (bk, L), 1)
    mask = (kpos <= qpos) & (kpos >= pad)
    pt = jnp.where(mask, jnp.exp(st - lse), 0.0)   # [BK, L] = p^T
    dv = jax.lax.dot_general(pt.astype(do.dtype), do,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpt = jax.lax.dot_general(v.astype(jnp.float32), do,
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [BK, L]
    dst = pt * (dpt - delta) * scale
    dk = jax.lax.dot_general(dst.astype(q.dtype), q,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_causal_fwd(q, k, v, pad, interpret):
    B, nh, L, hd = q.shape
    scale = hd ** -0.5
    BQ = _pick_bq(L, 256)
    qf = q.reshape(B * nh, L, hd)
    kf = k.reshape(B * nh, L, hd)
    vf = v.reshape(B * nh, L, hd)
    kernel = functools.partial(_causal_fwd_kernel, scale=scale, bq=BQ)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * nh, L // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, hd), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, L, hd), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, L, hd), lambda b, i, *_: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BQ, hd), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, 1, BQ), lambda b, i, *_: (b, 0, i)),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B * nh, L, hd), q.dtype),
                   jax.ShapeDtypeStruct((B * nh, 1, L), jnp.float32)],
        interpret=interpret,
    )(pad, qf, kf, vf)
    return out.reshape(B, nh, L, hd), lse


def _flash_causal_bwd(q, k, v, pad, out, lse, do, interpret):
    B, nh, L, hd = q.shape
    scale = hd ** -0.5
    BQ = _pick_bq(L, 256)
    qf = q.reshape(B * nh, L, hd)
    kf = k.reshape(B * nh, L, hd)
    vf = v.reshape(B * nh, L, hd)
    dof = do.reshape(B * nh, L, hd)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).reshape(B * nh, 1, L)

    dq_kernel = functools.partial(_causal_dq_kernel, scale=scale, bq=BQ)
    dq = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * nh, L // BQ),
            in_specs=[
                pl.BlockSpec((1, BQ, hd), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, L, hd), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, L, hd), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, BQ, hd), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, 1, BQ), lambda b, i, *_: (b, 0, i)),
                pl.BlockSpec((1, 1, BQ), lambda b, i, *_: (b, 0, i)),
            ],
            out_specs=pl.BlockSpec((1, BQ, hd), lambda b, i, *_: (b, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B * nh, L, hd), q.dtype),
        interpret=interpret,
    )(pad, qf, kf, vf, dof, lse, delta)

    BK = _pick_bq(L, 256)
    dkv_kernel = functools.partial(_causal_dkv_kernel, scale=scale, bk=BK)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * nh, L // BK),
            in_specs=[
                pl.BlockSpec((1, L, hd), lambda b, j, *_: (b, 0, 0)),
                pl.BlockSpec((1, BK, hd), lambda b, j, *_: (b, j, 0)),
                pl.BlockSpec((1, BK, hd), lambda b, j, *_: (b, j, 0)),
                pl.BlockSpec((1, L, hd), lambda b, j, *_: (b, 0, 0)),
                pl.BlockSpec((1, 1, L), lambda b, j, *_: (b, 0, 0)),
                pl.BlockSpec((1, 1, L), lambda b, j, *_: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, BK, hd), lambda b, j, *_: (b, j, 0)),
                pl.BlockSpec((1, BK, hd), lambda b, j, *_: (b, j, 0)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((B * nh, L, hd), k.dtype),
                   jax.ShapeDtypeStruct((B * nh, L, hd), v.dtype)],
        interpret=interpret,
    )(pad, qf, kf, vf, dof, lse, delta)
    return (dq.reshape(B, nh, L, hd), dk.reshape(B, nh, L, hd),
            dv.reshape(B, nh, L, hd))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_causal_attention_diff(q, k, v, kv_start, interpret=False):
    """Differentiable causal flash attention (training path; VERDICT r1 #5).

    Same forward as flash_causal_attention; the backward pass runs two
    Pallas kernels (dq blocked over queries, dk/dv blocked over keys) that
    recompute probabilities from the saved per-row logsumexp — never
    materializing [B, H, L, L] scores in HBM, which is what forces the XLA
    fallback to ~L^2 memory traffic on the train path.
    kv_start: [B] or None (left-pad mask, as in the inference kernel)."""
    B, nh, L, hd = q.shape
    pad = (jnp.zeros((B * nh,), jnp.int32) if kv_start is None
           else jnp.repeat(kv_start.astype(jnp.int32), nh))
    out, _ = _flash_causal_fwd(q, k, v, pad, interpret)
    return out


def _diff_fwd(q, k, v, kv_start, interpret):
    B, nh, L, hd = q.shape
    pad = (jnp.zeros((B * nh,), jnp.int32) if kv_start is None
           else jnp.repeat(kv_start.astype(jnp.int32), nh))
    out, lse = _flash_causal_fwd(q, k, v, pad, interpret)
    return out, (q, k, v, pad, out, lse)


def _diff_bwd(interpret, res, do):
    q, k, v, pad, out, lse = res
    dq, dk, dv = _flash_causal_bwd(q, k, v, pad, out, lse, do, interpret)
    return dq, dk, dv, None


flash_causal_attention_diff.defvjp(_diff_fwd, _diff_bwd)


# ---------------------------------------------------------------------------
# fused LayerNorm (SAM encoder hot path)
# ---------------------------------------------------------------------------
def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)                    # [RB, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def supported_layer_norm(n: int, c: int) -> bool:
    return pallas_enabled() and c % 128 == 0 and n >= 8


def layer_norm_fused(x, scale, bias, eps: float, interpret: bool = False):
    """LayerNorm over the last dim with one VMEM-resident pass (read bf16,
    fp32 moments, write bf16). XLA lowers the convert+reduce as a slow
    ~0.36 ms fusion per call at SAM-H scale (profiled: 92 such fusions =
    33 ms of the 88 ms encode); this kernel runs at HBM streaming speed.
    x: [..., C]; scale/bias: [C]; same fp32 math as ops.common.layer_norm."""
    shape = x.shape
    C = shape[-1]
    N = math.prod(shape[:-1])
    xf = x.reshape(N, C)
    RB = 256
    Np = -(-N // RB) * RB
    if Np != N:   # pad rows (normalized garbage, sliced off below)
        xf = jnp.pad(xf, ((0, Np - N), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(Np // RB,),
        in_specs=[
            pl.BlockSpec((RB, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((RB, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, C), x.dtype),
        interpret=interpret,
    )(xf, scale.reshape(1, C), bias.reshape(1, C))
    return out[:N].reshape(shape)


def _rms_kernel(x_ref, scale_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)                    # [RB, C]
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps) * scale_ref[0].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def rms_norm_fused(x, scale, eps: float, interpret: bool = False):
    """RMSNorm over the last dim, VMEM-resident (inference paths only — no
    VJP; the training forward keeps the XLA norm). Same fp32 math as
    ops.common.rms_norm."""
    shape = x.shape
    C = shape[-1]
    N = math.prod(shape[:-1])
    xf = x.reshape(N, C)
    RB = 256
    Np = -(-N // RB) * RB
    if Np != N:
        xf = jnp.pad(xf, ((0, Np - N), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_rms_kernel, eps=eps),
        grid=(Np // RB,),
        in_specs=[
            pl.BlockSpec((RB, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((RB, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, C), x.dtype),
        interpret=interpret,
    )(xf, scale.reshape(1, C))
    return out[:N].reshape(shape)


def _erf_f32(x):
    """erf to float32 accuracy (Abramowitz-Stegun 7.1.26, |eps| <= 1.5e-7)
    from exp only — Pallas TPU lowers neither erf nor erfc (checked on
    v5e, jax 0.9: 'Unimplemented primitive ... erfc')."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + p * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu_exact(x):
    """erf-GELU (torch nn.GELU default). ANYREF_FUSED_GELU selects the
    in-kernel implementation:
      * exact (default) — _erf_f32 rational approx (|eps| <= 1.5e-7): sign/
        abs/reciprocal + 5-term poly + exp + 4 muls, ~15 VPU ops/element;
      * tanh — the tanh-form GELU (x/2 * (1 + tanh(0.79788456*(x +
        0.044715 x^3)))): one transcendental + 6 muls. Max deviation from
        erf-GELU is ~1e-3 absolute (at |x|~2) — below the bf16 resolution
        of the stream it feeds at those magnitudes, but 3-4 ULP, so it is
        opt-in for perf experiments, not the default.
    """
    if os.environ.get("ANYREF_FUSED_GELU", "exact") == "tanh":
        return x * 0.5 * (1.0 + jnp.tanh(
            0.7978845608028654 * (x + 0.044715 * x * x * x)))
    return x * 0.5 * (1.0 + _erf_f32(x * (2.0 ** -0.5)))


def _window_attn_all(qkv3, tcat_ref, scratch, *, nh: int, hd: int, ws: int,
                     WG: int, TP: int, out_dtype, scale: float = None):
    """All-window, all-head rel-pos window attention on the fused-QKV
    stream: qkv3 [WG, L, 3C] -> [WG, L, C]. Shared by the combined
    whole-layer kernel and the split attention-only kernel. ``hd`` is the
    STORED per-head width (may be zero-padded past the model's head_dim
    for lane alignment — see fused_window_attn HDPAD); ``scale`` is always
    the model head_dim's softmax scale."""
    L = ws * ws
    C = nh * hd
    # per-query row/col selectors for the table row (leading-axis mask)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
    jj = jax.lax.broadcasted_iota(jnp.int32, (ws, 1, 1), 0)
    sel_h = (jj == qpos // ws).astype(jnp.float32)         # [ws, 1, L]
    sel_w = (jj == qpos % ws).astype(jnp.float32)

    scale = hd ** -0.5 if scale is None else scale

    def win_attn(qkv_w):
        """Attention for ONE window's [L, 3C] fused-QKV rows -> [L, C]."""
        outs = []
        for hh in range(nh):
            q = qkv_w[:, hh * hd:(hh + 1) * hd]
            k = qkv_w[:, C + hh * hd:C + (hh + 1) * hd]
            v = qkv_w[:, 2 * C + hh * hd:2 * C + (hh + 1) * hd]
            # 3 dots per head (down from 7): scores, ONE merged table
            # projection (tht and twt pre-stacked host-side at aligned
            # sublane offsets 0 / TP — M 196 -> 404 rows on the MXU), and
            # PV; the old two bias-EXPANSION dots are now pure sublane
            # broadcasts (bias[k, q] = rh_t[k//ws, q] + rw_t[k%ws, q]).
            st_t = jax.lax.dot_general(
                tcat_ref[...].astype(q.dtype), q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # [TP+L, L]
            # G_T[(j, s), q] = q[q] . table[j, s]; select j == qh(q)/qw(q)
            rh_t = jnp.sum(st_t[:L].reshape(ws, ws, L) * sel_h, axis=0)
            rw_t = jnp.sum(st_t[TP:TP + L].reshape(ws, ws, L) * sel_w,
                           axis=0)                         # [ws, L]
            bias = (jnp.broadcast_to(rh_t[:, None, :], (ws, ws, L))
                    + jnp.broadcast_to(rw_t[None, :, :], (ws, ws, L))
                    ).reshape(L, L)                        # [L(k), L(q)]
            s_t = jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + bias
            m = jnp.max(s_t, axis=0, keepdims=True)        # over keys
            p = jnp.exp(s_t - m)
            p = p / jnp.sum(p, axis=0, keepdims=True)
            outs.append(jax.lax.dot_general(
                p.astype(v.dtype), v, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))       # [L(q), hd]
        return jnp.concatenate(outs, axis=1)               # [L, C]

    if WG == 1:
        return win_attn(qkv3[0])[None].astype(out_dtype)
    # windows iterate via fori_loop so the unrolled program stays at
    # nh bodies regardless of WG (WG*nh unrolled bodies blow up the
    # Mosaic compile — remote helper SIGKILL at WG=5). Mosaic has no
    # dynamic_slice on VALUES, so the loop stages through VMEM scratch
    # REFS (dynamic leading-dim ref indexing is supported).
    qkv_s, attn_s = scratch
    qkv_s[...] = qkv3

    def win_body(w, _):
        attn_s[w] = win_attn(qkv_s[w]).astype(attn_s.dtype)
        return 0

    jax.lax.fori_loop(0, WG, win_body, 0)
    return attn_s[...]


def _window_pad_mask(nwc: int, nw: int, H: int, W: int, WG: int, L: int,
                     ws: int):
    """[WG, L, 1] pad mask from the window indices (windows scan row-major
    over the padded (ceil(H/ws)*ws) grid; right/bottom windows overhang)."""
    wi = (pl.program_id(0) * WG
          + jax.lax.broadcasted_iota(jnp.int32, (WG, L, 1), 0)) % nw
    li = jax.lax.broadcasted_iota(jnp.int32, (WG, L, 1), 1)
    rows = (wi // nwc) * ws + li // ws
    cols = (wi % nwc) * ws + li % ws
    return ((rows < H) & (cols < W)).astype(jnp.float32)


def _fused_window_block_kernel(
        x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, tcat_ref,
        wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
        b2_ref, o_ref, *scratch, eps: float, nh: int, hd: int, ws: int,
        nwc: int, nw: int, H: int, W: int, WG: int, TP: int, MC: int):
    """WG ENTIRE windowed ViTDet blocks per grid step:
    LN1 + pad-mask + fused-QKV projection + rel-pos attention (all heads) +
    output projection + residual + LN2 + MLP + residual — no intermediate
    ever leaves VMEM, and the layer's weights stay VMEM-resident across the
    whole window grid (constant index maps).

    The three GEMMs run on ROW-MERGED [WG*L, C] operands (L=196 alone caps
    the MXU M-dimension at 196/256 = 77% utilization; merged rows reach
    ~96%); attention runs per (window, head) on leading-dim slices.

    Rel-pos bias is computed IN-KERNEL from the raw gathered tables with no
    gathers/transposes: scores are built TRANSPOSED (s_T[k, q]) so the
    per-row table row-selection becomes a masked sum over the leading
    (sublane) axis, and both bias expansions are [L, S] @ [S, L] matmuls.
    """
    L = ws * ws
    C = nh * hd
    WL = WG * L
    x3 = x_ref[...].astype(jnp.float32)                    # [WG, L, C]
    mask3 = _window_pad_mask(nwc, nw, H, W, WG, L, ws)     # [WG, L, 1]

    def ln(v, s_ref, b_ref):
        mean = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(v - mean), axis=-1, keepdims=True)
        return ((v - mean) * jax.lax.rsqrt(var + eps)
                * s_ref[0].astype(jnp.float32)
                + b_ref[0].astype(jnp.float32))

    h = (ln(x3, ln1s_ref, ln1b_ref) * mask3).astype(o_ref.dtype)
    qkv = jax.lax.dot_general(
        h.reshape(WL, C), wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + bqkv_ref[0].astype(jnp.float32)                  # [WL, 3C]
    qkv3 = qkv.astype(o_ref.dtype).reshape(WG, L, 3 * C)
    attn = _window_attn_all(qkv3, tcat_ref, scratch, nh=nh, hd=hd, ws=ws,
                            WG=WG, TP=TP, out_dtype=o_ref.dtype)
    attn = attn.astype(o_ref.dtype)
    proj = jax.lax.dot_general(
        attn.reshape(WL, C), wproj_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + bproj_ref[0].astype(jnp.float32)
    x1 = x3.reshape(WL, C) + proj                          # [WL, C] fp32

    h2 = ln(x1, ln2s_ref, ln2b_ref).astype(o_ref.dtype)
    # MLP in MC-wide column chunks: the full fp32 hidden [WL, mlp_dim] is the
    # kernel's largest temporary (20 MiB at WG=5 / mlp 5120) and is what
    # RESOURCE_EXHAUSTed the batch-2 serving program at WG=5; chunking keeps
    # only [WL, MC] fp32 live (same dot FLOPs, fp32-accumulated partial sums)
    mlp_dim = w1_ref.shape[1]
    m2 = jnp.broadcast_to(b2_ref[0].astype(jnp.float32), (WL, C))
    for c0 in range(0, mlp_dim, MC):
        m1c = jax.lax.dot_general(
            h2, w1_ref[:, c0:c0 + MC], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) \
            + b1_ref[0, c0:c0 + MC].astype(jnp.float32)
        m1c = _gelu_exact(m1c).astype(o_ref.dtype)
        m2 = m2 + jax.lax.dot_general(
            m1c, w2_ref[c0:c0 + MC, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = (x1 + m2).astype(o_ref.dtype).reshape(WG, L, C)


def fused_window_block(xw, ln1, qkv_p, tht, twt, proj_p, ln2, mlp1_p, mlp2_p,
                       size_hw, num_heads: int, grid_hw, nwc: int,
                       eps: float, interpret: bool = False):
    """Whole windowed transformer block on the window-resident stream.

    xw: [NW, ws*ws, C] (NW = B * n_windows); tht/twt: [ws*ws, hd] gathered
    rel-pos tables reshaped row-major (j, s); grid_hw: the (H, W) token grid
    (for pad masking); nwc: windows per row. Weights live VMEM-resident for
    the whole call (one HBM fetch per layer). Returns [NW, ws*ws, C].
    """
    ws_h, ws_w = size_hw
    assert ws_h == ws_w
    ws = ws_h
    NW, L, C = xw.shape
    hd = C // num_heads
    H, W = grid_hw
    nwr = -(-H // ws)
    nw = nwr * nwc
    # windows per grid step: merged-GEMM M dimension = WG * L (196 alone
    # fills MXU M-tiles at ~77%; merged windows approach ~96%). Attention
    # iterates windows via fori_loop so the unrolled program stays at nh
    # bodies regardless of WG — fully unrolling WG*nh bodies blew up the
    # Mosaic compile (remote-helper SIGKILL at 80 bodies). The default cap
    # is 2: WG=5 is a little faster standalone (68.4 vs ~70 ms SAM-H) but
    # its VMEM appetite RESOURCE_EXHAUSTs the full 7B batch-2 serving
    # program, the single-chip operating point (e2e: WG=1 6.91, WG=2
    # 7.12 q/s; later sweep: WG=3 e2e-neutral at 7.37 vs 7.39, WG=4 blows
    # the compile past the bench deadline). NW is zero-padded up to a WG
    # multiple (the pad windows' outputs are computed and dropped).
    wg_cap = int(os.environ.get("ANYREF_FUSED_WG", "2"))
    WG = max(1, min(wg_cap, 5))
    NWp = -(-NW // WG) * WG
    if NWp != NW:
        xw = jnp.pad(xw, ((0, NWp - NW), (0, 0), (0, 0)))
    mlp_dim = mlp1_p["w"].shape[1]
    # pre-stack the two gathered rel-pos tables at SUBLANE-ALIGNED offsets
    # (0 and TP, TP = L rounded up to 16) so the kernel reads both with one
    # dot and two aligned row slices — Mosaic cannot concat misaligned
    # operands in-kernel (L=196 is 4 (mod 16))
    TP = -(-L // 16) * 16
    tcat = jnp.zeros((TP + L, hd), tht.dtype)
    tcat = tcat.at[:L].set(tht).at[TP:TP + L].set(twt)
    # MLP column-chunk width (must divide mlp_dim; else unchunked): bounds
    # the fp32 hidden temporary at [WG*L, MC] instead of [WG*L, mlp_dim]
    mc_cap = int(os.environ.get("ANYREF_FUSED_MLP_CHUNK", "1280"))
    MC = mc_cap if 0 < mc_cap < mlp_dim and mlp_dim % mc_cap == 0 \
        else mlp_dim
    kernel = functools.partial(
        _fused_window_block_kernel, eps=eps, nh=num_heads, hd=hd, ws=ws,
        nwc=nwc, nw=nw, H=H, W=W, WG=WG, TP=TP, MC=MC)
    const = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape))  # noqa: E731
    # the layer's weights live VMEM-resident (qkv + proj + both mlp mats),
    # which busts the default 16 MiB scoped-vmem cap; v5e has far more
    # physical VMEM. Budget: weights + double-buffered stream blocks + a
    # generous margin for kernel temporaries (merged fp32 GEMM outputs).
    esz = jnp.dtype(xw.dtype).itemsize
    WL = WG * L
    weight_bytes = (C * 3 * C + C * C + C * mlp_dim + mlp_dim * C) * esz
    stream_bytes = 4 * WL * C * esz
    vmem_budget = int(weight_bytes + stream_bytes
                      + (WL * 3 * C + 2 * WL * MC + WL * C + 4 * L * L) * 4
                      + (WL * 4 * C) * esz      # qkv + attn staging scratch
                      + (8 << 20))
    out = pl.pallas_call(
        kernel,
        grid=(NWp // WG,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_budget, 120 << 20)),
        in_specs=[
            pl.BlockSpec((WG, L, C), lambda b: (b, 0, 0)),
            const((1, C)), const((1, C)),
            const((C, 3 * C)), const((1, 3 * C)),
            const((TP + L, hd)),
            const((C, C)), const((1, C)),
            const((1, C)), const((1, C)),
            const((C, mlp_dim)), const((1, mlp_dim)),
            const((mlp_dim, C)), const((1, C)),
        ],
        out_specs=pl.BlockSpec((WG, L, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NWp, L, C), xw.dtype),
        scratch_shapes=([pltpu.VMEM((WG, L, 3 * C), xw.dtype),
                         pltpu.VMEM((WG, L, C), xw.dtype)]
                        if WG > 1 else []),
        interpret=interpret,
    )(xw, ln1["scale"].reshape(1, C), ln1["bias"].reshape(1, C),
      qkv_p["w"], qkv_p["b"].reshape(1, 3 * C),
      tcat,
      proj_p["w"], proj_p["b"].reshape(1, C),
      ln2["scale"].reshape(1, C), ln2["bias"].reshape(1, C),
      mlp1_p["w"], mlp1_p["b"].reshape(1, mlp_dim),
      mlp2_p["w"], mlp2_p["b"].reshape(1, C))
    return out[:NW] if NWp != NW else out


def _fused_window_attn_kernel(
        x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, tcat_ref,
        wproj_ref, bproj_ref, o_ref, *scratch, eps: float, nh: int, hd: int,
        ws: int, nwc: int, nw: int, H: int, W: int, WG: int, TP: int,
        scale: float):
    """Attention HALF of a windowed block (split-kernel variant): LN1 +
    pad-mask + fused-QKV + rel-pos attention + proj + residual. The MLP
    half runs in `fused_mlp_stream` — splitting frees the ~2*C*4C of
    VMEM-resident MLP weights, the binding constraint on WG inside the
    batch-2 serving program. ``hd`` is the STORED head width (possibly
    lane-padded, HDPAD); the model width Cx comes from x_ref."""
    L = ws * ws
    C = nh * hd                       # attention width (padded under HDPAD)
    Cx = x_ref.shape[-1]              # model width
    WL = WG * L
    x3 = x_ref[...].astype(jnp.float32)
    mask3 = _window_pad_mask(nwc, nw, H, W, WG, L, ws)

    mean = jnp.mean(x3, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x3 - mean), axis=-1, keepdims=True)
    h = ((x3 - mean) * jax.lax.rsqrt(var + eps)
         * ln1s_ref[0].astype(jnp.float32)
         + ln1b_ref[0].astype(jnp.float32))
    h = (h * mask3).astype(o_ref.dtype)
    qkv = jax.lax.dot_general(
        h.reshape(WL, Cx), wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + bqkv_ref[0].astype(jnp.float32)
    qkv3 = qkv.astype(o_ref.dtype).reshape(WG, L, 3 * C)
    attn = _window_attn_all(qkv3, tcat_ref, scratch, nh=nh, hd=hd, ws=ws,
                            WG=WG, TP=TP, out_dtype=o_ref.dtype,
                            scale=scale)
    proj = jax.lax.dot_general(
        attn.astype(o_ref.dtype).reshape(WL, C), wproj_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32) \
        + bproj_ref[0].astype(jnp.float32)
    o_ref[...] = (x3.reshape(WL, Cx) + proj).astype(o_ref.dtype).reshape(
        WG, L, Cx)


def fused_window_attn(xw, ln1, qkv_p, tht, twt, proj_p, size_hw,
                      num_heads: int, grid_hw, nwc: int, eps: float,
                      interpret: bool = False):
    """Split-kernel window attention: same contract as fused_window_block
    minus the MLP half (returns the post-attention residual stream
    [NW, ws*ws, C]); follow with fused_mlp_stream. One numerics delta vs
    the combined kernel: the residual carry materializes in the stream
    dtype (bf16) between the two kernels — the same place the unfused
    resident path rounds it."""
    ws_h, ws_w = size_hw
    assert ws_h == ws_w
    ws = ws_h
    NW, L, C = xw.shape
    hd = C // num_heads
    scale = hd ** -0.5
    H, W = grid_hw
    nwr = -(-H // ws)
    nw = nwr * nwc
    # without MLP weights/temporaries resident the compile and VMEM
    # pressure drop; WG CAN run higher than the combined kernel's cap, but
    # the r4 same-window sweep measured WG=1 fastest for this kernel
    # (2.88 / 2.97 / 2.91 ms/layer at WG 1/2/4 — the fori_loop's VMEM
    # scratch staging costs more than cross-window pipelining buys)
    # independent knob from the combined kernel's ANYREF_FUSED_WG (default
    # 2 there): the r4 sweep measured the SPLIT kernel slower at WG>1, so
    # tuning the combined kernel must not silently retune this one
    wg_cap = int(os.environ.get("ANYREF_FUSED_WG_SPLIT", "1"))
    WG = max(1, min(wg_cap, 5))
    NWp = -(-NW // WG) * WG
    if NWp != NW:
        xw = jnp.pad(xw, ((0, NWp - NW), (0, 0), (0, 0)))
    wqkv, bqkv = qkv_p["w"], qkv_p["b"]
    wproj = proj_p["w"]
    # HDPAD: zero-pad each head's stored width to the 128-lane boundary so
    # every per-head slice inside the kernel is lane-ALIGNED (hd=80 puts
    # head h's q/k/v at lane offset 80h mod 128 — each misaligned slice
    # costs a relayout). The padding is free-correct: padded q/k lanes are
    # zero on both sides of the score contraction, padded v lanes produce
    # zero outputs that hit zero proj rows. Cost: the qkv/proj GEMMs grow
    # hd->hdp (x1.6 FLOPs at SAM-H) — the tradeoff this knob measures.
    if (os.environ.get("ANYREF_FUSED_HDPAD") == "1" and hd % 128
            and hd < 128):
        hdp = 128
        wqkv = jnp.pad(wqkv.reshape(C, 3, num_heads, hd),
                       ((0, 0), (0, 0), (0, 0), (0, hdp - hd))
                       ).reshape(C, 3 * num_heads * hdp)
        bqkv = jnp.pad(bqkv.reshape(3, num_heads, hd),
                       ((0, 0), (0, 0), (0, hdp - hd))).reshape(-1)
        wproj = jnp.pad(wproj.reshape(num_heads, hd, C),
                        ((0, 0), (0, hdp - hd), (0, 0))
                        ).reshape(num_heads * hdp, C)
        tht = jnp.pad(tht, ((0, 0), (0, hdp - hd)))
        twt = jnp.pad(twt, ((0, 0), (0, hdp - hd)))
        hd_s = hdp
    else:
        hd_s = hd
    Ca = num_heads * hd_s
    TP = -(-L // 16) * 16
    tcat = jnp.zeros((TP + L, hd_s), tht.dtype)
    tcat = tcat.at[:L].set(tht).at[TP:TP + L].set(twt)
    kernel = functools.partial(
        _fused_window_attn_kernel, eps=eps, nh=num_heads, hd=hd_s, ws=ws,
        nwc=nwc, nw=nw, H=H, W=W, WG=WG, TP=TP, scale=scale)
    const = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape))  # noqa: E731
    esz = jnp.dtype(xw.dtype).itemsize
    WL = WG * L
    weight_bytes = (C * 3 * Ca + Ca * C) * esz
    vmem_budget = int(weight_bytes + 4 * WL * C * esz
                      + (WL * 3 * Ca + WL * C + 4 * L * L) * 4
                      + (WL * 4 * Ca) * esz
                      + (8 << 20))
    out = pl.pallas_call(
        kernel,
        grid=(NWp // WG,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_budget, 120 << 20)),
        in_specs=[
            pl.BlockSpec((WG, L, C), lambda b: (b, 0, 0)),
            const((1, C)), const((1, C)),
            const((C, 3 * Ca)), const((1, 3 * Ca)),
            const((TP + L, hd_s)),
            const((Ca, C)), const((1, C)),
        ],
        out_specs=pl.BlockSpec((WG, L, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NWp, L, C), xw.dtype),
        scratch_shapes=([pltpu.VMEM((WG, L, 3 * Ca), xw.dtype),
                         pltpu.VMEM((WG, L, Ca), xw.dtype)]
                        if WG > 1 else []),
        interpret=interpret,
    )(xw, ln1["scale"].reshape(1, C), ln1["bias"].reshape(1, C),
      wqkv, bqkv.reshape(1, 3 * Ca), tcat,
      wproj, proj_p["b"].reshape(1, C))
    return out[:NW] if NWp != NW else out


def _mlp_stream_kernel(x_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
                       b2_ref, o_ref, *, eps: float, MC: int):
    """LN2 + MLP + residual over an [RB, C] row block; MLP/LN weights
    VMEM-resident across the whole row grid."""
    x = x_ref[...].astype(jnp.float32)                     # [RB, C]
    RB, C = x.shape
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    h = ((x - mean) * jax.lax.rsqrt(var + eps)
         * ln2s_ref[0].astype(jnp.float32)
         + ln2b_ref[0].astype(jnp.float32)).astype(o_ref.dtype)
    mlp_dim = w1_ref.shape[1]
    acc = jnp.broadcast_to(b2_ref[0].astype(jnp.float32), (RB, C))
    for c0 in range(0, mlp_dim, MC):
        m1c = jax.lax.dot_general(
            h, w1_ref[:, c0:c0 + MC], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) \
            + b1_ref[0, c0:c0 + MC].astype(jnp.float32)
        m1c = _gelu_exact(m1c).astype(o_ref.dtype)
        acc = acc + jax.lax.dot_general(
            m1c, w2_ref[c0:c0 + MC, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = (x + acc).astype(o_ref.dtype)


def fused_mlp_stream(x, ln2, mlp1_p, mlp2_p, eps: float,
                     interpret: bool = False):
    """LN + GELU-MLP + residual over a flat token stream [N, C] — the MLP
    half of the split windowed block. A pure row-blocked GEMM kernel: the
    row grid is window-structure-free, so M runs at RB=512 (vs the
    combined kernel's WG*196) and MXU utilization is shape-optimal."""
    N, C = x.shape
    mlp_dim = mlp1_p["w"].shape[1]
    RB = int(os.environ.get("ANYREF_FUSED_MLP_RB", "512"))
    Np = -(-N // RB) * RB
    xp = jnp.pad(x, ((0, Np - N), (0, 0))) if Np != N else x
    mc_cap = int(os.environ.get("ANYREF_FUSED_MLP_CHUNK", "1280"))
    MC = mc_cap if 0 < mc_cap < mlp_dim and mlp_dim % mc_cap == 0 \
        else mlp_dim
    kernel = functools.partial(_mlp_stream_kernel, eps=eps, MC=MC)
    const = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape))  # noqa: E731
    esz = jnp.dtype(x.dtype).itemsize
    weight_bytes = (C * mlp_dim + mlp_dim * C) * esz
    vmem_budget = int(weight_bytes + 4 * RB * C * esz
                      + (2 * RB * MC + 2 * RB * C) * 4 + (8 << 20))
    out = pl.pallas_call(
        kernel,
        grid=(Np // RB,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_budget, 120 << 20)),
        in_specs=[
            pl.BlockSpec((RB, C), lambda b: (b, 0)),
            const((1, C)), const((1, C)),
            const((C, mlp_dim)), const((1, mlp_dim)),
            const((mlp_dim, C)), const((1, C)),
        ],
        out_specs=pl.BlockSpec((RB, C), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, C), x.dtype),
        interpret=interpret,
    )(xp, ln2["scale"].reshape(1, C), ln2["bias"].reshape(1, C),
      mlp1_p["w"], mlp1_p["b"].reshape(1, mlp_dim),
      mlp2_p["w"], mlp2_p["b"].reshape(1, C))
    return out[:N] if Np != N else out


def _fused_global_tail_kernel(x_ref, q_ref, kv_ref, rht_ref, rwt_ref,
                              wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
                              w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                              eps: float, scale: float, nh: int, hd: int,
                              kh: int, kw: int, MC: int):
    """Post-QKV tail of a GLOBAL ViTDet block, one query block per grid
    step: rel-pos attention (all heads, full 4096-key rows) + output
    projection + residual + LN2 + MLP + residual. The layer's proj/MLP
    weights and the image's K/V stay VMEM-resident across the whole query
    grid (constant index maps — one HBM fetch per layer per image).

    Rel-pos bias never exists as dots here (the blocked `_relpos_kernel`
    spends ~45%% of its FLOPs expanding rh/rw across the key axis with two
    [BQ, S] @ [S, L] matmuls): scores are built TRANSPOSED (s_T[k, q]) so
    bias_T[k, q] = rhT[k//kw, q] + rwT[k%%kw, q] is two pure sublane
    broadcasts of the XLA-precomputed factor blocks.
    """
    L = kh * kw
    C = nh * hd
    BQ = q_ref.shape[0]
    outs = []
    for h in range(nh):
        q = q_ref[:, h * hd:(h + 1) * hd]                     # [BQ, hd]
        k = kv_ref[:, h * hd:(h + 1) * hd]                    # [L, hd]
        v = kv_ref[:, C + h * hd:C + (h + 1) * hd]
        rh = rht_ref[h].astype(jnp.float32)                   # [kh, BQ]
        rw = rwt_ref[h].astype(jnp.float32)                   # [kw, BQ]
        s_t = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # [L, BQ]
        bias = (jnp.broadcast_to(rh[:, None, :], (kh, kw, BQ))
                + jnp.broadcast_to(rw[None, :, :], (kh, kw, BQ))
                ).reshape(L, BQ)
        s_t = s_t + bias
        m = jnp.max(s_t, axis=0, keepdims=True)               # over keys
        p = jnp.exp(s_t - m)
        p = p / jnp.sum(p, axis=0, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(v.dtype), v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))              # [BQ, hd]
    attn = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)  # [BQ, C]
    proj = jax.lax.dot_general(
        attn, wproj_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + bproj_ref[0].astype(jnp.float32)
    x1 = x_ref[...].astype(jnp.float32) + proj                # [BQ, C]

    mean = jnp.mean(x1, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x1 - mean), axis=-1, keepdims=True)
    h2 = ((x1 - mean) * jax.lax.rsqrt(var + eps)
          * ln2s_ref[0].astype(jnp.float32)
          + ln2b_ref[0].astype(jnp.float32)).astype(o_ref.dtype)
    # MLP in MC-wide column chunks (bounds the fp32 hidden temporary at
    # [BQ, MC]; same scheme as the fused window kernel)
    mlp_dim = w1_ref.shape[1]
    m2 = jnp.broadcast_to(b2_ref[0].astype(jnp.float32), (BQ, C))
    for c0 in range(0, mlp_dim, MC):
        m1c = jax.lax.dot_general(
            h2, w1_ref[:, c0:c0 + MC], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) \
            + b1_ref[0, c0:c0 + MC].astype(jnp.float32)
        m1c = _gelu_exact(m1c).astype(o_ref.dtype)
        m2 = m2 + jax.lax.dot_general(
            m1c, w2_ref[c0:c0 + MC, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = (x1 + m2).astype(o_ref.dtype)


def supported_global_fused(H: int, W: int, head_dim: int) -> bool:
    if not pallas_enabled():
        return False
    L = H * W
    bq = _pick_bq(L, 256)
    return (L >= 1024 and bq >= 128 and H % 8 == 0 and W % 8 == 0
            and head_dim % 8 == 0)


def fused_global_tail(x, qkv, tht, twt, proj_p, ln2, mlp1_p, mlp2_p,
                      size_hw, num_heads: int, eps: float,
                      interpret: bool = False):
    """Whole GLOBAL transformer block tail (everything after the QKV
    projection) in ONE Pallas call per image.

    x: [B, L, C] block input (residual); qkv: [B, L, 3C] (LN1 + fused-QKV
    projection done in XLA — that GEMM already runs at MXU peak);
    tht/twt: [S, S, hd] gathered rel-pos tables. Returns [B, L, C], the
    full block output (reference image_encoder.py:196-233 semantics).
    """
    H, W = size_hw
    B, L, C3 = qkv.shape
    C = C3 // 3
    hd = C // num_heads
    scale = hd ** -0.5
    # query-block sweep at SAM-H scale (standalone encode, same chip):
    # BQ=128 68.7 ms / 256 66.3 / 512 65.9. 512's ~0.4 ms is inside e2e
    # noise and doubles the per-head fp32 score+bias temporaries (8 MiB
    # each at L=4096) inside the already-tight batch-2 serving program —
    # 256 stays the default.
    BQ = _pick_bq(L, int(os.environ.get("ANYREF_FUSED_GLOBAL_BQ", "256")))
    # q-dependent bias factors, TRANSPOSED to [B, nh, S, L(q)] so the kernel
    # reads [nh, S, BQ] blocks; einsum reads the head split without a
    # materialized transpose. Grouping q as (qh, qw) rows makes the gather
    # trivial: rhT[kh, q] = q[q] . Th[q//W, kh].
    qg = qkv[..., :C].reshape(B, H, W, num_heads, hd)
    rht = jnp.einsum("bhwnc,hkc->bnkhw", qg, tht.astype(qkv.dtype),
                     preferred_element_type=jnp.float32).reshape(
                         B, num_heads, H, L)
    rwt = jnp.einsum("bhwnc,wkc->bnkhw", qg, twt.astype(qkv.dtype),
                     preferred_element_type=jnp.float32).reshape(
                         B, num_heads, W, L)
    kv = qkv[..., C:]                                          # [B, L, 2C]
    mlp_dim = mlp1_p["w"].shape[1]
    mc_cap = int(os.environ.get("ANYREF_FUSED_MLP_CHUNK", "1280"))
    MC = mc_cap if 0 < mc_cap < mlp_dim and mlp_dim % mc_cap == 0 \
        else mlp_dim
    kernel = functools.partial(
        _fused_global_tail_kernel, eps=eps, scale=scale, nh=num_heads,
        hd=hd, kh=H, kw=W, MC=MC)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))  # noqa: E731
    esz = jnp.dtype(x.dtype).itemsize
    # resident: K/V for the image + proj/MLP weights; streamed: x/q/rhT/rwT
    # blocks (double-buffered); temporaries: per-head fp32 scores + bias
    # [L, BQ] and the chunked MLP hidden
    vmem_budget = int(
        (L * 2 * C + C * C + C * mlp_dim + mlp_dim * C) * esz
        + 2 * (BQ * 4 * C + num_heads * (H + W) * BQ) * 4
        + (3 * L * BQ + 2 * BQ * MC + BQ * C + num_heads * BQ * hd) * 4
        + (8 << 20))
    outs = []
    for b in range(B):                 # per-image calls: K/V and weights
        outs.append(pl.pallas_call(    # are fetched once, never revolved
            kernel,
            grid=(L // BQ,),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(vmem_budget, 120 << 20)),
            in_specs=[
                pl.BlockSpec((BQ, C), lambda i: (i, 0)),
                pl.BlockSpec((BQ, C3), lambda i: (i, 0)),
                const((L, 2 * C)),
                pl.BlockSpec((num_heads, H, BQ), lambda i: (0, 0, i)),
                pl.BlockSpec((num_heads, W, BQ), lambda i: (0, 0, i)),
                const((C, C)), const((1, C)),
                const((1, C)), const((1, C)),
                const((C, mlp_dim)), const((1, mlp_dim)),
                const((mlp_dim, C)), const((1, C)),
            ],
            out_specs=pl.BlockSpec((BQ, C), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((L, C), x.dtype),
            interpret=interpret,
        )(x[b], qkv[b], kv[b], rht[b], rwt[b],
          proj_p["w"], proj_p["b"].reshape(1, C),
          ln2["scale"].reshape(1, C), ln2["bias"].reshape(1, C),
          mlp1_p["w"], mlp1_p["b"].reshape(1, mlp_dim),
          mlp2_p["w"], mlp2_p["b"].reshape(1, C)))
    return jnp.stack(outs)


def _relpos_qkv_kernel(qkv_ref, rh_ref, rw_ref, o_ref, *, scale: float,
                       kh: int, kw: int, nh: int, hd: int):
    """Window attention straight off the fused QKV tensor [L, 3C]: per-head
    q/k/v are STATIC COLUMN SLICES in VMEM, so the [B,L,3C] ->
    [B,nh,L,hd] x3 head-split relayouts (and the output merge) never touch
    HBM. One grid step per window, heads unrolled."""
    L = kh * kw
    C = nh * hd
    expand_h, expand_w = _relpos_expanders(kh, kw)
    for h in range(nh):
        q = qkv_ref[0][:, h * hd:(h + 1) * hd]
        k = qkv_ref[0][:, C + h * hd:C + (h + 1) * hd]
        v = qkv_ref[0][:, 2 * C + h * hd:2 * C + (h + 1) * hd]
        rh = rh_ref[0, h].astype(jnp.float32)
        rw = rw_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + jax.lax.dot_general(rh, expand_h, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(rw, expand_w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, h * hd:(h + 1) * hd] = (o / denom).astype(o_ref.dtype)


def flash_relpos_attention_qkv(qkv, rel_h_table, rel_w_table, size_hw,
                               num_heads: int, interpret: bool = False):
    """Window attention from the raw fused-QKV tensor.

    qkv: [B, L, 3C] (the qkv projection output, heads NOT split);
    rel_*_table: [S, S, hd]. Returns [B, L, C] with heads already merged —
    directly consumable by the output projection.
    """
    H, W = size_hw
    B, L, C3 = qkv.shape
    C = C3 // 3
    hd = C // num_heads
    scale = hd ** -0.5
    # bias factors from the q slice; einsum reads [B, L, nh, hd] without a
    # materialized head transpose
    qg = qkv[..., :C].reshape(B, H, W, num_heads, hd)
    rh = jnp.einsum("bhwnc,hkc->bnhwk", qg, rel_h_table.astype(qkv.dtype),
                    preferred_element_type=jnp.float32)
    rw = jnp.einsum("bhwnc,wkc->bnhwk", qg, rel_w_table.astype(qkv.dtype),
                    preferred_element_type=jnp.float32)
    kernel = functools.partial(_relpos_qkv_kernel, scale=scale, kh=H, kw=W,
                               nh=num_heads, hd=hd)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, C3), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, num_heads, L, H), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, num_heads, L, W), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, C), qkv.dtype),
        interpret=interpret,
    )(qkv, rh.reshape(B, num_heads, L, H), rw.reshape(B, num_heads, L, W))


def _mha_qkv_kernel(qkv_ref, o_ref, *, nh: int, hd: int, scale: float):
    """Plain (bias-free, unmasked) multi-head attention straight off the
    fused QKV tensor [L, 3C]: per-head q/k/v are STATIC COLUMN SLICES in
    VMEM, so the [B,L,C] -> [B,nh,L,hd] head-split relayouts (and the
    output merge) that dominate XLA attention at small L never touch HBM.
    One grid step per image, heads unrolled. Serves the CLIP-ViT encoder
    (L=257), where those relayouts made attention ~9x its FLOP roofline."""
    C = nh * hd
    for h in range(nh):
        q = qkv_ref[0][:, h * hd:(h + 1) * hd]
        k = qkv_ref[0][:, C + h * hd:C + (h + 1) * hd]
        v = qkv_ref[0][:, 2 * C + h * hd:2 * C + (h + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, h * hd:(h + 1) * hd] = (o / denom).astype(o_ref.dtype)


def flash_attention_qkv(qkv, num_heads: int, scale: float | None = None,
                        interpret: bool = False):
    """Self-attention from the raw fused-QKV tensor.

    qkv: [B, L, 3C] (heads NOT split). Returns [B, L, C] with heads already
    merged — directly consumable by the output projection."""
    B, L, C3 = qkv.shape
    C = C3 // 3
    hd = C // num_heads
    kernel = functools.partial(_mha_qkv_kernel, nh=num_heads, hd=hd,
                               scale=hd ** -0.5 if scale is None else scale)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, L, C3), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, L, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, C), qkv.dtype),
        interpret=interpret,
    )(qkv)
