"""SAM ViTDet image encoder, TPU-native.

Functional re-design of the reference encoder
(model/segment_anything/modeling/image_encoder.py:17-426): windowed attention
(size 14) with 4 global-attention layers and decomposed relative position
bias, absolute position embeddings, and a conv neck to 256 channels.

TPU-first choices:
  * patch embed is a reshape+matmul (16x16 stride-16 conv is non-overlapping),
    landing directly on the MXU instead of going through a conv lowering;
  * window partitioning is pure reshape/transpose on [B, H, W, C];
  * attention runs through a single `attention` entry point that takes
    precomputed decomposed rel-pos factors (rel_h, rel_w) so the same
    interface serves the XLA oracle and the Pallas flash kernel;
  * the conv neck runs in fp32 (the reference guards fp16 overflow there,
    image_encoder.py:118-124; on TPU we keep the fp32 island).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ...config import SamConfig
from ...ops.common import conv2d, gelu, layer_norm, layer_norm_2d, linear
from ...ops.attention import attention_with_decomposed_relpos


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------
def init(key: jax.Array, cfg: SamConfig, dtype=jnp.float32) -> dict:
    d = cfg.encoder_embed_dim
    grid = cfg.embedding_size
    mlp = int(d * cfg.mlp_ratio)
    head_dim = d // cfg.encoder_num_heads
    ks = iter(jax.random.split(key, 6 + 8 * cfg.encoder_depth))

    def lin(k, i, o, bias=True):
        p = {"w": (jax.random.normal(k, (i, o)) * (i ** -0.5)).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((o,), dtype)
        return p

    def ln(dim):
        return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    params = {
        "patch_embed": lin(next(ks), 3 * cfg.patch_size ** 2, d),
        "pos_embed": jnp.zeros((1, grid, grid, d), dtype),
        "blocks": [],
        "neck": {
            "conv1": {"w": (jax.random.normal(next(ks), (cfg.prompt_embed_dim, d, 1, 1))
                            * (d ** -0.5)).astype(dtype)},
            "ln1": ln(cfg.prompt_embed_dim),
            "conv2": {"w": (jax.random.normal(
                next(ks), (cfg.prompt_embed_dim, cfg.prompt_embed_dim, 3, 3))
                * (cfg.prompt_embed_dim * 9) ** -0.5).astype(dtype)},
            "ln2": ln(cfg.prompt_embed_dim),
        },
    }
    for i in range(cfg.encoder_depth):
        is_global = i in cfg.encoder_global_attn_indexes
        size = grid if is_global else cfg.window_size
        params["blocks"].append({
            "norm1": ln(d),
            "attn": {
                "qkv": lin(next(ks), d, 3 * d),
                "proj": lin(next(ks), d, d),
                "rel_pos_h": jnp.zeros((2 * size - 1, head_dim), dtype),
                "rel_pos_w": jnp.zeros((2 * size - 1, head_dim), dtype),
            },
            "norm2": ln(d),
            "mlp": {"lin1": lin(next(ks), d, mlp), "lin2": lin(next(ks), mlp, d)},
        })
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------
def _get_rel_pos_table(size: int, rel_pos: jax.Array) -> jax.Array:
    """[2*size-1, hd] table -> [q, k, hd] gathered bias factors for q_size ==
    k_size == size (reference image_encoder.py:321-351; the interpolation
    branch never triggers because tables are stored at native size)."""
    coords = np.arange(size)[:, None] - np.arange(size)[None, :] + size - 1
    return rel_pos[jnp.asarray(coords)]


def _attn_block(p, x: jax.Array, num_heads: int, size_hw: tuple[int, int]) -> jax.Array:
    """Attention over [B, H, W, C] tokens with decomposed rel-pos bias."""
    from ...ops import flash as _flash

    B, H, W, C = x.shape
    head_dim = C // num_heads
    rh = _get_rel_pos_table(size_hw[0], p["rel_pos_h"])  # [H, H, hd]
    rw = _get_rel_pos_table(size_hw[1], p["rel_pos_w"])  # [W, W, hd]

    L = H * W
    if (L < 1024 and _flash.supported_relpos(*size_hw, head_dim)
            and _flash.mesh_rows_ok(B)
            and os.environ.get("ANYREF_QKV_WINDOW_KERNEL", "1") == "1"):
        # window path: the kernel consumes the raw fused-QKV tensor and
        # slices heads as VMEM columns — the [B,L,3C] -> [B,nh,L,hd] x3
        # head-split relayouts (and the output merge) never hit HBM.
        # Measured: SAM-H encode 88 -> 82 ms, e2e bench 5.93 q/s. (One
        # transient backend ABORT was traced to a wedged device, not this
        # path — both bench presets failed inside a single wedged process
        # and every later run passed.) ANYREF_QKV_WINDOW_KERNEL=0 opts out.
        # Equivalence: test_relpos_qkv_kernel_matches_split_path.
        qkv = linear(p["qkv"], x).reshape(B, L, 3 * C)
        # multi-device: windows (batch-major) over "data"; tables replicated
        call = _flash.shard_wrap(
            functools.partial(_flash.flash_relpos_attention_qkv,
                              size_hw=size_hw, num_heads=num_heads,
                              interpret=jax.default_backend() != "tpu"),
            in_specs=(P("data"), P(), P()), out_specs=P("data"))
        out = call(qkv, rh, rw)
        return linear(p["proj"], out.reshape(B, H, W, C))

    qkv = linear(p["qkv"], x).reshape(B, L, 3, num_heads, head_dim)
    q, k, v = jnp.moveaxis(qkv, 2, 0)          # [B, HW, heads, hd]
    q = q.transpose(0, 2, 1, 3)                # [B, heads, HW, hd]
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    out = attention_with_decomposed_relpos(q, k, v, rh, rw, size_hw)
    out = out.transpose(0, 2, 1, 3).reshape(B, H, W, C)
    return linear(p["proj"], out)


def _window_partition(x: jax.Array, ws: int):
    """[B, H, W, C] -> [B*nw, ws, ws, C] with zero padding (reference
    image_encoder.py:263-288)."""
    B, H, W, C = x.shape
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def _window_unpartition(wins: jax.Array, ws: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = wins.shape[0] // (Hp * Wp // ws // ws)
    x = wins.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _fused_global_layer_enabled(cfg: SamConfig, H: int, W: int) -> bool:
    # Fused GLOBAL-block tail (attention+proj+residual+LN2+MLP in one
    # Pallas call per image, ops/flash.py fused_global_tail). Same rationale
    # as the fused window kernel: the per-layer XLA fusions/relayouts around
    # the 4 global layers and the blocked kernel's bias-EXPANSION dots
    # (~45% of its attention FLOPs) disappear. CPU stays on the unfused
    # path (interpret-mode Pallas at L=4096 would bloat the suite); the
    # equivalence test forces it on via ANYREF_FUSED_GLOBAL_BLOCK=1.
    from ...ops import flash as _flash

    hd = cfg.encoder_embed_dim // cfg.encoder_num_heads
    if not _flash.supported_global_fused(H, W, hd):
        return False
    env = os.environ.get("ANYREF_FUSED_GLOBAL_BLOCK")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def _fused_global_layer(p, x: jax.Array, cfg: SamConfig) -> jax.Array:
    """Whole global block with LN1+QKV in XLA (that GEMM runs at MXU peak)
    and the rest in one Pallas call per image (fused_global_tail)."""
    from ...ops import flash as _flash

    B, H, W, C = x.shape
    tht = _get_rel_pos_table(H, p["attn"]["rel_pos_h"])   # [H, H, hd]
    twt = _get_rel_pos_table(W, p["attn"]["rel_pos_w"])
    h = layer_norm(p["norm1"], x, eps=cfg.layer_norm_eps, fused=True)
    qkv = linear(p["attn"]["qkv"], h.reshape(B, H * W, C))
    # multi-device: image batch over "data", weights/tables replicated
    call = _flash.shard_wrap(
        functools.partial(_flash.fused_global_tail,
                          size_hw=(H, W), num_heads=cfg.encoder_num_heads,
                          eps=cfg.layer_norm_eps,
                          interpret=jax.default_backend() != "tpu"),
        in_specs=(P("data"), P("data"), P(), P(), P(), P(), P(), P()),
        out_specs=P("data"))
    out = call(x.reshape(B, H * W, C), qkv, tht, twt, p["attn"]["proj"],
               p["norm2"], p["mlp"]["lin1"], p["mlp"]["lin2"])
    return out.reshape(B, H, W, C)


def _block(p, x: jax.Array, cfg: SamConfig, window: bool) -> jax.Array:
    from ...ops import flash as _flash

    if (not window and _fused_global_layer_enabled(cfg, x.shape[1], x.shape[2])
            and _flash.mesh_rows_ok(x.shape[0])):
        return _fused_global_layer(p, x, cfg)
    shortcut = x
    x = layer_norm(p["norm1"], x, eps=cfg.layer_norm_eps, fused=True)
    if window:
        H, W = x.shape[1], x.shape[2]
        x, pad_hw = _window_partition(x, cfg.window_size)
        x = _attn_block(p["attn"], x, cfg.encoder_num_heads,
                        (cfg.window_size, cfg.window_size))
        x = _window_unpartition(x, cfg.window_size, pad_hw, (H, W))
    else:
        x = _attn_block(p["attn"], x, cfg.encoder_num_heads,
                        (x.shape[1], x.shape[2]))
    x = shortcut + x
    h = layer_norm(p["norm2"], x, eps=cfg.layer_norm_eps, fused=True)
    h = linear(p["mlp"]["lin2"], gelu(linear(p["mlp"]["lin1"], h)))
    return x + h


def _fused_window_layer(p, xw: jax.Array, cfg: SamConfig,
                        grid_hw: tuple[int, int], nwc: int) -> jax.Array:
    """Whole windowed block in ONE Pallas call (ops/flash.py
    fused_window_block): LN1+mask+QKV+rel-pos attention+proj+residual+
    LN2+MLP+residual, layer weights VMEM-resident across the window grid.
    Same math as _block_windowed_resident (pad mask computed in-kernel
    from the window index). Kills the per-layer XLA fusion/relayout
    overhead around the windowed run (BASELINE.md profile: ~55 ms of the
    88 ms SAM-H encode)."""
    from ...ops import flash as _flash

    ws = cfg.window_size
    tht = _get_rel_pos_table(ws, p["attn"]["rel_pos_h"]).reshape(ws * ws, -1)
    twt = _get_rel_pos_table(ws, p["attn"]["rel_pos_w"]).reshape(ws * ws, -1)
    interp = jax.default_backend() != "tpu"
    if os.environ.get("ANYREF_FUSED_SPLIT", "1") == "1":
        # split variant (DEFAULT, r4): attention and MLP as two pipelined
        # kernels. Frees the MLP weights from the attention kernel's VMEM
        # budget (the WG constraint) and runs the MLP as a window-structure-
        # free row-blocked GEMM stream at shape-optimal M. Same-window A/B
        # vs the combined kernel (7 interleaved rounds, healthy chip):
        # 2.88 vs 3.03 ms/layer standalone, e2e 7.41 vs 7.36 q/s.
        # ANYREF_FUSED_SPLIT=0 restores the combined whole-layer kernel.
        NW, L, C = xw.shape
        # multi-device: windows (batch-major, B divides so shard cuts fall
        # on image boundaries) over "data"; weights/tables replicated
        attn_call = _flash.shard_wrap(
            functools.partial(_flash.fused_window_attn,
                              size_hw=(ws, ws),
                              num_heads=cfg.encoder_num_heads,
                              grid_hw=grid_hw, nwc=nwc,
                              eps=cfg.layer_norm_eps, interpret=interp),
            in_specs=(P("data"), P(), P(), P(), P(), P()),
            out_specs=P("data"))
        x1 = attn_call(xw, p["norm1"], p["attn"]["qkv"], tht, twt,
                       p["attn"]["proj"])
        mlp_call = _flash.shard_wrap(
            functools.partial(_flash.fused_mlp_stream,
                              eps=cfg.layer_norm_eps, interpret=interp),
            in_specs=(P("data"), P(), P(), P()), out_specs=P("data"))
        return mlp_call(x1.reshape(NW * L, C), p["norm2"], p["mlp"]["lin1"],
                        p["mlp"]["lin2"]).reshape(NW, L, C)
    block_call = _flash.shard_wrap(
        functools.partial(_flash.fused_window_block,
                          size_hw=(ws, ws), num_heads=cfg.encoder_num_heads,
                          grid_hw=grid_hw, nwc=nwc,
                          eps=cfg.layer_norm_eps, interpret=interp),
        in_specs=(P("data"),) + (P(),) * 8, out_specs=P("data"))
    return block_call(xw, p["norm1"], p["attn"]["qkv"], tht, twt,
                      p["attn"]["proj"], p["norm2"], p["mlp"]["lin1"],
                      p["mlp"]["lin2"])


def _fused_window_layer_enabled(cfg: SamConfig) -> bool:
    # DEFAULT ON for TPU (r3, healthy-chip measurements): SAM-H encode
    # 83.9 -> 71.6 ms standalone and e2e bench 5.74 -> 7.30 q/s/chip at
    # the defensible operating point, same day, same chip. The earlier
    # "hung compiling inside the full 7B program" was root-caused: fully
    # unrolling WG windows x 16 heads of attention bodies blows up the
    # Mosaic compile (the axon remote-compile helper is SIGKILLed —
    # "tpu_compile_helper subprocess exit signal SIGKILL (9)"), which from
    # the client looks like a hang/opaque failure. The kernel now iterates
    # windows via an in-kernel fori_loop (nh unrolled bodies at any WG;
    # see ops/flash.py fused_window_block for the WG default/tradeoffs).
    # CPU stays on the unfused resident path (interpret-mode Pallas for
    # 24 layers x 25 windows would bloat the suite); the equivalence
    # test forces the kernel on via ANYREF_FUSED_WINDOW_BLOCK=1.
    from ...ops import flash as _flash

    ws = cfg.window_size
    if not (_flash.pallas_enabled() and 64 <= ws * ws <= 1024):
        return False
    env = os.environ.get("ANYREF_FUSED_WINDOW_BLOCK")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def _block_windowed_resident(p, xw: jax.Array, mask: jax.Array,
                             cfg: SamConfig) -> jax.Array:
    """Windowed block on a window-RESIDENT stream [B*nw, ws, ws, C].

    Exactly the reference block: the reference re-pads the post-norm1 values
    with zeros every layer before attention (image_encoder.py:263-288), which
    in the resident layout is a multiply by the pad ``mask`` — so pad-window
    keys/values/queries match the reference's zero pads bit-for-bit while the
    [B,64,64,C] <-> [B*nw,14,14,C] relayout happens once per windowed RUN
    instead of twice per layer (the relayouts cost ~21 ms of SAM-H encode).
    Pad positions accumulate garbage through residual/MLP but are re-masked
    each layer and cropped at the run-final unpartition, never read.
    """
    shortcut = xw
    h = layer_norm(p["norm1"], xw, eps=cfg.layer_norm_eps, fused=True) * mask
    h = _attn_block(p["attn"], h, cfg.encoder_num_heads,
                    (cfg.window_size, cfg.window_size))
    x = shortcut + h
    h = layer_norm(p["norm2"], x, eps=cfg.layer_norm_eps, fused=True)
    h = linear(p["mlp"]["lin2"], gelu(linear(p["mlp"]["lin1"], h)))
    return x + h


def patch_embed(p, x: jax.Array, patch: int) -> jax.Array:
    """[B, 3, H, W] -> [B, H/ps, W/ps, D] via reshape+matmul."""
    B, C, H, W = x.shape
    gh, gw = H // patch, W // patch
    x = x.reshape(B, C, gh, patch, gw, patch)
    # flatten (c, kh, kw) in torch-conv order so OIHW weights convert directly
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, gh, gw, C * patch * patch)
    return linear(p, x)


def apply(params: dict, x: jax.Array, cfg: SamConfig) -> jax.Array:
    """[B, 3, image_size, image_size] normalized pixels -> [B, 256, grid, grid]
    image embeddings (reference image_encoder.py:110-125)."""
    # compute in the param dtype (fp32 pixels would promote every block —
    # and double the flash kernel's VMEM footprint)
    x = x.astype(params["patch_embed"]["w"].dtype)
    x = patch_embed(params["patch_embed"], x, cfg.patch_size)
    x = x + params["pos_embed"].astype(x.dtype)
    H, W = x.shape[1], x.shape[2]
    ws = cfg.window_size
    pad_mask, _ = _window_partition(
        jnp.ones((1, H, W, 1), x.dtype), ws)          # [nw, ws, ws, 1]
    win_x = pad_hw = None
    from ...ops import flash as _flash
    fused = _fused_window_layer_enabled(cfg) and _flash.mesh_rows_ok(x.shape[0])
    for i, bp in enumerate(params["blocks"]):
        if i in cfg.encoder_global_attn_indexes:
            if win_x is not None:
                x = _window_unpartition(win_x, ws, pad_hw, (H, W))
                win_x = None
            x = _block(bp, x, cfg, window=False)
        else:
            if win_x is None:
                win_x, pad_hw = _window_partition(x, ws)
                nw = win_x.shape[0] // x.shape[0]
                mask = jnp.tile(pad_mask, (x.shape[0], 1, 1, 1))
            if fused:
                nwc = pad_hw[1] // ws
                win_x = _fused_window_layer(
                    bp, win_x.reshape(win_x.shape[0], ws * ws, -1),
                    cfg, (H, W), nwc).reshape(win_x.shape)
            else:
                win_x = _block_windowed_resident(bp, win_x, mask, cfg)
    if win_x is not None:
        x = _window_unpartition(win_x, ws, pad_hw, (H, W))
    # fp32 island for the neck (reference image_encoder.py:118-124)
    y = x.astype(jnp.float32).transpose(0, 3, 1, 2)
    y = conv2d(params["neck"]["conv1"],
               y.astype(jnp.float32), padding="VALID")
    y = layer_norm_2d(params["neck"]["ln1"], y, eps=cfg.layer_norm_eps)
    y = conv2d(params["neck"]["conv2"], y, padding=((1, 1), (1, 1)))
    y = layer_norm_2d(params["neck"]["ln2"], y, eps=cfg.layer_norm_eps)
    return y.astype(x.dtype)
