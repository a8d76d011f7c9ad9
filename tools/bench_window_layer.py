#!/usr/bin/env python
"""Per-layer micro-benchmark of the SAM-H windowed block paths.

Chains REP layers inside one jit (the axon tunnel adds ~40 ms per dispatch,
so per-call timing is meaningless) and reports ms/layer for:
  * resident  — the unfused window-resident path (r2 default)
  * fused     — the whole-layer fused Pallas kernel (ops/flash.py
                fused_window_block, ANYREF_FUSED_WINDOW_BLOCK=1)
Also prints a chip-health calibration (HBM GB/s + GEMM TFLOP/s): the shared
v5e fluctuates (observed 93-660 GB/s across days); absolute layer times are
only comparable at similar health.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def calibrate():
    rng = np.random.default_rng(0)
    # barrier-separated passes + two-length difference: see
    # bench._measure_hbm_gbps (a fused multiply chain measures dispatch
    # latency, not bandwidth)
    import bench as _bench
    bw = _bench._measure_hbm_gbps(jax, jnp)
    REP = 20
    M = 2048
    a = jnp.asarray(rng.standard_normal((M, M)) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((M, M)) * 0.02, jnp.bfloat16)
    g = jax.jit(lambda x: [x := jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
                           for _ in range(REP)][-1])
    o = g(a); float(o[0, 0].astype(jnp.float32))
    t0 = time.time(); o = g(a); float(o[0, 0].astype(jnp.float32))
    tf = 2 * M ** 3 / ((time.time() - t0) / REP) / 1e12
    print(f"chip health: HBM ~{bw:.0f} GB/s, GEMM ~{tf:.1f} TFLOP/s")


def main():
    from anyref_tpu.config import SamConfig
    from anyref_tpu.models.sam import image_encoder as enc

    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    calibrate()
    cfg = SamConfig()
    ws, C = cfg.window_size, cfg.encoder_embed_dim
    H = W = cfg.embedding_size
    rng = np.random.default_rng(0)
    p = enc.init(jax.random.key(0), SamConfig(encoder_depth=1),
                 jnp.bfloat16)["blocks"][0]
    x = jnp.asarray(rng.standard_normal((1, H, W, C)) * 0.3, jnp.bfloat16)
    xw, pad_hw = enc._window_partition(x, ws)
    pad_mask, _ = enc._window_partition(jnp.ones((1, H, W, 1), x.dtype), ws)
    mask = jnp.tile(pad_mask, (1, 1, 1, 1))
    nwc = pad_hw[1] // ws
    NW, L = xw.shape[0], ws * ws
    REP = 24

    def run(name, layer):
        f = jax.jit(lambda z: [z := layer(z) for _ in range(REP)][-1])
        t0 = time.time(); out = f(xw); out.block_until_ready()
        ct = time.time() - t0
        float(jnp.sum(out.astype(jnp.float32)))
        ts = []
        for _ in range(5):
            t0 = time.time(); o = f(xw)
            float(jnp.sum(o.astype(jnp.float32)))
            ts.append((time.time() - t0) * 1e3)
        ts.sort()
        print(f"{name:9s} compile {ct:5.1f}s  {ts[2]:.2f} ms / {REP} layers "
              f"-> {ts[2] / REP:.3f} ms/layer")

    if mode in ("both", "resident"):
        run("resident",
            lambda z: enc._block_windowed_resident(p, z, mask, cfg))
    if mode in ("both", "fused"):
        os.environ["ANYREF_FUSED_SPLIT"] = "0"   # split is the r4 default
        run("fused", lambda z: enc._fused_window_layer(
            p, z.reshape(NW, L, C), cfg, (H, W), nwc).reshape(z.shape))
        os.environ.pop("ANYREF_FUSED_SPLIT", None)
    if mode in ("both", "split"):
        os.environ["ANYREF_FUSED_SPLIT"] = "1"
        run("split", lambda z: enc._fused_window_layer(
            p, z.reshape(NW, L, C), cfg, (H, W), nwc).reshape(z.shape))
        os.environ.pop("ANYREF_FUSED_SPLIT", None)
    # --- per-phase attribution of the split pair (VERDICT r4 #6) --------
    # Times each kernel of the pair ALONE in its own chain; phase ms/layer
    # sum ≈ pair ms/layer (no cross-kernel fusion exists to lose). The
    # rel-pos tables are precomputed once like the encoder does per layer.
    if mode in ("phases", "attn"):
        from anyref_tpu.ops import flash as _flash
        tht = enc._get_rel_pos_table(
            ws, p["attn"]["rel_pos_h"]).reshape(ws * ws, -1)
        twt = enc._get_rel_pos_table(
            ws, p["attn"]["rel_pos_w"]).reshape(ws * ws, -1)
        run("attn", lambda z: _flash.fused_window_attn(
            z.reshape(NW, L, C), p["norm1"], p["attn"]["qkv"], tht, twt,
            p["attn"]["proj"], (ws, ws), cfg.encoder_num_heads, (H, W),
            nwc, eps=cfg.layer_norm_eps).reshape(z.shape))
    if mode in ("phases", "mlp"):
        from anyref_tpu.ops import flash as _flash
        run("mlp", lambda z: _flash.fused_mlp_stream(
            z.reshape(NW * L, C), p["norm2"], p["mlp"]["lin1"],
            p["mlp"]["lin2"], eps=cfg.layer_norm_eps).reshape(z.shape))
    if mode == "phases":
        # GELU variant of the MLP stream: the lone transcendental knob
        from anyref_tpu.ops import flash as _flash
        os.environ["ANYREF_FUSED_GELU"] = "tanh"
        run("mlp-tanh", lambda z: _flash.fused_mlp_stream(
            z.reshape(NW * L, C), p["norm2"], p["mlp"]["lin1"],
            p["mlp"]["lin2"], eps=cfg.layer_norm_eps).reshape(z.shape))
        os.environ.pop("ANYREF_FUSED_GELU", None)


if __name__ == "__main__":
    main()
