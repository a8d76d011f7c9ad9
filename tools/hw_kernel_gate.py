#!/usr/bin/env python
"""Hardware kernel gate: run the Pallas kernel suite COMPILED on the real
TPU and emit one JSON line (pass/fail + per-kernel max-abs-err), so Mosaic
lowering regressions (e.g. from a libtpu bump) are caught by a recorded
artifact instead of a one-off commit (VERDICT r3 #9; the CPU suite runs the
kernels in interpret mode only).

Two layers of evidence:
  1. per-kernel equivalence: each public kernel runs twice on the device —
     compiled (Mosaic) vs interpret mode (semantic reference, lax ops) —
     and the max |compiled - interpret| is recorded per kernel;
  2. the kernel test files under ANYREF_TEST_PLATFORM=axon (the oracles
     there are independent XLA references, not interpret mode).

Usage: python tools/hw_kernel_gate.py [out.json]
Exit code 0 iff every kernel error is under tolerance and pytest passed.
"""
import functools
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL = 0.08      # bf16 streams; observed healthy errors are ~1e-2


def _params(rng, *shape, dtype):
    return rng.standard_normal(shape).astype(np.float32).astype(dtype) * 0.1


def kernel_errors():
    import jax
    import jax.numpy as jnp

    from anyref_tpu.ops import flash

    rng = np.random.default_rng(0)
    bf16 = jnp.bfloat16
    errs = {}

    def err(name, fn):
        out_c = np.asarray(fn(False), np.float32)
        out_i = np.asarray(fn(True), np.float32)
        errs[name] = float(np.max(np.abs(out_c - out_i)))

    # rel-pos flash (SAM global layers' blocked kernel)
    B, nh, hd, H = 1, 4, 64, 16
    L = H * H
    q, k, v = (jnp.asarray(_params(rng, B, nh, L, hd, dtype=bf16))
               for _ in range(3))
    th = jnp.asarray(_params(rng, H, H, hd, dtype=bf16))
    tw = jnp.asarray(_params(rng, H, H, hd, dtype=bf16))
    err("flash_relpos", lambda i: flash.flash_relpos_attention(
        q, k, v, th, tw, (H, H), interpret=i))

    # causal flash, multi-head + blocked paths, with left-pad kv_start
    B2, L2 = 2, 256
    q2, k2, v2 = (jnp.asarray(_params(rng, B2, nh, L2, hd, dtype=bf16))
                  for _ in range(3))
    kv0 = jnp.asarray([0, 64], jnp.int32)
    err("flash_causal_mh", lambda i: flash.flash_causal_attention(
        q2, k2, v2, kv_start=kv0, interpret=i))
    os.environ["ANYREF_CAUSAL_MH_KERNEL"] = "0"
    try:
        err("flash_causal_blocked", lambda i: flash.flash_causal_attention(
            q2, k2, v2, kv_start=kv0, interpret=i))
    finally:
        del os.environ["ANYREF_CAUSAL_MH_KERNEL"]

    # differentiable causal flash: forward + grads
    def diff_loss(i):
        f = lambda a, b, c: jnp.sum(  # noqa: E731
            flash.flash_causal_attention_diff(a, b, c, kv0, interpret=i)
            .astype(jnp.float32))
        g = jax.grad(f, argnums=(0, 1, 2))(q2, k2, v2)
        return jnp.stack([x.astype(jnp.float32).sum() for x in g])
    err("flash_causal_vjp", diff_loss)

    # fused norms
    x = jnp.asarray(_params(rng, 300, 256, dtype=bf16))
    s = jnp.asarray(_params(rng, 256, dtype=jnp.float32))
    b = jnp.asarray(_params(rng, 256, dtype=jnp.float32))
    err("layer_norm", lambda i: flash.layer_norm_fused(x, s, b, 1e-6,
                                                       interpret=i))
    err("rms_norm", lambda i: flash.rms_norm_fused(x, s, 1e-6, interpret=i))

    # QKV-direct kernels (CLIP MHA + window rel-pos)
    ws, C, nhw = 14, 256, 4
    Lw = ws * ws
    qkv = jnp.asarray(_params(rng, 4, Lw, 3 * C, dtype=bf16))
    err("mha_qkv", lambda i: flash.flash_attention_qkv(qkv, nhw,
                                                       interpret=i))
    thw = jnp.asarray(_params(rng, ws, ws, C // nhw, dtype=bf16))
    tww = jnp.asarray(_params(rng, ws, ws, C // nhw, dtype=bf16))
    err("relpos_qkv", lambda i: flash.flash_relpos_attention_qkv(
        qkv, thw, tww, (ws, ws), nhw, interpret=i))

    # fused whole-layer window block (grid 26x26 tokens -> 2x2 windows with
    # right/bottom overhang, exercising the pad mask)
    Hg = Wg = 26
    nwc = -(-Wg // ws)
    NW = nwc * nwc
    xw = jnp.asarray(_params(rng, NW, Lw, C, dtype=bf16))
    pr = {"w": jnp.asarray(_params(rng, C, C, dtype=bf16)),
          "b": jnp.asarray(_params(rng, C, dtype=jnp.float32))}
    qkv_p = {"w": jnp.asarray(_params(rng, C, 3 * C, dtype=bf16)),
             "b": jnp.asarray(_params(rng, 3 * C, dtype=jnp.float32))}
    m1 = {"w": jnp.asarray(_params(rng, C, 4 * C, dtype=bf16)),
          "b": jnp.asarray(_params(rng, 4 * C, dtype=jnp.float32))}
    m2 = {"w": jnp.asarray(_params(rng, 4 * C, C, dtype=bf16)),
          "b": jnp.asarray(_params(rng, C, dtype=jnp.float32))}
    ln1 = {"scale": jnp.ones((C,), jnp.float32),
           "bias": jnp.asarray(_params(rng, C, dtype=jnp.float32))}
    ln2 = {"scale": jnp.ones((C,), jnp.float32),
           "bias": jnp.asarray(_params(rng, C, dtype=jnp.float32))}
    # gathered [L, hd] tables, row-major (j, s) like the encoder builds
    thg = jnp.asarray(_params(rng, Lw, C // nhw, dtype=bf16))
    twg = jnp.asarray(_params(rng, Lw, C // nhw, dtype=bf16))
    err("fused_window_block", lambda i: flash.fused_window_block(
        xw, ln1, qkv_p, thg, twg, pr, ln2, m1, m2, (ws, ws), nhw,
        (Hg, Wg), nwc, 1e-6, interpret=i))

    # the SHIPPED default split pair (r4: ANYREF_FUSED_SPLIT defaults on) —
    # gated separately from the combined kernel so a numerics drift in the
    # production path shows up as its own row in HWGATE_r*.json (VERDICT r4
    # weak #4)
    err("fused_window_attn", lambda i: flash.fused_window_attn(
        xw, ln1, qkv_p, thg, twg, pr, (ws, ws), nhw, (Hg, Wg), nwc, 1e-6,
        interpret=i))
    xs = jnp.asarray(_params(rng, NW * Lw, C, dtype=bf16))
    err("fused_mlp_stream", lambda i: flash.fused_mlp_stream(
        xs, ln2, m1, m2, 1e-6, interpret=i))

    # fused global tail
    Hgl = 16
    Lg = Hgl * Hgl
    xg = jnp.asarray(_params(rng, 1, Lg, C, dtype=bf16))
    qkvg = jnp.asarray(_params(rng, 1, Lg, 3 * C, dtype=bf16))
    thg2 = jnp.asarray(_params(rng, Hgl, Hgl, C // nhw, dtype=bf16))
    twg2 = jnp.asarray(_params(rng, Hgl, Hgl, C // nhw, dtype=bf16))
    err("fused_global_tail", lambda i: flash.fused_global_tail(
        xg, qkvg, thg2, twg2, pr, ln2, m1, m2, (Hgl, Hgl), nhw, 1e-6,
        interpret=i))
    return errs


MEM_BUDGET_GIB = 15.70   # pinned: r4 measured 15.63 G with ~120 MB headroom


def serving_mem_gate():
    """AOT-compile the batch-2 flagship serving program (abstract inputs, no
    weights materialized) and check compiled memory against the pinned
    budget — so a refactor that re-introduces a layout temp fails THIS gate
    instead of OOMing on device mid-bench (VERDICT r4 #8)."""
    from tools import mem_analysis
    bd = mem_analysis.serving_breakdown(preset="7b", batch=2)
    return {k: round(v, 3) for k, v in bd.items()}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    errs = kernel_errors()
    mem = serving_mem_gate()

    env = dict(os.environ, ANYREF_TEST_PLATFORM="axon")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_flash.py",
         "tests/test_fused_serving.py", "-q", "--no-header", "-x"],
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=int(os.environ.get("HWGATE_PYTEST_DEADLINE_S", "3600")))
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
    ok = (proc.returncode == 0 and all(e < TOL for e in errs.values())
          and mem["total_gib"] < MEM_BUDGET_GIB)
    result = {
        "metric": "hw_kernel_gate",
        "value": 1.0 if ok else 0.0,
        "unit": "pass",
        "pytest_rc": proc.returncode,
        "pytest_tail": tail,
        "tolerance": TOL,
        "max_abs_err": {k: round(v, 5) for k, v in errs.items()},
        "serving_batch2_mem": mem,
        "mem_budget_gib": MEM_BUDGET_GIB,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    if not ok:
        sys.stderr.write(proc.stdout[-4000:] + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
