#!/usr/bin/env python
"""Compiled-memory analysis of the serving program (VERDICT r3 #5: name
the allocation that blows the 16 GiB budget at batch 4).

AOT-lowers and compiles bench.py's exact generate program at the requested
batch size and prints XLA's memory_analysis breakdown (argument/output/
temp/generated-code bytes). On RESOURCE_EXHAUSTED the error text itself
carries the allocation table — printed verbatim, plus the largest-buffer
lines, so the failure names its cause.

``serving_breakdown()`` is the reusable core: it compiles from ABSTRACT
inputs (ShapeDtypeStructs — no weights materialized, safe to run while the
chip holds another program) and returns the breakdown dict. The hardware
kernel gate calls it to enforce the batch-2 memory budget every round
(VERDICT r4 #8: batch 2 fits with only ~120 MB of headroom, so a refactor
that adds a layout temp must fail a recorded gate, not OOM mid-bench).

Usage:
  BENCH_BATCH=4 python tools/mem_analysis.py          # the OOM case
  BENCH_BATCH=2 python tools/mem_analysis.py          # the operating point
Env mirrors bench.py: BENCH_PRESET, BENCH_DECODE_TOKENS, BENCH_DRAFT_LEN,
BENCH_FORCE_ACCEPT, BENCH_SPECULATIVE. MEM_XLA_OPTS="k=v,k=v" forwards XLA
compiler options (proto-backed flags reach the remote-compile helper) — used
to test whether scheduler overlap is what pushes batch 4 over the budget.
"""
import functools
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def serving_breakdown(preset: str = "7b", batch: int = 2,
                      decode_tokens: int = 32, draft_len: int = 15,
                      speculative: bool = True, max_accept=8,
                      compiler_options=None):
    """AOT-compile bench.py's exact serving generate from abstract inputs
    and return {argument,output,temp,code,alias,total}_gib. Raises on
    compile failure (RESOURCE_EXHAUSTED carries the buffer table)."""
    import jax
    import jax.numpy as jnp

    from anyref_tpu.config import anyref_7b, anyref_tiny
    from anyref_tpu.models import anyref
    from anyref_tpu.models import llama as llama_mod

    if preset == "tiny":
        cfg = anyref_tiny()
    else:
        cfg = anyref_7b()
        if preset == "7b-noaudio":
            cfg = cfg.scaled(audio=None)

    def abstract_params(key):
        params = anyref.init(key, cfg, dtype=jnp.bfloat16)
        # bench.build folds the fp32 training islands to bf16 for serving
        params["llama"]["embed_tokens"] = \
            params["llama"]["embed_tokens"].astype(jnp.bfloat16)
        params["llama"]["lm_head"] = \
            params["llama"]["lm_head"].astype(jnp.bfloat16)
        if speculative:
            params["llama"] = llama_mod.fuse_for_serving(
                llama_mod.transpose_for_serving(params["llama"]))
        return params

    params_abs = jax.eval_shape(abstract_params, jax.random.key(0))
    import bench
    batch_abs = jax.eval_shape(
        lambda: bench.make_batch(cfg, batch_size=batch))

    def run(params, cfg_, b):
        out = anyref.generate(params, cfg_, b, max_new_tokens=decode_tokens,
                              speculative=speculative, draft_len=draft_len,
                              max_accept=max_accept)
        return (out.output_ids, out.decode_passes,
                out.low_res_masks[:, :1].astype(jnp.bfloat16))

    lowered = jax.jit(run, static_argnums=(1,)).lower(params_abs, cfg,
                                                      batch_abs)
    compiled = lowered.compile(compiler_options=compiler_options or None)
    ma = compiled.memory_analysis()
    gib = 1 << 30
    out = {
        "argument_gib": ma.argument_size_in_bytes / gib,
        "output_gib": ma.output_size_in_bytes / gib,
        "temp_gib": ma.temp_size_in_bytes / gib,
        "code_gib": ma.generated_code_size_in_bytes / gib,
        "alias_gib": ma.alias_size_in_bytes / gib,
    }
    out["total_gib"] = (out["argument_gib"] + out["output_gib"]
                        + out["temp_gib"] + out["code_gib"]
                        - out["alias_gib"])
    return out


def main():
    preset = os.environ.get("BENCH_PRESET", "7b")
    batch = int(os.environ.get("BENCH_BATCH", "4"))
    decode_tokens = int(os.environ.get("BENCH_DECODE_TOKENS", "32"))
    draft_len = int(os.environ.get("BENCH_DRAFT_LEN", "15"))
    speculative = os.environ.get("BENCH_SPECULATIVE", "1") == "1"
    fa = os.environ.get("BENCH_FORCE_ACCEPT", "8")
    max_accept = int(fa) if fa else None

    copts = {}
    for kv in filter(None, os.environ.get("MEM_XLA_OPTS", "").split(",")):
        k, _, v = kv.partition("=")
        copts[k.strip()] = {"true": True, "false": False}.get(
            v.strip().lower(), v.strip())
    if copts:
        print("compiler_options:", copts, flush=True)
    print(f"lowering [{preset}, batch {batch}, decode {decode_tokens}, "
          f"spec={speculative}, draft {draft_len}, accept {max_accept}] ...",
          flush=True)
    try:
        bd = serving_breakdown(preset, batch, decode_tokens, draft_len,
                               speculative, max_accept,
                               compiler_options=copts)
    except Exception as e:
        msg = str(e)
        print("COMPILE FAILED:", type(e).__name__)
        print(msg[:8000])
        if len(msg) > 8000:
            print(f"... [{len(msg)} chars total]")
            # the tail usually holds the per-buffer breakdown
            print(msg[-6000:])
        sys.exit(2)
    for k in ("argument_gib", "output_gib", "temp_gib", "code_gib",
              "alias_gib"):
        print(f"{k[:-4]}_size:  {bd[k]:8.3f} GiB")
    print(f"TOTAL (args+out+temp+code-alias): {bd['total_gib']:.3f} GiB "
          f"(chip HBM: 16 GiB)")


if __name__ == "__main__":
    main()
