#!/usr/bin/env python
"""Compiled-memory analysis of the serving program (VERDICT r3 #5: name
the allocation that blows the 16 GiB budget at batch 4).

AOT-lowers and compiles bench.py's exact generate program at the requested
batch size and prints XLA's memory_analysis breakdown (argument/output/
temp/generated-code bytes). On RESOURCE_EXHAUSTED the error text itself
carries the allocation table — printed verbatim, plus the largest-buffer
lines, so the failure names its cause.

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


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from anyref_tpu.models import anyref

    preset = os.environ.get("BENCH_PRESET", "7b")
    batch = int(os.environ.get("BENCH_BATCH", "4"))
    decode_tokens = int(os.environ.get("BENCH_DECODE_TOKENS", "32"))
    draft_len = int(os.environ.get("BENCH_DRAFT_LEN", "15"))
    speculative = os.environ.get("BENCH_SPECULATIVE", "1") == "1"
    fa = os.environ.get("BENCH_FORCE_ACCEPT", "8")
    max_accept = int(fa) if fa else None

    cfg, params = bench.build(preset)
    if speculative:
        from anyref_tpu.models import llama as llama_mod
        params["llama"] = llama_mod.fuse_for_serving(
            llama_mod.transpose_for_serving(params["llama"]))
    batch_data = bench.make_batch(cfg, batch_size=batch)

    def run(params, cfg_, b):
        out = anyref.generate(params, cfg_, b, max_new_tokens=decode_tokens,
                              speculative=speculative, draft_len=draft_len,
                              max_accept=max_accept)
        return (out.output_ids, out.decode_passes,
                out.low_res_masks[:, :1].astype(jnp.bfloat16))

    print(f"lowering [{preset}, batch {batch}, decode {decode_tokens}, "
          f"spec={speculative}, draft {draft_len}, accept {max_accept}] ...",
          flush=True)
    lowered = jax.jit(run, static_argnums=(1,)).lower(params, cfg,
                                                      batch_data)
    copts = {}
    for kv in filter(None, os.environ.get("MEM_XLA_OPTS", "").split(",")):
        k, _, v = kv.partition("=")
        copts[k.strip()] = {"true": True, "false": False}.get(
            v.strip().lower(), v.strip())
    if copts:
        print("compiler_options:", copts, flush=True)
    try:
        compiled = lowered.compile(compiler_options=copts or None)
    except Exception as e:
        msg = str(e)
        print("COMPILE FAILED:", type(e).__name__)
        # surface the largest allocations from the error's buffer table
        sizes = re.findall(
            r"^\s*(?:Buffer|Allocation|.*?Size):?.*?(\d+(?:\.\d+)?)\s*"
            r"([KMG]i?B).*$", msg, re.MULTILINE)
        print(msg[:8000])
        if len(msg) > 8000:
            print(f"... [{len(msg)} chars total]")
            # the tail usually holds the per-buffer breakdown
            print(msg[-6000:])
        sys.exit(2)
    ma = compiled.memory_analysis()
    gib = 1024 ** 3
    print(f"argument_size:       {ma.argument_size_in_bytes / gib:8.3f} GiB")
    print(f"output_size:         {ma.output_size_in_bytes / gib:8.3f} GiB")
    print(f"temp_size:           {ma.temp_size_in_bytes / gib:8.3f} GiB")
    print(f"generated_code_size: {ma.generated_code_size_in_bytes / gib:8.3f}"
          " GiB")
    print(f"alias_size:          {ma.alias_size_in_bytes / gib:8.3f} GiB")
    total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes + ma.generated_code_size_in_bytes
             - ma.alias_size_in_bytes)
    print(f"TOTAL (args+out+temp+code-alias): {total / gib:.3f} GiB "
          f"(chip HBM: 16 GiB)")


if __name__ == "__main__":
    main()
