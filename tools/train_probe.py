#!/usr/bin/env python
"""Real-hardware training-step probe (VERDICT r4 #3).

The reference's primary workload is TRAINING (/root/reference/train.sh:1-22:
accelerate multi-GPU, per-device batch 6, 10k steps); until round 5 this
rebuild had timed training only on CPU and AOT-compiled it for virtual
meshes. This tool gives training the same hardware rigor serving has:

  phase 1  AOT-compile the LoRA+remat train step (the exact
           tools/train.py step: AdamW, fp32 embed/lm_head islands,
           modules_to_save dense set) at each candidate (preset, batch)
           from ABSTRACT inputs and read XLA's compiled-memory breakdown —
           no weights materialized, so an over-budget config is proven
           over-budget without an on-device OOM;
  phase 2  for the largest config that fits the 16 GiB chip: materialize,
           run warmup + N timed steps on the real TPU, record ms/step and
           tokens/s.

Emits one JSON line (and writes it to the path in argv[1], e.g.
TRAIN_r05.json) carrying every attempted config's memory verdict plus the
executed config's step timings.

Usage: python tools/train_probe.py [TRAIN_r05.json]
Env: TRAIN_PROBE_STEPS (default 5), TRAIN_PROBE_CONFIGS
     ("preset:batch,..." default "7b:1,7b-noaudio:1,3b:2,3b:1").
"""
import dataclasses
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET_GIB = 15.75      # usable HBM on the 16 GiB v5e chip (BASELINE.md)


def preset_cfg(name: str):
    from anyref_tpu.config import anyref_7b

    cfg = anyref_7b()
    if name == "7b":
        return cfg
    if name == "7b-noaudio":
        return cfg.scaled(audio=None)
    if name == "3b":
        # perf-probe preset: a 3B-class LLaMA (hidden 3072, 28 layers, 24
        # heads x 128) under the SAME wiring (SAM-H, CLIP-L, audio) — the
        # largest decoder class whose train state fits one 16 GiB chip.
        # Not a reference config; exists to put a hardware number on the
        # training path when 7B needs the 2x4 mesh.
        return cfg.scaled(llama=dataclasses.replace(
            cfg.llama, hidden_size=3072, intermediate_size=8192,
            num_layers=28, num_heads=24, num_kv_heads=24, head_dim=128))
    raise ValueError(name)


def train_batch(cfg, batch_size: int):
    """Full-size training batch via the real collator (1024^2 SAM canvas,
    512-token text bucket) — same construction as __graft_entry__."""
    import __graft_entry__ as g
    return g._tiny_batch(cfg, batch_size)


def analyze(preset: str, batch_size: int):
    """AOT compile from abstract inputs; returns (record, compiled_or_None,
    shapes) — compiled is None when over budget or compile failed."""
    import jax
    import jax.numpy as jnp

    from anyref_tpu.models import anyref
    from anyref_tpu.train import lora as lora_mod
    from anyref_tpu.train import step as step_mod

    cfg = preset_cfg(preset)
    lora_cfg = lora_mod.LoraConfig()
    optimizer = step_mod.make_optimizer()

    params_abs = jax.eval_shape(
        lambda k: anyref.init(k, cfg, dtype=jnp.bfloat16), jax.random.key(0))
    state_abs, frozen_abs = jax.eval_shape(
        lambda k: step_mod.init_state(k, params_abs, lora_cfg, optimizer),
        jax.random.key(1))
    batch = train_batch(cfg, batch_size)
    batch_abs = {k: jax.ShapeDtypeStruct(np.asarray(v).shape,
                                         np.asarray(v).dtype)
                 for k, v in batch.items()}

    train_step = step_mod.make_train_step(cfg, lora_cfg, optimizer,
                                          remat=True)
    # donate the state: without it the updated opt/dense trees double-buffer
    # (~2 GiB at 7B) on top of the resident set
    jfn = jax.jit(train_step, donate_argnums=(0,))
    rec = {"preset": preset, "batch": batch_size}
    t0 = time.time()
    try:
        compiled = jfn.lower(state_abs, frozen_abs, batch_abs).compile()
    except Exception as e:
        rec["fits"] = False
        rec["compile_error"] = f"{type(e).__name__}: {str(e)[:500]}"
        return rec, None, None
    rec["compile_s"] = round(time.time() - t0, 1)
    ma = compiled.memory_analysis()
    gib = 1 << 30
    rec["argument_gib"] = round(ma.argument_size_in_bytes / gib, 3)
    rec["output_gib"] = round(ma.output_size_in_bytes / gib, 3)
    rec["temp_gib"] = round(ma.temp_size_in_bytes / gib, 3)
    rec["code_gib"] = round(ma.generated_code_size_in_bytes / gib, 3)
    rec["alias_gib"] = round(ma.alias_size_in_bytes / gib, 3)
    total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes + ma.generated_code_size_in_bytes
             - ma.alias_size_in_bytes)
    rec["total_gib"] = round(total / gib, 3)
    rec["fits"] = total / gib < BUDGET_GIB
    return rec, (compiled if rec["fits"] else None), (cfg, lora_cfg,
                                                      optimizer, batch)


def execute(compiled, handles, batch_size: int, steps: int):
    """Materialize params, run warmup + timed steps through the AOT
    executable."""
    import jax
    import jax.numpy as jnp

    from anyref_tpu.models import anyref
    from anyref_tpu.train import step as step_mod

    cfg, lora_cfg, optimizer, batch = handles
    params = jax.jit(functools.partial(anyref.init, cfg=cfg,
                                       dtype=jnp.bfloat16),
                     static_argnames=("cfg",))(jax.random.key(0))
    state, frozen = step_mod.init_state(jax.random.key(1), params, lora_cfg,
                                        optimizer)
    del params
    dbatch = {k: jnp.asarray(v) for k, v in batch.items()
              if not k.startswith("_")}
    state, metrics = compiled(state, frozen, dbatch)   # warmup (donates)
    jax.block_until_ready(metrics)
    loss0 = float(metrics["loss"])
    times = []
    for _ in range(steps):
        t0 = time.time()
        state, metrics = compiled(state, frozen, dbatch)
        jax.block_until_ready(metrics)
        times.append(time.time() - t0)
    loss1 = float(metrics["loss"])
    ms = sorted(times)[len(times) // 2] * 1e3
    # tokens/step = spliced decoder sequence length x batch (text bucket +
    # 255-token image expansion, config.py:201)
    tokens = batch_size * cfg.max_seq_len
    return {"ms_per_step_p50": round(ms, 1),
            "ms_per_step_all": [round(t * 1e3, 1) for t in times],
            "tokens_per_step": tokens,
            "tokens_per_s": round(tokens / (ms / 1e3), 1),
            "loss_first": round(loss0, 4), "loss_last": round(loss1, 4)}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    steps = int(os.environ.get("TRAIN_PROBE_STEPS", "5"))
    configs = os.environ.get("TRAIN_PROBE_CONFIGS",
                             "7b:1,7b-noaudio:1,3b:2,3b:1")
    attempts = []
    executed = None
    for spec in configs.split(","):
        preset, _, b = spec.strip().partition(":")
        rec, compiled, handles = analyze(preset, int(b or "1"))
        attempts.append(rec)
        print(json.dumps(rec), flush=True)
        if compiled is not None:
            timing = execute(compiled, handles, int(b or "1"), steps)
            executed = {**rec, **timing}
            break
    result = {
        "metric": "train_step_on_tpu",
        "value": executed["ms_per_step_p50"] if executed else 0.0,
        "unit": "ms/step",
        "executed": executed,
        "attempts": attempts,
        "budget_gib": BUDGET_GIB,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    sys.exit(0 if executed else 1)


if __name__ == "__main__":
    main()
