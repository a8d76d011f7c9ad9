#!/usr/bin/env python
"""AOT-compile the TP-2 batch-4 SERVING program — the documented recovery
lever for the single-chip batch-4 memory wall (VERDICT r4 #5).

BASELINE.md's batch-4 analysis proved batch 4 cannot fit one 16 GiB chip
(weights 14.4 G resident + ~0.9 G extra cache/activations vs 120 MB
headroom) and inferred "batch >=4 needs TP>=2". This tool turns that
inference into a verified statement: it lowers + compiles anyref.generate
at batch 4 with the decoder Megatron-sharded over a model=2 mesh (the
Predictor's multi-device path: plain layout, llama.decode_chunk handles
both), and records per-device resident weight bytes plus the compiled
temp/output sizes.

Compiles for the REAL v5e target by default: JAX's AOT topology API
(jax.experimental.topologies.get_topology_desc('v5e:2x2x1')) reaches the
TPU compiler without attached chips, so memory_analysis() reports the
actual TPU buffer assignment per device — data=2 x model=2 (the smallest
one-host v5e slice), batch 4 PER DATA REPLICA. Falls back to a 2-device
virtual CPU mesh (AOT_TP2_BACKEND=cpu) where only partitioning correctness
is checked and per-device WEIGHT bytes come from analytic spec math (the
CPU backend's temp accounting is not representative of TPU). Projected q/s
is derived in BASELINE.md from the measured single-chip stage costs, not
from this tool.

Usage: python tools/aot_tp2.py [AOT_TP2_r05.json]
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _impl():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import __graft_entry__ as g
    from anyref_tpu.config import anyref_7b
    from anyref_tpu.models import anyref
    from anyref_tpu.parallel import partition
    from anyref_tpu.parallel.mesh import DATA_AXIS, make_mesh

    batch = int(os.environ.get("AOT_TP2_BATCH", "4"))
    decode_tokens = int(os.environ.get("BENCH_DECODE_TOKENS", "32"))
    cfg = anyref_7b()
    isnone = lambda x: x is None  # noqa: E731

    if os.environ.get("AOT_TP2_BACKEND", "tpu") == "tpu":
        # compile-only client for the real v5e target (smallest AOT topology
        # is the one-host 2x2 slice). Default mesh 1x2 — the VERDICT's exact
        # claim "batch >= 4 needs TP >= 2" — using 2 of the slice's devices;
        # AOT_TP2_MESH=2x2 compiles the dp2 x tp2 variant (batch per data
        # replica).
        from jax.experimental import topologies
        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name="v5e:2x2x1")
        dsz, msz = (int(v) for v in
                    os.environ.get("AOT_TP2_MESH", "1x2").split("x"))
        tp_mesh = Mesh(
            np.array(topo.devices[:dsz * msz]).reshape(dsz, msz),
            ("data", "model"))
        batch_global = batch * dsz
        backend = f"tpu-aot(v5e:{dsz}x{msz})"
    else:
        tp_mesh = make_mesh(data=1, model=2)
        batch_global = batch
        backend = "cpu"
    # shard_map-wrap the Pallas kernels for the multi-device trace — the
    # REAL serving program, not the ANYREF_PALLAS=0 fallback (whose XLA
    # global-attention oracle materializes ~8 GiB of rel-pos logits and
    # blows the budget for reasons the production path doesn't have)
    from anyref_tpu.ops import flash as flash_mod
    flash_mod.set_kernel_mesh(tp_mesh)
    params_abs = jax.eval_shape(
        lambda k: anyref.init(k, cfg, dtype=jnp.bfloat16), jax.random.key(0))
    pspec = partition.anyref_spec(params_abs, cfg)

    def put_spec(abs_tree, spec_tree):
        return jax.tree.map(
            lambda x, s: jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=NamedSharding(tp_mesh, s))
            if x is not None else None,
            abs_tree, spec_tree, is_leaf=isnone)

    import bench
    batch_data = jax.eval_shape(
        lambda: bench.make_batch(cfg, batch_size=batch_global))
    batch_abs = {k: jax.ShapeDtypeStruct(
        v.shape, v.dtype, sharding=NamedSharding(tp_mesh, P(DATA_AXIS)))
        for k, v in batch_data.items()}

    # the Predictor's sharded serving path: speculative lockstep generate on
    # the PLAIN weight layout (fuse/transpose_for_serving is single-device
    # only — eval/runner.py:96-108)
    def run(params, cfg_, b):
        out = anyref.generate(params, cfg_, b, max_new_tokens=decode_tokens,
                              speculative=True, draft_len=15, max_accept=8)
        return (out.output_ids, out.decode_passes,
                out.low_res_masks[:, :1].astype(jnp.bfloat16))

    lowered = jax.jit(run, static_argnums=(1,)).lower(
        put_spec(params_abs, pspec), cfg, batch_abs)
    compiled = lowered.compile()

    weights_per_dev = g._sharded_bytes(params_abs, pspec, tp_mesh)
    ma = compiled.memory_analysis()
    gib = 1 << 30
    # TPU backend: memory_analysis is the real per-device buffer assignment
    # (argument/temp/code), so the fit verdict is authoritative. CPU
    # fallback: only the analytic weight bytes are meaningful.
    rec = {
        "metric": "aot_tp2_serving",
        "value": 1.0,
        "unit": "pass",
        "mesh": dict(zip(tp_mesh.axis_names,
                         (int(s) for s in tp_mesh.devices.shape))),
        "batch_per_replica": batch,
        "batch_global": batch_global,
        "decode_tokens": decode_tokens,
        "weights_gib_per_device_analytic": round(weights_per_dev / gib, 3),
        "argument_gib_per_device": round(ma.argument_size_in_bytes / gib, 3),
        "temp_gib_per_device": round(ma.temp_size_in_bytes / gib, 3),
        "code_gib_per_device": round(
            ma.generated_code_size_in_bytes / gib, 3),
        "output_gib_per_device": round(ma.output_size_in_bytes / gib, 3),
        "total_gib_per_device": round(
            (ma.argument_size_in_bytes + ma.temp_size_in_bytes
             + ma.generated_code_size_in_bytes
             + ma.output_size_in_bytes - ma.alias_size_in_bytes) / gib, 3),
        "fits_15p75_gib": (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                           + ma.generated_code_size_in_bytes
                           + ma.output_size_in_bytes
                           - ma.alias_size_in_bytes) / gib < 15.75,
        "backend": backend,
    }
    print(json.dumps(rec))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    env = dict(os.environ)
    if env.get("AOT_TP2_BACKEND", "tpu") == "cpu":
        # virtual-mesh fallback: self-provision 2 CPU devices
        flags = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = \
            (flags + " --xla_force_host_platform_device_count=2").strip()
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c",
         "from tools import aot_tp2; aot_tp2._impl()"],
        env=env, cwd=repo, stdout=subprocess.PIPE, text=True)
    line = next((ln for ln in (proc.stdout or "").splitlines()
                 if ln.startswith("{")), None)
    if proc.returncode != 0 or line is None:
        sys.stderr.write(proc.stdout or "")
        sys.exit(1)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
