"""Worker for the 2-process multi-host CPU test (tests/test_multihost.py).

Run as: python tests/multihost_worker.py <process_id> <port>
Requires env: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=2,
PALLAS_AXON_POOL_IPS unset (the launcher scrubs it).

Initializes jax.distributed (gloo CPU collectives), builds the tiny model,
and runs ONE global train step through the real Trainer with per-host data
sharding. Prints "MH_OK step=<n> loss=<loss>" on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    import jax
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.device_count() == 4 and jax.local_device_count() == 2

    import jax.numpy as jnp
    from anyref_tpu.config import anyref_tiny
    from anyref_tpu.models import anyref
    from anyref_tpu.train.trainer import TrainConfig, Trainer
    from tests.test_trainer_loop import FakeDataset

    cfg = anyref_tiny()
    params = anyref.init(jax.random.key(0), cfg, dtype=jnp.float32)
    out = os.path.join(sys.argv[3], f"out")
    tc = TrainConfig(output_dir=out, per_device_batch_size=1,
                     grad_accum_steps=1, max_steps=1, save_steps=100,
                     log_steps=1, mesh_model_axis=1, resume=False,
                     remat=False)
    trainer = Trainer(cfg, tc, params, dataset=FakeDataset(n=16))
    # per-host loader shard: global batch 4 over 2 hosts -> 2 samples/host
    assert trainer.loader.batch_size == 2
    assert trainer.loader.process_count == 2
    state = trainer.train()
    loss = None
    if pid == 0:
        import json
        with open(os.path.join(out, "metrics.jsonl")) as f:
            loss = json.loads(f.readlines()[-1])["loss"]
    print(f"MH_OK step={int(state.step)} pid={pid} loss={loss}", flush=True)


if __name__ == "__main__":
    main()
