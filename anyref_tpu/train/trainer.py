"""Training loop driver.

Replaces HF Trainer + accelerate (reference train.py:421-430, train.sh):
  * single jitted SPMD train step over the global mesh (see train/step.py);
  * gradient accumulation by device-side micro-step loop;
  * orbax checkpoint every ``save_steps`` with resume (reference
    --save_steps 100 + PeftModel resume, train.py:399-410);
  * metric logging to JSONL + console (replacing the wandb calls the
    reference embeds inside model code, anyref.py:452-458 — a design smell
    SURVEY.md flags; logging lives out here instead);
  * jax.profiler trace hooks around steps (SURVEY.md §5: the reference has
    no tracing; this is the greenfield replacement).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import checkpoint as ckpt
from ..config import AnyRefConfig
from ..data.collator import Collator
from ..data.loader import DataLoader
from ..parallel.mesh import DATA_AXIS, make_mesh
from ..tokenizer import AnyRefTokenizer
from . import lora as lora_mod
from . import step as step_mod


@dataclass
class TrainConfig:
    """Launch parameters (reference train.sh:1-22)."""

    train_datasets: str = "refer_seg"
    data_root: str = "/data"
    output_dir: str = "output"
    per_device_batch_size: int = 6
    grad_accum_steps: int = 8
    learning_rate: float = 5e-5
    warmup_steps: int = 200
    max_steps: int = 10_000
    save_steps: int = 100
    log_steps: int = 10
    seed: int = 0
    itisseg: bool = False
    roi: bool = False
    no_mask: bool = False
    resume: bool = True
    profile_steps: tuple = ()          # e.g. (20, 30) traces steps 20..30
    profile_dir: str = "profile"
    mesh_model_axis: int = 1
    remat: bool = True


class Trainer:
    def __init__(self, cfg: AnyRefConfig, tc: TrainConfig, params: dict,
                 dataset=None, tokenizer: Optional[AnyRefTokenizer] = None):
        self.cfg = cfg
        self.tc = tc
        self.tokenizer = tokenizer or AnyRefTokenizer()
        self.mesh = make_mesh(model=tc.mesh_model_axis)
        if self.mesh.size > 1:
            # shard_map-wrap Pallas dispatches for the multi-device step
            # (Mosaic calls can't be GSPMD-auto-partitioned; ops/flash.py)
            from ..ops import flash as flash_mod
            flash_mod.set_kernel_mesh(self.mesh)
        self.lora_cfg = lora_mod.LoraConfig()
        self.optimizer = step_mod.make_optimizer(
            lr=tc.learning_rate, warmup=tc.warmup_steps,
            total_steps=tc.max_steps)
        self.state, self.frozen = step_mod.init_state(
            jax.random.key(tc.seed), params, self.lora_cfg, self.optimizer)
        # donate the TrainState (arg 0): without donation the old
        # trainables + Adam moments stay live while the new ones are
        # computed, doubling their peak HBM every step (frozen params,
        # arg 1, are reused and must NOT be donated)
        self.step_fn = jax.jit(step_mod.make_train_step(
            cfg, self.lora_cfg, self.optimizer,
            remat=tc.remat, grad_accum=tc.grad_accum_steps),
            donate_argnums=(0,))

        if dataset is None:
            from ..data.registry import build_train_datasets
            dataset = build_train_datasets(
                tc.train_datasets, tc.data_root, cfg, itisseg=tc.itisseg,
                roi=tc.roi, no_mask=tc.no_mask)
        # per-HOST batch: the global batch (per-device bs x data-axis size)
        # split across processes; each host loads a disjoint sample shard
        # (multi-host equivalent of accelerate's per-host DataLoader,
        # reference train.sh:1)
        global_batch = tc.per_device_batch_size * self.mesh.shape[DATA_AXIS]
        n_proc = jax.process_count()
        assert global_batch % n_proc == 0, (global_batch, n_proc)
        self.loader = DataLoader(dataset,
                                 Collator(self.tokenizer, cfg, roi=tc.roi),
                                 batch_size=global_batch // n_proc,
                                 shuffle=True,
                                 num_workers=8, seed=tc.seed, drop_last=True,
                                 process_index=jax.process_index(),
                                 process_count=n_proc)
        os.makedirs(tc.output_dir, exist_ok=True)
        self._log_file = (
            open(os.path.join(tc.output_dir, "metrics.jsonl"), "a")
            if jax.process_index() == 0 else None)

        if tc.resume:
            latest = ckpt.latest_checkpoint(tc.output_dir)
            if latest:
                template = {"step": 0, "lora": self.state.lora,
                            "dense": self.state.dense,
                            "opt_state": self.state.opt_state}
                restored = ckpt.restore_train_state(latest, template)
                self.state = step_mod.TrainState(
                    jnp.asarray(restored["step"]), restored["lora"],
                    restored["dense"], restored["opt_state"])
                print(f"resumed from {latest}")

    def log(self, step: int, metrics: dict, extra: Optional[dict] = None):
        if self._log_file is None:       # non-zero process in multi-host
            return
        rec = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        if extra:
            rec.update(extra)
        self._log_file.write(json.dumps(rec) + "\n")
        self._log_file.flush()
        if step % self.tc.log_steps == 0:
            print("  ".join(f"{k}={v:.4f}" if isinstance(v, float) else
                            f"{k}={v}" for k, v in rec.items()))

    def train(self):
        tc = self.tc
        step = int(self.state.step)
        t0 = time.time()
        if len(self.loader) == 0:
            raise ValueError(
                f"dataset smaller than one global batch "
                f"({len(self.loader.dataset)} items < batch "
                f"{self.loader.batch_size}); shrink the batch or the mesh")
        micro = []
        data_iter = iter(self.loader)
        while step < tc.max_steps:
            try:
                batch = next(data_iter)
            except StopIteration:
                data_iter = iter(self.loader)
                continue
            micro.append(batch)
            if len(micro) < tc.grad_accum_steps:
                continue
            if tc.grad_accum_steps == 1:
                jbatch = step_mod.device_batch(micro[0], mesh=self.mesh)
            else:
                jbatch = step_mod.stack_microbatches(micro, mesh=self.mesh)
            micro = []

            if tc.profile_steps and step == tc.profile_steps[0]:
                jax.profiler.start_trace(tc.profile_dir)
            self.state, metrics = self.step_fn(self.state, self.frozen,
                                               jbatch)
            if tc.profile_steps and step == tc.profile_steps[-1]:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()

            step += 1
            if step % tc.log_steps == 0:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t0
                self.log(step, m,
                         {"steps_per_s": tc.log_steps / max(dt, 1e-9)})
                t0 = time.time()
            if step % tc.save_steps == 0:
                ckpt.save_train_state(tc.output_dir, step, self.state)
        return self.state

    def merged_params(self) -> dict:
        """Deployment params: dense trainables merged back + LoRA folded
        (reference merge_lora.py)."""
        params = lora_mod.merge_params(self.state.dense, self.frozen)
        params = {**params,
                  "llama": lora_mod.merge(params["llama"], self.state.lora,
                                          self.lora_cfg)}
        return params
