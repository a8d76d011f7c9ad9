"""pjit training step.

Replaces the reference's HF Trainer + accelerate/DeepSpeed stack
(train.py:421-430, train.sh) with a single jitted SPMD step over the
("data", "model") mesh: batch shards on "data", decoder weights on "model";
XLA inserts the gradient all-reduces (the reference's NCCL DDP) from the
sharding annotations alone.

Optimizer: AdamW + linear warmup/decay (train.sh:8-12 — lr 5e-5, 200 warmup,
10k steps). Trainables: LoRA(q,v) + the reference's modules_to_save set
(lora.py). Remat wraps the decoder forward (the reference's
gradient_checkpointing_enable, train.py:340).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import AnyRefConfig
from ..models import anyref
from . import lora as lora_mod


class TrainState(NamedTuple):
    step: jax.Array
    lora: dict
    dense: dict         # trainable dense subtree (modules_to_save)
    opt_state: optax.OptState


def make_optimizer(lr: float = 5e-5, warmup: int = 200,
                   total_steps: int = 10_000,
                   weight_decay: float = 0.0,
                   grad_clip: float | None = 1.0) -> optax.GradientTransformation:
    sched = optax.join_schedules([
        optax.linear_schedule(0.0, lr, warmup),
        optax.linear_schedule(lr, 0.0, total_steps - warmup),
    ], [warmup])
    txs = []
    if grad_clip:
        txs.append(optax.clip_by_global_norm(grad_clip))
    txs.append(optax.adamw(sched, weight_decay=weight_decay))
    return optax.chain(*txs)


def init_state(key: jax.Array, params: dict, lora_cfg: lora_mod.LoraConfig,
               optimizer: optax.GradientTransformation) -> tuple[TrainState, dict]:
    """Returns (state, frozen_params)."""
    lora_params = lora_mod.init(key, params["llama"], lora_cfg)
    dense, frozen = lora_mod.split_trainable(params)
    opt_state = optimizer.init((lora_params, dense))
    return TrainState(jnp.zeros((), jnp.int32), lora_params, dense,
                      opt_state), frozen


def loss_fn(lora_params: dict, dense: dict, frozen: dict,
            cfg: AnyRefConfig, lora_cfg: lora_mod.LoraConfig, batch: dict):
    params = lora_mod.merge_params(dense, frozen)
    params = {**params,
              "llama": lora_mod.apply(params["llama"], lora_params, lora_cfg)}
    out = anyref.train_forward(params, cfg, batch)
    metrics = {"lm_loss": out.lm_loss, "bce_loss": out.bce_loss,
               "dice_loss": out.dice_loss, "loss": out.loss}
    return out.loss, metrics


def make_train_step(cfg: AnyRefConfig, lora_cfg: lora_mod.LoraConfig,
                    optimizer: optax.GradientTransformation,
                    remat: bool = True, grad_accum: int = 1):
    """One optimizer step. With ``grad_accum`` > 1 the batch carries a
    leading micro-step axis ([accum, B, ...]); gradients average over
    micro-steps inside a lax.scan before the single optimizer update
    (the reference's accelerate gradient_accumulation, train.sh:15)."""
    lf = loss_fn
    if remat:
        lf = jax.checkpoint(
            functools.partial(loss_fn),
            static_argnums=(3, 4),
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    def grads_of(lora_p, dense_p, frozen, batch):
        return jax.value_and_grad(lf, argnums=(0, 1), has_aux=True)(
            lora_p, dense_p, frozen, cfg, lora_cfg, batch)

    def train_step(state: TrainState, frozen: dict, batch: dict):
        if grad_accum == 1:
            (loss, metrics), grads = grads_of(state.lora, state.dense,
                                              frozen, batch)
        else:
            def micro(acc, mb):
                (_, m), g = grads_of(state.lora, state.dense, frozen, mb)
                acc_g, acc_m = acc
                acc_g = jax.tree.map(lambda a, b: a + b, acc_g, g)
                acc_m = {k: acc_m[k] + m[k] for k in m}
                return (acc_g, acc_m), None

            zero_g = jax.tree.map(jnp.zeros_like,
                                  (state.lora, state.dense))
            zero_m = {k: jnp.zeros(()) for k in
                      ("lm_loss", "bce_loss", "dice_loss", "loss")}
            (grads, metrics), _ = jax.lax.scan(micro, (zero_g, zero_m),
                                               batch)
            grads = jax.tree.map(lambda g: g / grad_accum, grads)
            metrics = {k: v / grad_accum for k, v in metrics.items()}
        updates, opt_state = optimizer.update(
            grads, state.opt_state, (state.lora, state.dense))
        new_lora, new_dense = optax.apply_updates(
            (state.lora, state.dense), updates)
        new_state = TrainState(state.step + 1, new_lora, new_dense, opt_state)
        return new_state, metrics

    return train_step


def _globalize(arrays: dict, mesh, batch_dim: int) -> dict:
    """Multi-host: assemble per-host local batches into global jax.Arrays
    sharded over the mesh data axis (every host holds its slice; GSPMD sees
    one global batch). Single-process: plain device arrays."""
    import jax as _jax
    if mesh is None or _jax.process_count() == 1:
        return {k: jnp.asarray(v) for k, v in arrays.items()}
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import DATA_AXIS
    spec = P(*([None] * batch_dim + [DATA_AXIS]))
    out = {}
    for k, v in arrays.items():
        out[k] = _jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), v)
    return out


def stack_microbatches(batches: list, mesh=None) -> dict:
    """Stack collated batches into one [accum, B, ...] device batch for the
    accumulating train step (batch dim sharded over data when multi-host)."""
    import numpy as np
    keys = [k for k in batches[0] if not k.startswith("_")]
    return _globalize({k: np.stack([b[k] for b in batches]) for k in keys},
                      mesh, batch_dim=1)


def device_batch(batch: dict, mesh=None) -> dict:
    """Drop host-only keys (leading underscore) before feeding jit."""
    import numpy as np
    return _globalize({k: np.asarray(v) for k, v in batch.items()
                       if not k.startswith("_")}, mesh, batch_dim=0)
