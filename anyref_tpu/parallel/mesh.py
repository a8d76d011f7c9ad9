"""Device mesh construction.

One global 2-axis mesh ("data", "model") covers every parallelism the
reference stack needs (SURVEY.md §2.4): data parallelism (the reference's
accelerate/DDP, train.sh:1) maps to the "data" axis; tensor parallelism for
the LLaMA decoder (absent in the reference — added here for multi-chip
serving) maps to "model". In-slice collectives ride ICI; GSPMD handles
multi-slice DCN placement automatically. Pipeline parallelism is deliberately
omitted: a 7B decoder fits v5e pod slices with TP+DP (SURVEY.md §2.4 note).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int | None = None, model: int | None = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model is None:
        model = 1 if data is None else n // data
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def shard(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
