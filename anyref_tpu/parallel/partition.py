"""Parameter partition specs (GSPMD sharding annotations).

Megatron-style tensor parallelism for the LLaMA decoder over the "model"
axis: q/k/v and gate/up shard their *output* features (head dim), o and down
shard their *input* features, so each block needs exactly one all-reduce
after attention and one after the MLP — both inserted automatically by XLA
from these annotations. Embedding/lm_head shard the vocab dim. Vision towers
(SAM/CLIP/ImageBind) are small relative to the decoder and replicate; their
batch dimension shards over "data" via the batch specs.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


_COL_KEYS = ("q", "k", "v", "gate", "up",   # output-feature sharded
             "qkv", "gate_up")              # fused serving layout
_ROW_KEYS = ("o", "down")                    # input-feature sharded


def _proj_spec(name: str, storage_key: str) -> P:
    """Megatron spec per projection. "w" stores [in, out]; "w_t" stores
    [out, in] (the serving layout, llama.transpose_for_serving) — the
    sharded logical dim is the same, its index flips."""
    col = name in _COL_KEYS
    if storage_key == "w":
        return P(None, MODEL_AXIS) if col else P(MODEL_AXIS, None)
    return P(MODEL_AXIS, None) if col else P(None, MODEL_AXIS)


def _llama_layer_spec(layer_params: dict) -> dict:
    spec = {"input_norm": {"scale": P()}, "post_attn_norm": {"scale": P()},
            "attn": {}, "mlp": {}}
    for grp in ("attn", "mlp"):
        for name, p in layer_params[grp].items():
            entry = {}
            for sk in p:
                if sk in ("w", "w_t"):
                    entry[sk] = _proj_spec(name, sk)
                else:
                    entry[sk] = P()
            spec[grp][name] = entry
    return spec


def llama_spec(llama_params: dict) -> dict:
    spec = {
        "embed_tokens": P(MODEL_AXIS, None),
        "layers": [_llama_layer_spec(lp) for lp in llama_params["layers"]],
        "final_norm": {"scale": P()},
    }
    if llama_params.get("lm_head") is not None:
        spec["lm_head"] = P(None, MODEL_AXIS)
    else:
        spec["lm_head"] = None
    if "lm_head_q" in llama_params:
        spec["lm_head_q"] = jax.tree.map(lambda _: P(),
                                         llama_params["lm_head_q"])
    return spec


def _replicate_like(tree):
    return jax.tree.map(lambda _: P(), tree)


def anyref_spec(params: dict, cfg) -> dict:
    """Partition specs mirroring an anyref param tree."""
    spec = {k: _replicate_like(v) for k, v in params.items() if k != "llama"}
    spec["llama"] = llama_spec(params["llama"])
    return spec


def batch_spec(batch: dict) -> dict:
    """Shard every batch array's leading (batch) dim over "data"."""
    return {k: P(DATA_AXIS) for k in batch}


def shard_batch(batch: dict, mesh) -> dict:
    """Place a collated DEVICE batch on the mesh, leading dim over "data"
    (host-only keys like _meta must be stripped by the caller first)."""
    import jax
    from jax.sharding import NamedSharding

    spec = batch_spec(batch)
    return {k: jax.device_put(v, NamedSharding(mesh, spec[k]))
            for k, v in batch.items()}


def shard_params(params: dict, mesh, cfg) -> dict:
    """Place an anyref param tree on a mesh: decoder tensor-parallel over
    "model", everything else replicated. Serving entry point for multi-chip
    (decode weight streaming divides by the model-axis size)."""
    import jax
    from jax.sharding import NamedSharding

    spec = anyref_spec(params, cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
        if x is not None else None,
        params, spec, is_leaf=lambda x: x is None)


def lora_spec(lora_tree) -> dict:
    """LoRA adapters are tiny; a: [d, r] replicated, b: [r, out] sharded on
    out to match the base layer's column sharding."""
    def leaf(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "b":
            return P(None, MODEL_AXIS)
        return P()
    return jax.tree_util.tree_map_with_path(leaf, lora_tree)
