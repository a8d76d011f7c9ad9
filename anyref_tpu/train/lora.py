"""Functional LoRA for the LLaMA decoder.

Mirrors the reference's PEFT setup (train.py:349-396): rank-8, alpha 16,
adapters on q_proj/v_proj of every decoder layer (SAM/CLIP/projector
excluded), with a ``modules_to_save`` set trained densely. Instead of PEFT's
module wrappers, adapters are a separate param tree; ``apply_lora`` folds
W' = W + (alpha/r) A@B functionally before the forward (one extra fused
matmul-add per adapted weight per step — negligible next to the forward, and
it keeps every downstream function oblivious to LoRA).

Offline deployment merge (reference merge_lora.py:58-62) is the same fold,
materialized once by ``merge``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class LoraConfig:
    r: int = 8
    alpha: float = 16.0
    targets: tuple = ("q", "v")   # q_proj / v_proj (reference train.py:374)


def init(key: jax.Array, llama_params: dict, cfg: LoraConfig,
         dtype=jnp.float32) -> dict:
    """One (A, B) pair per targeted projection per layer. A ~ N(0, 1/r)
    (PEFT kaiming-ish), B = 0 so training starts at the base model."""
    adapters = []
    keys = jax.random.split(key, len(llama_params["layers"]) * len(cfg.targets))
    ki = iter(keys)
    for layer in llama_params["layers"]:
        entry = {}
        for t in cfg.targets:
            w = layer["attn"][t]["w"]
            d_in, d_out = w.shape
            entry[t] = {
                "a": (jax.random.normal(next(ki), (d_in, cfg.r)) / cfg.r).astype(dtype),
                "b": jnp.zeros((cfg.r, d_out), dtype),
            }
        adapters.append(entry)
    return {"layers": adapters}


def apply(llama_params: dict, lora_params: dict, cfg: LoraConfig) -> dict:
    """Return llama params with adapted weights W + (alpha/r) A@B."""
    scale = cfg.alpha / cfg.r
    out_layers = []
    for layer, ad in zip(llama_params["layers"], lora_params["layers"]):
        new_attn = dict(layer["attn"])
        for t, p in ad.items():
            w = layer["attn"][t]["w"]
            delta = (p["a"] @ p["b"]) * scale
            new_attn[t] = {**layer["attn"][t], "w": w + delta.astype(w.dtype)}
        out_layers.append({**layer, "attn": new_attn})
    return {**llama_params, "layers": out_layers}


def merge(llama_params: dict, lora_params: dict, cfg: LoraConfig) -> dict:
    """Materialize merged weights for deployment (reference merge_lora.py).

    The tree.map(identity) is CONTAINER isolation, not a data copy: apply()
    shares the non-adapted sub-dicts (mlp, untargeted attn projections) with
    its input, and deployment hands the merged tree to the serving-layout
    conversion (llama.transpose_for_serving / fuse_for_serving) which
    mutates param dicts IN PLACE — without fresh containers that would
    corrupt the trainer's frozen tree through the aliases."""
    return jax.tree.map(lambda x: x, apply(llama_params, lora_params, cfg))


# ---------------------------------------------------------------------------
# trainable/frozen split (reference train.py:374-387 modules_to_save)
# ---------------------------------------------------------------------------
TRAINABLE_DENSE = (
    ("llama", "embed_tokens"),
    ("llama", "lm_head"),
    ("text_hidden_fcs",),
    ("sam", "mask_decoder", "mask_tokens"),
    ("sam", "mask_decoder", "upscale"),
    ("sam", "mask_decoder", "hyper_mlps"),
)
TRAINABLE_OPTIONAL = (
    ("audio_projector",),
    ("loc_embeddings",),
    ("roi_embed",),
)


def split_trainable(params: dict) -> tuple[dict, dict]:
    """Split the anyref param tree into (trainable_dense, frozen). Trees keep
    their full structure; the counterpart positions hold None (so merging is
    a tree_map)."""
    paths = list(TRAINABLE_DENSE) + [p for p in TRAINABLE_OPTIONAL
                                     if _get(params, p) is not None]

    def build(tree, paths_, keep):
        out = {}
        for k, v in tree.items():
            sub = [p[1:] for p in paths_ if p and p[0] == k]
            if any(len(p) == 0 for p in sub):
                out[k] = v if keep else None
            elif sub and isinstance(v, dict):
                out[k] = build(v, sub, keep)
            else:
                out[k] = None if keep else v
        return out

    return build(params, paths, True), build(params, paths, False)


def merge_params(trainable: dict, frozen: dict) -> dict:
    """Inverse of split_trainable."""
    def m(a, b):
        if isinstance(a, dict) and isinstance(b, dict):
            return {k: m(a.get(k), b.get(k)) for k in set(a) | set(b)}
        return a if b is None else b if a is None else a
    return m(trainable, frozen)


def _get(tree, path):
    for k in path:
        if not isinstance(tree, dict) or k not in tree:
            return None
        tree = tree[k]
    return tree
