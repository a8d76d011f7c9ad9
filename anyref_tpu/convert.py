"""Checkpoint conversion: torch/HF state dicts -> anyref_tpu param trees.

Inputs are plain ``{name: numpy array}`` dicts (load .pth with
``torch.load(..., map_location="cpu")`` and call ``.numpy()``, or read
safetensors) so this module has no torch dependency.

Covers: SAM (reference SAM/sam_vit_h_4b8939.pth layout), CLIP ViT-L vision
tower (HF ``CLIPVisionModel``), LLaMA (HF ``LlamaForCausalLM``), LLaVA
mm_projector, ImageBind audio branch, and the AnyRef heads
(text_hidden_fcs / audio_projector / loc_embeddings). LoRA adapters are
merged offline by ``merge_lora_into`` (reference merge_lora.py:58-62).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .config import (ClipVisionConfig, ImageBindAudioConfig, LlamaConfig,
                     SamConfig)


Array = np.ndarray


def _lin(sd: dict, prefix: str, dtype) -> dict:
    p = {"w": jnp.asarray(sd[prefix + ".weight"].T, dtype=dtype)}
    b = sd.get(prefix + ".bias")
    if b is not None:
        p["b"] = jnp.asarray(b, dtype=dtype)
    return p


def _ln(sd: dict, prefix: str, dtype) -> dict:
    return {"scale": jnp.asarray(sd[prefix + ".weight"], dtype=dtype),
            "bias": jnp.asarray(sd[prefix + ".bias"], dtype=dtype)}


def _conv(sd: dict, prefix: str, dtype) -> dict:
    p = {"w": jnp.asarray(sd[prefix + ".weight"], dtype=dtype)}
    b = sd.get(prefix + ".bias")
    if b is not None:
        p["b"] = jnp.asarray(b, dtype=dtype)
    return p


# ---------------------------------------------------------------------------
# SAM
# ---------------------------------------------------------------------------
def convert_sam(sd: dict, cfg: SamConfig, dtype=jnp.float32) -> dict:
    """torch SAM state_dict (keys like ``image_encoder.blocks.0.attn.qkv.weight``)
    -> params for anyref_tpu.models.sam."""

    def ie(name):
        return "image_encoder." + name

    pe_w = sd[ie("patch_embed.proj.weight")]  # [D, 3, ps, ps]
    enc = {
        "patch_embed": {
            "w": jnp.asarray(pe_w.reshape(pe_w.shape[0], -1).T, dtype=dtype),
            "b": jnp.asarray(sd[ie("patch_embed.proj.bias")], dtype=dtype),
        },
        "pos_embed": jnp.asarray(sd[ie("pos_embed")], dtype=dtype),
        "blocks": [],
        "neck": {
            "conv1": _conv(sd, ie("neck.0"), dtype),
            "ln1": _ln(sd, ie("neck.1"), dtype),
            "conv2": _conv(sd, ie("neck.2"), dtype),
            "ln2": _ln(sd, ie("neck.3"), dtype),
        },
    }
    for i in range(cfg.encoder_depth):
        b = f"image_encoder.blocks.{i}."
        enc["blocks"].append({
            "norm1": _ln(sd, b + "norm1", dtype),
            "attn": {
                "qkv": _lin(sd, b + "attn.qkv", dtype),
                "proj": _lin(sd, b + "attn.proj", dtype),
                "rel_pos_h": jnp.asarray(sd[b + "attn.rel_pos_h"], dtype=dtype),
                "rel_pos_w": jnp.asarray(sd[b + "attn.rel_pos_w"], dtype=dtype),
            },
            "norm2": _ln(sd, b + "norm2", dtype),
            "mlp": {"lin1": _lin(sd, b + "mlp.lin1", dtype),
                    "lin2": _lin(sd, b + "mlp.lin2", dtype)},
        })

    pr = {
        "pe_gaussian": jnp.asarray(
            sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"],
            dtype=jnp.float32),
        "point_embeddings": [
            jnp.asarray(sd[f"prompt_encoder.point_embeddings.{i}.weight"], dtype=dtype)
            for i in range(4)],
        "not_a_point_embed": jnp.asarray(
            sd["prompt_encoder.not_a_point_embed.weight"], dtype=dtype),
        "no_mask_embed": jnp.asarray(
            sd["prompt_encoder.no_mask_embed.weight"], dtype=dtype),
        "mask_downscaling": {
            "conv1": _conv(sd, "prompt_encoder.mask_downscaling.0", dtype),
            "ln1": _ln(sd, "prompt_encoder.mask_downscaling.1", dtype),
            "conv2": _conv(sd, "prompt_encoder.mask_downscaling.3", dtype),
            "ln2": _ln(sd, "prompt_encoder.mask_downscaling.4", dtype),
            "conv3": _conv(sd, "prompt_encoder.mask_downscaling.6", dtype),
        },
    }

    def attn(prefix):
        return {"q": _lin(sd, prefix + ".q_proj", dtype),
                "k": _lin(sd, prefix + ".k_proj", dtype),
                "v": _lin(sd, prefix + ".v_proj", dtype),
                "out": _lin(sd, prefix + ".out_proj", dtype)}

    layers = []
    for i in range(cfg.mask_decoder_depth):
        t = f"mask_decoder.transformer.layers.{i}."
        layers.append({
            "self_attn": attn(t + "self_attn"),
            "norm1": _ln(sd, t + "norm1", dtype),
            "cross_attn_t2i": attn(t + "cross_attn_token_to_image"),
            "norm2": _ln(sd, t + "norm2", dtype),
            "mlp": {"lin1": _lin(sd, t + "mlp.lin1", dtype),
                    "lin2": _lin(sd, t + "mlp.lin2", dtype)},
            "norm3": _ln(sd, t + "norm3", dtype),
            "cross_attn_i2t": attn(t + "cross_attn_image_to_token"),
            "norm4": _ln(sd, t + "norm4", dtype),
        })

    nm = cfg.num_multimask_outputs + 1
    hyper = []
    for li, last in [(0, False), (1, False), (2, True)]:
        ws, bs = [], []
        for m in range(nm):
            p = f"mask_decoder.output_hypernetworks_mlps.{m}.layers.{li}"
            ws.append(sd[p + ".weight"].T)
            bs.append(sd[p + ".bias"])
        hyper.append({"w": jnp.asarray(np.stack(ws), dtype=dtype),
                      "b": jnp.asarray(np.stack(bs), dtype=dtype)})

    dec = {
        "iou_token": jnp.asarray(sd["mask_decoder.iou_token.weight"], dtype=dtype),
        "mask_tokens": jnp.asarray(sd["mask_decoder.mask_tokens.weight"], dtype=dtype),
        "transformer": {
            "layers": layers,
            "final_attn_t2i": attn("mask_decoder.transformer.final_attn_token_to_image"),
            "norm_final": _ln(sd, "mask_decoder.transformer.norm_final_attn", dtype),
        },
        "upscale": {
            "deconv1": _conv(sd, "mask_decoder.output_upscaling.0", dtype),
            "ln": _ln(sd, "mask_decoder.output_upscaling.1", dtype),
            "deconv2": _conv(sd, "mask_decoder.output_upscaling.3", dtype),
        },
        "hyper_mlps": hyper,
        "iou_head": {"layers": [
            _lin(sd, f"mask_decoder.iou_prediction_head.layers.{i}", dtype)
            for i in range(cfg.iou_head_depth)]},
    }
    return {"image_encoder": enc, "prompt_encoder": pr, "mask_decoder": dec}


# ---------------------------------------------------------------------------
# CLIP vision tower (HF CLIPVisionModel state_dict, "vision_model." prefix)
# ---------------------------------------------------------------------------
def convert_clip_vision(sd: dict, cfg: ClipVisionConfig, dtype=jnp.float32) -> dict:
    pre = "vision_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""
    emb = pre + "embeddings."
    pw = sd[emb + "patch_embedding.weight"]  # [D, 3, ps, ps], no bias
    layers = []
    for i in range(cfg.num_layers):
        b = f"{pre}encoder.layers.{i}."
        layers.append({
            "ln1": _ln(sd, b + "layer_norm1", dtype),
            "attn": {"q": _lin(sd, b + "self_attn.q_proj", dtype),
                     "k": _lin(sd, b + "self_attn.k_proj", dtype),
                     "v": _lin(sd, b + "self_attn.v_proj", dtype),
                     "out": _lin(sd, b + "self_attn.out_proj", dtype)},
            "ln2": _ln(sd, b + "layer_norm2", dtype),
            "mlp": {"fc1": _lin(sd, b + "mlp.fc1", dtype),
                    "fc2": _lin(sd, b + "mlp.fc2", dtype)},
        })
    return {
        "class_embedding": jnp.asarray(sd[emb + "class_embedding"], dtype=dtype),
        "patch_embed": {"w": jnp.asarray(pw.reshape(pw.shape[0], -1).T, dtype=dtype)},
        "position_embedding": jnp.asarray(
            sd[emb + "position_embedding.weight"], dtype=dtype),
        "pre_layernorm": _ln(sd, pre + "pre_layrnorm", dtype)
        if pre + "pre_layrnorm.weight" in sd else _ln(sd, pre + "pre_layernorm", dtype),
        "layers": layers,
        # post_layernorm unused for select_layer=-2 patch features
    }


# ---------------------------------------------------------------------------
# LLaMA (HF LlamaForCausalLM state_dict, "model." prefix)
# ---------------------------------------------------------------------------
def convert_llama(sd: dict, cfg: LlamaConfig, dtype=jnp.bfloat16) -> dict:
    def pad_vocab(x: Array) -> Array:
        if x.shape[0] < cfg.padded_vocab_size:
            pad = np.zeros((cfg.padded_vocab_size - x.shape[0], x.shape[1]), x.dtype)
            x = np.concatenate([x, pad], axis=0)
        return x

    layers = []
    for i in range(cfg.num_layers):
        b = f"model.layers.{i}."
        layers.append({
            "input_norm": {"scale": jnp.asarray(sd[b + "input_layernorm.weight"], dtype=dtype)},
            "attn": {"q": _lin(sd, b + "self_attn.q_proj", dtype),
                     "k": _lin(sd, b + "self_attn.k_proj", dtype),
                     "v": _lin(sd, b + "self_attn.v_proj", dtype),
                     "o": _lin(sd, b + "self_attn.o_proj", dtype)},
            "post_attn_norm": {"scale": jnp.asarray(
                sd[b + "post_attention_layernorm.weight"], dtype=dtype)},
            "mlp": {"gate": _lin(sd, b + "mlp.gate_proj", dtype),
                    "up": _lin(sd, b + "mlp.up_proj", dtype),
                    "down": _lin(sd, b + "mlp.down_proj", dtype)},
        })
    # embed_tokens / lm_head fp32 islands (reference train.py:415-416)
    return {
        "embed_tokens": jnp.asarray(
            pad_vocab(np.asarray(sd["model.embed_tokens.weight"])), dtype=jnp.float32),
        "layers": layers,
        "final_norm": {"scale": jnp.asarray(sd["model.norm.weight"], dtype=dtype)},
        "lm_head": jnp.asarray(
            pad_vocab(np.asarray(sd["lm_head.weight"])).T, dtype=jnp.float32),
    }


def convert_mm_projector(sd: dict, dtype=jnp.float32) -> dict:
    """LLaVA v1.1 mm_projector: single Linear(1024 -> 4096)."""
    for key in ("model.mm_projector", "mm_projector"):
        if key + ".weight" in sd:
            return _lin(sd, key, dtype)
    raise KeyError("mm_projector weights not found")


def convert_anyref_heads(sd: dict, dtype=jnp.float32) -> dict:
    """AnyRef-specific heads from a merged reference checkpoint
    (merge_lora.py saves the full model): text_hidden_fcs (Sequential
    Linear/ReLU/Linear/Dropout, anyref.py:115-127), audio_projector,
    loc_embeddings. Returns only the heads found."""
    out = {}
    for pre in ("model.text_hidden_fcs.0.", "text_hidden_fcs.0."):
        if pre + "0.weight" in sd:
            out["text_hidden_fcs"] = {
                "lin1": _lin(sd, pre + "0", jnp.float32),
                "lin2": _lin(sd, pre + "2", jnp.float32),
            }
            break
    for pre in ("model.audio_projector", "audio_projector"):
        if pre + ".weight" in sd:
            out["audio_projector"] = _lin(sd, pre, dtype)
            break
    for pre in ("model.loc_embeddings", "loc_embeddings"):
        if pre + ".weight" in sd:
            out["loc_embeddings"] = jnp.asarray(sd[pre + ".weight"],
                                                dtype=jnp.float32)
            break
    return out


# ---------------------------------------------------------------------------
# ImageBind audio branch (imagebind_huge.pth layout, audio modality only —
# the others are deleted by AnyRef, reference anyref.py:142-147)
# ---------------------------------------------------------------------------
def convert_imagebind_audio(sd: dict, cfg: ImageBindAudioConfig,
                            dtype=jnp.float32) -> dict:
    pre = "modality_preprocessors.audio."
    tr = "modality_trunks.audio."
    hd = "modality_heads.audio."
    blocks = []
    i = 0
    while f"{tr}blocks.{i}.attn.in_proj_weight" in sd:
        b = f"{tr}blocks.{i}."
        blocks.append({
            "norm1": _ln(sd, b + "norm_1", dtype),
            "attn": {
                "qkv": {"w": jnp.asarray(sd[b + "attn.in_proj_weight"].T, dtype=dtype),
                        "b": jnp.asarray(sd[b + "attn.in_proj_bias"], dtype=dtype)},
                "bias_k": jnp.asarray(sd[b + "attn.bias_k"].reshape(-1), dtype=dtype),
                "bias_v": jnp.asarray(sd[b + "attn.bias_v"].reshape(-1), dtype=dtype),
                "out": _lin(sd, b + "attn.out_proj", dtype),
            },
            "norm2": _ln(sd, b + "norm_2", dtype),
            "mlp": {"fc1": _lin(sd, b + "mlp.fc1", dtype),
                    "fc2": _lin(sd, b + "mlp.fc2", dtype)},
        })
        i += 1
    return {
        "patch_conv": {"w": jnp.asarray(sd[pre + "rgbt_stem.proj.weight"], dtype=dtype)},
        "patch_norm": _ln(sd, pre + "rgbt_stem.norm_layer", dtype),
        "cls_token": jnp.asarray(sd[pre + "cls_token"], dtype=dtype),
        "pos_embed": jnp.asarray(sd[pre + "pos_embedding_helper.pos_embed"],
                                 dtype=dtype),
        "blocks": blocks,
        "head_norm": _ln(sd, hd + "0", dtype),
        "head_proj": {"w": jnp.asarray(sd[hd + "2.weight"].T, dtype=dtype)},
    }


# ---------------------------------------------------------------------------
# LoRA merge (reference merge_lora.py:58-62 semantics, done offline)
# ---------------------------------------------------------------------------
def merge_lora_into(base_w: Array, lora_a: Array, lora_b: Array,
                    alpha: float, r: int) -> Array:
    """W' = W + (alpha/r) * B @ A, torch [out, in] layout inputs, returns
    same layout. Callers transpose for the jax convention afterwards."""
    return base_w + (alpha / r) * (lora_b @ lora_a)
