"""SAM (Segment Anything) — TPU-native JAX implementation.

Assembles image encoder, prompt encoder and mask decoder (reference
model/segment_anything/build_sam.py:55-108, modeling/sam.py:18-185).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...config import SAM_PIXEL_MEAN, SAM_PIXEL_STD, SamConfig
from ...ops.resize import postprocess_masks_fixed, sam_normalize_pad
from . import image_encoder, mask_decoder, prompt_encoder


def init(key: jax.Array, cfg: SamConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "image_encoder": image_encoder.init(k1, cfg, dtype),
        "prompt_encoder": prompt_encoder.init(k2, cfg, dtype),
        "mask_decoder": mask_decoder.init(k3, cfg, dtype),
    }


def preprocess(x: jax.Array, cfg: SamConfig) -> jax.Array:
    """Normalize + bottom/right pad already-resized pixels to the square
    input frame (reference sam.py:174-184)."""
    return sam_normalize_pad(x, cfg.image_size, SAM_PIXEL_MEAN, SAM_PIXEL_STD)


def encode_image(params: dict, x: jax.Array, cfg: SamConfig) -> jax.Array:
    return image_encoder.apply(params["image_encoder"], x, cfg)


def decode_text_prompts(params: dict, cfg: SamConfig,
                        image_embeddings: jax.Array,
                        text_embeds: jax.Array,
                        image_index: jax.Array | None = None,
                        multimask_output: bool = False):
    """AnyRef decode path, batched over prompts.

    image_embeddings: [B, C, g, g]; text_embeds: [N, d] [SEG] projections;
    image_index: [N] which image each prompt belongs to (default arange).
    Returns (low_res_masks [N, K, 4g, 4g], iou_pred [N, K]).
    """
    if image_index is None:
        image_index = jnp.arange(text_embeds.shape[0])
    sparse, dense = prompt_encoder.encode_text_prompts(
        params["prompt_encoder"], cfg, text_embeds[:, None, :])
    pe = prompt_encoder.dense_pe(params["prompt_encoder"], cfg)
    per_prompt_emb = image_embeddings[image_index]
    return mask_decoder.apply(
        params["mask_decoder"], cfg, per_prompt_emb,
        pe.astype(per_prompt_emb.dtype), sparse.astype(per_prompt_emb.dtype),
        dense.astype(per_prompt_emb.dtype), multimask_output)


def upscale_masks(low_res_masks: jax.Array, cfg: SamConfig) -> jax.Array:
    """Low-res logits -> full input frame (stage 1 of reference
    sam.py:137-172; the original-size crop/resize is host-side)."""
    return postprocess_masks_fixed(low_res_masks, cfg.image_size)
