"""SAM prompt encoder (reference model/segment_anything/modeling/prompt_encoder.py).

AnyRef's hot path is the `text_embeds` pathway ([SEG] projections appended as
sparse embeddings, reference prompt_encoder.py:176-177) plus the `no_mask`
dense fallback. Point/box/mask prompts are kept for SamPredictor parity
(used by the AVS ground-truth refinement tool, convert_avs_masks.py:55-60).

All paths are batched with static shapes; there is no python branching on
tensor values.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...config import SamConfig
from ...ops.common import conv2d, gelu, layer_norm_2d


def init(key: jax.Array, cfg: SamConfig, dtype=jnp.float32) -> dict:
    d = cfg.prompt_embed_dim
    mask_chans = 16
    ks = iter(jax.random.split(key, 12))

    def emb(k, n=1):
        return jax.random.normal(k, (n, d)).astype(dtype)

    return {
        # PositionEmbeddingRandom gaussian matrix buffer
        # (reference prompt_encoder.py:196-201); loaded from checkpoints.
        "pe_gaussian": jax.random.normal(next(ks), (2, d // 2)).astype(jnp.float32),
        "point_embeddings": [emb(next(ks)) for _ in range(4)],
        "not_a_point_embed": emb(next(ks)),
        "no_mask_embed": emb(next(ks)),
        "mask_downscaling": {
            "conv1": {"w": jax.random.normal(next(ks), (mask_chans // 4, 1, 2, 2)).astype(dtype) * 0.25,
                      "b": jnp.zeros((mask_chans // 4,), dtype)},
            "ln1": {"scale": jnp.ones((mask_chans // 4,), dtype),
                    "bias": jnp.zeros((mask_chans // 4,), dtype)},
            "conv2": {"w": jax.random.normal(next(ks), (mask_chans, mask_chans // 4, 2, 2)).astype(dtype) * 0.25,
                      "b": jnp.zeros((mask_chans,), dtype)},
            "ln2": {"scale": jnp.ones((mask_chans,), dtype),
                    "bias": jnp.zeros((mask_chans,), dtype)},
            "conv3": {"w": jax.random.normal(next(ks), (d, mask_chans, 1, 1)).astype(dtype) * 0.25,
                      "b": jnp.zeros((d,), dtype)},
        },
    }


def _pe_encode(gaussian: jax.Array, coords: jax.Array) -> jax.Array:
    """Random-Fourier encode coords in [0,1]^2 -> [..., embed_dim]
    (reference prompt_encoder.py:203-214). fp32 throughout."""
    c = coords.astype(jnp.float32) * 2.0 - 1.0
    c = c @ gaussian.astype(jnp.float32)
    c = (2.0 * math.pi) * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def dense_pe(params: dict, cfg: SamConfig) -> jax.Array:
    """[1, embed_dim, grid, grid] grid positional encoding
    (reference prompt_encoder.py:67-76, 216-229)."""
    g = cfg.embedding_size
    y = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    x = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)  # [g, g, 2] (x, y)
    pe = _pe_encode(params["pe_gaussian"], grid)                  # [g, g, d]
    return pe.transpose(2, 0, 1)[None]


def embed_points(params: dict, cfg: SamConfig, coords: jax.Array,
                 labels: jax.Array, pad: bool) -> jax.Array:
    """coords: [B, N, 2] pixel coords in the 1024-frame; labels: [B, N] in
    {-1, 0, 1} (reference prompt_encoder.py:78-98)."""
    coords = coords + 0.5
    if pad:
        coords = jnp.concatenate(
            [coords, jnp.zeros((coords.shape[0], 1, 2), coords.dtype)], axis=1)
        labels = jnp.concatenate(
            [labels, -jnp.ones((labels.shape[0], 1), labels.dtype)], axis=1)
    norm = coords / jnp.asarray(
        [cfg.image_size, cfg.image_size], dtype=jnp.float32)
    pe = _pe_encode(params["pe_gaussian"], norm)
    pe = jnp.where((labels == -1)[..., None], 0.0, pe)
    pe = pe + jnp.where((labels == -1)[..., None], params["not_a_point_embed"][0], 0.0)
    pe = pe + jnp.where((labels == 0)[..., None], params["point_embeddings"][0][0], 0.0)
    pe = pe + jnp.where((labels == 1)[..., None], params["point_embeddings"][1][0], 0.0)
    return pe


def embed_boxes(params: dict, cfg: SamConfig, boxes: jax.Array) -> jax.Array:
    """boxes: [B, 4] xyxy in the 1024-frame -> [B, 2, embed_dim]
    (reference prompt_encoder.py:100-109)."""
    corners = (boxes.reshape(-1, 2, 2) + 0.5) / jnp.asarray(
        [cfg.image_size, cfg.image_size], dtype=jnp.float32)
    pe = _pe_encode(params["pe_gaussian"], corners)
    pe = pe.at[:, 0, :].add(params["point_embeddings"][2][0])
    pe = pe.at[:, 1, :].add(params["point_embeddings"][3][0])
    return pe


def embed_masks(params: dict, masks: jax.Array, eps: float = 1e-6) -> jax.Array:
    p = params["mask_downscaling"]
    x = conv2d(p["conv1"], masks, stride=(2, 2))
    x = gelu(layer_norm_2d(p["ln1"], x, eps=eps))
    x = conv2d(p["conv2"], x, stride=(2, 2))
    x = gelu(layer_norm_2d(p["ln2"], x, eps=eps))
    return conv2d(p["conv3"], x)


def no_mask_dense(params: dict, cfg: SamConfig, batch: int) -> jax.Array:
    """[B, embed_dim, grid, grid] learned no-mask dense embedding
    (reference prompt_encoder.py:182-184)."""
    g = cfg.embedding_size
    return jnp.broadcast_to(
        params["no_mask_embed"].reshape(1, -1, 1, 1), (batch, cfg.prompt_embed_dim, g, g))


def encode_text_prompts(params: dict, cfg: SamConfig,
                        text_embeds: jax.Array) -> tuple[jax.Array, jax.Array]:
    """AnyRef path: text_embeds [N, T, d] -> (sparse [N, T, d],
    dense [N, d, g, g]) (reference prompt_encoder.py:164-186 with only
    text_embeds set)."""
    return text_embeds, no_mask_dense(params, cfg, text_embeds.shape[0])
