"""CLIP ViT-L/14 vision tower (LLaVA's frozen image encoder).

Matches HF ``CLIPVisionModel`` numerics; LLaVA consumes the penultimate
layer's hidden states with the CLS token dropped ("patch" select feature,
reference anyref.py:172-173 via the missing llava vision tower).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ClipVisionConfig
from ..ops.attention import mha_qkv
from ..ops.common import layer_norm, linear, quick_gelu


def init(key: jax.Array, cfg: ClipVisionConfig, dtype=jnp.float32) -> dict:
    d = cfg.hidden_size
    ks = iter(jax.random.split(key, 4 + 6 * cfg.num_layers))

    def lin(i, o):
        return {"w": (jax.random.normal(next(ks), (i, o)) * (i ** -0.5)).astype(dtype),
                "b": jnp.zeros((o,), dtype)}

    def ln(dim):
        return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    grid = cfg.image_size // cfg.patch_size
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "ln1": ln(d),
            "attn": {"q": lin(d, d), "k": lin(d, d), "v": lin(d, d),
                     "out": lin(d, d)},
            "ln2": ln(d),
            "mlp": {"fc1": lin(d, cfg.intermediate_size),
                    "fc2": lin(cfg.intermediate_size, d)},
        })
    return {
        "class_embedding": (jax.random.normal(next(ks), (d,)) * 0.02).astype(dtype),
        "patch_embed": {"w": (jax.random.normal(next(ks), (3 * cfg.patch_size ** 2, d))
                              * 0.02).astype(dtype)},
        "position_embedding": (jax.random.normal(next(ks), (grid * grid + 1, d))
                               * 0.02).astype(dtype),
        "pre_layernorm": ln(d),
        "layers": layers,
    }


def _encoder_layer(p, x: jax.Array, cfg: ClipVisionConfig) -> jax.Array:
    h = layer_norm(p["ln1"], x, eps=cfg.layer_norm_eps)
    B, L, D = h.shape
    # QKV-direct Pallas attention (heads as VMEM column slices): the
    # [B,L,nh,hd] head-split/merge relayouts otherwise dominate XLA
    # attention at L=257 (measured 7.2 ms/encode vs ~0.8 ms roofline).
    # HF CLIP scales q by hd**-0.5 before the matmul; the kernel applies
    # the same scale inside the scores dot.
    qkv = jnp.concatenate([linear(p["attn"]["q"], h),
                           linear(p["attn"]["k"], h),
                           linear(p["attn"]["v"], h)], axis=-1)
    o = mha_qkv(qkv, cfg.num_heads)
    x = x + linear(p["attn"]["out"], o)
    h = layer_norm(p["ln2"], x, eps=cfg.layer_norm_eps)
    h = linear(p["mlp"]["fc2"], quick_gelu(linear(p["mlp"]["fc1"], h)))
    return x + h


def apply_patch_features(params: dict, pixels: jax.Array,
                         cfg: ClipVisionConfig) -> jax.Array:
    """[B, 3, 224, 224] CLIP-normalized pixels -> [B, 256, hidden] patch
    features from hidden_states[select_layer] with CLS dropped."""
    B = pixels.shape[0]
    ps = cfg.patch_size
    grid = cfg.image_size // ps
    pixels = pixels.astype(params["patch_embed"]["w"].dtype)
    x = pixels.reshape(B, 3, grid, ps, grid, ps)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, grid * grid, 3 * ps * ps)
    x = linear(params["patch_embed"], x)
    cls = jnp.broadcast_to(params["class_embedding"].astype(x.dtype)[None, None],
                           (B, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"].astype(x.dtype)[None]
    x = layer_norm(params["pre_layernorm"], x, eps=cfg.layer_norm_eps)

    # run up to (num_layers + select_layer + 1) layers: hidden_states[-2] in HF
    # indexing is the input to the final layer, i.e. after num_layers-1 layers.
    n_run = cfg.num_layers + cfg.select_layer + 1
    for p in params["layers"][:n_run]:
        x = _encoder_layer(p, x, cfg)
    return x[:, 1:]  # drop CLS


CLIP_PIXEL_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_PIXEL_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize_pixels(x: jax.Array) -> jax.Array:
    """RGB uint8-range [..., 3, H, W] -> CLIP-normalized."""
    mean = jnp.asarray(CLIP_PIXEL_MEAN, x.dtype).reshape(-1, 1, 1)
    std = jnp.asarray(CLIP_PIXEL_STD, x.dtype).reshape(-1, 1, 1)
    return (x / 255.0 - mean) / std
