"""ImageBind audio branch, TPU-native.

Audio-only slice of ImageBind-huge — the only modality AnyRef keeps
(reference model/anyref.py:142-147). Pipeline (reference
imagebind_model.py:175-192, 331-338, 391-395, 477-511):

  mel clips [B, S, 1, 128, 204]
    -> Conv2d(1->768, k16, s10, no bias) patch stem + LN        (preprocessor)
    -> +cls token, +learnable pos embed (229 tokens)
    -> 12 pre-norm blocks, MHA with bias_kv (extra kv token)    (trunk)
    -> LN -> cls select                         = audio_feature (head[:-1])
    -> Linear(768->1024, no bias) -> L2 normalize -> *20        = embedding

``get_audio_feature`` returns (audio_feature [B, S, 768],
embedding [B, S, 1024]); AnyRef consumes the *embedding* through its
audio_projector (anyref.py:313-317).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...config import ImageBindAudioConfig
from ...ops.common import gelu, layer_norm, linear, mha


def _patch_grid(cfg: ImageBindAudioConfig) -> tuple[int, int]:
    h = (cfg.mel_bins - cfg.kernel_size) // cfg.stride + 1
    w = (cfg.target_len - cfg.kernel_size) // cfg.stride + 1
    return h, w


def init(key: jax.Array, cfg: ImageBindAudioConfig, dtype=jnp.float32) -> dict:
    d = cfg.embed_dim
    gh, gw = _patch_grid(cfg)
    n_tokens = gh * gw + 1
    ks = iter(jax.random.split(key, 8 + 8 * cfg.num_blocks))

    def lin(i, o, bias=True):
        p = {"w": (jax.random.normal(next(ks), (i, o)) * (i ** -0.5)).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((o,), dtype)
        return p

    def ln(dim):
        return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    blocks = []
    for _ in range(cfg.num_blocks):
        blocks.append({
            "norm1": ln(d),
            "attn": {"qkv": lin(d, 3 * d),
                     "bias_k": jnp.zeros((d,), dtype),
                     "bias_v": jnp.zeros((d,), dtype),
                     "out": lin(d, d)},
            "norm2": ln(d),
            "mlp": {"fc1": lin(d, 4 * d), "fc2": lin(4 * d, d)},
        })
    return {
        "patch_conv": {"w": (jax.random.normal(next(ks), (d, 1, cfg.kernel_size,
                                                          cfg.kernel_size))
                             * 0.02).astype(dtype)},
        "patch_norm": ln(d),
        "cls_token": jnp.zeros((1, 1, d), dtype),
        "pos_embed": (jax.random.normal(next(ks), (1, n_tokens, d))
                      * (d ** -0.5)).astype(dtype),
        "blocks": blocks,
        "head_norm": ln(d),
        "head_proj": lin(d, cfg.out_embed_dim, bias=False),
    }


def _block(p, x: jax.Array, num_heads: int) -> jax.Array:
    B, L, D = x.shape
    hd = D // num_heads
    h = layer_norm(p["norm1"], x, eps=1e-6)
    qkv = linear(p["attn"]["qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    # add_bias_kv: one extra learned kv token (torch nn.MultiheadAttention)
    bk = jnp.broadcast_to(p["attn"]["bias_k"].astype(k.dtype)[None, None], (B, 1, D))
    bv = jnp.broadcast_to(p["attn"]["bias_v"].astype(v.dtype)[None, None], (B, 1, D))
    k = jnp.concatenate([k, bk], axis=1)
    v = jnp.concatenate([v, bv], axis=1)
    qh = q.reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, L + 1, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, L + 1, num_heads, hd).transpose(0, 2, 1, 3)
    o = mha(qh, kh, vh).transpose(0, 2, 1, 3).reshape(B, L, D)
    x = x + linear(p["attn"]["out"], o)
    h = layer_norm(p["norm2"], x, eps=1e-6)
    return x + linear(p["mlp"]["fc2"], gelu(linear(p["mlp"]["fc1"], h)))


def trunk(params: dict, cfg: ImageBindAudioConfig, mels: jax.Array) -> jax.Array:
    """mels: [N, 1, mel_bins, target_len] -> [N, tokens, embed_dim]."""
    x = jax.lax.conv_general_dilated(
        mels.astype(params["patch_conv"]["w"].dtype), params["patch_conv"]["w"],
        window_strides=(cfg.stride, cfg.stride), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    N, D, gh, gw = x.shape
    x = x.reshape(N, D, gh * gw).transpose(0, 2, 1)
    x = layer_norm(params["patch_norm"], x, eps=1e-6)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (N, 1, D))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)
    for bp in params["blocks"]:
        x = _block(bp, x, cfg.num_heads)
    return x


def get_audio_feature(params: dict, cfg: ImageBindAudioConfig,
                      mels: jax.Array) -> tuple[jax.Array, jax.Array]:
    """mels: [B, S, 1, mel_bins, target_len] (S clips per audio).

    Returns (audio_feature [B, S, embed_dim], embedding [B, S, out_embed_dim])
    mirroring reference imagebind_model.py:477-511.
    """
    B, S = mels.shape[:2]
    x = trunk(params, cfg, mels.reshape(B * S, *mels.shape[2:]))
    feat = layer_norm(params["head_norm"], x, eps=1e-6)[:, 0]   # cls select
    emb = linear(params["head_proj"], feat)
    emb_f = emb.astype(jnp.float32)
    emb_f = emb_f / jnp.maximum(
        jnp.linalg.norm(emb_f, axis=-1, keepdims=True), 1e-12)
    emb_f = emb_f * cfg.logit_scale_init
    return (feat.reshape(B, S, -1),
            emb_f.reshape(B, S, -1).astype(emb.dtype))
