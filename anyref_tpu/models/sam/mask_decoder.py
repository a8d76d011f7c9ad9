"""SAM mask decoder + two-way transformer, TPU-native.

Re-design of the reference decoder
(model/segment_anything/modeling/mask_decoder.py:16-206, transformer.py:16-242).
Differences from the reference:
  * fully batched over prompts — the reference loops per image and per [SEG]
    token (anyref.py:406-430); here all N prompts decode in one call, each
    gathering its image embedding by index;
  * the 4 hypernetwork MLPs are stacked into single weight tensors so all
    mask tokens run through one batched matmul;
  * the 2x2-stride-2 transposed convs are exact matmul+depth-to-space.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...config import SamConfig
from ...ops.common import conv2d_transpose, gelu, layer_norm, layer_norm_2d, linear, mha


NUM_OUTPUT_TOKENS = 5  # 1 iou token + 4 mask tokens


def init(key: jax.Array, cfg: SamConfig, dtype=jnp.float32) -> dict:
    d = cfg.prompt_embed_dim
    nm = cfg.num_multimask_outputs + 1
    ks = iter(jax.random.split(key, 64))

    def lin(i, o, bias=True):
        p = {"w": (jax.random.normal(next(ks), (i, o)) * (i ** -0.5)).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((o,), dtype)
        return p

    def ln(dim):
        return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    def attn(downsample=1):
        di = d // downsample
        return {"q": lin(d, di), "k": lin(d, di), "v": lin(d, di),
                "out": lin(di, d)}

    def mlp3(i, h, o):
        return {"layers": [lin(i, h), lin(h, h), lin(h, o)]}

    layers = []
    for _ in range(cfg.mask_decoder_depth):
        layers.append({
            "self_attn": attn(), "norm1": ln(d),
            "cross_attn_t2i": attn(2), "norm2": ln(d),
            "mlp": {"lin1": lin(d, cfg.mask_decoder_mlp_dim),
                    "lin2": lin(cfg.mask_decoder_mlp_dim, d)},
            "norm3": ln(d),
            "cross_attn_i2t": attn(2), "norm4": ln(d),
        })

    return {
        "iou_token": jax.random.normal(next(ks), (1, d)).astype(dtype),
        "mask_tokens": jax.random.normal(next(ks), (nm, d)).astype(dtype),
        "transformer": {
            "layers": layers,
            "final_attn_t2i": attn(2),
            "norm_final": ln(d),
        },
        "upscale": {
            "deconv1": {"w": (jax.random.normal(next(ks), (d, d // 4, 2, 2)) * 0.1).astype(dtype),
                        "b": jnp.zeros((d // 4,), dtype)},
            "ln": ln(d // 4),
            "deconv2": {"w": (jax.random.normal(next(ks), (d // 4, d // 8, 2, 2)) * 0.1).astype(dtype),
                        "b": jnp.zeros((d // 8,), dtype)},
        },
        # stacked hypernetwork MLPs: [num_mask_tokens, ...] leading axis
        "hyper_mlps": [
            {"w": jnp.stack([(jax.random.normal(k2, (i, o)) * (i ** -0.5)).astype(dtype)
                             for k2 in jax.random.split(next(ks), nm)]),
             "b": jnp.zeros((nm, o), dtype)}
            for (i, o) in [(d, d), (d, d), (d, d // 8)]
        ],
        "iou_head": mlp3(d, cfg.iou_head_hidden_dim, nm),
    }


def _attention(p, q, k, v, num_heads: int):
    """Two-way transformer attention with channel downsampling
    (reference transformer.py:185-242)."""
    q = linear(p["q"], q)
    k = linear(p["k"], k)
    v = linear(p["v"], v)
    B, Lq, C = q.shape
    hd = C // num_heads
    qh = q.reshape(B, Lq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, k.shape[1], num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, v.shape[1], num_heads, hd).transpose(0, 2, 1, 3)
    out = mha(qh, kh, vh)
    out = out.transpose(0, 2, 1, 3).reshape(B, Lq, C)
    return linear(p["out"], out)


def _two_way_transformer(p, cfg: SamConfig, image_emb: jax.Array,
                         image_pe: jax.Array, tokens: jax.Array):
    """image_emb: [N, C, g, g]; tokens: [N, T, C] -> (tokens, image tokens)
    (reference transformer.py:62-106)."""
    nh = cfg.mask_decoder_heads
    N, C, g, _ = image_emb.shape
    keys = image_emb.reshape(N, C, g * g).transpose(0, 2, 1)
    key_pe = jnp.broadcast_to(
        image_pe.reshape(1, C, g * g).transpose(0, 2, 1), keys.shape).astype(keys.dtype)
    queries = tokens
    for i, lp in enumerate(p["layers"]):
        if i == 0:
            q = queries
        else:
            q = queries + tokens
        attn_out = _attention(lp["self_attn"], q, q, queries, nh)
        queries = queries + attn_out if i != 0 else attn_out
        queries = layer_norm(lp["norm1"], queries, eps=1e-5)

        q = queries + tokens
        k = keys + key_pe
        queries = queries + _attention(lp["cross_attn_t2i"], q, k, keys, nh)
        queries = layer_norm(lp["norm2"], queries, eps=1e-5)

        h = linear(lp["mlp"]["lin2"],
                   jax.nn.relu(linear(lp["mlp"]["lin1"], queries)))
        queries = layer_norm(lp["norm3"], queries + h, eps=1e-5)

        q = queries + tokens
        keys = keys + _attention(lp["cross_attn_i2t"], k, q, queries, nh)
        keys = layer_norm(lp["norm4"], keys, eps=1e-5)

    q = queries + tokens
    k = keys + key_pe
    queries = queries + _attention(p["final_attn_t2i"], q, k, keys, nh)
    queries = layer_norm(p["norm_final"], queries, eps=1e-5)
    return queries, keys


def apply(params: dict, cfg: SamConfig, image_embeddings: jax.Array,
          image_pe: jax.Array, sparse_prompts: jax.Array,
          dense_prompts: jax.Array, multimask_output: bool = False):
    """Predict masks for N prompts.

    image_embeddings: [N, C, g, g] (already gathered per prompt)
    image_pe:         [1, C, g, g]
    sparse_prompts:   [N, T, C]
    dense_prompts:    [N, C, g, g]
    Returns (masks [N, K, 4g, 4g], iou_pred [N, K]) with K = 1 or 3.
    (reference mask_decoder.py:75-179)
    """
    N = sparse_prompts.shape[0]
    nm = cfg.num_multimask_outputs + 1
    out_tokens = jnp.concatenate([params["iou_token"], params["mask_tokens"]], axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tokens[None], (N, nm + 1, out_tokens.shape[-1])).astype(sparse_prompts.dtype),
         sparse_prompts], axis=1)

    src = image_embeddings + dense_prompts
    hs, src = _two_way_transformer(params["transformer"], cfg, src, image_pe, tokens)
    iou_token_out = hs[:, 0]
    mask_tokens_out = hs[:, 1:1 + nm]                      # [N, nm, C]

    g = cfg.embedding_size
    C = image_embeddings.shape[1]
    src = src.transpose(0, 2, 1).reshape(N, C, g, g)
    up = params["upscale"]
    x = conv2d_transpose(up["deconv1"], src, stride=2)
    x = gelu(layer_norm_2d(up["ln"], x, eps=cfg.layer_norm_eps))
    x = gelu(conv2d_transpose(up["deconv2"], x, stride=2))  # [N, C/8, 4g, 4g]

    # stacked hypernetwork MLPs: per mask token m, 3-layer relu MLP
    h = mask_tokens_out
    for li, lp in enumerate(params["hyper_mlps"]):
        h = jnp.einsum("nmi,mio->nmo", h, lp["w"].astype(h.dtype)) + lp["b"].astype(h.dtype)
        if li < len(params["hyper_mlps"]) - 1:
            h = jax.nn.relu(h)
    # masks[n, m] = h[n, m] . x[n, :, :, :]
    masks = jnp.einsum("nmc,nchw->nmhw", h, x, preferred_element_type=jnp.float32)

    ih = iou_token_out
    for li, lp in enumerate(params["iou_head"]["layers"]):
        ih = linear(lp, ih)
        if li < len(params["iou_head"]["layers"]) - 1:
            ih = jax.nn.relu(ih)
    iou_pred = ih

    if multimask_output:
        return masks[:, 1:], iou_pred[:, 1:]
    return masks[:, :1], iou_pred[:, :1]
