"""LLaMA decoder, TPU-native (the LLaVA-Lightning-7B-v1-1 backbone).

Numerics match HF ``LlamaForCausalLM`` (transformers 4.31 semantics, the
reference's pinned version): RMSNorm in fp32, rotary embeddings, SiLU MLP.
The forward here consumes *embeddings* (not ids) because AnyRef splices
multimodal features into the sequence before the decoder (reference
anyref.py:341-354 via the missing LLaVA fork).

Design notes (TPU):
  * bf16 params/activations; embed_tokens / lm_head / norms accumulate fp32
    (the reference keeps embed_tokens + lm_head fp32, train.py:415-416);
  * prefill uses the flash/causal attention entry point; decode is a
    one-token step against a preallocated KV cache (static shapes), driven by
    lax.scan in the caller;
  * hidden states returned are post-final-RMSNorm — what the reference's
    [SEG] extraction consumes (HF hidden_states[-1] is post-norm).
  * tensor-parallel sharding is annotated externally via
    anyref_tpu.parallel.partition (heads over the "model" mesh axis).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import LlamaConfig
from ..ops.attention import causal_attention
from ..ops.common import linear, rms_norm


class KVCache(NamedTuple):
    k: jax.Array  # [layers, B, kv_heads, max_len, head_dim]
    v: jax.Array


def init(key: jax.Array, cfg: LlamaConfig, dtype=jnp.bfloat16) -> dict:
    ks = iter(jax.random.split(key, 2 + 8 * cfg.num_layers))
    d = cfg.hidden_size

    def lin(i, o):
        return {"w": (jax.random.normal(next(ks), (i, o)) * (i ** -0.5)).astype(dtype)}

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "input_norm": {"scale": jnp.ones((d,), dtype)},
            "attn": {
                "q": lin(d, cfg.num_heads * cfg.head_dim),
                "k": lin(d, cfg.num_kv_heads * cfg.head_dim),
                "v": lin(d, cfg.num_kv_heads * cfg.head_dim),
                "o": lin(cfg.num_heads * cfg.head_dim, d),
            },
            "post_attn_norm": {"scale": jnp.ones((d,), dtype)},
            "mlp": {
                "gate": lin(d, cfg.intermediate_size),
                "up": lin(d, cfg.intermediate_size),
                "down": lin(cfg.intermediate_size, d),
            },
        })
    return {
        "embed_tokens": (jax.random.normal(next(ks), (cfg.padded_vocab_size, d))
                         * 0.02).astype(jnp.float32),
        "layers": layers,
        "final_norm": {"scale": jnp.ones((d,), dtype)},
        "lm_head": (jax.random.normal(next(ks), (d, cfg.padded_vocab_size))
                    * 0.02).astype(jnp.float32),
    }


def embed(params: dict, input_ids: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return params["embed_tokens"][input_ids].astype(dtype)


def transpose_for_serving(params: dict) -> dict:
    """Store decoder matmul weights transposed ([out, in], consumed by
    ops.common.linear's "w_t" path). Measured on v5e: removes the ~3.2 GiB
    of transposed weight copies XLA otherwise materializes for multi-row
    speculative decode chunks, making speculative decoding fit at 7B on one
    chip.

    Mutates ``params`` in place, weight by weight, so peak HBM stays within
    one extra projection (a whole-tree copy would briefly double the 13 GiB
    decoder and OOM a 16 GiB chip)."""
    import jax

    for layer in params["layers"]:
        for grp in ("attn", "mlp"):
            for k in list(layer[grp]):
                p = layer[grp][k]
                if "w" in p:
                    w = p.pop("w")
                    new = {"w_t": jax.block_until_ready(w.T)}
                    if "b" in p:
                        new["b"] = p["b"]
                    layer[grp][k] = new
                    del w
    return params


def fuse_for_serving(params: dict) -> dict:
    """Concatenate q/k/v and gate/up projection weights per layer into
    single matmuls (serving-only layout). Exact: each output element's dot
    product (contraction dim, reduction order) is unchanged — only the
    number of MXU dispatches drops (8 -> 5 per layer), which matters for
    prefill where the per-matmul M=384 tiles underfill the launch overhead.

    Expects the transposed [out, in] serving layout (transpose_for_serving);
    plain [in, out] weights are transposed on the fly. Mutates ``params`` in
    place, layer by layer, to bound peak HBM. Idempotent."""
    import jax

    def take(p):
        return p["w_t"] if "w_t" in p else p["w"].T

    for layer in params["layers"]:
        attn, mlp = layer["attn"], layer["mlp"]
        if "qkv" not in attn:
            w = jnp.concatenate([take(attn.pop(k)) for k in ("q", "k", "v")],
                                axis=0)
            attn["qkv"] = {"w_t": jax.block_until_ready(w)}
            del w
        if "gate_up" not in mlp:
            w = jnp.concatenate([take(mlp.pop(k)) for k in ("gate", "up")],
                                axis=0)
            mlp["gate_up"] = {"w_t": jax.block_until_ready(w)}
            del w
    return params


def attn_proj(attn: dict, name: str, lcfg) -> dict:
    """Param dict for one attention projection (``q``/``k``/``v``) regardless
    of serving layout. After ``fuse_for_serving`` the per-projection mats
    exist only as row blocks of the fused transposed qkv weight; the rephrase
    path (anyref._last_layer_attn_row / _rephrase_pool) still projects q/k
    individually, so it resolves them through this accessor."""
    if name in attn:
        return attn[name]
    nq = lcfg.num_heads * lcfg.head_dim
    nkv = lcfg.num_kv_heads * lcfg.head_dim
    lo, hi = {"q": (0, nq), "k": (nq, nq + nkv),
              "v": (nq + nkv, nq + 2 * nkv)}[name]
    return {"w_t": attn["qkv"]["w_t"][lo:hi]}


def _rope_tables(positions: jax.Array, hd: int,
                 theta: float) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables [B, 1, L, hd/2], computed ONCE per forward and shared
    by all layers (every layer sees the same positions; recomputing the
    tables per layer leaned on XLA CSE that does not reach across the
    per-layer fusion boundaries)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    if positions.ndim == 1:
        positions = positions[None]
    ang = positions.astype(jnp.float32)[:, None, :, None] * inv_freq
    return jnp.cos(ang), jnp.sin(ang)


def _rope(x: jax.Array, positions: jax.Array, theta: float,
          tables: Optional[tuple[jax.Array, jax.Array]] = None) -> jax.Array:
    """Rotary embedding, HF llama convention (rotate_half over dim halves).

    x: [B, heads, L, hd]; positions: [B, L] or [L].
    """
    hd = x.shape[-1]
    cos, sin = tables if tables is not None else _rope_tables(
        positions, hd, theta)
    x1, x2 = x[..., : hd // 2], x[..., hd // 2:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    r1 = xf1 * cos - xf2 * sin
    r2 = xf2 * cos + xf1 * sin
    return jnp.concatenate([r1, r2], axis=-1).astype(x.dtype)


def _split_heads(x: jax.Array, n: int, hd: int) -> jax.Array:
    B, L, _ = x.shape
    return x.reshape(B, L, n, hd).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    B, n, L, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, n * hd)


def _layer(p, cfg: LlamaConfig, x: jax.Array, positions: jax.Array,
           mode: str,
           kv_slice: Optional[tuple[jax.Array, jax.Array]] = None,
           write_pos: Optional[jax.Array] = None,
           kv_len: Optional[jax.Array] = None,
           kv_start: Optional[jax.Array] = None,
           use_flash: bool = True,
           fused_norms: bool = False,
           layer_idx: Optional[int] = None,
           rope_tables: Optional[tuple[jax.Array, jax.Array]] = None,
           ) -> tuple[jax.Array, Optional[tuple[jax.Array, jax.Array]]]:
    """mode: "full" (training, no cache), "prefill" (fill cache, attend over
    the fresh prompt keys — keeps the flash path), "decode" (one step
    against the cache).

    ``kv_slice`` is the FULL stacked cache (k, v) of shape
    [layers, B, kvh, max_len, hd]; ``layer_idx`` (static) selects this
    layer's slot. Fresh k/v are written in place at (layer_idx, :, :,
    write_pos, :) — a small dynamic_update_slice XLA keeps in the carried
    buffer — instead of updating per-layer slices and restacking them in the
    caller, which copied the whole cache (~0.5 GiB at 7B batch 2) every
    prefill / decode pass."""
    h = rms_norm(p["input_norm"], x, eps=cfg.rms_norm_eps,
                 fused=fused_norms)
    if "qkv" in p["attn"]:  # fused serving layout (fuse_for_serving)
        nq = cfg.num_heads * cfg.head_dim
        nkv = cfg.num_kv_heads * cfg.head_dim
        qkv = linear(p["attn"]["qkv"], h)
        q_p, k_p, v_p = (qkv[..., :nq], qkv[..., nq:nq + nkv],
                         qkv[..., nq + nkv:])
    else:
        q_p = linear(p["attn"]["q"], h)
        k_p = linear(p["attn"]["k"], h)
        v_p = linear(p["attn"]["v"], h)
    q = _split_heads(q_p, cfg.num_heads, cfg.head_dim)
    k = _split_heads(k_p, cfg.num_kv_heads, cfg.head_dim)
    v = _split_heads(v_p, cfg.num_kv_heads, cfg.head_dim)
    q = _rope(q, positions, cfg.rope_theta, tables=rope_tables)
    k = _rope(k, positions, cfg.rope_theta, tables=rope_tables)

    new_kv = None
    if mode != "full":
        ck, cv = kv_slice  # [layers, B, kvh, max_len, hd]
        ck = jax.lax.dynamic_update_slice(ck, k[None],
                                          (layer_idx, 0, 0, write_pos, 0))
        cv = jax.lax.dynamic_update_slice(cv, v[None],
                                          (layer_idx, 0, 0, write_pos, 0))
        new_kv = (ck, cv)
        if mode == "decode":
            k, v = ck[layer_idx], cv[layer_idx]

    def expand_kv(t):
        if cfg.num_kv_heads != cfg.num_heads:
            return jnp.repeat(t, cfg.num_heads // cfg.num_kv_heads, axis=1)
        return t

    q_offset = write_pos if mode == "decode" else 0
    attn = causal_attention(q, expand_kv(k), expand_kv(v),
                            q_offset=q_offset, kv_len=kv_len,
                            kv_start=kv_start, use_flash=use_flash,
                            differentiable=mode == "full")
    x = x + linear(p["attn"]["o"], _merge_heads(attn))

    h = rms_norm(p["post_attn_norm"], x, eps=cfg.rms_norm_eps,
                 fused=fused_norms)
    if "gate_up" in p["mlp"]:  # fused serving layout
        gu = linear(p["mlp"]["gate_up"], h)
        inter = cfg.intermediate_size
        h = linear(p["mlp"]["down"],
                   jax.nn.silu(gu[..., :inter]) * gu[..., inter:])
    else:
        h = linear(p["mlp"]["down"],
                   jax.nn.silu(linear(p["mlp"]["gate"], h))
                   * linear(p["mlp"]["up"], h))
    return x + h, new_kv


def forward(params: dict, cfg: LlamaConfig, embeds: jax.Array,
            positions: Optional[jax.Array] = None,
            kv_len: Optional[jax.Array] = None,
            return_last_input: bool = False):
    """Full-sequence forward (training / no-cache). Returns post-final-norm
    hidden states [B, L, D]; with ``return_last_input`` also the residual
    stream entering the FINAL layer [B, L, D] (lets callers recompute that
    layer's q/k post-hoc — the rephrase feature's attention row, reference
    anyref.py:372-392 — without materializing [B, H, L, L] probs).

    Training runs the causal flash kernel through its custom VJP
    (ops/flash.py flash_causal_attention_diff): neither forward nor backward
    materializes [B, H, L, L] scores. Sequences pad to the next multiple of
    128 inside the attention entry; kv_len (rare) falls back to XLA."""
    B, L, _ = embeds.shape
    if positions is None:
        positions = jnp.arange(L)
    x = embeds
    rt = _rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    last_in = None
    for p in params["layers"]:
        if p is params["layers"][-1]:
            last_in = x
        x, _ = _layer(p, cfg, x, positions, "full", kv_len=kv_len,
                      use_flash=kv_len is None, rope_tables=rt)
    out = rms_norm(params["final_norm"], x, eps=cfg.rms_norm_eps)
    if return_last_input:
        return out, last_in
    return out


def init_cache(cfg: LlamaConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def prefill(params: dict, cfg: LlamaConfig, embeds: jax.Array,
            cache: KVCache,
            pad_len: Optional[jax.Array] = None,
            return_last_input: bool = False):
    """Run the prompt, filling cache positions [0, L). Returns
    (post-norm hidden [B, L, D], cache)[, final-layer input [B, L, D]].

    ``pad_len`` [B]: leading (left) pad per row for batched generation —
    rope positions shift so the first real token sits at position 0 and pad
    keys are masked in the flash kernel (reference left_pad mode)."""
    B, L, _ = embeds.shape
    if pad_len is None:
        positions = jnp.arange(L)
    else:
        positions = jnp.maximum(
            jnp.arange(L)[None, :] - pad_len[:, None], 0)
    x = embeds
    rt = _rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    ck, cv = cache.k, cache.v
    last_in = None
    for i, p in enumerate(params["layers"]):
        if i == len(params["layers"]) - 1:
            last_in = x
        x, (ck, cv) = _layer(p, cfg, x, positions, "prefill",
                             (ck, cv), jnp.int32(0),
                             kv_start=pad_len, fused_norms=True,
                             layer_idx=i, rope_tables=rt)
    out = (rms_norm(params["final_norm"], x, eps=cfg.rms_norm_eps),
           KVCache(ck, cv))
    return out + (last_in,) if return_last_input else out


def decode_step(params: dict, cfg: LlamaConfig, embeds: jax.Array,
                pos: jax.Array, cache: KVCache,
                pad_len: Optional[jax.Array] = None,
                return_last_input: bool = False):
    """One decode step. embeds: [B, 1, D]; pos: scalar current cache slot.
    With ``pad_len`` the rope position is pos - pad_len[b] per row and
    left-pad keys are masked. Returns (post-norm hidden [B, 1, D],
    cache)[, final-layer input [B, 1, D]]."""
    x = embeds
    if pad_len is None:
        positions = jnp.reshape(pos, (1,))
    else:
        positions = (pos - pad_len)[:, None]
    rt = _rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    ck, cv = cache.k, cache.v
    last_in = None
    for i, p in enumerate(params["layers"]):
        if i == len(params["layers"]) - 1:
            last_in = x
        x, (ck, cv) = _layer(p, cfg, x, positions, "decode",
                             (ck, cv), pos, kv_start=pad_len, layer_idx=i,
                             rope_tables=rt)
    out = (rms_norm(params["final_norm"], x, eps=cfg.rms_norm_eps),
           KVCache(ck, cv))
    return out + (last_in,) if return_last_input else out


def decode_chunk(params: dict, cfg: LlamaConfig, embeds: jax.Array,
                 pos: jax.Array, cache: KVCache,
                 pad_len: Optional[jax.Array] = None,
                 return_last_input: bool = False):
    """Multi-token decode step (speculative verification): embeds [B, G, D]
    are G consecutive draft positions starting at cache slot ``pos``; writes
    their k/v and attends causally over the cache. Returns (post-norm hidden
    [B, G, D], cache). Rejected draft entries left in the cache are
    harmless: the next chunk rewrites from the accepted position before any
    query can attend them."""
    B, G, _ = embeds.shape
    if pad_len is None:
        positions = pos + jnp.arange(G)[None, :]
    else:
        positions = (pos + jnp.arange(G)[None, :]) - pad_len[:, None]
    x = embeds
    rt = _rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    ck, cv = cache.k, cache.v
    last_in = None
    for i, p in enumerate(params["layers"]):
        if i == len(params["layers"]) - 1:
            last_in = x
        x, (ck, cv) = _layer(p, cfg, x, positions, "decode",
                             (ck, cv), pos, kv_start=pad_len, layer_idx=i,
                             rope_tables=rt)
    out = (rms_norm(params["final_norm"], x, eps=cfg.rms_norm_eps),
           KVCache(ck, cv))
    return out + (last_in,) if return_last_input else out


def logits(params: dict, hidden: jax.Array) -> jax.Array:
    """lm_head in fp32 (reference train.py:415-416); int8 path for serving."""
    if params.get("lm_head_q") is not None:
        from ..ops.common import linear as _linear
        return _linear(params["lm_head_q"], hidden).astype(jnp.float32)
    return jnp.einsum("...d,dv->...v", hidden.astype(jnp.float32),
                      params["lm_head"], preferred_element_type=jnp.float32)
