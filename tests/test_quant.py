"""int8 weight quantization: kernel parity (interpret mode) + llama-level
quantized forward accuracy."""

import numpy as np

import jax
import jax.numpy as jnp

INTERP = jax.default_backend() != "tpu"
# compiled-on-chip runs accumulate through the MXU's default fp32 precision
# (bf16 passes) in both kernel and oracle — bf16-eps-level agreement only
TOL = {"rtol": 1e-4, "atol": 1e-4} if INTERP else {"rtol": 2e-2, "atol": 2e-2}

from anyref_tpu.ops.quant import (int8_matmul, int8_matmul_xla,
                                  quantize_int8, quantize_llama)


def test_kernel_matches_xla():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 640)) * 0.05, jnp.float32)
    q = quantize_int8(w)
    for rows in (1, 16, 300):
        x = jnp.asarray(rng.standard_normal((rows, 256)), jnp.float32)
        got = int8_matmul(x, q["w_q"], q["scale"], interpret=INTERP)
        want = int8_matmul_xla(x, q["w_q"], q["scale"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   **TOL)


def test_quantization_error_bounded():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((128, 256)) * 0.05, jnp.float32)
    q = quantize_int8(w)
    back = q["w_q"].astype(jnp.float32) * q["scale"][None]
    rel = np.abs(np.asarray(back - w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 1.0 / 127  # symmetric per-channel quantization bound


def test_quantized_llama_forward_close():
    from anyref_tpu.config import LlamaConfig
    from anyref_tpu.models import llama
    cfg = LlamaConfig(vocab_size=128, padded_vocab_size=128, hidden_size=64,
                      intermediate_size=160, num_layers=2, num_heads=4,
                      num_kv_heads=4, head_dim=16, max_seq_len=32)
    params = llama.init(jax.random.key(0), cfg, dtype=jnp.float32)
    qparams = quantize_llama(params)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 128, (1, 10)))
    emb = llama.embed(params, ids, dtype=jnp.float32)
    h = llama.forward(params, cfg, emb)
    hq = llama.forward(qparams, cfg, emb)
    lg = llama.logits(params, h)
    lgq = llama.logits(qparams, hq)
    # int8 weights: small relative drift, same argmax almost everywhere
    agree = (np.argmax(np.asarray(lg), -1) == np.argmax(np.asarray(lgq), -1)).mean()
    assert agree > 0.8
