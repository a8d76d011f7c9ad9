"""Golden parity: anyref_tpu LLaMA vs HF LlamaForCausalLM (tiny config),
and KV-cached decode vs full forward self-consistency."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from anyref_tpu.config import LlamaConfig
from anyref_tpu import convert
from anyref_tpu.models import llama


TINY = LlamaConfig(vocab_size=128, padded_vocab_size=128, hidden_size=64,
                   intermediate_size=160, num_layers=2, num_heads=4,
                   num_kv_heads=4, head_dim=16, max_seq_len=64)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM
    cfg = HFConfig(vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
                   intermediate_size=TINY.intermediate_size,
                   num_hidden_layers=TINY.num_layers,
                   num_attention_heads=TINY.num_heads,
                   num_key_value_heads=TINY.num_kv_heads,
                   head_dim=TINY.head_dim,
                   max_position_embeddings=TINY.max_seq_len,
                   rms_norm_eps=TINY.rms_norm_eps, rope_theta=TINY.rope_theta,
                   attention_bias=False, tie_word_embeddings=False,
                   attn_implementation="eager")  # sdpa returns no attentions
    torch.manual_seed(0)
    m = LlamaForCausalLM(cfg)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape) * 0.05)
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_params(hf_model):
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    return convert.convert_llama(sd, TINY, dtype=jnp.float32)


def test_forward_parity(hf_model, jax_params):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY.vocab_size, (2, 12))
    with torch.no_grad():
        out = hf_model(torch.from_numpy(ids), output_hidden_states=True)
    # hidden_states[-1] is post-final-RMSNorm in HF
    want_hidden = out.hidden_states[-1].numpy()
    want_logits = out.logits.numpy()

    emb = llama.embed(jax_params, jnp.asarray(ids), dtype=jnp.float32)
    hidden = llama.forward(jax_params, TINY, emb)
    logits = llama.logits(jax_params, hidden)
    np.testing.assert_allclose(np.asarray(hidden), want_hidden,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), want_logits,
                               rtol=2e-4, atol=2e-4)


def test_embeds_input_parity(hf_model, jax_params):
    """AnyRef feeds inputs_embeds (multimodal splice), not ids."""
    rng = np.random.default_rng(1)
    embeds = (rng.standard_normal((1, 9, TINY.hidden_size)) * 0.1).astype(np.float32)
    with torch.no_grad():
        out = hf_model(inputs_embeds=torch.from_numpy(embeds),
                       output_hidden_states=True)
    hidden = llama.forward(jax_params, TINY, jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(hidden),
                               out.hidden_states[-1].numpy(),
                               rtol=2e-4, atol=2e-4)


def test_decode_matches_forward(jax_params):
    """Prefill + N decode steps == full forward on the same sequence."""
    rng = np.random.default_rng(2)
    Lp, n_steps = 7, 5
    embeds = jnp.asarray(
        (rng.standard_normal((2, Lp + n_steps, TINY.hidden_size)) * 0.1)
        .astype(np.float32))

    full = llama.forward(jax_params, TINY, embeds)

    cache = llama.init_cache(TINY, 2, Lp + n_steps, dtype=jnp.float32)
    hid_p, cache = llama.prefill(jax_params, TINY, embeds[:, :Lp], cache)
    np.testing.assert_allclose(np.asarray(hid_p), np.asarray(full[:, :Lp]),
                               rtol=1e-5, atol=1e-5)
    for i in range(n_steps):
        h, cache = llama.decode_step(jax_params, TINY,
                                     embeds[:, Lp + i: Lp + i + 1],
                                     jnp.int32(Lp + i), cache)
        np.testing.assert_allclose(
            np.asarray(h[:, 0]), np.asarray(full[:, Lp + i]),
            rtol=1e-5, atol=1e-5)


def test_rephrase_attn_row_matches_hf(hf_model, jax_params):
    """The post-hoc recomputed final-layer attention row (rephrase feature,
    reference anyref.py:372-392) must equal HF's actual output_attentions:
    per-head softmax over the causal row, then head mean."""
    import types
    from anyref_tpu.models import anyref

    rng = np.random.default_rng(3)
    L = 14
    embeds = (rng.standard_normal((2, L, TINY.hidden_size)) * 0.1
              ).astype(np.float32)
    with torch.no_grad():
        out = hf_model(inputs_embeds=torch.from_numpy(embeds),
                       output_attentions=True, output_hidden_states=True)
    probs = out.attentions[-1]                      # [B, H, L, L]
    qpos = 11
    want_row = probs.mean(1)[:, qpos].numpy()       # [B, L]

    cfg = types.SimpleNamespace(llama=TINY)
    params = {"llama": jax_params}
    cache = llama.init_cache(TINY, 2, L, dtype=jnp.float32)
    _, cache, last_in = llama.prefill(jax_params, TINY, jnp.asarray(embeds),
                                      cache, return_last_input=True)
    q_in = jnp.asarray(last_in)[:, qpos]
    got_row = anyref._last_layer_attn_row(
        params, cfg, q_in, cache.k[-1],
        jnp.full((2,), qpos, jnp.int32), jnp.full((2,), qpos, jnp.int32))
    np.testing.assert_allclose(np.asarray(got_row)[:, :qpos + 1],
                               want_row[:, :qpos + 1], rtol=2e-4, atol=2e-4)
    # masked tail must carry ~no mass
    assert float(np.asarray(got_row)[:, qpos + 1:].max()) < 1e-6


def test_rephrase_pool_matches_reference_torch(hf_model, jax_params):
    """Full training-path rephrase pooling vs the reference's torch lines
    (anyref.py:372-392) run on HF attentions/hiddens."""
    import types
    from anyref_tpu.models import anyref

    rng = np.random.default_rng(4)
    B, L = 2, 16
    embeds = (rng.standard_normal((B, L, TINY.hidden_size)) * 0.1
              ).astype(np.float32)
    with torch.no_grad():
        out = hf_model(inputs_embeds=torch.from_numpy(embeds),
                       output_attentions=True, output_hidden_states=True)
    hid = out.hidden_states[-1]                     # post-norm [B, L, D]

    seg_pos = np.array([12, 10])                    # [SEG] token positions
    # labels > 0 from ans_first onward (reference rephrase_start =
    # where(labels>0)[0][0] - 1)
    ans_first = np.array([6, 5])
    labels = np.full((B, L), -100, np.int64)
    for i in range(B):
        labels[i, ans_first[i]:seg_pos[i] + 2] = 7

    # reference oracle (torch), lines anyref.py:372-384
    want = []
    for i in range(B):
        rephrase_end = seg_pos[i] - 1               # emitting position
        rephrase_start = ans_first[i] - 1
        attn = out.attentions[-1][i].mean(0)        # [L, L]
        row = attn[rephrase_end, rephrase_start:rephrase_end]
        row = row / row.sum()
        want.append((hid[i, rephrase_start:rephrase_end]
                     * row.unsqueeze(-1)).sum(0).numpy())
    want = np.stack(want)

    cfg = types.SimpleNamespace(llama=TINY)
    params = {"llama": jax_params}
    hidden, last_in = llama.forward(jax_params, TINY, jnp.asarray(embeds),
                                    return_last_input=True)
    pooled = anyref._rephrase_pool(
        params, cfg, hidden, last_in, jnp.asarray(labels),
        jnp.asarray(seg_pos)[:, None])
    np.testing.assert_allclose(np.asarray(pooled)[:, 0], want,
                               rtol=2e-4, atol=2e-4)
