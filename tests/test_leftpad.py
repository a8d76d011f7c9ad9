"""Left-padded batched generation must match unpadded per-sample compute
(reference DataCollector left_pad mode semantics)."""

import numpy as np

import jax
import jax.numpy as jnp

from anyref_tpu.config import LlamaConfig
from anyref_tpu.models import llama


TINY = LlamaConfig(vocab_size=128, padded_vocab_size=128, hidden_size=64,
                   intermediate_size=160, num_layers=2, num_heads=4,
                   num_kv_heads=4, head_dim=16, max_seq_len=64)


def test_leftpad_prefill_matches_unpadded():
    params = llama.init(jax.random.key(0), TINY, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.standard_normal((1, 10, TINY.hidden_size)) * 0.1,
                       jnp.float32)
    garbage = jnp.asarray(rng.standard_normal((1, 6, TINY.hidden_size)),
                          jnp.float32)
    padded = jnp.concatenate([garbage, real], axis=1)    # [1, 16, D]

    cache_u = llama.init_cache(TINY, 1, 20, jnp.float32)
    hid_u, cache_u = llama.prefill(params, TINY, real, cache_u)

    cache_p = llama.init_cache(TINY, 1, 26, jnp.float32)
    hid_p, cache_p = llama.prefill(params, TINY, padded, cache_p,
                                   pad_len=jnp.asarray([6]))
    np.testing.assert_allclose(np.asarray(hid_p[:, 6:]), np.asarray(hid_u),
                               rtol=2e-5, atol=2e-5)

    # decode step parity: next token computed from the same state
    nxt = jnp.asarray(rng.standard_normal((1, 1, TINY.hidden_size)) * 0.1,
                      jnp.float32)
    h_u, _ = llama.decode_step(params, TINY, nxt, jnp.int32(10), cache_u)
    h_p, _ = llama.decode_step(params, TINY, nxt, jnp.int32(16), cache_p,
                               pad_len=jnp.asarray([6]))
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_u),
                               rtol=2e-5, atol=2e-5)


def test_leftpad_batched_rows_independent():
    """Two rows with different pads: each row must equal its solo run."""
    params = llama.init(jax.random.key(1), TINY, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((1, 12, TINY.hidden_size)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((1, 7, TINY.hidden_size)) * 0.1,
                    jnp.float32)
    L = 12
    pad_b = L - 7
    batch = jnp.concatenate([
        a, jnp.concatenate([jnp.zeros((1, pad_b, TINY.hidden_size)), b], 1)],
        axis=0)
    cache = llama.init_cache(TINY, 2, L + 4, jnp.float32)
    hid, _ = llama.prefill(params, TINY, batch, cache,
                           pad_len=jnp.asarray([0, pad_b]))

    cache_a = llama.init_cache(TINY, 1, L + 4, jnp.float32)
    hid_a, _ = llama.prefill(params, TINY, a, cache_a)
    cache_b = llama.init_cache(TINY, 1, 11, jnp.float32)
    hid_b, _ = llama.prefill(params, TINY, b, cache_b)

    np.testing.assert_allclose(np.asarray(hid[0]), np.asarray(hid_a[0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(hid[1, pad_b:]),
                               np.asarray(hid_b[0]), rtol=2e-5, atol=2e-5)


def test_collator_rejects_overlong_prompt():
    """Over-length prompts must raise (reference asserts total length,
    utils/coco_instance.py:221-222) instead of silently truncating while
    recording the untruncated prompt_lens — Predictor.predict would slice
    past the stored buffer or generate from a prompt cut before
    'ASSISTANT:'."""
    import dataclasses

    import pytest

    from anyref_tpu.config import anyref_tiny
    from anyref_tpu.data.collator import Collator
    from anyref_tpu.tokenizer import AnyRefTokenizer, seg_question

    cfg = dataclasses.replace(anyref_tiny(), max_text_len=48)
    col = Collator(AnyRefTokenizer(), cfg, train=False)
    inst = {
        "clip_image": np.zeros((3, 224, 224), np.float32),
        "sam_image": np.zeros(
            (3, cfg.sam.image_size, cfg.sam.image_size), np.float32),
        "sam_resized_size": (cfg.sam.image_size, cfg.sam.image_size),
        "question": seg_question("a " * 200 + "very long expression"),
        "answer": None, "gt_masks": None,
        "height": 32, "width": 32, "file_name": "x",
    }
    with pytest.raises(ValueError, match="max_text_len"):
        col([inst])
