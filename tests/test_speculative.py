"""Speculative decoding must be lossless: identical outputs to the plain
greedy loop (ids, seg slots, masks)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anyref_tpu.config import anyref_tiny
from anyref_tpu.models import anyref
from anyref_tpu.data.collator import Collator
from anyref_tpu.tokenizer import AnyRefTokenizer, seg_question


CFG = anyref_tiny()


def _batch(rng):
    col = Collator(AnyRefTokenizer(), CFG, train=False)
    inst = {
        "clip_image": rng.standard_normal((3, 224, 224)).astype(np.float32),
        "sam_image": rng.standard_normal(
            (3, CFG.sam.image_size, CFG.sam.image_size)).astype(np.float32),
        "sam_resized_size": (CFG.sam.image_size, CFG.sam.image_size),
        "question": seg_question("the red cat on the red mat"),
        "answer": None, "gt_masks": None,
        "height": 32, "width": 32, "file_name": "x",
    }
    batch = col([inst])
    plen = int(batch["prompt_lens"][0])
    return {"input_ids": jnp.asarray(batch["input_ids"][:, :plen]),
            "clip_images": jnp.asarray(batch["clip_images"]),
            "sam_images": jnp.asarray(batch["sam_images"])}


@pytest.mark.slow
def test_speculative_matches_greedy():
    params = anyref.init(jax.random.key(0), CFG, dtype=jnp.float32)
    batch = _batch(np.random.default_rng(0))
    mnt = 12
    plain = jax.jit(functools.partial(anyref.generate, max_new_tokens=mnt),
                    static_argnums=(1,))(params, CFG, batch)
    spec = jax.jit(functools.partial(anyref.generate, max_new_tokens=mnt,
                                     speculative=True, draft_len=3),
                   static_argnums=(1,))(params, CFG, batch)
    np.testing.assert_array_equal(np.asarray(plain.output_ids),
                                  np.asarray(spec.output_ids))
    np.testing.assert_array_equal(np.asarray(plain.seg_valid),
                                  np.asarray(spec.seg_valid))
    np.testing.assert_allclose(np.asarray(plain.low_res_masks),
                               np.asarray(spec.low_res_masks),
                               rtol=2e-4, atol=2e-4)


def test_prompt_lookup_draft():
    from anyref_tpu.models.anyref import _prompt_lookup_draft
    # sequence: ... 7 8 9 1 2 [5 6 7] ... current suffix [1 2] occurred
    # earlier followed by 3 4
    seq = jnp.asarray([9, 1, 2, 3, 4, 8, 1, 2], jnp.int32)
    seq = jnp.concatenate([seq, jnp.full((8,), 2, jnp.int32)])
    draft = _prompt_lookup_draft(seq, jnp.int32(8), ngram=2, draft_len=2)
    np.testing.assert_array_equal(np.asarray(draft), [3, 4])


@pytest.mark.slow
def test_max_accept_cap_is_lossless_and_bounds_passes():
    """BENCH_FORCE_ACCEPT semantics: capping accepted tokens per pass must
    keep outputs exactly the greedy stream while forcing at least
    ceil(tokens/k) verify passes."""
    params = anyref.init(jax.random.key(0), CFG, dtype=jnp.float32)
    batch = _batch(np.random.default_rng(0))
    mnt = 12
    plain = jax.jit(functools.partial(anyref.generate, max_new_tokens=mnt),
                    static_argnums=(1,))(params, CFG, batch)
    for k in (1, 2, 4):
        capped = jax.jit(functools.partial(
            anyref.generate, max_new_tokens=mnt, speculative=True,
            draft_len=8, max_accept=k), static_argnums=(1,))(
                params, CFG, batch)
        np.testing.assert_array_equal(np.asarray(plain.output_ids),
                                      np.asarray(capped.output_ids),
                                      err_msg=f"k={k}")
        n_tok = int(np.asarray(plain.num_generated)[0]) or mnt
        passes = int(np.asarray(capped.decode_passes))
        assert passes >= -(-n_tok // k), (k, passes, n_tok)
