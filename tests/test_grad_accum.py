"""Gradient accumulation: one accumulated step over k micro-batches must
equal one step over the concatenated batch (same mean gradient)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anyref_tpu.config import anyref_tiny
from anyref_tpu.models import anyref
from anyref_tpu.train import lora as lora_mod
from anyref_tpu.train import step as step_mod
from anyref_tpu.data.collator import Collator
from anyref_tpu.tokenizer import AnyRefTokenizer, seg_answer, seg_question

CFG = anyref_tiny()


def _inst(rng, phrase):
    return {
        "clip_image": rng.standard_normal((3, 224, 224)).astype(np.float32),
        "sam_image": rng.standard_normal(
            (3, CFG.sam.image_size, CFG.sam.image_size)).astype(np.float32),
        "sam_resized_size": (CFG.sam.image_size, CFG.sam.image_size),
        "question": seg_question(phrase), "answer": seg_answer(phrase),
        "gt_masks": (rng.random((1, 48, 64)) > 0.5).astype(np.uint8),
        "height": 48, "width": 64, "file_name": "x.jpg",
    }


@pytest.mark.slow
def test_accum_equals_big_batch():
    rng = np.random.default_rng(0)
    col = Collator(AnyRefTokenizer(), CFG, train=True)
    # equal-length answers: with differing token counts the micro-mean of
    # the token-averaged lm loss legitimately differs from the pooled mean
    # (same as the reference's per-batch averaging under accumulation)
    insts = [_inst(rng, p) for p in ("a cat", "a dog", "a rat", "a pig")]

    params = anyref.init(jax.random.key(0), CFG, dtype=jnp.float32)
    lcfg = lora_mod.LoraConfig()
    # plain SGD-like transform so updates are exactly linear in gradients
    import optax
    opt = optax.sgd(1e-2)

    # accumulated: 2 micro-batches of 2
    state_a, frozen = step_mod.init_state(jax.random.key(1), params, lcfg, opt)
    step_a = jax.jit(step_mod.make_train_step(CFG, lcfg, opt, remat=False,
                                              grad_accum=2))
    stacked = step_mod.stack_microbatches([col(insts[:2]), col(insts[2:])])
    state_a, m_a = step_a(state_a, frozen, stacked)

    # single big batch of 4
    state_b, _ = step_mod.init_state(jax.random.key(1), params, lcfg, opt)
    step_b = jax.jit(step_mod.make_train_step(CFG, lcfg, opt, remat=False))
    state_b, m_b = step_b(state_b, frozen, step_mod.device_batch(col(insts)))

    # lm loss averages over tokens (micro-mean != big-batch-mean in general
    # when token counts differ) but with identical-shape prompts they match
    a = jax.tree.leaves(state_a.dense)
    b = jax.tree.leaves(state_b.dense)
    for x, y in zip(a, b):
        if x is None:
            continue
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-5)
