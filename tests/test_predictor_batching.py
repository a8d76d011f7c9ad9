"""Batched Predictor (left-pad + batch bucketing) must reproduce per-sample
predictions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anyref_tpu.config import anyref_tiny
from anyref_tpu.data.collator import Collator
from anyref_tpu.eval.runner import Predictor
from anyref_tpu.models import anyref
from anyref_tpu.tokenizer import AnyRefTokenizer, seg_question

CFG = anyref_tiny()


def _inst(rng, phrase):
    return {
        "clip_image": rng.standard_normal((3, 224, 224)).astype(np.float32),
        "sam_image": rng.standard_normal(
            (3, CFG.sam.image_size, CFG.sam.image_size)).astype(np.float32),
        "sam_resized_size": (CFG.sam.image_size, CFG.sam.image_size * 3 // 4),
        "question": seg_question(phrase), "answer": None, "gt_masks": None,
        "height": 40, "width": 30, "file_name": "x",
    }


@pytest.mark.slow
def test_batched_predictor_matches_single():
    rng = np.random.default_rng(0)
    params = anyref.init(jax.random.key(0), CFG, dtype=jnp.float32)
    col = Collator(AnyRefTokenizer(), CFG, train=False)
    insts = [_inst(rng, "a cat"), _inst(rng, "the small dog in the corner")]

    pred = Predictor(params, CFG, max_new_tokens=6, prompt_buckets=(385,),
                     batch_buckets=(1, 2))
    ids_b, masks_b = pred.predict(col(insts))

    for i, inst in enumerate(insts):
        ids_s, masks_s = pred.predict(col([inst]))
        np.testing.assert_array_equal(ids_b[i], ids_s[0])
        if masks_s[0] is None:
            assert masks_b[i] is None
        else:
            np.testing.assert_allclose(masks_b[i], masks_s[0],
                                       rtol=5e-3, atol=5e-3)
