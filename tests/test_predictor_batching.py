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


def test_predictor_frees_originals_during_serving_conversion():
    """The serving-layout conversion frees each untransposed weight as it
    goes so peak HBM stays within one extra projection (llama.py:83-85).
    Predictor.__init__ must not hold a flat leaf list (or any other strong
    reference) across that conversion: at 7B the pinned originals are the
    whole 13 GiB decoder, and the transpose RESOURCE_EXHAUSTs a 16 GiB chip
    (observed on v5e; this guards the fix)."""
    import gc
    import weakref

    from anyref_tpu.models import llama as llama_mod

    params = anyref.init(jax.random.key(0), CFG, dtype=jnp.float32)
    refs = []
    for layer in params["llama"]["layers"]:
        for grp in ("attn", "mlp"):
            for k in layer[grp]:
                if "w" in layer[grp][k]:
                    refs.append(weakref.ref(layer[grp][k]["w"]))
    assert refs

    real = llama_mod.transpose_for_serving
    alive_after = {}

    def wrapped(p):
        out = real(p)
        # still INSIDE Predictor.__init__: any constructor-local strong
        # reference (e.g. a jax.tree.leaves list) keeps these alive here
        gc.collect()
        alive_after["n"] = sum(r() is not None for r in refs)
        return out

    llama_mod.transpose_for_serving = wrapped
    try:
        Predictor(params, CFG, speculative=True, max_new_tokens=4)
    finally:
        llama_mod.transpose_for_serving = real

    assert alive_after["n"] == 0, (
        f"{alive_after['n']}/{len(refs)} original decoder weights still "
        "alive during the serving conversion - Predictor.__init__ is "
        "pinning them")
