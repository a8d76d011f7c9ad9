"""Training-loop correctness probes (the reference's own style: overfit
fixtures, SURVEY.md §4) + checkpoint roundtrip + SamPredictor smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anyref_tpu.config import anyref_tiny
from anyref_tpu.models import anyref
from anyref_tpu.train import lora as lora_mod
from anyref_tpu.train import step as step_mod


CFG = anyref_tiny()


def _batch():
    from anyref_tpu.data.collator import Collator
    from anyref_tpu.tokenizer import AnyRefTokenizer, seg_answer, seg_question
    rng = np.random.default_rng(0)
    col = Collator(AnyRefTokenizer(), CFG, train=True)
    inst = {
        "clip_image": rng.standard_normal((3, 224, 224)).astype(np.float32),
        "sam_image": rng.standard_normal(
            (3, CFG.sam.image_size, CFG.sam.image_size)).astype(np.float32),
        "sam_resized_size": (CFG.sam.image_size, CFG.sam.image_size),
        "question": seg_question("a cat"), "answer": seg_answer("cat"),
        "gt_masks": (rng.random((1, 48, 64)) > 0.5).astype(np.uint8),
        "height": 48, "width": 64, "file_name": "x.jpg",
    }
    batch = col([inst, inst])
    return step_mod.device_batch(batch)


@pytest.mark.slow
def test_overfit_one_batch():
    """Loss must strictly decrease when training repeatedly on one batch
    (mirrors the reference's overfit=True fixtures,
    utils/coco_instance.py:276-277)."""
    params = anyref.init(jax.random.key(0), CFG, dtype=jnp.float32)
    lora_cfg = lora_mod.LoraConfig()
    opt = step_mod.make_optimizer(lr=1e-3, warmup=2, total_steps=50)
    state, frozen = step_mod.init_state(jax.random.key(1), params, lora_cfg,
                                        opt)
    train_step = jax.jit(step_mod.make_train_step(CFG, lora_cfg, opt,
                                                  remat=False))
    batch = _batch()
    losses = []
    for _ in range(12):
        state, metrics = train_step(state, frozen, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no learning: {losses[0]} -> {losses[-1]}"


@pytest.mark.slow
def test_overfit_learns_mask():
    """Close the train->generate->mask learning loop (VERDICT r3 #3): train
    the tiny preset on one referring fixture with a structured GT mask until
    greedy decode emits the supervised '<expr>[SEG].' answer, then run the
    REAL eval path (Predictor -> binary_mask -> evaluate_segmentation) and
    require cIoU >= 0.9 against the overfit ground truth. This is the
    reference's own verification style (utils/coco_instance.py:276-277
    overfit fixtures scored through eval_referseg.py:197-219) as one test:
    data -> loss -> optimizer -> generate -> SAM decode -> metric must all
    point the same direction."""
    from anyref_tpu.data.collator import Collator
    from anyref_tpu.eval.referseg import evaluate_segmentation
    from anyref_tpu.eval.runner import Predictor
    from anyref_tpu.tokenizer import (AnyRefTokenizer, seg_answer,
                                      seg_question, tokenize_prompt)
    import functools

    expr = "the red cat"
    tok = AnyRefTokenizer()
    rng = np.random.default_rng(0)
    gt = np.zeros((40, 56), np.uint8)
    gt[8:32, 16:48] = 1                       # rectangle, ~34% of the frame
    inst = {
        "clip_image": rng.standard_normal((3, 224, 224)).astype(np.float32),
        "sam_image": rng.standard_normal(
            (3, CFG.sam.image_size, CFG.sam.image_size)).astype(np.float32),
        "sam_resized_size": (CFG.sam.image_size, CFG.sam.image_size),
        "question": seg_question(expr), "answer": seg_answer(expr),
        "gt_masks": gt[None],
        "height": 40, "width": 56, "file_name": "x.jpg",
    }
    col_t = Collator(tok, CFG, train=True)
    tbatch = step_mod.device_batch(col_t([inst, inst]))

    params = anyref.init(jax.random.key(0), CFG, dtype=jnp.float32)
    lora_cfg = lora_mod.LoraConfig()
    opt = step_mod.make_optimizer(lr=3e-3, warmup=2, total_steps=2000)
    state, frozen = step_mod.init_state(jax.random.key(1), params, lora_cfg,
                                        opt)
    train_step = jax.jit(step_mod.make_train_step(CFG, lora_cfg, opt,
                                                  remat=False))

    labels = np.asarray(tbatch["labels"][0])
    target_ids = [int(t) for t in labels[labels != -100] if t != 2]
    mnt = len(target_ids) + 2
    gbatch = {
        "input_ids": jnp.asarray(
            np.asarray(tokenize_prompt(tok, seg_question(expr)),
                       np.int32)[None]),
        "clip_images": jnp.asarray(inst["clip_image"][None]),
        "sam_images": jnp.asarray(inst["sam_image"][None]),
    }
    gen_plain = jax.jit(functools.partial(anyref.generate,
                                          max_new_tokens=mnt),
                        static_argnums=(1,))

    def merged_params(state):
        p = lora_mod.merge_params(state.dense, frozen)
        return {**p, "llama": lora_mod.apply(p["llama"], state.lora,
                                             lora_cfg)}

    answer_ok = dice = None
    for step_i in range(500):
        state, metrics = train_step(state, frozen, tbatch)
        dice = float(metrics["dice_loss"])
        if step_i >= 40 and step_i % 25 == 24:
            out = gen_plain(merged_params(state), CFG, gbatch)
            ids = [t for t in np.asarray(out.output_ids)[0].tolist()
                   if t != 2]
            answer_ok = ids == target_ids
            if answer_ok and dice < 0.05:
                break
    assert answer_ok, "greedy decode never reproduced the trained answer"
    assert dice < 0.15, f"mask head did not overfit (dice {dice:.3f})"

    # the REAL eval path: fresh Predictor over the merged weights, 1-sample
    # in-memory dataset, scored by the shared cIoU/gIoU harness
    eval_inst = dict(inst, answer=None)
    pred = Predictor(merged_params(state), CFG, max_new_tokens=mnt,
                     prompt_buckets=(384,))
    result = evaluate_segmentation(pred, [eval_inst], tok, num_workers=0,
                                   progress=False)
    assert result["n"] == 1
    assert result["ciou"] >= 0.9, result


def test_lora_merge_equivalence():
    """apply_lora == merge for the forward path; zero-init B = identity."""
    params = anyref.init(jax.random.key(0), CFG, dtype=jnp.float32)
    lcfg = lora_mod.LoraConfig()
    lp = lora_mod.init(jax.random.key(1), params["llama"], lcfg)
    merged = lora_mod.merge(params["llama"], lp, lcfg)
    # B=0 init: merged weights equal base weights
    np.testing.assert_array_equal(
        np.asarray(merged["layers"][0]["attn"]["q"]["w"]),
        np.asarray(params["llama"]["layers"][0]["attn"]["q"]["w"]))
    # nonzero adapters: merged == applied
    lp["layers"][0]["q"]["b"] = jnp.ones_like(lp["layers"][0]["q"]["b"]) * 0.01
    merged = lora_mod.merge(params["llama"], lp, lcfg)
    applied = lora_mod.apply(params["llama"], lp, lcfg)
    np.testing.assert_allclose(
        np.asarray(merged["layers"][0]["attn"]["q"]["w"]),
        np.asarray(applied["layers"][0]["attn"]["q"]["w"]), rtol=1e-6)


def test_split_merge_roundtrip():
    params = anyref.init(jax.random.key(0), CFG, dtype=jnp.float32)
    dense, frozen = lora_mod.split_trainable(params)
    merged = lora_mod.merge_params(dense, frozen)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(merged)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip(tmp_path):
    from anyref_tpu import checkpoint
    params = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "nested": {"b": jnp.ones((4,), jnp.int32)}}
    checkpoint.save_params(str(tmp_path / "ck"), params)
    back = checkpoint.load_params(str(tmp_path / "ck"))
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(params["a"]))
    np.testing.assert_array_equal(np.asarray(back["nested"]["b"]),
                                  np.asarray(params["nested"]["b"]))


def test_sam_predictor_smoke():
    from anyref_tpu.models import sam as sam_mod
    from anyref_tpu.models.sam.predictor import SamPredictor
    rng = np.random.default_rng(0)
    params = sam_mod.init(jax.random.key(0), CFG.sam, dtype=jnp.float32)
    pred = SamPredictor(params, CFG.sam)
    pred.set_image(rng.integers(0, 255, (96, 128, 3), np.uint8))
    masks, iou, low = pred.predict(box=np.asarray([20, 20, 90, 70]),
                                   multimask_output=True)
    assert masks.shape == (3, 96, 128)
    assert iou.shape == (3,)
    masks1, _, _ = pred.predict(
        point_coords=np.asarray([[40.0, 40.0]]),
        point_labels=np.asarray([1]), multimask_output=False)
    assert masks1.shape == (1, 96, 128)


def test_merge_isolates_containers_from_serving_conversion():
    """Deploying merged params runs the IN-PLACE serving-layout conversion
    (transpose_for_serving/fuse_for_serving pop 'w'/'gate'/'up' from the
    layer param dicts). merge() must hand out fresh containers: apply()
    shares the non-adapted sub-dicts with its input, and without isolation
    the conversion corrupts the trainer's source tree (KeyError 'w' on the
    next step)."""
    from anyref_tpu.models import llama as llama_mod

    params = anyref.init(jax.random.key(0), CFG, dtype=jnp.float32)
    lcfg = lora_mod.LoraConfig()
    lp = lora_mod.init(jax.random.key(1), params["llama"], lcfg)
    merged = lora_mod.merge(params["llama"], lp, lcfg)
    llama_mod.fuse_for_serving(llama_mod.transpose_for_serving(merged))
    layer = params["llama"]["layers"][0]
    assert "w" in layer["attn"]["k"], "conversion leaked into source tree"
    assert "gate" in layer["mlp"] and "w" in layer["mlp"]["gate"]
