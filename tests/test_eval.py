"""Eval harness tests: metric correctness + end-to-end smoke on the tiny
model over the synthetic fixture datasets."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anyref_tpu.config import anyref_tiny
from anyref_tpu.eval.metrics import (f_measure, intersection_and_union,
                                     mask_iou)
from anyref_tpu.eval.caption_metrics import bleu_n, cider_d

from .test_datasets import data_root  # fixture reuse  # noqa: F401


def test_intersection_and_union():
    pred = np.array([[0, 1, 1], [0, 1, 0]])
    gt = np.array([[0, 1, 0], [255, 1, 0]])
    inter, union, tgt = intersection_and_union(pred, gt, K=2)
    # ignore pixel removed; fg: inter 2, pred 3->2 after ignore? pred fg = 3
    assert inter[1] == 2
    assert union[1] == 3  # pred {3 fg} + gt {2 fg} - inter 2 (ignored px maps)


def test_mask_iou_no_object():
    pred = np.full((1, 4, 4), -10.0)  # sigmoid ~ 0
    gt = np.zeros((1, 4, 4))
    assert mask_iou(pred, gt) == pytest.approx(1.0, abs=1e-5)
    gt2 = np.ones((1, 4, 4))
    assert mask_iou(pred, gt2) == pytest.approx(0.0, abs=1e-5)


def test_f_measure_perfect():
    gt = np.zeros((1, 8, 8))
    gt[0, 2:6, 2:6] = 1
    pred = np.where(gt > 0, 10.0, -10.0)
    assert f_measure(pred, gt) > 0.99


def test_caption_metrics():
    hyps = ["a cat on the mat", "a dog"]
    refs = [["a cat on the mat", "the cat sits on a mat"], ["a large dog"]]
    assert bleu_n(hyps, refs, 4) > 0.4
    assert cider_d(hyps, refs) > 0.5
    assert bleu_n(["xyz unrelated"], [["a cat"]], 4) == 0.0


@pytest.mark.slow
def test_eval_referseg_smoke(data_root):  # noqa: F811
    from anyref_tpu.eval.referseg import evaluate_referseg
    from anyref_tpu.eval.runner import Predictor
    from anyref_tpu.models import anyref
    from anyref_tpu.tokenizer import AnyRefTokenizer
    cfg = anyref_tiny()
    params = anyref.init(jax.random.key(0), cfg, dtype=jnp.float32)
    tok = AnyRefTokenizer()
    pred = Predictor(params, cfg, max_new_tokens=4, prompt_buckets=(384,))
    out = evaluate_referseg(pred, tok, data_root, "refcoco_val",
                            out_root=os.path.join(data_root, "eval_out"))
    r = out["refcoco_val"]
    assert 0.0 <= r["ciou"] <= 1.0 and r["n"] == 1
    assert os.path.exists(os.path.join(data_root, "eval_out", "refcoco",
                                       "val", "result.txt"))


@pytest.mark.slow
def test_eval_avs_smoke(data_root):  # noqa: F811
    from anyref_tpu.eval.harnesses import evaluate_avs
    from anyref_tpu.eval.runner import Predictor
    from anyref_tpu.models import anyref
    from anyref_tpu.tokenizer import AnyRefTokenizer
    cfg = anyref_tiny()
    params = anyref.init(jax.random.key(1), cfg, dtype=jnp.float32)
    pred = Predictor(params, cfg, max_new_tokens=4, prompt_buckets=(384,))
    # fixture has only a train split; reuse it as "test" shape-wise
    r = evaluate_avs(pred, AnyRefTokenizer(), data_root, task="object",
                     split="train",
                     out_root=os.path.join(data_root, "eval_out"))
    assert 0.0 <= r["miou"] <= 1.0 and r["n"] == 1


def test_meteor():
    from anyref_tpu.eval.caption_metrics import meteor
    # identical sentence: P=R=1, one chunk -> penalty 0.5*(1/m)^3 tiny
    s = "the quick brown fox jumps"
    assert meteor([s], [[s]]) > 0.99
    # hand-checked: hyp "the cat sat", ref "the cat sat down":
    # m=3, chunks=1, P=1, R=3/4, Fmean=.75/(.9+.25*.1*... ) ->
    # Fmean = (1*.75)/(.9*1+.1*.75)=0.76923, pen=.5*(1/3)^3=.01852
    got = meteor(["the cat sat"], [["the cat sat down"]])
    assert abs(got - 0.76923 * (1 - 0.0185185)) < 1e-4
    # stem module: "jumping" matches "jumps" via Porter stem
    assert meteor(["the fox jumping"], [["the fox jumps"]]) > \
        meteor(["the fox leapt"], [["the fox jumps"]])
    # disorder penalized: same unigrams, scrambled order -> more chunks
    assert meteor(["fox the jumps"], [["the fox jumps"]]) < \
        meteor(["the fox jumps"], [["the fox jumps"]])
    assert meteor(["zzz"], [["the fox"]]) == 0.0


def test_spice():
    from anyref_tpu.eval.caption_metrics import spice
    s = "a red cat on the mat"
    assert spice([s], [[s]]) == 1.0
    partial = spice(["a red cat"], [["a red cat on the mat"]])
    assert 0.0 < partial < 1.0
    assert spice(["blue dog"], [["a red cat"]]) == 0.0
    # attribute binding: "red cat" tuple matches only when adjacent
    bound = spice(["red cat"], [["red cat"]])
    unbound = spice(["red mat cat"], [["red cat"]])
    assert bound > unbound
    # relation triples are directional: same bag of words, flipped
    # prepositional roles -> (cat, on, mat) vs (mat, on, cat) don't match
    assert spice(["cat on the mat"], [["cat on the mat"]]) == 1.0
    assert spice(["mat on the cat"], [["cat on the mat"]]) < 1.0


def test_refer_inv_reports_all_metric_families():
    """evaluate_refer_inverse result carries all four pycocoevalcap families
    (reference eval_refer_inv.py:204-211)."""
    import inspect
    from anyref_tpu.eval import harnesses
    src = inspect.getsource(harnesses.evaluate_refer_inverse)
    # the SPICE family is emitted as "spice": scene-graph tuple F1 via
    # the native caption parser (eval/scene_graph.py)
    for key in ("bleu4", "cider", "meteor", "spice"):
        assert key in src


@pytest.mark.slow
def test_eval_reason_smoke(data_root):  # noqa: F811
    from anyref_tpu.eval.harnesses import evaluate_reason
    from anyref_tpu.eval.runner import Predictor
    from anyref_tpu.models import anyref
    from anyref_tpu.tokenizer import AnyRefTokenizer
    cfg = anyref_tiny()
    params = anyref.init(jax.random.key(2), cfg, dtype=jnp.float32)
    pred = Predictor(params, cfg, max_new_tokens=4, prompt_buckets=(384,))
    out_root = os.path.join(data_root, "eval_out_reason")
    r = evaluate_reason(pred, AnyRefTokenizer(), data_root, out_root)
    assert 0.0 <= r["ciou"] <= 1.0 and r["n"] == 1
    assert os.path.exists(os.path.join(out_root, "reason", "val",
                                       "result.txt"))


@pytest.mark.slow
def test_eval_coco20i_smoke(data_root):  # noqa: F811
    """COCO-20i harness end-to-end on split 0 (reference eval_coco20i.py):
    query from the FSS list, support crop from the prebuilt index,
    qualitative dumps on."""
    from anyref_tpu.eval.harnesses import evaluate_coco20i
    from anyref_tpu.eval.runner import Predictor
    from anyref_tpu.models import anyref
    from anyref_tpu.tokenizer import AnyRefTokenizer
    cfg = anyref_tiny()
    params = anyref.init(jax.random.key(3), cfg, dtype=jnp.float32)
    pred = Predictor(params, cfg, max_new_tokens=4, prompt_buckets=(384,))
    out_root = os.path.join(data_root, "eval_out_20i")
    r = evaluate_coco20i(pred, AnyRefTokenizer(), data_root, out_root,
                         splits=(0,), limit=1)
    assert 0.0 <= r[0]["ciou"] <= 1.0 and r[0]["n"] == 1
    assert os.path.exists(os.path.join(out_root, "coco20i", "0",
                                       "result.txt"))


@pytest.mark.slow
def test_eval_refer_inverse_smoke(data_root):  # noqa: F811
    """Region-caption inverse harness end-to-end: crop reference in, caption
    out, all four pycocoevalcap metric families reported and the result
    file appended (reference eval_refer_inv.py:183-211)."""
    import math
    from anyref_tpu.eval.harnesses import evaluate_refer_inverse
    from anyref_tpu.eval.runner import Predictor
    from anyref_tpu.models import anyref
    from anyref_tpu.tokenizer import AnyRefTokenizer
    cfg = anyref_tiny()
    params = anyref.init(jax.random.key(4), cfg, dtype=jnp.float32)
    pred = Predictor(params, cfg, max_new_tokens=4, prompt_buckets=(384,))
    out_root = os.path.join(data_root, "eval_out_inv")
    r = evaluate_refer_inverse(pred, AnyRefTokenizer(), data_root, "refcoco",
                               split="val", out_root=out_root, limit=1)
    assert r["n"] == 1
    for key in ("bleu4", "cider", "meteor", "spice"):
        v = r[key]
        assert math.isnan(v) or 0.0 <= v <= 10.0, (key, v)
    assert os.path.exists(os.path.join(out_root, "refcoco", "val",
                                       "inv_result.txt"))
