"""Remaining eval harnesses: ReasonSeg, COCO-20i, AVSBench, region-caption
inverse (reference eval_reason.py, eval_coco20i.py, eval_avs_object.py,
eval_refer_inv.py)."""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from ..data.collator import Collator
from ..data.loader import DataLoader
from .caption_metrics import bleu_n, cider_d, meteor, spice
from .metrics import f_measure, mask_iou
from .referseg import evaluate_segmentation
from .runner import Predictor


def evaluate_reason(predictor: Predictor, tokenizer, data_root: str,
                    out_root: str = "eval_out",
                    limit: Optional[int] = None) -> dict:
    """ReasonSeg val cIoU/gIoU (reference eval_reason.py:139-159)."""
    from ..data.reason import ReasonSeg
    ds = ReasonSeg(os.path.join(data_root, "reason"), split="val")
    ds.cfg = predictor.cfg
    out_dir = os.path.join(out_root, "reason", "val")
    return evaluate_segmentation(predictor, ds, tokenizer, out_dir=out_dir,
                                 limit=limit)


def evaluate_coco20i(predictor: Predictor, tokenizer, data_root: str,
                     out_root: str = "eval_out", splits=(0, 1, 2, 3),
                     limit: int = 101) -> dict:
    """COCO-20i one-shot eval, capped at 101 samples per split like the
    reference smoke-eval pattern (eval_coco20i.py:207-208)."""
    from ..data.coco20i import Coco20i
    results = {}
    for split in splits:
        ds = Coco20i(
            os.path.join(data_root, "coco/train2017"),
            os.path.join(data_root, "coco/annotations/instances_train2017.json"),
            os.path.join(data_root, "samples_0.05_0.25.json"),
            os.path.join(data_root, "coco_20i/lists/coco/fss_list"),
            split=split, mode="val")
        ds.cfg = predictor.cfg
        out_dir = os.path.join(out_root, "coco20i", str(split))
        results[split] = evaluate_segmentation(
            predictor, ds, tokenizer, out_dir=out_dir, limit=limit,
            save_qualitative=True)
        print(f"coco20i split {split}: {results[split]}")
    return results


def evaluate_avs(predictor: Predictor, tokenizer, data_root: str,
                 task: str = "object", split: str = "test",
                 out_root: str = "eval_out",
                 limit: Optional[int] = None) -> dict:
    """AVSBench mIoU + F-measure in 5-frame video groups (reference
    eval_avs_object.py:137-192)."""
    from ..data.avs import AVSMulti, AVSObject
    if task == "object":
        ds = AVSObject(os.path.join(data_root, "avsbench/Single-source"),
                       split=split)
    else:
        ds = AVSMulti(os.path.join(data_root, "avsbench/Multi-sources"),
                      split=split)
    ds.cfg = predictor.cfg
    col = Collator(tokenizer, predictor.cfg, train=False)
    loader = DataLoader(ds, col, batch_size=1, num_workers=4)

    miou_vals = []
    fscores = []
    group_pred, group_gt = [], []
    group_video = None
    seen = 0

    def flush_group():
        # Reference eval_avs_object.py:171-180 scores strictly 5-frame video
        # groups; partial groups (limit truncation / trailing flush) are
        # dropped, not scored (ADVICE r2).
        if len(group_pred) < 5:
            group_pred.clear()
            group_gt.clear()
            return
        hs = min(p.shape[0] for p in group_pred)
        ws = min(p.shape[1] for p in group_pred)
        fscores.append(f_measure(
            np.stack([p[:hs, :ws] for p in group_pred]),
            np.stack([g[:hs, :ws] for g in group_gt])))
        group_pred.clear()
        group_gt.clear()

    for batch in loader:
        _, masks = predictor.predict(batch)
        gt = batch["_orig_masks"][0]
        if gt is None:
            continue
        gt = gt[0].astype(np.float32)
        h, w = gt.shape
        logits = (masks[0][0] if masks[0] is not None
                  else np.full((h, w), -10.0, np.float32))
        miou_vals.append(mask_iou(logits[None], gt[None]))
        # F-measure groups are per VIDEO (reference eval_avs_object.py:171-180
        # relies on 5-frames-per-video loader order). Grouping on the video id
        # assumes each video's frames arrive contiguously (eval loaders are
        # unshuffled); a shuffled loader would fragment videos into sub-5
        # runs, which flush_group drops rather than mis-scores.
        video = batch["_meta"][0].get("video_name")
        if group_pred and video != group_video:
            flush_group()
        group_video = video
        group_pred.append(logits)
        group_gt.append(gt)
        seen += 1
        if limit is not None and seen >= limit:
            break
    flush_group()
    result = {"miou": float(np.mean(miou_vals)) if miou_vals else 0.0,
              "fscore": float(np.mean(fscores)) if fscores else 0.0,
              "n": seen}
    out_dir = os.path.join(out_root, f"avs_{task}")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "avs_result.txt"), "a") as f:
        f.write(json.dumps(result) + "\n")
    return result


def evaluate_refer_inverse(predictor: Predictor, tokenizer, data_root: str,
                           dataset: str = "refcocog", split: str = "val",
                           roi: bool = False, out_root: str = "eval_out",
                           limit: Optional[int] = None) -> dict:
    """Region-caption inverse eval: generate descriptions from reference
    crops, score BLEU-4 / CIDEr-D against the refs' sentences (reference
    eval_refer_inv.py:183-211; pycocoevalcap replaced by native scorers)."""
    from ..data.refcoco import RefCocoValInverse
    ds = RefCocoValInverse(data_root, dataset, split=split, roi=roi)
    ds.cfg = predictor.cfg
    col = Collator(tokenizer, predictor.cfg, train=False, roi=roi)
    loader = DataLoader(ds, col, batch_size=1, num_workers=4)
    hyps, refs = [], []
    seen = 0
    for batch in loader:
        output_ids, _ = predictor.predict(batch)
        text = tokenizer.decode(
            [t for t in output_ids[0].tolist() if t != 2], skip_special=True)
        text = text.strip().rstrip(".").strip()
        hyps.append(text)
        gts = batch["_meta"][0]["sentence"]
        refs.append(gts if isinstance(gts, list) else [gts])
        seen += 1
        if limit is not None and seen >= limit:
            break
    # all four pycocoevalcap families (reference eval_refer_inv.py:204-211);
    # meteor/spice need nltk's PorterStemmer — degrade to NaN if absent
    # rather than failing the whole eval (ADVICE r2)
    try:
        met, spc = meteor(hyps, refs), spice(hyps, refs)
    except ImportError:
        import warnings
        warnings.warn("nltk unavailable: meteor/spice reported as NaN")
        met = spc = float("nan")
    # spice = scene-graph tuple F1 via the native caption parser
    # (eval/scene_graph.py), the same extraction+scoring family as the
    # reference's Java SPICE (eval_refer_inv.py:204-211); WordNet synonym
    # matching activates automatically when the corpus is installed
    result = {"bleu4": bleu_n(hyps, refs, 4), "cider": cider_d(hyps, refs),
              "meteor": met, "spice": spc,
              "n": seen}
    out_dir = os.path.join(out_root, dataset, split)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "inv_result.txt"), "a") as f:
        f.write(json.dumps(result) + "\n")
    return result
