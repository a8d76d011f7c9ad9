"""Batch collator: dataset dicts -> fixed-shape numpy batches.

Replaces the reference ``DataCollector`` (utils/coco_instance.py:39-243).
Differences forced by TPU static shapes:
  * input_ids/labels pad to ``max_text_len`` (right padding; the reference
    pads to the batch max);
  * gt masks pack to a fixed per-sample budget [B, S, 1024, 1024] on the SAM
    canvas with a validity mask, instead of ragged per-sample lists;
  * prompt-only batches are built directly from the question (the reference
    re-truncates the full conversation at the 2nd ':' token,
    utils/coco_instance.py:121-126 — same result by construction);
  * RoI mode substitutes the normalized gt bbox for the reference crop
    (reference utils/coco_instance.py:90-96).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..config import IGNORE_INDEX, AnyRefConfig
from ..tokenizer import (PAD_ID, AnyRefTokenizer, tokenize_conversation,
                         tokenize_prompt)
from .preprocess import mask_to_canvas_np


class Collator:
    def __init__(self, tokenizer: AnyRefTokenizer, cfg: AnyRefConfig,
                 train: bool = True, roi: bool = False):
        self.tok = tokenizer
        self.cfg = cfg
        self.train = train
        self.roi = roi

    def __call__(self, instances: Sequence[Dict]) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        B = len(instances)
        T = cfg.max_text_len
        S = cfg.max_seg_per_sample

        input_ids = np.full((B, T), PAD_ID, np.int32)
        labels = np.full((B, T), IGNORE_INDEX, np.int32)
        prompt_lens = np.zeros((B,), np.int32)
        clip_images = np.stack([inst["clip_image"] for inst in instances])
        sam_images = np.stack([inst["sam_image"] for inst in instances])
        sizes = np.asarray([inst["sam_resized_size"] for inst in instances],
                           np.int32)

        gt_masks = np.zeros((B, S, cfg.sam.image_size, cfg.sam.image_size),
                            np.float32)
        mask_valid = np.zeros((B, S), bool)
        has_ref = any("ref_image" in i or "ref_bbox" in i for i in instances)
        has_audio = any("audio_mels" in i for i in instances)
        ref_images = None
        ref_valid = np.zeros((B,), bool)
        audio_mels = None
        audio_valid = np.zeros((B,), bool)
        if has_ref and not self.roi:
            ref_images = np.zeros((B, 3, cfg.clip.image_size, cfg.clip.image_size),
                                  np.float32)
        roi_boxes = np.zeros((B, 4), np.float32) if self.roi else None
        if has_audio and cfg.audio is not None:
            a = cfg.audio
            audio_mels = np.zeros((B, a.clips_per_audio, 1, a.mel_bins,
                                   a.target_len), np.float32)

        orig_masks: List[Optional[np.ndarray]] = []
        meta = []
        for b, inst in enumerate(instances):
            if self.train:
                tc = tokenize_conversation(self.tok, inst["question"],
                                           inst["answer"])
                ids, labs = tc.input_ids, tc.labels
                prompt_lens[b] = tc.prompt_len
            else:
                ids = tokenize_prompt(self.tok, inst["question"])
                labs = np.full_like(ids, IGNORE_INDEX)
                prompt_lens[b] = len(ids)
            # truncation guard (the reference asserts total length,
            # utils/coco_instance.py:221-222): silently cutting the tail
            # would break the splice when <image> is lost, and at eval
            # would record prompt_lens[b] = len(ids) > stored tokens —
            # Predictor.predict then slices ids[b, :prompt_lens[b]] past
            # the buffer (shape-mismatch crash) or feeds a prompt cut off
            # before "ASSISTANT:" (garbage generations)
            if len(ids) > T:
                raise ValueError(
                    f"conversation/prompt is {len(ids)} tokens > "
                    f"max_text_len {T}; raise cfg.max_text_len or shorten "
                    f"the prompt")
            n = len(ids)
            input_ids[b, :n] = ids
            labels[b, :n] = labs

            masks = inst.get("gt_masks")
            if masks is not None:
                for s in range(min(len(masks), S)):
                    gt_masks[b, s] = mask_to_canvas_np(
                        masks[s], tuple(sizes[b]), cfg.sam.image_size)
                    mask_valid[b, s] = True
                orig_masks.append(np.asarray(masks))
            else:
                orig_masks.append(None)

            if self.roi and "ref_bbox" in inst:
                roi_boxes[b] = inst["ref_bbox"]
                ref_valid[b] = True
            elif ref_images is not None and "ref_image" in inst:
                ref_images[b] = inst["ref_image"]
                ref_valid[b] = True
            if audio_mels is not None and "audio_mels" in inst:
                audio_mels[b] = inst["audio_mels"]
                audio_valid[b] = True

            meta.append({k: inst.get(k) for k in
                         ("file_name", "height", "width", "image_id",
                          "gt_classes", "sentence", "video_name",
                          "orig_ref_img")})

        batch = {
            "input_ids": input_ids,
            "labels": labels,
            "prompt_lens": prompt_lens,
            "clip_images": clip_images,
            "sam_images": sam_images,
            "sam_resized_sizes": sizes,
            "gt_masks": gt_masks,
            "mask_valid": mask_valid,
        }
        if ref_images is not None:
            batch["ref_images"] = ref_images
            batch["ref_valid"] = ref_valid
        if roi_boxes is not None and ref_valid.any():
            batch["roi_boxes"] = roi_boxes
            batch["ref_valid"] = ref_valid
        if audio_mels is not None:
            batch["audio_mels"] = audio_mels
            batch["audio_valid"] = audio_valid
        # host-side extras for eval (not fed into jit)
        batch["_orig_masks"] = orig_masks
        batch["_meta"] = meta
        return batch
