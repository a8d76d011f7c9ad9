#!/usr/bin/env python
"""AVSBench GT-mask refinement via SAM box prompting (reference
convert_avs_masks.py:1-70): for each GT mask, prompt SAM with the mask's
bbox; keep SAM's mask when IoU >= 0.75."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def jaccard(a, b):
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return inter / union if union else 0.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sam_ckpt", default="SAM/sam_vit_h_4b8939.pth")
    p.add_argument("--avs_root", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--iou_threshold", type=float, default=0.75)
    args = p.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from anyref_tpu import checkpoint, convert
    from anyref_tpu.config import SamConfig
    from anyref_tpu.data.base import load_image_rgb, mask_to_xyxy
    from anyref_tpu.models.sam.predictor import SamPredictor

    cfg = SamConfig.vit_h()
    sd = checkpoint._load_torch_state_dict(args.sam_ckpt)
    params = convert.convert_sam(sd, cfg, dtype=jnp.bfloat16)
    predictor = SamPredictor(params, cfg)

    mask_root = os.path.join(args.avs_root, "s4_data/gt_masks", args.split)
    img_root = os.path.join(args.avs_root,
                            "s4_data/visual_frames_original_resolution",
                            args.split)
    out_root = os.path.join(args.avs_root, "s4_data/gt_masks_sam", args.split)
    n_kept = n_total = 0
    for cat in sorted(os.listdir(mask_root)):
        for vid in sorted(os.listdir(os.path.join(mask_root, cat))):
            for frame in sorted(os.listdir(os.path.join(mask_root, cat, vid))):
                gt_path = os.path.join(mask_root, cat, vid, frame)
                # frames and masks share names ({video}_{i}.png, reference
                # utils/avsbench.py:130-133)
                img_path = os.path.join(img_root, cat, vid, frame)
                if not os.path.exists(img_path):
                    print(f"WARNING: no frame for mask {gt_path}, skipped")
                    continue
                with Image.open(gt_path) as im:
                    gt = (np.asarray(im.convert("1")) > 0)
                if gt.sum() == 0:
                    continue
                image = load_image_rgb(img_path)
                predictor.set_image(image)
                box = mask_to_xyxy(gt.astype(np.uint8))
                masks, iou_pred, _ = predictor.predict(
                    box=box, multimask_output=True)
                best = max(range(masks.shape[0]),
                           key=lambda i: jaccard(masks[i], gt))
                n_total += 1
                if jaccard(masks[best], gt) >= args.iou_threshold:
                    n_kept += 1
                    out_path = os.path.join(out_root, cat, vid, frame)
                    os.makedirs(os.path.dirname(out_path), exist_ok=True)
                    Image.fromarray(
                        masks[best].astype(np.uint8) * 255).save(out_path)
    print(f"refined {n_kept}/{n_total} masks (IoU >= {args.iou_threshold})")


if __name__ == "__main__":
    main()
