"""Interactive SAM predictor: cached-embedding point/box prompting
(reference model/segment_anything/predictor.py:16-285).

Used by the AVS ground-truth refinement tool (reference
convert_avs_masks.py:13-65). set_image encodes once (jitted); predict reuses
the cached embedding for any number of prompts.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...config import SamConfig
from ...ops.resize import get_preprocess_shape, postprocess_masks_np, \
    resize_bilinear_np
from .. import sam as sam_mod
from . import mask_decoder, prompt_encoder


class SamPredictor:
    def __init__(self, params: dict, cfg: SamConfig):
        self.params = params
        self.cfg = cfg
        self._encode = jax.jit(functools.partial(sam_mod.encode_image,
                                                 cfg=cfg))
        self._decode = jax.jit(functools.partial(self._decode_impl),
                               static_argnums=(3,))
        self._embedding = None
        self._orig_hw = None
        self._input_hw = None

    def set_image(self, image_rgb_u8: np.ndarray) -> None:
        """Resize longest side, normalize/pad, run the ViT encoder once."""
        h, w = image_rgb_u8.shape[:2]
        nh, nw = get_preprocess_shape(h, w, self.cfg.image_size)
        x = resize_bilinear_np(
            image_rgb_u8.astype(np.float32).transpose(2, 0, 1), nh, nw)
        x = _preprocess_unpadded(jnp.asarray(x)[None], self.cfg, nh, nw)
        self._embedding = self._encode(self.params, x)
        self._orig_hw = (h, w)
        self._input_hw = (nh, nw)

    def _decode_impl(self, sparse, dense, embedding, multimask: bool):
        pe = prompt_encoder.dense_pe(self.params["prompt_encoder"], self.cfg)
        return mask_decoder.apply(
            self.params["mask_decoder"], self.cfg,
            jnp.broadcast_to(embedding, (sparse.shape[0], *embedding.shape[1:])),
            pe.astype(embedding.dtype), sparse.astype(embedding.dtype),
            dense.astype(embedding.dtype), multimask)

    def _transform_coords(self, coords: np.ndarray) -> np.ndarray:
        oh, ow = self._orig_hw
        nh, nw = self._input_hw
        out = coords.astype(np.float32).copy()
        out[..., 0] *= nw / ow
        out[..., 1] *= nh / oh
        return out

    def predict(self, point_coords: Optional[np.ndarray] = None,
                point_labels: Optional[np.ndarray] = None,
                box: Optional[np.ndarray] = None,
                multimask_output: bool = True):
        """Returns (masks [K, H, W] bool at original size, iou_pred [K],
        low_res_logits [K, 256, 256])."""
        assert self._embedding is not None, "call set_image first"
        pr = self.params["prompt_encoder"]
        sparse_parts = []
        if point_coords is not None:
            pts = self._transform_coords(np.asarray(point_coords))[None]
            lbl = np.asarray(point_labels, np.float32)[None]
            sparse_parts.append(prompt_encoder.embed_points(
                pr, self.cfg, jnp.asarray(pts), jnp.asarray(lbl),
                pad=box is None))
        if box is not None:
            b = self._transform_coords(np.asarray(box).reshape(2, 2)).reshape(1, 4)
            sparse_parts.append(prompt_encoder.embed_boxes(
                pr, self.cfg, jnp.asarray(b)))
        sparse = jnp.concatenate(sparse_parts, axis=1)
        dense = prompt_encoder.no_mask_dense(pr, self.cfg, 1)
        low_res, iou = self._decode(sparse, dense, self._embedding,
                                    multimask_output)
        low_res = np.asarray(low_res, np.float32)[0]            # [K, 4g, 4g]
        canvas = resize_bilinear_np(low_res, self.cfg.image_size,
                                    self.cfg.image_size)
        masks = postprocess_masks_np(canvas, self._input_hw, self._orig_hw)
        return masks > 0.0, np.asarray(iou)[0], low_res


def _preprocess_unpadded(x, cfg, nh, nw):
    """Normalize + pad a [1, 3, nh, nw] image to the square frame."""
    from ...config import SAM_PIXEL_MEAN, SAM_PIXEL_STD
    mean = jnp.asarray(SAM_PIXEL_MEAN, x.dtype).reshape(-1, 1, 1)
    std = jnp.asarray(SAM_PIXEL_STD, x.dtype).reshape(-1, 1, 1)
    x = (x - mean) / std
    return jnp.pad(x, ((0, 0), (0, 0), (0, cfg.image_size - nh),
                       (0, cfg.image_size - nw)))
