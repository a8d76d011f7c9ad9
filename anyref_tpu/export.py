"""Ahead-of-time export via jax.export (StableHLO).

TPU-native replacement for the reference's ONNX export
(segment_anything/utils/onnx.py:17-157, export script scripts-style): the
SAM mask decoder is exported as a serialized StableHLO artifact that any
PJRT runtime can load and run without Python model code, with the same
single-tensor prompt interface as the reference's SamOnnxModel:

  (image_embedding [1, C, g, g], point_coords [1, N, 2], point_labels [1, N])
      -> (low_res_masks [1, K, 4g, 4g], iou_predictions [1, K])

point_labels follow the ONNX wrapper's convention (onnx.py:68-86):
  -1 = padding point, 0 = negative, 1 = positive,
  2 / 3 = top-left / bottom-right box corner.

``export_generate`` additionally exports the full AnyRef generate step
(the driver-checked jittable surface) for deployment runtimes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import AnyRefConfig, SamConfig
from .models.sam import mask_decoder, prompt_encoder


def sam_decoder_fn(params: dict, cfg: SamConfig, multimask: bool = True):
    """Build the exportable decoder callable (reference onnx.py:37-117)."""

    def fn(embedding, point_coords, point_labels):
        pr = params["prompt_encoder"]
        coords = point_coords + 0.5
        norm = coords / jnp.asarray(
            [cfg.image_size, cfg.image_size], jnp.float32)
        pe = prompt_encoder._pe_encode(pr["pe_gaussian"], norm)
        lab = point_labels[..., None]
        pe = jnp.where(lab == -1, 0.0, pe)
        pe = pe + jnp.where(lab == -1, pr["not_a_point_embed"][0], 0.0)
        pe = pe + jnp.where(lab == 0, pr["point_embeddings"][0][0], 0.0)
        pe = pe + jnp.where(lab == 1, pr["point_embeddings"][1][0], 0.0)
        pe = pe + jnp.where(lab == 2, pr["point_embeddings"][2][0], 0.0)
        pe = pe + jnp.where(lab == 3, pr["point_embeddings"][3][0], 0.0)
        dense = prompt_encoder.no_mask_dense(pr, cfg, 1)
        dpe = prompt_encoder.dense_pe(pr, cfg)
        low_res, iou = mask_decoder.apply(
            params["mask_decoder"], cfg, embedding,
            dpe.astype(embedding.dtype), pe.astype(embedding.dtype),
            dense.astype(embedding.dtype), multimask)
        return low_res, iou

    return fn


def export_sam_decoder(params: dict, cfg: SamConfig, path: str,
                       num_points: int = 5, multimask: bool = True,
                       platform: str | None = None) -> None:
    """Serialize the decoder to ``path`` as StableHLO bytes."""
    from jax import export as jexport

    g = cfg.embedding_size
    dt = jax.tree.leaves(params["mask_decoder"])[0].dtype
    specs = (
        jax.ShapeDtypeStruct((1, cfg.prompt_embed_dim, g, g), dt),
        jax.ShapeDtypeStruct((1, num_points, 2), jnp.float32),
        jax.ShapeDtypeStruct((1, num_points), jnp.float32),
    )
    fn = jax.jit(sam_decoder_fn(params, cfg, multimask))
    exp = jexport.export(
        fn, platforms=[platform] if platform else None)(*specs)
    with open(path, "wb") as f:
        f.write(exp.serialize())


def export_generate(params: dict, cfg: AnyRefConfig, path: str,
                    prompt_len: int = 129, max_new_tokens: int = 32,
                    platform: str | None = None) -> None:
    """Export the full jitted generate step (ids+images -> ids+mask logits)."""
    from jax import export as jexport

    from .models import anyref

    def fn(input_ids, clip_images, sam_images):
        out = anyref.generate(params, cfg,
                              {"input_ids": input_ids,
                               "clip_images": clip_images,
                               "sam_images": sam_images},
                              max_new_tokens=max_new_tokens)
        return out.output_ids, out.low_res_masks, out.seg_valid

    specs = (
        jax.ShapeDtypeStruct((1, prompt_len), jnp.int32),
        jax.ShapeDtypeStruct((1, 3, cfg.clip.image_size,
                              cfg.clip.image_size), jnp.float32),
        jax.ShapeDtypeStruct((1, 3, cfg.sam.image_size,
                              cfg.sam.image_size), jnp.float32),
    )
    exp = jexport.export(
        jax.jit(fn), platforms=[platform] if platform else None)(*specs)
    with open(path, "wb") as f:
        f.write(exp.serialize())


def load_exported(path: str):
    """Deserialize an exported artifact; returns a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call
