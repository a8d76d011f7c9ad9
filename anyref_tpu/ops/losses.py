"""Mask losses (reference model/anyref.py:19-68), static-shape TPU variants.

The reference iterates python loops over per-sample variable numbers of masks
(anyref.py:432-446) at each sample's original resolution. Here masks are
packed to a fixed budget [N, H, W] on the shared SAM canvas with:
  * ``valid``      [N]      — which mask slots are real;
  * ``pixel_mask`` [N, H, W] — which canvas pixels are inside the image
                               (excludes the bottom/right zero padding).

Normalization matches the reference: its double normalization
  sum_b( (sum_masks per_mask / n_b) * n_b ) / (sum_b n_b + 1e-8)
cancels to a flat mean over valid masks, computed here in one reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_loss(pred_logits: jax.Array, targets: jax.Array, valid: jax.Array,
              pixel_mask: jax.Array | None = None) -> jax.Array:
    """DICE loss (reference anyref.py:19-47): per mask
    1 - (2*sum(p*t)+1)/(sum(p)+sum(t)+1), p=sigmoid(logits), mean over valid.
    """
    p = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    if pixel_mask is not None:
        w = pixel_mask.astype(jnp.float32)
        p = p * w
        t = t * w
    num = 2.0 * jnp.sum(p * t, axis=(-2, -1))
    den = jnp.sum(p, axis=(-2, -1)) + jnp.sum(t, axis=(-2, -1))
    per_mask = 1.0 - (num + 1.0) / (den + 1.0)
    v = valid.astype(jnp.float32)
    return jnp.sum(per_mask * v) / (jnp.sum(v) + 1e-8)


def sigmoid_ce_loss(pred_logits: jax.Array, targets: jax.Array,
                    valid: jax.Array,
                    pixel_mask: jax.Array | None = None) -> jax.Array:
    """Per-pixel BCE-with-logits, mean per mask over in-image pixels, mean
    over valid masks (reference anyref.py:51-68)."""
    x = pred_logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    per_px = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if pixel_mask is not None:
        w = pixel_mask.astype(jnp.float32)
        per_mask = jnp.sum(per_px * w, axis=(-2, -1)) / jnp.maximum(
            jnp.sum(w, axis=(-2, -1)), 1.0)
    else:
        per_mask = jnp.mean(per_px, axis=(-2, -1))
    v = valid.astype(jnp.float32)
    return jnp.sum(per_mask * v) / (jnp.sum(v) + 1e-8)


def lm_cross_entropy(logits: jax.Array, labels: jax.Array,
                     ignore_index: int = -100) -> jax.Array:
    """Causal-LM loss: shift-by-one CE averaged over non-ignored targets,
    computed in fp32 (the reference keeps lm_head fp32, train.py:415-416).

    logits: [B, L, V]; labels: [B, L] (aligned to input positions).
    """
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != ignore_index
    safe = jnp.where(valid, targets, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    tok_logit = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    nll = (logz - tok_logit) * valid.astype(jnp.float32)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
