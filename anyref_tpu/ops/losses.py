"""Mask losses (reference model/anyref.py:19-68), static-shape TPU variants.

The reference iterates python loops over per-sample variable numbers of masks
(anyref.py:432-446). Here masks are packed to a fixed budget [B, S, H, W] with
a validity mask [B, S]; losses reduce with the same normalization:

  per-sample: loss_b = sum_over_masks(per_mask) / n_masks_b   (num_masks arg)
  batch:      sum_b(loss_b * n_masks_b) / (sum_b n_masks_b + 1e-8)
            = sum over all valid masks(per_mask) / (total + 1e-8)

i.e. the double normalization cancels to a flat mean over valid masks; we
compute it that way (exact same value, one reduction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_loss(pred_logits: jax.Array, targets: jax.Array,
              valid: jax.Array) -> jax.Array:
    """DICE loss (reference anyref.py:19-47): per mask
    1 - (2*sum(p*t)+1)/(sum(p)+sum(t)+1), p=sigmoid(logits), mean over valid.

    pred_logits, targets: [N, H, W] fp32; valid: [N] bool/float.
    """
    p = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    num = 2.0 * jnp.sum(p * t, axis=(-2, -1))
    den = jnp.sum(p, axis=(-2, -1)) + jnp.sum(t, axis=(-2, -1))
    per_mask = 1.0 - (num + 1.0) / (den + 1.0)
    v = valid.astype(jnp.float32)
    return jnp.sum(per_mask * v) / (jnp.sum(v) + 1e-8)


def sigmoid_ce_loss(pred_logits: jax.Array, targets: jax.Array,
                    valid: jax.Array) -> jax.Array:
    """Per-pixel BCE-with-logits, mean per mask, mean over valid masks
    (reference anyref.py:51-68)."""
    x = pred_logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    # numerically stable bce-with-logits
    per_px = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    per_mask = jnp.mean(per_px, axis=(-2, -1))
    v = valid.astype(jnp.float32)
    return jnp.sum(per_mask * v) / (jnp.sum(v) + 1e-8)


def lm_cross_entropy(logits: jax.Array, labels: jax.Array,
                     ignore_index: int = -100) -> jax.Array:
    """Causal-LM loss: shift-by-one CE averaged over non-ignored targets,
    computed in fp32 (the reference keeps lm_head fp32, train.py:415-416).

    logits: [B, L, V]; labels: [B, L] (already aligned to input positions).
    """
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != ignore_index
    safe = jnp.where(valid, targets, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    tok_logit = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    nll = (logz - tok_logit) * valid.astype(jnp.float32)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
