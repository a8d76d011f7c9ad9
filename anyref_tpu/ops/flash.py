"""Pallas TPU flash-attention kernels.

Kernels land here incrementally; `supported_*` gates report what the current
implementation covers, and callers in ops/attention.py fall back to the XLA
oracle otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def supported_relpos(H: int, W: int, head_dim: int) -> bool:
    return False  # Pallas rel-pos kernel lands next


def supported_causal(Lq: int, Lk: int, head_dim: int) -> bool:
    return False  # Pallas causal kernel lands next


def flash_relpos_attention(q, k, v, rel_h_table, rel_w_table, size_hw,
                           interpret: bool = False):
    raise NotImplementedError


def flash_causal_attention(q, k, v, interpret: bool = False):
    raise NotImplementedError
