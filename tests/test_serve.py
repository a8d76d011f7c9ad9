"""Serving runtime smoke: micro-batched requests through the tiny model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anyref_tpu.config import anyref_tiny
from anyref_tpu.models import anyref
from anyref_tpu.serve import Request, Server


@pytest.mark.slow
def test_server_roundtrip():
    cfg = anyref_tiny()
    params = anyref.init(jax.random.key(0), cfg, dtype=jnp.float32)
    server = Server(params, cfg, max_batch=2, max_wait_ms=200.0)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (60, 80, 3), np.uint8)
    reqs = [server.submit(Request(image=img, text="the cat"))
            for _ in range(2)]
    results = [r.result(timeout=600) for r in reqs]
    for res in results:
        assert "error" not in res, res
        assert res["mask"].shape == (60, 80)
        assert isinstance(res["text"], str)
    server.shutdown()
