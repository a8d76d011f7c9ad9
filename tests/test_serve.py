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


def test_shutdown_unblocks_pending_and_rejects_late_submits():
    """shutdown() must drain queues (no caller hangs in result()) and
    post-shutdown submits must fail fast (ADVICE r1, low)."""
    cfg = anyref_tiny()
    params = anyref.init(jax.random.key(0), cfg, dtype=jnp.float32)
    server = Server(params, cfg, max_batch=4, max_wait_ms=50.0)
    server.shutdown()
    req = server.submit(Request(image=np.zeros((8, 8, 3), np.uint8),
                                text="x"))
    res = req.result(timeout=5)
    assert req._done.is_set()
    assert res.get("error") == "server shut down"


def test_callback_invoked_on_error():
    cfg = anyref_tiny()
    params = anyref.init(jax.random.key(0), cfg, dtype=jnp.float32)
    server = Server(params, cfg)
    fired = []
    # request with no modality -> _build_sample raises -> error result
    req = server.submit(Request(image=np.zeros((8, 8, 3), np.uint8),
                                callback=fired.append))
    res = req.result(timeout=30)
    assert "error" in res
    assert fired and "error" in fired[0]
    server.shutdown()


def test_shutdown_straggler_preprocess_worker_cannot_strand_request():
    """A preprocess worker mid-_build_sample when shutdown() fires can
    enqueue into _run_q AFTER an early drain; shutdown must keep draining
    until every worker thread has exited so that request still gets a
    result (the old single drain left result() blocking forever)."""
    import time

    cfg = anyref_tiny()
    params = anyref.init(jax.random.key(0), cfg, dtype=jnp.float32)
    server = Server(params, cfg, max_batch=1, max_wait_ms=10.0,
                    preprocess_workers=1)
    orig = server._build_sample

    def slow_build(req):
        time.sleep(3.0)          # longer than one join(timeout=1.0) round
        return orig(req)

    server._build_sample = slow_build
    req = server.submit(Request(image=np.zeros((8, 8, 3), np.uint8),
                                text="x"))
    time.sleep(0.3)              # let the worker enter slow_build
    server.shutdown()
    res = req.result(timeout=10)
    assert req._done.is_set(), "request stranded by shutdown"
    assert "error" in res or "text" in res


@pytest.mark.slow
def test_partial_group_reuses_single_compiled_program():
    """A group smaller than max_batch must ride the max_batch program
    (padded rows), not compile a second one: a fresh generate compile on a
    real device is minutes, and one stray batch-1 group mid-serving
    measured 0.2 q/s on the path that runs 7+ (BASELINE.md server bench)."""
    cfg = anyref_tiny()
    params = anyref.init(jax.random.key(0), cfg, dtype=jnp.float32)
    server = Server(params, cfg, max_batch=2, max_wait_ms=50.0)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (60, 80, 3), np.uint8)
    try:
        # sequential submits -> the device loop sees a 1-row group first,
        # then a 2-row group
        r1 = server.submit(Request(image=img, text="the cat"))
        assert "error" not in r1.result(timeout=600)
        reqs = [server.submit(Request(image=img, text="the cat"))
                for _ in range(2)]
        for r in reqs:
            assert "error" not in r.result(timeout=600)
        assert len(server.predictor._jitted) == 1, (
            "partial group compiled a second program: "
            f"{list(server.predictor._jitted)}")
    finally:
        server.shutdown()
