"""Serving runtime smoke: micro-batched requests through the tiny model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anyref_tpu.config import anyref_tiny
from anyref_tpu.models import anyref
from anyref_tpu.serve import Request, Server


@pytest.mark.slow
def test_uint8_image_path_matches_float():
    """The serving fast path (uint8 pixel upload + on-device normalize,
    data/preprocess.preprocess_*_u8_np + runner._sam_normalize_device) must
    reproduce the float pipeline. With a canvas-sized square image the SAM
    resize is the identity and CLIP's bicubic runs identically (uint8) in
    both paths, so no quantization enters and outputs must match to f32
    rounding."""
    from anyref_tpu.data.base import SegDataset
    from anyref_tpu.data.collator import Collator
    from anyref_tpu.eval.runner import Predictor
    from anyref_tpu.tokenizer import AnyRefTokenizer

    cfg = anyref_tiny()
    params = anyref.init(jax.random.key(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255,
                       (cfg.sam.image_size, cfg.sam.image_size, 3), np.uint8)
    ds_f = SegDataset(cfg)
    ds_u = SegDataset(cfg, uint8_images=True)
    s_f = ds_f.make_sample(img, "where is the cat?", None, None)
    s_u = ds_u.make_sample(img, "where is the cat?", None, None)
    assert s_u["sam_image"].dtype == np.uint8
    assert s_u["clip_image"].dtype == np.uint8
    col = Collator(AnyRefTokenizer(), cfg, train=False)
    pred = Predictor(params, cfg, max_new_tokens=4, prompt_buckets=(385,),
                     batch_buckets=(1,))
    ids_f, masks_f = pred.predict(col([s_f]))
    ids_u, masks_u = pred.predict(col([s_u]))
    np.testing.assert_array_equal(ids_f, ids_u)
    if masks_f[0] is None:
        assert masks_u[0] is None
    else:
        np.testing.assert_allclose(masks_f[0], masks_u[0],
                                   rtol=5e-4, atol=5e-4)


def test_uint8_preprocess_quantization_bound():
    """For a general image (real resizes), the uint8 path differs from the
    float path by at most one quantization step pre-normalize: 0.5/std for
    SAM, 0.5/255/std for CLIP."""
    from anyref_tpu.config import SAM_PIXEL_STD
    from anyref_tpu.data.preprocess import preprocess_clip_u8_np, \
        preprocess_clip_np, preprocess_sam_np, preprocess_sam_u8_np
    from anyref_tpu.models.clip_vit import CLIP_PIXEL_STD
    from anyref_tpu.eval.runner import _sam_normalize_device
    from anyref_tpu.models.clip_vit import normalize_pixels

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (123, 201, 3), np.uint8)
    sam_f, rs_f = preprocess_sam_np(img, 256)
    sam_u, rs_u = preprocess_sam_u8_np(img, 256)
    assert rs_f == rs_u
    sam_dev = np.asarray(_sam_normalize_device(
        jnp.asarray(sam_u[None]), jnp.asarray([rs_u], np.int32)))[0]
    bound = 0.5 / min(SAM_PIXEL_STD) + 1e-5
    assert np.abs(sam_dev - sam_f).max() <= bound
    # pad region must be exactly zero (normalize-then-pad order)
    assert np.all(sam_dev[:, rs_u[0]:, :] == 0)
    assert np.all(sam_dev[:, :, rs_u[1]:] == 0)

    clip_f = preprocess_clip_np(img, 224)
    clip_u = preprocess_clip_u8_np(img, 224)
    clip_dev = np.asarray(normalize_pixels(
        jnp.asarray(clip_u[None], jnp.float32)))[0]
    bound = 0.5 / 255.0 / min(CLIP_PIXEL_STD) + 1e-5
    assert np.abs(clip_dev - clip_f).max() <= bound


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
