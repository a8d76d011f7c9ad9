"""Serving over a tensor-parallel mesh: the configuration where batched 7B
serving is actually real (one chip can't hold batch>=2 at 7B — HBM study in
BASELINE.md; a TP mesh divides the weight stream and the batch amortizes it).

Runs the full Server (queue -> micro-batcher -> bucketed Predictor) with the
tiny preset over the virtual 8-device mesh, params sharded with the Megatron
specs (parallel/partition.py), and asserts batched-TP outputs match
single-device per-request outputs exactly (greedy decode is deterministic).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anyref_tpu.config import anyref_tiny
from anyref_tpu.models import anyref
from anyref_tpu.parallel import partition
from anyref_tpu.parallel.mesh import make_mesh
from anyref_tpu.serve import Request, Server


@pytest.mark.slow
def test_server_batched_tp_matches_single_device():
    cfg = anyref_tiny()
    params = anyref.init(jax.random.key(0), cfg, dtype=jnp.float32)
    mesh = make_mesh(data=1, model=8)
    sharded = partition.shard_params(params, mesh, cfg)

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (60, 80, 3), np.uint8) for _ in range(4)]
    texts = ["the cat", "a very long referring expression about a red dog",
             "bird", "the left person"]

    # single-device per-request ground truth
    solo = Server(params, cfg, max_batch=1, max_wait_ms=1.0,
                  speculative=False)
    want = [solo.segment(img, text) for img, text in zip(imgs, texts)]
    solo.shutdown()

    # TP mesh, batch 2, DEFAULT speculative config: requests coalesce into
    # micro-batches; the serving-layout conversion must be SKIPPED for
    # sharded params (the eager fused-qkv concat would escape the Megatron
    # sharding; llama.decode_chunk runs the plain layout) while lockstep
    # speculative decode still runs — and is lossless vs the greedy truth
    tp = Server(sharded, cfg, max_batch=2, max_wait_ms=500.0)
    assert "q" in sharded["llama"]["layers"][0]["attn"]  # layout untouched
    reqs = [tp.submit(Request(image=img, text=text))
            for img, text in zip(imgs, texts)]
    got = [r.result(timeout=600) for r in reqs]
    tp.shutdown()

    for i, (w, g) in enumerate(zip(want, got)):
        assert "error" not in g, (i, g)
        assert g["text"] == w["text"], i
        np.testing.assert_array_equal(g["mask"], w["mask"], err_msg=str(i))
