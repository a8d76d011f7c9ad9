"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    assert len(jax.devices()) == 8
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, (params, batch) = ge.entry()
    out = jax.jit(fn)(params, batch)
    assert np.isfinite(float(out[0]))


@pytest.mark.slow
def test_tp_generate_matches_single():
    """Serving under tensor parallelism: generate over a (data=2, model=4)
    mesh must reproduce the single-device outputs."""
    import functools

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from anyref_tpu.config import anyref_tiny
    from anyref_tpu.models import anyref
    from anyref_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from anyref_tpu.parallel.partition import shard_params
    from anyref_tpu.data.collator import Collator
    from anyref_tpu.tokenizer import AnyRefTokenizer, seg_question

    cfg = anyref_tiny()
    params = anyref.init(jax.random.key(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    col = Collator(AnyRefTokenizer(), cfg, train=False)
    insts = []
    for _ in range(2):
        insts.append({
            "clip_image": rng.standard_normal((3, 224, 224)).astype(np.float32),
            "sam_image": rng.standard_normal(
                (3, cfg.sam.image_size, cfg.sam.image_size)).astype(np.float32),
            "sam_resized_size": (cfg.sam.image_size, cfg.sam.image_size),
            "question": seg_question("a cat"), "answer": None,
            "gt_masks": None, "height": 32, "width": 32, "file_name": "x",
        })
    batch = col(insts)
    plen = int(batch["prompt_lens"].max())
    jbatch = {"input_ids": jnp.asarray(batch["input_ids"][:, :plen]),
              "clip_images": jnp.asarray(batch["clip_images"]),
              "sam_images": jnp.asarray(batch["sam_images"])}

    gen = jax.jit(functools.partial(anyref.generate, max_new_tokens=4),
                  static_argnums=(1,))
    single = gen(params, cfg, jbatch)

    mesh = make_mesh(data=2, model=4)
    sparams = shard_params(params, mesh, cfg)
    from anyref_tpu.parallel.partition import shard_batch
    sbatch = shard_batch(jbatch, mesh)
    sharded = gen(sparams, cfg, sbatch)

    np.testing.assert_array_equal(np.asarray(single.output_ids),
                                  np.asarray(sharded.output_ids))
    # ids match exactly; mask logits tolerate TP-matmul + flash-pad rounding
    # (fp32 reductions reorder across the head shard and the 639->640 pad)
    np.testing.assert_allclose(np.asarray(single.low_res_masks),
                               np.asarray(sharded.low_res_masks),
                               rtol=4e-3, atol=4e-3)
