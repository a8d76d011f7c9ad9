"""7B-dimension sharded lowering checks (VERDICT r2 #4).

One chip can't fit the flagship preset and the virtual CPU mesh can't
execute it, but sharding/layout bugs that only appear at real dims (head
counts vs the model axis, vocab padding, opt-state memory) surface at
trace/partition time. These tests run the abstract (eval_shape) pipeline and
``jax.jit(...).lower`` at anyref_7b shapes — no execution, no compile (the
driver's dryrun gate additionally runs ``.compile()`` on both programs,
__graft_entry__._aot_check_7b).
"""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

import __graft_entry__ as graft
from anyref_tpu.config import anyref_7b
from anyref_tpu.models import anyref
from anyref_tpu.parallel import partition
from anyref_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from anyref_tpu.train import lora as lora_mod
from anyref_tpu.train import step as step_mod


def _abstract_state():
    cfg = anyref_7b()
    params_abs = jax.eval_shape(
        lambda k: anyref.init(k, cfg, dtype=jnp.bfloat16), jax.random.key(0))
    optimizer = step_mod.make_optimizer()
    state_abs, frozen_abs = jax.eval_shape(
        lambda k: step_mod.init_state(k, params_abs, lora_mod.LoraConfig(),
                                      optimizer),
        jax.random.key(1))
    return cfg, params_abs, state_abs, frozen_abs


def test_7b_sharded_state_fits_v5e():
    """Per-device resident bytes (params + opt state, Megatron TP specs over
    the model axis) must fit a 16 GiB v5e on the 2x4 mesh."""
    cfg, params_abs, state_abs, frozen_abs = _abstract_state()
    mesh = make_mesh(data=2, model=4)
    pspec = partition.anyref_spec(params_abs, cfg)
    isnone = lambda x: x is None  # noqa: E731
    mask = lambda t, s: jax.tree.map(  # noqa: E731
        lambda x, sp: sp if x is not None else None, t, s, is_leaf=isnone)
    frozen_spec = mask(frozen_abs, pspec)
    dense_spec = mask(state_abs.dense, pspec)
    lora_spec = partition.lora_spec(state_abs.lora)
    opt_spec = graft._opt_state_specs(
        state_abs.opt_state, (state_abs.lora, state_abs.dense),
        (lora_spec, dense_spec))
    state_spec = type(state_abs)(P(), lora_spec, dense_spec, opt_spec)
    resident = (graft._sharded_bytes(state_abs, state_spec, mesh)
                + graft._sharded_bytes(frozen_abs, frozen_spec, mesh))
    gb = resident / (1 << 30)
    assert gb < 16.0, f"{gb:.2f} GiB/device"
    # and the decoder really shards: replicated-everything would be ~3x
    replicated = (graft._sharded_bytes(state_abs, None, mesh)
                  + graft._sharded_bytes(frozen_abs, None, mesh))
    assert resident < 0.6 * replicated


def test_7b_opt_state_specs_mirror_params():
    """Adam mu/nu take the param partition specs; counts replicate."""
    cfg, params_abs, state_abs, _ = _abstract_state()
    pspec = partition.anyref_spec(params_abs, cfg)
    isnone = lambda x: x is None  # noqa: E731
    dense_spec = jax.tree.map(
        lambda x, sp: sp if x is not None else None, state_abs.dense, pspec,
        is_leaf=isnone)
    lora_spec = partition.lora_spec(state_abs.lora)
    opt_spec = graft._opt_state_specs(
        state_abs.opt_state, (state_abs.lora, state_abs.dense),
        (lora_spec, dense_spec))
    # structure matches leaf-for-leaf
    assert (jax.tree.structure(opt_spec, is_leaf=isnone)
            == jax.tree.structure(state_abs.opt_state, is_leaf=isnone))
    # embed_tokens mu must carry the vocab-sharded spec (model axis), found
    # by locating a spec whose first axis is MODEL_AXIS among opt leaves
    flat = jax.tree.leaves(opt_spec, is_leaf=isnone)
    assert any(isinstance(s, P) and len(s) > 0 and s[0] == MODEL_AXIS
               for s in flat if s is not None)


@pytest.mark.slow
def test_7b_head_dims_divide_model_axis():
    """Tracing the TP generate at 7B dims catches head-count/vocab-padding
    divisibility bugs without compiling (lower() runs GSPMD input setup)."""
    cfg = anyref_7b()
    assert cfg.llama.num_heads % 4 == 0          # 2x4 train mesh
    assert cfg.llama.num_heads % 8 == 0          # tp=8 serving mesh
    assert cfg.llama.padded_vocab_size % 8 == 0
    # full abstract lowering of the train step on the 2x4 mesh (no compile)
    import functools
    from jax.sharding import NamedSharding
    mesh = make_mesh(data=2, model=4)
    cfg2, params_abs, state_abs, frozen_abs = _abstract_state()
    pspec = partition.anyref_spec(params_abs, cfg2)
    isnone = lambda x: x is None  # noqa: E731
    mask = lambda t, s: jax.tree.map(  # noqa: E731
        lambda x, sp: sp if x is not None else None, t, s, is_leaf=isnone)
    frozen_spec = mask(frozen_abs, pspec)
    dense_spec = mask(state_abs.dense, pspec)
    lora_spec = partition.lora_spec(state_abs.lora)
    opt_spec = graft._opt_state_specs(
        state_abs.opt_state, (state_abs.lora, state_abs.dense),
        (lora_spec, dense_spec))
    state_spec = type(state_abs)(P(), lora_spec, dense_spec, opt_spec)

    def with_sharding(abs_tree, spec_tree):
        return jax.tree.map(
            lambda x, s: jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=NamedSharding(mesh, s))
            if x is not None else None,
            abs_tree, spec_tree, is_leaf=isnone)

    batch = graft._tiny_batch(anyref_7b(), batch_size=2)
    batch_abs = {k: jax.ShapeDtypeStruct(
        v.shape, v.dtype, sharding=NamedSharding(mesh, P("data")))
        for k, v in batch.items()}
    train_step = step_mod.make_train_step(
        cfg2, lora_mod.LoraConfig(), step_mod.make_optimizer(), remat=True)
    lowered = jax.jit(train_step).lower(
        with_sharding(state_abs, state_spec),
        with_sharding(frozen_abs, frozen_spec), batch_abs)
    assert lowered is not None
