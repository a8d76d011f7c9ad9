"""Pretrained-checkpoint assembly from a synthetic merged reference
checkpoint (the merge_lora.py output layout: one HF dir carrying LLaMA +
mm_projector + CLIP tower + SAM + AnyRef heads)."""

import numpy as np

import jax.numpy as jnp

from anyref_tpu import checkpoint
from anyref_tpu.config import anyref_tiny


CFG = anyref_tiny()


def _tiny_merged_sd():
    rng = np.random.default_rng(0)
    L = CFG.llama

    def r(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    sd = {"model.embed_tokens.weight": r(L.vocab_size, L.hidden_size),
          "model.norm.weight": np.ones(L.hidden_size, np.float32),
          "lm_head.weight": r(L.vocab_size, L.hidden_size)}
    for i in range(L.num_layers):
        b = f"model.layers.{i}."
        qd = L.num_heads * L.head_dim
        sd[b + "input_layernorm.weight"] = np.ones(L.hidden_size, np.float32)
        sd[b + "post_attention_layernorm.weight"] = np.ones(L.hidden_size, np.float32)
        sd[b + "self_attn.q_proj.weight"] = r(qd, L.hidden_size)
        sd[b + "self_attn.k_proj.weight"] = r(qd, L.hidden_size)
        sd[b + "self_attn.v_proj.weight"] = r(qd, L.hidden_size)
        sd[b + "self_attn.o_proj.weight"] = r(L.hidden_size, qd)
        sd[b + "mlp.gate_proj.weight"] = r(L.intermediate_size, L.hidden_size)
        sd[b + "mlp.up_proj.weight"] = r(L.intermediate_size, L.hidden_size)
        sd[b + "mlp.down_proj.weight"] = r(L.hidden_size, L.intermediate_size)
    sd["model.mm_projector.weight"] = r(L.hidden_size, CFG.clip.hidden_size)
    sd["model.mm_projector.bias"] = r(L.hidden_size)
    # AnyRef heads (merged checkpoint layout)
    sd["model.text_hidden_fcs.0.0.weight"] = r(L.hidden_size, L.hidden_size)
    sd["model.text_hidden_fcs.0.0.bias"] = r(L.hidden_size)
    sd["model.text_hidden_fcs.0.2.weight"] = r(CFG.out_dim, L.hidden_size)
    sd["model.text_hidden_fcs.0.2.bias"] = r(CFG.out_dim)
    return sd


def test_assemble_from_merged_dir(tmp_path):
    from safetensors.numpy import save_file
    save_file(_tiny_merged_sd(), str(tmp_path / "model.safetensors"))
    params = checkpoint.assemble_pretrained(
        CFG, llava_dir=str(tmp_path), dtype=jnp.float32)
    L = CFG.llama
    assert params["llama"]["embed_tokens"].shape == (L.padded_vocab_size,
                                                     L.hidden_size)
    assert params["mm_projector"]["w"].shape == (CFG.clip.hidden_size,
                                                 L.hidden_size)
    assert params["text_hidden_fcs"]["lin2"]["w"].shape == (L.hidden_size,
                                                            CFG.out_dim)
    # converted heads drop-in to the model
    from anyref_tpu.models.anyref import project_seg_hidden
    h = jnp.ones((1, 2, L.hidden_size), jnp.float32)
    out = project_seg_hidden(params, h)
    assert out.shape == (1, 2, CFG.out_dim)


def test_restore_matches_namedtuple_fields_by_name(tmp_path):
    """Non-alphabetical namedtuple fields must restore by NAME: order-based
    leaf pairing silently swapped same-shaped leaves (ADVICE r1, low)."""
    import collections
    import jax.numpy as jnp
    import numpy as np
    from anyref_tpu import checkpoint as ckpt

    Weird = collections.namedtuple("Weird", ["zeta", "alpha"])
    w = {"w": Weird(zeta=jnp.full((3,), 5.0), alpha=jnp.full((3,), 9.0)),
         "empty": (), "none": None}
    path = str(tmp_path / "state")
    ckpt._checkpointer().save(path, w, force=True)
    template = {"w": Weird(zeta=jnp.zeros(3), alpha=jnp.zeros(3)),
                "empty": (), "none": None}
    r = ckpt.restore_train_state(path, template)
    np.testing.assert_array_equal(np.asarray(r["w"].zeta), 5.0)
    np.testing.assert_array_equal(np.asarray(r["w"].alpha), 9.0)
    assert r["empty"] == () and r["none"] is None


def test_load_params_restores_host_numpy(tmp_path):
    """load_params must not depend on the shardings recorded at save time:
    a checkpoint saved by a CPU test process is opened by TPU serving
    processes (and pod-sharded states single-chip). The restore therefore
    yields host numpy arrays — jit/pjit place them at first call."""
    import jax

    params = {"w": jnp.ones((4, 4), jnp.bfloat16), "step": 3,
              "nested": {"b": jnp.zeros((2,), jnp.float32)}}
    path = str(tmp_path / "ckpt")
    checkpoint.save_params(path, params)
    out = checkpoint.load_params(path)
    for leaf in jax.tree.leaves(out):
        assert isinstance(leaf, np.ndarray), type(leaf)
    assert out["w"].dtype == jnp.bfloat16
    assert int(out["step"]) == 3
    np.testing.assert_array_equal(out["nested"]["b"], np.zeros((2,)))


def test_predictor_commits_host_params():
    """Checkpoint-loaded trees are host numpy (topology-independent restore);
    Predictor must commit them to device ONCE at construction — numpy
    operands to jit are re-uploaded on every call (~15 GB/query at 7B)."""
    import jax

    from anyref_tpu.eval.runner import Predictor
    from anyref_tpu.models import anyref

    params = jax.tree.map(
        np.asarray, anyref.init(jax.random.key(0), CFG, dtype=jnp.float32))
    assert isinstance(jax.tree.leaves(params)[0], np.ndarray)
    pred = Predictor(params, CFG)
    for leaf in jax.tree.leaves(pred.params):
        assert isinstance(leaf, jax.Array)
