"""jax.export artifacts (TPU-native replacement of the reference ONNX
export, segment_anything/utils/onnx.py): serialize -> deserialize -> run
must reproduce the live decoder, including box-corner labels 2/3."""

import numpy as np

import jax
import jax.numpy as jnp

from anyref_tpu import export as exp_mod
from anyref_tpu.config import anyref_tiny
from anyref_tpu.models import sam as sam_root


def test_sam_decoder_export_roundtrip(tmp_path):
    cfg = anyref_tiny().sam
    params = sam_root.init(jax.random.key(0), cfg, dtype=jnp.float32)
    path = str(tmp_path / "dec.hlo")
    exp_mod.export_sam_decoder(params, cfg, path, num_points=5)

    g = cfg.embedding_size
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal(
        (1, cfg.prompt_embed_dim, g, g)), jnp.float32)
    # 1 positive point, a box (labels 2, 3), 2 pad points
    coords = jnp.asarray(rng.uniform(0, cfg.image_size, (1, 5, 2)),
                         jnp.float32)
    labels = jnp.asarray([[1, 2, 3, -1, -1]], jnp.float32)

    live = exp_mod.sam_decoder_fn(params, cfg)(emb, coords, labels)
    loaded = exp_mod.load_exported(path)
    got = loaded(emb, coords, labels)
    for a, b in zip(got, live):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    assert got[0].shape == (1, 3, 4 * g, 4 * g)   # multimask K=3
