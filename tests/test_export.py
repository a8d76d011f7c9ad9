"""jax.export artifacts (TPU-native replacement of the reference ONNX
export, segment_anything/utils/onnx.py): serialize -> deserialize -> run
must reproduce the live decoder, including box-corner labels 2/3."""

import numpy as np
import pytest

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


@pytest.mark.slow
def test_generate_export_roundtrip(tmp_path):
    """export_generate serializes the full jitted generate step; the
    deserialized artifact must reproduce the live call exactly."""
    from anyref_tpu.data.collator import Collator
    from anyref_tpu.models import anyref
    from anyref_tpu.tokenizer import AnyRefTokenizer, seg_question

    cfg = anyref_tiny()
    params = anyref.init(jax.random.key(5), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    tok = AnyRefTokenizer()
    batch = Collator(tok, cfg, train=False)([{
        "clip_image": rng.standard_normal(
            (3, cfg.clip.image_size, cfg.clip.image_size)).astype(np.float32),
        "sam_image": rng.standard_normal(
            (3, cfg.sam.image_size, cfg.sam.image_size)).astype(np.float32),
        "sam_resized_size": (cfg.sam.image_size, cfg.sam.image_size),
        "question": seg_question("a cat"), "answer": None,
        "gt_masks": None, "height": 48, "width": 64, "file_name": "x.jpg",
    }])
    plen = int(batch["prompt_lens"][0])
    ids = jnp.asarray(batch["input_ids"][:, :plen])
    clip = jnp.asarray(batch["clip_images"])
    sam = jnp.asarray(batch["sam_images"])

    path = str(tmp_path / "generate.hlo")
    exp_mod.export_generate(params, cfg, path, prompt_len=plen,
                            max_new_tokens=4)
    loaded = exp_mod.load_exported(path)
    got_ids, got_masks, got_valid = loaded(ids, clip, sam)

    # jit the live reference like the exported fn (eager tracing fuses
    # differently and drifts mask logits at the 1e-3 level)
    live = jax.jit(anyref.generate, static_argnums=(1, 3))(
        params, cfg, {"input_ids": ids, "clip_images": clip,
                      "sam_images": sam}, 4)
    np.testing.assert_array_equal(np.asarray(got_ids),
                                  np.asarray(live.output_ids))
    np.testing.assert_array_equal(np.asarray(got_valid),
                                  np.asarray(live.seg_valid))
    # the export bakes params in as constants, so XLA constant-folds and
    # fuses the mask-decoder chain differently than the live params-as-
    # arguments program: logits drift ~1e-3 absolute (token ids and seg
    # slots above are bit-exact; post-sigmoid binarization is unaffected)
    np.testing.assert_allclose(np.asarray(got_masks, np.float32),
                               np.asarray(live.low_res_masks, np.float32),
                               atol=5e-3)
