"""Golden parity: anyref_tpu SAM vs the reference torch SAM on CPU.

Builds small reference modules with random weights, converts the state_dict
through anyref_tpu.convert.convert_sam, and checks outputs match. This
validates the architecture re-implementation exactly without needing the
released sam_vit_h checkpoint (not present in this environment).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from anyref_tpu.config import SamConfig
from anyref_tpu import convert
from anyref_tpu.models import sam as sam_mod

from .conftest import reference_on_path

reference_on_path()

from model.segment_anything.modeling.image_encoder import ImageEncoderViT  # noqa: E402
from model.segment_anything.modeling.mask_decoder import MaskDecoder  # noqa: E402
from model.segment_anything.modeling.prompt_encoder import PromptEncoder  # noqa: E402
from model.segment_anything.modeling.transformer import TwoWayTransformer  # noqa: E402
from functools import partial  # noqa: E402


CFG = SamConfig(
    encoder_embed_dim=64, encoder_depth=3, encoder_num_heads=2,
    encoder_global_attn_indexes=(1,), image_size=256, window_size=4,
    prompt_embed_dim=32, mask_decoder_mlp_dim=64, iou_head_hidden_dim=32)


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for name, b in module.named_buffers():
            if "gaussian" in name:
                b.copy_(torch.randn(b.shape, generator=g))


@pytest.fixture(scope="module")
def torch_modules():
    torch.manual_seed(0)
    enc = ImageEncoderViT(
        depth=CFG.encoder_depth, embed_dim=CFG.encoder_embed_dim,
        img_size=CFG.image_size, mlp_ratio=4,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        num_heads=CFG.encoder_num_heads, patch_size=16, qkv_bias=True,
        use_rel_pos=True, global_attn_indexes=CFG.encoder_global_attn_indexes,
        window_size=CFG.window_size, out_chans=CFG.prompt_embed_dim)
    pr = PromptEncoder(
        embed_dim=CFG.prompt_embed_dim,
        image_embedding_size=(CFG.embedding_size, CFG.embedding_size),
        input_image_size=(CFG.image_size, CFG.image_size), mask_in_chans=16)
    dec = MaskDecoder(
        num_multimask_outputs=3,
        transformer=TwoWayTransformer(depth=2, embedding_dim=CFG.prompt_embed_dim,
                                      mlp_dim=CFG.mask_decoder_mlp_dim, num_heads=8),
        transformer_dim=CFG.prompt_embed_dim, iou_head_depth=3,
        iou_head_hidden_dim=CFG.iou_head_hidden_dim)
    for i, m in enumerate((enc, pr, dec)):
        _randomize(m, 42 + i)
        m.eval()
    return enc, pr, dec


@pytest.fixture(scope="module")
def jax_params(torch_modules):
    enc, pr, dec = torch_modules
    sd = {}
    for prefix, m in (("image_encoder.", enc), ("prompt_encoder.", pr),
                      ("mask_decoder.", dec)):
        for k, v in m.state_dict().items():
            sd[prefix + k] = v.numpy()
    return convert.convert_sam(sd, CFG)


def test_image_encoder_parity(torch_modules, jax_params):
    enc, _, _ = torch_modules
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, CFG.image_size, CFG.image_size)).astype(np.float32)
    with torch.no_grad():
        want = enc(torch.from_numpy(x)).numpy()
    got = np.asarray(sam_mod.encode_image(jax_params, jnp.asarray(x), CFG))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dense_pe_parity(torch_modules, jax_params):
    _, pr, _ = torch_modules
    from anyref_tpu.models.sam import prompt_encoder as pe_mod
    with torch.no_grad():
        want = pr.get_dense_pe().numpy()
    got = np.asarray(pe_mod.dense_pe(jax_params["prompt_encoder"], CFG))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_text_prompt_decode_parity(torch_modules, jax_params):
    enc, pr, dec = torch_modules
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, CFG.image_size, CFG.image_size)).astype(np.float32)
    text = rng.standard_normal((3, 1, CFG.prompt_embed_dim)).astype(np.float32)

    with torch.no_grad():
        emb_t = enc(torch.from_numpy(x))
        sparse, dense = pr(points=None, boxes=None, masks=None,
                           text_embeds=torch.from_numpy(text))
        low_t, iou_t = dec(
            image_embeddings=emb_t, image_pe=pr.get_dense_pe(),
            sparse_prompt_embeddings=sparse, dense_prompt_embeddings=dense,
            multimask_output=False)

    emb_j = sam_mod.encode_image(jax_params, jnp.asarray(x), CFG)
    low_j, iou_j = sam_mod.decode_text_prompts(
        jax_params, CFG, emb_j, jnp.asarray(text[:, 0]),
        image_index=jnp.zeros((3,), jnp.int32))
    np.testing.assert_allclose(np.asarray(low_j), low_t.numpy(),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(iou_j), iou_t.numpy(),
                               rtol=5e-4, atol=5e-4)


def test_point_box_prompt_parity(torch_modules, jax_params):
    """Point/box prompt embedding parity (SamPredictor pathway)."""
    _, pr, _ = torch_modules
    from anyref_tpu.models.sam import prompt_encoder as pe_mod
    coords = np.array([[[40.0, 80.0], [200.0, 100.0]]], np.float32)
    labels = np.array([[1, 0]], np.float32)
    boxes = np.array([[30.0, 40.0, 180.0, 220.0]], np.float32)
    with torch.no_grad():
        sparse_t, dense_t = pr(
            points=(torch.from_numpy(coords), torch.from_numpy(labels)),
            boxes=torch.from_numpy(boxes), masks=None, text_embeds=None)
    pts_j = pe_mod.embed_points(jax_params["prompt_encoder"], CFG,
                                jnp.asarray(coords), jnp.asarray(labels),
                                pad=False)
    box_j = pe_mod.embed_boxes(jax_params["prompt_encoder"], CFG,
                               jnp.asarray(boxes))
    got = np.concatenate([np.asarray(pts_j), np.asarray(box_j)], axis=1)
    np.testing.assert_allclose(got, sparse_t.numpy(), rtol=1e-4, atol=1e-4)
    dense_j = pe_mod.no_mask_dense(jax_params["prompt_encoder"], CFG, 1)
    np.testing.assert_allclose(np.asarray(dense_j), dense_t.detach().numpy(),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_window_resident_runs_match_per_layer_partition():
    """The window-RESIDENT block stream (partition hoisted out of runs of
    windowed layers) must equal the per-layer partition/unpartition path at a
    grid that exercises zero padding (32 not divisible by window 14)."""
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from anyref_tpu.config import SamConfig
    from anyref_tpu.models.sam import image_encoder as ie

    cfg = SamConfig(encoder_embed_dim=64, encoder_depth=5,
                    encoder_num_heads=4, encoder_global_attn_indexes=(2,),
                    image_size=512, patch_size=16, window_size=14,
                    prompt_embed_dim=32)
    params = ie.init(jax.random.key(0), cfg, dtype=jnp.float32)
    # non-zero rel-pos + qkv biases so pad-token bias terms matter
    for b in params["blocks"]:
        k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
        b["attn"]["rel_pos_h"] = 0.1 * jax.random.normal(
            k1, b["attn"]["rel_pos_h"].shape)
        b["attn"]["rel_pos_w"] = 0.1 * jax.random.normal(
            k2, b["attn"]["rel_pos_w"].shape)
        b["attn"]["qkv"]["b"] = 0.1 * jax.random.normal(
            k3, b["attn"]["qkv"]["b"].shape)

    x = jax.random.normal(jax.random.key(2), (2, 3, 512, 512), jnp.float32)

    got = ie.apply(params, x, cfg)

    # oracle: the original per-layer partition path
    h = ie.patch_embed(params["patch_embed"], x, cfg.patch_size)
    h = h + params["pos_embed"].astype(h.dtype)
    for i, bp in enumerate(params["blocks"]):
        h = ie._block(bp, h, cfg,
                      window=i not in cfg.encoder_global_attn_indexes)
    y = h.astype(jnp.float32).transpose(0, 3, 1, 2)
    from anyref_tpu.ops.common import conv2d, layer_norm_2d
    y = conv2d(params["neck"]["conv1"], y, padding="VALID")
    y = layer_norm_2d(params["neck"]["ln1"], y, eps=cfg.layer_norm_eps)
    y = conv2d(params["neck"]["conv2"], y, padding=((1, 1), (1, 1)))
    y = layer_norm_2d(params["neck"]["ln2"], y, eps=cfg.layer_norm_eps)
    want = y.astype(h.dtype)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
