"""Golden parity: anyref_tpu ImageBind audio branch vs the reference torch
implementation (small dims, random weights)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from anyref_tpu.config import ImageBindAudioConfig
from anyref_tpu import convert
from anyref_tpu.models.imagebind import audio as audio_mod

from .conftest import reference_on_path

reference_on_path()

from model.ImageBind.models import imagebind_model  # noqa: E402


CFG = ImageBindAudioConfig(embed_dim=32, num_blocks=2, num_heads=2,
                           out_embed_dim=48)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = imagebind_model.ImageBindModel(
        vision_embed_dim=16, vision_num_blocks=1, vision_num_heads=2,
        text_embed_dim=16, text_num_blocks=1, text_num_heads=2,
        audio_embed_dim=CFG.embed_dim, audio_num_blocks=CFG.num_blocks,
        audio_num_heads=CFG.num_heads, out_embed_dim=CFG.out_embed_dim,
        audio_drop_path=0.0)
    # strip to audio-only as AnyRef does (reference anyref.py:142-147)
    for name in ("vision", "text", "depth", "thermal", "imu"):
        for d in (m.modality_preprocessors, m.modality_trunks,
                  m.modality_postprocessors, m.modality_heads):
            del d[name]
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape) * 0.05)
    m.eval()
    return m


def test_audio_feature_parity(torch_model):
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params = convert.convert_imagebind_audio(sd, CFG)
    rng = np.random.default_rng(0)
    mels = rng.standard_normal(
        (2, CFG.clips_per_audio, 1, CFG.mel_bins, CFG.target_len)
    ).astype(np.float32)
    with torch.no_grad():
        feat_t, emb_t = torch_model.get_audio_feature(
            torch.from_numpy(mels), "audio")
    feat_j, emb_j = audio_mod.get_audio_feature(params, CFG, jnp.asarray(mels))
    np.testing.assert_allclose(np.asarray(feat_j), feat_t.numpy(),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(emb_j), emb_t.numpy(),
                               rtol=3e-3, atol=3e-3)


def test_mel_frontend_shapes():
    from anyref_tpu.ops.mel import audio_to_mel_clips, kaldi_fbank
    rng = np.random.default_rng(1)
    wav = rng.standard_normal(16000 * 5).astype(np.float32)  # 5 s
    clips = audio_to_mel_clips(wav)
    assert clips.shape == (3, 1, 128, 204)
    assert np.isfinite(clips).all()
    # 2 s at 16 kHz -> 1 + (32000-400)//160 = 198 frames (then padded to 204)
    fb = np.asarray(kaldi_fbank(jnp.asarray(wav[:32000])))
    assert fb.shape == (198, 128)
    # deterministic
    fb2 = np.asarray(kaldi_fbank(jnp.asarray(wav[:32000])))
    np.testing.assert_array_equal(fb, fb2)
