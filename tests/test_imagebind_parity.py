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


# ---------------------------------------------------------------------------
# Independent Kaldi-fbank oracle, transcribed in NumPy straight from
# torchaudio.compliance.kaldi.fbank's algorithm (torchaudio is absent in this
# environment). Written from the torchaudio/Kaldi semantics, NOT by importing
# anyref_tpu.ops.mel internals, so the two can disagree. Parameters fixed to
# the reference's call (model/ImageBind/data.py:31-40): htk_compat=True,
# use_energy=False, hanning window, dither=0, 25ms/10ms.
# ---------------------------------------------------------------------------
def _oracle_mel_scale(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq, np.float64) / 700.0)


def _oracle_get_mel_banks(num_bins, window_length_padded, sample_freq,
                          low_freq=20.0, high_freq=0.0):
    # torchaudio.compliance.kaldi.get_mel_banks
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq += nyquist
    fft_bin_width = sample_freq / window_length_padded
    mel_low = _oracle_mel_scale(low_freq)
    mel_high = _oracle_mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    b = np.arange(num_bins, dtype=np.float64)[:, None]
    left = mel_low + b * mel_delta
    center = mel_low + (b + 1.0) * mel_delta
    right = mel_low + (b + 2.0) * mel_delta
    mel = _oracle_mel_scale(fft_bin_width * np.arange(num_fft_bins))[None, :]
    up = (mel - left) / (center - left)
    down = (right - mel) / (right - center)
    return np.maximum(0.0, np.minimum(up, down))          # [bins, nfft//2]


def oracle_kaldi_fbank(waveform, sample_frequency=16000.0, num_mel_bins=128,
                       frame_length=25.0, frame_shift=10.0,
                       preemphasis_coefficient=0.97):
    """torchaudio.compliance.kaldi.fbank(htk_compat=True, use_energy=False,
    window_type='hanning', dither=0.0, snip_edges=True, remove_dc_offset=True,
    round_to_power_of_two=True, use_power=True, use_log_fbank=True,
    subtract_mean=False) in float64 NumPy."""
    wav = np.asarray(waveform, np.float64)
    window_size = int(sample_frequency * frame_length * 0.001)
    window_shift = int(sample_frequency * frame_shift * 0.001)
    padded_window_size = 1 << (window_size - 1).bit_length()
    # _get_strided, snip_edges=True: m = 1 + (n - window_size) // shift
    m = 1 + (len(wav) - window_size) // window_shift
    strided = np.stack([wav[i * window_shift: i * window_shift + window_size]
                        for i in range(m)])
    # remove_dc_offset
    strided = strided - strided.mean(axis=1, keepdims=True)
    # preemphasis: first column uses replicate-padded previous sample
    offset = np.concatenate([strided[:, :1], strided[:, :-1]], axis=1)
    strided = strided - preemphasis_coefficient * offset
    # 'hanning' -> torch.hann_window(window_size, periodic=False)
    n = np.arange(window_size, dtype=np.float64)
    strided = strided * (0.5 - 0.5 * np.cos(2.0 * np.pi * n
                                            / (window_size - 1)))
    # zero-pad to padded_window_size, |rfft|^2
    padded = np.zeros((m, padded_window_size))
    padded[:, :window_size] = strided
    spectrum = np.abs(np.fft.rfft(padded, axis=1)) ** 2.0
    # mel banks get a zero column appended for the nyquist bin
    banks = _oracle_get_mel_banks(num_mel_bins, padded_window_size,
                                  sample_frequency)
    banks = np.concatenate(
        [banks, np.zeros((num_mel_bins, 1))], axis=1)
    mel_energies = spectrum @ banks.T
    eps = float(np.finfo(np.float32).eps)
    return np.log(np.maximum(mel_energies, eps))


@pytest.mark.parametrize("num_samples", [
    400,        # exactly one window
    32000,      # the 2 s clip length the pipeline uses
    32000 + 73, # snip_edges boundary: trailing partial frame dropped
    559,        # one frame + 159 trailing samples (boundary just below 2nd)
    560,        # exactly two frames
])
def test_kaldi_fbank_numeric_parity(num_samples):
    from anyref_tpu.ops.mel import kaldi_fbank
    rng = np.random.default_rng(num_samples)
    wav = rng.standard_normal(num_samples).astype(np.float32)
    got = np.asarray(kaldi_fbank(jnp.asarray(wav)))
    want = oracle_kaldi_fbank(wav)
    assert got.shape == want.shape
    # float32 pipeline vs float64 oracle: log-mel values are O(1)-O(10)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_kaldi_fbank_log_floor_on_silence():
    from anyref_tpu.ops.mel import kaldi_fbank
    wav = np.zeros(32000, np.float32)
    got = np.asarray(kaldi_fbank(jnp.asarray(wav)))
    # all-zero frames stay zero through DC removal/preemph; every mel energy
    # hits the float32-eps floor
    np.testing.assert_allclose(
        got, np.log(np.finfo(np.float32).eps), rtol=1e-6)


def test_kaldi_fbank_preemph_first_sample_replication():
    """An impulse at sample 0 exercises the replicate-padded preemphasis:
    frame0[0] must be (1-0.97)*x0 (replication), not x0 (zero padding)."""
    from anyref_tpu.ops.mel import kaldi_fbank
    wav = np.zeros(800, np.float32)
    wav[0] = 1.0
    got = np.asarray(kaldi_fbank(jnp.asarray(wav)))
    want = oracle_kaldi_fbank(wav)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # cross-check against a deliberately-wrong zero-padded preemph oracle:
    # the two must differ measurably on this input
    wav64 = wav.astype(np.float64)
    frame = wav64[:400] - wav64[:400].mean()
    wrong_first = frame[0]                      # zero-pad preemph keeps x0
    right_first = frame[0] - 0.97 * frame[0]    # replication shrinks it
    assert not np.isclose(wrong_first, right_first)


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


def test_clip_timepoints_pytorchvideo_spacing():
    """ConstantClipsPerVideoSampler divides max_possible_start by
    clips_per_video (uniform_clip = delta / N, start_i = i * uniform):
    a 5 s audio yields starts 0/1/2 s — NOT the delta/(N-1) endpoints
    spacing (0/1.5/3) a linspace would give."""
    from anyref_tpu.ops.mel import clip_timepoints

    pts = clip_timepoints(5.0, clip_duration=2.0, clips_per_audio=3)
    assert pts == [(0.0, 2.0), (1.0, 3.0), (2.0, 4.0)]
    # audio shorter than one clip: all three clips start at 0
    pts = clip_timepoints(1.0, clip_duration=2.0, clips_per_audio=3)
    assert [s for s, _ in pts] == [0.0, 0.0, 0.0]


def test_short_audio_pads_mel_frames_not_waveform():
    """ImageBind waveform2melspec computes fbank on the SHORT clip and
    zero-pads the log-mel FRAMES to target_length; padding the waveform
    would fill the tail with log(EPS) ~ -15.9 frames. After normalization
    the padded frames must equal exactly (0 - mean)/std."""
    from anyref_tpu.ops.mel import audio_to_mel_clips

    rng = np.random.default_rng(3)
    wav = rng.standard_normal(16000).astype(np.float32)     # 1 s
    mean, std = -4.268, 9.138
    clips = audio_to_mel_clips(wav, mean=mean, std=std)
    # 1 s -> 1 + (16000-400)//160 = 98 real frames; 98..203 are frame pad
    pad = clips[0, 0, :, 98:]
    np.testing.assert_allclose(pad, (0.0 - mean) / std, rtol=0, atol=1e-6)
    real = clips[0, 0, :, :98]
    assert not np.allclose(real, (0.0 - mean) / std)
