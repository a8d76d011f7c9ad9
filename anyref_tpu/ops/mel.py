"""Kaldi-compatible log-mel filterbank front-end as XLA ops.

Replaces the reference's torchaudio pipeline (ImageBind data.py:28-64,
114-161): waveform -> 3 x 2s clips -> kaldi fbank (25ms/10ms hanning window,
128 mel bins, 16 kHz, dither 0, htk_compat) -> pad/crop to 204 frames ->
normalize(mean -4.268, std 9.138).

Everything is expressed as framing (gather), windowed real FFT (jnp.fft.rfft)
and a mel-weight matmul, so the front-end jits onto the device with the rest
of the model — no host torchaudio dependency. Numerics follow
torchaudio.compliance.kaldi.fbank semantics:
  * snip_edges framing: frame i covers samples [i*160, i*160+400);
  * remove_dc_offset per frame;
  * preemphasis 0.97 with first-sample replication;
  * symmetric hann window, FFT padded to 512;
  * power spectrum; mel banks on 256 fft bins, kaldi low_freq=20,
    high_freq=nyquist; log(max(e, eps)).
(torchaudio is not installed in this environment; validated element-wise
against an independent float64 NumPy transcription of the torchaudio kaldi
algorithm — tests/test_imagebind_parity.py oracle_kaldi_fbank — including
snip_edges boundaries, preemph first-sample replication, and the log floor.)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


MEL_LOW_FREQ = 20.0
PREEMPH = 0.97
EPS = 1.1920928955078125e-07  # float32 epsilon (torchaudio _get_epsilon)


def _mel(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


@functools.lru_cache(maxsize=8)
def _mel_banks(num_bins: int, fft_len: int, sample_rate: float) -> np.ndarray:
    """Kaldi-style triangular mel filterbank, [num_bins, fft_len//2]."""
    nyquist = 0.5 * sample_rate
    num_fft_bins = fft_len // 2
    fft_bin_width = sample_rate / fft_len
    mel_low = _mel(MEL_LOW_FREQ)
    mel_high = _mel(nyquist)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    bins = np.zeros((num_bins, num_fft_bins), np.float32)
    fft_freqs = fft_bin_width * np.arange(num_fft_bins)
    mel_freqs = _mel(fft_freqs)
    for b in range(num_bins):
        left = mel_low + b * mel_delta
        center = mel_low + (b + 1) * mel_delta
        right = mel_low + (b + 2) * mel_delta
        up = (mel_freqs - left) / (center - left)
        down = (right - mel_freqs) / (right - center)
        bins[b] = np.maximum(0.0, np.minimum(up, down)).astype(np.float32)
    return bins


def kaldi_fbank(waveform: jax.Array, sample_rate: int = 16000,
                num_mel_bins: int = 128, frame_length_ms: float = 25.0,
                frame_shift_ms: float = 10.0) -> jax.Array:
    """waveform: [..., N] float -> log-mel [..., num_frames, num_mel_bins]."""
    win = int(sample_rate * frame_length_ms / 1000.0)      # 400
    shift = int(sample_rate * frame_shift_ms / 1000.0)     # 160
    fft_len = 1 << (win - 1).bit_length()                   # 512
    N = waveform.shape[-1]
    num_frames = 1 + (N - win) // shift

    idx = (jnp.arange(num_frames)[:, None] * shift
           + jnp.arange(win)[None, :])                      # [F, win]
    frames = waveform[..., idx].astype(jnp.float32)         # [..., F, win]
    # remove per-frame DC offset
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # preemphasis with first-sample replication
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - PREEMPH * prev
    # symmetric hann window
    n = np.arange(win)
    hann = (0.5 - 0.5 * np.cos(2.0 * math.pi * n / (win - 1))).astype(np.float32)
    frames = frames * hann
    # power spectrum on padded FFT
    spec = jnp.fft.rfft(frames, n=fft_len, axis=-1)
    power = jnp.square(jnp.abs(spec))[..., : fft_len // 2]  # drop nyquist bin
    mel = power @ jnp.asarray(_mel_banks(num_mel_bins, fft_len,
                                         float(sample_rate))).T
    return jnp.log(jnp.maximum(mel, EPS))


def clip_timepoints(duration_s: float, clip_duration: float = 2.0,
                    clips_per_audio: int = 3) -> list[tuple[float, float]]:
    """ConstantClipsPerVideoSampler semantics (reference data.py:67-76):
    pytorchvideo spaces clip starts by max(duration - clip_dur, 0) divided
    by clips_per_video (NOT clips-1): uniform_clip = max_possible_start / N,
    start_i = i * uniform_clip — a 5 s audio yields starts 0/1/2 s."""
    delta = max(duration_s - clip_duration, 0.0)
    uniform = delta / max(clips_per_audio, 1)
    return [(i * uniform, i * uniform + clip_duration)
            for i in range(clips_per_audio)]


def audio_to_mel_clips(waveform: np.ndarray, sample_rate: int = 16000,
                       num_mel_bins: int = 128, target_len: int = 204,
                       clip_duration: float = 2.0, clips_per_audio: int = 3,
                       mean: float = -4.268, std: float = 9.138) -> np.ndarray:
    """Full front-end for one audio: [N] -> [clips, 1, mel_bins, target_len]
    (reference load_and_transform_audio_data, data.py:114-161). Host entry:
    runs the jitted fbank per fixed-size clip.
    """
    wav = np.asarray(waveform, np.float32)
    wav = wav - wav.mean()  # reference data.py:30 (per-file mean removal)
    duration = len(wav) / sample_rate
    clips = []
    for start, end in clip_timepoints(duration, clip_duration, clips_per_audio):
        s = int(start * sample_rate)
        e = int(end * sample_rate)
        clip = wav[s:e]
        # short audio: the reference (ImageBind waveform2melspec) computes
        # fbank on the SHORT clip and zero-pads the log-mel FRAMES — padding
        # the waveform instead would fill the tail with log(EPS) ~ -15.9
        # frames and sharply diverge the audio embedding
        if len(clip) >= int(0.025 * sample_rate):   # >= one 25 ms window
            fb = np.asarray(kaldi_fbank(jnp.asarray(clip), sample_rate,
                                        num_mel_bins))      # [F, mel]
            fb = fb.T                                        # [mel, F]
        else:
            fb = np.zeros((num_mel_bins, 0), np.float32)
        p = target_len - fb.shape[1]
        if p > 0:
            fb = np.pad(fb, ((0, 0), (0, p)))
        elif p < 0:
            fb = fb[:, :target_len]
        clips.append(fb[None])                               # [1, mel, T]
    out = np.stack(clips)                                    # [C, 1, mel, T]
    return (out - mean) / std
