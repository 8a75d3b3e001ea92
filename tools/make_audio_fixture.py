"""Build the committed REAL-audio test fixture + its frozen reference oracles.

The reference's tests load actual recorded music (librosa.example('vibeace'),
/root/reference/Installation/tests/test_stft.py:23); this zero-egress image
cannot download audio, so the closest real-recording equivalent available is
CPython's test-suite guitar pluck (Lib/test/audiodata/pluck-pcm32.wav — a
0.3 s real instrument recording, PSF-licensed test data). This script:

1. resamples the pluck to 22050 Hz mono and overlap-adds it at several
   onsets/gains (amplitude + placement only — no synthesis) into a 2.0 s
   "performance" with real harmonic decay structure and transients,
   -> tests/ground-truths/real_audio_22050.npy
2. freezes the torch reference's outputs on that clip
   -> tests/ground-truths/real_audio_oracles.npz

Both artifacts are committed; tests/test_real_audio.py asserts parity against
them on any machine. Regenerating needs the reference mount + torch + the
pluck wav (any CPython checkout).

Usage: python tools/make_audio_fixture.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

REF = "/root/reference/Installation"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests",
                   "ground-truths")
PLUCK_CANDIDATES = [
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
    "test/audiodata/pluck-pcm32.wav",
]

SR = 22050
ONSETS_S = [0.0, 0.28, 0.55, 0.80, 1.10, 1.32, 1.60]
GAINS = [1.0, 0.75, 0.9, 0.6, 1.0, 0.5, 0.85]
DUR_S = 2.0


def build_clip() -> np.ndarray:
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    path = next((p for p in PLUCK_CANDIDATES if os.path.exists(p)), None)
    if path is None:
        raise SystemExit("pluck-pcm32.wav not found (need a CPython tree)")
    sr0, a = wavfile.read(path)  # 11025 Hz stereo int32
    mono = a.astype(np.float64).mean(axis=1)
    mono /= np.abs(mono).max()
    up = SR // int(sr0)
    assert SR == int(sr0) * up, (SR, sr0)
    pluck = resample_poly(mono, up, 1)

    clip = np.zeros(int(DUR_S * SR), np.float64)
    for t0, g in zip(ONSETS_S, GAINS):
        i = int(t0 * SR)
        seg = pluck[: len(clip) - i]
        clip[i : i + len(seg)] += g * seg
    clip /= np.abs(clip).max()
    return clip.astype(np.float32)


def main():
    os.makedirs(OUT, exist_ok=True)
    clip = build_clip()
    np.save(os.path.join(OUT, "real_audio_22050.npy"), clip)
    print("clip:", clip.shape, clip.dtype, "peak", np.abs(clip).max())

    sys.path.insert(0, REF)
    import scipy.signal

    if not hasattr(scipy.signal, "blackmanharris"):
        scipy.signal.blackmanharris = scipy.signal.windows.blackmanharris
    import torch
    from nnAudio import features as ref

    xt = torch.tensor(clip[None])
    arrays: dict[str, np.ndarray] = {"input": clip, "sr": np.array(SR)}
    with torch.no_grad():
        arrays["stft_complex_1024_256"] = ref.STFT(
            n_fft=1024, hop_length=256, output_format="Complex",
            verbose=False)(xt).numpy()
        arrays["mel_128"] = ref.MelSpectrogram(
            sr=SR, n_fft=1024, hop_length=256, n_mels=128,
            verbose=False)(xt).numpy()
        arrays["mfcc_20"] = ref.MFCC(
            sr=SR, n_mfcc=20, n_fft=1024, hop_length=256,
            verbose=False)(xt).numpy()
        arrays["gammatone_64"] = ref.Gammatonegram(
            sr=SR, n_fft=1024, hop_length=256, n_bins=64,
            verbose=False)(xt).numpy()
        arrays["cqt1992v2_84"] = ref.CQT1992v2(
            sr=SR, fmin=32.70, n_bins=84, bins_per_octave=12, hop_length=512,
            output_format="Magnitude", verbose=False)(xt).numpy()
        arrays["cqt2010v2_84"] = ref.CQT2010v2(
            sr=SR, fmin=32.70, n_bins=84, bins_per_octave=12, hop_length=512,
            output_format="Magnitude", verbose=False)(xt).numpy()
        arrays["vqt_84_g2"] = ref.VQT(
            sr=SR, fmin=32.70, n_bins=84, bins_per_octave=12, hop_length=512,
            gamma=2, verbose=False)(xt).numpy()

    out = os.path.join(OUT, "real_audio_oracles.npz")
    np.savez_compressed(out, **arrays)
    print("oracles:", out, f"{os.path.getsize(out)/1e6:.2f} MB",
          sorted(arrays))


if __name__ == "__main__":
    main()
