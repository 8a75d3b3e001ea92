"""Freeze ground-truth artifacts from the torch reference implementation.

Runs the original nnAudio package (mounted read-only at /root/reference) on
deterministic chirp inputs and writes `.npz` oracles under
`tests/ground-truths/`. These complement the reference repo's own frozen
`.npy` files (which tests read directly from the mount when present): the
files produced here cover configs the reference never froze (Mel, MFCC,
Gammatone, VQT with gamma, iSTFT round-trip inputs) so the suite can assert
reference parity without torch installed.

Usage: python tools/make_ground_truths.py   (requires torch + the mount)
"""
from __future__ import annotations

import os
import sys

import numpy as np

REF = "/root/reference/Installation"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "ground-truths")


def main():
    sys.path.insert(0, REF)
    import scipy.signal

    if not hasattr(scipy.signal, "blackmanharris"):
        scipy.signal.blackmanharris = scipy.signal.windows.blackmanharris
    import torch
    from scipy.signal import chirp
    from nnAudio import features as ref

    os.makedirs(OUT, exist_ok=True)

    fs = 16000
    s = np.linspace(0, 1, fs)
    x = chirp(s, 40, 1, 8000, method="logarithmic").astype(np.float32)
    xt = torch.tensor(x[None])
    arrays = {"input": x, "sr": np.array(fs)}

    arrays["stft_complex_1024_256"] = ref.STFT(
        n_fft=1024, hop_length=256, output_format="Complex", verbose=False
    )(xt).numpy()
    arrays["mel_128"] = ref.MelSpectrogram(
        sr=fs, n_fft=1024, hop_length=256, n_mels=128, verbose=False
    )(xt).numpy()
    arrays["mfcc_20"] = ref.MFCC(
        sr=fs, n_mfcc=20, n_fft=1024, hop_length=256, verbose=False
    )(xt).numpy()
    arrays["gammatone_64"] = ref.Gammatonegram(
        sr=fs, n_fft=1024, hop_length=256, n_bins=64, verbose=False
    )(xt).numpy()
    arrays["cqt1992v2_48"] = ref.CQT1992v2(
        sr=fs, fmin=55, n_bins=48, bins_per_octave=12, hop_length=256,
        output_format="Complex", verbose=False
    )(xt).numpy()
    arrays["cqt2010v2_48"] = ref.CQT2010v2(
        sr=fs, fmin=55, n_bins=48, bins_per_octave=12, hop_length=256,
        output_format="Complex", verbose=False
    )(xt).numpy()
    arrays["vqt_g2_48"] = ref.VQT(
        sr=fs, fmin=55, n_bins=48, bins_per_octave=12, hop_length=256,
        gamma=2, output_format="Complex", verbose=False
    )(xt).numpy()
    arrays["cfp_Z"] = ref.CFP()(xt).numpy()
    arrays["cqt1992_40"] = ref.CQT1992(
        sr=fs, fmin=220, n_bins=40, bins_per_octave=12, hop_length=256,
        output_format="Complex"
    )(xt, output_format="Complex").numpy()
    arrays["cqt2010_48"] = ref.CQT2010(
        sr=fs, fmin=55, n_bins=48, bins_per_octave=12, hop_length=256,
        output_format="Complex", verbose=False
    )(xt, output_format="Complex").numpy()
    arrays["vqt_g5_48"] = ref.VQT(
        sr=fs, fmin=55, n_bins=48, bins_per_octave=12, hop_length=256,
        gamma=5, output_format="Complex", verbose=False
    )(xt).numpy()
    arrays["stft_hamming_short_win"] = ref.STFT(
        n_fft=1024, win_length=400, hop_length=160, window="hamming",
        output_format="Complex", verbose=False
    )(xt).numpy()
    arrays["stft_linear_scale"] = ref.STFT(
        n_fft=1024, freq_bins=128, hop_length=256, freq_scale="linear",
        fmin=50, fmax=6000, sr=fs, output_format="Complex", verbose=False
    )(xt).numpy()
    arrays["istft_roundtrip"] = ref.iSTFT(
        n_fft=1024, hop_length=256, verbose=False
    )(torch.tensor(arrays["stft_complex_1024_256"]), onesided=True,
      length=fs).numpy()

    path = os.path.join(OUT, "reference_oracles.npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path}: " + ", ".join(sorted(arrays)))


if __name__ == "__main__":
    main()
