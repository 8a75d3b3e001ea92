"""Vocoder-free mel -> audio demo (InverseMelSpectrogram).

A TTS/enhancement model emits mel spectrograms; this inverts them back to a
waveform with no learned vocoder: batched MXU-shaped NNLS mel
pseudo-inversion + fused Griffin-Lim phase recovery. Prints the mel-domain
round-trip error — the quantity the NNLS stage controls — and wall time.

Run: python examples/mel_to_audio.py
"""
import time

import numpy as np
import jax

from nnaudio_tpu import features

SR, N_FFT, N_MELS, HOP = 22050, 1024, 80, 256


def main():
    t = np.arange(2 * SR) / SR
    # two-voice test signal: a held tone + a rising sweep
    x = (np.sin(2 * np.pi * 220 * t)
         + 0.5 * np.sin(2 * np.pi * (300 + 200 * t) * t)).astype(np.float32)
    x = x[None]

    mel_layer = features.MelSpectrogram(sr=SR, n_fft=N_FFT, hop_length=HOP,
                                        n_mels=N_MELS, verbose=False)
    mel = mel_layer(x)
    print(f"mel: {mel.shape}")

    inv = features.InverseMelSpectrogram(sr=SR, n_fft=N_FFT, hop_length=HOP,
                                         n_mels=N_MELS, n_iter_nnls=64,
                                         n_iter=32, verbose=False)
    audio = inv(mel, key=jax.random.PRNGKey(0))  # compile + run
    jax.block_until_ready(audio)
    t0 = time.perf_counter()
    audio = np.asarray(inv(mel, key=jax.random.PRNGKey(0)))
    wall = time.perf_counter() - t0
    print(f"audio: {audio.shape} in {wall*1e3:.1f} ms "
          f"({audio.shape[1]/SR/wall:.1f}x real time)")

    mel2 = np.asarray(mel_layer(audio))
    m1 = np.asarray(mel)
    tt = min(m1.shape[2], mel2.shape[2])
    err = (np.linalg.norm(mel2[..., :tt] - m1[..., :tt])
           / np.linalg.norm(m1[..., :tt]))
    print(f"mel-domain round-trip rel err: {err:.3f}")


if __name__ == "__main__":
    main()
