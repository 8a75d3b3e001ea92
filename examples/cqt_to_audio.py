"""CQT -> audio: complex inversion and magnitude-only Griffin-Lim.

Beyond-reference capability (librosa: icqt / griffinlim_cqt; the torch
reference has no way back from a CQT). Run anywhere:

    python examples/cqt_to_audio.py
"""
import numpy as np
import jax

from nnaudio_tpu import features

sr, hop = 22050, 128
t = np.arange(sr) / sr
x = sum(np.sin(2 * np.pi * f * t + i)
        for i, f in enumerate([110, 220, 440, 523.25, 660])
        ).astype(np.float32)[None]

# keep hop <= lenghts.min()/2 so the top-octave envelopes are well-sampled
cqt = features.CQT1992v2(sr=sr, fmin=55, n_bins=48, hop_length=hop,
                         output_format="Complex", verbose=False)

# complex CQT -> audio: canonical-dual synthesis (one fused matmul+OLA)
X = cqt(x)
xr = np.asarray(cqt.inverse(X, length=x.shape[-1]))
core = slice(4096, x.shape[-1] - 4096)
err = xr[:, core] - x[:, core]
print("icqt SNR: %.1f dB"
      % (10 * np.log10((x[:, core] ** 2).sum() / (err ** 2).sum())))

# pyramid CQT -> audio: the multirate pyramid collapses into one
# single-rate dual bank (reconstruction at the original rate)
pyr = features.CQT2010v2(sr=sr, fmin=55, n_bins=48, hop_length=hop,
                         earlydownsample=False, output_format="Complex",
                         verbose=False)
xp = np.asarray(pyr.inverse(pyr(x), length=x.shape[-1]))
errp = xp[:, core] - x[:, core]
print("icqt (CQT2010v2 pyramid) SNR: %.1f dB"
      % (10 * np.log10((x[:, core] ** 2).sum() / (errp ** 2).sum())))

# magnitude CQT -> audio: Griffin-Lim over the CQT frame
S = cqt(x, output_format="Magnitude")
gl = features.GriffinLimCQT(sr=sr, fmin=55, n_bins=48, hop_length=hop,
                            n_iter=32, verbose=False)
xg = np.asarray(gl(S, key=jax.random.PRNGKey(0), length=x.shape[-1]))
S2 = np.asarray(cqt(xg, output_format="Magnitude"))
m = min(np.asarray(S).shape[2], S2.shape[2])
rel = (np.linalg.norm(S2[:, :, :m] - np.asarray(S)[:, :, :m])
       / np.linalg.norm(np.asarray(S)))
print("griffinlim_cqt spectral convergence: %.3f" % rel)
