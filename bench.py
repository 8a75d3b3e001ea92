"""Benchmark harness: the full BASELINE.md target table on the available chip.

Prints one JSON line per metric: {"metric", "value", "unit", "vs_baseline",
"median", "spread"} — value/median are the best/median of 6 timed repeats
(the shared chip drifts ±30-50%; spread = repeat range / best repeat makes
round-over-round deltas attributable). The headline STFT magnitude metric is
printed LAST (drivers that parse a single line keep the round-1 metric
continuity).

Metrics follow BASELINE.md "Targets for the TPU build":
  - STFT n_fft=2048 hop=512 magnitude (headline) + fast bf16 mode
  - MelSpectrogram(128) and MFCC(20), batched
  - CQT1992v2, CQT2010v2 and VQT (84 bins, 12/octave) + fast modes
  - CFP at its reference rate (fs=16k, hop=320)
  - iSTFT and Griffin-Lim (32 iters, on-device lax.fori_loop)
  - trainable STFT end-to-end train step (forward+grad+SGD update)
  - STFT magnitude max-abs-err vs the live reference (accuracy row)

``vs_baseline`` is the ratio to the ACTUAL reference package (nnAudio from
/root/reference, torch fp32) run on this host's CPU — the only hardware the
reference runs on here. The reference publishes no machine-readable numbers
(BASELINE.json "published": {}), so a live same-host measurement is the
fairest available denominator. None when the reference mount is absent.

Measurement notes (hard-won on the axon TPU tunnel):
- ``block_until_ready`` does NOT synchronize through the tunnel; only a
  host fetch does. We chain ITERS forward passes inside one jit via a scalar
  data dependency (each iteration's input is perturbed by the previous
  output, so XLA cannot hoist or dedupe) and fetch one scalar at the end.
- Round 5: the host-fetch roundtrip itself measured ~25-27 ms through the
  tunnel (tools/profile_r5_chainstage.py) — at iters=8 that is ~3.4 ms/call
  of NON-DEVICE overhead inside every rounds-1-4 number (30-60% of the
  train-step rows). The floor is now measured at startup
  (_measure_tunnel_floor) and subtracted; ``raw_value`` keeps the old
  methodology for round-over-round continuity. On a local host the floor
  is microseconds and the correction vanishes.
- The chained scalar must be a FULL reduction (``jnp.sum``) of each output:
  consuming a single element lets XLA dead-code-shrink the matmuls.
- Large arrays in a fori_loop carry deoptimize badly; the chain keeps only
  a scalar carry.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

SR = 22050
N_FFT = 2048
HOP = 512
BATCH = 32
SECONDS = 10.0
LENGTH = int(SR * SECONDS)
AUDIO_S = BATCH * SECONDS

REF_PATH = "/root/reference/Installation"


# ---------------------------------------------------------------- TPU side

#: measured host-fetch roundtrip through the axon tunnel (seconds); 0 on a
#: local host. Set once by _measure_tunnel_floor() before any TPU metric.
_TUNNEL_FLOOR_S = 0.0


def _measure_tunnel_floor():
    """One trivial jit + host fetch, repeated: its wall time is pure
    dispatch+fetch roundtrip (measured ~25-27 ms through the axon tunnel,
    round 5 — tools/profile_r5_chainstage.py). Every timed loop below pays
    this constant ONCE per run() regardless of iters, so each per-call
    time carries floor/iters of non-device overhead; _stats subtracts it.
    On a local host the floor is ~50 us and the correction is a no-op."""
    global _TUNNEL_FLOOR_S
    import jax

    s = jax.device_put(np.float32(1.0))
    f = jax.jit(lambda a: a + 1.0)
    float(f(s))
    ts = []
    for _ in range(12):
        t0 = time.perf_counter()
        float(f(s))
        ts.append(time.perf_counter() - t0)
    _TUNNEL_FLOOR_S = min(ts)


def _stats(times, iters):
    """min/median/spread per-call stats from repeat wall times. The shared
    chip drifts ±30-50% across sessions; min is the least noise-contaminated
    point estimate, median + spread make round-over-round deltas
    attributable (VERDICT r2 item 10). Each wall time is corrected by the
    measured tunnel fetch floor (see _measure_tunnel_floor) — the raw
    (uncorrected, rounds 1-4 methodology) min is kept as raw_min_s."""
    ts_raw = sorted(t / iters for t in times)
    ts = sorted(max(t - _TUNNEL_FLOOR_S, 1e-9) / iters for t in times)
    n = len(ts)
    med = ts[n // 2] if n % 2 else 0.5 * (ts[n // 2 - 1] + ts[n // 2])
    return {"min_s": ts[0], "med_s": med,
            "spread": (ts[-1] - ts[0]) / ts[0],
            "raw_min_s": ts_raw[0]}


def _timeit(fn, x, iters=32, repeats=6, extra=None):
    """Audio-agnostic per-call stats for one fn(x) call, tunnel-safe."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(xx):
        acc = 0.0
        for _ in range(iters):
            y = fn(xx * (1 + acc * 1e-20)) if extra is None else fn(
                xx * (1 + acc * 1e-20), extra)
            acc = acc + (jnp.sum(y) if not isinstance(y, tuple)
                         else sum(jnp.sum(v) for v in y))
        return acc

    float(loop(x))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(loop(x))
        times.append(time.perf_counter() - t0)
    return _stats(times, iters)



def _thr(stats, audio_s=AUDIO_S):
    """Throughput rows from per-call stats: value = audio-s/s at the min
    time (tunnel-floor-corrected — device-true), median at the median time,
    spread = repeat-to-repeat range, raw_value = the rounds-1-4
    uncorrected methodology for continuity."""
    return {"value": audio_s / stats["min_s"],
            "median": audio_s / stats["med_s"],
            "spread": stats["spread"],
            "raw_value": audio_s / stats["raw_min_s"]}

def tpu_metrics() -> dict[str, dict]:
    import jax
    import jax.numpy as jnp
    from nnaudio_tpu import features, fast_mode

    _measure_tunnel_floor()
    out = {}
    x = jax.device_put(
        np.random.RandomState(0).randn(BATCH, LENGTH).astype(np.float32))

    st = features.STFT(n_fft=N_FFT, hop_length=HOP,
                       output_format="Magnitude", verbose=False)
    sp = dict(st.forward_params)
    out["stft"] = _thr(_timeit(
        lambda xx: st._forward(sp, xx, output_format="Magnitude"), x))
    with fast_mode():
        stf = features.STFT(n_fft=N_FFT, hop_length=HOP,
                            output_format="Magnitude", verbose=False)
        spf = dict(stf.forward_params)
        out["stft_fast"] = _thr(_timeit(
            lambda xx: stf._forward(spf, xx, output_format="Magnitude"), x))

    mel = features.MelSpectrogram(sr=SR, n_fft=N_FFT, hop_length=HOP,
                                  n_mels=128, verbose=False)
    mp = dict(mel.forward_params)
    out["mel"] = _thr(_timeit(lambda xx: mel._forward(mp, xx), x))
    with fast_mode():
        melf = features.MelSpectrogram(sr=SR, n_fft=N_FFT, hop_length=HOP,
                                       n_mels=128, verbose=False)
        mpf = dict(melf.forward_params)
        out["mel_fast"] = _thr(_timeit(
            lambda xx: melf._forward(mpf, xx), x))

    mf = features.MFCC(sr=SR, n_mfcc=20, verbose=False)
    fp = dict(mf.forward_params)
    out["mfcc"] = _thr(_timeit(lambda xx: mf._forward(fp, xx), x))

    q = features.CQT1992v2(sr=SR, hop_length=HOP, n_bins=84,
                           bins_per_octave=12, verbose=False)
    qp = dict(q.forward_params)
    out["cqt1992v2"] = _thr(_timeit(
        lambda xx: q._forward(qp, xx, output_format="Magnitude",
                              normalization_type="librosa"), x))
    with fast_mode():
        qf = features.CQT1992v2(sr=SR, hop_length=HOP, n_bins=84,
                                bins_per_octave=12, verbose=False)
        qfp = dict(qf.forward_params)
        out["cqt1992v2_fast"] = _thr(_timeit(
            lambda xx: qf._forward(qfp, xx, output_format="Magnitude",
                                   normalization_type="librosa"), x))

    vq = features.VQT(sr=SR, hop_length=HOP, n_bins=84, bins_per_octave=12,
                      gamma=2, verbose=False)
    vp = dict(vq.forward_params)
    out["vqt"] = _thr(_timeit(
        lambda xx: vq._forward(vp, xx, output_format="Magnitude",
                               normalization_type="librosa"), x))
    with fast_mode():
        vqf = features.VQT(sr=SR, hop_length=HOP, n_bins=84,
                           bins_per_octave=12, gamma=2, verbose=False)
        vfp = dict(vqf.forward_params)
        out["vqt_fast"] = _thr(_timeit(
            lambda xx: vqf._forward(vfp, xx, output_format="Magnitude",
                                    normalization_type="librosa"), x))

    c10 = features.CQT2010v2(sr=SR, hop_length=HOP, n_bins=84,
                             bins_per_octave=12, verbose=False)
    cp10 = dict(c10.forward_params)
    out["cqt2010v2"] = _thr(_timeit(
        lambda xx: c10._forward(cp10, xx, output_format="Magnitude",
                                normalization_type="librosa"), x))
    with fast_mode():
        c10f = features.CQT2010v2(sr=SR, hop_length=HOP, n_bins=84,
                                  bins_per_octave=12, verbose=False)
        cp10f = dict(c10f.forward_params)
        out["cqt2010v2_fast"] = _thr(_timeit(
            lambda xx: c10f._forward(cp10f, xx, output_format="Magnitude",
                                     normalization_type="librosa"), x))

    # CFP runs at its reference sampling rate (16 kHz); audio-s rescaled
    cfp_x = jax.device_put(
        np.random.RandomState(2).randn(BATCH, 160000).astype(np.float32))
    cfp = features.Combined_Frequency_Periodicity(fs=16000, hop_length=320)
    cfpp = dict(cfp.forward_params)
    out["cfp"] = _thr(_timeit(
        lambda xx: cfp._forward(cfpp, xx), cfp_x, iters=4))

    X = jax.device_put(np.asarray(st._forward(sp, x, output_format="Complex")))
    ist = features.iSTFT(n_fft=N_FFT, hop_length=HOP, verbose=False)
    ip = dict(ist.forward_params)
    out["istft"] = _thr(_timeit(
        lambda XX: ist._forward(ip, XX, onesided=True, length=LENGTH), X))

    S = jax.device_put(np.abs(np.asarray(X[..., 0])))
    gl = features.Griffin_Lim(n_fft=N_FFT, hop_length=HOP, n_iter=32)
    glp = dict(gl.forward_params)
    key = jax.random.PRNGKey(0)
    out["griffin_lim"] = _thr(_timeit(
        lambda SS, k: gl._forward(glp, SS, k), S, iters=2, extra=key))

    # vocoder-free mel->audio (beyond-reference; no denominator exists)
    inv = features.InverseMelSpectrogram(sr=SR, n_fft=N_FFT, hop_length=HOP,
                                         n_mels=128, n_iter_nnls=64,
                                         n_iter=32, verbose=False)
    mel_in = jax.device_put(np.asarray(mel._forward(mp, x)))
    ivp = dict(inv.forward_params)
    out["inverse_mel"] = _thr(_timeit(
        lambda MM, k: inv._forward(ivp, MM, k), mel_in, iters=2, extra=key))

    # inverse CQT (beyond-reference): one canonical-dual matmul+OLA, at an
    # inversion-friendly bank (hop <= shortest-atom/2)
    icq = features.CQT1992v2(sr=SR, hop_length=128, fmin=55, n_bins=48,
                             output_format="Complex", verbose=False)
    icqp = dict(icq.forward_params)
    Xc = jax.device_put(np.asarray(icq._forward(
        icqp, x, output_format="Complex", normalization_type="librosa")))
    ikc, iks = icq._dual_kernels("librosa", 1e-3)
    out["icqt"] = _thr(_timeit(
        lambda XX: icq._inverse(XX, ikc, iks, length=LENGTH), Xc, iters=4))

    # magnitude-only CQT inversion: 32 GL iterations over the same bank
    glc = features.GriffinLimCQT(sr=SR, hop_length=128, fmin=55, n_bins=48,
                                 n_iter=32, verbose=False)
    glcp = dict(glc.forward_params)
    Smag = jax.device_put(np.asarray(
        jnp.sqrt(Xc[..., 0] ** 2 + Xc[..., 1] ** 2)))
    out["griffinlim_cqt"] = _thr(_timeit(
        lambda SS, k: glc._forward(glcp, SS, k), Smag, iters=2, extra=key))

    # processing tier (beyond-reference): phase-locked vocoder time
    # stretch, pitch shift, and the polyphase resampler (audio-s counted
    # at the INPUT rate for all three)
    from nnaudio_tpu.core.resample import resample_poly
    from nnaudio_tpu.features.time_stretch import phase_vocoder

    ts = features.TimeStretch(n_fft=N_FFT, hop_length=HOP)
    tsp, tip = dict(ts._stft._params), dict(ts._istft._params)
    ts_rate = 1.25
    ts_len = int(round(LENGTH / ts_rate))

    def ts_run(xx):
        X = ts._stft._forward(tsp, xx, output_format="Complex")
        Y = phase_vocoder(X, ts_rate, HOP, phase_lock=True)
        return ts._istft._forward(tip, Y, onesided=True, length=ts_len)

    out["time_stretch"] = _thr(_timeit(ts_run, x, iters=4))

    ps = features.PitchShift(sr=SR, n_fft=N_FFT, hop_length=HOP)
    out["pitch_shift"] = _thr(_timeit(lambda xx: ps(xx, 2.0), x, iters=2))

    # 22050 -> 16000 is the 320/441 rational case (worst-case band count)
    # device time is ~30 us/call — needs deep amortization for the
    # floor-corrected value to condition well (round-5 preview at iters=8
    # showed spread 18.6)
    out["resample"] = _thr(_timeit(
        lambda xx: resample_poly(xx, 320, 441), x, iters=128))

    # trainable end-to-end step: STFT basis + linear head under jax.grad
    stt = features.STFT(n_fft=N_FFT, hop_length=HOP,
                        output_format="Magnitude", trainable=True,
                        verbose=False)
    n_frames = LENGTH // HOP + 1
    head = jnp.zeros((N_FFT // 2 + 1, 8), jnp.float32) + 1e-3
    params0 = {**{k: jnp.asarray(v) for k, v in stt.forward_params.items()},
               "head": head}
    y_true = jax.device_put(
        np.random.RandomState(1).randn(BATCH, 8).astype(np.float32))

    def loss_fn(p, xx):
        spec = stt._forward(p, xx, output_format="Magnitude")
        pooled = spec.mean(axis=-1)  # (B, F)
        pred = pooled @ p["head"]
        return jnp.mean((pred - y_true) ** 2)

    def make_train_loop(loss):
        # a FRESH function object per precision mode: jax.jit's global
        # executable cache keys on function identity + avals and knows
        # nothing about this package's config — jitting the SAME function
        # under fast_mode() silently reuses the HIGHEST-compiled binary.
        # (This exact collision made rounds 1-2 report the train step as
        # "precision-flat at ~12 ms"; it never was — fast is ~5.5 ms.)
        def train_loop(p, xx):
            # 8 in-graph steps amortize the ~25ms tunnel dispatch roundtrip
            # (4 steps left the metric roundtrip-floored)
            acc = 0.0
            for _ in range(8):
                l, g = jax.value_and_grad(loss)(p, xx * (1 + acc * 1e-20))
                p = jax.tree_util.tree_map(lambda a, b: a - 1e-3 * b, p, g)
                acc = acc + l
            return acc, p
        return jax.jit(train_loop)

    def time_train(train_loop, params):
        a, _ = train_loop(params, x)
        float(a)
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            a, _ = train_loop(params, x)
            float(a)
            times.append(time.perf_counter() - t0)
        return _thr(_stats(times, 8))

    out["train_step"] = time_train(make_train_loop(loss_fn), params0)
    with fast_mode():
        # mixed-precision training: bf16 multiplies in fwd+bwd contractions
        out["train_step_fast"] = time_train(make_train_loop(loss_fn), params0)
    del n_frames

    # trainable-CQT train step (BASELINE config 5's "trainable CQT bases":
    # until round 4 only grad-correctness was tested, never throughput)
    qt = features.CQT1992v2(sr=SR, hop_length=HOP, n_bins=84,
                            bins_per_octave=12, trainable=True, verbose=False)
    qt_head = jnp.zeros((84, 8), jnp.float32) + 1e-3
    qt_params0 = {**{k: jnp.asarray(v) for k, v in qt.forward_params.items()},
                  "head": qt_head}

    def cqt_loss_fn(p, xx):
        spec = qt._forward(p, xx, output_format="Magnitude",
                           normalization_type="librosa")
        pred = spec.mean(axis=-1) @ p["head"]
        return jnp.mean((pred - y_true) ** 2)

    out["train_step_cqt"] = time_train(make_train_loop(cqt_loss_fn),
                                       qt_params0)
    with fast_mode():
        out["train_step_cqt_fast"] = time_train(make_train_loop(cqt_loss_fn),
                                                qt_params0)

    # flagship Mel-frontend classifier train step (models/classifier.py):
    # trainable STFT + mel bases + linear head, cross-entropy, SGD
    from nnaudio_tpu.models.classifier import SpectrogramClassifier

    clf = SpectrogramClassifier(n_classes=10, sr=SR, n_fft=N_FFT,
                                hop_length=HOP, n_mels=128)
    clf_params0 = dict(clf.init_params)
    labels = jax.device_put(
        np.random.RandomState(4).randint(0, 10, size=(BATCH,)))

    def clf_loss_fn(p, xx):
        return clf.loss_fn(p, xx, labels)

    out["train_step_classifier"] = time_train(make_train_loop(clf_loss_fn),
                                              clf_params0)
    with fast_mode():
        out["train_step_classifier_fast"] = time_train(
            make_train_loop(clf_loss_fn), clf_params0)
    return out


def tpu_accuracy_vs_reference(ref_feat, torch) -> float | None:
    """Max abs err of our TPU STFT magnitude vs the reference (torch CPU),
    itself librosa-validated at rtol/atol 1e-1 (BASELINE.md row 1)."""
    from nnaudio_tpu import features

    x = np.random.RandomState(3).randn(2, SR).astype(np.float32)
    ours = features.STFT(n_fft=N_FFT, hop_length=HOP,
                         output_format="Magnitude", verbose=False)
    mine = np.asarray(ours(x))
    theirs = ref_feat.STFT(n_fft=N_FFT, hop_length=HOP,
                           output_format="Magnitude", verbose=False)
    ref = theirs(torch.tensor(x)).numpy()
    return float(np.abs(mine - ref).max())


# ---------------------------------------------------------- reference side

def load_reference():
    sys.path.insert(0, REF_PATH)
    import scipy.signal

    if not hasattr(scipy.signal, "blackmanharris"):
        scipy.signal.blackmanharris = scipy.signal.windows.blackmanharris
    import torch
    from nnAudio import features as ref_feat

    return ref_feat, torch


def _ref_time(fn, iters=2):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def reference_metrics(ref_feat, torch) -> dict[str, float]:
    """The actual reference package, fp32 torch CPU, audio-s/s. Each metric
    is independently fault-tolerant (e.g. the reference's Griffin_Lim crashes
    on modern torch: its torch.istft call predates return_complex=True)."""
    out = {}
    b = 2  # keep CPU wall time bounded; throughput is per audio-second
    audio = b * SECONDS
    x = torch.randn(b, LENGTH)

    def attempt(key, build, run, audio_s=audio, iters=2, grad=False):
        try:
            obj = build()
            if grad:
                out[key] = audio_s / _ref_time(lambda: run(obj), iters=iters)
            else:
                with torch.no_grad():
                    out[key] = audio_s / _ref_time(lambda: run(obj),
                                                   iters=iters)
        except Exception:
            pass

    attempt("stft",
            lambda: ref_feat.STFT(n_fft=N_FFT, hop_length=HOP,
                                  output_format="Magnitude", verbose=False),
            lambda m: m(x))
    if "stft" in out:
        out["stft_fast"] = out["stft"]  # reference has no reduced precision
    attempt("mel",
            lambda: ref_feat.MelSpectrogram(sr=SR, n_fft=N_FFT,
                                            hop_length=HOP, n_mels=128,
                                            verbose=False),
            lambda m: m(x))
    attempt("mfcc",
            lambda: ref_feat.MFCC(sr=SR, n_mfcc=20, verbose=False),
            lambda m: m(x))
    attempt("cqt1992v2",
            lambda: ref_feat.CQT1992v2(sr=SR, hop_length=HOP, n_bins=84,
                                       bins_per_octave=12, verbose=False),
            lambda m: m(x))
    attempt("vqt",
            lambda: ref_feat.VQT(sr=SR, hop_length=HOP, n_bins=84,
                                 bins_per_octave=12, gamma=2, verbose=False),
            lambda m: m(x))
    attempt("cqt2010v2",
            lambda: ref_feat.CQT2010v2(sr=SR, hop_length=HOP, n_bins=84,
                                       bins_per_octave=12, verbose=False),
            lambda m: m(x))
    x16 = torch.randn(b, 160000)
    attempt("cfp",
            lambda: ref_feat.Combined_Frequency_Periodicity(fs=16000,
                                                            hop_length=320),
            lambda m: m(x16))

    stc = ref_feat.STFT(n_fft=N_FFT, hop_length=HOP, output_format="Complex",
                        iSTFT=True, verbose=False)
    with torch.no_grad():
        X = stc(x)
    attempt("istft", lambda: stc,
            lambda m: m.inverse(X, onesided=True, length=LENGTH))
    S = torch.sqrt(torch.clamp(X[..., 0] ** 2 + X[..., 1] ** 2, min=0))
    attempt("griffin_lim",
            lambda: ref_feat.Griffin_Lim(n_fft=N_FFT, hop_length=HOP,
                                         n_iter=32),
            lambda m: m(S[:1]), audio_s=SECONDS, iters=1)

    def build_train():
        stt = ref_feat.STFT(n_fft=N_FFT, hop_length=HOP,
                            output_format="Magnitude", trainable=True,
                            verbose=False)
        head = torch.nn.Linear(N_FFT // 2 + 1, 8)
        opt = torch.optim.SGD(
            list(stt.parameters()) + list(head.parameters()), lr=1e-3)
        y_true = torch.randn(b, 8)
        return stt, head, opt, y_true

    def run_train(state):
        stt, head, opt, y_true = state
        opt.zero_grad()
        spec = stt(x)
        loss = ((head(spec.mean(-1)) - y_true) ** 2).mean()
        loss.backward()
        opt.step()

    attempt("train_step", build_train, run_train, iters=1, grad=True)

    def build_cqt_train():
        stt = ref_feat.CQT1992v2(sr=SR, hop_length=HOP, n_bins=84,
                                 bins_per_octave=12, trainable=True,
                                 verbose=False)
        head = torch.nn.Linear(84, 8)
        opt = torch.optim.SGD(
            list(stt.parameters()) + list(head.parameters()), lr=1e-3)
        y_true = torch.randn(b, 8)
        return stt, head, opt, y_true

    def run_cqt_train(state):
        stt, head, opt, y_true = state
        opt.zero_grad()
        spec = stt(x)
        loss = ((head(spec.mean(-1)) - y_true) ** 2).mean()
        loss.backward()
        opt.step()

    attempt("train_step_cqt", build_cqt_train, run_cqt_train, iters=1,
            grad=True)

    def build_clf_train():
        mel = ref_feat.MelSpectrogram(sr=SR, n_fft=N_FFT, hop_length=HOP,
                                      n_mels=128, trainable_mel=True,
                                      trainable_STFT=True, verbose=False)
        head = torch.nn.Linear(128, 10)
        opt = torch.optim.SGD(
            list(mel.parameters()) + list(head.parameters()), lr=1e-3)
        labels = torch.randint(0, 10, (b,))
        return mel, head, opt, labels

    def run_clf_train(state):
        mel, head, opt, labels = state
        opt.zero_grad()
        feats = torch.log(torch.clamp(mel(x), min=0) + 1e-6).mean(-1)
        loss = torch.nn.functional.cross_entropy(head(feats), labels)
        loss.backward()
        opt.step()

    attempt("train_step_classifier", build_clf_train, run_clf_train, iters=1,
            grad=True)
    # fast-mode rows compare against the same fp32 reference (it has none)
    for key in ("mel", "cqt1992v2", "train_step", "vqt", "cqt2010v2",
                "train_step_cqt", "train_step_classifier"):
        if key in out:
            out[key + "_fast"] = out[key]
    return out


NAMES = {
    "mel": "mel_spectrogram_throughput_n2048_h512_128mels",
    "mel_fast": "mel_spectrogram_fast_bf16_throughput_128mels",
    "mfcc": "mfcc_throughput_20",
    "cqt1992v2": "cqt1992v2_throughput_84bins",
    "cqt1992v2_fast": "cqt1992v2_fast_bf16_throughput_84bins",
    "vqt": "vqt_throughput_84bins_gamma2",
    "vqt_fast": "vqt_fast_bf16_throughput_84bins_gamma2",
    "cqt2010v2": "cqt2010v2_throughput_84bins",
    "cqt2010v2_fast": "cqt2010v2_fast_bf16_throughput_84bins",
    "cfp": "cfp_throughput_fs16k",
    "istft": "istft_throughput_n2048_h512",
    "griffin_lim": "griffin_lim_throughput_32iters",
    "inverse_mel": "inverse_mel_throughput_64nnls_32gl",
    "icqt": "icqt_cqt1992v2_throughput_48bins_h128",
    "griffinlim_cqt": "griffinlim_cqt_throughput_48bins_32iters",
    "time_stretch": "time_stretch_throughput_rate1.25_locked",
    "pitch_shift": "pitch_shift_throughput_up2semitones",
    "resample": "resample_throughput_22050_to_16000",
    "train_step": "trainable_stft_train_step_throughput",
    "train_step_fast": "trainable_stft_train_step_fast_bf16_throughput",
    "train_step_cqt": "trainable_cqt1992v2_train_step_throughput",
    "train_step_cqt_fast": "trainable_cqt1992v2_train_step_fast_bf16_throughput",
    "train_step_classifier": "mel_classifier_train_step_throughput",
    "train_step_classifier_fast": "mel_classifier_train_step_fast_bf16_throughput",
    "stft_fast": "stft_magnitude_fast_bf16_throughput_n2048_h512",
    "stft": "stft_magnitude_throughput_n2048_h512",  # headline, printed last
}


def _backend_reachable(timeout_s: int = 150) -> bool:
    """Probe backend init in a SUBPROCESS with a hard timeout: through the
    axon tunnel, jax.devices() blocks indefinitely during a tunnel outage —
    probing in-process would hang the whole bench (and its driver)."""
    import subprocess

    try:
        p = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return p.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _backend_reachable():
        print("bench: accelerator backend unreachable (tunnel outage?) — "
              "aborting instead of hanging", file=sys.stderr)
        sys.exit(2)
    ours = tpu_metrics()
    try:
        ref_feat, torch = load_reference()
        theirs = reference_metrics(ref_feat, torch)
        err = tpu_accuracy_vs_reference(ref_feat, torch)
    except Exception:
        theirs, err = {}, None

    if err is not None:
        print(json.dumps({
            "metric": "stft_magnitude_max_abs_err_vs_reference",
            "value": float(f"{err:.3g}"),
            "unit": "abs_err_vs_torch_reference_cpu",
            "vs_baseline": None,
        }))
    # the measured axon-tunnel fetch roundtrip subtracted from every timed
    # call (round 5): an artifact of the debugging tunnel, not of the chip —
    # raw_value fields keep the rounds-1-4 uncorrected methodology
    print(json.dumps({
        "metric": "tunnel_fetch_floor_ms",
        "value": round(_TUNNEL_FLOOR_S * 1e3, 2),
        "unit": "ms_per_host_fetch_roundtrip",
        "vs_baseline": None,
    }))
    for key, metric in NAMES.items():
        base = theirs.get(key)
        row = ours[key]
        print(json.dumps({
            "metric": metric,
            "value": round(row["value"], 1),
            "unit": "audio_seconds_per_second_per_chip",
            "vs_baseline": round(row["value"] / base, 2) if base else None,
            # variance fields (6 repeats/metric): median throughput and the
            # repeat-to-repeat wall-time range relative to the best repeat
            "median": round(row["median"], 1),
            "spread": round(row["spread"], 3),
            # rounds-1-4 methodology (no tunnel-floor subtraction)
            "raw_value": round(row["raw_value"], 1),
        }))


if __name__ == "__main__":
    main()
