"""On-chip streaming latency/throughput table (VERDICT r3 item 4a).

Measures steady-state per-chunk serving numbers for every streaming class at
realistic chunk sizes (160 ms / 500 ms / 1 s @ 16 kHz), fuse=None (workload
gate, i.e. XLA at these sizes) vs fuse=True (Pallas kernels forced — the
compile amortizes across a steady stream).

Two numbers per row, because the tunneled chip inflates dispatch:
  - lat_ms:   median blocked per-step wall latency. Sync is a HOST FETCH of
              one output element (`block_until_ready` does NOT synchronize
              through the axon tunnel — the round-4b run's 0.05 ms "blocked"
              latencies were un-synced dispatch time, and the one row that
              DID sync showed the real ~25 ms tunnel roundtrip). Includes
              one dispatch+fetch roundtrip — honest on local hosts,
              tunnel-roundtrip-dominated here.
  - rtf:      real-time factor from a chained run: K back-to-back steps with
              state threading, ONE host fetch of a sum over all outputs at
              the end (full outputs consumed — DCE-safe), so per-step
              dispatch overlaps device work. The device-bound number.

Usage: python tools/bench_streaming.py [--quick]
Emits one JSON line per row plus a markdown table on stderr-free stdout.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _fetch_sync(out):
    """Host-fetch one element — the only thing that synchronizes through
    the axon tunnel (block_until_ready returns early there)."""
    return float(jnp.sum(out))


def bench_stream(make, sr, hop, chunk_sec, batch=1, k=32, warm=6):
    s = make()
    chunk_len = max(hop, int(round(chunk_sec * sr / hop)) * hop)
    rng = np.random.RandomState(0)
    chunks = [
        jax.device_put(rng.randn(batch, chunk_len).astype(np.float32))
        for _ in range(8)
    ]
    state = s.init_state(batch)
    # prime + compile every progress variant
    for i in range(warm):
        state, out = s.step(state, chunks[i % len(chunks)])
    _fetch_sync(out)

    # blocked per-step latency (dispatch + device + fetch roundtrip)
    lats = []
    for i in range(k):
        t0 = time.perf_counter()
        state, out = s.step(state, chunks[i % len(chunks)])
        _fetch_sync(out)
        lats.append((time.perf_counter() - t0) * 1e3)
    lat_ms = statistics.median(lats)

    # chained throughput: consume EVERY output (DCE-safe), one sync
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(k):
        state, out = s.step(state, chunks[i % len(chunks)])
        acc = acc + jnp.sum(out)
    float(acc)
    wall = time.perf_counter() - t0
    audio_s = k * batch * chunk_len / sr
    return dict(chunk_ms=1e3 * chunk_len / sr, lat_ms=round(lat_ms, 3),
                rtf=round(audio_s / wall, 1), chunk_len=chunk_len)


def main():
    quick = "--quick" in sys.argv
    from nnaudio_tpu import streaming

    sr = 16000
    rows = []
    classes = [
        ("StreamingSTFT", lambda fuse: streaming.StreamingSTFT(
            n_fft=512, hop_length=160, sr=sr, fuse=fuse), 160),
        ("StreamingMel", lambda fuse: streaming.StreamingMel(
            sr=sr, n_fft=512, hop_length=160, n_mels=80, fuse=fuse), 160),
        ("StreamingMFCC", lambda fuse: streaming.StreamingMFCC(
            sr=sr, n_fft=512, hop_length=160, n_mels=80, n_mfcc=13,
            fuse=fuse), 160),
        ("StreamingGammatone", lambda fuse: streaming.StreamingGammatone(
            sr=sr, n_fft=512, hop_length=160, n_bins=64, fuse=fuse), 160),
        ("StreamingChroma", lambda fuse: streaming.StreamingChroma(
            sr=sr, n_fft=1024, hop_length=160, fuse=fuse), 160),
        ("StreamingCQT", lambda fuse: streaming.StreamingCQT(
            sr=sr, hop_length=160, fmin=32.7, n_bins=84, bins_per_octave=12,
            verbose=False, fuse=fuse), 160),
    ]
    chunk_secs = [0.16, 1.0] if quick else [0.16, 0.5, 1.0]
    fuse_opts = [None] if quick else [None, True]
    for name, make, hop in classes:
        for chunk_sec in chunk_secs:
            for fuse in fuse_opts:
                try:
                    r = bench_stream(lambda: make(fuse), sr, hop, chunk_sec)
                except Exception as e:  # keep the table going
                    print(f"# {name} fuse={fuse} {chunk_sec}s FAILED: "
                          f"{type(e).__name__}: {e}", flush=True)
                    continue
                row = dict(cls=name, fuse=fuse, **r)
                rows.append(row)
                print(json.dumps(row), flush=True)

    # synthesis duals: frame chunks in, samples out
    n_fft, hop = 512, 160
    syn_classes = [
        ("StreamingiSTFT", lambda fuse: streaming.StreamingiSTFT(
            n_fft=n_fft, hop_length=hop, fuse=fuse), n_fft // 2 + 1),
        # inversion-friendly bank (hop <= shortest atom / 2 at 16 kHz)
        ("StreamingInverseCQT", lambda fuse: streaming.StreamingInverseCQT(
            sr=sr, hop_length=hop, fmin=55, n_bins=48, bins_per_octave=12,
            fuse=fuse), 48),
    ]
    for syn_name, syn_make, f_bins in syn_classes:
        for chunk_sec in chunk_secs:
            t = max(1, int(round(chunk_sec * sr / hop)))
            for fuse in fuse_opts:
                s = syn_make(fuse)
                X = jax.device_put(np.random.RandomState(1)
                                   .randn(1, f_bins, t, 2)
                                   .astype(np.float32))
                state = s.init_state(1)
                for _ in range(6):
                    state, out = s.step(state, X)
                _fetch_sync(out)
                lats = []
                for _ in range(32):
                    t0 = time.perf_counter()
                    state, out = s.step(state, X)
                    _fetch_sync(out)
                    lats.append((time.perf_counter() - t0) * 1e3)
                t0 = time.perf_counter()
                acc = 0.0
                for _ in range(32):
                    state, out = s.step(state, X)
                    acc = acc + jnp.sum(out)
                float(acc)
                wall = time.perf_counter() - t0
                row = dict(cls=syn_name, fuse=fuse,
                           chunk_ms=1e3 * t * hop / sr,
                           lat_ms=round(statistics.median(lats), 3),
                           rtf=round(32 * t * hop / sr / wall, 1),
                           chunk_len=t)
                rows.append(row)
                print(json.dumps(row), flush=True)

    # markdown table for RESULTS.md
    print("\n| class | chunk (ms) | fuse | lat (ms) | RTF |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['cls']} | {r['chunk_ms']:.0f} | {r['fuse']} "
              f"| {r['lat_ms']} | {r['rtf']} |")


if __name__ == "__main__":
    main()
