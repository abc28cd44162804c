"""Benchmark: forced-alignment throughput on the TPU fast path.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
                       "mixed": {...}, "serve_p50_ms": N, "serve_p99_ms": N}

Three workloads, all steady-state (post-compile), all with per-rep
sample-level perturbation so no transport/result cache can
short-circuit the pipeline:

1. ``value`` (headline, comparable across rounds): same-transcript
   batch of B=512 — host C++ MFCC -> upload -> dynamic features ->
   graph-restricted senone scoring -> phone-graph Viterbi + backtrace
   -> host segment extraction, pipelined via align_batch_begin/end.
2. ``mixed``: B=64 utterances with 64 DISTINCT transcripts (4-word
   shuffles of real goforward word audio) through the multi-graph
   single-dispatch path — the ReadAlongs-shaped serving workload
   (one transcript per document, js/api.js:491).
3. ``serve_p50_ms``/``serve_p99_ms``: per-request latency through
   AlignService (the dynamic batcher) under concurrent mixed load.

vs_baseline: ratio against the BASELINE.json north-star target of 1000x
real time per chip (the reference publishes no numbers; its own xRT on
this host's CPU is ~0.1-0.3 wall xRT, i.e. 3-10x real time).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# goforward.raw word frame boundaries (x160 samples)
WORDS = {"go": (46, 64), "forward": (64, 117), "ten": (117, 153),
         "meters": (153, 211)}
SIL = (0, 46)


def make_mixed(raw, B, seed=0):
    """B distinct 4-word transcripts with matching audio built from
    goforward word slices (+ leading/trailing silence)."""
    rng = np.random.RandomState(seed)
    S = 160
    names = list(WORDS)
    sil = raw[SIL[0] * S: SIL[1] * S]
    pairs, seen = [], set()
    while len(pairs) < B:
        ws = tuple(rng.choice(names, 4))
        if ws in seen:
            continue
        seen.add(ws)
        audio = [sil] + [raw[a * S: b * S] for a, b in
                         (WORDS[w] for w in ws)] + [sil]
        pairs.append((np.concatenate(audio), " ".join(ws)))
    return pairs


def bench_same(al, raw, batch, reps, dist_mode, rng):
    text = "go forward ten meters"
    texts = [text] * batch
    audio_sec = len(raw) / 16000.0

    def make_batch():
        return [(raw + rng.randint(-1, 2, len(raw)).astype(np.int16))
                for _ in range(batch)]

    segs = al.align_batch(make_batch(), texts, dist_mode)  # warmup/compile
    assert segs[0][1].word in ("go", "<sil>")
    batches = [make_batch() for _ in range(reps)]
    t0 = time.time()
    pending = al.align_batch_begin(batches[0], texts, dist_mode)
    for b in batches[1:]:
        nxt = al.align_batch_begin(b, texts, dist_mode)
        segs = al.align_batch_end(pending)
        pending = nxt
    segs = al.align_batch_end(pending)
    dt = (time.time() - t0) / reps
    assert segs[0][1].word in ("go", "<sil>")
    return audio_sec * batch / dt


def bench_mixed(al, raw, batch, reps, dist_mode, rng):
    pairs = make_mixed(raw, batch)
    audios = [a for a, _ in pairs]
    texts = [t for _, t in pairs]
    audio_sec = sum(len(a) for a in audios) / 16000.0

    def perturb():
        return [(a + rng.randint(-1, 2, len(a)).astype(np.int16))
                for a in audios]

    out = al.align_batch(perturb(), texts, dist_mode)  # warmup/compile
    assert all(o is not None for o in out)
    batches = [perturb() for _ in range(reps)]
    t0 = time.time()
    pending = al.align_batch_begin(batches[0], texts, dist_mode)
    for b in batches[1:]:
        nxt = al.align_batch_begin(b, texts, dist_mode)
        out = al.align_batch_end(pending)
        pending = nxt
    out = al.align_batch_end(pending)
    dt = (time.time() - t0) / reps
    assert all(o is not None for o in out)
    return audio_sec / dt, len(set(texts))


def bench_serve(al, raw, n_req=128, conc=32):
    """Per-request latency through the dynamic batcher under mixed
    concurrent load."""
    from concurrent.futures import ThreadPoolExecutor

    from soundswallower_tpu.serve import AlignService

    pairs = make_mixed(raw, 16, seed=7)
    svc = AlignService(al, max_batch=64, max_wait_ms=5.0)
    rng = np.random.RandomState(9)
    try:
        # compile every batch-size class the dynamic batcher can hit
        # (what a real deployment does at startup; serve.py --prewarm-text)
        svc.prewarm(pairs)

        def one(i):
            a, t = pairs[i % len(pairs)]
            a = a + rng.randint(-1, 2, len(a)).astype(np.int16)
            t0 = time.monotonic()
            svc.align(a, t, timeout=600)
            return (time.monotonic() - t0) * 1000.0

        # shakeout wave (unmeasured): the first concurrent batches after
        # prewarm absorb one-time costs that are not steady-state
        # (tunnel re-warm after the preceding large-batch sections,
        # batcher thread ramp); the metric is steady-state latency
        with ThreadPoolExecutor(max_workers=conc) as ex:
            list(ex.map(one, range(conc)))
        with ThreadPoolExecutor(max_workers=conc) as ex:
            lat = list(ex.map(one, range(n_req)))
        lat.sort()
        return (lat[len(lat) // 2], lat[int(len(lat) * 0.95)],
                lat[int(len(lat) * 0.99)])
    finally:
        svc.close()


def main():
    from soundswallower_tpu.aligner import TpuAligner

    batch = int(os.environ.get("BENCH_BATCH", "512"))
    mixed_batch = int(os.environ.get("BENCH_MIXED_BATCH", "64"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    dist_mode = os.environ.get("BENCH_DIST", "fold")
    os.environ.setdefault("SST_BATCH_CHUNK", "64")

    raw = np.fromfile("/root/reference/tests/data/goforward.raw",
                      dtype=np.int16)
    al = TpuAligner(hmm="/root/reference/model/en-us")
    rng = np.random.RandomState(0)

    value = bench_same(al, raw, batch, reps, dist_mode, rng)
    mixed_val, n_distinct = bench_mixed(al, raw, mixed_batch, reps,
                                        dist_mode, rng)
    p50, p95, p99 = bench_serve(al, raw)

    out = {
        "metric": "align_audio_seconds_per_second_per_chip",
        "value": round(value, 1),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / 1000.0, 3),
        "mixed": {
            "value": round(mixed_val, 1),
            "unit": "audio-s/s/chip",
            "batch": mixed_batch,
            "distinct_transcripts": n_distinct,
            "vs_baseline": round(mixed_val / 1000.0, 3),
        },
        "serve_p50_ms": round(p50, 1),
        "serve_p95_ms": round(p95, 1),
        "serve_p99_ms": round(p99, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
