"""Benchmark: forced-alignment throughput on the TPU fast path.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
                       "mixed": {...}, "serve_p50_ms": N, "serve_p99_ms": N}

Three workloads, all steady-state (post-compile), all with per-rep
sample-level perturbation so no transport/result cache can
short-circuit the pipeline.  Batch throughput is the MEDIAN
steady-state pipeline cadence over BENCH_REPS (default 8) batches
(see pipelined_batch_time), which is robust to the shared tunnel's
occasional one-off multi-second stalls; serving latency reports
full-sample percentiles over 256 requests:

1. ``value`` (headline, comparable across rounds): same-transcript
   batch of B=1024 — host C++ MFCC -> upload -> dynamic features ->
   graph-restricted senone scoring -> phone-graph Viterbi + backtrace
   -> native segment extraction, pipelined via align_batch_begin/end.
2. ``mixed``: B=256 utterances with 256 DISTINCT transcripts (5-word
   shuffles of real goforward word audio) through the multi-graph
   single-dispatch path (working-set union scoring + banded per-row
   Viterbi) — the ReadAlongs-shaped serving workload (one transcript
   per document, js/api.js:491).  Includes a per-stage breakdown.
3. ``longform``: 8 utterances of ~67 s (graph size and token stacks
   scale with audio length).
4. ``serve_p50_ms``/``serve_p99_ms``: per-request latency through
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


def make_mixed(raw, B, seed=0, n_words=4):
    """B distinct n_words-word transcripts with matching audio built
    from goforward word slices (+ leading/trailing silence).  4 base
    words give 4**n_words possible transcripts; callers needing B >
    ~200 distinct should pass n_words=5."""
    rng = np.random.RandomState(seed)
    S = 160
    names = list(WORDS)
    sil = raw[SIL[0] * S: SIL[1] * S]
    pairs, seen = [], set()
    while len(pairs) < B:
        ws = tuple(rng.choice(names, n_words))
        if ws in seen:
            continue
        seen.add(ws)
        audio = [sil] + [raw[a * S: b * S] for a, b in
                         (WORDS[w] for w in ws)] + [sil]
        pairs.append((np.concatenate(audio), " ".join(ws)))
    return pairs


def pipelined_batch_time(al, batches, texts, dist_mode=None):
    """Steady-state per-batch seconds through align_batch_begin/end.

    Returns the MEDIAN of the intervals between consecutive
    align_batch_end completions (the steady-state cadence of the
    pipeline), not the mean over the whole run: the shared TPU tunnel
    occasionally injects a single multi-second stall that says nothing
    about the pipeline's throughput, and a mean over 6 reps lets one
    such stall swing the reported number 20-40% run-to-run.  The first
    interval (pipeline fill) is excluded by construction since the
    first end() completes only after two begins.
    """
    args = (texts, dist_mode) if dist_mode is not None else (texts,)
    marks = []
    pending = al.align_batch_begin(batches[0], *args)
    for b in batches[1:]:
        nxt = al.align_batch_begin(b, *args)
        out = al.align_batch_end(pending)
        marks.append(time.perf_counter())
        pending = nxt
    out = al.align_batch_end(pending)
    marks.append(time.perf_counter())
    ivals = np.diff(marks)
    return float(np.median(ivals)), out


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
    dt, segs = pipelined_batch_time(al, batches, texts, dist_mode)
    assert segs[0][1].word in ("go", "<sil>")
    return audio_sec * batch / dt


def bench_mixed(al, raw, batch, reps, dist_mode, rng):
    pairs = make_mixed(raw, batch, n_words=5 if batch > 200 else 4)
    audios = [a for a, _ in pairs]
    texts = [t for _, t in pairs]
    audio_sec = sum(len(a) for a in audios) / 16000.0

    def perturb():
        return [(a + rng.randint(-1, 2, len(a)).astype(np.int16))
                for a in audios]

    out = al.align_batch(perturb(), texts, dist_mode)  # warmup/compile
    assert all(o is not None for o in out)
    batches = [perturb() for _ in range(reps)]
    dt, out = pipelined_batch_time(al, batches, texts, dist_mode)
    assert all(o is not None for o in out)
    return audio_sec / dt, len(set(texts))


def bench_stages(al, raw, batch, dist_mode, rng):
    """Stage-level timing of the mixed path (host FE / h2d / features /
    scoring / gather / viterbi+backtrace / d2h / extract), so the
    throughput bound is measured, not guessed (VERDICT r4 item 1).
    Each stage forces completion with a host fetch — plain
    block_until_ready does not wait for execution on the tunnel
    runtime.  Unpipelined sums exceed the pipelined e2e numbers above
    (host stages overlap device stages there)."""
    import jax

    from soundswallower_tpu.aligner import _gather_cols
    from soundswallower_tpu.ops.senscore_jax import score_frames_graph

    pairs = make_mixed(raw, batch, n_words=5 if batch > 200 else 4)
    audios = [a + rng.randint(-1, 2, len(a)).astype(np.int16)
              for a, _ in pairs]
    texts = [t for _, t in pairs]
    audio_sec = sum(len(a) for a in audios) / 16000.0
    graphs = [al.graph_for_text(t) for t in texts]
    uni = al._union_scorer(graphs)
    st = al._stacked_graphs(graphs, remap=uni["pos"], remap_ver=uni["ver"])
    ns = np.array([len(a) for a in audios])
    Ts = np.array([al.fe.n_frames(int(n)) for n in ns])
    Tmax = max(64, al.tmax_floor, -(-int(Ts.max()) // 64) * 64)

    def t(fn, fetch, reps=4):
        out = fn()
        fetch(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        fetch(out)
        return (time.perf_counter() - t0) / reps, out

    # force completion by fetching ONE scalar (a full-array fetch would
    # measure the d2h transfer, not the stage)
    fetch_j = lambda o: np.asarray(o.ravel()[0])  # noqa: E731
    d_fe, pl = t(lambda: al.native_fe.process_list_i16p(
        audios, Tmax, al.wire_scale), lambda o: None)
    d_h2d, pl_d = t(lambda: jax.device_put(pl), fetch_j)
    Ts_d = jax.device_put(Ts)
    d_feat, fv = t(lambda: al._feats_chunk_planes(pl_d, Ts_d, Tmax),
                   fetch_j)
    flat = fv.reshape((-1,) + fv.shape[2:])
    d_score, dense = t(
        lambda: score_frames_graph(uni["gs"], flat, dist_mode), fetch_j)
    dense = dense.reshape(len(audios), Tmax, -1)
    d_gather, sen = t(lambda: _gather_cols(dense, st["sencols"]), fetch_j)
    Ts32 = jax.device_put(Ts.astype(np.int32))
    d_vit, vout = t(lambda: al._vit_full_mg(st, sen, Ts32),
                    lambda o: np.asarray(o[0].ravel()[0]))
    d_d2h, fetched = t(lambda: (np.array(vout[0]), np.array(vout[2])),
                       lambda o: None)
    paths, fins = fetched
    def extract():
        out = al._extract_batch_native(graphs, paths, Ts, len(audios))
        if out is None:  # library unavailable: python fallback
            out = [al._extract_safe(graphs[i], paths[i], int(Ts[i]),
                                    int(fins[i]))
                   for i in range(len(audios))]
        return out
    d_ex, _ = t(extract, lambda o: None)
    ms = {k: round(v * 1000, 2) for k, v in
          [("host_fe", d_fe), ("h2d", d_h2d), ("feats", d_feat),
           ("score", d_score), ("gather", d_gather),
           ("viterbi_backtrace", d_vit), ("d2h", d_d2h),
           ("extract", d_ex)]}
    ms["audio_s"] = round(audio_sec, 1)
    return ms


def bench_longform(al, raw, rng, k=24, B=8, reps=4):
    """Long-form throughput: B utterances of ~k*2.6 s (goforward tiled
    k times, transcript repeated k times) through the offline fast
    path — the alignment-graph node count and the token stack scale
    with audio length here, unlike the short-utterance sections."""
    audio = np.tile(raw, k)
    text = " ".join(["go forward ten meters"] * k)
    audio_sec = len(audio) / 16000.0 * B
    texts = [text] * B

    def make_batch():
        return [(audio + rng.randint(-1, 2, len(audio)).astype(np.int16))
                for _ in range(B)]

    out = al.align_batch(make_batch(), texts)  # warmup/compile
    assert all(o is not None for o in out)
    batches = [make_batch() for _ in range(reps)]
    dt, _ = pipelined_batch_time(al, batches, texts)
    return audio_sec / dt, len(audio) / 16000.0


def bench_serve(al, raw, n_req=256, conc=32):
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
        for _ in range(2):
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

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    mixed_batch = int(os.environ.get("BENCH_MIXED_BATCH", "256"))
    reps = int(os.environ.get("BENCH_REPS", "8"))
    dist_mode = os.environ.get("BENCH_DIST", "fold")

    raw = np.fromfile("/root/reference/tests/data/goforward.raw",
                      dtype=np.int16)
    al = TpuAligner(hmm="/root/reference/model/en-us")
    rng = np.random.RandomState(0)

    # serving latency is measured FIRST, on a quiet chip: a latency
    # deployment does not share its chip with 1024-utterance offline
    # jobs, and the shared tunnel otherwise injects one multi-second
    # stall right after the large-batch sections (documented in
    # README "tunnel weather") that says nothing about the service
    p50, p95, p99 = bench_serve(al, raw)
    value = bench_same(al, raw, batch, reps, dist_mode, rng)
    mixed_val, n_distinct = bench_mixed(al, raw, mixed_batch, reps,
                                        dist_mode, rng)
    stages = bench_stages(al, raw, mixed_batch, dist_mode, rng)
    lf_val, lf_sec = bench_longform(al, raw, rng)

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
            "stage_ms": stages,
        },
        "longform": {
            "value": round(lf_val, 1),
            "unit": "audio-s/s/chip",
            "utt_seconds": round(lf_sec, 1),
            "vs_baseline": round(lf_val / 1000.0, 3),
        },
        "serve_p50_ms": round(p50, 1),
        "serve_p95_ms": round(p95, 1),
        "serve_p99_ms": round(p99, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
