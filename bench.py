"""Benchmark: forced-alignment throughput on the TPU fast path.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: data-parallel batch of utterances aligned end-to-end
(host C++ MFCC -> upload -> dynamic features -> dense senone scoring ->
phone-graph Viterbi + backtrace on device -> host segment extraction).
Each rep aligns a DIFFERENT batch (per-rep sample-level perturbation of
the source audio) so no transport/result cache can short-circuit the
pipeline; host FE, uploads, device compute, downloads, and segment
extraction are all on the clock.

Metric: audio-seconds processed per wall-clock second per chip,
steady-state (post-compile).

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


def main():
    from soundswallower_tpu.aligner import TpuAligner

    batch = int(os.environ.get("BENCH_BATCH", "512"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    dist_mode = os.environ.get("BENCH_DIST", "fold")
    os.environ.setdefault("SST_BATCH_CHUNK", "64")

    raw = np.fromfile("/root/reference/tests/data/goforward.raw", dtype=np.int16)
    text = "go forward ten meters"
    audio_sec = len(raw) / 16000.0

    al = TpuAligner(hmm="/root/reference/model/en-us")
    rng = np.random.RandomState(0)

    def make_batch(rep):
        # +-1 LSB perturbation: distinct buffers every rep, same audio
        return [(raw + rng.randint(-1, 2, len(raw)).astype(np.int16))
                for _ in range(batch)]

    texts = [text] * batch

    # warmup/compile
    segs = al.align_batch(make_batch(-1), texts, dist_mode)
    assert segs[0][1].word in ("go", "<sil>")

    # Steady-state serving pattern: batch k+1's host FE + upload are
    # submitted while batch k's device compute + download drain
    # (align_batch_begin/end are exactly align_batch split in two).
    batches = [make_batch(r) for r in range(reps)]
    t0 = time.time()
    pending = al.align_batch_begin(batches[0], texts, dist_mode)
    for b in batches[1:]:
        nxt = al.align_batch_begin(b, texts, dist_mode)
        segs = al.align_batch_end(pending)
        pending = nxt
    segs = al.align_batch_end(pending)
    dt = (time.time() - t0) / reps
    assert segs[0][1].word in ("go", "<sil>")

    value = audio_sec * batch / dt
    out = {
        "metric": "align_audio_seconds_per_second_per_chip",
        "value": round(value, 1),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / 1000.0, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
