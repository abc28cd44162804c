"""A/B measurement: mixed-transcript batches, single-dispatch vs grouped.

Builds B distinct (audio, transcript) pairs by concatenating goforward
word slices in shuffled orders (real acoustic content per transcript),
then measures steady-state throughput of:

  A. same-text batch (the round-3 headline workload)
  B. mixed batch via the multi-graph single dispatch (new path)
  C. mixed batch via the round-3 per-text-group dispatch (SST_MIXED=grouped)

Interleaved A/B/C reps in one process per the verify-skill gotchas.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORDS = {  # goforward.raw frame boundaries (verify skill)
    "go": (46, 64), "forward": (64, 117), "ten": (117, 153),
    "meters": (153, 211),
}
SIL = (0, 46)


def make_mixed(raw, B, seed=0, n_words=4):
    rng = np.random.RandomState(seed)
    S = 160
    names = list(WORDS)
    sil = raw[SIL[0] * S: SIL[1] * S]
    pairs = []
    seen = set()
    while len(pairs) < B:
        k = rng.randint(2, n_words + 3)
        ws = tuple(rng.choice(names, k))
        if ws in seen:
            continue
        seen.add(ws)
        audio = [sil]
        for w in ws:
            a, b = WORDS[w]
            audio.append(raw[a * S: b * S])
        audio.append(sil)
        pairs.append((np.concatenate(audio), " ".join(ws)))
    return pairs


def run_batches(al, batches, texts_per):
    t0 = time.time()
    pending = al.align_batch_begin(batches[0], texts_per[0]) \
        if len(set(texts_per[0])) == 1 else None
    if pending is None:
        # mixed: no begin/end split API; plain align_batch per rep
        for b, t in zip(batches, texts_per):
            out = al.align_batch(b, t)
        return (time.time() - t0) / len(batches), out
    for b, t in zip(batches[1:], texts_per[1:]):
        nxt = al.align_batch_begin(b, t)
        out = al.align_batch_end(pending)
        pending = nxt
    out = al.align_batch_end(pending)
    return (time.time() - t0) / len(batches), out


def main():
    from soundswallower_tpu.aligner import TpuAligner

    B = int(os.environ.get("MB_BATCH", "64"))
    reps = int(os.environ.get("MB_REPS", "3"))
    raw = np.fromfile("/root/reference/tests/data/goforward.raw", np.int16)
    al = TpuAligner(hmm="/root/reference/model/en-us")

    rng = np.random.RandomState(1)

    def perturb(a):
        return a + rng.randint(-1, 2, len(a)).astype(np.int16)

    text = "go forward ten meters"
    same_texts = [text] * B

    mixed = make_mixed(raw, B)
    m_audios = [a for a, _ in mixed]
    m_texts = [t for _, t in mixed]
    m_secs = sum(len(a) for a in m_audios) / 16000.0
    s_secs = len(raw) / 16000.0 * B

    # -- warmup (compiles for all three paths)
    al.align_batch([perturb(raw) for _ in range(B)], same_texts)
    al.align_batch([perturb(a) for a in m_audios], m_texts)
    os.environ["SST_MIXED"] = "grouped"
    al.align_batch([perturb(a) for a in m_audios], m_texts)
    del os.environ["SST_MIXED"]

    results = {}
    for it in range(2):  # interleave, trust the 2nd round
        # A: same text
        bs = [[perturb(raw) for _ in range(B)] for _ in range(reps)]
        dt, out = run_batches(al, bs, [same_texts] * reps)
        results["same"] = s_secs / dt
        # B: mixed single-dispatch
        bs = [[perturb(a) for a in m_audios] for _ in range(reps)]
        t0 = time.time()
        for b in bs:
            out = al.align_batch(b, m_texts)
        dt = (time.time() - t0) / reps
        assert all(o is not None for o in out)
        results["mixed_new"] = m_secs / dt
        # C: mixed grouped (round-3 path)
        os.environ["SST_MIXED"] = "grouped"
        bs = [[perturb(a) for a in m_audios] for _ in range(reps)]
        t0 = time.time()
        for b in bs:
            out = al.align_batch(b, m_texts)
        dt = (time.time() - t0) / reps
        del os.environ["SST_MIXED"]
        results["mixed_grouped"] = m_secs / dt
        print(f"round {it}: " + "  ".join(
            f"{k}={v:.1f}" for k, v in results.items()), flush=True)
    print("ratio mixed_new/same:",
          round(results["mixed_new"] / results["same"], 3))
    print("speedup vs grouped:",
          round(results["mixed_new"] / results["mixed_grouped"], 2))


if __name__ == "__main__":
    main()
