"""Stage-level timing of the batch alignment fast path (real-sync).

Same decomposition as profile_batch.py but with the forced-fetch sync()
from tools/tpu_timing (on this platform block_until_ready returns before
device execution finishes, so the old profiler under-reports compute
stages).  Uses the current production path: host C++ FE -> cep upload ->
dyn feats -> scoring + graph gather -> whole-batch lane-major Viterbi ->
download -> host extraction.
"""

import os
import sys
import time

import numpy as np
import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from tpu_timing import sync  # noqa: E402


def main():
    from soundswallower_tpu.aligner import TpuAligner
    from soundswallower_tpu.fe.feat import feats_full_utt
    from soundswallower_tpu.ops.senscore_jax import (
        _dist_stage, _topn_stage, _sen_stage)

    batch = int(os.environ.get("BENCH_BATCH", "512"))
    dist_mode = os.environ.get("BENCH_DIST", "fold")

    raw = np.fromfile("/root/reference/tests/data/goforward.raw", np.int16)
    text = "go forward ten meters"
    al = TpuAligner(hmm="/root/reference/model/en-us")
    g = al.graph_for_text(text)

    rng = np.random.RandomState(0)
    audios = [(raw + rng.randint(-1, 2, len(raw)).astype(np.int16))
              for _ in range(batch)]
    ns = np.array([len(a) for a in audios])
    Ts = np.array([al.fe.n_frames(int(n)) for n in ns])
    Tmax = max(64, -(-int(Ts.max()) // 64) * 64)
    buf = np.zeros((batch, int(ns.max())), np.int16)
    for i, a in enumerate(audios):
        buf[i, : len(a)] = a

    assert al.native_fe is not None, (
        "unset SST_FE=device to profile the host-FE path")

    def stage(name, fn, reps=3):
        out = fn()
        sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn()
            sync(out)
        dt = (time.time() - t0) / reps
        print(f"{name:28s} {dt*1e3:9.2f} ms")
        return out, dt

    total = 0.0
    (cep,), dt = stage("host FE (C++)",
                       lambda: (al.native_fe.process_batch(buf, ns, Tmax),))
    total += dt
    cep_d, dt = stage("h2d upload cep", lambda: jax.device_put(cep))
    total += dt
    print(f"{'':28s} ({cep.nbytes/1e6:.1f} MB -> "
          f"{cep.nbytes/dt/1e9:.2f} GB/s)")
    Ts_d = jax.device_put(Ts)

    cmn = al.config["cmn"]
    featj = jax.jit(jax.vmap(lambda c, T: feats_full_utt(c, T, cmn)))
    feats, dt = stage("dyn feats", lambda: featj(cep_d, Ts_d))
    total += dt

    flat = feats.reshape((-1,) + feats.shape[2:])
    di, dt = stage("dist stage", lambda: _dist_stage(al.tables, flat,
                                                     dist_mode))
    total += dt
    (tsc, tcw), dt = stage("topn stage", lambda: _topn_stage(al.tables, di))
    total += dt
    senscr_flat, dt = stage("sen eval stage",
                            lambda: _sen_stage(al.tables, tsc, tcw))
    total += dt

    # graph gather (as in _score_gather)
    sen_g, dt = stage("graph gather",
                      lambda: al._score_gather.__wrapped__(al, g, feats,
                                                           Tmax, dist_mode)
                      if hasattr(al._score_gather, "__wrapped__") else
                      al._score_gather(g, feats, Tmax, dist_mode))
    # note: _score_gather re-runs scoring; subtract the scoring stages
    print(f"{'  (incl. re-scoring above)':28s}")

    Ts32_d = jax.device_put(Ts.astype(np.int32))
    (paths_d, sc_d), dt = stage("viterbi+backtrace (lanes)",
                                lambda: al._vit_full(g, sen_g, Ts32_d))
    total += dt

    def down():
        return jax.device_get((paths_d, sc_d))
    (paths, scores), dt = stage("d2h download", lambda: down())
    total += dt

    def extract():
        return [al._extract_safe(g, paths[i], int(Ts[i]), int(scores[i]))
                for i in range(batch)]
    segs, dt = stage("host extraction", lambda: extract())
    total += dt

    audio_sec = len(raw) / 16000.0 * batch
    print(f"{'TOTAL (unpipelined approx)':28s} {total*1e3:9.2f} ms "
          f"-> {audio_sec/total:.0f} audio-s/s")


if __name__ == "__main__":
    main()
