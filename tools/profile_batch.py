"""Stage-level timing of the batch alignment fast path.

Breaks one align_batch-equivalent pass into: host FE, h2d upload,
dynamic features, senone scoring, Viterbi+backtrace, d2h download,
host segment extraction.  Each stage is timed with block_until_ready
so the async-dispatch overlap of the real path is *removed* — the sum
of stages is an upper bound on the real pipelined wall time; the gap
between the sum and bench.py's number is the overlap win.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from soundswallower_tpu.aligner import TpuAligner
    from soundswallower_tpu.fe.feat import feats_full_utt
    from soundswallower_tpu.ops.senscore_jax import score_frames

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
        fn()  # warm
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        dt = (time.time() - t0) / reps
        print(f"{name:28s} {dt*1e3:9.2f} ms")
        return out, dt

    total = 0.0
    # 1. host FE
    (cep,), dt = stage("host FE (C++)",
                       lambda: (al.native_fe.process_batch(buf, ns, Tmax),))
    total += dt
    # 2. upload
    def up():
        d = jax.device_put(cep)
        d.block_until_ready()
        return d
    (cep_d,), dt = stage("h2d upload cep", lambda: (up(),))
    total += dt
    nbytes = cep.nbytes
    print(f"{'':28s} ({nbytes/1e6:.1f} MB -> {nbytes/dt/1e9:.2f} GB/s)")
    Ts_d = jax.device_put(Ts)

    # 3. dynamic features
    cmn = al.config["cmn"]
    featj = jax.jit(jax.vmap(lambda c, T: feats_full_utt(c, T, cmn)))
    def feats_fn():
        f = featj(cep_d, Ts_d)
        f.block_until_ready()
        return f
    (feats,), dt = stage("dyn feats", lambda: (feats_fn(),))
    total += dt

    # 4. senone scoring
    flat = feats.reshape((-1,) + feats.shape[2:])
    def score_fn():
        s = score_frames(al.tables, flat, dist_mode)
        s.block_until_ready()
        return s
    (senscr_flat,), dt = stage("senone scoring", lambda: (score_fn(),))
    total += dt
    senscr = senscr_flat.reshape(batch, Tmax, -1)

    # 5. Viterbi + backtrace (reuse aligner's cached jit via _score_and_vit
    #    internals): build the vit closure like _score_and_vit does
    from soundswallower_tpu.ops.align_jax import (
        WORST_SCORE, align_viterbi, backtrace, build_pred_table)
    entry = jnp.asarray(
        np.where(g.is_entry, g.entry_pen, WORST_SCORE).astype(np.int32))
    senid = jnp.asarray(al.tables.sen_remap[g.senid].astype(np.int32))
    tp = al.tmat_i32[jnp.asarray(g.tmatid)]
    pi, pp, pk = build_pred_table(g.edge_src, g.edge_dst, g.edge_pen,
                                  len(g.senid))
    pi, pp, pk = jnp.asarray(pi), jnp.asarray(pp), jnp.asarray(pk)
    ast, aen = jnp.asarray(g.astart), jnp.asarray(g.aend)
    fin = jnp.asarray(g.final_nodes)

    def vit_one(ss, T):
        tok_id, _, out_score, out_hist = align_viterbi(
            ss, senid, tp, pi, pp, pk, ast, aen, T, entry, False)
        fsc = out_score[fin]
        best = jnp.argmax(fsc)
        final_node = fin[best]
        path, _ = backtrace(tok_id, None, out_hist[final_node],
                            out_score[final_node], T)
        return path, out_score[final_node]

    vitj = jax.jit(jax.vmap(vit_one))
    def vit_fn():
        p, s = vitj(senscr, Ts_d)
        jax.block_until_ready((p, s))
        return p, s
    (paths_d, scores_d), dt = stage("viterbi+backtrace",
                                    lambda: vit_fn(), reps=3)
    total += dt

    # 6. download
    def down():
        return jax.device_get((paths_d, scores_d))
    (paths, scores), dt = stage("d2h download", lambda: down())
    total += dt

    # 7. extraction
    def extract():
        return [al._extract_safe(g, paths[i], int(Ts[i]), int(scores[i]))
                for i in range(batch)]
    segs, dt = stage("host extraction", lambda: extract())
    total += dt

    audio_sec = len(raw) / 16000.0 * batch
    print(f"{'TOTAL (unpipelined)':28s} {total*1e3:9.2f} ms "
          f"-> {audio_sec/total:.0f} audio-s/s")


if __name__ == "__main__":
    main()
