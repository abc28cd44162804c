"""Stage-level timing of the mixed-transcript batch path (VERDICT r4
weak #2: measure the bound, don't guess).

Times, with block_until_ready isolation:
  fe      host C++ MFCC + wire pack
  h2d     device_put of the byte planes
  feats   dynamic features jit
  dense   dense grouped senone scoring (dist+topn+sen_eval)
  gather  per-row [G]->[S] column gather
  vit     multi-graph Viterbi + backtrace
  d2h     path download
  extract host segment extraction
Plus the pipelined end-to-end number (align_batch_begin/end) for
comparison with bench.py's mixed metric.
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp


def t(fn, reps=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") or \
        isinstance(out, (list, tuple)) else None
    return (time.perf_counter() - t0) / reps


def main():
    sys.path.insert(0, REPO)
    sys.argv = [sys.argv[0]]
    from bench import make_mixed
    from soundswallower_tpu.aligner import TpuAligner, _gather_cols
    from soundswallower_tpu.ops.senscore_jax import (score_frames,
                                                     score_frames_graph)

    B = int(os.environ.get("PB", "64"))
    raw = np.fromfile("/root/reference/tests/data/goforward.raw",
                      dtype=np.int16)
    al = TpuAligner(hmm="/root/reference/model/en-us")
    pairs = make_mixed(raw, B)
    audios = [a for a, _ in pairs]
    texts = [t_ for _, t_ in pairs]
    audio_sec = sum(len(a) for a in audios) / 16000.0
    graphs = [al.graph_for_text(t_) for t_ in texts]

    # union working-set scoring + remapped stacks, like the product
    # path (the unrestricted dense [B*T, n_sen] route OOMs at B>=256;
    # _union_scorer returns None when the working set covers most of
    # the inventory, in which case dense IS the product path)
    uni = al._union_scorer(graphs)
    if uni is None:
        st = al._stacked_graphs(graphs)
    else:
        st = al._stacked_graphs(graphs, remap=uni["pos"],
                                remap_ver=uni["ver"])
    ns = np.array([len(a) for a in audios])
    Ts = np.array([al.fe.n_frames(int(n)) for n in ns])
    Tmax = max(64, -(-int(Ts.max()) // 64) * 64)
    print(f"B={B} Tmax={Tmax} P={st['P']} K={st['K']} "
          f"S={st['sencols'].shape[1]} audio_sec={audio_sec:.1f}", flush=True)

    # stage: host FE
    def fe():
        return al.native_fe.process_list_i16p(audios, Tmax, al.wire_scale)
    d_fe = t(fe)
    pl = fe()

    def h2d():
        x = jax.device_put(pl)
        jax.block_until_ready(x)
        return x
    d_h2d = t(h2d)
    pl_d = h2d()
    Ts_d = jax.device_put(Ts)

    def feats():
        f = al._feats_chunk_planes(pl_d, Ts_d, Tmax)
        jax.block_until_ready(f)
        return f
    d_feats = t(feats)
    fv = feats()
    flat = fv.reshape((-1,) + fv.shape[2:])

    def dense():
        if uni is not None:
            d = score_frames_graph(uni["gs"], flat, "fold")
        else:
            d = score_frames(al.tables, flat, "fold")
        jax.block_until_ready(d)
        return d
    d_dense = t(dense)
    dn = dense().reshape(B, Tmax, -1)

    def gath():
        g = _gather_cols(dn, st["sencols"])
        jax.block_until_ready(g)
        return g
    d_gather = t(gath)
    sen_all = gath()

    Ts_d32 = jax.device_put(Ts.astype(np.int32))

    def vit():
        out = al._vit_full_mg(st, sen_all, Ts_d32)
        jax.block_until_ready(out)
        return out
    d_vit = t(vit)
    paths_d, _, final_d = vit()

    def d2h():
        return np.asarray(paths_d), np.asarray(final_d)
    d_d2h = t(d2h)
    paths, finals = d2h()

    def extract():
        return [al._extract_safe(graphs[i], paths[i], int(Ts[i]),
                                 int(finals[i])) for i in range(B)]
    d_ex = t(extract)

    tot = d_fe + d_h2d + d_feats + d_dense + d_gather + d_vit + d_d2h + d_ex
    for name, v in [("fe", d_fe), ("h2d", d_h2d), ("feats", d_feats),
                    ("dense", d_dense), ("gather", d_gather), ("vit", d_vit),
                    ("d2h", d_d2h), ("extract", d_ex), ("TOTAL", tot)]:
        print(f"{name:8s} {v*1000:9.2f} ms  {audio_sec/v:9.0f} audio-s/s",
              flush=True)

    # pipelined end-to-end (what bench.py measures)
    rng = np.random.RandomState(0)

    def perturb():
        return [(a + rng.randint(-1, 2, len(a)).astype(np.int16))
                for a in audios]
    al.align_batch(perturb(), texts)  # warm
    reps = 5
    batches = [perturb() for _ in range(reps)]
    t0 = time.perf_counter()
    pending = al.align_batch_begin(batches[0], texts)
    for b in batches[1:]:
        nxt = al.align_batch_begin(b, texts)
        al.align_batch_end(pending)
        pending = nxt
    al.align_batch_end(pending)
    dt = (time.perf_counter() - t0) / reps
    print(f"pipelined e2e {dt*1000:9.2f} ms  {audio_sec/dt:9.0f} audio-s/s",
          flush=True)


if __name__ == "__main__":
    main()
