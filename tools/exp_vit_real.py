"""Dissect _vit_full_mg cost on the REAL mixed-batch tensors: the bare
align_viterbi_batch vs select vs backtrace vs the fused jit."""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp


def bench(fn, reps=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    sys.argv = [sys.argv[0]]
    from bench import make_mixed
    from soundswallower_tpu.aligner import TpuAligner, _gather_cols
    from soundswallower_tpu.ops.align_jax import (align_viterbi_batch,
                                                  backtrace_batch, WORST_SCORE)
    from soundswallower_tpu.ops.senscore_jax import score_frames

    B = int(os.environ.get("PB", "64"))
    raw = np.fromfile("/root/reference/tests/data/goforward.raw",
                      dtype=np.int16)
    al = TpuAligner(hmm="/root/reference/model/en-us")
    pairs = make_mixed(raw, B)
    audios = [a for a, _ in pairs]
    texts = [t_ for _, t_ in pairs]
    graphs = [al.graph_for_text(t_) for t_ in texts]
    st = al._stacked_graphs(graphs)
    ns = np.array([len(a) for a in audios])
    Ts = np.array([al.fe.n_frames(int(n)) for n in ns])
    Tmax = max(64, -(-int(Ts.max()) // 64) * 64)
    print(f"B={B} Tmax={Tmax} P={st['P']} K={st['K']} W={st['W']}",
          flush=True)
    pl = al.native_fe.process_list_i16p(audios, Tmax, al.wire_scale)
    fv = al._feats_chunk_planes(jax.device_put(pl), jax.device_put(Ts), Tmax)
    flat = fv.reshape((-1,) + fv.shape[2:])
    dense = score_frames(al.tables, flat, "fold").reshape(B, Tmax, -1)
    sen_all = _gather_cols(dense, st["sencols"])
    jax.block_until_ready(sen_all)
    Ts_d = jax.device_put(Ts.astype(np.int32))

    def bare():
        out = align_viterbi_batch(sen_all, st["tp"], st["pred_idx"],
                                  st["pred_pen"], st["pred_ok"],
                                  st["astart"], st["aend"], Ts_d, False,
                                  st["entry"], band_pen=st.get("band_pen"),
                                  band_ok=st.get("band_ok"))
        jax.block_until_ready(out)
        return out
    d = bench(bare)
    print(f"bare viterbi      {d*1000:8.2f} ms", flush=True)
    tok_id, _, out_score, out_hist = bare()

    @jax.jit
    def select(out_score, out_hist):
        worst = jnp.int32(WORST_SCORE)
        fsc = jnp.where(st["final_mask"], out_score, worst)
        final_node = jnp.argmax(fsc, axis=1)
        rows = jnp.arange(out_score.shape[0])
        fscore = fsc[rows, final_node]
        fstate = jnp.where(fscore > worst, out_hist[rows, final_node], -1)
        return fstate, fscore

    d = bench(lambda: jax.block_until_ready(select(out_score, out_hist)))
    print(f"final select      {d*1000:8.2f} ms", flush=True)
    fstate, fscore = select(out_score, out_hist)

    def bt():
        out = backtrace_batch(tok_id, None, fstate, fscore, Ts_d)
        jax.block_until_ready(out[0])
        return out
    d = bench(bt)
    print(f"backtrace         {d*1000:8.2f} ms", flush=True)

    def fused():
        out = al._vit_full_mg(st, sen_all, Ts_d)
        jax.block_until_ready(out[0])
        return out
    d = bench(fused)
    print(f"fused _vit_full_mg{d*1000:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
