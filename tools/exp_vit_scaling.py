"""Experiment: Viterbi scan + backtrace cost vs batch size.

If the scan is per-step-overhead dominated, running the FULL batch in
one scan (instead of SST_BATCH_CHUNK=64 chunks) amortizes 320 sequential
step latencies across 8x more utterances for ~free.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timeit(name, fn, reps=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:44s} {dt*1e3:8.2f} ms")
    return out


def main():
    from soundswallower_tpu.aligner import TpuAligner
    from soundswallower_tpu.ops.align_jax import (
        WORST_SCORE, align_viterbi, backtrace, build_pred_table)

    al = TpuAligner(hmm="/root/reference/model/en-us")
    g = al.graph_for_text("go forward ten meters")
    P = len(g.senid)
    Tmax = 320
    n_sen = al.tables.valid_g.size
    rng = np.random.RandomState(0)

    entry = jnp.asarray(
        np.where(g.is_entry, g.entry_pen, WORST_SCORE).astype(np.int32))
    senid = jnp.asarray(al.tables.sen_remap[g.senid].astype(np.int32))
    tp = al.tmat_i32[jnp.asarray(g.tmatid)]
    pi, pp, pk = build_pred_table(g.edge_src, g.edge_dst, g.edge_pen, P)
    pi_j, pp_j, pk_j = jnp.asarray(pi), jnp.asarray(pp), jnp.asarray(pk)
    ast, aen = jnp.asarray(g.astart), jnp.asarray(g.aend)
    fin = jnp.asarray(g.final_nodes)

    def vit_one(senscr, T):
        tok_id, _, out_score, out_hist = align_viterbi(
            senscr, senid, tp, pi_j, pp_j, pk_j, ast, aen, T, entry, False)
        fsc = out_score[fin]
        best = jnp.argmax(fsc)
        final_node = fin[best]
        path, _ = backtrace(tok_id, None, out_hist[final_node],
                            out_score[final_node], T)
        return path, out_score[final_node]

    def vit_only(senscr, T):
        tok_id, _, out_score, out_hist = align_viterbi(
            senscr, senid, tp, pi_j, pp_j, pk_j, ast, aen, T, entry, False)
        return tok_id, out_score, out_hist

    for B in (64, 256, 512):
        senscr = jnp.asarray(
            rng.randint(0, 200, (B, Tmax, n_sen)).astype(np.int16))
        Ts = jnp.full((B,), 297, jnp.int32)
        f_full = jax.jit(jax.vmap(vit_one))
        f_vit = jax.jit(jax.vmap(vit_only))
        timeit(f"B={B} viterbi only", lambda: f_vit(senscr, Ts))
        timeit(f"B={B} viterbi+argmax+backtrace", lambda: f_full(senscr, Ts))


if __name__ == "__main__":
    main()
