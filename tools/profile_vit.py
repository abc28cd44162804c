"""Microbench the batched Viterbi: scan vs backtrace split, unroll sweep."""

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
    from soundswallower_tpu.ops.align_jax import (
        WORST_SCORE, align_viterbi, backtrace, build_pred_table)

    B = int(os.environ.get("BENCH_BATCH", "64"))
    al = TpuAligner(hmm="/root/reference/model/en-us")
    g = al.graph_for_text("go forward ten meters")
    P = len(g.senid)
    Tmax = 192
    pi, pp, pk = build_pred_table(g.edge_src, g.edge_dst, g.edge_pen, P)
    print(f"P={P} nodes, K={pi.shape[1]}, B={B}, T={Tmax}")

    rng = np.random.RandomState(0)
    senscr = jnp.asarray(
        rng.randint(0, 200, (B, Tmax, al.tables.valid_g.size)).astype(np.int16))
    Ts = jnp.full((B,), 183, jnp.int32)

    entry = jnp.asarray(
        np.where(g.is_entry, g.entry_pen, WORST_SCORE).astype(np.int32))
    senid = jnp.asarray(al.tables.sen_remap[g.senid].astype(np.int32))
    tp = al.tmat_i32[jnp.asarray(g.tmatid)]
    pi, pp, pk = jnp.asarray(pi), jnp.asarray(pp), jnp.asarray(pk)
    ast, aen = jnp.asarray(g.astart), jnp.asarray(g.aend)
    fin = jnp.asarray(g.final_nodes)

    def vit_only(ss, T):
        tok_id, _, out_score, out_hist = align_viterbi(
            ss, senid, tp, pi, pp, pk, ast, aen, T, entry, False)
        return tok_id, out_score, out_hist

    def bt_only(tok_id, out_score, out_hist, T):
        fsc = out_score[fin]
        best = jnp.argmax(fsc)
        final_node = fin[best]
        path, _ = backtrace(tok_id, None, out_hist[final_node],
                            out_score[final_node], T)
        return path

    vj = jax.jit(jax.vmap(vit_only))
    bj = jax.jit(jax.vmap(bt_only))

    def timeit(name, fn, reps=10):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        print(f"{name:28s} {dt*1e3:8.2f} ms")
        return out

    toks = timeit("viterbi scan only", lambda: vj(senscr, Ts))
    timeit("backtrace only", lambda: bj(*toks, Ts))

    def full(ss, T):
        tok_id, _, out_score, out_hist = align_viterbi(
            ss, senid, tp, pi, pp, pk, ast, aen, T, entry, False)
        fsc = out_score[fin]
        best = jnp.argmax(fsc)
        final_node = fin[best]
        path, _ = backtrace(tok_id, None, out_hist[final_node],
                            out_score[final_node], T)
        return path, out_score[final_node]
    fj = jax.jit(jax.vmap(full))
    timeit("fused vit+bt", lambda: fj(senscr, Ts))


if __name__ == "__main__":
    main()
