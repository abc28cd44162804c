"""Experiment: where does the Viterbi time go, and does a gather-free
step (dense adjacency + one-hot senone matmul) beat the current one?

Not a test -- a scratch profiler for round-3 optimization work.
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
    print(f"{name:36s} {dt*1e3:8.2f} ms")
    return out


def main():
    from soundswallower_tpu.aligner import TpuAligner
    from soundswallower_tpu.ops.align_jax import (
        WORST_SCORE, align_viterbi, backtrace, build_pred_table)

    B = int(os.environ.get("BENCH_BATCH", "64"))
    al = TpuAligner(hmm="/root/reference/model/en-us")
    g = al.graph_for_text("go forward ten meters")
    P = len(g.senid)
    Tmax = 320
    n_sen = al.tables.valid_g.size

    rng = np.random.RandomState(0)
    senscr = jnp.asarray(
        rng.randint(0, 200, (B, Tmax, n_sen)).astype(np.int16))
    Ts = jnp.full((B,), 297, jnp.int32)

    entry = jnp.asarray(
        np.where(g.is_entry, g.entry_pen, WORST_SCORE).astype(np.int32))
    senid = jnp.asarray(al.tables.sen_remap[g.senid].astype(np.int32))
    tp = al.tmat_i32[jnp.asarray(g.tmatid)]
    pi, pp, pk = build_pred_table(g.edge_src, g.edge_dst, g.edge_pen, P)
    pi_j, pp_j, pk_j = jnp.asarray(pi), jnp.asarray(pp), jnp.asarray(pk)
    print(f"P={P} K={pi.shape[1]} B={B} T={Tmax} n_sen={n_sen}")

    # -- 1. pre-gather alone -------------------------------------------------
    @jax.jit
    def pregather(ss):
        return ss.astype(jnp.int32)[:, :, senid]
    timeit("pre-gather [B,T,nsen]->[B,T,P,3]", lambda: pregather(senscr))

    # one-hot matmul version (f32 exact: senone scores are int16)
    onehot = np.zeros((n_sen, P * 3), np.float32)
    onehot[np.asarray(senid).reshape(-1), np.arange(P * 3)] = 1.0
    oh = jnp.asarray(onehot)

    @jax.jit
    def pregather_mm(ss):
        flat = ss.reshape(-1, n_sen).astype(jnp.float32)
        out = flat @ oh
        return out.astype(jnp.int32).reshape(B, Tmax, P, 3)
    r1 = timeit("pre-gather via one-hot matmul", lambda: pregather_mm(senscr))
    r0 = pregather(senscr)
    assert np.array_equal(np.asarray(r0), np.asarray(r1)), "matmul gather mismatch"

    # -- 2. scan alone, given pre-gathered scores ---------------------------
    from soundswallower_tpu.ops.align_jax import make_vit_step, vit_carry0

    sen_all = pregather(senscr)  # [B,T,P,3]

    def vit_pre(sa, T):
        step = make_vit_step(senid, tp, pi_j, pp_j, pk_j,
                             jnp.asarray(g.astart), jnp.asarray(g.aend),
                             T, False, jnp.int16)
        carry0 = vit_carry0(P, entry)
        (score, hist, out_score, out_hist, _), (tok_id, _) = \
            jax.lax.scan(step, carry0,
                         (jnp.arange(Tmax, dtype=jnp.int32), sa), unroll=4)
        return tok_id, out_score, out_hist

    vj = jax.jit(jax.vmap(vit_pre))
    toks = timeit("scan only (pregathered)", lambda: vj(sen_all, Ts))

    # -- 3. full current path ------------------------------------------------
    def full(ss, T):
        tok_id, _, out_score, out_hist = align_viterbi(
            ss, senid, tp, pi_j, pp_j, pk_j,
            jnp.asarray(g.astart), jnp.asarray(g.aend), T, entry, False)
        return tok_id, out_score, out_hist
    fj = jax.jit(jax.vmap(full))
    cur = timeit("current align_viterbi", lambda: fj(senscr, Ts))

    # -- 4. unroll sweep on the scan -----------------------------------------
    for unroll in (1, 8, 16):
        def vit_u(sa, T, unroll=unroll):
            step = make_vit_step(senid, tp, pi_j, pp_j, pk_j,
                                 jnp.asarray(g.astart), jnp.asarray(g.aend),
                                 T, False, jnp.int16)
            carry0 = vit_carry0(P, entry)
            _, (tok_id, _) = jax.lax.scan(
                step, carry0,
                (jnp.arange(Tmax, dtype=jnp.int32), sa), unroll=unroll)
            return tok_id
        vju = jax.jit(jax.vmap(vit_u))
        timeit(f"scan unroll={unroll}", lambda: vju(sen_all, Ts))


if __name__ == "__main__":
    main()
