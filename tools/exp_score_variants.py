"""Re-evaluate scorer staging decisions with REAL timings (round 2's
choices were made with a broken block_until_ready).

Variants:
  A. staged: dist fold -> top_k -> sen stage (current default)
  B. one-jit: dist fold + 4x argmax rounds + sen stage, single jit
     (lets XLA fuse dist into the top-N reduction, no HBM distances)
  C. staged but top-N via argmax rounds instead of top_k
  D. pallas fused dist+topn + sen stage
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from tools.tpu_timing import timeit  # noqa: E402
from soundswallower_tpu.ops.senscore_jax import (  # noqa: E402
    _dist_stage, _distances_fold, _int_dist, _topn_stage, _sen_stage,
    _sen_eval)


def _topn_argmax_rounds(di, n):
    D = di.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, di.shape, di.ndim - 1)
    scs, cws = [], []
    for _ in range(n):
        m = jnp.max(di, axis=-1, keepdims=True)
        ismax = di == m
        idx = jnp.min(jnp.where(ismax, lane, D), axis=-1, keepdims=True)
        scs.append(m[..., 0])
        cws.append(idx[..., 0])
        di = jnp.where(lane == idx, jnp.int32(-2147483648), di)
    return jnp.stack(scs, -1), jnp.stack(cws, -1)


def main():
    from soundswallower_tpu.aligner import TpuAligner

    al = TpuAligner(hmm="/root/reference/model/en-us")
    t = al.tables
    rng = np.random.RandomState(0)
    TT = 20480
    feats = jnp.asarray(rng.randn(TT, 3, 13).astype(np.float32) * 2)

    def staged(f):
        di = _dist_stage(t, f, "fold")
        a, b = _topn_stage(t, di)
        return _sen_stage(t, a, b)

    @jax.jit
    def onejit(f):
        di = _int_dist(_distances_fold(t, f))
        a, b = _topn_argmax_rounds(di, t.max_topn)
        return _sen_eval(t, a, b)

    @jax.jit
    def onejit_topk(f):
        di = _int_dist(_distances_fold(t, f))
        a, b = jax.lax.top_k(di, t.max_topn)
        return _sen_eval(t, a, b.astype(jnp.int32))

    @jax.jit
    def dist_argmax(f):
        di = _int_dist(_distances_fold(t, f))
        return _topn_argmax_rounds(di, t.max_topn)

    r0, _ = timeit("A staged (current)", lambda: staged(feats))
    r1, _ = timeit("B one-jit fold+argmax+sen", lambda: onejit(feats))
    r2, _ = timeit("B2 one-jit fold+topk+sen", lambda: onejit_topk(feats))
    r3, _ = timeit("C dist+argmax (no sen)", lambda: dist_argmax(feats))
    print("parity B vs A:", bool(jnp.all(r0 == r1)))
    print("parity B2 vs A:", bool(jnp.all(r0 == r2)))

    try:
        from soundswallower_tpu.ops.senscore_pallas import dist_topn_fused

        def pallas_chain(f):
            a, b = dist_topn_fused(f, t.means, t.var_t, t.det, t.max_topn)
            return _sen_stage(t, a, b)

        r4, _ = timeit("D pallas dist+topn + sen", lambda: pallas_chain(feats))
        print("parity D vs A:", bool(jnp.all(r0 == r4)))
    except Exception as e:  # noqa: BLE001
        print("pallas variant failed:", e)


if __name__ == "__main__":
    main()
