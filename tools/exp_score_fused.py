"""Experiment: fuse the graph scorer's dist -> top-N -> senone-eval
stages into ONE jit that processes the frame axis in fixed-size blocks
(lax.map), so the [C, Cu, F, D] distance block and its top-N
intermediates stay loop-local (VMEM-resident if small enough) instead
of round-tripping a [T, Cu, F, D] tensor through HBM between three
dispatched kernels.

Measures the current two-dispatch score_frames_graph against the
chunked fused variant at several block sizes, with fetch-forced
completion (block_until_ready is dispatch-lazy on the tunnel runtime),
and asserts bit-identical outputs.

Run on the real TPU:  python tools/exp_score_fused.py

RESULT (v5e, B=256 mixed workload, T=98304, Cu=17, S=256; r5):
  current two-dispatch:  86.2 ms
  fused lax.map C=256..4096: 137.6-146.1 ms (all bit-exact) — the
  sequential block loop serializes what the wide dispatch overlaps;
  XLA does not keep the block intermediates VMEM-resident enough to
  win the HBM traffic back.  Further probes the same day:
  - top-N taken-mask (current) 51.9 ms vs index-comparison masking
    52.5 ms vs packed-int64 single-reduction 48.5 ms (exact): the
    two-reductions-per-round structure is NOT the bound; +3 ms is
    inside tunnel noise and not worth the int64 subtlety.
  - folding [T, Cu, F, D] -> [T, Cu*F, D] (avoiding the assumed
    sublane padding of F=3 -> 8): dist 29.1 -> 38.5 ms, top-N
    52.2 -> 67.7 ms — SLOWER; the lowering does not pad the way the
    tile model suggests, and the shape-sensitivity rule
    (.claude/skills/verify) wins again.
  Conclusion: the staged scorer stays as is.
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from bench import make_mixed


def fetch(x):
    return np.asarray(x.ravel()[0])


def t(fn, reps=4):
    out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    from functools import partial

    from soundswallower_tpu.aligner import TpuAligner
    from soundswallower_tpu.ops.senscore_jax import (
        _dist_stage_graph, _topn_sen_stage_graph, score_frames_graph)

    B = int(os.environ.get("PB", "256"))
    raw = np.fromfile("/root/reference/tests/data/goforward.raw",
                      dtype=np.int16)
    al = TpuAligner(hmm="/root/reference/model/en-us")
    pairs = make_mixed(raw, B, n_words=5 if B > 200 else 4)
    audios = [a for a, _ in pairs]
    texts = [t_ for _, t_ in pairs]
    graphs = [al.graph_for_text(t_) for t_ in texts]
    uni = al._union_scorer(graphs)
    gs = uni["gs"]
    ns = np.array([len(a) for a in audios])
    Ts = np.array([al.fe.n_frames(int(n)) for n in ns])
    Tmax = max(64, al.tmax_floor, -(-int(Ts.max()) // 64) * 64)
    pl = al.native_fe.process_list_i16p(audios, Tmax, al.wire_scale)
    fv = al._feats_chunk_planes(jax.device_put(pl), jax.device_put(Ts), Tmax)
    flat = fv.reshape((-1,) + fv.shape[2:])
    T = flat.shape[0]
    print(f"B={B} T={T} Cu={gs.means.shape[0]} S={gs.wsel.shape[-1]}",
          flush=True)

    d_cur, ref = t(lambda: score_frames_graph(gs, flat, "fold"))
    print(f"current two-dispatch: {d_cur*1000:8.2f} ms", flush=True)

    @partial(jax.jit, static_argnums=(2,))
    def fused(gs, flat, C):
        blocks = flat.reshape(-1, C, *flat.shape[1:])

        def body(fb):
            di = _dist_stage_graph.__wrapped__(gs, fb, "fold")
            return _topn_sen_stage_graph.__wrapped__(gs, di)

        out = jax.lax.map(body, blocks)
        return out.reshape(-1, out.shape[-1])

    for C in (256, 512, 1024, 2048, 4096):
        if T % C:
            continue
        d_f, out = t(lambda C=C: fused(gs, flat, C))
        same = bool(jnp.array_equal(out, ref))
        print(f"fused C={C:5d}: {d_f*1000:8.2f} ms  exact={same}",
              flush=True)


if __name__ == "__main__":
    main()
