"""Fused Mahalanobis-distance + top-N Pallas kernel.

The staged scorer (senscore_jax.py) materializes int32 distances
[T, cb, F, D] in HBM (258 KB per frame for en-us) and re-reads them for
top-k: ~0.5 MB of HBM traffic per frame.  This kernel keeps each
[frames, D] distance tile in VMEM and reduces it to the top-N
(score, codeword) pairs in place, so HBM sees only feats in
(TT*F*L floats) and topN out (cb*F*N pairs) — a ~60x traffic cut on
the scorer's dominant stage.

Exactness: the per-dimension fold runs in the same f32 operation order
as `_distances_fold` (one subtract-multiply-subtract per dim, feats
broadcast against the codebook row), the int cast matches `_int_dist`
(truncate toward zero + MAX_NEG_INT32 clamp), and top-N picks
first-max-wins like lax.top_k — so outputs are bit-identical to the
staged path (tests/test_senscore_pallas.py).

Layout: frames ride the sublane axis, densities the lane axis
([TT, D=128] tiles); outputs pack (cb, f, n) onto lanes as
[TT, ceil(cb*F*N/128)*128], sliced and reshaped (no transpose) by the
caller.  The codebook/stream loop is unrolled at trace time (static
offsets -> plain vector stores).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_NEG_INT32 = -2147483648


def _kernel(feats_ref, means_ref, var_ref, det_ref, sc_ref, cw_ref,
            *, n_cb, n_feat, n_den, n_dim, topn, out_lanes):
    """One frame-tile program: fori_loop over codebooks (traced once, so
    the op count stays small for the Mosaic lowering); each iteration
    reduces its [TT, D] distance tiles to top-N and masks the results
    into a register-carried [TT, out_lanes] accumulator, written once."""
    TT = feats_ref.shape[0]
    i32 = jnp.int32
    lane = jax.lax.broadcasted_iota(i32, (TT, n_den), 1)
    out_lane = jax.lax.broadcasted_iota(i32, (TT, out_lanes), 1)

    def body(c, acc):
        sc_full, cw_full = acc
        base = c * (n_feat * topn)
        for f in range(n_feat):
            # distance fold, same f32 op order as _distances_fold
            d = jnp.broadcast_to(det_ref[c, f][None, :], (TT, n_den))
            for l in range(n_dim):
                diff = feats_ref[:, f, l][:, None] - \
                    means_ref[c, f, :, l][None, :]
                d = d - (diff * diff) * var_ref[c, f, :, l][None, :]
            # int cast (_int_dist): truncate toward zero, clamp lower
            di = jnp.where(d < jnp.float32(MAX_NEG_INT32),
                           i32(MAX_NEG_INT32), d.astype(i32))
            # top-N, first-max-wins (== lax.top_k tie-breaking)
            for n in range(topn):
                m = jnp.max(di, axis=1, keepdims=True)          # [TT,1]
                ismax = di == m
                idx = jnp.min(jnp.where(ismax, lane, i32(n_den)),
                              axis=1, keepdims=True)            # [TT,1]
                k = base + f * topn + n
                sc_full = jnp.where(out_lane == k, m, sc_full)
                cw_full = jnp.where(out_lane == k, idx, cw_full)
                di = jnp.where(lane == idx, i32(MAX_NEG_INT32), di)
        return sc_full, cw_full

    zeros = jnp.zeros((TT, out_lanes), i32)
    # i32 loop bounds: under jax_enable_x64 (set by the package for the
    # f64-exact FE) Python-int bounds make the induction variable i64,
    # and Mosaic's i64-convert fallback recurses forever.
    sc_full, cw_full = jax.lax.fori_loop(i32(0), i32(n_cb), body,
                                         (zeros, zeros))
    sc_ref[:, :] = sc_full
    cw_ref[:, :] = cw_full


@partial(jax.jit, static_argnums=(4, 5))
def dist_topn_fused(feats, means, var_t, det, topn: int = 4,
                    interpret: bool = False):
    """feats [T, F, L] f32, means/var_t [cb, F, D, L] f32, det [cb, F, D]
    -> (topn_scores [T, cb, F, N] int32, topn_cw [T, cb, F, N] int32),
    bit-identical to _dist_stage + _topn_stage."""
    T = feats.shape[0]
    n_cb, n_feat, n_den, n_dim = means.shape
    TT = 128
    Tpad = -(-T // TT) * TT
    if Tpad != T:
        feats = jnp.pad(feats, ((0, Tpad - T), (0, 0), (0, 0)))
    out_lanes = -(-(n_cb * n_feat * topn) // 128) * 128
    grid = (Tpad // TT,)
    kern = partial(_kernel, n_cb=n_cb, n_feat=n_feat, n_den=n_den,
                   n_dim=n_dim, topn=topn, out_lanes=out_lanes)
    # Trace with x64 OFF: the package enables jax_enable_x64 globally
    # (f64-exact FE), which makes BlockSpec index maps and weak-typed
    # scalars i64 — types Mosaic cannot legalize.  Everything in this
    # kernel is explicitly f32/i32.
    with jax.enable_x64(False):
        return _call(kern, grid, feats, means, var_t, det,
                     T, Tpad, TT, n_cb, n_feat, n_den, n_dim,
                     topn, out_lanes, interpret)


def _call(kern, grid, feats, means, var_t, det, T, Tpad, TT,
          n_cb, n_feat, n_den, n_dim, topn, out_lanes, interpret):
    sc, cw = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TT, n_feat, n_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_cb, n_feat, n_den, n_dim),
                         lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_cb, n_feat, n_den, n_dim),
                         lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_cb, n_feat, n_den), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TT, out_lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, out_lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tpad, out_lanes), jnp.int32),
            jax.ShapeDtypeStruct((Tpad, out_lanes), jnp.int32),
        ),
        interpret=interpret,
    )(feats, means, var_t, det)
    k = n_cb * n_feat * topn
    sc = sc[:T, :k].reshape(T, n_cb, n_feat, topn)
    cw = cw[:T, :k].reshape(T, n_cb, n_feat, topn)
    return sc, cw
