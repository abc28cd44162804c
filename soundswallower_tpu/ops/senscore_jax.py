"""Batched TPU senone scoring (dense fast path).

Computes int16 senone scores for whole utterances (or batches) in one jit:

1. Mahalanobis distances for every (frame, codebook, stream, density) via
   the same float32 fold as the C code (det - sum diff^2*var in dim order;
   exact on TPU where f32 is native), or optionally an MXU matmul
   expansion (faster, different rounding).
2. Per-frame top-N densities by final int32 distance (lax.top_k).  This
   intentionally drops two C quirks with negligible effect (measured
   3/35028 top-4 sets on goforward): the dynamic-threshold early
   termination of eval_cb (ptm_mgau.c:181-209) and cross-frame seeding.
3. Integer normalization (codebook_norm semantics: >>SENSCR_SHIFT,
   subtract per-stream max over codebooks, negate, clamp at
   MAX_NEG_ASCR=96) and senone evaluation via the 8-bit log-add table
   (senone_eval semantics), all exact int ops.

Scores: int16 [T, n_sen], 0 = best per frame (compallsen convention).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..am import AcousticModel
from ..logmath import SENSCR_SHIFT

MAX_NEG_ASCR = 96
MAX_NEG_INT32 = -2147483648


@dataclass(eq=False)
class ScorerTables:
    """Device-resident model tables."""

    means: jnp.ndarray      # f32 [cb, F, D, L]
    var_t: jnp.ndarray      # f32 [cb, F, D, L]
    det: jnp.ndarray        # f32 [cb, F, D]
    mixw: jnp.ndarray       # uint8 [F, D, n_sen]
    sen2cb: jnp.ndarray     # int32 [n_sen]
    table8: jnp.ndarray     # uint8 [>=256] log-add table
    max_topn: int = 4

    @classmethod
    def from_am(cls, am: AcousticModel) -> "ScorerTables":
        if am.mixw_cb is not None:
            # unpack 4-bit clustered sendump to flat uint8 weights
            sens = np.arange(am.n_sen)
            packed = am.mixw[:, :, sens // 2].astype(np.int64)
            dcw = np.where(packed & 1, packed >> 4, packed & 0x0F)
            mixw = am.mixw_cb[dcw].astype(np.uint8)
        else:
            mixw = am.mixw
        return cls(
            means=jnp.asarray(am.means),
            var_t=jnp.asarray(am.var_t),
            det=jnp.asarray(am.det),
            mixw=jnp.asarray(mixw),
            sen2cb=jnp.asarray(am.sen2cb, dtype=jnp.int32),
            table8=jnp.asarray(am.lmath_8b.table),
            max_topn=am.max_topn,
        )


def _distances_fold(t: ScorerTables, feats):
    """f32 fold distances: feats [T, F, L] -> [T, cb, F, D] float32."""
    L = t.means.shape[-1]
    obs = feats[:, None, :, None, :]           # [T, 1, F, 1, L]
    diff = obs - t.means[None]                  # [T, cb, F, D, L]
    compl_ = (diff * diff) * t.var_t[None]
    d = jnp.broadcast_to(t.det[None], compl_.shape[:-1]).astype(jnp.float32)
    for i in range(L):
        d = d - compl_[..., i]
    return d


def _distances_mxu(t: ScorerTables, feats):
    """MXU expansion: d = det - c - x2.v + 2 x.(mu*v).

    feats [T, F, L].  Different f32 rounding than the fold (documented);
    used for max-throughput mode.
    """
    mu_v = t.means * t.var_t                               # [cb,F,D,L]
    c = jnp.sum(t.means * mu_v, axis=-1)                    # [cb,F,D]
    # einsum over L: [T,F,L] x [cb,F,D,L] -> [T,cb,F,D]
    xv = jnp.einsum("tfl,cfdl->tcfd", feats * feats, t.var_t,
                    preferred_element_type=jnp.float32)
    xmv = jnp.einsum("tfl,cfdl->tcfd", feats, mu_v,
                     preferred_element_type=jnp.float32)
    return t.det[None] - c[None] - xv + 2.0 * xmv


def _int_dist(d):
    out = d.astype(jnp.int32)  # rounds toward zero? jnp cast truncates
    return jnp.where(d < jnp.float32(MAX_NEG_INT32),
                     jnp.int32(MAX_NEG_INT32), out)


@partial(jax.jit, static_argnums=(0, 2))
def score_frames(tables: ScorerTables, feats, dist_mode: str = "fold"):
    """feats [T, F, L] float32 -> senone scores int16 [T, n_sen].

    Dense compallsen scoring; all frames independent (vectorized over T).
    """
    t = tables
    if dist_mode == "mxu":
        d = _distances_mxu(t, feats)
    else:
        d = _distances_fold(t, feats)
    di = _int_dist(d)                                       # [T,cb,F,D]
    topn_scores, topn_cw = jax.lax.top_k(di, t.max_topn)    # [T,cb,F,N]

    # codebook_norm (ptm_mgau.c:264-295): per stream across codebooks
    shifted = topn_scores >> SENSCR_SHIFT
    norm = jnp.max(shifted[..., 0], axis=1, keepdims=True)  # [T,1,F]
    s = -(shifted - norm[..., None])
    s = jnp.minimum(s, MAX_NEG_ASCR)                        # [T,cb,F,N] int32

    # senone_eval (ptm_mgau.c:326-403)
    cbs = t.sen2cb                                          # [S]
    cw_s = topn_cw[:, cbs]                                  # [T,S,F,N]
    sc_s = s[:, cbs]                                        # [T,S,F,N]
    S = cbs.shape[0]
    sen_ids = jnp.arange(S)
    # mixw gather: mw[t,s,f,j] = mixw[f, cw_s[t,s,f,j], s]
    mixw = t.mixw.astype(jnp.int32)                         # [F,D,S]
    f_idx = jnp.arange(mixw.shape[0])[None, None, :, None]
    s_idx = sen_ids[None, :, None, None]
    mw = mixw[f_idx, cw_s, s_idx]                           # [T,S,F,N]
    terms = mw + sc_s                                       # [T,S,F,N]
    table = t.table8.astype(jnp.int32)
    fden = terms[..., 0]
    for j in range(1, terms.shape[-1]):
        term = terms[..., j]
        dd = jnp.abs(fden - term)
        r = jnp.minimum(fden, term)
        fden = r - table[jnp.minimum(dd, table.shape[0] - 1)]
    ascore = jnp.sum(fden, axis=-1)                         # [T,S]
    best = jnp.min(ascore, axis=-1, keepdims=True)
    out = (ascore.astype(jnp.int16) - best.astype(jnp.int16))
    return out
