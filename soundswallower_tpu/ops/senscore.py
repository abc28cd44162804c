"""Senone scoring for PTM / semi-continuous Gaussian mixture models.

Two implementations:

* ``ScorerNp`` - exact host reference replicating ``src/ptm_mgau.c`` (and
  the structurally identical semi-continuous path in s2_semi_mgau.c)
  operation-for-operation, including the dynamic-threshold top-N codeword
  search with its 4-dim-checkpoint early termination (eval_cb,
  ptm_mgau.c:150-225), the cross-frame top-N seeding (frame_eval,
  ptm_mgau.c:408-454), quantized normalization (codebook_norm,
  ptm_mgau.c:264-295) and table-based log-add senone evaluation
  (senone_eval, ptm_mgau.c:326-403).  Vectorized over codebooks/features
  with numpy float32 (per-element IEEE ops, so bit-exact vs C), sequential
  over codewords where C is.  Used for bit-parity tests and as the oracle
  for the fast path.

* ``score_frames_jax`` (ops/senscore_jax.py) - dense TPU path.

Scores follow the C convention: int16, 0 = best in frame, larger = worse
(negated normalized log-likelihoods), SENSCR_SHIFT-quantized.
"""

from __future__ import annotations

import numpy as np

from ..am import AcousticModel
from ..logmath import SENSCR_SHIFT

MAX_NEG_INT32 = -2147483648
MAX_NEG_ASCR = 96
WORST_DIST = MAX_NEG_INT32


def dist_checkpoints(am: AcousticModel, obs: np.ndarray, group: int = 4):
    """All Mahalanobis distances with eval_cb's checkpoint partials.

    obs: [n_feat, L] float32.  Returns (checks, final) where
    checks: list of [cb, f, dens] float32 partial distances at the loop
    conditions of eval_cb, final: [cb, f, dens] float32.

    group=4 gives the PTM checkpoint structure (before dim 0, after the
    L%4 pre-loop, after each 4-dim group except the last,
    ptm_mgau.c:181-202); group=1 the semi-continuous one (before every
    dim, s2_semi_mgau.c:137-147).

    The fold subtracts per-dim terms in dimension order with float32
    rounding at every step, matching COMPUTE_GMM_MAP/REDUCE exactly.
    """
    L = am.means.shape[-1]
    diff = (obs[None, :, None, :] - am.means).astype(np.float32)
    sq = (diff * diff).astype(np.float32)
    compl_ = (sq * am.var_t).astype(np.float32)
    d = am.det.astype(np.float32).copy()
    checks = [d.copy()]
    if group == 1:
        for i in range(L):
            d = (d - compl_[..., i]).astype(np.float32)
            if i < L - 1:
                checks.append(d.copy())
        return checks, d
    pre = L % 4
    for i in range(pre):
        d = (d - compl_[..., i]).astype(np.float32)
    checks.append(d.copy())
    j = pre
    while j < L:
        for k in range(4):
            d = (d - compl_[..., j + k]).astype(np.float32)
        j += 4
        if j < L:
            checks.append(d.copy())
    return checks, d


def int_dist(d: np.ndarray) -> np.ndarray:
    """(int32)d with the C MAX_NEG_INT32 floor (eval_cb, ptm_mgau.c:218-221)."""
    out = np.trunc(d.astype(np.float64)).astype(np.int64)
    out = np.where(d < np.float32(MAX_NEG_INT32), MAX_NEG_INT32, out)
    return out


class ScorerNp:
    """Exact numpy replication of ptm_mgau scoring.

    Stateful across frames (and utterances!) exactly like the C code: the
    top-N history ring (s->hist) is only initialized once at decoder init
    (ptm_mgau_reset_fast_hist, ptm_mgau.c:694-720) and acmod_start_utt only
    resets mgau->frame_idx.
    """

    def __init__(self, am: AcousticModel):
        self.am = am
        self.n_mgau = am.n_mgau
        self.n_feat = am.n_feat
        self.max_topn = am.max_topn
        self.hist_cw = np.zeros((2, self.n_mgau, self.n_feat, self.max_topn), np.int64)
        self.hist_cw[:] = np.arange(self.max_topn)[None, None, None, :]
        self.hist_score = np.full(
            (2, self.n_mgau, self.n_feat, self.max_topn), WORST_DIST, np.int64
        )
        self.frame_idx = 0  # mgau->frame_idx (acmod_advance increments)

    def start_utt(self):
        self.frame_idx = 0

    def frame_eval(self, obs: np.ndarray, frame: int,
                   mgau_active: np.ndarray | None = None,
                   senone_active: np.ndarray | None = None) -> np.ndarray:
        """Score one frame.  obs: [n_feat, L] float32 feature vectors.

        mgau_active: bool [n_mgau] (None = all, compallsen).
        senone_active: evaluated senone ids incl. bridge senones (None =
        all).  Returns int16 [n_sen].
        """
        am = self.am
        if mgau_active is None:
            mgau_active = np.ones(self.n_mgau, bool)
        fi = frame % 2
        li = 1 - fi
        if frame >= self.frame_idx:
            self.hist_cw[fi] = self.hist_cw[li]
            self.hist_score[fi] = self.hist_score[li]
            group = 1 if am.backend == "semi" else 4
            checks, final = dist_checkpoints(am, obs, group)
            self._eval_topn(fi, final)
            if frame % am.ds_ratio == 0:
                self._eval_cb(fi, checks, final, mgau_active)
            self._codebook_norm(fi, mgau_active)
        return self._senone_eval(fi, mgau_active, senone_active)

    def _eval_topn(self, fi, final):
        """eval_topn (ptm_mgau.c:86-135): re-score seeds, stable-sort desc."""
        cws = self.hist_cw[fi]  # [cb, f, N]
        cb_i = np.arange(self.n_mgau)[:, None, None]
        f_i = np.arange(self.n_feat)[None, :, None]
        scores = int_dist(final[cb_i, f_i, cws])
        # insertion_sort_topn == stable descending sort by score
        order = np.argsort(-scores, axis=-1, kind="stable")
        self.hist_score[fi] = np.take_along_axis(scores, order, axis=-1)
        self.hist_cw[fi] = np.take_along_axis(cws, order, axis=-1)

    def _eval_cb(self, fi, checks, final, mgau_active):
        """eval_cb (ptm_mgau.c:150-225): sequential codeword scan with the
        dynamic worst-of-top-N threshold, vectorized over (cb, feat)."""
        am = self.am
        scores = self.hist_score[fi]  # [cb, f, N] int64
        cws = self.hist_cw[fi]
        N = self.max_topn
        act = mgau_active[:, None]  # [cb, 1]
        semi = am.backend == "semi"
        for cw in range(am.n_density):
            thresh = scores[..., N - 1].astype(np.float32)  # (mfcc_t)worst
            ok = act.copy()
            for c in checks:
                ok = ok & (c[..., cw] >= thresh)
            if semi:
                # final check is int (s2_semi_mgau.c:155-156)
                ok = ok & (int_dist(final[..., cw]) >= scores[..., N - 1])
            else:
                ok = ok & (final[..., cw] >= thresh)
            ok = ok & ~(cws == cw).any(axis=-1)
            if not ok.any():
                continue
            di = int_dist(final[..., cw])  # [cb, f]
            # insert di above entries with score <= di; drop worst
            rank = (scores > di[..., None]).sum(axis=-1)  # insertion index
            new_scores = scores.copy()
            new_cws = cws.copy()
            for k in range(N - 1, -1, -1):
                at_k = rank == k
                put = ok & at_k
                new_scores[..., k] = np.where(put, di, new_scores[..., k])
                new_cws[..., k] = np.where(put, cw, new_cws[..., k])
                if k + 1 < N:
                    shift = ok & (rank <= k)
                    new_scores[..., k + 1] = np.where(
                        shift, scores[..., k], new_scores[..., k + 1]
                    )
                    new_cws[..., k + 1] = np.where(
                        shift, cws[..., k], new_cws[..., k + 1]
                    )
            scores[...] = new_scores
            cws[...] = new_cws

    def _codebook_norm(self, fi, mgau_active):
        """ptm_mgau_codebook_norm (ptm_mgau.c:264-295)."""
        scores = self.hist_score[fi]
        act = mgau_active
        shifted = scores >> SENSCR_SHIFT
        for f in range(self.n_feat):
            norm = shifted[act, f, 0].max()
            s = shifted[:, f, :] - norm
            s = -s
            s = np.minimum(s, MAX_NEG_ASCR)
            scores[:, f, :] = np.where(act[:, None], s, scores[:, f, :])

    def _senone_eval(self, fi, mgau_active, senone_active=None):
        """ptm_mgau_senone_eval (ptm_mgau.c:326-403) vectorized over
        senones.  Evaluated senones always have active codebooks (their
        codebooks were activated from the same list), so the stale-topn
        branch at :353-364 is unreachable and not replicated."""
        am = self.am
        n_sen = am.n_sen
        table = am.lmath_8b.table
        cw = self.hist_cw[fi]
        sc = self.hist_score[fi]
        if senone_active is None:
            sens = np.arange(n_sen)
        else:
            sens = np.asarray(senone_active)
        cbs = am.sen2cb[sens]
        ascore = np.zeros(len(sens), np.int64)
        for f in range(self.n_feat):
            fden = None
            for j in range(self.max_topn):
                cw_j = cw[cbs, f, j]
                if am.mixw_cb is not None:
                    packed = am.mixw[f, cw_j, sens // 2].astype(np.int64)
                    # NB: reference reads (dcw & 1), see ptm_mgau.c:377 —
                    # replicated verbatim for parity.
                    dcw = np.where(packed & 1, packed >> 4, packed & 0x0F)
                    mixw_j = am.mixw_cb[dcw].astype(np.int64)
                else:
                    mixw_j = am.mixw[f, cw_j, sens].astype(np.int64)
                term = mixw_j + sc[cbs, f, j]
                if fden is None:
                    fden = term
                else:
                    d = np.abs(fden - term)
                    r = np.minimum(fden, term)
                    # fast_logmath_add's table has >= 256 entries and the
                    # difference is < 256 by design (tied_mgau_common.h:91-99)
                    fden = r - table[np.minimum(d, len(table) - 1)].astype(np.int64)
            ascore += fden
        out = np.zeros(n_sen, np.int16)
        out[sens] = ascore
        if am.backend != "semi":
            # ptm subtracts the best evaluated score from every senone
            # (ptm_mgau.c:397-400); the semi-continuous scorer does not
            # (s2_semi_mgau_frame_eval accumulates raw, :826-875)
            best = ascore.min() if len(ascore) else 0
            out = (out.astype(np.int64) - best).astype(np.int16)
        return out
