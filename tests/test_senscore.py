"""Senone scoring parity: exact numpy scorer vs C reference golden dumps."""

import numpy as np
import pytest

from tests.conftest import golden

from soundswallower_tpu.ops.senscore import ScorerNp, dist_checkpoints, int_dist


def test_senscore_exact_en(en_us):
    am, _ = en_us
    feat = golden("goforward-en", "feat.f32", np.float32, (-1, 3, 13))
    gold = golden("goforward-en", "senscr.i16", np.int16, (-1, am.n_sen))
    sc = ScorerNp(am)
    for t in range(len(feat)):
        out = sc.frame_eval(feat[t], t)
        assert (out == gold[t]).all(), f"frame {t} senone scores differ"


def test_senscore_exact_fr(fr_fr):
    am, _ = fr_fr
    feat = golden("goforward-fr", "feat.f32", np.float32, (-1, 3, 13))
    gold = golden("goforward-fr", "senscr.i16", np.int16, (-1, am.n_sen))
    sc = ScorerNp(am)
    for t in range(len(feat)):
        out = sc.frame_eval(feat[t], t)
        assert (out == gold[t]).all(), f"frame {t} senone scores differ"


def test_topn_state_matches_reference(en_us):
    am, _ = en_us
    feat = golden("goforward-en", "feat.f32", np.float32, (-1, 3, 13))
    topn = golden("goforward-en", "topn.i32", np.int32, (-1, 42, 3, 4, 2))
    sc = ScorerNp(am)
    for t in range(40):
        sc.frame_eval(feat[t], t)
        fi = t % 2
        assert (sc.hist_cw[fi] == topn[t, :, :, :, 0]).all()
        assert (sc.hist_score[fi] == topn[t, :, :, :, 1]).all()


def test_naive_topk_close_to_reference(en_us):
    """The TPU fast path uses exact top-4 by final distance; quantify its
    divergence from the C early-termination semantics (must stay tiny)."""
    am, _ = en_us
    feat = golden("goforward-en", "feat.f32", np.float32, (-1, 3, 13))
    topn = golden("goforward-en", "topn.i32", np.int32, (-1, 42, 3, 4, 2))
    mism = 0
    total = 0
    for t in range(0, len(feat), 4):
        _, final = dist_checkpoints(am, feat[t])
        di = int_dist(final)
        order = np.argsort(-di, axis=-1, kind="stable")[..., :4]
        same = (np.sort(order, -1) == np.sort(topn[t, :, :, :, 0], -1)).all(-1)
        mism += (~same).sum()
        total += same.size
    assert mism / total < 0.005
