"""Fused Pallas distance+top-N kernel: bit-parity vs the staged path.

Runs in interpreter mode on the CPU backend (the compiled kernel is
exercised on real TPU by bench.py and the graft entry compile check).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import golden

from soundswallower_tpu.ops.senscore_jax import (
    ScorerTables, _dist_stage, _topn_stage, _sen_stage, ungroup)
from soundswallower_tpu.ops.senscore_pallas import dist_topn_fused


@pytest.fixture(scope="module")
def tables(en_us):
    am, _ = en_us
    return ScorerTables.from_am(am)


def test_pallas_fused_bitexact_random(tables):
    t = tables
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(200, 3, 13).astype(np.float32) * 2)
    di = _dist_stage(t, feats, "fold")
    sc_ref, cw_ref = _topn_stage(t, di)
    sc, cw = dist_topn_fused(feats, t.means, t.var_t, t.det,
                             t.max_topn, True)
    assert (np.asarray(sc) == np.asarray(sc_ref)).all()
    assert (np.asarray(cw) == np.asarray(cw_ref)).all()


def test_pallas_fused_bitexact_real_feats(tables):
    """Real goforward features: the full scorer output through the
    fused kernel must equal the staged output (and hence the C-golden
    agreement the staged path is tested for)."""
    t = tables
    feats = jnp.asarray(golden("goforward-en", "feat.f32",
                               np.float32, (-1, 3, 13)))
    di = _dist_stage(t, feats, "fold")
    sc_ref, cw_ref = _topn_stage(t, di)
    out_ref = _sen_stage(t, sc_ref, cw_ref)
    sc, cw = dist_topn_fused(feats, t.means, t.var_t, t.det,
                             t.max_topn, True)
    out = _sen_stage(t, sc, cw)
    assert (np.asarray(out) == np.asarray(out_ref)).all()


def test_pallas_padding_tail(tables):
    """Frame counts that don't divide the 128-frame tile are padded and
    sliced; tail rows must still be exact."""
    t = tables
    rng = np.random.RandomState(1)
    for T in (1, 127, 129):
        feats = jnp.asarray(rng.randn(T, 3, 13).astype(np.float32))
        di = _dist_stage(t, feats, "fold")
        sc_ref, cw_ref = _topn_stage(t, di)
        sc, cw = dist_topn_fused(feats, t.means, t.var_t, t.det,
                                 t.max_topn, True)
        assert (np.asarray(sc) == np.asarray(sc_ref)).all(), T
        assert (np.asarray(cw) == np.asarray(cw_ref)).all(), T
