"""Feature-type registry parity: every reference feat type vs C goldens.

Goldens in tests/golden/featvar were produced by tools/oracle/feat_oracle.c
(feat_init + feat_s2mfc2feat_live on the first 192 goforward-en MFCC
frames); each file is [T][stream0..streamN concatenated] float32.
"""

import os

import numpy as np
import pytest

from tests.conftest import GOLDEN

from soundswallower_tpu.fe.feat import FeatPipeline, parse_subvecs

FV = os.path.join(GOLDEN, "featvar")


def _mfcc():
    return np.fromfile(os.path.join(FV, "mfcc192.f32"),
                       np.float32).reshape(-1, 13)


def _gold(name, dims):
    return np.fromfile(os.path.join(FV, name), np.float32).reshape(-1, dims)


def _flatten(fp: FeatPipeline, out: np.ndarray) -> np.ndarray:
    """[T, n_feat, maxlen] padded -> [T, sum(lens)] like the C dump."""
    lens = fp.sv_len if fp.subvecs is not None else fp.stream_len
    return np.concatenate([out[:, i, :n] for i, n in enumerate(lens)], axis=1)


CASES = [
    ("s2_4x", "s2_4x.f32", 51),
    ("s3_1x39", "s3_1x39.f32", 39),
    ("1s_12c_12d_3p_12dd", "s3_1x39.f32", 39),   # alias
    ("1s_c_d_ld_dd", "1s_c_d_ld_dd.f32", 52),
    ("cep_dcep", "cep_dcep.f32", 26),
    ("cep", "cep.f32", 13),
    ("1s_3c", "1s_3c.f32", 91),
    ("1s_4c", "1s_4c.f32", 117),
    ("6,7:2", "generic_6_7_w2.f32", 65),
]


@pytest.mark.parametrize("ftype,goldfile,dims", CASES,
                         ids=[c[0] for c in CASES])
def test_feat_variant_bitexact(ftype, goldfile, dims):
    fp = FeatPipeline(ftype, cepsize=13)
    assert fp.out_dim == dims
    out = fp.compute_full(_mfcc(), cmn_mode="none")
    got = _flatten(fp, out)
    gold = _gold(goldfile, dims)
    assert got.shape == gold.shape
    assert (got == gold).all(), f"{ftype} features differ from C"


def test_feat_lda_bitexact():
    from soundswallower_tpu.s3file import read_lda

    lda = read_lda(os.path.join(FV, "lda32x39"))
    fp = FeatPipeline("1s_c_d_dd", cepsize=13, lda=lda, ldadim=29)
    assert fp.out_dim == 29
    out = fp.compute_full(_mfcc(), cmn_mode="current")
    got = out[:, 0, :29]
    gold = _gold("cdd_lda.f32", 29)
    assert (got == gold).all(), "LDA-projected features differ from C"


def test_feat_svspec_bitexact():
    fp = FeatPipeline("1s_c_d_dd", cepsize=13, svspec="1-5,10/0,6-9,11")
    assert fp.sv_len == [6, 6]
    out = fp.compute_full(_mfcc(), cmn_mode="current")
    got = _flatten(fp, out)
    gold = _gold("cdd_sv_exotic.f32", 12)
    assert (got == gold).all(), "subvector projection differs from C"


def test_feat_svspec_model_default():
    """The shipped models' svspec 0-12/13-25/26-38 must reproduce the
    existing [T,3,13] fast path."""
    from soundswallower_tpu.fe.feat import feats_full_utt_np

    fp = FeatPipeline("1s_c_d_dd", cepsize=13, svspec="0-12/13-25/26-38")
    out = fp.compute_full(_mfcc(), cmn_mode="current")
    want = feats_full_utt_np(_mfcc(), cmn_mode="current")
    assert (out == want).all()


def test_parse_subvecs_errors():
    with pytest.raises(ValueError):
        parse_subvecs("0-2,1")          # duplicate dim
    with pytest.raises(ValueError):
        parse_subvecs("5-2")            # bad range
    assert parse_subvecs("0-2/4,6-7") == [[0, 1, 2], [4, 6, 7]]


def test_registry_errors():
    with pytest.raises(ValueError):
        FeatPipeline("s2_4x", cepsize=12)       # requires 13
    with pytest.raises(ValueError):
        FeatPipeline("4,4", cepsize=13)         # widths != cepsize
    with pytest.raises(ValueError):
        FeatPipeline("s2_4x", cepsize=13, svspec="0-3")   # multi-stream
