"""Front-end parity tests: bit-exact MFCC and features vs the C reference."""

import numpy as np
import pytest

from tests.conftest import DATADIR, GOLDEN, golden

from soundswallower_tpu.fe.frontend import Frontend
from soundswallower_tpu.fe.feat import feats_full_utt_np, cmn_batch_np


def _fe_8k_band(samprate=16000):
    return Frontend(sampling_rate=samprate, num_filters=20,
                    lower_filt_freq=130, upper_filt_freq=3700,
                    transform="dct", lifter_val=22, remove_noise=True)


CASES = [
    ("goforward-en", f"{DATADIR}/goforward.raw", 16000),
    ("goforward-fr", f"{DATADIR}/goforward_fr.raw", 16000),
    ("austen-en", f"{GOLDEN}/austen.raw", 8000),
]


@pytest.mark.parametrize("name,raw,rate", CASES)
def test_mfcc_bitexact(name, raw, rate):
    fe = _fe_8k_band(rate)
    audio = np.fromfile(raw, dtype=np.int16)
    cep = fe.process_int16(audio)
    gold = golden(name, "mfcc.f32", np.float32, (-1, 13))
    assert cep.shape == gold.shape
    assert (cep == gold).all(), "MFCC must be bit-exact vs C reference"


@pytest.mark.parametrize("name,raw,rate", CASES)
def test_feat_bitexact(name, raw, rate):
    cep = golden(name, "mfcc.f32", np.float32, (-1, 13))
    feat = feats_full_utt_np(cep, cmn_mode="current")
    gold = golden(name, "feat.f32", np.float32, (-1, 3, 13))
    assert (feat == gold).all()


def test_cmn_mean_bitexact():
    cep = golden("goforward-en", "mfcc.f32", np.float32, (-1, 13))
    _, mean = cmn_batch_np(cep)
    gold = golden("goforward-en", "cmn_mean.f32", np.float32)
    assert (mean == gold).all()


def test_frame_counts():
    fe = _fe_8k_band()
    # full frames + zero-padded tail (fe_interface.c:379-391 + fe_end)
    assert fe.n_frames(44580) == 278
    # N=410 = one full frame plus a 250-sample tail frame (fe_end)
    assert fe.n_frames(410) == 2
    assert fe.n_frames(409) == 1
    assert fe.n_frames(0) == 0
    assert fe.n_frames(160) == 1
    assert fe.n_frames(410 + 160) == 3
