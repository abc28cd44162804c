"""Native (C++) host front-end parity vs the verified JAX front end.

The aligner's default batch path computes MFCCs on the host via
native/sst_fe.cpp (fe/native_fe.py) and uploads cepstra instead of raw
audio.  That path silently replaces the golden-tested JAX FE, so it must
be held to the same standard: bit-for-bit equality across transforms,
noise removal, liftering, and partial-tail frame handling (advisor
finding r1: this path was previously untested).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from soundswallower_tpu.fe.frontend import Frontend
from soundswallower_tpu.fe.native_fe import NativeFrontend


def _audio(n, seed=0):
    r = np.random.RandomState(seed)
    return (r.randn(n) * 3000).clip(-32768, 32767).astype(np.int16)


CONFIGS = [
    dict(transform="dct", lifter_val=22, remove_noise=True,
         num_filters=20, lower_filt_freq=130, upper_filt_freq=3700),
    dict(transform="dct", lifter_val=0, remove_noise=False,
         num_filters=20, lower_filt_freq=130, upper_filt_freq=3700),
    dict(transform="legacy", lifter_val=0, remove_noise=False),
    dict(transform="legacy", lifter_val=22, remove_noise=True),
    dict(transform="htk", lifter_val=22, remove_noise=False),
    dict(transform="htk", lifter_val=0, remove_noise=True),
]

# lengths: ~1s, one full frame + partial tail, single partial frame,
# and an exact multiple of the shift
LENGTHS = [16000, 410 + 160, 409, 4100]


@pytest.mark.parametrize("cfg", CONFIGS,
                         ids=lambda c: f"{c['transform']}-l{c['lifter_val']}"
                                       f"-n{int(c['remove_noise'])}")
def test_native_fe_bitexact_vs_jax(cfg):
    fe = Frontend(sampling_rate=16000, **cfg)
    nfe = NativeFrontend.load(fe)
    if nfe is None:
        pytest.skip("native FE unavailable (no toolchain?)")
    ns = np.array(LENGTHS, np.int64)
    Ts = [fe.n_frames(int(n)) for n in ns]
    Tmax = max(Ts) + 3  # a little headroom: padded rows must be zero
    buf = np.zeros((len(ns), int(ns.max())), np.int16)
    for i, n in enumerate(ns):
        buf[i, :n] = _audio(int(n), seed=i)
    got = nfe.process_batch(buf, ns, Tmax)
    for i, n in enumerate(ns):
        T = Ts[i]
        want = np.asarray(
            fe.mfcc(jnp.asarray(buf[i, :n].astype(np.float32)), int(n), Tmax))
        assert (got[i, :T] == want[:T]).all(), (
            f"utt {i} (n={n}): native FE != JAX FE")
        assert (got[i, T:] == 0).all(), "padded rows must be zeroed"


def test_native_fe_refuses_remove_dc():
    """remove_dc parity is not guaranteed (f64 reduction order), so
    load() must fall back to the device FE (advisor finding r1)."""
    fe = Frontend(sampling_rate=16000, remove_dc=True)
    assert NativeFrontend.load(fe) is None


def test_native_fe_multithreaded_matches():
    fe = Frontend(sampling_rate=16000, transform="dct", lifter_val=22,
                  remove_noise=True, num_filters=20,
                  lower_filt_freq=130, upper_filt_freq=3700)
    nfe = NativeFrontend.load(fe)
    if nfe is None:
        pytest.skip("native FE unavailable")
    ns = np.full(8, 16000, np.int64)
    buf = np.stack([_audio(16000, seed=i) for i in range(8)])
    Tmax = fe.n_frames(16000)
    a = nfe.process_batch(buf, ns, Tmax, nthreads=1)
    b = nfe.process_batch(buf, ns, Tmax, nthreads=4)
    assert (a == b).all()
