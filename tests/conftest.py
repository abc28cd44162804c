"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip
sharding tests work without TPU hardware; numerical parity tests use the
host (numpy) exact paths which are backend-independent.

Slow full-decode parity tests only run when SST_SLOW=1 (they re-run the
complete exact two-pass pipeline, several minutes each); the fast suite
covers every component against the same C-reference golden data.
"""

import os

# Force CPU: the environment pins JAX_PLATFORMS=axon (TPU tunnel), and
# only one process may hold the tunnel — tests must not contend with a
# concurrently running benchmark.  setdefault() is not enough.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The interpreter preload (sitecustomize) registers the axon PJRT
# plugin and can programmatically set jax_platforms to "axon,cpu",
# which OVERRIDES the env vars above — pin the config explicitly or
# tests silently grab the single-holder TPU tunnel and hang.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
MODELDIR = "/root/reference/model"
DATADIR = "/root/reference/tests/data"

slow = pytest.mark.skipif(
    not os.environ.get("SST_SLOW"), reason="set SST_SLOW=1 for slow parity tests"
)


@pytest.fixture(scope="session")
def en_us():
    from soundswallower_tpu.config import Config
    from soundswallower_tpu.am import AcousticModel

    cfg = Config(hmm=os.path.join(MODELDIR, "en-us"))
    cfg.expand()
    return AcousticModel.load(cfg), cfg


@pytest.fixture(scope="session")
def fr_fr():
    from soundswallower_tpu.config import Config
    from soundswallower_tpu.am import AcousticModel

    cfg = Config(hmm=os.path.join(MODELDIR, "fr-fr"))
    cfg.expand()
    return AcousticModel.load(cfg), cfg


@pytest.fixture(scope="session")
def ms_en(tmp_path_factory):
    """en-us forced into the fully-continuous (ms) backend via a
    synthesized senmgau map + float mixture weights (see
    tools/make_ms_model.py; goldens in tests/golden/ms-en were produced
    by the C oracle against the same synthesized files)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_ms_model import make_ms_model

    from soundswallower_tpu.am import AcousticModel
    from soundswallower_tpu.config import Config

    outdir = str(tmp_path_factory.mktemp("ms-model"))
    mixw, senmgau = make_ms_model(os.path.join(MODELDIR, "en-us"), outdir)
    cfg = Config(hmm=os.path.join(MODELDIR, "en-us"),
                 senmgau=senmgau, mixw=mixw)
    cfg.expand()
    return AcousticModel.load(cfg), cfg


@pytest.fixture(scope="session")
def sendump_4b(tmp_path_factory):
    """Deterministic 4-bit clustered sendump synthesized from the stock
    en-us 8-bit one (tools/make_4b_sendump.py; goldens in
    tests/golden/ptm4b-en and semi4b-en were produced by the C oracle
    against this exact file)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_4b_sendump import make_4b_sendump

    out = str(tmp_path_factory.mktemp("sendump4b") / "sendump")
    return make_4b_sendump(os.path.join(MODELDIR, "en-us"), out)


@pytest.fixture(scope="session")
def ptm_4b_en(sendump_4b):
    """en-us PTM backend with the synthesized 4-bit clustered sendump
    (exercises ptm_mgau.c:377's packed-byte-parity nibble decode)."""
    from soundswallower_tpu.am import AcousticModel
    from soundswallower_tpu.config import Config

    cfg = Config(hmm=os.path.join(MODELDIR, "en-us"), sendump=sendump_4b)
    cfg.expand()
    return AcousticModel.load(cfg), cfg


@pytest.fixture(scope="session")
def semi_4b_en(sendump_4b, tmp_path_factory):
    """Semi-continuous backend with the 4-bit clustered sendump
    (exercises s2_semi_mgau.c:475-499's senone-index-parity decode and
    the uint8 w_den wraparound, :452-461)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_semi_model import make_semi_model

    from soundswallower_tpu.am import AcousticModel
    from soundswallower_tpu.config import Config

    outdir = str(tmp_path_factory.mktemp("semi4b-model"))
    mean, var = make_semi_model(os.path.join(MODELDIR, "en-us"), outdir)
    cfg = Config(hmm=os.path.join(MODELDIR, "en-us"), mean=mean, var=var,
                 sendump=sendump_4b)
    cfg.expand()
    return AcousticModel.load(cfg), cfg


@pytest.fixture(scope="session")
def semi_en(tmp_path_factory):
    """en-us forced into the semi-continuous backend via a synthesized
    single-codebook means/variances pair (see tools/make_semi_model.py;
    goldens in tests/golden/semi-en were produced by the C oracle against
    the same synthesized files — acmod's fallback chain selects
    s2_semi_mgau when n_mgau == 1)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_semi_model import make_semi_model

    from soundswallower_tpu.am import AcousticModel
    from soundswallower_tpu.config import Config

    outdir = str(tmp_path_factory.mktemp("semi-model"))
    mean, var = make_semi_model(os.path.join(MODELDIR, "en-us"), outdir)
    cfg = Config(hmm=os.path.join(MODELDIR, "en-us"), mean=mean, var=var)
    cfg.expand()
    return AcousticModel.load(cfg), cfg


def golden(name: str, fname: str, dtype, shape=None):
    arr = np.fromfile(os.path.join(GOLDEN, name, fname), dtype=dtype)
    if shape is not None:
        arr = arr.reshape(shape)
    return arr
