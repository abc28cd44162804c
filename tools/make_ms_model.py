"""Synthesize a fully-continuous (ms backend) model variant from en-us.

The stock models ship PTM sendumps only, so to exercise the ms code path
(ms_mgau.c / ms_senone.c in the reference) we reconstruct float mixture
weights from the 8-bit sendump (w = base^-(q << SENSCR_SHIFT)) and write
them in the s3 mixw format together with an explicit senone->codebook map
(senmgau).  Setting ``senmgau`` in the config then forces the ms backend
in both the reference (acmod.c:101-107) and this package (am.py).

The golden outputs in tests/golden/ms-en were produced by running the
reference oracle (tools/oracle) against these exact synthesized files:

    python tools/make_ms_model.py <outdir>
    ./tools/oracle/oracle /root/reference/model/en-us \
        /root/reference/tests/data/goforward.raw tests/golden/ms-en \
        "go forward ten meters" \
        '{"senmgau": "<outdir>/senmgau", "mixw": "<outdir>/mixture_weights"}'
"""

import os
import sys

import numpy as np


def make_ms_model(modeldir: str, outdir: str) -> tuple[str, str]:
    from soundswallower_tpu import s3file as s3
    from soundswallower_tpu.logmath import SENSCR_SHIFT
    from soundswallower_tpu.mdef import read_mdef

    m = read_mdef(os.path.join(modeldir, "mdef"))
    mixw, _cb = s3.read_sendump(
        os.path.join(modeldir, "sendump"), 3, 128, m.n_sen
    )
    # mixw is [n_feat, n_density, n_sen] negated 8-bit logs (shift 10);
    # invert the quantization to synthesize float weights.
    w = np.power(1.0001, -(mixw.astype(np.float64) * (1 << SENSCR_SHIFT)))
    pdf = np.transpose(w, (2, 0, 1)).astype(np.float32)  # [sen, feat, cw]
    os.makedirs(outdir, exist_ok=True)
    mixw_path = os.path.join(outdir, "mixture_weights")
    senmgau_path = os.path.join(outdir, "senmgau")
    s3.write_mixw_float(mixw_path, pdf)
    s3.write_senmgau(senmgau_path, m.sen2cimap.astype(np.uint32))
    return mixw_path, senmgau_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "tests/golden/ms-model"
    make_ms_model("/root/reference/model/en-us", out)
    print("wrote", out)
