"""Synthesize a semi-continuous model variant from en-us.

The stock models are PTM (one codebook per CI phone), so to exercise the
semi-continuous code path (s2_semi_mgau.c in the reference) we collapse
the model to a single shared codebook: codebook 0's means/variances are
written as n_mgau=1 gauden files and the stock 4-bit sendump is reused
as-is (mixture weights are per-senone over 128 codewords regardless of
codebook layout).  The reference's backend fallback chain
(acmod.c:101-119: ptm fails on n_mgau != n_ciphone, s2_semi requires
n_mgau == 1) then selects the semi scorer in both implementations.

Golden outputs in tests/golden/semi-en were produced by the reference
oracle against these exact synthesized files:

    python tools/make_semi_model.py <outdir>
    /tmp/refbuild/oracle /root/reference/model/en-us \
        /root/reference/tests/data/goforward.raw tests/golden/semi-en \
        "go forward ten meters" \
        '{"mean": "<outdir>/means", "var": "<outdir>/variances"}'
"""

import os
import sys

import numpy as np


def make_semi_model(modeldir: str, outdir: str) -> tuple[str, str]:
    from soundswallower_tpu import s3file as s3

    means, n_mgau, n_feat, n_density, veclen = s3.read_gauden_params(
        os.path.join(modeldir, "means"))
    var, vm, vf, vd, vveclen = s3.read_gauden_params(
        os.path.join(modeldir, "variances"))
    assert (vm, vf, vd) == (n_mgau, n_feat, n_density)
    os.makedirs(outdir, exist_ok=True)
    mean_path = os.path.join(outdir, "means")
    var_path = os.path.join(outdir, "variances")
    s3.write_gauden_params(mean_path, means[:1], veclen)
    s3.write_gauden_params(var_path, var[:1], veclen)
    return mean_path, var_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/semi-model"
    make_semi_model("/root/reference/model/en-us", out)
    print("wrote", out)
