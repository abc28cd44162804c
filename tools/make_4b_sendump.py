"""Synthesize a 4-bit clustered sendump from a stock 8-bit one.

The shipped en-us/fr-fr sendumps are 8-bit (cluster_count 0), so the
reference's 4-bit decode paths — which differ between backends:
ptm_mgau.c:377 selects the nibble by packed-byte parity,
s2_semi_mgau.c:475-499 by senone-index parity — are otherwise untested.
This tool quantizes the 8-bit mixture weights to a 16-entry cluster
codebook (deterministic Lloyd iterations seeded from value percentiles)
and writes a sendump the reference parses in clustered mode, for oracle
golden generation and parity tests.

Usage: python tools/make_4b_sendump.py <modeldir> <out_sendump>
"""

import os
import sys

import numpy as np


def quantize_16(mixw: np.ndarray, iters: int = 25) -> tuple[np.ndarray, np.ndarray]:
    """uint8 mixw values -> (cluster indices, 16-entry uint8 codebook).

    Deterministic 1-D Lloyd on the value histogram: centers init at the
    evenly spaced percentiles of the distinct values, then standard
    assign/update rounds with ties broken toward the lower center.
    """
    vals = mixw.reshape(-1).astype(np.int64)
    hist = np.bincount(vals, minlength=256).astype(np.int64)
    support = np.nonzero(hist)[0]
    if len(support) <= 16:
        centers = np.zeros(16, np.int64)
        centers[: len(support)] = support
        centers[len(support):] = support[-1] if len(support) else 0
    else:
        qs = np.linspace(0, len(support) - 1, 16).round().astype(np.int64)
        centers = support[qs]
        x = np.arange(256, dtype=np.int64)
        w = hist
        for _ in range(iters):
            d = np.abs(x[:, None] - centers[None, :])
            assign = np.argmin(d, axis=1)  # ties -> lowest center index
            new = centers.copy()
            for k in range(16):
                m = (assign == k) & (w > 0)
                if m.any():
                    new[k] = np.round(np.sum(x[m] * w[m]) / np.sum(w[m]))
            new = np.sort(new)
            if (new == centers).all():
                break
            centers = new
    d = np.abs(np.arange(256, dtype=np.int64)[:, None] - centers[None, :])
    assign = np.argmin(d, axis=1).astype(np.uint8)
    cw = assign[mixw]
    return cw, centers.astype(np.uint8)


def make_4b_sendump(modeldir: str, out_path: str) -> str:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from soundswallower_tpu import s3file as s3
    from soundswallower_tpu.mdef import read_mdef

    mdef = read_mdef(os.path.join(modeldir, "mdef"))
    # stock models: 3 streams x 128 densities
    mixw, mixw_cb = s3.read_sendump(
        os.path.join(modeldir, "sendump"), 3, 128, mdef.n_sen)
    if mixw_cb is not None:
        raise ValueError("source sendump is already clustered")
    cw, cb = quantize_16(mixw)
    s3.write_sendump_4b(out_path, cw, cb, mdef.n_sen)
    return out_path


if __name__ == "__main__":
    modeldir = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/model/en-us"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sendump.4b"
    make_4b_sendump(modeldir, out)
    print("wrote", out)
