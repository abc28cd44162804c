"""Synthesize a 5-state-topology model variant from en-us.

Both shipped models are 3-state; to exercise the 5-state HMM kernels
(hmm_vit_eval_5st_lr, hmm.c:166-305) against the C reference we rewrite
the en-us model definition as a TEXT mdef (the format mdef.c:488-665
parses) with n_emit_state=5.  mdef.c:631 requires n_tied_ci_state ==
n_ci * n_emit_state, so the senone INVENTORY is expanded: each CI
phone's 5 states get 5 fresh CI senone ids mapping back to its 3 tied
senones as [s0, s0, s1, s1, s2]; CD senones keep their identities
(shifted past the new CI block) and CD phones' 5 states reuse theirs
the same way.  A duplicated-column 8-bit sendump carries the mixture
weights for the expanded inventory (Gaussians untouched — scores per
OLD senone are identical), plus a synthesized transition-matrix file
[n_tmat, 5, 6] with a deterministic left-to-right self/next/skip
topology (tmat.c validates upper-triangular <= +2 skip).

Golden outputs are produced by the reference oracle against these exact
files:

    python tools/make_5st_model.py <outdir>
    /tmp/refbuild/oracle /root/reference/model/en-us \
        /root/reference/tests/data/goforward.raw tests/golden/5st-en \
        "go forward ten meters" \
        '{"mdef": "<outdir>/mdef.txt", "tmat": "<outdir>/tmat", \
          "sendump": "<outdir>/sendump"}'
"""

import os
import sys

import numpy as np

WPOS_CHR = {0: "i", 1: "b", 2: "e", 3: "s", 4: "u"}


def make_5st_model(modeldir: str, outdir: str) -> tuple[str, str, str]:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from soundswallower_tpu import s3file as s3
    from soundswallower_tpu.mdef import read_mdef

    m = read_mdef(os.path.join(modeldir, "mdef"))
    assert m.n_emit_state == 3, "source model must be 3-state"
    os.makedirs(outdir, exist_ok=True)
    mdef_path = os.path.join(outdir, "mdef.txt")
    tmat_path = os.path.join(outdir, "tmat")
    sendump_path = os.path.join(outdir, "sendump")

    n_ci = m.n_ciphone
    n_tri = m.n_phone - n_ci
    n_ci_sen = n_ci * 5
    shift = n_ci_sen - m.n_ci_sen     # CD senone id shift
    n_sen = m.n_sen + shift
    # new senone id -> old senone id (for the sendump column remap)
    sen_map = np.zeros(n_sen, np.int64)
    for c in range(n_ci):
        s0, s1, s2 = (int(x) for x in m.sseq[m.phone_ssid[c]])
        sen_map[5 * c: 5 * c + 5] = [s0, s0, s1, s1, s2]
    sen_map[n_ci_sen:] = np.arange(m.n_ci_sen, m.n_sen)

    with open(mdef_path, "w") as fh:
        fh.write("0.3\n")
        fh.write(f"{n_ci} n_base\n")
        fh.write(f"{n_tri} n_tri\n")
        fh.write(f"{m.n_phone * 6} n_state_map\n")
        fh.write(f"{n_sen} n_tied_state\n")
        fh.write(f"{n_ci_sen} n_tied_ci_state\n")
        fh.write(f"{m.n_tmat} n_tied_tmat\n")
        for p in range(m.n_phone):
            tmat = int(m.phone_tmat[p])
            if p < n_ci:
                states = " ".join(str(5 * p + k) for k in range(5))
                attrib = "filler" if m.is_filler(p) else "n/a"
                fh.write(f"{m.ciname[p]} - - - {attrib} {tmat} {states} N\n")
            else:
                s0, s1, s2 = (int(x) + shift
                              for x in m.sseq[m.phone_ssid[p]])
                states = f"{s0} {s0} {s1} {s1} {s2}"
                wpos, ci, lc, rc = (int(x) for x in m.phone_info[p])
                attrib = "filler" if m.is_filler(ci) else "n/a"
                fh.write(f"{m.ciname[ci]} {m.ciname[lc]} {m.ciname[rc]} "
                         f"{WPOS_CHR[wpos]} {attrib} {tmat} {states} N\n")

    # duplicated-column 8-bit sendump for the expanded inventory
    mixw, mixw_cb = s3.read_sendump(
        os.path.join(modeldir, "sendump"), 3, 128, m.n_sen)
    assert mixw_cb is None, "source sendump must be 8-bit"
    s3.write_sendump_8b(sendump_path, mixw[:, :, sen_map])

    # deterministic 5-state left-to-right topology with skips
    tp = np.zeros((m.n_tmat, 5, 6), np.float32)
    for t in range(m.n_tmat):
        for i in range(4):
            tp[t, i, i] = 0.55
            tp[t, i, i + 1] = 0.35
            tp[t, i, i + 2] = 0.10
        tp[t, 4, 4] = 0.6
        tp[t, 4, 5] = 0.4
    s3.write_tmat_params(tmat_path, tp)
    return mdef_path, tmat_path, sendump_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/5st-model"
    make_5st_model("/root/reference/model/en-us", out)
    print("wrote", out)
