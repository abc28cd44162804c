"""CLI-level tests, ported from the reference's py/test/test_cli.py:
whole-CLI runs over goforward en/fr through --align/--align-text/
--grammar/--fsg, -o output files, JSON schema checks incl. <sil>
filtering.  The default CLI path is the TPU fast path (one batched
dispatch over the input files); --exact parity is covered by the
SST_SLOW decoder suite."""

import json
import os
import re

import pytest

from soundswallower_tpu import cli

DATADIR = "/root/reference/tests/data"
MODELDIR = "/root/reference/model"


def baseword(w):
    return re.sub(r"\(\d+\)$", "", w["t"])


def check_output(jpath, text="go forward ten meters", n_lines=None):
    lines = 0
    with open(jpath) as infh:
        for line in infh:
            result = json.loads(line)
            assert result
            assert result["t"] == text
            words = [w for w in result["w"] if w["t"] != "<sil>"]
            for word, ref in zip(words, text.split()):
                assert baseword(word) == ref
            for w in result["w"]:
                assert set(w) >= {"b", "d", "p", "t"}
                assert 0.0 <= w["p"] <= 1.0
            lines += 1
    if n_lines is not None:
        assert lines == n_lines


def test_cli_align_text(tmp_path):
    jpath = str(tmp_path / "output.json")
    cli.main((
        "--output", jpath,
        "--align-text", "go forward ten meters",
        "--phone-align",
        "--model", os.path.join(MODELDIR, "en-us"),
        os.path.join(DATADIR, "goforward.wav"),
        os.path.join(DATADIR, "goforward.raw"),
    ))
    check_output(jpath, n_lines=2)
    # phone nesting present and contiguous within each word
    with open(jpath) as infh:
        result = json.loads(infh.readline())
    for w in result["w"]:
        assert "w" in w, "phone level missing"
        pos = w["b"]
        for p in w["w"]:
            assert abs(p["b"] - pos) < 0.0011
            pos = round(p["b"] + p["d"], 3)
    # known boundaries (verify-skill goldens)
    words = {baseword(w): w for w in result["w"] if w["t"] != "<sil>"}
    assert abs(words["go"]["b"] - 0.46) < 0.011
    assert abs(words["forward"]["b"] - 0.64) < 0.011
    assert abs(words["ten"]["b"] - 1.17) < 0.011
    assert abs(words["meters"]["b"] - 1.53) < 0.011


def test_cli_align_file(tmp_path):
    tf = tmp_path / "text.txt"
    tf.write_text("go forward ten meters\n")
    jpath = str(tmp_path / "output.json")
    cli.main((
        "--output", jpath,
        "--align", str(tf),
        "--model", os.path.join(MODELDIR, "en-us"),
        os.path.join(DATADIR, "goforward.raw"),
    ))
    check_output(jpath, n_lines=1)


def test_cli_grammar(tmp_path):
    jpath = str(tmp_path / "output.json")
    cli.main((
        "--grammar", os.path.join(DATADIR, "goforward.gram"),
        "-o", jpath,
        "--model", os.path.join(MODELDIR, "en-us"),
        os.path.join(DATADIR, "goforward.wav"),
        os.path.join(DATADIR, "goforward.raw"),
    ))
    check_output(jpath, n_lines=2)


def test_cli_fsg(tmp_path):
    jpath = str(tmp_path / "output.json")
    cli.main((
        "--fsg", os.path.join(DATADIR, "goforward.fsg"),
        "-o", jpath,
        "--model", os.path.join(MODELDIR, "en-us"),
        os.path.join(DATADIR, "goforward.raw"),
    ))
    check_output(jpath, n_lines=1)


def test_cli_other_model(tmp_path):
    jpath = str(tmp_path / "output.json")
    cli.main((
        "--grammar", os.path.join(DATADIR, "goforward_fr.gram"),
        "--model", os.path.join(MODELDIR, "fr-fr"),
        "--output", jpath,
        os.path.join(DATADIR, "goforward_fr.wav"),
        os.path.join(DATADIR, "goforward_fr.raw"),
    ))
    check_output(jpath, "avance de dix mètres", n_lines=2)


def test_cli_write_config(tmp_path):
    jpath = str(tmp_path / "config.json")
    cli.main(["--write-config", jpath])
    with open(jpath) as infh:
        assert json.load(infh)


def test_state_align_fast_path_matches_exact():
    """--state-align WITHOUT --exact (VERDICT r4 item 6): the fast
    path emits 3-level word/phone/STATE JSON straight from its Viterbi
    path.  Against the byte-parity golden of the exact two-pass
    decoder (tests/golden/goforward-en/result.json), every boundary,
    duration, label, and senone id must be identical; only the "p"
    confidence fields differ (the exact pass-2 normalizes over its
    beam-dependent active set, the fast path over the full dense
    scores — reproducing the former IS the --exact path)."""
    import contextlib
    import io
    import json

    from soundswallower_tpu.cli import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["--align-text", "go forward ten meters", "--state-align",
              "--model", "/root/reference/model/en-us",
              f"{DATADIR}/goforward.wav"])
    fast = json.loads(buf.getvalue())
    gold = json.loads(open(os.path.join(os.path.dirname(__file__), "golden", "goforward-en", "result.json")).read())

    def strip_p(d):
        return {k: ([strip_p(x) for x in v] if k == "w" else v)
                for k, v in d.items() if k != "p"}

    assert strip_p(fast) == strip_p(gold)
