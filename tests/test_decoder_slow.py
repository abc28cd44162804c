"""Full-decode byte-parity tests (SST_SLOW=1): these run the complete
exact two-pass pipeline (minutes per utterance on CPU)."""

import numpy as np
import pytest

from tests.conftest import DATADIR, GOLDEN, slow


@slow
def test_goforward_json_byte_parity():
    from soundswallower_tpu.decoder import Decoder

    d = Decoder(hmm="/root/reference/model/en-us")
    d.set_align_text("go forward ten meters")
    raw = np.fromfile(f"{DATADIR}/goforward.raw", dtype=np.int16)
    d.start_utt()
    d.process_raw(raw)
    d.end_utt()
    assert d.hyp.text == "go forward ten meters"
    segs = [(s["word"], s["sf"], s["ef"], s["ascr"], s["lscr"])
            for s in d.seg_iter()]
    gold = []
    for line in open(f"{GOLDEN}/goforward-en/segs.txt"):
        w, sf, ef, ascr, lscr = line.split()
        gold.append((w, int(sf), int(ef), int(ascr), int(lscr)))
    assert segs == gold
    js = d.result_json(0.0, 2)
    assert js == open(f"{GOLDEN}/goforward-en/result.json").read()


@slow
def test_austen_json_byte_parity():
    from soundswallower_tpu.decoder import Decoder

    d = Decoder(hmm="/root/reference/model/en-us", samprate=8000)
    d.set_align_text("he was not an ill disposed young man")
    raw = np.fromfile(f"{GOLDEN}/austen.raw", dtype=np.int16)
    d.start_utt()
    d.process_raw(raw)
    d.end_utt()
    js = d.result_json(0.0, 2)
    assert js == open(f"{GOLDEN}/austen-en/result.json").read()


@slow
def test_fr_json_byte_parity():
    from soundswallower_tpu.decoder import Decoder

    d = Decoder(hmm="/root/reference/model/fr-fr")
    d.set_align_text("avance de dix mètres")
    raw = np.fromfile(f"{DATADIR}/goforward_fr.raw", dtype=np.int16)
    d.start_utt()
    d.process_raw(raw)
    d.end_utt()
    assert d.hyp.text == "avance de dix mètres"
    js = d.result_json(0.0, 2)
    assert js == open(f"{GOLDEN}/goforward-fr/result.json").read()


@slow
def test_jsgf_grammar_decode():
    """JSGF decode (BASELINE config 2): goforward.gram -> correct hyp."""
    from soundswallower_tpu.decoder import Decoder

    d = Decoder(hmm="/root/reference/model/en-us",
                jsgf=f"{DATADIR}/goforward.gram")
    raw = np.fromfile(f"{DATADIR}/goforward.raw", dtype=np.int16)
    d.start_utt()
    d.process_raw(raw)
    d.end_utt()
    assert d.hyp.text == "go forward ten meters"


@slow
def test_live_chunked_decode_byte_parity():
    """CHUNKED decode (full_utt=False, 1600-sample chunks) vs the C
    reference's own live path (tools/oracle/live_oracle.c goldens):
    fe overflow stitching, live CMN, begin/end replication — segs incl.
    ascr/lscr and the two-pass JSON must match byte for byte."""
    from soundswallower_tpu.decoder import Decoder

    d = Decoder(hmm="/root/reference/model/en-us")
    d.set_align_text("go forward ten meters")
    raw = np.fromfile(f"{DATADIR}/goforward.raw", dtype=np.int16)
    d.start_utt()
    for i0 in range(0, len(raw), 1600):
        d.process_raw(raw[i0:i0 + 1600], full_utt=False)
    d.end_utt()
    assert d.hyp.text == "go forward ten meters"
    segs = [(s["word"], s["sf"], s["ef"], s["ascr"], s["lscr"])
            for s in d.seg_iter()]
    gold = []
    for line in open(f"{GOLDEN}/live-goforward/segs.txt"):
        w, sf, ef, ascr, lscr = line.split()
        gold.append((w, int(sf), int(ef), int(ascr), int(lscr)))
    assert segs == gold
    js = d.result_json(0.0, 2)
    assert js == open(f"{GOLDEN}/live-goforward/result.json").read()


@slow
def test_semi_backend_json_byte_parity(semi_en):
    """Full two-pass decode in the semi-continuous backend, vs the C
    oracle run with the same synthesized single-codebook means/variances
    (s2_semi_mgau.c path end to end)."""
    from soundswallower_tpu.decoder import Decoder

    _, cfg = semi_en
    d = Decoder(hmm="/root/reference/model/en-us",
                mean=cfg["mean"], var=cfg["var"])
    assert d.am.backend == "semi"
    d.set_align_text("go forward ten meters")
    raw = np.fromfile(f"{DATADIR}/goforward.raw", dtype=np.int16)
    d.start_utt()
    d.process_raw(raw)
    d.end_utt()
    assert d.hyp.text == "go forward ten meters"
    d.alignment()
    js = d.result_json(0.0, 2)
    assert js == open(f"{GOLDEN}/semi-en/result.json").read()


@slow
def test_ms_backend_json_byte_parity(ms_en):
    """Full two-pass decode in the fully-continuous (ms) backend, vs the
    C oracle run with the same synthesized senmgau/float-mixw model."""
    from soundswallower_tpu.decoder import Decoder

    _, cfg = ms_en
    d = Decoder(hmm="/root/reference/model/en-us",
                senmgau=cfg["senmgau"], mixw=cfg["mixw"])
    d.set_align_text("go forward ten meters")
    raw = np.fromfile(f"{DATADIR}/goforward.raw", dtype=np.int16)
    d.start_utt()
    d.process_raw(raw)
    d.end_utt()
    assert d.hyp.text == "go forward ten meters"
    d.alignment()
    js = d.result_json(0.0, 2)
    assert js == open(f"{GOLDEN}/ms-en/result.json").read()


@slow
def test_pizza_branching_beam_parity():
    """The byte-exact beam-search port on the reference's own branching
    grammar (pizza.gram: optionals, alternations, a Kleene topping
    loop) over mismatched audio: hyp and every word boundary equal to
    the C beam search at default beams (golden fsg-pizza)."""
    from soundswallower_tpu.decoder import Decoder

    d = Decoder(hmm="/root/reference/model/en-us",
                jsgf="/root/reference/tests/data/pizza.gram")
    raw = np.fromfile(f"{DATADIR}/goforward.raw", dtype=np.int16)
    d.start_utt()
    d.process_raw(raw)
    d.end_utt()
    assert d.hyp.text == "yo four large tomatoes"
    segs = [(s["word"], s["sf"], s["ef"]) for s in d.seg_iter()
            if s["word"] is not None and s["word"] != "(NULL)"]
    gold = []
    for line in open(f"{GOLDEN}/fsg-pizza/segs.txt"):
        w, sf, ef, ascr, lscr = line.split()
        if w == "(NULL)":
            continue
        gold.append((w, int(sf), int(ef)))
    assert segs == gold
