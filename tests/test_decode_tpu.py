"""TPU grammar decoder: static decode graph + dense Viterbi vs the C
reference's beam search (tools/oracle goldens, JSGF grammars).

The graph compiles the full search space (triphone context expansion,
alt pronunciations, silence self-loops, null-closure) and dense Viterbi
finds the global optimum — hyp and word boundaries must match the
reference's beam search output on its test grammars.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import DATADIR, GOLDEN, golden

from soundswallower_tpu.aligner import TpuAligner


def _ref_segs(name):
    out = []
    for line in open(f"{GOLDEN}/{name}/segs.txt"):
        w, sf, ef, ascr, lscr = line.split()
        if w == "(NULL)":          # history artifact of null transitions
            continue
        out.append((w, int(sf), int(ef)))
    return out


def _grouped(al, name):
    raw = golden(name, "senscr.i16", np.int16, (-1, al.am.n_sen))
    G = int(np.prod(al.tables.group_shape))
    out = np.zeros((len(raw), G), np.int16)
    out[:, al.tables.sen_remap] = raw
    return out


def _decode_with_golden_scores(al, name):
    g = al._decode_graph
    sen = _grouped(al, name)
    T = len(sen)
    path, _ = al._viterbi(g, jnp.asarray(sen), T)
    segs = al._extract_decode(g, np.asarray(path), T)
    hyp = " ".join(al.dict.wordstr(al.dict.basewid_of(s.wid))
                   for s in segs if not al.dict.filler_word(s.wid))
    return hyp, [(s.word, s.start, s.start + s.duration - 1) for s in segs]


@pytest.fixture(scope="module")
def en():
    return TpuAligner(hmm="/root/reference/model/en-us")


def test_jsgf_decode_matches_reference_en(en):
    """goforward.gram on the reference's own senone scores: hyp and
    every word boundary equal to the C beam search."""
    en.set_grammar(jsgf_file=f"{DATADIR}/goforward.gram")
    hyp, segs = _decode_with_golden_scores(en, "fsg-goforward")
    assert hyp == "go forward ten meters"
    assert segs == _ref_segs("fsg-goforward")


def test_jsgf_decode_matches_reference_fr():
    """fr-fr grammar with alternate pronunciations: the reference picks
    de(2)/mètres(4); the dense decode must pick the same variants.
    Boundaries may shift a few frames: dense Viterbi finds a path the
    reference's history-deduplicated beam search scores lower (same word
    and variant sequence; observed <= 5 frames on this utterance), so
    words and variants are exact and boundaries are tightly bounded."""
    al = TpuAligner(hmm="/root/reference/model/fr-fr",
                    dict="/root/reference/model/fr-fr/dict.txt")
    al.set_grammar(jsgf_file=f"{DATADIR}/goforward_fr.gram")
    hyp, segs = _decode_with_golden_scores(al, "fsg-goforward-fr")
    assert hyp == "avance de dix mètres"
    ref = _ref_segs("fsg-goforward-fr")
    assert [s[0] for s in segs] == [r[0] for r in ref]  # words + variants
    for (w, sf, ef), (_, rsf, ref_) in zip(segs, ref):
        assert abs(sf - rsf) <= 6 and abs(ef - ref_) <= 6, (w, sf, ef)


def test_decode_end_to_end_audio(en):
    """Full pipeline from raw audio (own FE + scorer, not goldens)."""
    en.set_grammar(jsgf_file=f"{DATADIR}/goforward.gram")
    raw = np.fromfile(f"{DATADIR}/goforward.raw", np.int16)
    hyp, segs = en.decode(raw)
    assert hyp == "go forward ten meters"
    # contiguity
    pos = 0
    for s in segs:
        assert s.start == pos
        pos = s.start + s.duration
    assert pos == en.fe.n_frames(len(raw))


def test_decode_batch(en):
    """Batched grammar decode must match per-utterance decode()."""
    en.set_grammar(jsgf_file=f"{DATADIR}/goforward.gram")
    raw = np.fromfile(f"{DATADIR}/goforward.raw", np.int16)
    single_hyp, single_segs = en.decode(raw)
    batch = en.decode_batch([raw, raw[:20000], raw])
    assert batch[0] is not None and batch[2] is not None
    hyp0, segs0 = batch[0]
    assert hyp0 == single_hyp
    assert ([(s.word, s.start, s.duration) for s in segs0]
            == [(s.word, s.start, s.duration) for s in single_segs])
    assert batch[0][0] == batch[2][0]


def test_decode_fsg_text_format(en):
    """Text-format FSG file (goforward.fsg) through FsgModel.read."""
    from soundswallower_tpu.fsg import FsgModel

    fsg = FsgModel.read_fsg_file(f"{DATADIR}/goforward.fsg", en.lmath,
                                 en.config.get_float("lw"))
    en.set_grammar(fsg=fsg)
    hyp, segs = _decode_with_golden_scores(en, "fsg-goforward")
    assert hyp == "go forward ten meters"


def test_decode_self_loop_grammar(en):
    """A grammar with a Kleene loop (word can repeat): re-entries of the
    same transition must split into separate word segments."""
    en.set_grammar(jsgf_string="""#JSGF V1.0;
grammar loop;
public <cmd> = go (forward | ten | meters)+;
""")
    raw = np.fromfile(f"{DATADIR}/goforward.raw", np.int16)
    hyp, segs = en.decode(raw)
    words = hyp.split()
    assert words[0] == "go"
    assert all(w in ("forward", "ten", "meters") for w in words[1:])
    assert len(words) >= 4  # forward ten meters at least
    pos = 0
    for s in segs:
        assert s.start == pos, (s, pos)
        pos = s.start + s.duration
