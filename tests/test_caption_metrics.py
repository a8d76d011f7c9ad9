"""Caption-metric fidelity vs independent oracles.

pycocoevalcap (the reference's scorer stack, eval_refer_inv.py:204-211) and
its Java jars are unavailable here, so validation uses:
  * BLEU  — nltk.translate.bleu_score.corpus_bleu (independent
    implementation of the same Papineni corpus-BLEU definition);
  * METEOR — nltk.translate.meteor_score (independent implementation of the
    METEOR-1.0 formula with the same exact/stem/wordnet modules and
    alpha=0.9, beta=3, gamma=0.5 defaults);
  * CIDEr-D / SPICE — analytic fixtures where the expected score is
    hand-derivable from the published formula (identity -> max score,
    disjoint -> 0, plus a hand-computed partial-overlap case).
Deviation bounds vs the pycocoevalcap jars are documented on the metric
docstrings (caption_metrics.py).
"""

import math

import numpy as np
import pytest

from anyref_tpu.eval.caption_metrics import (bleu_n, cider_d, meteor, spice,
                                             _meteor_align, _tokens)

HYPS = [
    "the red cat is sleeping on the mat",
    "a large dog runs across the green field",
    "two people are standing near a blue car",
    "a bowl of fresh fruit on the wooden table",
]
REFS = [
    ["the red cat sleeps on the mat",
     "a red cat is sleeping on a mat"],
    ["a big dog is running across a green field",
     "the large dog runs over the grass"],
    ["two persons stand next to a blue automobile",
     "a pair of people near the blue car"],
    ["fresh fruit in a bowl on a wooden table",
     "a fruit bowl sits on the table"],
]


def test_bleu_matches_nltk_corpus_bleu():
    from nltk.translate.bleu_score import corpus_bleu
    refs_tok = [[r.lower().split() for r in rs] for rs in REFS]
    hyps_tok = [h.lower().split() for h in HYPS]
    for n in (1, 2, 3, 4):
        want = corpus_bleu(refs_tok, hyps_tok,
                           weights=tuple([1.0 / n] * n))
        got = bleu_n(HYPS, REFS, n)
        assert got == pytest.approx(want, abs=1e-9), f"BLEU-{n}"


def test_meteor_identity_analytic():
    # hyp == ref, m matches in 1 chunk:
    # P=R=1, fmean=1, penalty=0.5*(1/m)^3, score = 1 - 0.5/m^3
    s = "the red cat sits"
    m = 4
    want = 1.0 - 0.5 / m ** 3
    assert meteor([s], [[s]]) == pytest.approx(want, abs=1e-12)


class _NoWordnet:
    """Dummy WordNet: no synsets, so nltk's meteor runs exact+stem only —
    lets the formula/alignment comparison run without the wordnet corpus."""

    @staticmethod
    def synsets(word):
        return []


def test_meteor_matches_nltk_per_sentence(monkeypatch):
    """Same formula + module stack as nltk.translate.meteor_score; alignment
    strategies differ (greedy chunk-continuation vs nltk's minimal-chunk
    enumeration) but coincide on corpora without ambiguous duplicate
    matches. Both sides run exact+stem (dummy wordnet) so the test is
    corpus-data independent."""
    nltk_meteor = pytest.importorskip("nltk.translate.meteor_score")
    import anyref_tpu.eval.caption_metrics as cm
    monkeypatch.setattr(cm, "_wn_lemmas", lambda tok: frozenset())
    # no duplicated words within a sentence -> alignment is unambiguous
    cases = [
        ("the red cat is sleeping on that mat",
         ["one red cat sleeps on this mat",
          "a crimson feline naps atop some rug"]),
        ("a large dog runs across this green field",
         ["that big dog is running over a grassy meadow"]),
        ("two people are standing near one blue car",
         ["several persons stand next to a blue automobile"]),
        ("fresh fruit rests inside a wooden bowl",
         ["ripe fruit sits in that wood basin"]),
    ]
    for hyp, refs in cases:
        want = max(
            nltk_meteor.single_meteor_score(r.lower().split(),
                                            hyp.lower().split(),
                                            wordnet=_NoWordnet())
            for r in refs)
        got = meteor([hyp], [refs])
        assert got == pytest.approx(want, abs=1e-6), (hyp, refs)


def test_meteor_duplicate_words_at_least_as_few_chunks_as_nltk(monkeypatch):
    """With duplicated function words the alignment is ambiguous; METEOR's
    spec objective is the MINIMUM-chunk alignment. The greedy
    chunk-continuation aligner must never do worse (more chunks => lower
    score) than nltk's enumeration on the corpus fixtures."""
    nltk_meteor = pytest.importorskip("nltk.translate.meteor_score")
    import anyref_tpu.eval.caption_metrics as cm
    monkeypatch.setattr(cm, "_wn_lemmas", lambda tok: frozenset())
    for hyp, refs in zip(HYPS, REFS):
        want = max(
            nltk_meteor.single_meteor_score(r.lower().split(),
                                            hyp.lower().split(),
                                            wordnet=_NoWordnet())
            for r in refs)
        got = meteor([hyp], [refs])
        assert got >= want - 1e-9, (hyp, refs)


def test_meteor_wordnet_synonym_stage():
    """'automobile' vs 'car' only matches through the WordNet module."""
    try:
        from nltk.corpus import wordnet
        wordnet.synsets("car")
    except LookupError:
        pytest.skip("nltk wordnet corpus not installed")
    m, chunks = _meteor_align(_tokens("a blue automobile"),
                              _tokens("a blue car"))
    assert m == 3 and chunks == 1
    # and scoring reflects it: full match beats the exact+stem-only 2/3
    got = meteor(["a blue automobile"], [["a blue car"]])
    assert got > 0.9


def test_cider_identity_and_disjoint():
    # distinct single-ref docs, hyp == ref: every n-gram has df=1 over 3
    # docs -> idf>0 -> cosine sim 1 per n, zero length penalty => 10.0
    caps = ["the red cat sits on the soft mat",
            "a large dog runs across the field",
            "fresh fruit rests in a wooden bowl"]
    score = cider_d(caps, [[c] for c in caps])
    assert score == pytest.approx(10.0, abs=1e-9)
    # fully disjoint vocab => 0
    assert cider_d(["xyzzy quux"], [["alpha beta gamma"]],
                   ) == pytest.approx(0.0, abs=1e-12)


def test_cider_length_penalty():
    # same 1-gram multiset at different lengths is penalized by
    # exp(-dl^2 / (2*6^2)) per the CIDEr-D definition
    refs = [["red cat"], ["blue dog big"], ["green bird"]]
    full = cider_d(["red cat", "blue dog big", "green bird"], refs)
    # append an off-vocab token to one hyp: 1-gram sim drops AND length
    # penalty applies; score must strictly decrease
    longer = cider_d(["red cat extra", "blue dog big", "green bird"], refs)
    assert longer < full


def test_spice_identity_disjoint_and_partial():
    assert spice(["the red cat"], [["the red cat"]]) == 1.0
    assert spice(["purple elephant"], [["wooden table"]]) == 0.0
    # hand-computed partial: hyp tuples {(cat,),(cat,red)};
    # ref tuples {(cat,),(cat,blue)}; inter={(cat,)} -> P=R=1/2
    got = spice(["a red cat"], [["a blue cat"]])
    assert got == pytest.approx(0.5, abs=1e-12)


def test_scene_graph_paper_example():
    """The SPICE paper's (Anderson et al. 2016, fig. 1) worked caption must
    parse to exactly the paper's tuple set — objects, attributes (incl. the
    noun-noun compound), the participle attribute, and the multiword-prep
    relation."""
    from anyref_tpu.eval.caption_metrics import _stem
    from anyref_tpu.eval.scene_graph import parse_tuples

    got = parse_tuples("a young girl standing on top of a tennis court",
                       stem=_stem)
    want = {(_stem("girl"),), (_stem("girl"), _stem("young")),
            (_stem("girl"), _stem("stand")), (_stem("court"),),
            (_stem("court"), _stem("tennis")),
            (_stem("girl"), "on top of", _stem("court"))}
    assert got == want


def test_scene_graph_clause_rules():
    from anyref_tpu.eval.caption_metrics import _stem
    from anyref_tpu.eval.scene_graph import parse_tuples

    def p(s):
        return parse_tuples(s, stem=_stem)

    # predicative adjective: "NP is ADJ" -> (subj, adj)
    assert (_stem("cat"), _stem("black")) in p("the cat is black")
    # verb with object NP -> (subj, verb, obj), never (obj, verb)
    t = p("a man riding a horse")
    assert (_stem("man"), _stem("ride"), _stem("horse")) in t
    assert (_stem("horse"), _stem("ride")) not in t
    # PP attaches to the nearest NP
    assert (_stem("cat"), "on", _stem("mat")) in p("a red cat on the mat")
    # noun/verb homograph after a determiner is a noun, not a verb
    t = p("a woman in a blue dress")
    assert (_stem("dress"), _stem("blue")) in t
    assert (_stem("woman"), "in", _stem("dress")) in t
    # plural-verb relation ("the dog chases the ball")
    assert (_stem("dog"), _stem("chase"), _stem("ball")) in p(
        "the dog chases the ball")


def test_spice_parse_beats_bag_of_words_on_role_swap():
    """The parser encodes argument structure: swapping subject and object
    changes the relation tuple, so SPICE must score the role-swapped
    caption strictly below the faithful one (a bag-of-words/adjacency
    stand-in cannot make this distinction from identical token sets)."""
    refs = [["a dog chasing a cat"]]
    faithful = spice(["the dog chases the cat"], refs)
    swapped = spice(["the cat chases the dog"], refs)
    assert faithful > swapped


def test_meteor_degrades_without_nltk(monkeypatch):
    """If nltk is absent entirely, meteor raises ImportError (the harness
    catches it and NaNs the field — harnesses.evaluate_refer_inverse)."""
    import anyref_tpu.eval.caption_metrics as cm
    monkeypatch.setattr(cm, "_STEMMER", None)
    monkeypatch.setattr(cm, "_STEM_CACHE", {})
    import builtins
    real_import = builtins.__import__

    def no_nltk(name, *a, **k):
        if name.startswith("nltk"):
            raise ImportError("nltk disabled for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_nltk)
    with pytest.raises(ImportError):
        meteor(["a cat"], [["a cat"]])


def test_cider_raw_count_tf_min_clip():
    """CIDEr-D uses RAW term counts x idf (pycocoevalcap counts2vec), not
    length-normalized tf — the min() clip flips sides when hyp/ref lengths
    differ. Hand-computed: doc1 hyp 'a a b' vs ref 'a b b b' (idf cancels
    in the cosine): 1-gram sim = (min(2,1)*1+min(1,3)*3)/sqrt(5*10)
    = 0.5656854, 2-gram sim = 1/sqrt(2*5) = 0.3162278, 3/4-gram 0, length
    penalty exp(-1/72); doc2 is an identity pair scoring (1+1+0+0)/4*10=5."""
    score = cider_d(["a a b", "x y"], [["a b b b"], ["x y"]])
    d1 = (0.5656854 + 0.3162278) * 2.718281828459045 ** (-1 / 72) / 4 * 10
    assert score == pytest.approx((d1 + 5.0) / 2, abs=1e-4)
