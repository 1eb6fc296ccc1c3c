"""Metric parity tests: hand-computed BLEU/CIDEr values, tokenizer
behavior, METEOR-lite ordering sanity, grounding-F1 micro-examples
(SURVEY.md §4 'metric-parity tests')."""

import numpy as np
import pytest

from cvc_tpu.evaluation.bleu import corpus_bleu
from cvc_tpu.evaluation.cider import CiderD
from cvc_tpu.evaluation.grounding import grounding_eval, gt_sentence_localization
from cvc_tpu.evaluation.language_eval import language_eval
from cvc_tpu.evaluation.meteor import corpus_meteor
from cvc_tpu.evaluation.tokenizer import ptb_tokenize


def test_ptb_tokenizer_punctuation_and_case():
    assert ptb_tokenize("A man, riding; a horse.") == \
        ["a", "man", "riding", "a", "horse"]
    assert ptb_tokenize("Don't stop!") == ["do", "n't", "stop"]
    assert ptb_tokenize("") == []


def test_bleu_hand_computed():
    cand = {"1": "the cat sat on the mat"}
    refs = {"1": ["the cat is on the mat"]}
    b = corpus_bleu(cand, refs)
    np.testing.assert_allclose(b[0], 5 / 6, rtol=1e-9)
    np.testing.assert_allclose(b[1], (5 / 6 * 3 / 5) ** 0.5, rtol=1e-9)
    np.testing.assert_allclose(b[2], (5 / 6 * 3 / 5 * 1 / 4) ** (1 / 3),
                               rtol=1e-9)
    assert b[3] < 1e-2  # zero 4-gram overlap -> epsilon only


def test_bleu_perfect_match_is_one():
    cand = {"1": "a dog runs", "2": "the bird flies high"}
    refs = {"1": ["a dog runs"], "2": ["the bird flies high", "a bird"]}
    b = corpus_bleu(cand, refs)
    np.testing.assert_allclose(b[0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(b[3], 1.0, rtol=1e-3)


def test_bleu_brevity_penalty():
    cand = {"1": "the cat"}                       # len 2
    refs = {"1": ["the cat sat on the mat"]}      # len 6
    b = corpus_bleu(cand, refs)
    np.testing.assert_allclose(b[0], np.exp(1 - 6 / 2) * 1.0, rtol=1e-9)


def test_cider_identity_scores_ten():
    cand = {"1": "a dog runs fast", "2": "the bird flies high"}
    refs = {"1": ["a dog runs fast"], "2": ["the bird flies high"]}
    corpus, per_img = CiderD().compute_score(cand, refs)
    np.testing.assert_allclose(per_img["1"], 10.0, rtol=1e-9)
    np.testing.assert_allclose(corpus, 10.0, rtol=1e-9)


def test_cider_short_sentence_loses_missing_ngram_orders():
    # CIDEr-D divides by n=4 even when the sentence has no 4-grams: an
    # identical 3-word caption caps at 7.5 (faithful toolkit behavior).
    cand = {"1": "a dog runs fast", "2": "the bird flies"}
    refs = {"1": ["a dog runs fast"], "2": ["the bird flies"]}
    _, per_img = CiderD().compute_score(cand, refs)
    np.testing.assert_allclose(per_img["2"], 7.5, rtol=1e-9)


def test_cider_disjoint_is_zero_and_orders_partial():
    cand = {"1": "a dog runs", "2": "purple elephants sing"}
    refs = {"1": ["a dog runs"], "2": ["the bird flies home"]}
    _, per_img = CiderD().compute_score(cand, refs)
    assert per_img["2"] == 0.0
    assert per_img["1"] > 5.0


def test_cider_length_penalty_gaussian():
    # identical n-gram overlap, but a longer reference costs via the
    # Gaussian length penalty ("3" dilutes DF so IDF weights are nonzero)
    cand = {"1": "a dog runs", "2": "a dog runs", "3": "the bird flies"}
    refs = {"1": ["a dog runs"],
            "2": ["a dog runs far away tonight"],
            "3": ["the bird flies"]}
    _, per_img = CiderD().compute_score(cand, refs)
    assert per_img["1"] > per_img["2"] > 0.0


def test_meteor_ordering():
    refs = {"1": ["a man rides a brown horse"]}
    good, _ = corpus_meteor({"1": "a man rides a brown horse"}, refs)
    near, _ = corpus_meteor({"1": "a man riding a brown horse"}, refs)
    bad, _ = corpus_meteor({"1": "purple elephants sing loudly"}, refs)
    assert good > near > bad
    assert good > 0.99 and bad == 0.0


def test_meteor_hand_computed():
    """Goldens derived by hand from the METEOR 1.5 formulas (en norm
    params alpha=.85, beta=.2, gamma=.6, delta=.75)."""
    # identical sentences: full contiguous alignment -> no penalty -> 1.0
    s, _ = corpus_meteor({"1": "a red dog"}, {"1": ["a red dog"]})
    assert abs(s - 1.0) < 1e-9
    # partial exact overlap: "a dog" matches, 1 chunk of 2.
    # P = R = (0.75*1 + 0.25*1) / (0.75*2 + 0.25*1) = 0.571428...
    # fmean = P (P == R); frag = 1/2; Pen = 0.6 * 0.5^0.2 = 0.522334
    # score = 0.571428 * (1 - 0.522334) = 0.272952
    s, _ = corpus_meteor({"1": "a dog runs"}, {"1": ["a dog sleeps"]})
    assert abs(s - 0.272952) < 1e-4
    # pure stem matches (dogs/dog, running/runs -> stems dog, run):
    # weight 0.6 each, full contiguous coverage -> no penalty
    # P = R = (0.75*1.2) / (0.75*2) = 0.6 -> score 0.6
    s, _ = corpus_meteor({"1": "dogs running"}, {"1": ["dog runs"]})
    assert abs(s - 0.6) < 1e-9


def test_meteor_multi_reference_takes_best():
    refs = {"1": ["completely unrelated words here",
                  "a man rides a horse"]}
    s, per = corpus_meteor({"1": "a man rides a horse"}, refs)
    assert abs(s - 1.0) < 1e-9 and abs(per["1"] - 1.0) < 1e-9


def test_meteor_alignment_minimizes_chunks():
    """The beam aligner must prefer the contiguous alignment when a word
    appears twice in the reference."""
    from cvc_tpu.evaluation.meteor import align
    hyp = "the cat sat".split()
    ref = "the dog saw the cat sat".split()
    pairs, _ = align(hyp, ref)
    # "the" should align to ref position 3 (contiguous with cat/sat),
    # giving exactly 1 chunk
    assert sorted(pairs) == [(0, 3), (1, 4), (2, 5)]


def test_porter_stemmer_canonical_vectors():
    from cvc_tpu.evaluation.meteor import porter_stem
    vectors = {
        "caresses": "caress", "ponies": "poni", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "hopping": "hop",
        "falling": "fall", "hissing": "hiss", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "electricity": "electr",
        "adjustable": "adjust", "dependent": "depend",
        "effective": "effect", "formalize": "formal",
        "riding": "ride", "horses": "hors", "running": "run",
    }
    bad = {w: (porter_stem(w), want) for w, want in vectors.items()
           if porter_stem(w) != want}
    assert not bad, bad


def test_language_eval_end_to_end(tmp_path):
    preds = [{"image_id": "1", "caption": "A big dog runs fast."},
             {"image_id": "2", "caption": "the small bird flies high"}]
    refs = {"1": ["a big dog runs fast"],
            "2": ["the small bird flies high", "a blue bird"]}
    out = language_eval(preds, refs, out_path=str(tmp_path / "res.json"))
    np.testing.assert_allclose(out["Bleu_1"], 1.0, rtol=1e-6)
    np.testing.assert_allclose(out["Bleu_4"], 1.0, rtol=1e-6)
    # image 2's second ref ("a blue bird") dilutes its ref-averaged CIDEr
    assert 5.0 < out["CIDEr"] < 10.0
    assert out["SPICE"] is None
    assert out["n_scored"] == 2
    assert (tmp_path / "res.json").exists()


# ---------------------------------------------------------------------------
# Grounding
# ---------------------------------------------------------------------------

def _boxes():
    return np.array([[0, 0, .5, .5], [.5, .5, 1, 1]], np.float32)


def test_grounding_perfect_and_missed_class():
    class_names = ["dog", "cat"]
    samples = [
        {  # generates 'dog', attends to the right region
            "words": ["a", "dog"],
            "attn": np.array([[.5, .5], [.9, .1]]),
            "boxes": _boxes(),
            "gt": [{"class_id": 0, "box": [0, 0, .5, .5]}],
        },
        {  # GT has a cat, model never says 'cat' -> recall 0 for cat
            "words": ["a", "dog"],
            "attn": np.array([[.5, .5], [.9, .1]]),
            "boxes": _boxes(),
            "gt": [{"class_id": 1, "box": [.5, .5, 1, 1]}],
        },
    ]
    out = grounding_eval(samples, class_names)
    # dog: sample1 correct; sample2 generated 'dog' but no dog in GT
    #   -> prec 1/2, rec 1/1, f1 = 2*(0.5*1)/(1.5) = 2/3; loc: 1/1
    # cat: never generated -> prec 0, rec 0, f1 0, loc 0
    np.testing.assert_allclose(out["per_class"]["dog"]["f1"], 2 / 3, rtol=1e-9)
    np.testing.assert_allclose(out["per_class"]["dog"]["loc_acc"], 1.0)
    assert out["per_class"]["cat"]["f1"] == 0.0
    np.testing.assert_allclose(out["F1_all"], (2 / 3 + 0) / 2, rtol=1e-9)
    np.testing.assert_allclose(out["F1_loc"], 0.5, rtol=1e-9)


def test_grounding_wrong_region_fails_iou():
    samples = [{
        "words": ["dog"],
        "attn": np.array([[.1, .9]]),          # attends wrong region
        "boxes": _boxes(),
        "gt": [{"class_id": 0, "box": [0, 0, .5, .5]}],
    }]
    out = grounding_eval(samples, ["dog"])
    assert out["F1_all"] == 0.0 and out["F1_loc"] == 0.0


def test_gt_sentence_localization_mode():
    samples = [{
        "attn": np.array([[.9, .1], [.1, .9]]),
        "boxes": _boxes(),
        "gt": [{"word_idx": 0, "box": [0, 0, .5, .5]},     # correct
               {"word_idx": 1, "box": [0, 0, .5, .5]}],    # wrong region
    }]
    out = gt_sentence_localization(samples)
    np.testing.assert_allclose(out["attn_accuracy"], 0.5)
    assert out["n_words"] == 2


def test_ptb_tokenizer_golden_corpus():
    """>=60 curated caption pairs pinning CoreNLP-PTB observable behavior
    (hyphens, brackets, contractions, assimilations, numerals, currency;
    SURVEY.md §7 parity risk #1)."""
    import json
    from cvc_tpu.evaluation.tokenizer import ptb_tokenize
    cases = json.load(open("tests/data/ptb_golden.json"))["cases"]
    assert len(cases) >= 60
    bad = []
    for inp, want in cases:
        got = " ".join(ptb_tokenize(inp))
        if got != want:
            bad.append((inp, want, got))
    assert not bad, "\n".join(f"{i!r}: want {w!r}, got {g!r}"
                              for i, w, g in bad)


def test_grounding_lemma_matching():
    """'dogs' must ground to class 'dog' (reference protocol matches at
    the lemma level, not exact string)."""
    class_names = ["dog", "cat"]
    samples = [{
        "words": ["two", "dogs"],
        "attn": np.array([[.5, .5], [.9, .1]]),
        "boxes": _boxes(),
        "gt": [{"class_id": 0, "box": [0, 0, .5, .5]}],
    }]
    r = grounding_eval(samples, class_names)
    assert r["F1_loc"] == 1.0 and r["F1_all"] == 1.0


def test_grounding_multiword_phrase_first_word():
    """Multi-word class ('traffic light') matches as a phrase and is
    graded at its FIRST word's attention row."""
    class_names = ["traffic light", "car"]
    samples = [{
        "words": ["a", "traffic", "light", "glows"],
        # row 1 ("traffic") attends region 0 = correct box; row 2
        # ("light") attends the wrong region — protocol grades row 1.
        "attn": np.array([[.5, .5], [.9, .1], [.1, .9], [.5, .5]]),
        "boxes": _boxes(),
        "gt": [{"class_id": 0, "box": [0, 0, .5, .5]}],
    }]
    r = grounding_eval(samples, class_names)
    assert r["F1_loc"] == 1.0
    # single words of a multi-word name must NOT match alone
    samples[0]["words"] = ["a", "light", "snack"]
    r2 = grounding_eval(samples, class_names)
    assert r2["F1_loc"] == 0.0 and r2["recall"] == 0.0


def test_grounding_irregular_plural():
    class_names = ["man"]
    samples = [{
        "words": ["men", "walking"],
        "attn": np.array([[.9, .1], [.5, .5]]),
        "boxes": _boxes(),
        "gt": [{"class_id": 0, "box": [0, 0, .5, .5]}],
    }]
    r = grounding_eval(samples, class_names)
    assert r["F1_loc"] == 1.0


def test_lemma_rules():
    from cvc_tpu.evaluation.grounding import lemma
    assert lemma("dogs") == "dog"
    assert lemma("puppies") == "puppy"
    assert lemma("benches") == "bench"
    assert lemma("glasses") == "glass"
    assert lemma("women") == "woman"
    assert lemma("people") == "person"
    assert lemma("bus") == "bus"
    assert lemma("grass") == "grass"
    assert lemma("tennis") == "tennis"


def test_jar_drivers_protocol_without_jvm():
    """No JVM in this sandbox: the jar drivers must report unavailable
    (not crash) and language_eval must fall back cleanly."""
    from cvc_tpu.evaluation import meteor_jar, spice_jar
    assert meteor_jar.jar_available() is False
    assert spice_jar.jar_available() is False
    with pytest.raises(RuntimeError):
        meteor_jar.MeteorJar()
    with pytest.raises(RuntimeError):
        spice_jar.compute_spice({"1": "a dog"}, {"1": ["a dog"]})


# ---------------------------------------------------------------------------
# SPICE-lite (rule-based scene-graph approximation; cvc_tpu/evaluation/
# spice_lite.py — the no-JVM fallback for the reference's SPICE jar)
# ---------------------------------------------------------------------------

def test_spice_lite_scene_graph_objects_attrs_relations():
    from cvc_tpu.evaluation.spice_lite import scene_graph
    g = scene_graph("a man riding a brown horse".split())
    assert ("man",) in g and ("horse",) in g
    assert ("horse", "brown") in g
    assert ("man", "ride", "horse") in g


def test_spice_lite_copular_attribute_attaches_to_clause_subject():
    from cvc_tpu.evaluation.spice_lite import scene_graph
    assert ("dog", "brown") in scene_graph("the dog is brown".split())
    # subject found through a PREP-linked NP chain
    g = scene_graph("a young girl in a red shirt is smiling".split())
    assert ("girl", "smiling") in g
    assert ("shirt", "red") in g
    assert ("smiling",) not in g          # predicate ADJ is not an object


def test_spice_lite_conjoined_subjects_share_relation():
    from cvc_tpu.evaluation.spice_lite import scene_graph
    g = scene_graph(
        "a man and a woman sitting on a wooden bench".split())
    assert ("man", "sit on", "bench") in g
    assert ("woman", "sit on", "bench") in g


def test_spice_lite_verb_lemmas():
    from cvc_tpu.evaluation.spice_lite import verb_lemma
    assert verb_lemma("riding") == "ride"
    assert verb_lemma("playing") == "play"
    assert verb_lemma("running") == "run"
    assert verb_lemma("sits") == "sit"
    assert verb_lemma("carried") == "carry"
    assert verb_lemma("catches") == "catch"


def test_spice_lite_f1_hand_computed():
    """cand graph: {(man,), (horse,), (horse,brown), (man,ride,horse)} (4);
    ref union adds (person,), (person,on,horse) and shares all 4 cand
    tuples except... compute exactly."""
    from cvc_tpu.evaluation.spice_lite import (corpus_spice_lite,
                                               scene_graph)
    cand = {"1": "a man riding a brown horse"}
    refs = {"1": ["a man rides a brown horse", "a person on a horse"]}
    tc = scene_graph(cand["1"].split())
    tg = scene_graph(refs["1"][0].split()) | scene_graph(refs["1"][1].split())
    inter = len(tc & tg)
    p, r = inter / len(tc), inter / len(tg)
    want = 2 * p * r / (p + r)
    got, per = corpus_spice_lite(cand, refs)
    assert abs(got - want) < 1e-9
    assert per["1"] == got
    # a reference caption ties the paraphrase (same graph after verb
    # lemmatization); an unrelated caption scores zero
    same, _ = corpus_spice_lite({"1": refs["1"][0]}, refs)
    wrong, _ = corpus_spice_lite({"1": "a blue car parked on a street"}, refs)
    assert same >= got > wrong == 0.0


def test_spice_lite_reported_by_language_eval():
    from cvc_tpu.evaluation.language_eval import language_eval
    preds = [{"image_id": "1", "caption": "A man riding a brown horse."}]
    refs = {"1": ["A man rides a brown horse.", "A person on a horse."]}
    out = language_eval(preds, refs)
    assert out["SPICE"] is None           # no JVM in this sandbox
    assert 0.0 < out["SPICE_lite"] <= 1.0
