"""Tests for BLEU-4 / CIDEr-D caption metrics."""

import pytest

import tests.conftest  # noqa: F401

from empirical_mvm_tpu.train.caption_metrics import bleu4, caption_scores, cider_d


def test_bleu4_perfect_match():
    hyp = {"a": "the cat sat on the mat today ok", "b": "a dog runs fast now then"}
    refs = {k: [v] for k, v in hyp.items()}
    assert bleu4(hyp, refs) == pytest.approx(1.0)


def test_bleu4_partial():
    hyp = {"a": "the cat sat on the mat"}
    refs = {"a": ["the cat sat on a rug"]}
    s = bleu4(hyp, refs)
    assert 0.0 <= s < 1.0


def test_bleu4_zero_overlap():
    assert bleu4({"a": "x y z w"}, {"a": ["p q r s"]}) == 0.0


def test_cider_rewards_matches():
    refs = {f"k{i}": [f"video number {i} shows a cat"] for i in range(5)}
    good = {f"k{i}": f"video number {i} shows a cat" for i in range(5)}
    bad = {f"k{i}": "completely unrelated words here" for i in range(5)}
    assert cider_d(good, refs) > cider_d(bad, refs)
    assert cider_d(bad, refs) == pytest.approx(0.0, abs=1e-6)


def test_caption_scores_dict():
    # hypothesis needs >= 4 tokens for any 4-gram credit
    hyp = {"a": "the cat sat on the mat"}
    refs = {"a": ["the cat sat on the mat", "a cat is sitting on a mat"]}
    s = caption_scores(hyp, refs)
    assert {"bleu4", "cider", "rouge_l", "meteor"} <= set(s) and s["bleu4"] > 0


def test_rouge_l_properties():
    from empirical_mvm_tpu.train.caption_metrics import rouge_l
    refs = {"a": ["the cat sat on the mat"]}
    assert abs(rouge_l({"a": "the cat sat on the mat"}, refs) - 1.0) < 1e-9
    partial = rouge_l({"a": "the cat on mat"}, refs)
    assert 0.0 < partial < 1.0
    assert rouge_l({"a": "zebra quantum xylophone"}, refs) == 0.0
    # order matters for LCS: scrambled scores below in-order
    in_order = rouge_l({"a": "the cat sat mat"}, refs)
    scrambled = rouge_l({"a": "mat sat cat the"}, refs)
    assert in_order > scrambled


def test_meteor_properties():
    from empirical_mvm_tpu.train.caption_metrics import meteor
    refs = {"a": ["the cat sat on the mat"]}
    perfect = meteor({"a": "the cat sat on the mat"}, refs)
    assert perfect > 0.99          # penalty ~0.5*(1/6)^3
    # stem matching: "sitting"/"sat" won't merge but "cats"/"cat" will
    stemmed = meteor({"a": "the cats sat on the mat"}, refs)
    assert stemmed > 0.9
    # fragmented alignment is penalized vs contiguous
    contiguous = meteor({"a": "the cat sat"}, refs)
    fragmented = meteor({"a": "the sat mat"}, refs)
    assert contiguous > fragmented > 0.0


def test_caption_scores_has_all_metrics():
    from empirical_mvm_tpu.train.caption_metrics import caption_scores
    refs = {"a": ["a dog runs fast", "the dog is running"]}
    out = caption_scores({"a": "a dog runs fast"}, refs)
    for k in ("bleu4", "cider", "rouge_l", "meteor"):
        assert k in out and out[k] >= 0.0, out
    assert out["rouge_l"] > 99.0 and out["meteor"] > 95.0
