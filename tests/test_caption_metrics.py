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
    assert set(s) == {"bleu4", "cider"} and s["bleu4"] > 0
