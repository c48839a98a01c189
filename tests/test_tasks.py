"""Tests for downstream task models + evaluators + end-to-end task flow."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from empirical_mvm_tpu.core.config import BertConfig, ModelConfig, SwinConfig
from empirical_mvm_tpu.models.tasks import (VioletQAMC, VioletQAMCGen,
                                            VioletQAOE, VioletQAOEMLMHead,
                                            VioletRetrieval)
from empirical_mvm_tpu.train.evaluators import (in_batch_retrieval_accuracy,
                                                qamc_gen_accuracy,
                                                qaoe_mlm_topk, rank_metrics)

TINY_BERT = BertConfig(vocab_size=200, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=64)
# 4 stages => /32 spatial reduction, matching EncVideo's h=H/32 token grid
TINY_SWIN = SwinConfig(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                       drop_path_rate=0.0)


def _cfg():
    return ModelConfig(size_img=64, size_frame=2, size_txt=8, size_option=3,
                       fusion=TINY_BERT, text=TINY_BERT, swin_custom=TINY_SWIN)


def _img(b):
    return jnp.asarray(np.random.RandomState(0).rand(b, 2, 64, 64, 3)
                       .astype(np.float32))


def test_retrieval_all_pairs_scores():
    cfg = _cfg()
    model = VioletRetrieval(config=cfg)
    b = 3
    txt = jnp.asarray(np.random.RandomState(1).randint(5, 200, (b, 8)))
    mask = jnp.ones((b, 8), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), _img(b), txt,
                                        mask)["params"])()
    scores = jax.jit(lambda p: model.apply({"params": p}, _img(b), txt,
                                           mask))(params)
    assert scores.shape == (b, b)
    # row-major (video i, caption j): identical captions give identical cols
    acc = in_batch_retrieval_accuracy(np.asarray(scores))
    assert 0.0 <= acc <= 1.0


def test_retrieval_encode_multiclip_and_score_pairs():
    cfg = _cfg()
    model = VioletRetrieval(config=cfg)
    b, clips = 2, 3
    txt = jnp.asarray(np.random.RandomState(1).randint(5, 200, (b, 8)))
    mask = jnp.ones((b, 8), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), _img(b), txt,
                                        mask)["params"])()
    img6 = jnp.asarray(np.random.RandomState(2)
                       .rand(b, clips, 2, 64, 64, 3).astype(np.float32))
    fi, mi, ft, mt = jax.jit(lambda p: model.apply(
        {"params": p}, img6, txt, mask, method=model.encode))(params)
    lv = 2 * (1 + 2 * 2)
    assert fi.shape == (b, lv, cfg.hidden_size) and mi.shape == (b, lv)
    s = jax.jit(lambda p: model.apply({"params": p}, fi, mi, ft, mt,
                                      method=model.score_pairs))(params)
    assert s.shape == (b,)

    # mean over clips == encode of each clip averaged
    fi1, _, _, _ = jax.jit(lambda p: model.apply(
        {"params": p}, img6[:, 0], txt, mask, method=model.encode))(params)
    fi_all = [np.asarray(jax.jit(lambda p, c: model.apply(
        {"params": p}, c, txt, mask, method=model.encode)[0])(params,
                                                             img6[:, i]))
              for i in range(clips)]
    np.testing.assert_allclose(np.asarray(fi), np.mean(fi_all, axis=0),
                               atol=1e-5)


def test_qamc_shapes():
    cfg = _cfg()
    model = VioletQAMC(config=cfg)
    b, o = 2, cfg.size_option
    txt = jnp.asarray(np.random.RandomState(1).randint(5, 200, (b, o, 8)))
    mask = jnp.ones((b, o, 8), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), _img(b), txt,
                                        mask)["params"])()
    out = jax.jit(lambda p: model.apply({"params": p}, _img(b), txt,
                                        mask))(params)
    assert out.shape == (b, o)


def test_qamc_gen_and_qaoe_mlm_logits():
    cfg = _cfg()
    for cls in (VioletQAMCGen, VioletQAOEMLMHead):
        model = cls(config=cfg)
        b = 2
        txt = jnp.asarray(np.random.RandomState(1).randint(5, 200, (b, 8)))
        mask = jnp.ones((b, 8), jnp.int32)
        params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), _img(b),
                                            txt, mask)["params"])()
        out = jax.jit(lambda p: model.apply({"params": p}, _img(b), txt,
                                            mask))(params)
        assert out.shape == (b, 8, TINY_BERT.vocab_size)


def test_qaoe_vocab_head():
    cfg = _cfg()
    model = VioletQAOE(config=cfg, size_vocab=42)
    b = 2
    txt = jnp.asarray(np.random.RandomState(1).randint(5, 200, (b, 8)))
    mask = jnp.ones((b, 8), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), _img(b), txt,
                                        mask)["params"])()
    out = jax.jit(lambda p: model.apply({"params": p}, _img(b), txt,
                                        mask))(params)
    assert out.shape == (b, 42)


def test_rank_metrics():
    s = np.array([[0.9, 0.1, 0.2],
                  [0.2, 0.8, 0.1],
                  [0.3, 0.2, 0.1]])
    m = rank_metrics(s, [0, 1, 2])
    assert m["r1"] == pytest.approx(200 / 3)
    assert m["r5"] == 100.0
    assert m["medr"] == 1.0


def test_qamc_gen_accuracy_metric():
    v = 50
    logits = np.zeros((2, 4, v), np.float32)
    txt = np.array([[1, 9, 2, 0], [1, 2, 9, 0]])  # 9 == [MASK]
    ans_toks = [10, 11, 12]
    logits[0, 1, 11] = 5.0   # predicts option 1
    logits[1, 2, 10] = 5.0   # predicts option 0
    accs = qamc_gen_accuracy(logits, txt, 9, ans_toks, np.array([1, 2]))
    assert accs == [1.0, 0.0]


def test_qaoe_mlm_topk_metric():
    v = 20
    logits = np.zeros((2, 3, v), np.float32)
    mask_ans = np.array([[-1, 7, -1], [-1, -1, -1]])
    logits[0, 1, 7] = 3.0
    accs = qaoe_mlm_topk(logits, mask_ans, k=1)
    assert accs == [1.0, 0.0]  # absent answers count as 0 (ref :113-116)


def test_captioning_train_and_generate():
    from empirical_mvm_tpu.models.captioning import VioletCaptioning
    cfg = _cfg()
    model = VioletCaptioning(config=cfg, cls_token_id=2, sep_token_id=3,
                             pad_token_id=0, mask_token_id=4)
    b = 2
    txt = jnp.asarray(np.random.RandomState(1).randint(5, 200, (b, 8)))
    mask = jnp.ones((b, 8), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), _img(b), txt,
                                        mask)["params"])()
    logits = jax.jit(lambda p: model.apply({"params": p}, _img(b), txt,
                                           mask))(params)
    assert logits.shape == (b, 8, TINY_BERT.vocab_size)

    toks = jax.jit(lambda p: model.apply(
        {"params": p}, _img(b), max_len=6, method=model.generate))(params)
    toks = np.asarray(toks)
    assert toks.shape == (b, 6)
    assert (toks[:, 0] == 2).all()          # starts with [CLS]
    # sampling path also compiles
    toks2 = jax.jit(lambda p: model.apply(
        {"params": p}, _img(b), max_len=6, decode="sample", top_k=5,
        top_p=0.9, rng=jax.random.PRNGKey(1), method=model.generate))(params)
    assert np.asarray(toks2).shape == (b, 6)


def test_captioning_kv_cache_matches_full_reencode():
    """The KV-cached decoder must emit IDENTICAL greedy tokens to the full
    re-encode scan (it is the same math decomposed: video rows never attend
    text under the seq2seq mask, ref model.py:192-198, so the video half is
    cacheable and text decodes incrementally)."""
    from empirical_mvm_tpu.models.captioning import VioletCaptioning
    cfg = _cfg()
    model = VioletCaptioning(config=cfg, cls_token_id=2, sep_token_id=3,
                             pad_token_id=0, mask_token_id=4)
    b = 2
    txt = jnp.asarray(np.random.RandomState(1).randint(5, 200, (b, 8)))
    mask = jnp.ones((b, 8), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), _img(b), txt,
                                        mask)["params"])()
    full = np.asarray(jax.jit(lambda p: model.apply(
        {"params": p}, _img(b), max_len=7, use_cache=False,
        method=model.generate))(params))
    cached = np.asarray(jax.jit(lambda p: model.apply(
        {"params": p}, _img(b), max_len=7,
        method=model.generate_cached))(params))
    assert (full == cached).all(), (full, cached)
    # sampling through the cached path also compiles and emits valid shapes
    toks = np.asarray(jax.jit(lambda p: model.apply(
        {"params": p}, _img(b), max_len=7, decode="sample", top_k=5,
        rng=jax.random.PRNGKey(1), method=model.generate_cached))(params))
    assert toks.shape == (b, 7) and (toks[:, 0] == 2).all()


def test_captioning_kv_cache_scanned_fusion():
    """Cached decode also consumes the scanned (stacked-param) fusion
    encoder layout."""
    import dataclasses
    from empirical_mvm_tpu.models.captioning import VioletCaptioning
    cfg = _cfg()
    cfg_scan = dataclasses.replace(
        cfg, fusion=dataclasses.replace(TINY_BERT, scan=True))
    model = VioletCaptioning(config=cfg, cls_token_id=2, sep_token_id=3,
                             pad_token_id=0, mask_token_id=4)
    model_s = VioletCaptioning(config=cfg_scan, cls_token_id=2,
                               sep_token_id=3, pad_token_id=0,
                               mask_token_id=4)
    b = 2
    txt = jnp.asarray(np.random.RandomState(1).randint(5, 200, (b, 8)))
    mask = jnp.ones((b, 8), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), _img(b), txt,
                                        mask)["params"])()
    # per-layer -> stacked fusion params
    from empirical_mvm_tpu.models.bert import stack_encoder_params
    p2 = dict(params)
    p2["trsfr"] = stack_encoder_params(
        {k: jax.tree.map(np.asarray, v) for k, v in params["trsfr"].items()},
        TINY_BERT.num_hidden_layers)
    full = np.asarray(jax.jit(lambda p: model.apply(
        {"params": p}, _img(b), max_len=6, use_cache=False,
        method=model.generate))(params))
    cached = np.asarray(jax.jit(lambda p: model_s.apply(
        {"params": p}, _img(b), max_len=6,
        method=model_s.generate_cached))(p2))
    assert (full == cached).all(), (full, cached)


def test_qamc_mlm_head_variant():
    from empirical_mvm_tpu.models.tasks import (VioletQAMCMLMHead,
                                                qamc_mlm_head_accuracy)
    cfg = _cfg()
    model = VioletQAMCMLMHead(config=cfg)
    b, o = 2, cfg.size_option
    txt = jnp.asarray(np.random.RandomState(1).randint(5, 200, (b, o, 8)))
    mask = jnp.ones((b, o, 8), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), _img(b), txt,
                                        mask)["params"])()
    out = jax.jit(lambda p: model.apply({"params": p}, _img(b), txt,
                                        mask))(params)
    assert out.shape == (b, o, 8, TINY_BERT.vocab_size)

    # metric: [MASK] at pos 3 of each option; true token 10, false 11
    logits = np.zeros((1, 3, 8, 50), np.float32)
    mask_ans = np.full((1, 3, 8), -1, np.int64)
    mask_ans[0, :, 3] = [11, 10, 11]       # option 1 is 'true'
    logits[0, 1, 3, 10] = 5.0              # model favors true @ option 1
    logits[0, 0, 3, 11] = 5.0
    logits[0, 2, 3, 11] = 5.0
    accs = qamc_mlm_head_accuracy(logits, mask_ans, 10, 11)
    assert accs == [1.0]


def test_joint_seq2seq_mask_semantics():
    """joint_attn_bias('seq2seq') must reproduce ref model.py:192-198: every
    row sees valid video tokens; text attends causally; video rows never see
    text."""
    from empirical_mvm_tpu.models.violet import joint_attn_bias
    b, lv, lt = 2, 3, 4
    rs = np.random.RandomState(0)
    mask_img = jnp.asarray(rs.randint(0, 2, (b, lv)))
    mask_img = mask_img.at[:, 0].set(1)
    mask_txt = jnp.ones((b, lt), jnp.int32)
    bias = np.asarray(joint_attn_bias(mask_img, mask_txt, "seq2seq"))[:, 0]
    l = lv + lt
    # expected mask per reference construction
    exp = np.zeros((b, l, l), np.int64)
    mi = np.asarray(mask_img)
    for i in range(b):
        exp[i, :, :lv] = mi[i][None, :]
        exp[i, lv:, lv:] = np.tril(np.ones((lt, lt)))
    allowed = bias > -1.0   # additive bias: 0 allowed, -inf-ish blocked
    assert (allowed == (exp > 0)).all()


def test_qamc_gumbel_token_selection():
    """num_video_tokens variant (ref main_qamc.py:55-83) selects a sparse
    video-token mask and still produces (B, O) logits."""
    cfg = _cfg()
    model = VioletQAMC(config=cfg, num_video_tokens=4)
    b, o = 2, cfg.size_option
    txt = jnp.asarray(np.random.RandomState(1).randint(5, 200, (b, o, 8)))
    mask = jnp.ones((b, o, 8), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}
    params = jax.jit(lambda: model.init(rngs, _img(b), txt,
                                        mask)["params"])()
    out = jax.jit(lambda p: model.apply(
        {"params": p}, _img(b), txt, mask, deterministic=False,
        rngs={"gumbel": jax.random.PRNGKey(2),
              "dropout": jax.random.PRNGKey(3)}))(params)
    assert out.shape == (b, o) and np.isfinite(np.asarray(out)).all()


def test_task_token_prefix():
    """enable_task_token prepends one learned row; logits stay aligned to the
    original text positions (ref: model.py:219-236, main_qaoe_lsmdc_fib.py)."""
    import dataclasses
    cfg = dataclasses.replace(_cfg(), enable_task_token=True, task_token="oe")
    model = VioletQAOEMLMHead(config=cfg)
    b = 2
    txt = jnp.asarray(np.random.RandomState(1).randint(5, 200, (b, 8)))
    mask = jnp.ones((b, 8), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), _img(b),
                                        txt, mask)["params"])()
    assert "emb_task" in params
    assert params["emb_task"].shape == (cfg.num_task_tokens,
                                        cfg.hidden_size)
    out = jax.jit(lambda p: model.apply({"params": p}, _img(b), txt,
                                        mask))(params)
    assert out.shape == (b, 8, TINY_BERT.vocab_size)
    # the prefix must influence the output: a different task row changes it
    cfg2 = dataclasses.replace(cfg, task_token="mc")
    out2 = jax.jit(lambda p: VioletQAOEMLMHead(config=cfg2).apply(
        {"params": p}, _img(b), txt, mask))(params)
    assert float(jnp.abs(out - out2).max()) > 1e-6


def test_prompt_prefix():
    """enable_prompt prepends an encoded prompt (ref: model.py:237-249)."""
    import dataclasses
    cfg = dataclasses.replace(_cfg(), enable_prompt=True)
    model = VioletQAOEMLMHead(config=cfg, prompt_tokens=(2, 7, 9, 3),
                              prompt_mask_static=(1, 1, 1, 1))
    b = 2
    txt = jnp.asarray(np.random.RandomState(1).randint(5, 200, (b, 8)))
    mask = jnp.ones((b, 8), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), _img(b),
                                        txt, mask)["params"])()
    out = jax.jit(lambda p: model.apply({"params": p}, _img(b), txt,
                                        mask))(params)
    assert out.shape == (b, 8, TINY_BERT.vocab_size)
    # with a different prompt the logits change
    model2 = VioletQAOEMLMHead(config=cfg, prompt_tokens=(4, 5, 6, 8),
                               prompt_mask_static=(1, 1, 1, 1))
    out2 = jax.jit(lambda p: model2.apply({"params": p}, _img(b), txt,
                                          mask))(params)
    assert float(jnp.abs(out - out2).max()) > 1e-6


def test_fusion_scan_equivalence():
    """VioletBase(fusion.scan=True) == unscanned forward given converted
    params; compile-time lever must not change numerics."""
    import dataclasses
    from empirical_mvm_tpu.models.violet import VioletBase
    from empirical_mvm_tpu.models.bert import (stack_encoder_params,
                                               unstack_encoder_params)
    cfg = _cfg()
    model = VioletBase(config=cfg)
    b = 2
    txt = jnp.asarray(np.random.RandomState(1).randint(5, 200, (b, 8)))
    mask = jnp.ones((b, 8), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), _img(b),
                                        txt, mask)["params"])()
    ref = jax.jit(lambda p: model.apply({"params": p}, _img(b), txt,
                                        mask))(params)

    cfg_s = dataclasses.replace(
        cfg, fusion=dataclasses.replace(cfg.fusion, scan=True))
    model_s = VioletBase(config=cfg_s)
    params_s = dict(params)
    params_s["trsfr"] = stack_encoder_params(
        params["trsfr"], cfg.fusion.num_hidden_layers)
    out = jax.jit(lambda p: model_s.apply({"params": p}, _img(b), txt,
                                          mask))(params_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # round trip back to per-layer layout
    back = unstack_encoder_params(params_s["trsfr"])
    for i in range(cfg.fusion.num_hidden_layers):
        a = jax.tree.leaves(back[f"layer_{i}"])
        bl = jax.tree.leaves(params["trsfr"][f"layer_{i}"])
        for x, y in zip(a, bl):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_ckpt_layout_adaptation():
    """scan and non-scan models load each other's checkpoints."""
    from empirical_mvm_tpu.cli.common import _adapt_encoder_layout
    from empirical_mvm_tpu.models.bert import stack_encoder_params
    layer = {"attention": {"query": {"kernel": np.ones((4, 4))}}}
    per_layer = {"trsfr": {"layer_0": layer, "layer_1": layer}}
    stacked = {"trsfr": stack_encoder_params(per_layer["trsfr"], 2)}
    # per-layer ckpt -> scan model
    adapted = _adapt_encoder_layout(stacked, per_layer)
    assert adapted["trsfr"]["layer"]["attention"]["query"]["kernel"
                                                          ].shape == (2, 4, 4)
    # stacked ckpt -> per-layer model
    adapted2 = _adapt_encoder_layout(per_layer, stacked)
    assert set(adapted2["trsfr"]) == {"layer_0", "layer_1"}


def test_captioning_beam_search():
    """Beam search: shape/CLS contract; beam_size=1 with no length penalty
    must match greedy exactly (same argmax path)."""
    from empirical_mvm_tpu.models.captioning import VioletCaptioning
    cfg = _cfg()
    model = VioletCaptioning(config=cfg, cls_token_id=2, sep_token_id=3,
                             pad_token_id=0, mask_token_id=4)
    b = 2
    txt = jnp.asarray(np.random.RandomState(1).randint(5, 200, (b, 8)))
    mask = jnp.ones((b, 8), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), _img(b), txt,
                                        mask)["params"])()

    greedy = np.asarray(jax.jit(lambda p: model.apply(
        {"params": p}, _img(b), max_len=6, method=model.generate))(params))
    beam1 = np.asarray(jax.jit(lambda p: model.apply(
        {"params": p}, _img(b), max_len=6, beam_size=1, length_penalty=0.0,
        method=model.generate_beam))(params))
    np.testing.assert_array_equal(beam1, greedy)

    beam4 = np.asarray(jax.jit(lambda p: model.apply(
        {"params": p}, _img(b), max_len=6, beam_size=4,
        method=model.generate_beam))(params))
    assert beam4.shape == (b, 6)
    assert (beam4[:, 0] == 2).all()
