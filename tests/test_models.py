"""Model-zoo tests: shapes, receptive fields, mask invariance, grafting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sepi_tpu.models import (
    AM_BOTTLENECK,
    AdaptedConfig,
    AdaptedXVector,
    AmConfig,
    AmNet,
    CombinedConfig,
    CombinedCVector,
    MultitaskConfig,
    MultitaskCVector,
    TdnnSpec,
    XVector,
    XVectorConfig,
)
from sepi_tpu.models.tdnn import Stream, append_streams, stack_context
from sepi_tpu.train.graft import graft_subtree

B, T, D = 2, 64, 23


def _feats(rng, b=B, t=T, d=D):
    return rng.normal(size=(b, t, d)).astype(np.float32)


def test_tdnn_spec_properties():
    s = TdnnSpec(512, (-3, 0, 3))
    assert s.kernel_size == 3 and s.dilation == 3 and (s.left, s.right) == (3, 3)
    s2 = TdnnSpec(128, (-6, -3, 0))
    assert s2.dilation == 3 and (s2.left, s2.right) == (6, 0)
    with pytest.raises(ValueError):
        TdnnSpec(1, (-2, 0, 3))


def test_v2_xvector_context_and_shapes(rng):
    cfg = XVectorConfig(num_speakers=11)
    assert cfg.context == (7, 7)  # the reference's compiled model context
    model = XVector(cfg)
    x = _feats(rng)
    vars_ = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    out = model.apply(vars_, jnp.asarray(x), train=False)
    assert out["logits"].shape == (B, 11)
    assert out["embedding_a"].shape == (B, 512)
    assert out["embedding_b"].shape == (B, 512)


def test_am_net_context_and_frame_logits(rng):
    cfg = AmConfig(num_senones=97)
    assert cfg.context == (13, 7)
    model = AmNet(cfg)
    x = _feats(rng)
    vars_ = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    out = model.apply(vars_, jnp.asarray(x), train=False)
    assert out["logits"].shape == (B, T - 13 - 7, 97)
    assert out["bottleneck"].x.shape == (B, T - 20, 128)


def test_multitask_contexts_match_reference():
    cfg = MultitaskConfig(num_speakers=5, num_senones=50)
    # xvec branch: tdnn1..5 contexts +-(2+2+3) = (7, 7)
    assert cfg.xvec_context == (7, 7)
    assert cfg.am_context == (7, 7)
    cfg3 = MultitaskConfig(num_shared=3)
    assert cfg3.xvec_context == (7, 7)  # sharing doesn't change total context


@pytest.mark.parametrize("num_shared", [1, 2, 3, 4])
def test_multitask_both_heads(rng, num_shared):
    cfg = MultitaskConfig(num_speakers=5, num_senones=50, num_shared=num_shared)
    model = MultitaskCVector(cfg)
    x = _feats(rng)
    vars_ = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False, task="both")
    out = model.apply(vars_, jnp.asarray(x), train=False, task="both")
    assert out["logits"].shape == (B, 5)
    assert out["am_logits"].shape[0] == B and out["am_logits"].shape[2] == 50
    l, r = cfg.am_context
    assert out["am_logits"].shape[1] == T - l - r
    # single-task calls reuse the same params
    out_am = model.apply(vars_, jnp.asarray(x), train=False, task="am")
    np.testing.assert_allclose(
        np.asarray(out_am["am_logits"]), np.asarray(out["am_logits"]), atol=1e-6
    )


def test_adapted_xvector_merge(rng):
    cfg = AdaptedConfig(num_speakers=7)
    assert cfg.context == (13, 7)
    model = AdaptedXVector(cfg)
    x = _feats(rng)
    vars_ = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    out = model.apply(vars_, jnp.asarray(x), train=False)
    assert out["logits"].shape == (B, 7)
    assert "am" in vars_["params"]  # graftable subtree


def test_combined_cvector(rng):
    cfg = CombinedConfig(num_speakers=7, num_senones=31)
    model = CombinedCVector(cfg)
    x = _feats(rng)
    vars_ = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False, task="both")
    out = model.apply(vars_, jnp.asarray(x), train=False, task="both")
    assert out["logits"].shape == (B, 7)
    assert out["am_logits"].shape[2] == 31
    assert "am" in vars_["params"] and "am_branch" in vars_["params"]


def test_stats_pooling_mask_invariance(rng):
    """Padding must not change the embedding — the core batching invariant."""
    cfg = XVectorConfig(num_speakers=3)
    model = XVector(cfg)
    t_short = 40
    x_short = _feats(rng, b=1, t=t_short)
    x_padded = np.zeros((1, T, D), np.float32)
    x_padded[:, :t_short] = x_short
    mask = np.zeros((1, T), bool)
    mask[:, :t_short] = True
    vars_ = model.init(jax.random.PRNGKey(0), jnp.asarray(x_short), train=False)
    e1 = model.apply(vars_, jnp.asarray(x_short), train=False)["embedding_a"]
    e2 = model.apply(
        vars_, jnp.asarray(x_padded), frame_mask=jnp.asarray(mask), train=False
    )["embedding_a"]
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=2e-4, atol=2e-4)


def test_append_streams_alignment(rng):
    """Center-aligned concat: a kernel-1 branch vs a spliced branch."""
    a = Stream(jnp.asarray(rng.normal(size=(1, 10, 4)).astype(np.float32)), 2, 1)
    b = Stream(jnp.asarray(rng.normal(size=(1, 13, 4)).astype(np.float32)), 0, 0)
    m = append_streams([a, b])
    assert m.left == 2 and m.right == 1
    assert m.x.shape == (1, 10, 8)
    np.testing.assert_allclose(np.asarray(m.x[:, :, 4:]), np.asarray(b.x[:, 2:12]))


def test_graft_am_into_adapted(rng):
    am_cfg = AmConfig(num_senones=19)
    am = AmNet(am_cfg)
    x = _feats(rng)
    am_vars = am.init(jax.random.PRNGKey(1), jnp.asarray(x), train=False)

    model = AdaptedXVector(AdaptedConfig(num_speakers=4, am=am_cfg))
    tgt_vars = model.init(jax.random.PRNGKey(2), jnp.asarray(x), train=False)
    grafted = graft_subtree(tgt_vars, am_vars, "am")
    # grafted subtree equals pretrained AM trunk
    k = grafted["params"]["am"]["frames"]["tdnn1"]["affine"]["kernel"]
    k_src = am_vars["params"]["frames"]["tdnn1"]["affine"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k), np.asarray(k_src))
    # non-am parts untouched
    np.testing.assert_array_equal(
        np.asarray(grafted["params"]["segment"]["tdnn6"]["affine"]["kernel"]),
        np.asarray(tgt_vars["params"]["segment"]["tdnn6"]["affine"]["kernel"]),
    )
    # forward works with grafted params, and bottleneck path matches AM
    out = model.apply(grafted, jnp.asarray(x), train=False)
    assert out["logits"].shape == (B, 4)


def test_graft_shape_mismatch_raises(rng):
    am = AmNet(AmConfig(num_senones=19))
    x = _feats(rng)
    am_vars = am.init(jax.random.PRNGKey(1), jnp.asarray(x), train=False)
    other = AmNet(AmConfig(num_senones=19, specs=(TdnnSpec(100, (-1, 0, 1)),)))
    model = AdaptedXVector(
        AdaptedConfig(num_speakers=4, am=AmConfig(num_senones=19))
    )
    tgt_vars = model.init(jax.random.PRNGKey(2), jnp.asarray(x), train=False)
    bad_src = other.init(jax.random.PRNGKey(3), jnp.asarray(x), train=False)
    with pytest.raises(ValueError):
        graft_subtree(tgt_vars, bad_src, "am")


def test_nnet2_pnorm_multisplice(rng):
    """The legacy DNN/i-vector posterior net: shapes, context, p-norm."""
    import dataclasses

    from sepi_tpu.models import Nnet2Config, Nnet2Multisplice

    cfg = dataclasses.replace(
        Nnet2Config(), num_senones=20, pnorm_output_dim=12, group_size=4
    )
    assert cfg.context == (13, 9)  # l: 2+1+3+7, r: 2+2+3+2
    model = Nnet2Multisplice(cfg)
    x = rng.normal(size=(2, 40, 40)).astype(np.float32)
    vars_ = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = model.apply(vars_, jnp.asarray(x))
    assert out["logits"].shape == (2, 40 - 13 - 9, 20)
    assert out["context"] == (13, 9)
    # p-norm output feeding i-vector posteriors
    post = np.asarray(jax.nn.softmax(out["logits"], axis=-1))
    np.testing.assert_allclose(post.sum(-1), 1.0, atol=1e-5)


def test_pnorm_layer_math(rng):
    """group p-norm (p=2) + RMS normalization against direct computation."""
    from sepi_tpu.models import PnormLayer
    from sepi_tpu.models.tdnn import TdnnSpec

    layer = PnormLayer(TdnnSpec(3, (0,)), input_dim_multiple=2)
    x = rng.normal(size=(1, 5, 4)).astype(np.float32)
    vars_ = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(layer.apply(vars_, jnp.asarray(x)))
    k = np.asarray(vars_["params"]["affine"]["kernel"])[0]  # (4, 6)
    b = np.asarray(vars_["params"]["affine"]["bias"])
    aff = x[0] @ k + b  # (5, 6)
    g = aff.reshape(5, 3, 2)
    pn = np.sqrt((g**2).sum(-1) + 1e-20)
    ref = pn / np.sqrt((pn**2).mean(-1, keepdims=True) + 1e-20)
    np.testing.assert_allclose(y[0], ref, rtol=1e-5, atol=1e-5)
