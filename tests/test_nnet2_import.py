"""nnet2 final.mdl import (utils/nnet2_io.py).

A hand-written byte stream (independent of the module's reader) builds
the p-norm multisplice posterior net of `run_nnet2_multisplice.sh`, and
the imported flax model is checked against an independent numpy forward
implementation of the nnet2 component semantics.
"""

import struct
import types

import jax.numpy as jnp
import numpy as np
import pytest


from sepi_tpu.utils.nnet2_io import Nnet2ParseError, import_kaldi_nnet2


def _tok(t):
    return t.encode() + b" "


def _i32(v):
    return b"\x04" + struct.pack("<i", v)


def _f32(v):
    return b"\x04" + struct.pack("<f", v)


def _f64(v):
    return b"\x08" + struct.pack("<d", v)


def _fv(x):
    x = np.asarray(x, np.float32)
    return _tok("FV") + _i32(x.shape[0]) + x.tobytes()


def _dv(x):
    x = np.asarray(x, np.float64)
    return _tok("DV") + _i32(x.shape[0]) + x.tobytes()


def _fm(x):
    x = np.asarray(x, np.float32)
    return _tok("FM") + _i32(x.shape[0]) + _i32(x.shape[1]) + x.tobytes()


def _ivec(v):
    # Kaldi WriteIntegerVector framing (io-funcs-inl.h): elem-size char,
    # then the count as a RAW little-endian int32 (no size-prefix byte).
    v = np.asarray(v, np.int32)
    return b"\x04" + struct.pack("<i", v.shape[0]) + v.tobytes()


def _splice(in_dim, context):
    return (_tok("<SpliceComponent>") + _tok("<InputDim>") + _i32(in_dim)
            + _tok("<Context>") + _ivec(context)
            + _tok("<ConstComponentDim>") + _i32(0)
            + _tok("</SpliceComponent>"))


def _fixed_affine(w, b):
    return (_tok("<FixedAffineComponent>") + _tok("<LinearParams>") + _fm(w)
            + _tok("<BiasParams>") + _fv(b) + _tok("</FixedAffineComponent>"))


def _affine(w, b):
    t = "AffineComponentPreconditionedOnline"
    return (_tok(f"<{t}>") + _tok("<LearningRate>") + _f32(0.0015)
            + _tok("<LinearParams>") + _fm(w) + _tok("<BiasParams>") + _fv(b)
            + _tok("<RankIn>") + _i32(20) + _tok("<RankOut>") + _i32(80)
            + _tok("<UpdatePeriod>") + _i32(4)
            + _tok("<NumSamplesHistory>") + _f32(2000.0)
            + _tok("<Alpha>") + _f32(4.0)
            + _tok("<MaxChangePerSample>") + _f32(0.075)
            + _tok(f"</{t}>"))


def _pnorm(in_dim, out_dim, p=2.0):
    return (_tok("<PnormComponent>") + _tok("<InputDim>") + _i32(in_dim)
            + _tok("<OutputDim>") + _i32(out_dim) + _tok("<P>") + _f64(p)
            + _tok("</PnormComponent>"))


def _nonlin(name, dim):
    return (_tok(f"<{name}>") + _tok("<Dim>") + _i32(dim)
            + _tok("<ValueSum>") + _dv(np.zeros(dim))
            + _tok("<DerivSum>") + _dv(np.zeros(dim))
            + _tok("<Count>") + _f64(0.0) + _tok(f"</{name}>"))


def _build_mdl(tmp_path, rng, feat=6, lda_out=12, pnorm_out=4, group=3,
               senones=9, with_tm=True):
    """Two pnorm layers: splice(-2..2)+LDA+affine, splice(-1,2)+affine."""
    hid = pnorm_out * group
    w_lda = rng.normal(size=(lda_out, 5 * feat)) * 0.3
    b_lda = rng.normal(size=lda_out) * 0.1
    w0 = rng.normal(size=(hid, lda_out)) * 0.3
    b0 = rng.normal(size=hid) * 0.1
    w1 = rng.normal(size=(hid, 2 * pnorm_out)) * 0.3
    b1 = rng.normal(size=hid) * 0.1
    w_out = rng.normal(size=(senones, pnorm_out)) * 0.3
    b_out = rng.normal(size=senones) * 0.1
    priors = rng.dirichlet(np.ones(senones))

    body = b""
    if with_tm:
        body += (_tok("<TransitionModel>") + _tok("<Junk>") + _i32(7)
                 + b"\x01\x02\x03 " + _tok("</TransitionModel>"))
    body += _tok("<Nnet>") + _tok("<NumComponents>") + _i32(9)
    body += _tok("<Components>")
    body += _splice(feat, [-2, -1, 0, 1, 2])
    body += _fixed_affine(w_lda, b_lda)
    body += _affine(w0, b0)
    body += _pnorm(hid, pnorm_out)
    body += _nonlin("NormalizeComponent", pnorm_out)
    body += _splice(pnorm_out, [-1, 2])
    body += _affine(w1, b1)
    body += _pnorm(hid, pnorm_out)
    body += _nonlin("NormalizeComponent", pnorm_out)
    # output affine + softmax are also components; fix the count
    body += _affine(w_out, b_out)
    body += _nonlin("SoftmaxComponent", senones)
    body = body.replace(_tok("<NumComponents>") + _i32(9),
                        _tok("<NumComponents>") + _i32(11), 1)
    body += _tok("</Components>") + _tok("</Nnet>") + _fv(priors)
    p = tmp_path / "final.mdl"
    p.write_bytes(b"\x00B" + body)
    weights = dict(w_lda=w_lda, b_lda=b_lda, w0=w0, b0=b0, w1=w1, b1=b1,
                   w_out=w_out, b_out=b_out, priors=priors)
    return p, weights


def _ref_forward(feats, wt, pnorm_out=4):
    """Independent numpy nnet2 semantics: splice/affine/pnorm/normalize."""

    def splice(x, ctx):
        lo, hi = -min(ctx), max(ctx)
        t = x.shape[0] - lo - hi
        return np.concatenate([x[lo + c : lo + c + t] for c in ctx], axis=1)

    def pnorm_norm(x):
        g = x.reshape(x.shape[0], pnorm_out, -1)
        y = np.sqrt(np.sum(g * g, axis=-1))
        rms = np.sqrt(np.mean(y * y, axis=-1, keepdims=True))
        return y / np.maximum(rms, 1e-20)

    x = splice(feats, [-2, -1, 0, 1, 2])
    x = x @ wt["w_lda"].T + wt["b_lda"]
    x = pnorm_norm(x @ wt["w0"].T + wt["b0"])
    x = splice(x, [-1, 2])
    x = pnorm_norm(x @ wt["w1"].T + wt["b1"])
    logits = x @ wt["w_out"].T + wt["b_out"]
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def test_import_matches_independent_forward(tmp_path):
    rng = np.random.default_rng(0)
    p, wt = _build_mdl(tmp_path, rng)
    model, variables, cfg, priors = import_kaldi_nnet2(str(p))
    assert cfg.feat_dim == 6
    assert cfg.num_senones == 9
    assert cfg.group_size == 3
    assert cfg.context == (3, 4)
    np.testing.assert_allclose(priors, wt["priors"], rtol=1e-6)

    feats = rng.normal(size=(20, 6)).astype(np.float32)
    out = model.apply(variables, jnp.asarray(feats[None]), train=False)
    got = np.asarray(jnp.asarray(
        np.exp(np.asarray(out["logits"][0], np.float64))))
    got = got / got.sum(axis=-1, keepdims=True)
    want = _ref_forward(feats.astype(np.float64), wt)
    assert got.shape == want.shape == (13, 9)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_import_plugs_into_posterior_extraction(tmp_path):
    from sepi_tpu.recipes.nnet2_recipe import nnet2_posteriors

    rng = np.random.default_rng(1)
    p, wt = _build_mdl(tmp_path, rng)
    model, variables, cfg, _ = import_kaldi_nnet2(str(p))
    state = types.SimpleNamespace(params=variables["params"], batch_stats=None)
    feats = {f"u{i}": rng.normal(size=(15 + i, 6)).astype(np.float32)
             for i in range(3)}
    post = nnet2_posteriors(model, state, feats)
    for u, f in feats.items():
        assert post[u].shape == (f.shape[0], 9)
        np.testing.assert_allclose(post[u].sum(axis=1), 1.0, rtol=1e-4)


def test_raw_net_without_transition_model(tmp_path):
    rng = np.random.default_rng(2)
    p, _ = _build_mdl(tmp_path, rng, with_tm=False)
    model, variables, cfg, priors = import_kaldi_nnet2(str(p))
    assert cfg.num_senones == 9 and priors is not None


def test_rejects_nnet3_and_text(tmp_path):
    p = tmp_path / "x.raw"
    p.write_bytes(b"\x00B" + _tok("<Nnet3>"))
    with pytest.raises(Nnet2ParseError, match="nnet3"):
        import_kaldi_nnet2(str(p))
    p2 = tmp_path / "t.mdl"
    p2.write_bytes(b"<Nnet> text")
    with pytest.raises(Nnet2ParseError, match="binary magic"):
        import_kaldi_nnet2(str(p2))


def test_cli_dispatches_nnet2(tmp_path):
    from sepi_tpu.cli import main

    rng = np.random.default_rng(4)
    p, _ = _build_mdl(tmp_path, rng)
    out = tmp_path / "imported"
    assert main(["import-kaldi", "--raw", str(p), "--out", str(out)]) == 0
    assert (out / "variables.msgpack").exists()
    assert (out / "priors.npy").exists()
    import json

    meta = json.loads((out / "meta.json").read_text())
    assert meta["arch"] == "nnet2"
    assert meta["config"]["num_senones"] == 9


def test_rejects_odd_pnorm(tmp_path):
    rng = np.random.default_rng(3)
    p, _ = _build_mdl(tmp_path, rng)
    data = p.read_bytes().replace(_f64(2.0), _f64(3.0))
    p2 = tmp_path / "p3.mdl"
    p2.write_bytes(data)
    with pytest.raises(Nnet2ParseError, match="P=3"):
        import_kaldi_nnet2(str(p2))


def test_truncation_fuzz_never_crashes(tmp_path):
    rng = np.random.default_rng(5)
    p, _ = _build_mdl(tmp_path, rng)
    data = p.read_bytes()
    cuts = sorted({1, 2, 3, 7} | set(
        int(x) for x in np.linspace(4, len(data) - 2, 50)))
    for cut in cuts:
        trunc = tmp_path / "trunc.mdl"
        trunc.write_bytes(data[:cut])
        try:
            import_kaldi_nnet2(str(trunc))
        except ValueError:
            pass
        # reaching here without exception is fine only when the cut
        # removed nothing semantic (trailing priors/space)


def test_trailing_fixed_affine_rejected(tmp_path):
    """A FixedAffineComponent after the last affine must error, not be
    silently dropped."""
    rng = np.random.default_rng(6)
    p, _ = _build_mdl(tmp_path, rng)
    data = p.read_bytes()
    extra = _fixed_affine(rng.normal(size=(9, 9)), rng.normal(size=9))
    softmax_at = data.rfind(_tok("<SoftmaxComponent>"))
    patched = (data[:softmax_at] + extra + data[softmax_at:]).replace(
        _tok("<NumComponents>") + _i32(11),
        _tok("<NumComponents>") + _i32(12), 1)
    p2 = tmp_path / "trail.mdl"
    p2.write_bytes(patched)
    with pytest.raises(Nnet2ParseError, match="trailing FixedAffine"):
        import_kaldi_nnet2(str(p2))
