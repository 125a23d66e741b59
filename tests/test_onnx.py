"""ONNX export: converter round trips + full stage export with the
reference I/O contract (onnx_modules/V230/models_onnx.py:896-1080).

Verification runs on the in-repo numpy evaluator (compat/onnx_eval.py)
because neither `onnx` nor `onnxruntime` ship in the image; the evaluator
implements ops from the ONNX spec independently of the exporter's mapping.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from bert_vits2_tpu.compat.jax2onnx import count_ops, export_model
from bert_vits2_tpu.compat.onnx_eval import OnnxEvaluator


def _roundtrip(fn, args, n_out=1, atol=1e-5):
    arrs = [np.asarray(a) for a in args]
    mb = export_model(
        fn,
        tuple(jnp.asarray(a) for a in arrs),
        [f"in{i}" for i in range(len(arrs))],
        [f"out{i}" for i in range(n_out)],
        "t",
    )
    got = OnnxEvaluator(mb)(*arrs)
    want = fn(*[jnp.asarray(a) for a in arrs])
    want = want if isinstance(want, (tuple, list)) else (want,)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(w), atol=atol, rtol=1e-4)
    return mb


def test_elementwise_softmax_matmul():
    W = np.random.default_rng(0).normal(size=(8, 16)).astype(np.float32)

    def f(x):
        h = jax.nn.softmax(x @ W, axis=-1)
        return (jnp.tanh(h) * jax.nn.sigmoid(h) + jnp.sqrt(jnp.abs(h))).mean(-1)

    x = np.random.default_rng(1).normal(size=(4, 8)).astype(np.float32)
    mb = _roundtrip(f, [x])
    ops = count_ops(mb)
    assert ops["Einsum"] == 1 and "Tanh" in ops


def test_conv1d_dilated_grouped_strided():
    k = np.random.default_rng(2).normal(size=(5, 2, 8)).astype(np.float32)

    def f(x):
        y = lax.conv_general_dilated(
            x, k, (2,), [(2, 1)], rhs_dilation=(1,),
            dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=2,
        )
        return jax.nn.leaky_relu(y, 0.1)

    x = np.random.default_rng(3).normal(size=(2, 17, 4)).astype(np.float32)
    _roundtrip(f, [x])


def test_conv_transpose_lhs_dilation():
    k = np.random.default_rng(4).normal(size=(8, 4, 6)).astype(np.float32)

    def f(x):
        return lax.conv_general_dilated(
            x, k, (1,), [(3, 3)], lhs_dilation=(4,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )

    x = np.random.default_rng(5).normal(size=(2, 10, 4)).astype(np.float32)
    mb = _roundtrip(f, [x])
    assert "ConvTranspose" in count_ops(mb)


def test_gather_pad_slice_cumsum_where_flip():
    E = np.random.default_rng(6).normal(size=(11, 4)).astype(np.float32)

    def f(ids, m):
        v = jnp.take(E, ids, axis=0)
        v = jnp.where(m[..., None] > 0, v, 0.0)
        v = jnp.cumsum(v, axis=1)
        v = jnp.pad(v, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        return jnp.flip(v, axis=1)

    ids = np.array([[1, 2, 3], [4, 5, 6]], np.int32)
    m = np.array([[1, 0, 1], [1, 1, 0]], np.float32)
    _roundtrip(f, [ids, m])


def test_scatter_set_add():
    def f(x, v):
        y = x.at[..., 0].set(v)
        return y.at[..., -1].add(2.0 * v)

    x = np.random.default_rng(7).normal(size=(2, 3, 7)).astype(np.float32)
    v = np.random.default_rng(8).normal(size=(2, 3)).astype(np.float32)
    _roundtrip(f, [x, v])


def test_scan_unroll():
    W = np.random.default_rng(9).normal(size=(3, 3)).astype(np.float32)

    def f(x):
        def body(c, xi):
            c = jnp.tanh(c @ W + xi)
            return c, 2.0 * c

        return lax.scan(body, jnp.zeros((3,), jnp.float32), x)

    x = np.random.default_rng(10).normal(size=(5, 3)).astype(np.float32)
    _roundtrip(f, [x], n_out=2)




def test_stage_export_verifies(tiny_model, tmp_path):
    from bert_vits2_tpu.compat.onnx_export import export_onnx, verify_onnx

    model, params = tiny_model
    paths = export_onnx(
        model, params, str(tmp_path), "Tiny", t_x=8, max_frames=16
    )
    assert set(paths) == {"emb", "enc_p", "sdp", "dp", "flow", "dec"}
    errs = verify_onnx(model, params, paths, t_x=8, max_frames=16)
    for stage, err in errs.items():
        assert err < 1e-4, f"{stage}: {err}"


def test_stage_io_contract(tiny_model, tmp_path):
    """Exported graph I/O names/layouts match the reference torch export
    (models_onnx.py:953-1060) so MoeVS-style runtimes can consume them."""
    from bert_vits2_tpu.compat.onnx_pb import parse_model
    from bert_vits2_tpu.compat.onnx_export import export_onnx

    model, params = tiny_model
    paths = export_onnx(
        model, params, str(tmp_path), "Tiny", t_x=8, max_frames=16,
        stages=("enc_p", "sdp", "dec"),
    )
    with open(paths["enc_p"], "rb") as f:
        g = parse_model(f.read())["graph"]
    in_names = [v["name"] for v in g["inputs"]]
    assert in_names == [
        "x", "x_lengths", "t", "language", "bert_0", "bert_1", "bert_2", "g",
    ]
    assert [v["name"] for v in g["outputs"]] == [
        "xout", "m_p", "logs_p", "x_mask",
    ]
    # channel-first: xout is [b, hidden, t]
    xout = g["outputs"][0]
    assert xout["dims"] == [1, 8, 8]
    with open(paths["sdp"], "rb") as f:
        g2 = parse_model(f.read())["graph"]
    assert [v["name"] for v in g2["inputs"]] == ["x", "x_mask", "zin", "g"]
    assert [v["name"] for v in g2["outputs"]] == ["logw"]
    with open(paths["dec"], "rb") as f:
        g3 = parse_model(f.read())["graph"]
    assert [v["name"] for v in g3["inputs"]] == ["z_in", "g"]
    assert [v["name"] for v in g3["outputs"]] == ["o"]
    # o: [b, 1, frames*hop]
    assert g3["outputs"][0]["dims"] == [1, 1, 16 * 16]


def test_onnx_pipeline_matches_jax_glue(tiny_model, tmp_path):
    """End-to-end: the exported artifacts + numpy glue (compat/onnx_infer.py,
    the reference V230_OnnxInference analog) produce the same waveform as
    the JAX stage functions fed identical noise."""
    from bert_vits2_tpu.compat.onnx_export import (
        export_onnx,
        make_onnx_stage_fns,
        stage_signatures,
    )
    from bert_vits2_tpu.compat.onnx_infer import OnnxTTSPipeline

    model, params = tiny_model
    t_x, max_frames = 8, 16
    export_onnx(model, params, str(tmp_path), "Tiny", t_x=t_x,
                max_frames=max_frames)

    rng = np.random.default_rng(3)
    n = 6
    seq = rng.integers(1, model.cfg.n_vocab, (1, n))
    tone = rng.integers(0, model.cfg.num_tones, (1, n))
    lang = rng.integers(0, model.cfg.num_languages, (1, n))
    bert = rng.normal(size=(n, 1024)).astype(np.float32) * 0.3
    sid = np.array([1])
    zin = rng.normal(size=(1, 2, t_x)).astype(np.float32) * 0.8
    z_eps = rng.normal(size=(1, model.cfg.inter_channels, max_frames)).astype(
        np.float32
    )

    pipe = OnnxTTSPipeline(str(tmp_path), "Tiny")
    wave_onnx, ylen_onnx = pipe(
        seq, tone, lang, bert, bert, bert, sid, zin=zin, z_eps=z_eps
    )

    # same glue, but each stage is the JAX function the export traced
    class JaxSession:
        def __init__(self, fn, in_names):
            self.fn, self.in_names = fn, in_names

        def run(self, _outs, feeds):
            out = self.fn(*[jnp.asarray(feeds[k]) for k in self.in_names])
            out = out if isinstance(out, (tuple, list)) else (out,)
            return [np.asarray(o) for o in out]

    fns = make_onnx_stage_fns(model, params)
    sigs = stage_signatures(model.cfg, t_x, max_frames)
    pipe_jax = OnnxTTSPipeline(str(tmp_path), "Tiny")
    for stage in pipe_jax.sessions:
        pipe_jax.sessions[stage] = JaxSession(fns[stage], sigs[stage][1])
    wave_jax, ylen_jax = pipe_jax(
        seq, tone, lang, bert, bert, bert, sid, zin=zin, z_eps=z_eps
    )

    np.testing.assert_array_equal(ylen_onnx, ylen_jax)
    np.testing.assert_allclose(wave_onnx, wave_jax, atol=2e-4)
    assert np.isfinite(wave_onnx).all() and ylen_onnx[0] >= 1


@pytest.mark.parametrize("emotion,extra", [
    ("vq210", ["vqidx", "sid"]),
    ("clap220", ["emo"]),
])
def test_emotion_version_enc_export(emotion, extra, tmp_path):
    """V2.1/V2.2 enc_p graphs carry the reference's extra emotion inputs
    (onnx_modules/V210/models_onnx.py:947-958) and still verify."""
    from bert_vits2_tpu.models import ModelConfig, Synthesizer
    from bert_vits2_tpu.compat.onnx_export import export_onnx, verify_onnx
    from bert_vits2_tpu.compat.onnx_pb import parse_model

    cfg = ModelConfig(
        n_vocab=20, bert_dim=1024, spec_channels=33, segment_size=8,
        inter_channels=8, hidden_channels=8, filter_channels=16, n_heads=2,
        n_layers=1, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 4),
        upsample_initial_channel=16, upsample_kernel_sizes=(8, 8),
        n_speakers=4, gin_channels=8, n_layers_trans_flow=2,
        emotion=emotion,
    )
    model = Synthesizer(cfg)
    b, t_x = 1, 8
    rng0 = np.random.default_rng(0)
    bert = jnp.asarray(rng0.normal(size=(b, t_x, 1024)), jnp.float32)
    emo0 = (
        jnp.zeros((b,), jnp.int32)
        if emotion == "vq210"
        else jnp.zeros((b, 512), jnp.float32)
    )
    params = model.init(
        {
            "params": jax.random.key(0),
            "noise": jax.random.key(1),
            "dropout": jax.random.key(2),
        },
        jnp.asarray(rng0.integers(1, cfg.n_vocab, (b, t_x))),
        jnp.asarray([t_x] * b),
        jnp.zeros((b, 16, cfg.spec_channels), jnp.float32),
        jnp.asarray([16] * b),
        jnp.asarray([0]),
        jnp.asarray(rng0.integers(0, cfg.num_tones, (b, t_x))),
        jnp.asarray(rng0.integers(0, cfg.num_languages, (b, t_x))),
        bert, bert, bert,
        emo=emo0,
        deterministic=True,
    )["params"]
    paths = export_onnx(
        model, params, str(tmp_path), "Emo", t_x=t_x, max_frames=16,
        stages=("enc_p",),
    )
    with open(paths["enc_p"], "rb") as f:
        g = parse_model(f.read())["graph"]
    names = [v["name"] for v in g["inputs"]]
    assert names == [
        "x", "x_lengths", "t", "language", "bert_0", "bert_1", "bert_2",
        "g",
    ] + extra
    errs = verify_onnx(model, params, paths, t_x=t_x, max_frames=16)
    assert errs["enc_p"] < 1e-4, errs
