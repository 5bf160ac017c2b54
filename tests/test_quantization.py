"""Quantization subsystem: iPQ (EM product quantization + centroid
finetuning + the Quantizer schedule driver), quant-noise training, and
scalar int8 QAT.

Parity targets:
  fairseq/modules/quant_noise.py          (block-drop training noise)
  fairseq/modules/quantization/pq/        (EM, PQLinear/PQEmbedding, utils)
  fairseq/modules/quantization/scalar/    (emulate_int, IntLinear, qact)
  fairseq/quantization_utils.py           (schedule-driven Quantizer)

The PQ EM and PQLinear tests run the reference's OWN torch implementation
(tests.ref_loader) on identical inputs.
"""

import os
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.ops import quantization as q
from tests.ref_loader import load_reference, reference_available


# ---------------------------------------------------------------------------
# scalar fake-quant
# ---------------------------------------------------------------------------

def test_scalar_quantize_math_parity_torch():
    """quantize() == scalar/ops.py:15-20 on the same scale/zero_point."""
    import torch
    r = np.random.RandomState(0)
    w = r.randn(37, 19).astype(np.float32) * 0.3
    for scale, zp in ((0.01, 7.0), (0.002, 128.0), (0.07, 0.0)):
        ours = np.asarray(q.scalar_quantize(jnp.asarray(w), scale, zp, 8))
        tw = torch.tensor(w)
        ref = ((torch.clamp(torch.round(tw / scale + zp), 0, 255) - zp)
               * scale).numpy()
        np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)


def test_observe_tensor_parity_torch():
    """tensor observer == torch.ao MinMaxObserver (per-tensor affine)."""
    torch = pytest.importorskip("torch")
    obs_mod = pytest.importorskip("torch.ao.quantization.observer")
    r = np.random.RandomState(1)
    for shift in (0.0, 0.5, -1.2):
        w = (r.randn(64, 32) * 0.2 + shift).astype(np.float32)
        obs = obs_mod.MinMaxObserver()
        obs(torch.tensor(w))
        t_scale, t_zp = obs.calculate_qparams()
        scale, zp = q.observe_tensor(jnp.asarray(w))
        np.testing.assert_allclose(float(scale), float(t_scale), rtol=1e-5)
        assert int(zp) == int(t_zp)


def test_observe_channel_parity_torch():
    """channel observer == PerChannelMinMaxObserver(ch_axis=-1, symmetric),
    the reference's emulate_int8_channel observer (scalar/ops.py:33-43)."""
    torch = pytest.importorskip("torch")
    obs_mod = pytest.importorskip("torch.ao.quantization.observer")
    r = np.random.RandomState(2)
    w = (r.randn(16, 24) * np.linspace(0.1, 2.0, 24)).astype(np.float32)
    obs = obs_mod.PerChannelMinMaxObserver(
        ch_axis=-1, qscheme=torch.per_channel_symmetric)
    obs(torch.tensor(w))
    t_scale, t_zp = obs.calculate_qparams()
    scale, zp = q.observe_channel(jnp.asarray(w), axis=-1)
    np.testing.assert_allclose(np.asarray(scale).reshape(-1),
                               t_scale.numpy(), rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(zp).reshape(-1).astype(np.int64), t_zp.numpy())


def test_histogram_observer_objective():
    """The native clip-search observer's quantization MSE is never worse
    than plain minmax (the property torch's HistogramObserver buys)."""
    r = np.random.RandomState(3)
    # heavy-tailed weights: clipping should win at low bit width (at 8 bits
    # the 4096-sample minmax range is already ~optimal, so the searched
    # observer correctly falls back to it — asserted by the <= check)
    w = jnp.asarray((r.randn(4096) ** 3 * 0.1).astype(np.float32))
    for bits in (4, 8):
        s_t, z_t = q.observe_tensor(w, bits)
        s_h, z_h = q.observe_histogram(w, bits)
        mse_t = float(jnp.mean(
            (q.scalar_quantize(w, s_t, z_t, bits) - w) ** 2))
        mse_h = float(jnp.mean(
            (q.scalar_quantize(w, s_h, z_h, bits) - w) ** 2))
        assert mse_h <= mse_t + 1e-12
        if bits == 4:
            assert mse_h < mse_t * 0.8  # clipping strictly wins


def test_scalar_qat_weight_semantics():
    """IntLinear weight path (scalar/modules/qlinear.py:69-103): at p=1 the
    weight is exactly the fake-quantized weight; at 0<p<1 each element is
    either quantized or clamped-original; gradients flow (STE)."""
    r = np.random.RandomState(4)
    w = jnp.asarray(r.randn(32, 16).astype(np.float32) * 0.1)
    full = q.scalar_qat_weight(jax.random.PRNGKey(0), w, 1.0, method="tensor")
    scale, zp = q.observe_tensor(w)
    # the clamp+noise composition (qlinear.py:92-99) deviates from the pure
    # quantize by <= scale/2 at the range extremes (zero-point rounding) —
    # in the reference too
    np.testing.assert_allclose(np.asarray(full),
                               np.asarray(q.scalar_quantize(w, scale, zp)),
                               atol=float(scale) / 2 + 1e-6)
    part = q.scalar_qat_weight(jax.random.PRNGKey(1), w, 0.5, method="tensor")
    qw = np.asarray(q.scalar_quantize(w, scale, zp))
    wn = np.asarray(w)
    pn = np.asarray(part)
    # interior elements (the clamp is a no-op there) are exactly either
    # quantized or untouched, per the Bernoulli mask
    lo = float(-scale * zp) + float(scale)
    hi = float(scale * (255 - zp)) - float(scale)
    interior = (wn > lo) & (wn < hi)
    is_q = np.isclose(pn, qw, atol=1e-7)
    is_w = np.isclose(pn, wn, atol=1e-7)
    assert np.all((is_q | is_w)[interior])
    assert 0.2 < is_q[interior].mean() < 0.8  # ~half got noise

    # STE: d/dw sum(qat(w)) == 1 on the unclamped elements
    g = jax.grad(lambda x: q.scalar_qat_weight(
        jax.random.PRNGKey(0), x, 1.0, method="tensor").sum())(w)
    assert float(jnp.abs(g).max()) <= 1.0 + 1e-6
    assert float(jnp.abs(g).mean()) > 0.5


def test_scalar_qat_activation_modes():
    """qact.py semantics: train (p=0) == clamp only; eval == fully
    fake-quantized, both with gradient passthrough."""
    r = np.random.RandomState(5)
    y = jnp.asarray(r.randn(128).astype(np.float32))
    tr = q.scalar_qat_activation(y, train=True, method="tensor")
    scale_t, zp_t = q.observe_tensor(jnp.clip(y, -5, 5))
    lo = float(-scale_t * zp_t)
    hi = float(scale_t * (255 - zp_t))
    np.testing.assert_allclose(np.asarray(tr),
                               np.clip(np.asarray(y), lo, hi), atol=1e-6)
    ev = np.asarray(q.scalar_qat_activation(y, train=False, method="tensor"))
    scale, zp = q.observe_tensor(jnp.clip(y, -5, 5))
    np.testing.assert_allclose(
        ev, np.asarray(q.scalar_quantize(y, scale, zp)), atol=1e-6)


# ---------------------------------------------------------------------------
# quant_noise
# ---------------------------------------------------------------------------

def test_quant_noise_block_semantics():
    """quant_noise.py:58-105 spec: whole blocks of size block_size along
    in_features are zeroed with prob p; survivors scale by 1/(1-p)."""
    r = np.random.RandomState(6)
    w = jnp.asarray(r.randn(24, 10).astype(np.float32))  # ours: (in, out)
    p, bs = 0.4, 8
    out = np.asarray(q.quant_noise_weight(jax.random.PRNGKey(0), w, p, bs))
    wn = np.asarray(w)
    blocks = out.reshape(3, bs, 10)
    src = wn.reshape(3, bs, 10) / (1 - p)
    for b in range(3):
        for o in range(10):
            col_o, col_s = blocks[b, :, o], src[b, :, o]
            assert (np.allclose(col_o, 0.0)
                    or np.allclose(col_o, col_s, rtol=1e-6))
    # unbiased in expectation (per-element 4-sigma bound on the mean of
    # 200 draws: var = w^2 p/(1-p))
    keys = [jax.random.PRNGKey(i) for i in range(200)]
    acc = np.mean([np.asarray(q.quant_noise_weight(k, w, p, bs))
                   for k in keys], axis=0)
    tol = 4.0 * np.abs(wn) * np.sqrt(p / (1 - p) / 200) + 1e-3
    assert np.all(np.abs(acc - wn) <= tol)
    # p=0 is the identity (module not wrapped in the reference)
    assert q.quant_noise_weight(jax.random.PRNGKey(0), w, 0.0, bs) is w


# ---------------------------------------------------------------------------
# PQ: EM parity vs the reference's own implementation
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not reference_available(), reason="no /root/reference")
def test_pq_em_parity_reference():
    """Same weight + same initial centroids -> identical assignments and
    matching centroids/objective through 8 EM iterations vs the reference
    PQ class (pq/{em,pq}.py) running its own torch code."""
    load_reference()
    import torch
    from fairseq.modules.quantization.pq.pq import PQ

    r = np.random.RandomState(7)
    out_f, in_f, bs, K = 12, 16, 4, 6
    w = r.randn(out_f, in_f).astype(np.float32)
    n_cols = (in_f // bs) * out_f
    init = w.T.reshape(-1, bs)[r.choice(n_cols, K, replace=False)].copy()

    ref = PQ(torch.tensor(w), block_size=bs, n_centroids=K, n_iter=8,
             verbose=False)
    ref.centroids = torch.tensor(init)
    for i in range(8):
        ref.step(i)

    cent, assign, obj = q.pq_em_encode(
        jax.random.PRNGKey(0), w, bs, n_centroids=K, n_iter=8,
        init_centroids=init)
    np.testing.assert_array_equal(assign.reshape(-1),
                                  ref.assignments.numpy())
    np.testing.assert_allclose(cent, ref.centroids.numpy(), atol=1e-5)
    np.testing.assert_allclose(obj[-1], ref.objective[-1], rtol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="no /root/reference")
def test_pq_linear_forward_parity_reference():
    """Our linear() over a {"centroids","assignments","b"} subtree ==
    the reference PQLinear forward (pq/modules/qlinear.py) on the same
    centroids/assignments."""
    load_reference()
    import torch
    from fairseq.modules.quantization.pq.modules import PQLinear

    from s2st_tpu.nn.core import linear

    r = np.random.RandomState(8)
    out_f, in_f, bs, K = 10, 12, 4, 5
    cent = r.randn(K, bs).astype(np.float32)
    assign_flat = r.randint(0, K, (in_f // bs) * out_f).astype(np.int64)
    bias = r.randn(out_f).astype(np.float32)
    x = r.randn(3, in_f).astype(np.float32)

    ref = PQLinear(torch.tensor(cent), torch.tensor(assign_flat),
                   torch.tensor(bias), in_f, out_f)
    ref_y = ref(torch.tensor(x)).detach().numpy()

    p = {"centroids": jnp.asarray(cent),
         "assignments": jnp.asarray(assign_flat.reshape(-1, out_f)
                                    .astype(np.int32)),
         "b": jnp.asarray(bias)}
    ours = np.asarray(linear(p, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_y, atol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="no /root/reference")
def test_pq_embedding_forward_parity_reference():
    load_reference()
    import torch
    from fairseq.modules.quantization.pq.modules import PQEmbedding

    from s2st_tpu.nn.core import embedding

    r = np.random.RandomState(9)
    num, dim, bs, K = 20, 8, 4, 7
    cent = r.randn(K, bs).astype(np.float32)
    assign_flat = r.randint(0, K, (dim // bs) * num).astype(np.int64)
    ids = r.randint(0, num, (5, 6))

    ref = PQEmbedding(torch.tensor(cent), torch.tensor(assign_flat),
                      num, dim)
    ref_y = ref(torch.tensor(ids)).detach().numpy()
    p = {"centroids": jnp.asarray(cent),
         "assignments": jnp.asarray(assign_flat.reshape(-1, num)
                                    .astype(np.int32))}
    ours = np.asarray(embedding(p, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref_y, atol=1e-6)


def test_pq_objective_decreases_and_reconstructs():
    r = np.random.RandomState(10)
    w = r.randn(32, 64).astype(np.float32)
    cent, assign, obj = q.pq_em_encode(jax.random.PRNGKey(1), w, 8,
                                       n_centroids=16, n_iter=10)
    assert all(b <= a + 1e-4 for a, b in zip(obj, obj[1:]))
    w_hat = np.asarray(q.pq_decode(jnp.asarray(cent), jnp.asarray(assign)))
    assert w_hat.shape == w.shape
    base = np.linalg.norm(w - w.mean())
    assert np.linalg.norm(w - w_hat) < base  # better than a constant


# ---------------------------------------------------------------------------
# the Quantizer driver over a real model tree
# ---------------------------------------------------------------------------

def _tiny_text_params():
    from s2st_tpu.models import transformer_text as tt
    cfg = tt.TransformerTextConfig(
        src_vocab_size=32, tgt_vocab_size=32, encoder_layers=2,
        decoder_layers=2, encoder_embed_dim=16, decoder_embed_dim=16,
        encoder_ffn_embed_dim=32, decoder_ffn_embed_dim=32,
        encoder_attention_heads=2, decoder_attention_heads=2, dropout=0.0)
    variables = tt.init_transformer(jax.random.PRNGKey(0), cfg)
    return cfg, variables


def test_get_layers_matching():
    """get_layers resolves the reference's default config regexps against
    our param tree through the fairseq-style name mapping."""
    from s2st_tpu.train import quantization as tq
    _, variables = _tiny_text_params()
    params = variables["params"]
    fc = tq.get_layers(params, "decoder\\.layers\\.\\d+\\.fc[12]")
    assert len(fc) == 4  # 2 layers x fc1/fc2
    attn = tq.get_layers(
        params,
        "decoder\\.layers\\.\\d+\\.self_attn\\.(k_proj|v_proj|q_proj|out_proj)")
    assert len(attn) == 8
    emb = tq.get_layers(params, "decoder\\.embed_tokens")
    assert len(emb) == 1 and emb[0][-1] == "embed"


def test_quantizer_stages_and_grads(tmp_path):
    """PQQuantizer.step() rewrites matched subtrees; the trainer then takes
    one update where centroids move and assignments don't (iPQ centroid
    finetuning, pq/utils.py:34-37 'ready for the finetuning of the
    centroids in a standard training loop')."""
    import optax

    from s2st_tpu.train import quantization as tq
    from s2st_tpu.train.trainer import (create_train_state, merge_params,
                                        partition_params)

    cfg, variables = _tiny_text_params()
    cfgy = tmp_path / "quant.yaml"
    cfgy.write_text(
        "n_centroids:\n"
        "  Linear: {key: in_features, value: {'*': 8}}\n"
        "  Embedding: {key: embedding_dim, value: {'*': 8}}\n"
        "block_sizes:\n"
        "  Linear: {key: fuzzy_name, value: {fc: 8, attn: 4, emb: 4, '*': 4}}\n"
        "  Embedding: {key: fuzzy_name, value: {emb: 4, '*': 4}}\n"
        "layers_to_quantize:\n"
        "  - decoder\\.layers\\.\\d+\\.fc[12]\n"
        "  - decoder\\.layers\\.\\d+\\.self_attn\\.(k_proj|v_proj|q_proj|out_proj)\n")
    quant = tq.PQQuantizer(str(cfgy), max_epoch=2, n_iter=3)

    params = variables["params"]
    params, changed = quant.begin_epoch(1, params)
    assert changed and quant.quantization_step == 1
    sub = params["decoder"]["layer0"]["fc1"]
    assert "centroids" in sub and "assignments" in sub and "w" not in sub
    assert sub["assignments"].dtype == jnp.int32
    # stage 2 at epoch 2 (epoch_schedule == 1)
    params, changed = quant.begin_epoch(2, params)
    assert changed and "centroids" in params["decoder"]["layer0"]["self_attn"]["q"]

    # forward+grad through the quantized tree: loss differentiates
    # centroids, skips assignments
    from s2st_tpu.models import transformer_text as tt
    batch_src = jnp.ones((2, 5), jnp.int32) + 2
    prev = jnp.ones((2, 4), jnp.int32) + 3

    def loss(diff, nondiff):
        p = merge_params(diff, nondiff)
        out = tt.forward({"params": p}, cfg,
                         {"src_tokens": batch_src,
                          "prev_output_tokens": prev},
                         deterministic=True)
        return jnp.sum(out["logits"].astype(jnp.float32) ** 2)

    diff, nondiff = partition_params(params)
    grads = jax.grad(loss)(diff, nondiff)
    gc = grads["decoder"]["layer0"]["fc1"]["centroids"]
    assert float(jnp.abs(gc).sum()) > 0
    assert grads["decoder"]["layer0"]["fc1"].get("assignments") is None

    # the TrainState machinery accepts the mixed tree
    state = create_train_state({"params": params, "stats": {}},
                               optax.adam(1e-3))
    leaves = jax.tree_util.tree_leaves(state.opt_state)
    assert all(jnp.issubdtype(l.dtype, jnp.floating) or l.ndim == 0
               for l in leaves)


# ---------------------------------------------------------------------------
# CLI e2e
# ---------------------------------------------------------------------------

def _make_corpus(d, seed=0):
    random.seed(seed)
    for split, n in (("train", 60), ("valid", 12), ("test", 6)):
        with open(f"{d}/{split}.src", "w") as fs, \
                open(f"{d}/{split}.tgt", "w") as ft:
            for _ in range(n):
                L = random.randint(3, 7)
                idx = [random.randrange(10) for _ in range(L)]
                fs.write(" ".join(f"s{i}" for i in idx) + "\n")
                ft.write(" ".join(f"t{i}" for i in reversed(idx)) + "\n")


def _binarize(d):
    from s2st_tpu.cli.preprocess import main as pp
    bin_dir = f"{d}/bin"
    assert pp(["--source-lang", "src", "--target-lang", "tgt",
               "--trainpref", f"{d}/train", "--validpref", f"{d}/valid",
               "--testpref", f"{d}/test", "--destdir", bin_dir,
               "--workers", "1"]) == 0
    return bin_dir


_TRAIN_COMMON = [
    "--task", "translation", "--arch", "transformer_tiny",
    "--criterion", "label_smoothed_cross_entropy",
    "--label-smoothing", "0.1", "--optimizer", "adam", "--lr", "0.003",
    "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
    "--max-tokens", "400", "--log-interval", "2", "--seed", "3",
    "--no-epoch-checkpoints", "--disable-validation",
]


def test_ipq_cli_e2e(tmp_path):
    """--quantization-config-path: stage-scheduled iPQ through the train
    CLI — quantized checkpoints round-trip through resume (the n_iter=0
    template fast-forward) and keep training."""
    d = str(tmp_path)
    _make_corpus(d)
    bin_dir = _binarize(d)
    cfgy = tmp_path / "quant.yaml"
    cfgy.write_text(
        "layers_to_quantize:\n"
        "  - decoder\\.layers\\.\\d+\\.fc[12]\n"
        "  - decoder\\.layers\\.\\d+\\.self_attn\\.(k_proj|v_proj|q_proj|out_proj)\n")

    from s2st_tpu.cli.train import main as train_main
    args = _TRAIN_COMMON + [
        bin_dir, "--save-dir", f"{d}/ckpt",
        "--quantization-config-path", str(cfgy),
        "--max-epoch", "2", "--save-interval-updates", "3"]
    assert train_main(args) == 0
    assert os.path.exists(f"{d}/ckpt/checkpoint_last.npz")

    # the saved checkpoint holds quantized subtrees
    with np.load(f"{d}/ckpt/checkpoint_last.npz") as z:
        keys = list(z.files)
    assert any("centroids" in k for k in keys)
    assert any("assignments" in k for k in keys)

    # resume onto the quantized structure and train one more epoch
    args2 = _TRAIN_COMMON + [
        bin_dir, "--save-dir", f"{d}/ckpt",
        "--quantization-config-path", str(cfgy),
        "--max-epoch", "4"]
    # schedule asserts max_epoch % n_groups == 0 -> 4 works for 2 groups
    assert train_main(args2) == 0

    # eval CLIs load the quantized structure without the config (the
    # restore template self-adapts from the checkpoint's centroids keys)
    from s2st_tpu.cli.generate import main as gen_main
    assert gen_main([
        bin_dir, "--task", "translation", "--arch", "transformer_tiny",
        "--path", f"{d}/ckpt/checkpoint_last.npz", "--gen-subset", "test",
        "--beam", "2", "--max-tokens", "400", "--max-len-b", "12",
        "--scoring", "sacrebleu"]) == 0


def test_quant_noise_cli_e2e(tmp_path):
    d = str(tmp_path)
    _make_corpus(d)
    bin_dir = _binarize(d)
    from s2st_tpu.cli.train import main as train_main
    assert train_main(_TRAIN_COMMON + [
        bin_dir, "--save-dir", f"{d}/ckpt",
        "--quant-noise-pq", "0.2", "--quant-noise-pq-block-size", "8",
        "--max-epoch", "1"]) == 0
    assert os.path.exists(f"{d}/ckpt/checkpoint_last.npz")


def test_scalar_qat_cli_e2e(tmp_path):
    d = str(tmp_path)
    _make_corpus(d)
    bin_dir = _binarize(d)
    from s2st_tpu.cli.train import main as train_main
    assert train_main(_TRAIN_COMMON + [
        bin_dir, "--save-dir", f"{d}/ckpt",
        "--quant-noise-scalar", "0.5",
        "--max-epoch", "1"]) == 0
    assert os.path.exists(f"{d}/ckpt/checkpoint_last.npz")

    # eval decodes the fully int8-quantized network (weights + activation
    # hooks), like the reference rebuilding the Int model from ckpt args
    from s2st_tpu.cli.generate import main as gen_main
    assert gen_main([
        bin_dir, "--task", "translation", "--arch", "transformer_tiny",
        "--quant-noise-scalar", "0.5",
        "--path", f"{d}/ckpt/checkpoint_last.npz", "--gen-subset", "test",
        "--beam", "2", "--max-tokens", "400", "--max-len-b", "12",
        "--scoring", "sacrebleu"]) == 0
    # the activation-quant hook must not leak past the CLI
    from s2st_tpu.nn import core
    assert core._ACT_QUANT[0] is None


def test_quant_noise_extra_proj_module():
    """--quant-noise-pq > 0 adds the reference's extra embedding-path
    projection on both sides (transformer_encoder.py:82-88,
    transformer_decoder.py:82-89); the decoder-side fold into the embedding
    view equals gather-then-project."""
    from s2st_tpu.models import transformer_text as tt
    cfg = tt.TransformerTextConfig(
        src_vocab_size=16, tgt_vocab_size=16, encoder_layers=1,
        decoder_layers=1, encoder_embed_dim=8, decoder_embed_dim=8,
        encoder_ffn_embed_dim=16, decoder_ffn_embed_dim=16,
        encoder_attention_heads=2, decoder_attention_heads=2,
        dropout=0.0, quant_noise_pq=0.1)
    v = tt.init_transformer(jax.random.PRNGKey(0), cfg)
    assert "quant_noise_proj" in v["params"]["encoder"]
    assert "quant_noise_proj" in v["params"]["decoder"]

    dec = tt.decoder_view(v["params"], cfg)
    raw = np.asarray(v["params"]["decoder"]["embed"]["w"])
    qn = np.asarray(v["params"]["decoder"]["quant_noise_proj"]["w"])
    np.testing.assert_allclose(np.asarray(dec["embed"]["w"]), raw @ qn,
                               atol=1e-5)
    # tied output projection stays on the RAW table
    cfg_tied = cfg.replace(share_decoder_input_output_embed=True)
    v2 = tt.init_transformer(jax.random.PRNGKey(1), cfg_tied)
    dec2 = tt.decoder_view(v2["params"], cfg_tied)
    np.testing.assert_allclose(
        np.asarray(dec2["out_proj"]["w"]),
        np.asarray(v2["params"]["decoder"]["embed"]["w"]).T, atol=0)

    out = tt.forward(v, cfg, {
        "src_tokens": jnp.full((2, 4), 4, jnp.int32),
        "prev_output_tokens": jnp.full((2, 3), 5, jnp.int32)},
        deterministic=True)
    assert bool(jnp.isfinite(out["logits"]).all())
    # and the QAT tree transform sees the new weights
    from s2st_tpu.train import quantization as tq
    paths = tq._pq_noise_paths(v["params"])
    assert ("encoder", "quant_noise_proj") in paths
    assert ("decoder", "quant_noise_proj") in paths
