"""wav2vec 2.0 pretraining tests.

Parity oracles run the REFERENCE's own torch code (tests/ref_loader):
GumbelVectorQuantizer forward, Wav2Vec2Model.compute_preds, and
compute_mask_indices statistics. Plus framework-level checks (grads,
anneal-through-stats, loss math vs torch.cross_entropy) and a train-CLI
e2e on a tiny raw-audio corpus.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models.hubert import HubertConfig
from s2st_tpu.models import wav2vec2 as w2v
from s2st_tpu.train.losses import Wav2VecLossConfig, wav2vec_loss

from tests.ref_loader import load_reference, reference_available

TINY = w2v.Wav2Vec2Config(
    trunk=HubertConfig(conv_layers=((16, 10, 5), (16, 3, 2)),
                       encoder_layers=2, encoder_embed_dim=32,
                       encoder_ffn_embed_dim=64, encoder_attention_heads=4,
                       conv_pos=8, conv_pos_groups=2),
    final_dim=16, latent_vars=8, latent_groups=2, num_negatives=5,
    mask_prob=0.5, mask_length=3)


def _batch(b=4, l=1600, seed=0):
    r = np.random.RandomState(seed)
    return {
        "source": jnp.asarray(r.randn(b, l).astype(np.float32)),
        "source_lens": jnp.asarray(
            np.linspace(l, l // 2, b).astype(np.int32)),
    }


# ---------------------------------------------------------------------------
# framework-level
# ---------------------------------------------------------------------------

def test_forward_grads_and_anneal():
    variables = w2v.init_wav2vec2(jax.random.PRNGKey(0), TINY)
    lcfg = Wav2VecLossConfig()
    batch = _batch()

    def lf(p, stats):
        return wav2vec_loss({"params": p, "stats": stats}, TINY, lcfg,
                            batch, rng=jax.random.PRNGKey(1), train=True)

    (loss, extras), grads = jax.jit(
        lambda v: jax.value_and_grad(
            lambda p: lf(p, v["stats"]), has_aux=True)(v["params"])
    )(variables)
    assert np.isfinite(float(loss))
    assert float(extras["sample_size"]) > 0
    # gradients reach every pretraining head
    for path in (("quantizer", "proj", "w"), ("quantizer", "vars"),
                 ("mask_emb",), ("final_proj", "w"), ("project_q", "w")):
        g = grads
        for k in path:
            g = g[k]
        assert float(jnp.sum(jnp.abs(g))) > 0, path
    # feature_grad_mult scales the extractor grad only
    g_ext = float(jnp.sum(jnp.abs(
        grads["trunk"]["extractor"]["conv0"]["w"])))
    assert g_ext > 0
    # update counter advances through stats (anneal state checkpoints)
    assert int(extras["new_stats"]["num_updates"]) == 1
    t0 = float(w2v.current_temp(TINY, jnp.int32(0)))
    t1 = float(w2v.current_temp(TINY, jnp.int32(100000)))
    assert t0 == pytest.approx(2.0) and t1 < t0
    tmin = float(w2v.current_temp(TINY, jnp.int32(10 ** 8)))
    assert tmin == pytest.approx(0.5)


def test_feature_grad_mult_exact():
    """_grad_mult: identity forward, cotangent scaled by c."""
    x = jnp.asarray(np.random.RandomState(0).randn(5).astype(np.float32))
    for c in (0.0, 0.1, 1.0):
        fwd = w2v._grad_mult(x, c)
        np.testing.assert_allclose(np.asarray(fwd), np.asarray(x), atol=0)
        g = jax.grad(lambda z: jnp.sum(w2v._grad_mult(z, c) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), 2 * c * np.asarray(x),
                                   rtol=1e-6)


def test_sample_negatives_never_self():
    y = jnp.asarray(np.arange(2 * 16).reshape(2, 16, 1).astype(np.float32))
    negs = w2v.sample_negatives(jax.random.PRNGKey(0), y, 20)  # (N,B,T,C)
    assert negs.shape == (20, 2, 16, 1)
    # value == time index in this construction; no negative may equal its
    # own anchor index (the reference's bump-over trick)
    vals = np.asarray(negs[..., 0])               # (N, B, T)
    # value = b*16 + t in this construction → within-batch index:
    within = vals - 16 * np.arange(2)[None, :, None]
    t_idx = np.arange(16)[None, None, :]
    assert not np.any(within == t_idx)            # never the anchor itself
    assert within.min() >= 0 and within.max() <= 15  # same-sample only


def test_infonce_matches_torch_cross_entropy():
    """Criterion math vs torch.nn.functional.cross_entropy with target 0
    (wav2vec_criterion.py:67: InfoNCE branch, reduction=sum) on the
    masked frames."""
    torch = pytest.importorskip("torch")
    r = np.random.RandomState(3)
    n, b, t = 6, 2, 10
    logits = r.randn(n, b, t).astype(np.float32)
    w = (r.rand(b, t) > 0.5).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=0)
    ours = float(-jnp.sum(lp[0] * w))
    lt = torch.tensor(logits).permute(1, 2, 0).reshape(-1, n)  # (B*T, N)
    tgt = torch.zeros(b * t, dtype=torch.long)
    per = torch.nn.functional.cross_entropy(lt, tgt, reduction="none")
    ref = float((per * torch.tensor(w).reshape(-1)).sum())
    assert ours == pytest.approx(ref, rel=1e-5)


def test_mask_respects_padding_and_fraction():
    lengths = jnp.asarray([100, 80, 60, 40], jnp.int32)
    fracs = []
    for s in range(30):
        m = np.asarray(w2v.compute_span_mask(
            jax.random.PRNGKey(s), lengths, 100, 0.5, 10))
        # never masks padding
        for i, L in enumerate([100, 80, 60, 40]):
            assert not m[i, L:].any()
        fracs.append(m.sum(1) / np.asarray([100, 80, 60, 40]))
    mean_frac = np.mean(fracs)
    # mask_prob 0.5 with replacement-draw overlap → a bit under 0.5
    assert 0.30 < mean_frac < 0.55


# ---------------------------------------------------------------------------
# reference-code oracles
# ---------------------------------------------------------------------------

needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="reference tree unavailable")


@needs_ref
def test_mask_fraction_matches_reference_statistics():
    """Mean realized mask fraction vs the reference's own
    compute_mask_indices (data_utils.py, static selection, min_masks=2)
    at the same (mask_prob, mask_length)."""
    load_reference()
    from fairseq.data.data_utils import compute_mask_indices
    B, T, prob, L = 8, 120, 0.65, 10
    ref_fracs = []
    np.random.seed(0)
    for _ in range(20):
        mi = compute_mask_indices((B, T), None, prob, L, "static", 0,
                                  min_masks=2)
        ref_fracs.append(mi.mean())
    ours = []
    lengths = jnp.full((B,), T, jnp.int32)
    for s in range(20):
        m = np.asarray(w2v.compute_span_mask(
            jax.random.PRNGKey(s), lengths, T, prob, L))
        ours.append(m.mean())
    # with-replacement starts merge overlapping spans; allow a small gap
    assert abs(np.mean(ours) - np.mean(ref_fracs)) < 0.08, \
        (np.mean(ours), np.mean(ref_fracs))


@needs_ref
def test_gumbel_quantizer_matches_reference_eval_path():
    """Our gumbel_quantize (eval) vs the reference GumbelVectorQuantizer
    (eval mode: hard argmax codes) with IDENTICAL weights: quantized
    output, code/prob perplexity, and targets all agree."""
    load_reference()
    import torch
    from fairseq.modules.gumbel_vector_quantizer import \
        GumbelVectorQuantizer

    dim, V, G, vq_dim = 16, 8, 2, 12
    ref_q = GumbelVectorQuantizer(dim=dim, num_vars=V,
                                  temp=(2.0, 0.5, 0.999995), groups=G,
                                  combine_groups=False, vq_dim=vq_dim,
                                  time_first=True)
    ref_q.eval()
    r = np.random.RandomState(0)
    x = r.randn(3, 7, dim).astype(np.float32)
    with torch.no_grad():
        ref = ref_q(torch.tensor(x), produce_targets=True)

    cfg = w2v.Wav2Vec2Config(latent_vars=V, latent_groups=G,
                             latent_dim=vq_dim, final_dim=vq_dim)
    p = {"proj": {"w": jnp.asarray(
                      ref_q.weight_proj.weight.detach().numpy().T),
                  "b": jnp.asarray(
                      ref_q.weight_proj.bias.detach().numpy())},
         "vars": jnp.asarray(
             ref_q.vars.detach().numpy()[0])}          # (G*V, var_dim)
    ours = w2v.gumbel_quantize(p, cfg, jnp.asarray(x),
                               jnp.float32(2.0), jax.random.PRNGKey(0),
                               train=False)
    np.testing.assert_allclose(np.asarray(ours["x"]),
                               ref["x"].numpy(), atol=1e-5)
    assert float(ours["code_perplexity"]) == pytest.approx(
        float(ref["code_perplexity"]), rel=1e-5)
    assert float(ours["prob_perplexity"]) == pytest.approx(
        float(ref["prob_perplexity"]), rel=1e-5)
    np.testing.assert_array_equal(
        np.asarray(ours["targets"]), ref["targets"].numpy())


@needs_ref
def test_compute_preds_matches_reference():
    """Cosine InfoNCE logits + duplicate-negative fill vs the reference
    Wav2Vec2Model.compute_preds on fixed tensors."""
    load_reference()
    import torch
    from fairseq.models.wav2vec.wav2vec2 import (Wav2Vec2Config,
                                                 Wav2Vec2Model)
    rcfg = Wav2Vec2Config()
    rcfg.conv_feature_layers = "[(8, 10, 5)]"
    rcfg.encoder_layers = 1
    rcfg.encoder_embed_dim = 8
    rcfg.encoder_attention_heads = 2
    rcfg.encoder_ffn_embed_dim = 16
    rcfg.final_dim = 4
    rcfg.conv_pos = 4
    rcfg.conv_pos_groups = 2
    ref_model = Wav2Vec2Model(rcfg)

    r = np.random.RandomState(1)
    n, b, t, c = 3, 2, 5, 4
    x = r.randn(b, t, c).astype(np.float32)
    y = r.randn(b, t, c).astype(np.float32)
    negs = r.randn(n, b, t, c).astype(np.float32)
    negs[1, 0, 2] = y[0, 2]  # force one duplicate positive
    with torch.no_grad():
        ref_logits = ref_model.compute_preds(
            torch.tensor(x), torch.tensor(y), torch.tensor(negs)).numpy()
    cfg = w2v.Wav2Vec2Config(logit_temp=rcfg.logit_temp)
    ours = np.asarray(w2v.compute_preds(
        cfg, jnp.asarray(x), jnp.asarray(y), jnp.asarray(negs)))
    # reference fills duplicates with -inf on CPU; ours uses the XLA
    # branch's -2^30 — normalize both for comparison
    dup = ~np.isfinite(ref_logits) | (ref_logits < -(2.0 ** 29))
    assert (ours < -(2.0 ** 29)).astype(bool).tolist() == dup.tolist()
    np.testing.assert_allclose(np.where(dup, 0, ours),
                               np.where(dup, 0, ref_logits), atol=2e-5)


@needs_ref
def test_torch_import_from_genuine_reference_checkpoint(tmp_path):
    """Build the REFERENCE's Wav2Vec2Model, save a genuine fairseq-format
    .pt, import it with load_torch_wav2vec2, and verify (a) config parse,
    (b) extract_features numerics vs the torch model <=1e-4, (c) the
    quantizer eval path end-to-end on real extractor features."""
    load_reference()
    import torch
    from fairseq.models.wav2vec.wav2vec2 import (Wav2Vec2Config,
                                                 Wav2Vec2Model)
    rcfg = Wav2Vec2Config()
    rcfg.conv_feature_layers = "[(16, 10, 5), (16, 3, 2)]"
    rcfg.encoder_layers = 2
    rcfg.encoder_embed_dim = 32
    rcfg.encoder_attention_heads = 4
    rcfg.encoder_ffn_embed_dim = 64
    rcfg.final_dim = 16
    rcfg.conv_pos = 8
    rcfg.conv_pos_groups = 2
    rcfg.quantize_targets = True
    rcfg.latent_vars = 8
    rcfg.latent_groups = 2
    rcfg.latent_dim = 16
    ref_model = Wav2Vec2Model(rcfg)
    ref_model.eval()
    path = str(tmp_path / "w2v_tiny.pt")
    torch.save({"model": ref_model.state_dict(),
                "cfg": {"model": {
                    "conv_feature_layers": rcfg.conv_feature_layers,
                    "encoder_layers": 2, "encoder_embed_dim": 32,
                    "encoder_attention_heads": 4,
                    "encoder_ffn_embed_dim": 64, "final_dim": 16,
                    "conv_pos": 8, "conv_pos_groups": 2,
                    "quantize_targets": True, "latent_vars": 8,
                    "latent_groups": 2, "latent_dim": 16,
                    "latent_temp": "(2.0, 0.5, 0.999995)"}}}, path)

    variables, cfg = w2v.load_torch_wav2vec2(path)
    assert cfg.latent_vars == 8 and cfg.trunk.encoder_layers == 2
    assert cfg.quantize_targets and cfg.var_dim == 8

    r = np.random.RandomState(0)
    src = r.randn(2, 800).astype(np.float32)
    lens = np.asarray([800, 800], np.int32)
    with torch.no_grad():
        ref_out = ref_model.extract_features(torch.tensor(src), None,
                                             mask=False)["x"].numpy()
    ours, _ = w2v.extract_features(variables["params"], cfg,
                                   jnp.asarray(src), jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-4)

    # quantizer on the real (layer-normed) extractor features
    with torch.no_grad():
        feats_t = ref_model.feature_extractor(
            torch.tensor(src)).transpose(1, 2)
        feats_t = ref_model.layer_norm(feats_t)
        ref_q = ref_model.quantizer(feats_t, produce_targets=True)
    from s2st_tpu.models.hubert import _extractor
    from s2st_tpu.nn.core import layer_norm
    feats = _extractor(variables["params"]["trunk"]["extractor"], cfg.trunk,
                       jnp.asarray(src))
    feats = layer_norm(variables["params"]["trunk"]["feat_ln"], feats)
    ours_q = w2v.gumbel_quantize(variables["params"]["quantizer"], cfg,
                                 feats, jnp.float32(2.0),
                                 jax.random.PRNGKey(0), train=False)
    np.testing.assert_array_equal(np.asarray(ours_q["targets"]),
                                  ref_q["targets"].numpy())
    np.testing.assert_allclose(np.asarray(ours_q["x"]),
                               ref_q["x"].numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# CLI e2e
# ---------------------------------------------------------------------------

def test_train_cli_e2e(tmp_path):
    """2-epoch wav2vec2 pretraining run through the generic train CLI on a
    tiny on-disk raw-audio corpus, then resume for a 3rd epoch."""
    from s2st_tpu.data.audio_utils import write_wav
    root = tmp_path / "audio"
    root.mkdir()
    r = np.random.RandomState(0)
    lines = []
    for i in range(8):
        n = 1200 + 100 * i
        write_wav(str(root / f"u{i}.wav"),
                  (0.1 * r.randn(n)).astype(np.float32), 16000)
        lines.append(f"u{i}.wav\t{n}")
    for split in ("train", "dev"):
        (tmp_path / f"{split}.tsv").write_text(
            str(root) + "\n" + "\n".join(lines) + "\n")

    from s2st_tpu.cli.train import main as train_main
    args = [
        str(tmp_path), "--task", "audio_pretraining", "--arch", "wav2vec2",
        "--criterion", "wav2vec", "--train-subset", "train",
        "--valid-subset", "dev", "--save-dir", str(tmp_path / "ckpt"),
        "--encoder-layers", "2", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--conv-feature-layers", "[(8,10,5),(8,3,2)]",
        "--final-dim", "8", "--latent-vars", "6", "--latent-groups", "2",
        "--latent-dim", "8", "--num-negatives", "3",
        "--mask-prob", "0.65", "--mask-length", "2",
        "--min-sample-size", "600", "--max-sample-size", "1600",
        "--quantize-targets", "--infonce", "--loss-weights", "0.1,10",
        "--max-tokens", "8000", "--max-epoch", "2",
        "--optimizer", "adam", "--lr", "0.0005",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
        "--clip-norm", "1.0", "--seed", "1", "--log-interval", "1",
        "--required-batch-size-multiple", "1",
    ]
    assert train_main(args) == 0
    assert (tmp_path / "ckpt" / "checkpoint_last.npz").is_file()
    # resume one more epoch
    i = args.index("--max-epoch")
    args[i + 1] = "3"
    assert train_main(args) == 0
