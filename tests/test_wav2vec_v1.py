"""wav2vec v1 (CPC) parity vs the reference's own Wav2VecModel.

The negative draws are replayed exactly: torch.randint is monkeypatched
onto a numpy stream during the reference forward, and the same raw draws
(with the reference's >=-self shift + row offsets) are fed to our
``cpc_predictions`` as precomputed ``neg_idxs``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

ATOL = 1e-4

FEAT = "[(8, 3, 2), (8, 3, 2)]"
AGG = "[(8, 3, 1), (12, 2, 1)]"


def _build_ref(infonce: bool, balanced: bool):
    ref = load_reference()
    from fairseq.models.wav2vec.wav2vec import Wav2VecConfig, Wav2VecModel
    cfg = Wav2VecConfig()
    cfg.prediction_steps = 3
    cfg.sample_distance = None
    cfg.num_negatives = 2
    cfg.conv_feature_layers = FEAT
    cfg.conv_aggregator_layers = AGG
    cfg.dropout = 0.0
    cfg.dropout_features = 0.0
    cfg.dropout_agg = 0.0
    cfg.aggregator = "cnn"
    cfg.gru_dim = 8
    cfg.no_conv_bias = False
    cfg.agg_zero_pad = False
    cfg.skip_connections_feat = True
    cfg.skip_connections_agg = True
    cfg.residual_scale = 0.5
    cfg.log_compression = True
    cfg.balanced_classes = balanced
    cfg.project_features = "none"
    cfg.non_affine_group_norm = False
    cfg.offset = "auto"
    cfg.activation = "relu"
    cfg.vq_type = "none"
    cfg.infonce = infonce
    torch.manual_seed(0)
    model = Wav2VecModel(cfg)
    model.eval()
    return model, cfg


def _import(model):
    import jax
    import jax.numpy as jnp
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    feat, agg = {}, {}
    for i in range(2):
        feat[f"conv{i}"] = {"w": np.transpose(
            sd.pop(f"feature_extractor.conv_layers.{i}.0.weight"),
            (2, 1, 0)).copy()}
        feat[f"gn{i}"] = {
            "scale": sd.pop(f"feature_extractor.conv_layers.{i}.2.weight"),
            "bias": sd.pop(f"feature_extractor.conv_layers.{i}.2.bias")}
    for i in range(2):
        agg[f"conv{i}"] = {
            "w": np.transpose(
                sd.pop(f"feature_aggregator.conv_layers.{i}.1.weight"),
                (2, 1, 0)).copy(),
            "b": sd.pop(f"feature_aggregator.conv_layers.{i}.1.bias")}
        agg[f"gn{i}"] = {
            "scale": sd.pop(f"feature_aggregator.conv_layers.{i}.3.weight"),
            "bias": sd.pop(f"feature_aggregator.conv_layers.{i}.3.bias")}
        rk = f"feature_aggregator.residual_proj.{i}.weight"
        if rk in sd:
            agg[f"rproj{i}"] = {"w": np.transpose(sd.pop(rk),
                                                  (2, 1, 0)).copy()}
    # ConvTranspose2d weight (in, out, 1, steps) -> (in, out, steps)
    pred = {"w": sd.pop("wav2vec_predictions.project_to_steps.weight")[
        :, :, 0, :].copy(),
        "b": sd.pop("wav2vec_predictions.project_to_steps.bias")}
    assert not sd, f"unmapped: {list(sd)}"
    return jax.tree_util.tree_map(
        jnp.asarray, {"params": {"feature_extractor": feat,
                                 "aggregator": agg, "predictions": pred},
                      "stats": {}})


@pytest.mark.parametrize("infonce,balanced",
                         [(False, False), (False, True), (True, False)])
def test_wav2vec_v1_forward_parity(infonce, balanced):
    model, rcfg = _build_ref(infonce, balanced)
    import jax.numpy as jnp

    from s2st_tpu.models import wav2vec_v1 as w1
    variables = _import(model)
    cfg = w1.Wav2VecV1Config(
        conv_feature_layers=((8, 3, 2), (8, 3, 2)),
        conv_aggregator_layers=((8, 3, 1), (12, 2, 1)),
        dropout=0.0, dropout_features=0.0, dropout_agg=0.0,
        log_compression=True, skip_connections_feat=True,
        skip_connections_agg=True, residual_scale=0.5,
        prediction_steps=3, num_negatives=2,
        balanced_classes=balanced, infonce=infonce)

    r = np.random.RandomState(0)
    b, L = 2, 64
    src = (0.5 * r.randn(b, L)).astype(np.float32)

    # replay the reference's randint draws on a shared numpy stream
    draws = []
    orig_randint = torch.randint

    def fake_randint(low=0, high=None, size=None, **kw):
        if high is None:
            low, high = 0, low
        arr = r.randint(low, high, size=tuple(size))
        draws.append(arr)
        return torch.from_numpy(arr.astype(np.int64))

    torch.randint = fake_randint
    try:
        with torch.no_grad():
            out_ref = model(torch.from_numpy(src))
    finally:
        torch.randint = orig_randint

    # draws[0] is discarded by the reference; draws[1] is the used one
    raw = draws[1]
    bsz, ncols = raw.shape
    n = 2
    tsz = ncols // n
    tszs = np.repeat(np.arange(tsz), n)[None, :]
    neg = raw.copy()
    neg[neg >= tszs] += 1
    high = tsz
    for i in range(1, bsz):
        neg[i] += i * high

    out = w1.forward(variables, cfg, {"source": src},
                     deterministic=True, neg_idxs=jnp.asarray(neg))
    np.testing.assert_allclose(np.asarray(out["cpc_logits"]),
                               out_ref["cpc_logits"].numpy().reshape(
                                   np.asarray(out["cpc_logits"]).shape),
                               atol=ATOL)
    tgt_ref = out_ref["cpc_targets"]
    if isinstance(tgt_ref, tuple):
        tgt, w = tgt_ref
        np.testing.assert_array_equal(np.asarray(out["cpc_targets"]),
                                      tgt.numpy())
        np.testing.assert_allclose(np.asarray(out["cpc_weights"]),
                                   w.numpy(), atol=1e-6)
    elif not infonce:
        np.testing.assert_array_equal(np.asarray(out["cpc_targets"]),
                                      tgt_ref.numpy())


def test_wav2vec_v1_cli_e2e(tmp_path):
    """1-epoch wav2vec v1 CPC pretraining through the train CLI."""
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
    assert train_main([
        str(tmp_path), "--task", "audio_pretraining", "--arch", "wav2vec",
        "--criterion", "wav2vec", "--train-subset", "train",
        "--valid-subset", "dev", "--save-dir", str(tmp_path / "ckpt"),
        "--conv-feature-layers", "[(8,10,5),(8,8,4)]",
        "--conv-aggregator-layers", "[(8,3,1),(8,3,1)]",
        "--prediction-steps", "3", "--num-negatives", "2",
        "--min-sample-size", "600", "--max-sample-size", "1600",
        "--max-tokens", "8000", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.0005",
        "--clip-norm", "1.0", "--seed", "1", "--log-interval", "1",
        "--required-batch-size-multiple", "1",
    ]) == 0
    from s2st_tpu.train.checkpoint import load_checkpoint_file
    _, meta = load_checkpoint_file(
        str(tmp_path / "ckpt" / "checkpoint_last.npz"))
    assert meta["step"] >= 1


def test_kmeans_vq_parity():
    """kmeans_vq matches the reference KmeansVectorQuantizer: quantized
    output, kmeans loss, code perplexity (imported weights)."""
    load_reference()
    from fairseq.modules import KmeansVectorQuantizer

    torch.manual_seed(0)
    dim, groups, n_vars, vq_dim = 8, 2, 6, 8
    ref = KmeansVectorQuantizer(dim=dim, num_vars=n_vars, groups=groups,
                                combine_groups=False, vq_dim=vq_dim,
                                time_first=False, gamma=0.25)
    ref.eval()
    import jax.numpy as jnp

    from s2st_tpu.models import wav2vec_v1 as w1
    sd = {k: v.detach().float().numpy() for k, v in ref.state_dict().items()}
    # grouped Conv1d weight (dim, dim/groups, 1) -> (G, Cg, Cg) per-group
    wconv = sd.pop("projection.0.weight")[:, :, 0]
    cg = dim // groups
    wg = np.stack([wconv[g * cg:(g + 1) * cg, :].T for g in range(groups)])
    p = {"embedding": jnp.asarray(sd.pop("embedding")),
         "proj": {"w": jnp.asarray(wg)},
         "gn": {"scale": jnp.asarray(sd.pop("projection.1.weight")),
                "bias": jnp.asarray(sd.pop("projection.1.bias"))}}
    assert not sd, list(sd)
    cfg = w1.Wav2VecV1Config(vq_type="kmeans", vq_vars=n_vars,
                             vq_groups=groups, vq_dim=vq_dim,
                             vq_gamma=0.25,
                             conv_feature_layers=((dim, 3, 2),))

    r = np.random.RandomState(0)
    x = r.randn(2, dim, 9).astype(np.float32)   # B x C x T (ref layout)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x))
    got, kloss, ppl = w1.kmeans_vq(p, cfg,
                                   jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1),
                               out_ref["x"].numpy(), atol=1e-5)
    np.testing.assert_allclose(float(kloss),
                               float(out_ref["kmeans_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(ppl),
                               float(out_ref["code_perplexity"]),
                               rtol=1e-5)
