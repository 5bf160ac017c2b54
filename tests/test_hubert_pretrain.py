"""HuBERT SSL pretraining: reference-numerics parity + e2e train smoke.

Parity targets (the reference's own code, run in-process):
- HubertModel.forward (fairseq/models/hubert/hubert.py:412-516) with a
  pinned span mask -> per-stream NCE logits, features_pen, padding mask;
- HubertCriterion.forward (fairseq/criterions/hubert_criterion.py:47-135)
  -> total loss / sample_size / per-stream terms;
- weights transferred through models.hubert.load_torch_hubert from a .pt
  the reference code itself produced (untied final_proj included).
"""

import importlib
import os
import tempfile
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

ATOL = 1e-4


def _dictionary(ref, n_total):
    d = ref.Dictionary()
    for i in range(n_total - len(d)):
        d.add_symbol(f"w{i}")
    assert len(d) == n_total
    return d


def _build_pair(untie: bool):
    """Reference HubertModel (tiny) + our params/cfg loaded from its .pt."""
    ref = load_reference()
    hub_mod = importlib.import_module("fairseq.models.hubert.hubert")
    task_mod = importlib.import_module("fairseq.tasks.hubert_pretraining")

    torch.manual_seed(3)
    rcfg = hub_mod.HubertConfig()
    rcfg.label_rate = 1600            # 16000 / (5*2) -> 1 label per frame
    rcfg.conv_feature_layers = "[(8, 10, 5), (16, 3, 2)]"
    rcfg.encoder_layers = 2
    rcfg.encoder_embed_dim = 24
    rcfg.encoder_ffn_embed_dim = 48
    rcfg.encoder_attention_heads = 2
    rcfg.conv_pos = 8
    rcfg.conv_pos_groups = 2
    rcfg.final_dim = 12
    rcfg.logit_temp = 0.1
    rcfg.untie_final_proj = untie
    for f in ("dropout", "attention_dropout", "activation_dropout",
              "encoder_layerdrop", "dropout_input", "dropout_features",
              "mask_prob", "mask_channel_prob"):
        setattr(rcfg, f, 0.0)
    rcfg.feature_grad_mult = 1.0
    tcfg = task_mod.HubertPretrainingConfig()
    tcfg.sample_rate = 16000
    dicts = [_dictionary(ref, 10), _dictionary(ref, 7)]
    model = hub_mod.HubertModel(rcfg, tcfg, dicts)
    model.eval()

    pt = tempfile.mktemp(suffix=".pt")
    torch.save({"model": model.state_dict()}, pt)

    from s2st_tpu.models.hubert import HubertConfig, load_torch_hubert
    ours_cfg = HubertConfig(
        conv_layers=((8, 10, 5), (16, 3, 2)), encoder_layers=2,
        encoder_embed_dim=24, encoder_ffn_embed_dim=48,
        encoder_attention_heads=2, conv_pos=8, conv_pos_groups=2,
        layer_norm_first=False, label_rate=1600, sample_rate=16000,
        final_dim=12, logit_temp=0.1, num_classes=(10, 7),
        untie_final_proj=untie, feature_grad_mult=1.0,
        mask_prob=0.0, dropout=0.0, dropout_input=0.0,
        dropout_features=0.0, activation_dropout=0.0)
    params, _ = load_torch_hubert(pt, cfg=ours_cfg)
    os.unlink(pt)
    return model, params, ours_cfg


def _fixed_batch(T):
    rng = np.random.RandomState(11)
    wav = rng.randn(2, 400).astype(np.float32)
    lens = np.array([400, 310], np.int32)
    tgt = [rng.randint(4, 10, (2, T)).astype(np.int64),
           rng.randint(4, 7, (2, T)).astype(np.int64)]
    mask = np.zeros((2, T), bool)
    mask[0, 3:13] = True
    mask[1, 0:8] = True
    mask[1, 20:26] = True
    return wav, lens, tgt, mask


def _pin_mask(model, mask):
    """Make the reference apply_mask use our pinned span mask."""
    m = torch.from_numpy(mask)

    def apply_mask(self, x, padding_mask, target_list):
        x = x.clone()
        x[m] = self.mask_emb
        return x, m

    model.apply_mask = types.MethodType(apply_mask, model)


@pytest.mark.parametrize("untie", [False, True])
def test_hubert_pretrain_forward_parity(untie):
    """Per-stream NCE logits (masked AND unmasked branches), padding mask
    and features_pen match the reference forward bit-for-policy."""
    import jax.numpy as jnp
    from s2st_tpu.models.hubert import forward_pretrain

    model, params, cfg = _build_pair(untie)
    # T frames for L=400: conv (10,5),(3,2) -> 39
    wav, lens, tgt, mask = _fixed_batch(39)
    _pin_mask(model, mask)
    pad = np.arange(400)[None, :] >= lens[:, None]
    with torch.no_grad():
        net = model(torch.from_numpy(wav),
                    target_list=[torch.from_numpy(t) for t in tgt],
                    padding_mask=torch.from_numpy(pad), mask=True,
                    features_only=False)

    ours = forward_pretrain(params, cfg, wav, lens,
                            [jnp.asarray(t) for t in tgt],
                            mask_indices=jnp.asarray(mask), train=False)
    ref_pad = net["padding_mask"].numpy()
    np.testing.assert_array_equal(np.asarray(ours["padding_mask"]), ref_pad)
    np.testing.assert_allclose(float(ours["features_pen"]),
                               float(net["features_pen"]), atol=ATOL)
    w_m = mask & ~ref_pad
    w_u = ~mask & ~ref_pad
    for i in range(2):
        ref_m = net["logit_m_list"][i].numpy()          # (S_m, 1+V)
        ref_u = net["logit_u_list"][i].numpy()
        ours_full = np.asarray(ours["logits"][i])       # (B, T, 1+V)
        np.testing.assert_allclose(ours_full[w_m], ref_m, atol=ATOL,
                                   err_msg=f"masked stream {i}")
        np.testing.assert_allclose(ours_full[w_u], ref_u, atol=ATOL,
                                   err_msg=f"unmasked stream {i}")


def test_hubert_criterion_parity():
    """Full HubertCriterion loss (masked + unmasked + features_pen) and
    sample_size match the reference criterion on the same batch."""
    import jax
    from s2st_tpu.train.losses import HubertLossConfig, hubert_loss

    load_reference()
    crit_mod = importlib.import_module("fairseq.criterions.hubert_criterion")
    model, params, cfg = _build_pair(False)
    wav, lens, tgt, mask = _fixed_batch(39)
    _pin_mask(model, mask)
    pad = np.arange(400)[None, :] >= lens[:, None]

    crit = crit_mod.HubertCriterion(
        task=types.SimpleNamespace(target_dictionary=None),
        pred_masked_weight=1.0, pred_nomask_weight=0.5,
        loss_weights=[10.0])
    sample = {"id": torch.arange(2),
              "net_input": {"source": torch.from_numpy(wav),
                            "padding_mask": torch.from_numpy(pad),
                            "mask": True},
              "target_list": [torch.from_numpy(t) for t in tgt]}
    with torch.no_grad():
        ref_loss, ref_ss, ref_log = crit(model, sample)

    lcfg = HubertLossConfig(pred_masked_weight=1.0, pred_nomask_weight=0.5,
                            features_pen_weight=10.0)
    batch = {"source": wav, "source_lens": lens, "target_list": tuple(tgt)}
    variables = {"params": params, "stats": {}}
    import functools

    def run(v):
        from s2st_tpu.models import hubert as hub
        net = hub.forward_pretrain(v["params"], cfg, batch["source"],
                                   batch["source_lens"],
                                   list(batch["target_list"]),
                                   mask_indices=np.asarray(mask),
                                   train=False)
        return net
    # drive the criterion with the pinned mask by monkeypatching
    import s2st_tpu.models.hubert as hub
    orig = hub.forward_pretrain
    hub.forward_pretrain = functools.partial(orig, mask_indices=mask)
    try:
        loss, aux = hubert_loss(variables, cfg, lcfg, batch, train=False)
    finally:
        hub.forward_pretrain = orig

    assert abs(float(loss) - float(ref_loss)) <= 1e-2 * max(
        1.0, abs(float(ref_loss))), (float(loss), float(ref_loss))
    assert float(aux["sample_size"]) == float(ref_ss)
    lg = aux["logging"]
    for k in ("loss_m_0", "loss_m_1", "loss_u_0", "loss_u_1"):
        assert abs(float(lg[k]) - float(ref_log[k])) <= 5e-3 * max(
            1.0, abs(float(ref_log[k]))), (k, float(lg[k]),
                                           float(ref_log[k]))
    for br in ("m", "u"):
        for i in range(2):
            assert float(lg[f"correct_{br}_{i}"]) == float(
                ref_log[f"correct_{br}_{i}"]), (br, i)
            assert float(lg[f"count_{br}_{i}"]) == float(
                ref_log[f"count_{br}_{i}"]), (br, i)


def test_hubert_pretrain_cli_e2e(tmp_path):
    """2-epoch HuBERT pretraining through the generic train CLI on a tiny
    on-disk raw-audio + km-label corpus, then resume a 3rd epoch."""
    from s2st_tpu.data.audio_utils import write_wav

    root = tmp_path / "audio"
    root.mkdir()
    rng = np.random.RandomState(0)
    lines = []
    sizes = []
    for i in range(8):
        n = 1200 + 100 * i
        write_wav(str(root / f"u{i}.wav"),
                  (0.1 * rng.randn(n)).astype(np.float32), 16000)
        lines.append(f"u{i}.wav\t{n}")
        sizes.append(n)
    for split in ("train", "dev"):
        (tmp_path / f"{split}.tsv").write_text(
            str(root) + "\n" + "\n".join(lines) + "\n")
    # labels at label_rate = 16000 / (5*2) = 1600 Hz -> ~n // 10 frames
    units = [chr(ord("a") + u) for u in range(8)]
    (tmp_path / "dict.km.txt").write_text(
        "".join(f"{u} 1\n" for u in units))
    for split in ("train", "dev"):
        with open(tmp_path / f"{split}.km", "w") as f:
            for n in sizes:
                f.write(" ".join(rng.choice(units, n // 10)) + "\n")

    from s2st_tpu.cli.train import main as train_main
    args = [
        str(tmp_path), "--task", "hubert_pretraining", "--arch", "hubert",
        "--criterion", "hubert", "--train-subset", "train",
        "--valid-subset", "dev", "--save-dir", str(tmp_path / "ckpt"),
        "--labels", "km", "--label-rate", "1600",
        "--encoder-layers", "2", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--conv-feature-layers", "[(8,10,5),(8,3,2)]",
        "--conv-pos", "8", "--conv-pos-groups", "2",
        "--final-dim", "8", "--mask-prob", "0.65", "--mask-length", "2",
        "--min-sample-size", "600", "--max-sample-size", "1600",
        "--loss-weights", "10", "--pred-nomask-weight", "0.5",
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
