"""CTC ASR fine-tuning: reference parity + e2e fine-tune smoke.

Parity strategy: Wav2VecEncoder.forward (wav2vec2_asr.py:389-416) in eval
mode is exactly ``trunk.extract_features -> final_dropout -> proj``; we run
the reference's own HubertModel.extract_features composed with the
reference checkpoint's proj weights as the oracle (the omegaconf-heavy
Wav2VecEncoder constructor is bypassed, its forward math is not). CTC loss
parity runs torch.nn.functional.ctc_loss (what CtcCriterion calls) against
our optax path on identical logits; greedy decode parity runs the
reference's exact torch ops (argmax -> unique_consecutive -> != blank,
ctc.py:196-198); UER/WER counters are checked against a plain-python
editdistance.eval-semantics DP + post_process("letter") word splitting
(ctc.py:200-218).
"""

import importlib
import os
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

ATOL = 1e-4


def _tiny_pair(vocab=9):
    """Reference HubertModel trunk + torch proj; our CtcAsrConfig/params
    imported from a .pt in the fine-tuned (w2v_encoder.*) layout."""
    load_reference()
    hub_mod = importlib.import_module("fairseq.models.hubert.hubert")
    task_mod = importlib.import_module("fairseq.tasks.hubert_pretraining")

    torch.manual_seed(5)
    rcfg = hub_mod.HubertConfig()
    rcfg.label_rate = 1600
    rcfg.conv_feature_layers = "[(8, 10, 5), (16, 3, 2)]"
    rcfg.encoder_layers = 2
    rcfg.encoder_embed_dim = 24
    rcfg.encoder_ffn_embed_dim = 48
    rcfg.encoder_attention_heads = 2
    rcfg.conv_pos = 8
    rcfg.conv_pos_groups = 2
    for f in ("dropout", "attention_dropout", "activation_dropout",
              "encoder_layerdrop", "dropout_input", "dropout_features",
              "mask_prob", "mask_channel_prob", "feature_grad_mult"):
        setattr(rcfg, f, 0.0)
    tcfg = task_mod.HubertPretrainingConfig()
    trunk = hub_mod.HubertModel(rcfg, tcfg, [])
    trunk.eval()
    proj = torch.nn.Linear(24, vocab)

    sd = {}
    for k, v in trunk.state_dict().items():
        sd[f"w2v_encoder.w2v_model.{k}"] = v
    sd["w2v_encoder.proj.weight"] = proj.weight.data
    sd["w2v_encoder.proj.bias"] = proj.bias.data
    pt = tempfile.mktemp(suffix=".pt")
    torch.save({"model": sd}, pt)

    from s2st_tpu.models.ctc_asr import CtcAsrConfig, load_torch_ctc_asr
    from s2st_tpu.models.hubert import HubertConfig
    ours_trunk = HubertConfig(
        conv_layers=((8, 10, 5), (16, 3, 2)), encoder_layers=2,
        encoder_embed_dim=24, encoder_ffn_embed_dim=48,
        encoder_attention_heads=2, conv_pos=8, conv_pos_groups=2,
        mask_prob=0.0, dropout=0.0, dropout_input=0.0,
        activation_dropout=0.0, feature_grad_mult=1.0)
    cfg = CtcAsrConfig(trunk=ours_trunk, vocab_size=vocab)
    variables = load_torch_ctc_asr(pt, cfg)
    os.unlink(pt)
    return trunk, proj, cfg, variables


def test_ctc_asr_encoder_parity():
    """forward_ctc == reference extract_features -> proj on the imported
    fine-tuned-layout checkpoint."""
    from s2st_tpu.models.ctc_asr import forward_ctc

    trunk, proj, cfg, variables = _tiny_pair()
    rng = np.random.RandomState(3)
    wav = rng.randn(2, 400).astype(np.float32)
    lens = np.array([400, 400], np.int32)
    with torch.no_grad():
        x, _ = trunk.extract_features(torch.from_numpy(wav),
                                      padding_mask=None, mask=False)
        ref_logits = proj(x).numpy()                     # (B, T, V)
    net = forward_ctc(variables["params"], cfg, wav, lens, train=False)
    ours = np.asarray(net["logits"])[:, :ref_logits.shape[1]]
    np.testing.assert_allclose(ours, ref_logits, atol=ATOL)


def test_ctc_loss_parity():
    """optax CTC path == torch F.ctc_loss sum/zero_infinity on identical
    logits (what CtcCriterion computes, ctc.py:126-143)."""
    import jax.numpy as jnp
    import optax

    rng = np.random.RandomState(0)
    B, T, V, U = 3, 24, 9, 7
    logits = rng.randn(B, T, V).astype(np.float32)
    in_lens = np.array([24, 20, 16])
    tgt = np.full((B, U), 1, np.int64)          # pad=1
    tgt_lens = np.array([7, 5, 3])
    for b in range(B):
        tgt[b, :tgt_lens[b]] = rng.randint(4, V, tgt_lens[b])

    lprobs = torch.from_numpy(logits).log_softmax(-1).transpose(0, 1)
    flat = torch.from_numpy(
        np.concatenate([tgt[b, :tgt_lens[b]] for b in range(B)]))
    ref = torch.nn.functional.ctc_loss(
        lprobs, flat, torch.from_numpy(in_lens),
        torch.from_numpy(tgt_lens), blank=0, reduction="sum",
        zero_infinity=True)

    pad_frames = (np.arange(T)[None, :] >= in_lens[:, None])
    keep = np.arange(U)[None, :] < tgt_lens[:, None]
    per_ex = optax.ctc_loss(
        jnp.asarray(logits), jnp.asarray(pad_frames, jnp.float32),
        jnp.asarray(np.where(keep, tgt, 0)),
        jnp.asarray(~keep, jnp.float32), blank_id=0)
    ours = float(jnp.sum(jnp.where(jnp.isfinite(per_ex), per_ex, 0.0)))
    assert abs(ours - float(ref)) <= 1e-3 * max(1.0, abs(float(ref)))


def test_greedy_decode_and_error_counters_parity():
    """greedy_ctc_decode == torch unique_consecutive pipeline; UER/WER
    in-graph counters == python DP + post_process('letter') splitting."""
    from s2st_tpu.models.ctc_asr import greedy_ctc_decode
    from s2st_tpu.train.losses import _levenshtein_unit, _pack_words
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    B, T, V = 4, 30, 8
    sep = 4                                    # "|" unit id
    logits = rng.randn(B, T, V).astype(np.float32)
    in_lens = np.array([30, 26, 18, 9])
    toks, n = greedy_ctc_decode(jnp.asarray(logits), jnp.asarray(in_lens))
    toks, n = np.asarray(toks), np.asarray(n)
    for b in range(B):
        lp = torch.from_numpy(logits[b, :in_lens[b]])
        ref = lp.argmax(dim=-1).unique_consecutive()
        ref = ref[ref != 0].numpy()
        np.testing.assert_array_equal(toks[b, :n[b]], ref, err_msg=f"b={b}")

    # unit-cost edit distance vs plain DP
    def dp(a, b):
        m, k = len(a), len(b)
        d = np.zeros((m + 1, k + 1), int)
        d[:, 0] = np.arange(m + 1)
        d[0, :] = np.arange(k + 1)
        for i in range(1, m + 1):
            for j in range(1, k + 1):
                d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                              d[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
        return d[m, k]

    tgt = rng.randint(3, V, (B, 12)).astype(np.int32)
    tgt_lens = np.array([12, 9, 6, 2])
    errs = np.asarray(_levenshtein_unit(
        jnp.asarray(toks), jnp.asarray(n), jnp.asarray(tgt),
        jnp.asarray(tgt_lens)))
    for b in range(B):
        assert errs[b] == dp(list(toks[b, :n[b]]),
                             list(tgt[b, :tgt_lens[b]])), b

    # word packing vs post_process("letter") segmentation
    hw, nw = _pack_words(jnp.asarray(toks), jnp.asarray(n), sep)
    hw, nw = np.asarray(hw), np.asarray(nw)
    for b in range(B):
        words = [w for w in
                 "".join(chr(65 + t) for t in toks[b, :n[b]])
                 .replace(chr(65 + sep), " ").split()]
        assert nw[b] == len(words), (b, nw[b], words)
        # equal words <-> equal hashes within the row pair actually used;
        # check injectivity across this sample's words
        uh = {}
        for wi, w in enumerate(words):
            h = hw[b, wi]
            assert uh.setdefault(w, h) == h
        assert len(set(uh.values())) == len(set(words))


def test_ctc_finetune_cli_e2e(tmp_path):
    """Pretrain 1 epoch (hubert), then CTC-fine-tune from --w2v-path
    through the generic train CLI; freeze window covers step 1."""
    from s2st_tpu.data.audio_utils import write_wav

    root = tmp_path / "audio"
    root.mkdir()
    rng = np.random.RandomState(0)
    lines, sizes = [], []
    for i in range(6):
        n = 1200 + 100 * i
        write_wav(str(root / f"u{i}.wav"),
                  (0.1 * rng.randn(n)).astype(np.float32), 16000)
        lines.append(f"u{i}.wav\t{n}")
        sizes.append(n)
    for split in ("train", "dev"):
        (tmp_path / f"{split}.tsv").write_text(
            str(root) + "\n" + "\n".join(lines) + "\n")
    letters = list("abcd") + ["|"]
    (tmp_path / "dict.ltr.txt").write_text(
        "".join(f"{u} 1\n" for u in letters))
    for split in ("train", "dev"):
        with open(tmp_path / f"{split}.ltr", "w") as f:
            for n in sizes:
                f.write(" ".join(rng.choice(letters, 6)) + "\n")

    from s2st_tpu.cli.train import main as train_main
    common = [
        "--train-subset", "train", "--valid-subset", "dev",
        "--encoder-layers", "2", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--conv-feature-layers", "[(8,10,5),(8,3,2)]",
        "--conv-pos", "8", "--conv-pos-groups", "2",
        "--min-sample-size", "600", "--max-sample-size", "1600",
        "--max-tokens", "8000", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.0005",
        "--seed", "1", "--log-interval", "1",
        "--required-batch-size-multiple", "1",
    ]
    # 1) quick hubert pretrain to produce the trunk
    (tmp_path / "dict.km.txt").write_text("x 1\ny 1\n")
    for split in ("train", "dev"):
        with open(tmp_path / f"{split}.km", "w") as f:
            for n in sizes:
                f.write(" ".join(rng.choice(["x", "y"], n // 10)) + "\n")
    assert train_main([
        str(tmp_path), "--task", "hubert_pretraining", "--arch", "hubert",
        "--criterion", "hubert", "--labels", "km", "--label-rate", "1600",
        "--final-dim", "8", "--mask-prob", "0.65", "--mask-length", "2",
        "--loss-weights", "10",
        "--save-dir", str(tmp_path / "pre")] + common) == 0
    # 2) CTC fine-tune from the pretrained trunk
    assert train_main([
        str(tmp_path), "--task", "audio_finetuning", "--arch", "hubert_ctc",
        "--criterion", "ctc", "--labels", "ltr",
        "--w2v-path", str(tmp_path / "pre" / "checkpoint_last.npz"),
        "--apply-mask", "--mask-prob", "0.5", "--mask-length", "2",
        "--mask-channel-prob", "0.25", "--mask-channel-length", "4",
        "--final-dropout", "0.1", "--freeze-finetune-updates", "1",
        "--save-dir", str(tmp_path / "ft")] + common) == 0
    assert (tmp_path / "ft" / "checkpoint_last.npz").is_file()
