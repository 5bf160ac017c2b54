"""Reference-numerics parity for the NON-flagship model families.

tests/test_reference_parity.py proves the s2st_transformer (+HuBERT, beam
search, losses) against the reference's own torch code; this file extends
the same treatment to the remaining model families:

  * s2t_transformer   (fairseq/models/speech_to_text/s2t_transformer.py)
  * t2s_transformer   (examples/s2s_trans/models/t2s_transformer.py)
  * fastspeech2       (fairseq/models/text_to_speech/fastspeech2.py
                       + fairseq/criterions/fastspeech2_loss.py)

Each test builds the reference torch model at a tiny geometry, exports a
genuinely fairseq-produced state_dict, imports it through
models.torch_import.{s2t,t2s,fs2}_from_fairseq_state_dict, and asserts the
two frameworks agree on the same batch. All dropouts are 0 and models run
in eval mode so the comparison is deterministic.
"""

import argparse
import sys

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
    assert len(d) == n_total and d.pad() == 1 and d.eos() == 2
    return d


def _tokens(r, b, t, vocab):
    """(B, T) int64 rows: ids in [4, vocab), EOS-terminated, PAD-padded,
    variable lengths with row 0 at full length."""
    lens = r.randint(max(2, t // 2), t + 1, size=b)
    lens[0] = t
    out = np.full((b, t), 1, np.int64)
    for i in range(b):
        out[i, :lens[i]] = r.randint(4, vocab, size=lens[i])
        out[i, lens[i] - 1] = 2
    return out, lens.astype(np.int64)


def _sd(model):
    return {k: v.detach().float().numpy()
            for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------
# s2t_transformer
# ---------------------------------------------------------------------------

S2T = dict(vocab=30, feat=8, conv_channels=16,
           encoder_layers=2, decoder_layers=2, dim=16, ffn=32, heads=2)


@pytest.fixture(scope="module")
def s2t_setup():
    ref = load_reference()
    from fairseq.models.speech_to_text.s2t_transformer import \
        S2TTransformerModel

    torch.manual_seed(0)
    g = S2T
    a = argparse.Namespace()
    a.input_feat_per_channel = g["feat"]
    a.input_channels = 1
    a.conv_kernel_sizes = "5,5"
    a.conv_channels = g["conv_channels"]
    a.encoder_layers = g["encoder_layers"]
    a.encoder_embed_dim = g["dim"]
    a.encoder_ffn_embed_dim = g["ffn"]
    a.encoder_attention_heads = g["heads"]
    a.decoder_layers = g["decoder_layers"]
    a.decoder_embed_dim = g["dim"]
    a.decoder_ffn_embed_dim = g["ffn"]
    a.decoder_attention_heads = g["heads"]
    a.dropout = 0.0
    a.attention_dropout = 0.0
    a.activation_dropout = 0.0
    a.max_source_positions = 256
    a.max_target_positions = 256
    a.speaker_to_id = None

    class _Task:
        target_dictionary = _dictionary(ref, g["vocab"])

    model = S2TTransformerModel.build_model(a, _Task)
    model.eval()

    import jax
    import jax.numpy as jnp

    from s2st_tpu.models import s2st_transformer as s2st_m
    from s2st_tpu.models.s2t_transformer import S2TConfig
    from s2st_tpu.models.torch_import import s2t_from_fairseq_state_dict

    variables = jax.tree_util.tree_map(
        jnp.asarray, s2t_from_fairseq_state_dict(_sd(model)))
    base = s2st_m.S2STConfig(
        src_vocab_size=g["vocab"], tgt_vocab_size=g["vocab"],
        input_feat_per_channel=g["feat"], conv_kernel_sizes=(5, 5),
        conv_channels=g["conv_channels"], encoder_layers=g["encoder_layers"],
        encoder_embed_dim=g["dim"], encoder_ffn_embed_dim=g["ffn"],
        encoder_attention_heads=g["heads"],
        decoder_embed_dim=g["dim"], decoder_ffn_embed_dim=g["ffn"],
        decoder_attention_heads=g["heads"], middle_layers=(),
        ctc=False, aux_asr=False, aux_st=False,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        max_source_positions=256, max_target_positions=256,
        dtype=jnp.float32)
    cfg = S2TConfig(base=base, decoder_layers=g["decoder_layers"],
                    decoder_embed_dim=g["dim"])
    return dict(model=model, variables=variables, cfg=cfg)


def test_s2t_forward_parity(s2t_setup):
    """Decoder logits agree with the reference S2TTransformerModel forward
    (src rows at full length: the reference subsampler's boundary frames
    read batch padding — see the variable-length test in
    test_reference_parity.py for that pinned-down departure)."""
    from s2st_tpu.models import s2t_transformer as s2t

    r = np.random.RandomState(0)
    b, src_t, tgt_t = 3, 37, 11
    src = r.randn(b, src_t, S2T["feat"]).astype(np.float32)
    src_lens = np.full((b,), src_t, np.int64)
    prev, _ = _tokens(r, b, tgt_t, S2T["vocab"])

    with torch.no_grad():
        logits_ref, _ = s2t_setup["model"](
            torch.from_numpy(src), torch.from_numpy(src_lens),
            torch.from_numpy(prev))

    batch = {"src_speech": src, "src_speech_lens": src_lens.astype(np.int32),
             "prev_text_tokens": prev.astype(np.int32)}
    out = s2t.forward(s2t_setup["variables"], s2t_setup["cfg"], batch,
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=ATOL)


# ---------------------------------------------------------------------------
# t2s_transformer
# ---------------------------------------------------------------------------

T2S = dict(vocab=30, dim=16, ffn=32, heads=2, conv_layers=2, conv_k=5,
           enc_layers=2, dec_layers=2, out_dim=8, prenet_layers=2,
           prenet_dim=8, postnet_layers=2, postnet_dim=8)


@pytest.fixture(scope="module")
def t2s_setup():
    ref = load_reference()
    t2s_mod = next(m for name, m in sys.modules.items()
                   if name.endswith("models.t2s_transformer")
                   and m is not None
                   and "/reference/" in (getattr(m, "__file__", "") or ""))

    torch.manual_seed(0)
    g = T2S
    a = argparse.Namespace()
    a.dropout = 0.0
    a.encoder_dropout = 0.0
    a.attention_dropout = 0.0
    a.activation_dropout = 0.0
    a.prenet_dropout = 0.0
    a.postnet_dropout = 0.0
    a.output_frame_dim = g["out_dim"]
    a.n_frames_per_step = 1
    a.encoder_conv_layers = g["conv_layers"]
    a.encoder_conv_kernel_size = g["conv_k"]
    a.encoder_transformer_layers = g["enc_layers"]
    a.encoder_embed_dim = g["dim"]
    a.encoder_ffn_embed_dim = g["ffn"]
    a.encoder_attention_heads = g["heads"]
    a.encoder_normalize_before = True
    a.decoder_transformer_layers = g["dec_layers"]
    a.decoder_embed_dim = g["dim"]
    a.decoder_ffn_embed_dim = g["ffn"]
    a.decoder_attention_heads = g["heads"]
    a.decoder_normalize_before = True
    a.prenet_layers = g["prenet_layers"]
    a.prenet_dim = g["prenet_dim"]
    a.postnet_layers = g["postnet_layers"]
    a.postnet_conv_dim = g["postnet_dim"]
    a.postnet_conv_kernel_size = 5
    a.max_source_positions = 256
    a.max_target_positions = 256
    a.activation_fn = "relu"
    a.speaker_to_id = None
    a.ctc_weight = 0.0
    ref.models.ARCH_CONFIG_REGISTRY["t2s_transformer"](a)

    class _Task:
        src_dict = _dictionary(ref, g["vocab"])

        @classmethod
        def get_speaker_embeddings(cls, args):
            return None

    model = t2s_mod.T2STransformerModel.build_model(a, _Task)
    model.eval()

    import jax
    import jax.numpy as jnp

    from s2st_tpu.models import s2st_transformer as s2st_m
    from s2st_tpu.models.t2s_transformer import T2SConfig
    from s2st_tpu.models.torch_import import t2s_from_fairseq_state_dict

    variables = jax.tree_util.tree_map(
        jnp.asarray, t2s_from_fairseq_state_dict(_sd(model)))
    base = s2st_m.S2STConfig(
        src_vocab_size=g["vocab"], tgt_vocab_size=g["vocab"],
        encoder_embed_dim=g["dim"], encoder_ffn_embed_dim=g["ffn"],
        encoder_attention_heads=g["heads"], encoder_normalize_before=True,
        decoder_layers=g["dec_layers"], decoder_embed_dim=g["dim"],
        decoder_ffn_embed_dim=g["ffn"], decoder_attention_heads=g["heads"],
        decoder_normalize_before=True, output_frame_dim=g["out_dim"],
        n_frames_per_step=1, prenet_layers=g["prenet_layers"],
        prenet_dim=g["prenet_dim"], postnet_layers=g["postnet_layers"],
        postnet_conv_dim=g["postnet_dim"], postnet_conv_kernel_size=5,
        middle_layers=(), ctc=False, aux_asr=False, aux_st=False,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        prenet_dropout=0.0, postnet_dropout=0.0,
        max_source_positions=256, max_target_positions=256,
        dtype=jnp.float32)
    cfg = T2SConfig(base=base, encoder_conv_layers=g["conv_layers"],
                    encoder_conv_kernel_size=g["conv_k"],
                    encoder_dropout=0.0,
                    encoder_transformer_layers=g["enc_layers"])
    return dict(model=model, variables=variables, cfg=cfg)


def test_t2s_forward_parity(t2s_setup):
    """feat / post-feat / eos / cross-attention agree with the reference
    T2STransformerModel teacher-forced forward on a padded batch."""
    from s2st_tpu.models import t2s_transformer as t2s

    r = np.random.RandomState(1)
    b, src_t, tgt_t = 3, 13, 17
    src_tokens, src_lens = _tokens(r, b, src_t, T2S["vocab"])
    tgt_lens = r.randint(tgt_t // 2, tgt_t + 1, size=b).astype(np.int64)
    tgt_lens[0] = tgt_t
    prev = r.randn(b, tgt_t, T2S["out_dim"]).astype(np.float32)

    with torch.no_grad():
        post_ref, eos_ref, extra = t2s_setup["model"](
            src_tokens=torch.from_numpy(src_tokens),
            src_lengths=torch.from_numpy(src_lens),
            prev_output_tokens=torch.from_numpy(prev),
            target_lengths=torch.from_numpy(tgt_lens),
            speaker=None)

    batch = {"src_text": src_tokens.astype(np.int32),
             "prev_output_tokens": prev,
             "target_lengths": tgt_lens.astype(np.int32)}
    out = t2s.forward(t2s_setup["variables"], t2s_setup["cfg"], batch,
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(out["feat_out"]),
                               extra["feature_out"].numpy(), atol=ATOL,
                               err_msg="pre-postnet features")
    np.testing.assert_allclose(np.asarray(out["post_feat_out"]),
                               post_ref.numpy(), atol=ATOL,
                               err_msg="post-postnet features")
    np.testing.assert_allclose(np.asarray(out["eos_out"])[:, :, 0],
                               eos_ref.numpy()[:, :, 0], atol=ATOL,
                               err_msg="eos logits")
    np.testing.assert_allclose(
        np.asarray(out["attn"]).transpose(0, 2, 1),
        extra["attn"].numpy(), atol=ATOL, err_msg="cross-attention")


# ---------------------------------------------------------------------------
# fastspeech2
# ---------------------------------------------------------------------------

FS2 = dict(vocab=30, dim=16, heads=2, hidden=32, k=9,
           enc_layers=2, dec_layers=2, out_dim=8,
           var_hidden=12, var_k=3, n_bins=16)


def _fs2_args():
    g = FS2
    a = argparse.Namespace()
    a.dropout = 0.0
    a.attention_dropout = 0.0
    a.var_pred_dropout = 0.0
    a.postnet_dropout = 0.0
    a.output_frame_dim = g["out_dim"]
    a.n_frames_per_step = 1
    a.encoder_layers = g["enc_layers"]
    a.encoder_embed_dim = g["dim"]
    a.encoder_attention_heads = g["heads"]
    a.decoder_layers = g["dec_layers"]
    a.decoder_embed_dim = g["dim"]
    a.decoder_attention_heads = g["heads"]
    a.fft_hidden_dim = g["hidden"]
    a.fft_kernel_size = g["k"]
    a.var_pred_n_bins = g["n_bins"]
    a.var_pred_hidden_dim = g["var_hidden"]
    a.var_pred_kernel_size = g["var_k"]
    a.add_postnet = True
    a.postnet_layers = 2
    a.postnet_conv_dim = 8
    a.postnet_conv_kernel_size = 5
    a.pitch_min = 0.0
    a.pitch_max = 6.0
    a.energy_min = 0.0
    a.energy_max = 5.0
    a.max_source_positions = 256
    a.speaker_to_id = None
    a.ctc_weight = 0.5
    return a


@pytest.fixture(scope="module")
def fs2_setup():
    ref = load_reference()
    from fairseq.models.text_to_speech.fastspeech2 import FastSpeech2Model

    torch.manual_seed(0)
    a = _fs2_args()
    ref.models.ARCH_CONFIG_REGISTRY["fastspeech2"](a)

    src_dict = _dictionary(ref, FS2["vocab"])

    class _Task:
        # FairseqCriterion.__init__ reads target_dictionary for padding_idx
        target_dictionary = src_dict

        @classmethod
        def get_speaker_embeddings(cls, args):
            return None

    _Task.src_dict = src_dict
    model = FastSpeech2Model.build_model(a, _Task)
    model.eval()

    import jax
    import jax.numpy as jnp

    from s2st_tpu.models.fastspeech2 import FS2Config
    from s2st_tpu.models.torch_import import fs2_from_fairseq_state_dict

    variables = jax.tree_util.tree_map(
        jnp.asarray, fs2_from_fairseq_state_dict(_sd(model)))
    g = FS2
    cfg = FS2Config(
        vocab_size=g["vocab"], output_frame_dim=g["out_dim"],
        n_frames_per_step=1, encoder_layers=g["enc_layers"],
        encoder_embed_dim=g["dim"], encoder_attention_heads=g["heads"],
        decoder_layers=g["dec_layers"], decoder_embed_dim=g["dim"],
        decoder_attention_heads=g["heads"], fft_hidden_dim=g["hidden"],
        fft_kernel_size=g["k"], dropout=0.0, attention_dropout=0.0,
        var_pred_n_bins=g["n_bins"], var_pred_hidden_dim=g["var_hidden"],
        var_pred_kernel_size=g["var_k"], var_pred_dropout=0.0,
        pitch_min=0.0, pitch_max=6.0, energy_min=0.0, energy_max=5.0,
        add_postnet=True, postnet_layers=2, postnet_conv_dim=8,
        postnet_conv_kernel_size=5, postnet_dropout=0.0,
        max_source_positions=256, ctc=True)
    return dict(ref=ref, model=model, variables=variables, cfg=cfg,
                task=_Task)


def _fs2_batch(seed=2, b=3, src_t=9):
    r = np.random.RandomState(seed)
    src_tokens, src_lens = _tokens(r, b, src_t, FS2["vocab"])
    dur = r.randint(1, 5, size=(b, src_t)).astype(np.int64)
    dur[src_tokens == 1] = 0
    pitches = (r.rand(b, src_t) * 6.0).astype(np.float32)
    energies = (r.rand(b, src_t) * 5.0).astype(np.float32)
    tgt_t = int(dur.sum(1).max())
    tgt = r.randn(b, tgt_t, FS2["out_dim"]).astype(np.float32)
    return dict(src_tokens=src_tokens, src_lens=src_lens, dur=dur,
                pitches=pitches, energies=energies, tgt=tgt, tgt_t=tgt_t)


def _run_fs2_ref(model, bt, durations=True):
    with torch.no_grad():
        return model(
            src_tokens=torch.from_numpy(bt["src_tokens"]),
            src_lengths=torch.from_numpy(bt["src_lens"]),
            durations=torch.from_numpy(bt["dur"]) if durations else None,
            pitches=torch.from_numpy(bt["pitches"]) if durations else None,
            energies=torch.from_numpy(bt["energies"]) if durations else None,
            speaker=None)


def test_fs2_teacher_forced_parity(fs2_setup):
    """feat / post-feat / out_lens / log-duration / pitch / energy agree
    with the reference FastSpeech2 teacher-forced forward."""
    from s2st_tpu.models import fastspeech2 as fs2

    bt = _fs2_batch()
    x_ref, x_post_ref, out_lens_ref, log_dur_ref, pitch_ref, energy_ref = \
        _run_fs2_ref(fs2_setup["model"], bt)

    out = fs2.forward(
        fs2_setup["variables"], fs2_setup["cfg"],
        bt["src_tokens"].astype(np.int32), bt["src_lens"].astype(np.int32),
        durations=bt["dur"].astype(np.int32), pitches=bt["pitches"],
        energies=bt["energies"], max_out_len=bt["tgt_t"],
        deterministic=True)
    np.testing.assert_array_equal(np.asarray(out["out_lens"]),
                                  out_lens_ref.numpy())
    np.testing.assert_allclose(np.asarray(out["log_dur_out"]),
                               log_dur_ref.numpy(), atol=ATOL,
                               err_msg="log durations")
    np.testing.assert_allclose(np.asarray(out["pitch_out"]),
                               pitch_ref.numpy(), atol=ATOL, err_msg="pitch")
    np.testing.assert_allclose(np.asarray(out["energy_out"]),
                               energy_ref.numpy(), atol=ATOL,
                               err_msg="energy")
    np.testing.assert_allclose(np.asarray(out["feat_out"]), x_ref.numpy(),
                               atol=ATOL, err_msg="pre-postnet features")
    np.testing.assert_allclose(np.asarray(out["post_feat_out"]),
                               x_post_ref.numpy(), atol=ATOL,
                               err_msg="post-postnet features")


def test_fs2_free_running_parity(fs2_setup):
    """Inference mode (durations/pitches/energies from the predictors):
    predicted lengths and features agree — covers round/bucketize parity."""
    from s2st_tpu.models import fastspeech2 as fs2

    bt = _fs2_batch(seed=3)
    x_ref, _, out_lens_ref, _, _, _ = _run_fs2_ref(
        fs2_setup["model"], bt, durations=False)

    max_out = int(out_lens_ref.max())
    assert max_out > 0, "degenerate free-running decode (all durations 0)"
    out = fs2.forward(
        fs2_setup["variables"], fs2_setup["cfg"],
        bt["src_tokens"].astype(np.int32), bt["src_lens"].astype(np.int32),
        max_out_len=max_out, deterministic=True)
    lens = out_lens_ref.numpy()
    np.testing.assert_array_equal(np.asarray(out["out_lens"]), lens)
    # compare valid frames only: rows decode to different lengths, and
    # frames past out_len are garbage in BOTH frameworks (the reference
    # runs its FFT decoder over the zero-padded tail too)
    valid = np.arange(max_out)[None, :] < lens[:, None]
    np.testing.assert_allclose(np.asarray(out["feat_out"])[valid],
                               x_ref.numpy()[valid],
                               atol=ATOL, err_msg="free-running features")


def test_fs2_loss_parity(fs2_setup):
    """Every fastspeech2_loss term (l1 incl. postnet, dur, pitch, energy,
    weighted CTC) agrees with the reference FastSpeech2Loss on the same
    batch."""
    import jax.numpy as jnp

    from fairseq.criterions.fastspeech2_loss import FastSpeech2Loss

    from s2st_tpu.train.losses import LossConfig, fastspeech2_loss

    bt = _fs2_batch(seed=4)
    crit = FastSpeech2Loss(fs2_setup["task"], ctc_weight=0.5)
    sample = {
        "net_input": {
            "src_tokens": torch.from_numpy(bt["src_tokens"]),
            "src_lengths": torch.from_numpy(bt["src_lens"]),
            "prev_output_tokens": torch.from_numpy(bt["tgt"]),
        },
        "target": torch.from_numpy(bt["tgt"]),
        "target_lengths": torch.from_numpy(
            bt["dur"].sum(1)),
        "durations": torch.from_numpy(bt["dur"]),
        "pitches": torch.from_numpy(bt["pitches"]),
        "energies": torch.from_numpy(bt["energies"]),
        "speaker": None,
        "ntokens": int(bt["dur"].sum()),
        "nsentences": bt["tgt"].shape[0],
    }
    with torch.no_grad():
        _, _, log_ref = crit.forward(fs2_setup["model"], sample)

    batch = {
        "src_text": jnp.asarray(bt["src_tokens"], jnp.int32),
        "src_text_len": jnp.asarray(bt["src_lens"], jnp.int32),
        "tgt_speech": jnp.asarray(bt["tgt"]),
        "target_lengths": jnp.asarray(bt["dur"].sum(1), jnp.int32),
        "durations": jnp.asarray(bt["dur"], jnp.int32),
        "pitches": jnp.asarray(bt["pitches"]),
        "energies": jnp.asarray(bt["energies"]),
    }
    loss, aux = fastspeech2_loss(
        fs2_setup["variables"], fs2_setup["cfg"], LossConfig(ctc_weight=0.5),
        batch, train=False)
    logs = aux["logging"]
    for ours, theirs, tol in (("l1_loss", "l1_loss", ATOL),
                              ("dur_loss", "dur_loss", ATOL),
                              ("pitch_loss", "pitch_loss", ATOL),
                              ("energy_loss", "energy_loss", ATOL),
                              ("ctc_loss", "ctc_loss", 2e-3),
                              ("loss", "loss", 2e-3)):
        np.testing.assert_allclose(float(logs[ours]), log_ref[theirs],
                                   atol=tol, err_msg=ours)


# ---------------------------------------------------------------------------
# convtransformer
# ---------------------------------------------------------------------------

CT = dict(vocab=30, feat=8, conv_ch=8, enc_layers=2, dec_layers=2,
          dim=16, ffn=32, heads=2)


def test_convtransformer_forward_parity():
    """2D-conv frontend S2T: logits agree with the reference
    ConvTransformerModel on the same batch (imported weights)."""
    ref = load_reference()
    from fairseq.models.speech_to_text.convtransformer import \
        ConvTransformerModel

    torch.manual_seed(0)
    g = CT
    a = argparse.Namespace()
    a.input_feat_per_channel = g["feat"]
    a.input_channels = 1
    a.conv_out_channels = g["conv_ch"]
    a.encoder_layers = g["enc_layers"]
    a.encoder_embed_dim = g["dim"]
    a.encoder_ffn_embed_dim = g["ffn"]
    a.encoder_attention_heads = g["heads"]
    a.decoder_layers = g["dec_layers"]
    a.decoder_embed_dim = g["dim"]
    a.decoder_ffn_embed_dim = g["ffn"]
    a.decoder_attention_heads = g["heads"]
    a.dropout = 0.0
    a.attention_dropout = 0.0
    a.activation_dropout = 0.0
    a.max_source_positions = 256
    a.max_target_positions = 256

    class _Task:
        target_dictionary = _dictionary(ref, g["vocab"])

    model = ConvTransformerModel.build_model(a, _Task)
    model.eval()

    import jax
    import jax.numpy as jnp

    from s2st_tpu.models import convtransformer as ct
    from s2st_tpu.models import s2st_transformer as s2st_m
    from s2st_tpu.models.torch_import import (_dec_layer, _enc_layer,
                                              _lin, _ln)

    sd = _sd(model)
    enc = {}
    enc["conv1"] = {"w": np.transpose(sd.pop("encoder.conv.0.weight"),
                                      (2, 3, 1, 0)).copy(),
                    "b": sd.pop("encoder.conv.0.bias")}
    enc["conv2"] = {"w": np.transpose(sd.pop("encoder.conv.2.weight"),
                                      (2, 3, 1, 0)).copy(),
                    "b": sd.pop("encoder.conv.2.bias")}
    enc["out"] = _lin(sd, "encoder.out", {})
    for i in range(g["enc_layers"]):
        enc[f"layer{i}"] = _enc_layer(sd, f"encoder.transformer_layers.{i}")
    dec = {"embed": {"w": sd.pop("decoder.embed_tokens.weight")}}
    for i in range(g["dec_layers"]):
        dec[f"layer{i}"] = _dec_layer(sd, f"decoder.layers.{i}")
    if "decoder.layer_norm.weight" in sd:
        dec["final_ln"] = _ln(sd, "decoder.layer_norm")
    dec["out_proj"] = {
        "w": sd.pop("decoder.output_projection.weight").T.copy()}
    variables = jax.tree_util.tree_map(
        jnp.asarray, {"params": {"encoder": enc, "decoder": dec},
                      "stats": {}})

    base = s2st_m.S2STConfig(
        src_vocab_size=g["vocab"], tgt_vocab_size=g["vocab"],
        input_feat_per_channel=g["feat"], encoder_layers=g["enc_layers"],
        encoder_embed_dim=g["dim"], encoder_ffn_embed_dim=g["ffn"],
        encoder_attention_heads=g["heads"], encoder_normalize_before=False,
        decoder_embed_dim=g["dim"], decoder_ffn_embed_dim=g["ffn"],
        decoder_attention_heads=g["heads"], decoder_normalize_before=False,
        middle_layers=(), ctc=False, aux_asr=False, aux_st=False,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        max_source_positions=256, max_target_positions=256,
        dtype=jnp.float32)
    cfg = ct.ConvTransformerConfig(base=base,
                                   conv_out_channels=g["conv_ch"],
                                   decoder_layers=g["dec_layers"],
                                   decoder_embed_dim=g["dim"])

    r = np.random.RandomState(0)
    b, src_t, tgt_t = 3, 20, 7
    src = r.randn(b, src_t, g["feat"]).astype(np.float32)
    src_lens = np.full((b,), src_t, np.int64)
    prev, _ = _tokens(r, b, tgt_t, g["vocab"])
    with torch.no_grad():
        logits_ref, _ = model(torch.from_numpy(src),
                              torch.from_numpy(src_lens),
                              torch.from_numpy(prev))
    out = ct.forward(variables, cfg,
                     {"src_speech": src,
                      "src_speech_lens": src_lens.astype(np.int32),
                      "prev_text_tokens": prev.astype(np.int32)},
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=2e-4)


# ---------------------------------------------------------------------------
# s2t_berard
# ---------------------------------------------------------------------------

def test_berard_forward_parity():
    """MLP+conv+biLSTM encoder and MLP-attention LSTM decoder logits agree
    with the reference BerardModel (imported weights, full-length rows —
    the berard conv reads batch padding at boundaries like the s2t conv)."""
    ref = load_reference()
    from fairseq.models.speech_to_text.berard import BerardModel

    torch.manual_seed(0)
    vocab, feat = 30, 8
    a = argparse.Namespace()
    a.input_layers = "[16, 8]"
    a.conv_layers = "[(4, 3, 2)]"
    a.num_blstm_layers = 2
    a.lstm_size = 8
    a.dropout = 0.0
    a.decoder_embed_dim = 8
    a.decoder_num_layers = 2
    a.decoder_hidden_dim = 16
    a.attention_dim = 12
    a.output_layer_dim = 8
    a.input_feat_per_channel = feat
    a.input_channels = 1
    a.load_pretrained_encoder_from = None
    a.load_pretrained_decoder_from = None

    class _Task:
        target_dictionary = _dictionary(ref, vocab)

    model = BerardModel.build_model(a, _Task)
    model.eval()

    import jax
    import jax.numpy as jnp

    from s2st_tpu.models import berard as brd

    sd = _sd(model)
    enc = {}
    for i in range(2):
        pre = f"encoder.input_layers.{i}"
        enc[f"input{i}"] = {"w": sd.pop(f"{pre}.weight").T.copy(),
                            "b": sd.pop(f"{pre}.bias")}
    enc["conv0"] = {"w": np.transpose(sd.pop("encoder.conv_layers.0.weight"),
                                      (2, 3, 1, 0)).copy(),
                    "b": sd.pop("encoder.conv_layers.0.bias")}
    for k in range(2):
        enc[f"l{k}"] = {
            "w_ih": sd.pop(f"encoder.lstm.weight_ih_l{k}"),
            "w_hh": sd.pop(f"encoder.lstm.weight_hh_l{k}"),
            "b_ih": sd.pop(f"encoder.lstm.bias_ih_l{k}"),
            "b_hh": sd.pop(f"encoder.lstm.bias_hh_l{k}"),
        }
        enc[f"l{k}_rev"] = {
            "w_ih": sd.pop(f"encoder.lstm.weight_ih_l{k}_reverse"),
            "w_hh": sd.pop(f"encoder.lstm.weight_hh_l{k}_reverse"),
            "b_ih": sd.pop(f"encoder.lstm.bias_ih_l{k}_reverse"),
            "b_hh": sd.pop(f"encoder.lstm.bias_hh_l{k}_reverse"),
        }
    dec = {"embed": {"w": sd.pop("decoder.embed_tokens.weight")}}
    for i in range(2):
        pre = f"decoder.layers.{i}"
        dec[f"cell{i}"] = {
            "w_ih": sd.pop(f"{pre}.weight_ih"),
            "w_hh": sd.pop(f"{pre}.weight_hh"),
            "b_ih": sd.pop(f"{pre}.bias_ih"),
            "b_hh": sd.pop(f"{pre}.bias_hh"),
        }
    def lin(name):
        return {"w": sd.pop(f"{name}.weight").T.copy(),
                "b": sd.pop(f"{name}.bias")}
    dec["attn_encoder_proj"] = lin("decoder.attention.encoder_proj")
    dec["attn_decoder_proj"] = {
        "w": sd.pop("decoder.attention.decoder_proj.weight").T.copy()}
    dec["attn_to_scores"] = {
        "w": sd.pop("decoder.attention.to_scores.weight").T.copy()}
    dec["deep_output"] = lin("decoder.deep_output_layer")
    dec["out_proj"] = lin("decoder.output_projection")
    variables = jax.tree_util.tree_map(
        jnp.asarray, {"params": {"encoder": enc, "decoder": dec},
                      "stats": {}})

    cfg = brd.BerardConfig(
        vocab_size=vocab, input_feat_per_channel=feat,
        input_layers=(16, 8), conv_layers=((4, 3, 2),),
        num_blstm_layers=2, lstm_size=8, decoder_embed_dim=8,
        decoder_num_layers=2, decoder_hidden_dim=16, attention_dim=12,
        output_layer_dim=8, dropout=0.0, dtype=jnp.float32)

    r = np.random.RandomState(0)
    b, src_t, tgt_t = 3, 16, 7
    src = r.randn(b, src_t, feat).astype(np.float32)
    src_lens = np.full((b,), src_t, np.int64)
    prev, _ = _tokens(r, b, tgt_t, vocab)
    with torch.no_grad():
        logits_ref, _ = model(torch.from_numpy(src),
                              torch.from_numpy(src_lens),
                              torch.from_numpy(prev))
    out = brd.forward(variables, cfg,
                      {"src_speech": src,
                       "src_speech_lens": src_lens.astype(np.int32),
                       "prev_text_tokens": prev.astype(np.int32)},
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=2e-4)
