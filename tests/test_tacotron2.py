"""Reference-numerics parity for the Tacotron2 TTS model.

Runs the reference's own torch Tacotron2Model / Tacotron2Criterion
(fairseq/models/text_to_speech/tacotron2.py, criterions/tacotron2_loss.py)
against the TPU-native implementation on identical batches with imported
weights (a genuinely fairseq-produced state_dict through
``torch_import.tacotron2_from_fairseq_state_dict``).

Covered:
  * teacher-forced forward: post_feat_out / eos_out / attn agree (eval
    mode: zoneout = deterministic interpolation, prenet dropout 0);
  * the incremental-decode quirk: the reference re-initializes the
    attention context every incremental step — our ``generate_features``
    mirrors it step-exactly;
  * the full criterion: loss terms (l1/mse/eos/guided-attention) match.
"""

import argparse

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

ATOL = 2e-4

GEO = dict(vocab=20, enc_dim=16, enc_conv_layers=2, enc_conv_k=3,
           enc_lstm_layers=1, attn_dim=8, attn_conv_dim=4, attn_conv_k=3,
           prenet_layers=2, prenet_dim=8, postnet_layers=3,
           postnet_conv_dim=12, postnet_conv_k=5, dec_lstm_layers=2,
           dec_lstm_dim=12, out_dim=6, zoneout=0.1)


def _make_args(init_attn_c="zero"):
    a = argparse.Namespace()
    a.encoder_dropout = 0.0
    a.encoder_embed_dim = GEO["enc_dim"]
    a.encoder_conv_layers = GEO["enc_conv_layers"]
    a.encoder_conv_kernel_size = GEO["enc_conv_k"]
    a.encoder_lstm_layers = GEO["enc_lstm_layers"]
    a.attention_dim = GEO["attn_dim"]
    a.attention_conv_dim = GEO["attn_conv_dim"]
    a.attention_conv_kernel_size = GEO["attn_conv_k"]
    a.prenet_dropout = 0.0
    a.prenet_layers = GEO["prenet_layers"]
    a.prenet_dim = GEO["prenet_dim"]
    a.postnet_dropout = 0.0
    a.postnet_layers = GEO["postnet_layers"]
    a.postnet_conv_dim = GEO["postnet_conv_dim"]
    a.postnet_conv_kernel_size = GEO["postnet_conv_k"]
    a.init_attn_c = init_attn_c
    a.attention_use_cumprob = True
    a.zoneout = GEO["zoneout"]
    a.decoder_lstm_layers = GEO["dec_lstm_layers"]
    a.decoder_lstm_dim = GEO["dec_lstm_dim"]
    a.output_frame_dim = GEO["out_dim"]
    a.n_frames_per_step = 1
    return a


def _dictionary(ref, n_total):
    d = ref.Dictionary()
    for i in range(n_total - len(d)):
        d.add_symbol(f"w{i}")
    assert len(d) == n_total and d.pad() == 1
    return d


@pytest.fixture(scope="module", params=["zero", "avg"])
def tc2_setup(request):
    ref = load_reference()
    from fairseq.models.text_to_speech.tacotron2 import Tacotron2Model

    torch.manual_seed(0)
    args = _make_args(request.param)

    class _Task:
        src_dict = _dictionary(ref, GEO["vocab"])

        @staticmethod
        def get_speaker_embeddings(args):
            return None

    model = Tacotron2Model.build_model(args, _Task)
    model.eval()

    import jax.numpy as jnp

    from s2st_tpu.models import tacotron2 as tc2
    from s2st_tpu.models.torch_import import tacotron2_from_fairseq_state_dict

    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    variables = tacotron2_from_fairseq_state_dict(sd)
    import jax
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    cfg = tc2.Tacotron2Config(
        vocab_size=GEO["vocab"], encoder_dropout=0.0,
        encoder_embed_dim=GEO["enc_dim"],
        encoder_conv_layers=GEO["enc_conv_layers"],
        encoder_conv_kernel_size=GEO["enc_conv_k"],
        encoder_lstm_layers=GEO["enc_lstm_layers"],
        attention_dim=GEO["attn_dim"],
        attention_conv_dim=GEO["attn_conv_dim"],
        attention_conv_kernel_size=GEO["attn_conv_k"],
        prenet_dropout=0.0, prenet_layers=GEO["prenet_layers"],
        prenet_dim=GEO["prenet_dim"], postnet_dropout=0.0,
        postnet_layers=GEO["postnet_layers"],
        postnet_conv_dim=GEO["postnet_conv_dim"],
        postnet_conv_kernel_size=GEO["postnet_conv_k"],
        init_attn_c=request.param, attention_use_cumprob=True,
        zoneout=GEO["zoneout"], decoder_lstm_layers=GEO["dec_lstm_layers"],
        decoder_lstm_dim=GEO["dec_lstm_dim"],
        output_frame_dim=GEO["out_dim"], n_frames_per_step=1)
    return ref, model, variables, cfg


def _batch(seed=0, b=3, src_t=9, tgt_t=7):
    """Sorted-desc source lengths (reference pack_padded enforce_sorted)."""
    r = np.random.RandomState(seed)
    lens = np.sort(r.randint(max(2, src_t // 2), src_t + 1, size=b))[::-1]
    lens[0] = src_t
    src = np.full((b, src_t), 1, np.int64)
    for i in range(b):
        src[i, :lens[i]] = r.randint(4, GEO["vocab"], size=lens[i])
    prev = (r.randn(b, tgt_t, GEO["out_dim"]) * 0.5).astype(np.float32)
    tgt = (r.randn(b, tgt_t, GEO["out_dim"]) * 0.5).astype(np.float32)
    tgt_lens = np.sort(r.randint(2, tgt_t + 1, size=b))[::-1]
    tgt_lens[0] = tgt_t
    return src, lens.astype(np.int64).copy(), prev, tgt, \
        tgt_lens.astype(np.int64).copy()


def test_tacotron2_forward_parity(tc2_setup):
    ref, model, variables, cfg = tc2_setup
    from s2st_tpu.models import tacotron2 as tc2
    src, src_lens, prev, _, tgt_lens = _batch()

    with torch.no_grad():
        post_ref, eos_ref, extra = model(
            src_tokens=torch.from_numpy(src),
            src_lengths=torch.from_numpy(src_lens),
            prev_output_tokens=torch.from_numpy(prev),
            incremental_state=None,
            target_lengths=torch.from_numpy(tgt_lens), speaker=None)

    out = tc2.forward(variables, cfg,
                      {"src_text": src.astype(np.int32),
                       "src_text_len": src_lens.astype(np.int32),
                       "prev_output_tokens": prev},
                      deterministic=True, train=False)
    np.testing.assert_allclose(np.asarray(out["feat_out"]),
                               extra["feature_out"].numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out["post_feat_out"]),
                               post_ref.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out["eos_out"]),
                               eos_ref.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out["attn"]),
                               extra["attn"].numpy(), atol=ATOL)


def test_tacotron2_incremental_quirk_parity(tc2_setup):
    """Step-by-step AR decode matches the reference's incremental path,
    including its re-initialized per-step attention context."""
    ref, model, variables, cfg = tc2_setup
    from s2st_tpu.models import tacotron2 as tc2
    src, src_lens, _, _, _ = _batch(seed=1)
    b, steps = src.shape[0], 5

    with torch.no_grad():
        enc = model.forward_encoder(torch.from_numpy(src),
                                    torch.from_numpy(src_lens),
                                    speaker=None)
        inc = {}
        prev = torch.zeros(b, 1, GEO["out_dim"])
        feats = []
        for _ in range(steps):
            _, _, extra = model.forward_decoder(
                prev, encoder_out=enc, incremental_state=inc,
                target_lengths=torch.full((b,), steps).long(), speaker=None)
            feats.append(extra["feature_out"])
            prev = extra["feature_out"]
        feat_ref = torch.cat(feats, dim=1)
        post_ref = model.decoder.postnet(feat_ref) + feat_ref

    out = tc2.generate_features(variables, cfg, src.astype(np.int32),
                                src_lens.astype(np.int32), max_iter=steps,
                                eos_prob_threshold=2.0)
    np.testing.assert_allclose(np.asarray(out["feature"]),
                               post_ref.numpy(), atol=ATOL)


def test_tacotron2_criterion_parity(tc2_setup):
    """The reference Tacotron2Criterion (l1/mse/eos/guided-attn, mean
    reduction) agrees with our tacotron2_loss on the same batch."""
    ref, model, variables, cfg = tc2_setup
    from fairseq.criterions.tacotron2_loss import Tacotron2Criterion
    from s2st_tpu.train.losses import LossConfig, tacotron2_loss

    src, src_lens, prev, tgt, tgt_lens = _batch(seed=2)
    crit = Tacotron2Criterion(
        task=None, sentence_avg=False, n_frames_per_step=1,
        use_guided_attention_loss=True, guided_attention_loss_sigma=0.4,
        bce_pos_weight=1.5, ctc_weight=0.0)
    sample = {
        "net_input": {
            "src_tokens": torch.from_numpy(src),
            "src_lengths": torch.from_numpy(src_lens),
            "prev_output_tokens": torch.from_numpy(prev),
        },
        "target": torch.from_numpy(tgt),
        "target_lengths": torch.from_numpy(tgt_lens),
        "ntokens": int(tgt_lens.sum()),
        "nsentences": src.shape[0],
        "speaker": None,
    }
    with torch.no_grad():
        _, _, logs = crit(model, sample, reduction="mean")

    lcfg = LossConfig(bce_pos_weight=1.5, use_guided_attention_loss=True,
                      guided_attention_loss_sigma=0.4, ctc_weight=0.0)
    batch = {"src_text": src.astype(np.int32),
             "src_text_len": src_lens.astype(np.int32),
             "prev_output_tokens": prev,
             "tgt_speech": tgt,
             "target_lengths": tgt_lens.astype(np.int32)}
    loss, aux = tacotron2_loss(variables, cfg, lcfg, batch, rng=None,
                               train=False)
    got = aux["logging"]
    for key in ("l1_loss", "mse_loss", "eos_loss", "attn_loss", "loss"):
        np.testing.assert_allclose(float(got[key]), logs[key], atol=5e-4), key
