"""Reference-numerics parity for the MTL variant (the second product
model): examples/s2s_trans/models/s2st_transformer_mtl.py +
criterions/s2st_loss_mtl.py run in-process as the oracle.

Same recipe as tests/test_reference_parity.py for the flagship: build the
reference torch model at a tiny geometry, export a genuinely
fairseq-produced .pt, import it through models.torch_import (the MTL
state dict uses the same key naming plus decoder.ctc_proj_tgt), and
assert teacher-forced forward + every s2st_loss_mtl term agree."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import make_batch
from tests.ref_loader import load_reference, reference_available
from tests.test_reference_parity import GEOM, _ref_args, _ref_dictionary

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

CTC_W, CTC_TGT_W = 0.5, 0.4


class _RefMTLTask:
    """What s2st_transformer_mtl's build path touches: src/tgt dicts and
    the speaker-embedding hook (s2st_transformer_mtl.py:501-555,
    s2st_loss_mtl.py:105-110)."""

    def __init__(self, args, src_dict, tgt_dict):
        self.args = args
        self.src_dict, self.tgt_dict = src_dict, tgt_dict

    @property
    def source_dictionary(self):
        return self.src_dict

    @property
    def target_dictionary(self):
        return self.tgt_dict

    def get_speaker_embeddings(self, args):
        return None


def _mtl_args(ref):
    a = _ref_args(ref)  # flagship arg surface (superset of MTL's)
    a.middle_layers = "0"
    a.middle_layers_decoder = "0"
    a.ctc_weight = CTC_W
    a.ctc_weight_tgt = CTC_TGT_W
    ref.models.ARCH_CONFIG_REGISTRY["s2st_transformer_mtl"](a)
    return a


def _our_cfg():
    import jax.numpy as jnp

    from s2st_tpu.models.s2st_transformer import S2STConfig

    geom = dict(GEOM)
    geom["middle_layers"] = (0,)
    return S2STConfig(
        **geom,
        ctc=True, ctc_tgt=True, middle_layers_decoder=(0,),
        aux_asr=False, aux_st=False,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        prenet_dropout=0.0, postnet_dropout=0.0,
        max_source_positions=256, max_target_positions=256,
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    ref = load_reference()
    torch.manual_seed(1)
    args = _mtl_args(ref)
    src_d = _ref_dictionary(ref, GEOM["src_vocab_size"])
    tgt_d = _ref_dictionary(ref, GEOM["tgt_vocab_size"])
    task = _RefMTLTask(args, src_d, tgt_d)
    model = ref.s2st_transformer_mtl.S2STTransformerModel.build_model(
        args, task)
    model.eval()

    pt = tmp_path_factory.mktemp("ref_mtl_ckpt") / "checkpoint_mtl.pt"
    torch.save({"model": model.state_dict()}, str(pt))

    import jax
    import jax.numpy as jnp

    from s2st_tpu.models.torch_import import load_fairseq_checkpoint

    variables = jax.tree_util.tree_map(jnp.asarray,
                                       load_fairseq_checkpoint(str(pt)))
    cfg = _our_cfg()
    batch = make_batch(cfg, b=3, src_t=37, tgt_t=23, seed=11)
    # full-length sources: the reference subsampler's boundary frames read
    # batch padding (see test_reference_parity.py setup note)
    batch["src_speech_lens"][:] = batch["src_speech"].shape[1]
    # the MTL criterion masks text with lengths_to_mask(max over batch)
    # (s2st_loss_mtl.py:163-164), so text must be padded exactly to the
    # batch max, as the real collater produces
    batch["src_text"] = batch["src_text"][:, :batch["src_text_len"].max()]
    batch["tgt_text"] = batch["tgt_text"][:, :batch["tgt_text_len"].max()]
    return dict(ref=ref, args=args, task=task, model=model,
                variables=variables, cfg=cfg, batch=batch)


def _run_ref_forward(setup):
    b = setup["batch"]
    t = torch.from_numpy
    with torch.no_grad():
        post_feat, eos, extra = setup["model"](
            src_tokens=t(np.asarray(b["src_speech"])),
            src_lengths=t(np.asarray(b["src_speech_lens"])).long(),
            prev_output_tokens=t(np.asarray(b["prev_output_tokens"])),
            incremental_state=None,
            target_lengths=t(np.asarray(b["target_lengths"])).long(),
            speaker=None,
        )
    return post_feat, eos, extra


def test_mtl_pt_import_is_complete(setup):
    """The genuinely fairseq-produced MTL .pt maps with zero unmapped keys
    (incl. decoder.ctc_proj / decoder.ctc_proj_tgt)."""
    import logging

    from s2st_tpu.models import torch_import as ti

    sd = {k: v.detach().float().numpy()
          for k, v in setup["model"].state_dict().items()}
    records = []

    class H(logging.Handler):
        def emit(self, r):
            records.append(r.getMessage())

    h = H()
    ti.logger.addHandler(h)
    try:
        variables = ti.from_fairseq_state_dict(sd)
    finally:
        ti.logger.removeHandler(h)
    assert not any("unmapped" in r for r in records), records
    p = variables["params"]
    assert p["decoder"]["ctc_proj"]["w"].shape == (
        GEOM["encoder_embed_dim"], GEOM["src_vocab_size"])
    assert p["decoder"]["ctc_proj_tgt"]["w"].shape == (
        GEOM["decoder_embed_dim"], GEOM["tgt_vocab_size"])


def test_mtl_teacher_forced_forward_parity(setup):
    """feat/post-feat/eos/attn + both CTC logit streams agree <=1e-4."""
    from s2st_tpu.models import s2st_transformer as m

    post_feat_ref, eos_ref, extra = _run_ref_forward(setup)
    feat_ref = extra["feature_out"].numpy()

    out = m.forward(setup["variables"], setup["cfg"], setup["batch"],
                    deterministic=True)
    np.testing.assert_allclose(np.asarray(out["feat_out"]), feat_ref,
                               atol=1e-4, err_msg="pre-postnet features")
    np.testing.assert_allclose(np.asarray(out["post_feat_out"]),
                               post_feat_ref.numpy(), atol=1e-4,
                               err_msg="post-postnet features")
    np.testing.assert_allclose(np.asarray(out["eos_out"])[:, :, 0],
                               eos_ref.numpy()[:, :, 0], atol=1e-4,
                               err_msg="eos logits")
    np.testing.assert_allclose(
        np.asarray(out["attn"]).transpose(0, 2, 1),
        extra["attn"].numpy(), atol=1e-4, err_msg="cross-attention")

    # src CTC stream: reference projects encoder tap 0 through
    # decoder.ctc_proj (s2st_transformer_mtl.py:363-367)
    dec = setup["model"].decoder
    with torch.no_grad():
        ref_ctc = dec.ctc_proj(
            extra["out_middle_layers"][0].transpose(0, 1)).numpy()
        ref_ctc_tgt = dec.ctc_proj_tgt(
            extra["out_middle_layers_decoder"][0].transpose(0, 1)).numpy()
    np.testing.assert_allclose(np.asarray(out["ctc_logits"]), ref_ctc,
                               atol=1e-4, err_msg="src CTC logits")
    np.testing.assert_allclose(np.asarray(out["ctc_tgt_logits"]),
                               ref_ctc_tgt, atol=1e-4,
                               err_msg="tgt CTC logits (decoder tap)")


def test_mtl_loss_term_parity(setup):
    """Every s2st_loss_mtl term agrees (l1/mse/eos <=1e-4; both CTC
    streams <=2e-3 — fp32 log-softmax accumulation differences)."""
    ref = setup["ref"]
    crit = ref.s2st_loss_mtl.Tacotron2Criterion(
        task=setup["task"], sentence_avg=False,
        n_frames_per_step=GEOM["n_frames_per_step"],
        use_guided_attention_loss=False,
        guided_attention_loss_sigma=0.4,
        bce_pos_weight=5.0, ctc_weight=CTC_W, ctc_weight_tgt=CTC_TGT_W)
    b = setup["batch"]
    t = torch.from_numpy
    sample = {
        "net_input": {
            "src_speech": t(np.asarray(b["src_speech"])),
            "src_speech_lens": t(np.asarray(b["src_speech_lens"])).long(),
            "prev_output_tokens": t(np.asarray(b["prev_output_tokens"])),
        },
        "tgt_speech": t(np.asarray(b["tgt_speech"])),
        "target_lengths": t(np.asarray(b["target_lengths"])).long(),
        "src_text": t(np.asarray(b["src_text"])).long(),
        "src_text_len": t(np.asarray(b["src_text_len"])).long(),
        "tgt_text": t(np.asarray(b["tgt_text"])).long(),
        "tgt_text_len": t(np.asarray(b["tgt_text_len"])).long(),
        "ntokens": int(np.sum(b["target_lengths"])),
        "nsentences": b["src_speech"].shape[0],
        "speaker": None,
    }
    with torch.no_grad():
        _, _, logging_output = crit.forward(setup["model"], sample)

    from s2st_tpu.train.losses import LossConfig, s2st_loss

    lcfg = LossConfig(bce_pos_weight=5.0, use_guided_attention_loss=False,
                      ctc_weight=CTC_W, ctc_weight_tgt=CTC_TGT_W,
                      asr_ce_weight=0.0, st_ce_weight=0.0)
    _, extras = s2st_loss(setup["variables"], setup["cfg"], lcfg,
                          setup["batch"], train=False)
    ours = {k: float(v) for k, v in extras["logging"].items()}

    for term, tol in [("l1_loss", 1e-4), ("mse_loss", 1e-4),
                      ("eos_loss", 1e-4), ("ctc_loss", 2e-3),
                      ("ctc_loss_tgt", 2e-3), ("loss", 4e-3)]:
        assert abs(ours[term] - logging_output[term]) <= tol, (
            term, ours[term], logging_output[term])
