"""Reference-numerics parity for the TEXT transformer family
(fairseq/models/transformer/ TransformerModel — the `transformer` archs
used by fairseq-train/generate for text MT).

Builds the reference torch model at a tiny geometry, exports a genuinely
fairseq-produced state_dict, imports it through
torch_import.transformer_text_from_fairseq_state_dict, and asserts:

  * teacher-forced forward logits agree (left-padded sources — the
    translation task's collate default — and right-padded),
  * the tied-embedding variant (--share-all-embeddings) agrees,
  * a full beam decode returns the same hypotheses as the reference's
    SequenceGenerator.
"""

import argparse

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

ATOL = 1e-4

G = dict(vocab=30, dim=16, ffn=32, heads=2, enc_layers=2, dec_layers=2)


def _dictionary(ref, n_total):
    d = ref.Dictionary()
    for i in range(n_total - len(d)):
        d.add_symbol(f"w{i}")
    assert len(d) == n_total and d.pad() == 1 and d.eos() == 2
    return d


def _args(**over):
    a = argparse.Namespace()
    a.encoder_embed_dim = G["dim"]
    a.encoder_ffn_embed_dim = G["ffn"]
    a.encoder_layers = G["enc_layers"]
    a.encoder_attention_heads = G["heads"]
    a.decoder_embed_dim = G["dim"]
    a.decoder_ffn_embed_dim = G["ffn"]
    a.decoder_layers = G["dec_layers"]
    a.decoder_attention_heads = G["heads"]
    a.dropout = 0.0
    a.attention_dropout = 0.0
    a.activation_dropout = 0.0
    a.max_source_positions = 256
    a.max_target_positions = 256
    for k, v in over.items():
        setattr(a, k, v)
    return a


def _build_reference_model(ref, args, seed=0):
    import importlib
    legacy = importlib.import_module(
        "fairseq.models.transformer.transformer_legacy")
    legacy.base_architecture(args)
    torch.manual_seed(seed)

    class _Task:
        source_dictionary = _dictionary(ref, G["vocab"])
        target_dictionary = _dictionary(ref, G["vocab"])

    model = legacy.TransformerModel.build_model(args, _Task)
    model.eval()
    return model, _Task


def _our_model(model, share_all=False, share_dec=False, pre_norm=False):
    import jax
    import jax.numpy as jnp
    from s2st_tpu.models.torch_import import \
        transformer_text_from_fairseq_state_dict
    from s2st_tpu.models.transformer_text import TransformerTextConfig

    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    variables = jax.tree_util.tree_map(
        jnp.asarray, transformer_text_from_fairseq_state_dict(
            sd, share_all_embeddings=share_all,
            share_decoder_input_output_embed=share_dec))
    cfg = TransformerTextConfig(
        src_vocab_size=G["vocab"], tgt_vocab_size=G["vocab"],
        encoder_layers=G["enc_layers"], encoder_embed_dim=G["dim"],
        encoder_ffn_embed_dim=G["ffn"], encoder_attention_heads=G["heads"],
        encoder_normalize_before=pre_norm,
        decoder_layers=G["dec_layers"], decoder_embed_dim=G["dim"],
        decoder_ffn_embed_dim=G["ffn"], decoder_attention_heads=G["heads"],
        decoder_normalize_before=pre_norm,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        share_all_embeddings=share_all,
        share_decoder_input_output_embed=share_dec,
        max_source_positions=256, max_target_positions=256,
        dtype=jnp.float32)
    return variables, cfg


def _src_batch(r, b, t, vocab, left_pad):
    """(B, T) eos-terminated rows, PAD on the left or right."""
    lens = r.randint(2, t + 1, size=b)
    lens[0] = t
    out = np.full((b, t), 1, np.int64)
    for i in range(b):
        row = np.concatenate([r.randint(4, vocab, size=lens[i] - 1), [2]])
        if left_pad:
            out[i, t - lens[i]:] = row
        else:
            out[i, :lens[i]] = row
    return out, lens.astype(np.int64)


def _prev_tokens(r, b, t, vocab):
    """prev_output_tokens: EOS first, then tokens, right-PAD."""
    lens = r.randint(2, t + 1, size=b)
    lens[0] = t
    out = np.full((b, t), 1, np.int64)
    for i in range(b):
        out[i, 0] = 2
        out[i, 1:lens[i]] = r.randint(4, vocab, size=lens[i] - 1)
    return out, lens.astype(np.int64)


@pytest.mark.parametrize("left_pad", [True, False])
def test_forward_parity(left_pad):
    ref = load_reference()
    model, _ = _build_reference_model(ref, _args())
    variables, cfg = _our_model(model)
    from s2st_tpu.models import transformer_text as tt

    r = np.random.RandomState(0)
    src, src_lens = _src_batch(r, 3, 13, G["vocab"], left_pad)
    prev, _ = _prev_tokens(r, 3, 9, G["vocab"])

    with torch.no_grad():
        logits_ref, _ = model(torch.from_numpy(src),
                              torch.from_numpy(src_lens),
                              torch.from_numpy(prev))

    out = tt.forward(variables, cfg,
                     {"src_tokens": src.astype(np.int32),
                      "prev_output_tokens": prev.astype(np.int32)},
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=ATOL)


@pytest.mark.parametrize("mode", ["share_all", "share_dec", "pre_norm"])
def test_forward_parity_variants(mode):
    ref = load_reference()
    over = dict(share_all_embeddings=(mode == "share_all"),
                share_decoder_input_output_embed=(mode == "share_dec"))
    if mode == "pre_norm":
        over.update(encoder_normalize_before=True,
                    decoder_normalize_before=True)
    model, _ = _build_reference_model(ref, _args(**over), seed=1)
    variables, cfg = _our_model(model,
                                share_all=(mode == "share_all"),
                                share_dec=(mode == "share_dec"),
                                pre_norm=(mode == "pre_norm"))
    from s2st_tpu.models import transformer_text as tt

    r = np.random.RandomState(1)
    src, src_lens = _src_batch(r, 2, 11, G["vocab"], True)
    prev, _ = _prev_tokens(r, 2, 7, G["vocab"])

    with torch.no_grad():
        logits_ref, _ = model(torch.from_numpy(src),
                              torch.from_numpy(src_lens),
                              torch.from_numpy(prev))
    out = tt.forward(variables, cfg,
                     {"src_tokens": src.astype(np.int32),
                      "prev_output_tokens": prev.astype(np.int32)},
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=ATOL)


def test_beam_search_parity_vs_reference_generator():
    """Full beam decode: our jitted beam search over the text decoder
    (which="decoder") == the reference SequenceGenerator, tokens exactly,
    scores <=1e-4."""
    import importlib
    ref = load_reference()
    model, task = _build_reference_model(ref, _args(), seed=2)
    variables, cfg = _our_model(model)
    sg_mod = importlib.import_module("fairseq.sequence_generator")

    r = np.random.RandomState(2)
    src, src_lens = _src_batch(r, 3, 9, G["vocab"], True)
    gen = sg_mod.SequenceGenerator(
        [model], task.target_dictionary, beam_size=4, max_len_a=0,
        max_len_b=12, min_len=1, normalize_scores=True, len_penalty=1.0,
        temperature=1.0)
    sample = {"net_input": {
        "src_tokens": torch.from_numpy(src),
        "src_lengths": torch.from_numpy(src_lens)}}
    with torch.no_grad():
        hypos = gen.generate([model], sample)

    from s2st_tpu.generate.sequence_generator import (BeamConfig,
                                                      beam_search_aux)
    from s2st_tpu.models import transformer_text as tt

    enc = tt.encode(variables, cfg, src.astype(np.int32),
                    deterministic=True)
    out = beam_search_aux(tt.generation_variables(variables, cfg),
                          tt._aux_cfg(cfg), "decoder",
                          enc["encoder_out"], enc["encoder_padding_mask"],
                          BeamConfig(beam=4, max_len=12))
    tokens = np.asarray(out["tokens"])
    lengths = np.asarray(out["lengths"])
    scores = np.asarray(out["scores"])
    pos_scores = np.asarray(out["pos_scores"])

    for b in range(tokens.shape[0]):
        for k in range(4):
            ref_toks = hypos[b][k]["tokens"].numpy()
            n = int(lengths[b, k])
            ours_toks = tokens[b, k, 1:n + 1]
            np.testing.assert_array_equal(ours_toks, ref_toks,
                                          err_msg=f"hypo[{b}][{k}] tokens")
            assert abs(scores[b, k] - float(hypos[b][k]["score"])) <= 1e-4
            # positional scores (the P- lines) match fairseq's
            np.testing.assert_allclose(
                pos_scores[b, k, 1:n + 1],
                hypos[b][k]["positional_scores"].numpy(), atol=1e-4,
                err_msg=f"hypo[{b}][{k}] positional scores")


def test_checkpoint_roundtrip_through_real_pt(tmp_path):
    """Save the reference model with torch.save (a genuine fairseq-format
    .pt), reload, import — proving the import path end-to-end on a file the
    reference code produced."""
    ref = load_reference()
    model, _ = _build_reference_model(ref, _args(), seed=3)
    path = tmp_path / "checkpoint.pt"
    torch.save({"model": model.state_dict()}, str(path))

    loaded = torch.load(str(path), map_location="cpu", weights_only=False)
    sd = {k: v.detach().float().numpy() for k, v in loaded["model"].items()}
    from s2st_tpu.models.torch_import import \
        transformer_text_from_fairseq_state_dict
    tree = transformer_text_from_fairseq_state_dict(sd)
    assert "layer1" in tree["params"]["encoder"]
    assert "out_proj" in tree["params"]["decoder"]
