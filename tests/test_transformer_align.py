"""transformer_align + label_smoothed_cross_entropy_with_alignment.

Parity targets (the reference's own code, imported weights):
  * supervised-layer attention + logits vs TransformerAlignModel, with
    and without --full-context-alignment;
  * the batch-flattened alignment pairs/weights vs the reference's own
    language_pair_dataset collate;
  * the alignment loss term vs the reference criterion's
    compute_alignment_loss on identical attention.
Plus a preprocess(--align-suffix) -> train(--load-alignments) CLI e2e.
"""

import argparse

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

ATOL = 1e-4
VOCAB = 24
GEO = dict(dim=16, ffn=32, heads=2, layers=3)


def _dictionary(ref):
    d = ref.Dictionary()
    for i in range(VOCAB - len(d)):
        d.add_symbol(f"w{i}")
    return d


def _ref_model(ref, full_context):
    from fairseq.models.transformer_align import TransformerAlignModel
    d = _dictionary(ref)
    a = argparse.Namespace()
    a.encoder_embed_dim = GEO["dim"]
    a.encoder_ffn_embed_dim = GEO["ffn"]
    a.encoder_layers = GEO["layers"]
    a.encoder_attention_heads = GEO["heads"]
    a.decoder_embed_dim = GEO["dim"]
    a.decoder_ffn_embed_dim = GEO["ffn"]
    a.decoder_layers = GEO["layers"]
    a.decoder_attention_heads = GEO["heads"]
    a.dropout = 0.0
    a.attention_dropout = 0.0
    a.activation_dropout = 0.0
    a.encoder_normalize_before = False
    a.decoder_normalize_before = False
    a.share_all_embeddings = False
    a.share_decoder_input_output_embed = False
    a.encoder_embed_path = None
    a.decoder_embed_path = None
    a.encoder_learned_pos = False
    a.decoder_learned_pos = False
    a.no_token_positional_embeddings = False
    a.no_scale_embedding = False
    a.layernorm_embedding = False
    a.adaptive_softmax_cutoff = None
    a.adaptive_input = False
    a.no_cross_attention = False
    a.cross_self_attention = False
    a.tie_adaptive_weights = False
    a.max_source_positions = 128
    a.max_target_positions = 128
    a.checkpoint_activations = False
    a.offload_activations = False
    a.encoder_layerdrop = 0.0
    a.decoder_layerdrop = 0.0
    a.quant_noise_pq = 0.0
    a.quant_noise_pq_block_size = 8
    a.quant_noise_scalar = 0.0
    a.alignment_heads = 1
    a.alignment_layer = 1
    a.full_context_alignment = full_context
    a.source_lang, a.target_lang = "src", "tgt"
    a.left_pad_source, a.left_pad_target = True, False

    class _Task:
        source_dictionary = d
        target_dictionary = d

    torch.manual_seed(0)
    model = TransformerAlignModel.build_model(a, _Task)
    model.eval()
    return model, a


def _our(model):
    import jax
    import jax.numpy as jnp

    from s2st_tpu.models import transformer_align as ta
    from s2st_tpu.models import transformer_text as tt
    from s2st_tpu.models.torch_import import \
        transformer_text_from_fairseq_state_dict
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    variables = jax.tree_util.tree_map(
        jnp.asarray, transformer_text_from_fairseq_state_dict(sd))
    base = tt.TransformerTextConfig(
        src_vocab_size=VOCAB, tgt_vocab_size=VOCAB,
        encoder_layers=GEO["layers"], encoder_embed_dim=GEO["dim"],
        encoder_ffn_embed_dim=GEO["ffn"],
        encoder_attention_heads=GEO["heads"],
        decoder_layers=GEO["layers"], decoder_embed_dim=GEO["dim"],
        decoder_ffn_embed_dim=GEO["ffn"],
        decoder_attention_heads=GEO["heads"],
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        max_source_positions=128, max_target_positions=128,
        dtype=jnp.float32)
    cfg = ta.TransformerAlignConfig(
        base=base, alignment_heads=1, alignment_layer=1,
        full_context_alignment=model.full_context_alignment)
    return variables, cfg


def _batch(r, b=3, ts=9, tt_=7):
    src = np.full((b, ts), 1, np.int64)
    prev = np.full((b, tt_), 1, np.int64)
    tgt = np.full((b, tt_), 1, np.int64)
    for i in range(b):
        sl = r.randint(3, ts + 1) if i else ts
        src[i, ts - sl:] = np.concatenate(
            [r.randint(4, VOCAB, size=sl - 1), [2]])
        tl = r.randint(2, tt_ + 1) if i else tt_
        row = np.concatenate([r.randint(4, VOCAB, size=tl - 1), [2]])
        tgt[i, :tl] = row
        prev[i, 0] = 2
        prev[i, 1:tl] = row[:-1]
    return src, prev, tgt


@pytest.mark.parametrize("full_context", [False, True])
def test_transformer_align_forward_parity(full_context):
    ref = load_reference()
    model, _ = _ref_model(ref, full_context)
    variables, cfg = _our(model)
    from s2st_tpu.models import transformer_align as ta

    r = np.random.RandomState(0)
    src, prev, _ = _batch(r)
    with torch.no_grad():
        logits_ref, extra = model(
            torch.from_numpy(src), torch.from_numpy((src != 1).sum(1)),
            torch.from_numpy(prev))
    out = ta.forward(variables, cfg,
                     {"src_tokens": src.astype(np.int32),
                      "prev_output_tokens": prev.astype(np.int32)},
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=ATOL)
    attn_ref = extra["attn"][0]
    np.testing.assert_allclose(np.asarray(out["attn"]),
                               attn_ref.numpy(), atol=ATOL)


def test_alignment_collate_and_loss_parity():
    """Our padded alignment collate equals the reference collate's
    flattened pairs/weights; the alignment loss matches the reference
    criterion's compute_alignment_loss on the same attention."""
    ref = load_reference()
    import fairseq.data.language_pair_dataset as ref_lpd

    r = np.random.RandomState(1)
    b, ts, tt_ = 3, 9, 7
    src, prev, tgt = _batch(r, b, ts, tt_)
    src_lens = (src != 1).sum(1)
    tgt_lens = (tgt != 1).sum(1)
    aligns = []
    for i in range(b):
        n = r.randint(1, 5)
        # valid indices stay below the EOS position (check_alignment);
        # make row 1 deliberately invalid to exercise the drop path
        if i == 1:
            pairs = np.asarray([[src_lens[i] - 1, 0]])
        else:
            pairs = np.stack(
                [r.randint(0, max(src_lens[i] - 1, 1), size=n),
                 r.randint(0, max(tgt_lens[i] - 1, 1), size=n)], axis=1)
        aligns.append(pairs)

    # reference collate (its own code)
    samples = [{
        "id": i,
        "source": torch.from_numpy(
            src[i, ts - src_lens[i]:].astype(np.int64)),
        "target": torch.from_numpy(tgt[i, :tgt_lens[i]].astype(np.int64)),
        "alignment": torch.from_numpy(aligns[i].astype(np.int64)),
    } for i in range(b)]
    ref_batch = ref_lpd.collate(
        samples, pad_idx=1, eos_idx=2, left_pad_source=True,
        left_pad_target=False, input_feeding=True)
    order = ref_batch["id"].numpy()           # reference sort order
    ref_pairs = ref_batch["alignments"].numpy()
    ref_w = ref_batch["align_weights"].numpy()

    # ours (items carry the same alignment, ids preserved)
    from s2st_tpu.data.language_pair_dataset import (LanguagePairDataset,
                                                     LanguagePairItem)
    ds = LanguagePairDataset([], [], None)
    items = [LanguagePairItem(
        id=i, source=src[i, ts - src_lens[i]:].astype(np.int32),
        target=tgt[i, :tgt_lens[i]].astype(np.int32),
        alignment=aligns[i]) for i in range(b)]
    ours = ds.collate(items)
    n_real = len(ref_pairs)
    got_pairs = ours["alignments"][:n_real]
    got_w = ours["align_weights"][:n_real]
    assert np.all(ours["align_weights"][n_real:] == 0)
    # reference stores [src, tgt_flat] column order (align[:, 0]=src)
    np.testing.assert_array_equal(got_pairs, ref_pairs)
    np.testing.assert_allclose(got_w, ref_w, atol=1e-6)

    # loss parity on a random attention tensor through the reference's
    # own compute_alignment_loss
    from fairseq.criterions.label_smoothed_cross_entropy_with_alignment \
        import LabelSmoothedCrossEntropyCriterionWithAlignment as RefCrit
    attn = r.rand(b, tt_, ts).astype(np.float32) + 1e-3
    attn = attn / attn.sum(-1, keepdims=True)
    sample = {"alignments": torch.from_numpy(ref_pairs),
              "align_weights": torch.from_numpy(ref_w)}
    net_output = (None, {"attn": [torch.from_numpy(attn)]})
    ref_loss = RefCrit.compute_alignment_loss(
        RefCrit.__new__(RefCrit), sample, net_output)

    import jax.numpy as jnp
    flat = jnp.asarray(attn.reshape(b * tt_, ts))
    pairs_j = jnp.asarray(ours["alignments"])
    w_j = jnp.asarray(ours["align_weights"])
    probs = flat[pairs_j[:, 1], pairs_j[:, 0]]
    ours_loss = -jnp.sum(jnp.log(jnp.maximum(probs, 1e-20)) * w_j)
    np.testing.assert_allclose(float(ours_loss), float(ref_loss),
                               rtol=1e-5)


def test_transformer_align_cli_e2e(tmp_path):
    r = np.random.RandomState(0)
    words = [f"w{i}" for i in range(16)]
    for split, n in (("train", 24), ("valid", 8)):
        lens = {}
        for lang in ("de", "en"):
            with open(tmp_path / f"{split}.{lang}", "w") as f:
                lens[lang] = []
                for k in range(n):
                    ln = r.randint(3, 8)
                    lens[lang].append(ln)
                    f.write(" ".join(r.choice(words, size=ln)) + "\n")
        with open(tmp_path / f"{split}.align", "w") as f:
            for k in range(n):
                npairs = r.randint(1, 4)
                f.write(" ".join(
                    f"{r.randint(0, lens['de'][k])}-"
                    f"{r.randint(0, lens['en'][k])}"
                    for _ in range(npairs)) + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    assert pp(["--source-lang", "de", "--target-lang", "en",
               "--trainpref", str(tmp_path / "train"),
               "--validpref", str(tmp_path / "valid"),
               "--align-suffix", "align",
               "--destdir", str(tmp_path / "bin"), "--workers", "1"]) == 0
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        str(tmp_path / "bin"), "--task", "translation",
        "--source-lang", "de", "--target-lang", "en",
        "--arch", "transformer_align", "--load-alignments",
        "--criterion", "label_smoothed_cross_entropy_with_alignment",
        "--label-smoothing", "0.1", "--alignment-lambda", "0.05",
        "--alignment-layer", "1", "--alignment-heads", "1",
        "--save-dir", str(tmp_path / "ckpt"),
        "--encoder-layers", "2", "--decoder-layers", "2",
        "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
        "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
        "--max-tokens", "512", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001", "--seed", "1",
        "--log-interval", "1", "--required-batch-size-multiple", "1",
    ]) == 0
    from s2st_tpu.train.checkpoint import load_checkpoint_file
    _, meta = load_checkpoint_file(
        str(tmp_path / "ckpt" / "checkpoint_last.npz"))
    assert meta["step"] >= 1
