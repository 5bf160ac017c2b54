"""Token-block datasets + language_modeling task + transformer_lm parity.

Token-block oracles are hand-computed from the reference's Cython spec
(fairseq/data/token_block_utils_fast.pyx — the compiled extension is not
importable in this image, so the tests pin the documented semantics with
worked examples); the LM model itself is parity-tested against the
reference's own TransformerLanguageModel through a genuine state_dict.
"""

import argparse
import random

import numpy as np
import pytest

from s2st_tpu.data.token_block_dataset import (MonolingualDataset,
                                               TokenBlockDataset,
                                               block_to_dataset_index,
                                               get_slice_indices)


class _Rows:
    def __init__(self, rows):
        self.rows = [np.asarray(r, np.int64) for r in rows]
        self.sizes = np.asarray([len(r) for r in rows])

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i):
        return self.rows[i]


def test_slice_indices_none_mode():
    # sizes [3,4,5] total 12, block 5 -> ceil(12/5)=3 blocks of <=5
    out = get_slice_indices(np.array([3, 4, 5]), "none", 5)
    np.testing.assert_array_equal(out, [[0, 5], [5, 10], [10, 12]])


def test_slice_indices_complete_mode():
    # greedy whole sentences up to block: [3+4=7>? block 8 -> 3+4=7 ok,
    # +5=12>8 -> block [0,7); then 5 alone -> [7,12)
    out = get_slice_indices(np.array([3, 4, 5]), "complete", 8)
    np.testing.assert_array_equal(out, [[0, 7], [7, 12]])
    # oversized sentence gets its own block (curr_size == 0 branch)
    out = get_slice_indices(np.array([10, 2]), "complete", 4)
    np.testing.assert_array_equal(out, [[0, 10], [10, 12]])


def test_slice_indices_complete_doc_mode():
    # doc separator = size-1 sentence; blocks never cross it and the
    # separator tokens are skipped (not emitted)
    sizes = np.array([3, 4, 1, 5, 2])  # doc1: [3,4], sep, doc2: [5,2]
    out = get_slice_indices(sizes, "complete_doc", 8, document_sep_len=1)
    np.testing.assert_array_equal(out, [[0, 7], [8, 15]])


def test_slice_indices_eos_mode():
    out = get_slice_indices(np.array([3, 4, 5]), "eos", 0)
    np.testing.assert_array_equal(out, [[0, 3], [3, 7], [7, 12]])


def test_block_to_dataset_index():
    sizes = np.array([3, 4, 5])
    sl = get_slice_indices(sizes, "none", 5)
    b2d = block_to_dataset_index(sizes, sl)
    # block 0 = tokens [0,5): starts in sent 0 offset 0, ends in sent 1
    # block 1 = tokens [5,10): sent 1 offset 2, ends in sent 2
    # block 2 = tokens [10,12): sent 2 offset 3, ends in sent 2
    np.testing.assert_array_equal(b2d, [[0, 0, 1], [1, 2, 2], [2, 3, 2]])


def test_token_block_include_targets_shifts():
    """token_block_dataset.py:160-180: target = block, source = shift-1
    (eos-padded at corpus start), past_target = shift-2 (pad+eos-padded)."""
    rows = _Rows([[10, 11, 2], [12, 13, 14, 2]])
    ds = TokenBlockDataset(rows, rows.sizes, block_size=4, break_mode="none",
                           include_targets=True)
    src0, item0, past0 = ds[0]          # tokens [0,4)
    np.testing.assert_array_equal(item0, [10, 11, 2, 12])
    np.testing.assert_array_equal(src0, [2, 10, 11, 2])     # eos-led
    np.testing.assert_array_equal(past0, [1, 2, 10, 11])    # pad,eos-led
    src1, item1, past1 = ds[1]          # tokens [4,7)
    np.testing.assert_array_equal(item1, [13, 14, 2])
    np.testing.assert_array_equal(src1, [12, 13, 14])
    np.testing.assert_array_equal(past1, [2, 12, 13])


def test_monolingual_dataset_collate():
    rows = _Rows([[10, 11, 2], [12, 13, 14, 2], [15, 2]])
    block = TokenBlockDataset(rows, rows.sizes, 64, break_mode="eos",
                              include_targets=True)
    mono = MonolingualDataset(block, block.sizes, None)
    items = [mono[i] for i in range(3)]
    out = mono.collate(items)
    assert out["src_tokens"].shape == out["target"].shape
    np.testing.assert_array_equal(out["src_tokens"][0, :3], [2, 10, 11])
    np.testing.assert_array_equal(out["target"][0, :3], [10, 11, 2])
    assert out["ntokens"] == 9


def test_lm_forward_parity_vs_reference():
    """transformer_lm logits == the reference TransformerLanguageModel on
    the same batch through a genuinely fairseq-produced state_dict."""
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    ref = load_reference()
    import importlib
    lm_mod = importlib.import_module("fairseq.models.transformer_lm")

    vocab = 30
    d = ref.Dictionary()
    for i in range(vocab - len(d)):
        d.add_symbol(f"w{i}")

    a = argparse.Namespace()
    a.decoder_embed_dim = 16
    a.decoder_ffn_embed_dim = 32
    a.decoder_layers = 2
    a.decoder_attention_heads = 2
    a.dropout = 0.0
    a.attention_dropout = 0.0
    a.activation_dropout = 0.0
    a.tokens_per_sample = 64
    a.max_target_positions = 64
    a.share_decoder_input_output_embed = False
    lm_mod.base_lm_architecture(a)
    a.dropout = 0.0  # base arch re-defaults to 0.1 via safe_getattr

    class _Task:
        source_dictionary = d
        target_dictionary = d

        @classmethod
        def build_embedding(cls, *unused):
            raise NotImplementedError

    torch.manual_seed(0)
    model = lm_mod.TransformerLanguageModel.build_model(a, _Task)
    model.eval()

    import jax
    import jax.numpy as jnp
    from s2st_tpu.models import transformer_lm as tlm
    from s2st_tpu.models.torch_import import \
        transformer_lm_from_fairseq_state_dict

    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    variables = jax.tree_util.tree_map(
        jnp.asarray, transformer_lm_from_fairseq_state_dict(sd))
    cfg = tlm.TransformerLMConfig(
        vocab_size=vocab, decoder_layers=2, decoder_embed_dim=16,
        decoder_ffn_embed_dim=32, decoder_attention_heads=2,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        max_target_positions=64, dtype=jnp.float32)

    r = np.random.RandomState(0)
    src = np.full((3, 9), 1, np.int64)
    for i, L in enumerate((9, 6, 4)):
        src[i, 0] = 2
        src[i, 1:L] = r.randint(4, vocab, size=L - 1)
    with torch.no_grad():
        logits_ref, _ = model(torch.from_numpy(src))
    out = tlm.forward(variables, cfg, {"src_tokens": src.astype(np.int32)},
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.numpy(), atol=1e-4)


def test_lm_e2e(tmp_path, capsys):
    """preprocess -> train LM 2 epochs -> eval_lm prints a perplexity."""
    d = str(tmp_path)
    random.seed(0)
    for split, n in (("train", 120), ("valid", 12), ("test", 12)):
        with open(f"{d}/{split}.txt", "w") as f:
            for _ in range(n):
                L = random.randint(3, 8)
                f.write(" ".join(
                    f"w{random.randrange(12)}" for _ in range(L)) + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    bin_dir = f"{d}/bin"
    assert pp(["--only-source", "--trainpref", f"{d}/train.txt",
               "--validpref", f"{d}/valid.txt", "--testpref", f"{d}/test.txt",
               "--destdir", bin_dir, "--workers", "1"]) == 0
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        bin_dir, "--task", "language_modeling",
        "--arch", "transformer_lm_gpt2_tiny", "--criterion", "cross_entropy",
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "10",
        "--max-tokens", "512", "--max-epoch", "2",
        "--tokens-per-sample", "64", "--sample-break-mode", "complete",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--share-decoder-input-output-embed",
        "--no-epoch-checkpoints"]) == 0
    capsys.readouterr()
    from s2st_tpu.cli.eval_lm import main as eval_main
    assert eval_main([
        bin_dir, "--task", "language_modeling",
        "--arch", "transformer_lm_gpt2_tiny",
        "--path", f"{d}/ckpt/checkpoint_last.npz", "--gen-subset", "test",
        "--max-tokens", "512", "--tokens-per-sample", "64",
        "--sample-break-mode", "complete",
        "--share-decoder-input-output-embed"]) == 0
    out = capsys.readouterr().out
    assert "Perplexity:" in out
