"""Dynamic CRF layer: score/normalizer/viterbi parity vs the reference's
DynamicCRF module, and a NAT-CRF e2e train/decode run.
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.ops import crf as crf_ops

V, R, K = 24, 8, 6


def _setup():
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    load_reference()
    from fairseq.modules.dynamic_crf_layer import DynamicCRF
    torch.manual_seed(0)
    mod = DynamicCRF(V, low_rank=R, beam_size=K)
    mod.eval()
    p = {"E1": {"w": jnp.asarray(mod.E1.weight.detach().numpy())},
         "E2": {"w": jnp.asarray(mod.E2.weight.detach().numpy())}}
    r = np.random.RandomState(0)
    b, t = 3, 7
    em = r.randn(b, t, V).astype(np.float32)
    tgt = r.randint(4, V, size=(b, t)).astype(np.int64)
    masks = np.ones((b, t), bool)
    masks[1, 5:] = False
    masks[2, 4:] = False
    return torch, mod, p, em, tgt, masks


def test_crf_log_likelihood_parity():
    torch, mod, p, em, tgt, masks = _setup()
    with torch.no_grad():
        ref = mod(torch.from_numpy(em), torch.from_numpy(tgt),
                  torch.from_numpy(masks)).numpy()
    ours = np.asarray(crf_ops.crf_log_likelihood(
        p, jnp.asarray(em), jnp.asarray(tgt.astype(np.int32)),
        jnp.asarray(masks), K))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_crf_viterbi_parity():
    torch, mod, p, em, tgt, masks = _setup()
    with torch.no_grad():
        ref_scores, ref_tokens = mod.forward_decoder(
            torch.from_numpy(em), torch.from_numpy(masks))
    ours_scores, ours_tokens = crf_ops.crf_viterbi(
        p, jnp.asarray(em), jnp.asarray(masks), K)
    np.testing.assert_array_equal(np.asarray(ours_tokens),
                                  ref_tokens.numpy())
    np.testing.assert_allclose(np.asarray(ours_scores),
                               ref_scores.numpy(), atol=1e-4)


def test_nacrf_e2e(tmp_path, capsys):
    d = str(tmp_path)
    random.seed(0)
    for split, n in (("train", 80), ("valid", 8), ("test", 6)):
        with open(f"{d}/{split}.src", "w") as fs, \
                open(f"{d}/{split}.tgt", "w") as ft:
            for _ in range(n):
                L = random.randint(3, 6)
                idx = [random.randrange(8) for _ in range(L)]
                fs.write(" ".join(f"w{i}" for i in idx) + "\n")
                ft.write(" ".join(f"w{i}" for i in idx) + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    bin_dir = f"{d}/bin"
    pp(["--source-lang", "src", "--target-lang", "tgt",
        "--joined-dictionary", "--trainpref", f"{d}/train",
        "--validpref", f"{d}/valid", "--testpref", f"{d}/test",
        "--destdir", bin_dir, "--workers", "1"])
    common = ["--encoder-layers", "1", "--decoder-layers", "1",
              "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
              "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim",
              "32", "--encoder-attention-heads", "2",
              "--decoder-attention-heads", "2",
              "--crf-lowrank-approx", "4", "--crf-beam-approx", "4"]
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        bin_dir, "--task", "translation_lev",
        "--arch", "nacrf_transformer", "--noise", "full_mask",
        "--criterion", "nat_loss", *common,
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "400", "--max-epoch", "2",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]) == 0
    capsys.readouterr()
    from s2st_tpu.cli.generate import main as gen_main
    assert gen_main([
        bin_dir, "--task", "translation_lev",
        "--arch", "nacrf_transformer", *common,
        "--path", f"{d}/ckpt/checkpoint_last.npz",
        "--gen-subset", "test", "--iter-decode-max-iter", "2",
        "--max-tokens", "400", "--max-len-b", "12",
        "--scoring", "sacrebleu"]) == 0
    out = capsys.readouterr().out
    assert out.count("H-") == 6 and "Generate test" in out
