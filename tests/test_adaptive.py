"""Adaptive input + adaptive softmax: reference-numerics parity and an
end-to-end adaptive-LM train/eval run.
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.models import adaptive as ad

VOCAB, DIM, CUTOFF = 30, 16, (10, 20)


def _load_ref():
    pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    return load_reference()


def _import_input(mod):
    """torch AdaptiveInput state -> our band tree."""
    p = {}
    for i in range(len(mod.cutoff)):
        emb = mod.embeddings[i][0].weight.detach().numpy()
        proj = mod.embeddings[i][1].weight.detach().numpy()
        p[f"band{i}"] = {"embed": {"w": jnp.asarray(emb)},
                        "proj": {"w": jnp.asarray(proj.T.copy())}}
    return p


def _import_softmax(mod):
    """torch AdaptiveSoftmax (untied) -> our tree."""
    p = {"head": {"w": jnp.asarray(
        mod.head.weight.detach().numpy().T.copy())}}
    for i, tail in enumerate(mod.tail):
        p[f"tail{i}"] = {
            "proj": {"w": jnp.asarray(tail[0].weight.detach().numpy()
                                      .T.copy())},
            "out": {"w": jnp.asarray(tail[2].weight.detach().numpy()
                                     .T.copy())},
        }
    return p


def test_adaptive_input_parity():
    torch = pytest.importorskip("torch")
    _load_ref()
    from fairseq.modules.adaptive_input import AdaptiveInput
    torch.manual_seed(0)
    mod = AdaptiveInput(VOCAB, 1, DIM, 2.0, DIM, list(CUTOFF))
    mod.eval()
    p = _import_input(mod)
    r = np.random.RandomState(0)
    toks = r.randint(0, VOCAB, size=(4, 7)).astype(np.int64)
    with torch.no_grad():
        ref = mod(torch.from_numpy(toks)).numpy()
    ours = np.asarray(ad.adaptive_input_forward(
        p, toks.astype(np.int32), CUTOFF, VOCAB))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_adaptive_softmax_log_prob_parity():
    torch = pytest.importorskip("torch")
    _load_ref()
    from fairseq.modules.adaptive_softmax import AdaptiveSoftmax
    torch.manual_seed(1)
    mod = AdaptiveSoftmax(VOCAB, DIM, list(CUTOFF), dropout=0.0,
                          factor=2.0)
    mod.eval()
    p = _import_softmax(mod)
    r = np.random.RandomState(1)
    x = r.randn(3, 5, DIM).astype(np.float32)
    with torch.no_grad():
        ref = mod.get_log_prob(torch.from_numpy(x), None).numpy()
    ours = np.asarray(ad.adaptive_log_probs(
        p, x.reshape(-1, DIM), CUTOFF, VOCAB)).reshape(3, 5, VOCAB)
    np.testing.assert_allclose(ours, ref.reshape(3, 5, VOCAB), atol=1e-5)
    # nll consistency: adaptive_nll == -log_prob[target]
    tgt = r.randint(0, VOCAB, size=(15,)).astype(np.int32)
    nll = np.asarray(ad.adaptive_nll(p, x.reshape(-1, DIM),
                                     jnp.asarray(tgt), CUTOFF, VOCAB))
    lp = ours.reshape(15, VOCAB)
    np.testing.assert_allclose(nll, -lp[np.arange(15), tgt], atol=1e-5)


def test_adaptive_softmax_tied_parity():
    torch = pytest.importorskip("torch")
    _load_ref()
    from fairseq.modules.adaptive_input import AdaptiveInput
    from fairseq.modules.adaptive_softmax import AdaptiveSoftmax
    torch.manual_seed(2)
    inp = AdaptiveInput(VOCAB, 1, DIM, 2.0, DIM, list(CUTOFF))
    mod = AdaptiveSoftmax(VOCAB, DIM, list(CUTOFF), dropout=0.0,
                          factor=2.0, adaptive_inputs=inp, tie_proj=True)
    mod.eval()
    in_p = _import_input(inp)
    tied = ad.tied_views(in_p, tie_proj=True)
    sm_p = {"class_proj": {"w": jnp.asarray(
        mod.head.class_proj.weight.detach().numpy().T.copy())}}
    r = np.random.RandomState(2)
    x = r.randn(2, 4, DIM).astype(np.float32)
    with torch.no_grad():
        ref = mod.get_log_prob(torch.from_numpy(x), None).numpy()
    ours = np.asarray(ad.adaptive_log_probs(
        sm_p, x.reshape(-1, DIM), CUTOFF, VOCAB, tied))
    np.testing.assert_allclose(ours.reshape(2, 4, VOCAB), ref, atol=1e-5)


def test_adaptive_lm_e2e(tmp_path, capsys):
    d = str(tmp_path)
    random.seed(0)
    for split, n in (("train", 150), ("valid", 15), ("test", 15)):
        with open(f"{d}/{split}.txt", "w") as f:
            for _ in range(n):
                L = random.randint(3, 8)
                f.write(" ".join(
                    f"w{random.randrange(18)}" for _ in range(L)) + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    bin_dir = f"{d}/bin"
    pp(["--only-source", "--trainpref", f"{d}/train.txt",
        "--validpref", f"{d}/valid.txt", "--testpref", f"{d}/test.txt",
        "--destdir", bin_dir, "--workers", "1"])
    from s2st_tpu.cli.train import main as train_main
    args = [
        bin_dir, "--task", "language_modeling",
        "--arch", "transformer_lm", "--criterion", "adaptive_loss",
        "--decoder-layers", "1", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--adaptive-input", "true", "--adaptive-input-cutoff", "8,16",
        "--adaptive-softmax-cutoff", "8,16",
        "--adaptive-input-factor", "2", "--adaptive-softmax-factor", "2",
        "--tie-adaptive-weights", "true", "--tie-adaptive-proj", "true",
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "256", "--max-epoch", "2",
        "--tokens-per-sample", "32", "--sample-break-mode", "none",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]
    assert train_main(args) == 0
    capsys.readouterr()
    from s2st_tpu.cli.eval_lm import main as eval_main
    assert eval_main([
        bin_dir, "--task", "language_modeling",
        "--arch", "transformer_lm",
        "--decoder-layers", "1", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--adaptive-input", "true", "--adaptive-input-cutoff", "8,16",
        "--adaptive-softmax-cutoff", "8,16",
        "--adaptive-input-factor", "2", "--adaptive-softmax-factor", "2",
        "--tie-adaptive-weights", "true", "--tie-adaptive-proj", "true",
        "--path", f"{d}/ckpt/checkpoint_last.npz", "--gen-subset", "test",
        "--max-tokens", "256", "--tokens-per-sample", "32"]) == 0
    out = capsys.readouterr().out
    assert "Perplexity:" in out
