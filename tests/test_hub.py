"""Programmatic hub interface (parity: fairseq/hub_utils.py
GeneratorHubInterface.from_pretrained + translate/sample/score/generate;
torch.hub itself documented out of scope in s2st_tpu/hub.py).

The 3-line flow under test::

    from s2st_tpu import hub
    m = hub.from_pretrained(save_dir)
    m.translate("s1 s2")
"""

import numpy as np
import pytest

from tests.make_tiny_corpus import make_tiny_corpus


@pytest.fixture(scope="module")
def mt_save_dir(tmp_path_factory):
    """Tiny reversal MT model trained enough to be deterministic."""
    d = tmp_path_factory.mktemp("hub_mt")
    from s2st_tpu.benchmark.synthetic import make_reversal_mt_corpus
    from s2st_tpu.cli.preprocess import main as pp
    from s2st_tpu.cli.train import main as train_main
    c = make_reversal_mt_corpus(d / "text", n_train=80, n_valid=8, n_test=8)
    bin_dir = d / "bin"
    assert pp(["--source-lang", "src", "--target-lang", "tgt",
               "--trainpref", c["prefs"]["train"],
               "--validpref", c["prefs"]["valid"],
               "--testpref", c["prefs"]["test"],
               "--destdir", str(bin_dir), "--workers", "1"]) == 0
    assert train_main([
        str(bin_dir), "--task", "translation", "--arch", "transformer_tiny",
        "--criterion", "label_smoothed_cross_entropy",
        "--label-smoothing", "0.1", "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "600", "--max-epoch", "2",
        "--save-dir", str(d / "ckpt"), "--seed", "1",
        "--share-decoder-input-output-embed",
        "--no-epoch-checkpoints"]) == 0
    return d / "ckpt"


def test_hub_translate_three_lines(mt_save_dir):
    from s2st_tpu import hub
    m = hub.from_pretrained(str(mt_save_dir))
    out = m.translate("s1 s2 s3", beam=2)
    assert isinstance(out, str)
    # a 2-epoch tiny model needn't be right, but must emit target-side
    # vocabulary (or nothing), never source-side or specials
    assert all(w.startswith("t") for w in out.split())


def test_hub_translate_batch_and_generate(mt_save_dir):
    from s2st_tpu import hub
    m = hub.from_pretrained(str(mt_save_dir))
    outs = m.translate(["s1 s2", "s3 s4 s5"], beam=2)
    assert isinstance(outs, list) and len(outs) == 2
    hypos = m.generate([m.encode("s1 s2")], beam=2)
    assert len(hypos) == 1 and len(hypos[0]) == 2
    assert hypos[0][0]["score"] >= hypos[0][1]["score"]
    # decode round-trips the top hypothesis to the translate() output
    assert m.decode(hypos[0][0]["tokens"]) == m.translate("s1 s2", beam=2)


def test_hub_score_teacher_forced(mt_save_dir):
    from s2st_tpu import hub
    m = hub.from_pretrained(str(mt_save_dir))
    res = m.score("s1 s2 s3", "t3 t2 t1")
    assert res["positional_scores"].shape == (4,)  # 3 words + eos
    assert res["score"] == pytest.approx(res["positional_scores"].sum())
    assert np.all(res["positional_scores"] <= 0)


def test_hub_overrides_and_checkpoint_file(mt_save_dir):
    from s2st_tpu import hub
    m = hub.from_pretrained(str(mt_save_dir),
                            checkpoint_file="checkpoint_last.npz",
                            lenpen=2.0)
    assert m.args.lenpen == 2.0
    assert isinstance(m.translate("s1", beam=2), str)


@pytest.fixture(scope="module")
def lm_save_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hub_lm")
    from s2st_tpu.benchmark.synthetic import make_markov_lm_corpus
    from s2st_tpu.cli.preprocess import main as pp
    from s2st_tpu.cli.train import main as train_main
    c = make_markov_lm_corpus(d / "text", n_train=120, n_valid=12,
                              n_test=12)
    bin_dir = d / "bin"
    assert pp(["--only-source", "--trainpref", c["prefs"]["train"],
               "--validpref", c["prefs"]["valid"],
               "--testpref", c["prefs"]["test"],
               "--destdir", str(bin_dir), "--workers", "1"]) == 0
    assert train_main([
        str(bin_dir), "--task", "language_modeling",
        "--arch", "transformer_lm_gpt2_tiny", "--criterion", "cross_entropy",
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "512", "--max-epoch", "1",
        "--tokens-per-sample", "64", "--sample-break-mode", "complete",
        "--save-dir", str(d / "ckpt"), "--seed", "1",
        "--share-decoder-input-output-embed",
        "--no-epoch-checkpoints"]) == 0
    return d / "ckpt"


def test_hub_lm_score_and_sample(lm_save_dir):
    from s2st_tpu import hub
    m = hub.from_pretrained(str(lm_save_dir))
    res = m.score("w1 w2 w3")
    assert res["perplexity"] > 1.0
    assert res["positional_scores"].shape == (4,)
    out = m.sample("w1", max_len=8)
    assert isinstance(out, str) and out.split()[0] == "w1"


@pytest.fixture(scope="module")
def s2st_save(tmp_path_factory):
    d = tmp_path_factory.mktemp("hub_s2st")
    corpus = make_tiny_corpus(d / "corpus")
    from s2st_tpu.cli.train import main as train_main
    save_dir = d / "ckpt"
    assert train_main([
        str(corpus), "--save-dir", str(save_dir),
        "--config-yaml", "config.yaml",
        "--train-subset", "train", "--valid-subset", "dev",
        "--task", "s2s_translation", "--criterion", "s2st_loss",
        "--arch", "s2st_transformer",
        "--encoder-layers", "2", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "2", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8",
        "--max-tokens", "2000", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
        "--clip-norm", "1.0", "--n-frames-per-step", "1",
        "--bce-pos-weight", "5.0", "--seed", "1",
        "--encoder-normalize-before", "--decoder-normalize-before",
        "--max-source-positions", "128", "--max-target-positions", "128",
        "--required-batch-size-multiple", "1",
        "--spec-bwd-max-iter", "2",
        "--log-interval", "1"]) == 0
    return corpus, save_dir


def test_hub_s2st_synthesize_waveform(s2st_save):
    corpus, save_dir = s2st_save
    from s2st_tpu import hub
    m = hub.from_pretrained(str(save_dir))
    feats = np.load(str(corpus / "features" / "test_0_src.npy"))
    wave, sr = m.synthesize(feats)
    assert sr == 16000
    assert wave.ndim == 1 and wave.dtype == np.float32
    assert wave.size > 0 and np.isfinite(wave).all()
    # batch form
    outs = m.synthesize([feats, feats[:10]])
    assert len(outs) == 2 and all(w.ndim == 1 for w, _ in outs)


def test_hub_missing_config_echo_raises(tmp_path):
    """Pre-echo checkpoints produce an actionable error."""
    import numpy as np
    from s2st_tpu import hub
    p = tmp_path / "old.npz"
    np.savez(p, **{"params::x": np.zeros(2), "__meta__": np.frombuffer(
        b'{"step": 0}', dtype=np.uint8)})
    with pytest.raises(ValueError, match="no embedded config"):
        hub.from_pretrained(str(p))


@pytest.fixture(scope="module")
def roberta_save(tmp_path_factory):
    import random
    random.seed(0)
    d = str(tmp_path_factory.mktemp("hub_roberta"))
    for split, n in (("train", 60), ("valid", 8)):
        with open(f"{d}/{split}.txt", "w") as f:
            for _ in range(n):
                f.write(" ".join(f"w{random.randrange(12)}"
                                 for _ in range(random.randint(5, 10)))
                        + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    bin_dir = f"{d}/bin"
    assert pp(["--only-source", "--trainpref", f"{d}/train.txt",
               "--validpref", f"{d}/valid.txt", "--destdir", bin_dir,
               "--workers", "1"]) == 0
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        bin_dir, "--task", "masked_lm", "--arch", "roberta",
        "--criterion", "masked_lm",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "512", "--max-epoch", "1",
        "--tokens-per-sample", "32", "--sample-break-mode", "complete",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]) == 0
    return f"{d}/ckpt"


def test_hub_roberta_extract_and_fill_mask(roberta_save):
    """RobertaHubInterface parity surface
    (fairseq/models/roberta/hub_interface.py): encode framing,
    extract_features shape, fill_mask candidates."""
    from s2st_tpu import hub
    m = hub.from_pretrained(roberta_save)
    toks = m.encode("w1 w2 w3")
    assert toks[0] == m.d.bos() and toks[-1] == m.d.eos()
    assert m.decode(toks) == "w1 w2 w3"
    feats = m.extract_features(toks)
    assert feats.shape == (1, len(toks), 16)
    out = m.fill_mask("w1 <mask> w3", topk=3)
    assert len(out) == 3
    filled, prob, tok = out[0]
    assert "<mask>" not in filled and 0.0 < prob <= 1.0
    assert out[0][1] >= out[1][1] >= out[2][1]
    # ADVICE r4: exactly one <mask> required; zero or two must raise,
    # matching the reference hub_interface asserts
    with pytest.raises(ValueError, match="exactly one"):
        m.fill_mask("w1 <mask> <mask>", topk=3)
    with pytest.raises(ValueError, match="exactly one"):
        m.fill_mask("w1 w2 w3", topk=3)


def test_hub_fill_mask_without_mask_token_raises(mt_save_dir):
    """ADVICE r4: a dictionary without <mask> must raise, not silently
    substitute unk and emit plausible-looking garbage."""
    from s2st_tpu import hub
    from s2st_tpu.hub import RobertaHubInterface
    m = hub.from_pretrained(mt_save_dir)
    # MT checkpoints have no <mask>; grab a Roberta-style view over an
    # arbitrary mask-less dictionary via the class guard directly
    if isinstance(m, RobertaHubInterface):
        with pytest.raises(ValueError, match="no <mask>"):
            m.fill_mask("a <mask> b")
    else:
        # construct the guard condition without a full roberta train:
        # any hub with _mask_idx None must refuse
        class _Stub(RobertaHubInterface):
            def __init__(self):
                self._mask_idx = None
        with pytest.raises(ValueError, match="no <mask>"):
            _Stub().fill_mask("a <mask> b")


@pytest.fixture(scope="module")
def sentence_pred_save(tmp_path_factory):
    import random
    random.seed(0)
    d = str(tmp_path_factory.mktemp("hub_sp"))
    for split, n in (("train", 80), ("valid", 8)):
        with open(f"{d}/{split}.inp", "w") as fi, \
                open(f"{d}/{split}.lbl", "w") as fl:
            for _ in range(n):
                L = random.randint(3, 8)
                idx = [random.randrange(1, 10) for _ in range(L)]
                if random.random() < 0.5:
                    idx[random.randrange(L)] = 0
                fi.write(" ".join(f"w{i}" for i in idx) + "\n")
                fl.write(("yes" if 0 in idx else "no") + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    assert pp(["--only-source", "--trainpref", f"{d}/train.inp",
               "--validpref", f"{d}/valid.inp",
               "--destdir", f"{d}/bin/input0", "--workers", "1"]) == 0
    assert pp(["--only-source", "--trainpref", f"{d}/train.lbl",
               "--validpref", f"{d}/valid.lbl",
               "--destdir", f"{d}/bin/label", "--workers", "1"]) == 0
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        f"{d}/bin", "--task", "sentence_prediction", "--arch", "roberta",
        "--criterion", "sentence_prediction", "--num-classes", "2",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "512", "--max-epoch", "1",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--no-epoch-checkpoints"]) == 0
    return f"{d}/ckpt"


def test_hub_roberta_predict_classification(sentence_pred_save):
    from s2st_tpu import hub
    m = hub.from_pretrained(sentence_pred_save)
    lp = m.predict("sentence_classification_head", m.encode("w0 w1 w2"))
    assert lp.shape == (1, 2)
    assert np.allclose(np.exp(lp).sum(), 1.0, atol=1e-4)
    logits = m.predict("sentence_classification_head",
                       m.encode("w0 w1 w2"), return_logits=True)
    assert logits.shape == (1, 2)
