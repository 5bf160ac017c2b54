"""Lexically constrained beam search: state-machine oracle tests against
the reference's own UnorderedConstraintState/OrderedConstraintState
(fairseq/token_generation_constraints.py), plus end-to-end constrained
decodes on the tiny model (constraints must appear in every hypothesis)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2st_tpu.generate.constrained import (build_constraint_tables,
                                           constraints_finished,
                                           init_constraint_state,
                                           pack_constraints,
                                           unpack_constraints,
                                           _advance_ordered,
                                           _advance_unordered,
                                           _state_unordered)

EOS = 2


def test_pack_unpack_roundtrip_fairseq_format():
    batch = [[[3, 1, 2], [3], [4, 5, 6, 7]], [], [[1, 8, 9, 10, 1, 4, 11, 12]]]
    packed = pack_constraints(batch)
    # fairseq's documented example (token_generation_constraints.py:41-66)
    assert packed.shape == (3, 12)
    np.testing.assert_array_equal(
        packed[0], [3, 3, 1, 2, 0, 3, 0, 4, 5, 6, 7, 0])
    np.testing.assert_array_equal(packed[1], [0] * 12)
    np.testing.assert_array_equal(
        packed[2], [1, 1, 8, 9, 10, 1, 4, 11, 12, 0, 0, 0])
    for i, sent in enumerate(batch):
        assert [list(c) for c in unpack_constraints(packed[i])] == \
            [list(c) for c in sent]


def _ref_states(constraints, representation):
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    load_reference()
    import importlib
    tgc = importlib.import_module("fairseq.token_generation_constraints")
    tensor = torch.tensor(pack_constraints([constraints])[0])
    if representation == "unordered":
        return tgc.UnorderedConstraintState.create(tensor)
    return tgc.OrderedConstraintState.create(tensor)


@pytest.mark.parametrize("constraints", [
    [[5, 6], [9]],
    [[5, 6, 7], [6, 8]],
    [[4], [4, 5], [5, 4]],
])
def test_unordered_state_machine_matches_reference(constraints):
    """Drive our trie tables and fairseq's UnorderedConstraintState with
    identical random token streams; bank and finished must agree at every
    step. (Prefix-nested constraint sets are excluded: we complete a
    terminal at the rewind like fairseq, but collapse multiplicity.)"""
    vocab = 12
    tb = build_constraint_tables(pack_constraints([constraints]), vocab,
                                 "unordered")
    arrays = {k: v[0] for k, v in tb.arrays.items()}
    rng = np.random.RandomState(3)
    for trial in range(5):
        ref = _ref_states(constraints, "unordered")
        node = jnp.int32(0)
        met = jnp.zeros((tb.C,), bool)
        stream = rng.randint(4, vocab, size=20)
        for i, tok in enumerate(stream):
            ref = ref.advance(int(tok))
            node, met = _advance_unordered(arrays, node, met, jnp.int32(tok))
            bank, fin = _state_unordered(arrays, node, met)
            assert int(bank) == int(ref.bank), (
                trial, i, stream[:i + 1], int(bank), int(ref.bank))
            ref_fin = bool(ref.num_completed == len(constraints))
            assert bool(fin) == ref_fin, (trial, i, stream[:i + 1])


@pytest.mark.parametrize("constraints", [
    [[5, 6], [9]],
    [[7, 8, 9]],
])
def test_ordered_state_machine_matches_reference(constraints):
    vocab = 12
    tb = build_constraint_tables(pack_constraints([constraints]), vocab,
                                 "ordered")
    arrays = {k: v[0] for k, v in tb.arrays.items()}
    rng = np.random.RandomState(5)
    for trial in range(5):
        ref = _ref_states(constraints, "ordered")
        state = jnp.int32(-1)
        stream = rng.randint(4, vocab, size=20)
        for i, tok in enumerate(stream):
            ref = ref.advance(int(tok))
            state = _advance_ordered(arrays, state, jnp.int32(tok))
            assert int(state) + 1 == int(ref.bank), (
                trial, i, stream[:i + 1], int(state), int(ref.bank))
            assert (int(state) + 1 == int(arrays["total"])) == bool(
                ref.finished)


def _contains_phrase(seq, phrase):
    n, m = len(seq), len(phrase)
    return any(list(seq[i:i + m]) == list(phrase) for i in range(n - m + 1))


@pytest.fixture(scope="module")
def enc_state(tiny_cfg, tiny_variables):
    from s2st_tpu.models import s2st_transformer as m
    from tests.conftest import make_batch
    batch = make_batch(tiny_cfg, b=2, src_t=33, seed=11)
    return m.encode(tiny_variables, tiny_cfg, batch["src_speech"],
                    batch["src_speech_lens"])


@pytest.mark.parametrize("representation", ["unordered", "ordered"])
def test_constrained_decode_satisfies_constraints(tiny_cfg, tiny_variables,
                                                  enc_state, representation):
    """Dynamic beam allocation's guarantee (Post & Vilar 2018): for every
    sentence, the beam CONTAINS hypotheses satisfying all constraints,
    regardless of how unlikely they are under the model. (fairseq gives
    the same guarantee, not "all K satisfy": at max_len it finalizes the
    remaining unfinished beams too and sorts by score.)"""
    from s2st_tpu.generate.sequence_generator import (BeamConfig,
                                                      beam_search_aux)
    cons = [[[7, 8], [11]], [[5]]]
    tables = build_constraint_tables(
        pack_constraints(cons), tiny_cfg.src_vocab_size, representation)
    out = beam_search_aux(tiny_variables, tiny_cfg, "aux_asr_decoder",
                          enc_state["out_middle_layers"][0],
                          enc_state["encoder_padding_mask"],
                          BeamConfig(beam=4, max_len=40),
                          constraints=tables)
    tokens = np.asarray(out["tokens"])
    lengths = np.asarray(out["lengths"])
    scores = np.asarray(out["scores"])
    for b in range(2):
        satisfied = []
        for k in range(4):
            if scores[b, k] <= -1e8:
                continue  # unfilled slot
            n = int(lengths[b, k])
            hyp = tokens[b, k, 1:n]  # exclude bos and final EOS
            ok = all(_contains_phrase(hyp, ph) for ph in cons[b])
            if ok and representation == "ordered" and len(cons[b]) > 1:
                starts = []
                for ph in cons[b]:
                    idx = [i for i in range(len(hyp))
                           if list(hyp[i:i + len(ph)]) == list(ph)]
                    starts.append(idx[0] if idx else 10 ** 9)
                ok = starts == sorted(starts)
            satisfied.append(ok)
        assert any(satisfied), (representation, b, tokens[b], cons[b])


def test_constrained_decode_jits(tiny_cfg, tiny_variables, enc_state):
    from s2st_tpu.generate.sequence_generator import (BeamConfig,
                                                      beam_search_aux)
    tables = build_constraint_tables(
        pack_constraints([[[7]], [[9, 5]]]), tiny_cfg.src_vocab_size,
        "unordered")
    f = jax.jit(lambda v, tap, pad: beam_search_aux(
        v, tiny_cfg, "aux_asr_decoder", tap, pad,
        BeamConfig(beam=2, max_len=12), constraints=tables))
    out = f(tiny_variables, enc_state["out_middle_layers"][0],
            enc_state["encoder_padding_mask"])
    assert np.asarray(out["tokens"]).shape[:2] == (2, 2)


def test_extract_and_validate_tools(tmp_path):
    """constraints_tools extract/validate (scripts/constraints parity)."""
    import csv
    from s2st_tpu.preprocessing.constraints_tools import (extract_main,
                                                          validate_stream)
    man = tmp_path / "test.audio.tsv"
    with open(man, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["id", "tgt_text"], delimiter="\t")
        w.writeheader()
        w.writerow({"id": "u0", "tgt_text": "the quick brown fox jumps"})
        w.writerow({"id": "u1", "tgt_text": "hello world again"})
    out = tmp_path / "cons.tsv"
    rc = extract_main(["--audio-manifest", str(man), "-n", "2",
                       "--max-len", "2", "-o", str(out), "--seed", "7"])
    assert rc == 0
    lines = out.read_text().splitlines()
    assert len(lines) == 2
    for line, ref in zip(lines, ["the quick brown fox jumps",
                                 "hello world again"]):
        parts = line.split("\t")
        assert 2 <= len(parts) <= 3
        # the FIRST phrase is contiguous in the reference; later phrases
        # are drawn after earlier ones are popped (reference get_phrase
        # semantics, scripts/constraints/extract.py:17-22), so only their
        # words are guaranteed to come from the reference
        assert parts[1] in ref
        for ph in parts[1:]:
            for w in ph.split():
                assert w in ref.split()

    stream = ["C-u0\tquick brown\n", "H-u0\t-1.0\tthe quick brown fox\n",
              "C-u1\tworld\n", "H-u1\t-1.0\thello there\n"]
    found, total = validate_stream(stream)
    assert (found, total) == (1, 2)


def test_generate_for_s2st_constrained_cli(tmp_path):
    """--constraints unordered end-to-end through the CLI: C- lines are
    emitted and every utterance has a hypothesis containing its phrase."""
    import contextlib
    import io
    from tests.make_tiny_corpus import make_tiny_corpus
    from tests.test_cli_e2e import _train_args
    from s2st_tpu.cli.train import main as train_main
    from s2st_tpu.cli.generate_for_s2st import main as g4s_main

    corpus = make_tiny_corpus(tmp_path / "corpus")
    save_dir = tmp_path / "ckpts"
    rc = train_main(_train_args(
        corpus, save_dir,
        extra=["--st-ce-weight", "0.3", "--label-smoothing", "0.1",
               "--st-decoder-layers", "1", "--st-decoder-embed-dim", "16",
               "--middle-layers", "0,1", "--max-epoch", "1"]))
    assert rc == 0

    # constraints: the first word of each test utterance's reference
    import csv
    cons_file = tmp_path / "cons.tsv"
    with open(corpus / "test.tsv", encoding="utf-8") as f, \
            open(cons_file, "w", encoding="utf-8") as out:
        for row in csv.DictReader(f, delimiter="\t",
                                  quoting=csv.QUOTE_NONE):
            word = row["tgt_text"].split()[0]
            out.write(f"{row['id']}\t{word}\n")

    argv = [
        str(corpus), "--config-yaml", "config.yaml",
        "--gen-subset", "test", "--task", "s2s_translation",
        "--path", str(save_dir / "checkpoint_last.npz"),
        "--encoder-layers", "2", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "2", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0,1",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8",
        "--st-decoder-layers", "1", "--st-decoder-embed-dim", "16",
        "--max-tokens", "2000", "--beam", "3", "--nbest", "3",
        "--max-source-positions", "64", "--max-target-positions", "64",
        "--required-batch-size-multiple", "1",
        "--scoring", "sacrebleu",
        "--constraints", "unordered",
        "--constraints-file", str(cons_file),
    ]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = g4s_main(argv)
    out = buf.getvalue()
    assert rc == 0
    # C- lines present; each sentence's phrase appears in >=1 of its H- rows
    per_sent = {}
    cons = {}
    for line in out.splitlines():
        if line.startswith("C-"):
            uid, ph = line.split("\t")[0][2:], line.split("\t")[1]
            cons[uid] = ph
        elif line.startswith("H-"):
            uid = line.split("\t")[0][2:]
            per_sent.setdefault(uid, []).append(line.split("\t")[2])
    assert cons, "no C- lines emitted"
    for uid, ph in cons.items():
        hyps = per_sent.get(uid, [])
        assert any(ph in h.split() or ph in h for h in hyps), (uid, ph, hyps)


def test_low_probability_constraint_still_satisfied(tiny_cfg, tiny_variables,
                                                    enc_state):
    """Compare against unconstrained decode: pick a token the model never
    produces unconstrained; constrained output must contain it anyway."""
    from s2st_tpu.generate.sequence_generator import (BeamConfig,
                                                      beam_search_aux)
    base = beam_search_aux(tiny_variables, tiny_cfg, "aux_asr_decoder",
                           enc_state["out_middle_layers"][0],
                           enc_state["encoder_padding_mask"],
                           BeamConfig(beam=4, max_len=16))
    toks = np.asarray(base["tokens"])
    used = set(int(t) for t in toks[0].reshape(-1))
    rare = next(v for v in range(4, tiny_cfg.src_vocab_size)
                if v not in used)
    tables = build_constraint_tables(
        pack_constraints([[[rare]], [[rare]]]), tiny_cfg.src_vocab_size,
        "unordered")
    out = beam_search_aux(tiny_variables, tiny_cfg, "aux_asr_decoder",
                          enc_state["out_middle_layers"][0],
                          enc_state["encoder_padding_mask"],
                          BeamConfig(beam=4, max_len=16),
                          constraints=tables)
    tokens = np.asarray(out["tokens"])
    lengths = np.asarray(out["lengths"])
    found = any(rare in tokens[0, k, 1:int(lengths[0, k])]
                for k in range(4))
    assert found, (rare, tokens[0])
