"""Waveform generation CLI (parity: examples/s2s_trans/generate_waveform.py).

Loads a checkpoint, runs batched AR inference (or teacher forcing), GCMVN-
denormalizes the mel, synthesizes waveforms with the selected vocoder, and
dumps per-utterance artifacts: waveforms (--dump-waveforms), features
(--dump-features), attentions (--dump-attentions), eos probabilities
(--dump-eos-probs), plots (--dump-plots), plus target copies (--dump-target)
(:44-124, :148-183 in the reference).

TPU-native: the full batch chain (encode -> AR while_loop -> postnet ->
denorm -> Griffin-Lim) is one jitted program per bucket shape; host code
only slices valid lengths and writes files.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import List, Optional

import numpy as np

logger = logging.getLogger("s2st_tpu.generate_waveform")


def dump_result(args, sample_id: str, pred_wave: Optional[np.ndarray],
                sample_rate: int, pred_feat: Optional[np.ndarray] = None,
                pred_attn: Optional[np.ndarray] = None,
                pred_eos: Optional[np.ndarray] = None,
                targ_wave: Optional[np.ndarray] = None,
                targ_feat: Optional[np.ndarray] = None):
    from ..data.audio_utils import write_wav
    out = Path(args.results_path)
    if pred_wave is not None and args.dump_waveforms:
        d = out / "wav"
        d.mkdir(parents=True, exist_ok=True)
        write_wav(str(d / f"{sample_id}_pred.wav"), pred_wave, sample_rate)
        if targ_wave is not None:
            write_wav(str(d / f"{sample_id}_targ.wav"), targ_wave, sample_rate)
    if pred_feat is not None and args.dump_features:
        d = out / "feat"
        d.mkdir(parents=True, exist_ok=True)
        np.save(str(d / f"{sample_id}_pred.npy"), pred_feat)
        if targ_feat is not None:
            np.save(str(d / f"{sample_id}_targ.npy"), targ_feat)
    if pred_attn is not None and args.dump_attentions:
        d = out / "attn"
        d.mkdir(parents=True, exist_ok=True)
        np.save(str(d / f"{sample_id}.npy"), pred_attn)
    if pred_eos is not None and args.dump_eos_probs:
        d = out / "eos"
        d.mkdir(parents=True, exist_ok=True)
        np.save(str(d / f"{sample_id}.npy"), pred_eos)
    if pred_feat is not None and args.dump_plots:
        d = out / "plots"
        d.mkdir(parents=True, exist_ok=True)
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, axes = plt.subplots(2 if targ_feat is not None else 1, 1)
            axes = np.atleast_1d(axes)
            axes[0].imshow(pred_feat.T, origin="lower", aspect="auto")
            axes[0].set_title("prediction")
            if targ_feat is not None:
                axes[1].imshow(targ_feat.T, origin="lower", aspect="auto")
                axes[1].set_title("target")
            fig.savefig(str(d / f"{sample_id}.png"))
            plt.close(fig)
        except Exception as e:  # matplotlib optional
            logger.warning(f"plot dump skipped: {e}")


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        stream=sys.stdout)
    from ..options import parse_generation_args
    args = parse_generation_args(argv)
    assert args.results_path, "--results-path required"

    import jax
    import jax.numpy as jnp
    from ..utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()
    from ..registry import get_task
    from ..generate.speech_generator import (GenerationConfig,
                                             generate_features,
                                             teacher_forcing_features)
    from ..models import s2st_transformer as m
    from ..train import checkpoint as ckpt
    from ..train.optim import adam
    from ..train.trainer import create_train_state

    task = get_task(args.task).setup_task(args)
    # rebuild the model from the checkpoint's embedded config when present
    # (fairseq load_model_ensemble parity — the reference's stage 7 command
    # passes only --n-frames-per-step; run_baseline.sh:143-151)
    from ..options import model_args_from_checkpoint, task_args_scope
    margs = model_args_from_checkpoint(args)
    with task_args_scope(task, margs):
        full_cfg, init_fn, _ = task.build_model_and_loss()
    is_t2s = margs.arch.startswith("t2s_transformer")
    is_fs2 = margs.arch.startswith("fastspeech2")
    model_cfg = full_cfg.base if is_t2s else full_cfg

    # load checkpoint (ensemble: first path; averaging handled offline).
    # .pt paths are reference fairseq checkpoints (torch_import mapping).
    path = args.path.split(":")[0]
    variables = init_fn(jax.random.PRNGKey(0))
    if path.endswith(".pt") or path.endswith(".bin"):
        variables = ckpt.load_variables_any(path)
        logger.info(f"loaded fairseq checkpoint {path}")
    else:
        state = create_train_state(variables, adam())
        state, meta = ckpt.restore_state(state, path, reset_optimizer=True)
        variables = {"params": state.params, "stats": state.stats}
        logger.info(f"loaded checkpoint {path} (step {meta.get('step', '?')})")

    vocoder = task.build_vocoder()
    gcmvn_mean, gcmvn_std = task.gcmvn_stats()
    gen_cfg = GenerationConfig(
        max_iter=min(args.max_iter, model_cfg.max_target_positions //
                     max(model_cfg.n_frames_per_step, 1)),
        eos_prob_threshold=args.eos_prob_threshold,
        kv_cache_dtype=getattr(args, "kv_cache_dtype", "bf16"))

    if is_fs2:
        # non-autoregressive TTS: one forward pass, durations from the
        # duration predictor (FastSpeech2 inference)
        from ..models import fastspeech2 as fs2
        fs2_max_out = min(args.max_iter, model_cfg.max_target_positions)

        @jax.jit
        def infer_fs2(variables, src_text, src_text_len):
            out = fs2.forward(variables, model_cfg, src_text, src_text_len,
                              max_out_len=fs2_max_out, deterministic=True,
                              d_factor=args.duration_factor,
                              min_duration=args.min_duration)
            b = out["post_feat_out"].shape[0]
            feats = out["post_feat_out"].astype(jnp.float32).reshape(
                b, -1, model_cfg.output_frame_dim)
            if gcmvn_mean is not None:
                feats = feats * jnp.asarray(gcmvn_std) \
                    + jnp.asarray(gcmvn_mean)
            r_ = model_cfg.n_frames_per_step
            return {"feats": feats,
                    "raw_out_lens": out["out_lens"] * r_,
                    "out_lens": out["out_lens"],
                    "eos_prob": jnp.zeros(feats.shape[:2], jnp.float32),
                    "attn": None}

    if is_t2s:
        # pseudo-label TTS mode (t2s_transformer: text in, spectrogram out —
        # generate_waveform's "input-text" path in the reference)
        from ..models import t2s_transformer as t2s
        from ..generate.speech_generator import generate_from_encoder_out

        @jax.jit
        def infer_t2s(variables, src_text, rng):
            enc = t2s.encode(variables, full_cfg, src_text,
                             deterministic=True)
            dec_vars = {"params": variables["params"],
                        "stats": {"postnet": variables["stats"]["postnet"]}}
            return generate_from_encoder_out(
                dec_vars, model_cfg, gen_cfg, enc, rng=rng,
                gcmvn_mean=gcmvn_mean, gcmvn_std=gcmvn_std)

    @jax.jit
    def infer(variables, src_speech, src_speech_lens, rng):
        return generate_features(variables, model_cfg, gen_cfg, src_speech,
                                 src_speech_lens, rng=rng,
                                 gcmvn_mean=gcmvn_mean, gcmvn_std=gcmvn_std)

    @jax.jit
    def infer_tf(variables, batch, rng):
        return teacher_forcing_features(variables, model_cfg, batch,
                                        gcmvn_mean=gcmvn_mean,
                                        gcmvn_std=gcmvn_std, rng=rng)

    itr = task.get_batch_iterator(args.gen_subset,
                                  max_tokens=args.max_tokens,
                                  max_sentences=args.batch_size,
                                  shuffle=False)
    dataset = task.datasets[args.gen_subset]
    rng = jax.random.PRNGKey(args.seed)
    sr = args.output_sample_rate
    n_done = 0
    for bi, batch in enumerate(itr.next_epoch_itr(shuffle=False)):
        sub = jax.random.fold_in(rng, bi)
        if is_fs2:
            out = infer_fs2(variables, jnp.asarray(batch["src_text"]),
                            jnp.asarray(batch["src_text_len"]))
        elif is_t2s:
            out = infer_t2s(variables, jnp.asarray(batch["src_text"]), sub)
        elif args.teacher_forcing:
            db = {k: v for k, v in batch.items()
                  if isinstance(v, np.ndarray) or np.isscalar(v)}
            db.pop("id", None)
            db["src_txt_ntokens"] = np.int32(0)
            db["tgt_txt_ntokens"] = np.int32(0)
            out = infer_tf(variables, db, sub)
        else:
            out = infer(variables, jnp.asarray(batch["src_speech"]),
                        jnp.asarray(batch["src_speech_lens"]), sub)
        feats = np.asarray(out["feats"], np.float32)
        out_lens = np.asarray(out["raw_out_lens"])
        eos_probs = np.asarray(out["eos_prob"], np.float32)
        attns = np.asarray(out["attn"], np.float32) \
            if out.get("attn") is not None else None
        waves = np.asarray(vocoder(
            jnp.asarray(feats), lengths=jnp.asarray(out_lens), rng=sub),
            np.float32)
        ids = np.asarray(batch["id"])
        tgt = np.asarray(batch["tgt_speech"], np.float32)
        tgt_lens = np.asarray(batch["target_lengths"])
        for row in range(len(ids)):
            if ids[row] < 0:  # static-shape padding row
                continue
            n = int(out_lens[row])
            if n <= 0:
                continue
            sample_id = dataset.ids[int(ids[row])] \
                if hasattr(dataset, "ids") else str(int(ids[row]))
            targ_feat = targ_wave = None
            if args.dump_target:
                tl = int(tgt_lens[row]) * model_cfg.n_frames_per_step
                targ_feat = tgt[row, :int(tgt_lens[row])].reshape(
                    -1, model_cfg.output_frame_dim)
                if gcmvn_mean is not None:
                    targ_feat = targ_feat * gcmvn_std + gcmvn_mean
                targ_wave = np.asarray(
                    vocoder(jnp.asarray(targ_feat)), np.float32)
            dump_result(
                args, sample_id,
                pred_wave=waves[row, :vocoder.wave_length(n)],
                sample_rate=sr,
                pred_feat=feats[row, :n],
                pred_attn=(attns[row, :int(np.asarray(out["out_lens"])[row])]
                           if attns is not None else None),
                pred_eos=eos_probs[row, :n],
                targ_wave=targ_wave, targ_feat=targ_feat)
            n_done += 1
    logger.info(f"dumped {n_done} utterances to {args.results_path}")
    return 0


def cli_main():
    sys.exit(main())


if __name__ == "__main__":
    cli_main()
