"""End-to-end S2ST inference benchmark on one TPU chip.

Measures the headline number from BASELINE.md: real-time factor (RTF) of
end-to-end waveform generation — fbank features in, waveform out — i.e.
encoder forward + autoregressive spectrogram decode (KV-cached while_loop)
+ Griffin-Lim vocoder, everything inside XLA on-device.

The reference pipeline (speech_generator_for_s2st.py + vocoder.py) runs the
AR loop in Python and Griffin-Lim per-utterance; the driver target is >=10x
the fairseq-CPU RTF (BASELINE.json). We report RTF and vs_baseline = RTF/10
(fairseq CPU end-to-end is ~1x real time for this stack).

Prints exactly ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from s2st_tpu.models import s2st_transformer as m
    from s2st_tpu.generate.speech_generator import (GenerationConfig,
                                                    generate_features)
    from s2st_tpu.ops import dsp

    # flagship config (reference base arch) in bf16, at the recipe's
    # operating point: --n-frames-per-step 4 (run_baseline.sh:98)
    cfg = m.S2STConfig(src_vocab_size=1000, tgt_vocab_size=1000,
                       middle_layers=(6,), ctc=False, aux_asr=False,
                       aux_st=False, n_frames_per_step=4,
                       dtype=jnp.bfloat16)
    variables = m.init_s2st(jax.random.PRNGKey(0), cfg)

    B = 64                # serving batch (decode loop is latency-bound, so
                          # batching amortizes it; RTF unit states the batch)
    SRC_T = 600           # ~6s of 10ms-hop fbank per utterance
    MAX_ITER = 120        # packed decode steps -> 480 raw mel frames (~6s)
    # never terminate: worst-case full-length decode (threshold > 1)
    gen_cfg = GenerationConfig(max_iter=MAX_ITER, eos_prob_threshold=1.5,
                               prenet_dropout_at_inference=False)

    # target-mel feature spec (TTS-style 80-bin log-mel, 16 kHz)
    SR, N_FFT, HOP, WIN = 16000, 1024, 200, 800
    GL_ITERS = 32
    pinv = dsp.make_pinv_mel_basis(SR, N_FFT, 80, 20.0, 8000.0)

    def e2e(variables, src, src_lens, rng):
        out = generate_features(variables, cfg, gen_cfg, src, src_lens)
        lin = dsp.logmel_to_linear(out["feats"], pinv)     # (B, F, T)
        wave = dsp.griffin_lim(lin, N_FFT, WIN, HOP, GL_ITERS, rng)
        return wave, out["raw_out_lens"]

    fn = jax.jit(e2e)
    rng = jax.random.PRNGKey(1)
    r = np.random.RandomState(0)
    src = jnp.asarray(r.randn(B, SRC_T, 80).astype(np.float32))
    src_lens = jnp.full((B,), SRC_T, jnp.int32)

    # warmup/compile
    wave, lens = fn(variables, src, src_lens, rng)
    jax.block_until_ready(wave)

    # pipelined measurement: issue all batches back-to-back, then force
    # completion by reading back a tiny slice of every output (on some
    # remote backends block_until_ready returns early; a data fetch cannot)
    n_runs = 10
    rngs = [jax.random.fold_in(rng, i) for i in range(n_runs)]
    _ = [np.asarray(r_)[:1] for r_ in rngs]
    t0 = time.perf_counter()
    waves = []
    for i in range(n_runs):
        wave, lens = fn(variables, src, src_lens, rngs[i])
        waves.append(wave)
    checks = [float(w[0, 0]) for w in waves]
    dt = (time.perf_counter() - t0) / n_runs

    audio_seconds = B * MAX_ITER * cfg.n_frames_per_step * HOP / SR
    rtf = audio_seconds / dt
    result = {
        "metric": "e2e_s2st_generation_rtf",
        "value": round(rtf, 3),
        "unit": "x_realtime (fbank->mel->GriffinLim waveform, 1 chip, B=64)",
        "vs_baseline": round(rtf / 10.0, 3),
    }

    # B=1 single-utterance latency (serving tail-latency point; the
    # headline B=64 measures throughput)
    try:
        src1 = src[:1]
        lens1 = src_lens[:1]
        f1 = jax.jit(e2e)
        w, _ = f1(variables, src1, lens1, rng)
        _ = float(w[0, 0])
        rngs1 = [jax.random.fold_in(rng, 100 + i) for i in range(10)]
        _ = [np.asarray(r_)[:1] for r_ in rngs1]
        t0 = time.perf_counter()
        outs = [f1(variables, src1, lens1, rngs1[i])[0] for i in range(10)]
        _ = [float(o[0, 0]) for o in outs]
        result["b1_latency_ms"] = round(
            (time.perf_counter() - t0) / 10 * 1000.0, 2)
    except Exception as e:
        result["b1_latency_error"] = repr(e)[:200]

    # HiFi-GAN vocoder path (random weights — no pretrained ckpt in the
    # image; measures the compute path, not audio quality)
    try:
        from s2st_tpu.models import hifigan as hg
        hcfg = hg.HiFiGANConfig()
        hvars = hg.init_hifigan(jax.random.PRNGKey(2), hcfg)

        def e2e_hifi(variables, hvars, src, src_lens):
            out = generate_features(variables, cfg, gen_cfg, src, src_lens)
            return (hg.synthesize(hvars, out["feats"], hcfg),
                    out["raw_out_lens"])

        fh = jax.jit(e2e_hifi)
        w, _ = fh(variables, hvars, src, src_lens)
        _ = float(w.reshape(-1)[0])
        t0 = time.perf_counter()
        outs = [fh(variables, hvars, src, src_lens)[0] for _ in range(5)]
        _ = [float(o.reshape(-1)[0]) for o in outs]
        dt_h = (time.perf_counter() - t0) / 5
        hifi_seconds = w.shape[0] * w.shape[1] / SR
        result["hifigan_rtf"] = round(hifi_seconds / dt_h, 1)
    except Exception as e:
        result["hifigan_error"] = repr(e)[:200]

    # text-decode throughput: jitted beam search over the aux ST decoder
    # (generate_for_s2st's hot path; the reference prints "Translated N
    # sentences (M tokens) in Ts", fairseq_cli/generate_for_s2st.py:404-413)
    try:
        from s2st_tpu.generate.sequence_generator import (BeamConfig,
                                                          beam_search_aux)
        tcfg = cfg.replace(aux_st=True, st_decoder_layers=1,
                           st_decoder_embed_dim=64, middle_layers=(4, 9))
        tvars = m.init_s2st(jax.random.PRNGKey(3), tcfg)
        for K in (5, 10):
            bs_cfg = BeamConfig(beam=K, max_len=100)

            def text_decode(tvars, src, src_lens):
                enc = m.encode(tvars, tcfg, src, src_lens,
                               deterministic=True)
                return beam_search_aux(
                    tvars, tcfg, "aux_st_decoder",
                    enc["out_middle_layers"][1],
                    enc["encoder_padding_mask"], bs_cfg)

            ft = jax.jit(text_decode)
            out = ft(tvars, src, src_lens)
            _ = np.asarray(out["lengths"])  # force completion
            t0 = time.perf_counter()
            outs = [ft(tvars, src, src_lens) for _ in range(5)]
            tok = sum(int(np.asarray(o["lengths"])[:, 0].sum())
                      for o in outs)
            dt_t = time.perf_counter() - t0
            result[f"text_decode_tokens_per_s_beam{K}"] = round(tok / dt_t, 1)
            result[f"text_decode_sentences_per_s_beam{K}"] = round(
                5 * B / dt_t, 1)
    except Exception as e:
        result["text_decode_error"] = repr(e)[:200]

    # training-side evidence (fused fwd+bwd+optimizer step, recipe operating
    # point: base arch + full CTC/aux loss, bf16, ~40k src frames/step);
    # reported alongside the headline — the reference is first a training
    # framework (fairseq/trainer.py:1407 wps meter)
    try:
        from s2st_tpu.benchmark.bench_train import run_train_bench
        result.update(run_train_bench())
    except Exception as e:  # never let the train bench kill the headline
        result["train_bench_error"] = repr(e)[:200]

    print(json.dumps(result))


if __name__ == "__main__":
    main()
