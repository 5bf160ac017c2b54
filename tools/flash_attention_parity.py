"""Flash-attention parity check — run ON THE TPU BOX (the Pallas kernel
has no CPU interpret path through the upstream wrapper, and tests/conftest
pins the CPU platform, so this lives as a tool rather than a pytest).

Compares the flagship s2st_transformer teacher-forced forward with
cfg.use_flash_attention on/off (attention_dropout=0, fp32, deterministic).
Only valid target rows are compared: pad-row garbage differs by design
(baseline lets pad queries attend valid keys; flash does the same via
all-ones query segments — but the padded Tq tail rows are sliced, not
matched).

Recorded result (2026-08-19, v5e, this file's config):
    feat_out       max err 3.5e-3   (valid rows)
    post_feat_out  max err 5.7e-3
    eos_out        max err 5.2e-4
    attn map       max err 1.6e-4
The ~1e-3 level is the online-softmax reassociation amplified through the
decoder stack; the attention maps themselves agree to ~1e-4.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def make_batch(cfg, b, src_t, tgt_t, src_n, tgt_n, seed=0):
    """Mirror of tests/conftest.make_batch (cannot import it here: conftest
    pins JAX_PLATFORMS=cpu at import, defeating the TPU kernel under test)."""
    r = np.random.RandomState(seed)
    src_lens = r.randint(src_t // 2, src_t + 1, size=b).astype(np.int32)
    src_lens[0] = src_t
    tgt_lens = r.randint(tgt_t // 2, tgt_t + 1, size=b).astype(np.int32)
    tgt_lens[0] = tgt_t
    tgt_speech = r.randn(b, tgt_t, cfg.out_dim).astype(np.float32)
    prev = np.zeros_like(tgt_speech)
    prev[:, 1:] = tgt_speech[:, :-1]
    src_text = np.full((b, src_n), 1, np.int32)
    tgt_text = np.full((b, tgt_n), 1, np.int32)
    src_text_len = r.randint(2, src_n + 1, size=b).astype(np.int32)
    tgt_text_len = r.randint(2, tgt_n + 1, size=b).astype(np.int32)
    for i in range(b):
        src_text[i, :src_text_len[i]] = r.randint(
            4, cfg.src_vocab_size, size=src_text_len[i])
        src_text[i, src_text_len[i] - 1] = 2
        tgt_text[i, :tgt_text_len[i]] = r.randint(
            4, cfg.tgt_vocab_size, size=tgt_text_len[i])
        tgt_text[i, tgt_text_len[i] - 1] = 2
    prev_src = np.full((b, src_n), 1, np.int32)
    prev_tgt = np.full((b, tgt_n), 1, np.int32)
    for i in range(b):
        prev_src[i, 0] = 2
        prev_src[i, 1:src_text_len[i]] = src_text[i, :src_text_len[i] - 1]
        prev_tgt[i, 0] = 2
        prev_tgt[i, 1:tgt_text_len[i]] = tgt_text[i, :tgt_text_len[i] - 1]
    return {
        "src_speech": r.randn(b, src_t, cfg.input_feat_per_channel
                              ).astype(np.float32),
        "src_speech_lens": src_lens,
        "prev_output_tokens": prev,
        "prev_src_text_tokens": prev_src,
        "prev_tgt_text_tokens": prev_tgt,
        "tgt_speech": tgt_speech,
        "target_lengths": tgt_lens,
        "src_text": src_text,
        "src_text_len": src_text_len,
        "tgt_text": tgt_text,
        "tgt_text_len": tgt_text_len,
        "src_txt_ntokens": np.int32(src_text_len.sum()),
        "tgt_txt_ntokens": np.int32(tgt_text_len.sum()),
    }


def main():
    import jax
    import jax.numpy as jnp
    from s2st_tpu.models import s2st_transformer as m
    assert jax.devices()[0].platform == "tpu", \
        "run on the TPU box (pallas kernel has no CPU path here)"

    cfg = m.S2STConfig(
        src_vocab_size=40, tgt_vocab_size=40, input_feat_per_channel=16,
        conv_kernel_sizes=(5, 5), conv_channels=32,
        encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
        encoder_attention_heads=2, middle_layers=(0, 1),
        decoder_layers=2, decoder_embed_dim=64, decoder_ffn_embed_dim=128,
        decoder_attention_heads=2, output_frame_dim=16,
        prenet_layers=2, prenet_dim=16, postnet_layers=2,
        postnet_conv_dim=16,
        ctc=True, aux_asr=True, aux_st=True,
        asr_decoder_layers=1, asr_decoder_embed_dim=64,
        st_decoder_layers=1, st_decoder_embed_dim=64,
        max_source_positions=512, max_target_positions=512,
        attention_dropout=0.0, dtype=jnp.float32)
    v = m.init_s2st(jax.random.PRNGKey(0), cfg)
    batch = {k: jnp.asarray(x) for k, x in make_batch(
        cfg, b=4, src_t=150, tgt_t=70, src_n=9, tgt_n=11).items()}

    def fwd(cfg_):
        return jax.jit(lambda vv, bb: m.forward(
            vv, cfg_, bb, deterministic=True))(v, batch)

    base = fwd(cfg)
    flash = fwd(cfg.replace(use_flash_attention=True))
    tl = np.asarray(batch["target_lengths"])
    failed = False
    for k, tol in (("feat_out", 2e-2), ("post_feat_out", 2e-2),
                   ("eos_out", 5e-3)):
        a = np.asarray(base[k], np.float32)
        b = np.asarray(flash[k], np.float32)
        err = max(np.abs(a[i, :int(tl[i])] - b[i, :int(tl[i])]).max()
                  for i in range(a.shape[0]))
        print(f"{k}: max err (valid rows) = {err:.3e} (tol {tol})")
        failed |= err > tol
    attn_err = np.abs(np.asarray(base["attn"], np.float32)
                      - np.asarray(flash["attn"], np.float32)).max()
    print(f"attn map: max err = {attn_err:.3e} (tol 1e-3)")
    failed |= attn_err > 1e-3
    print("PARITY", "FAIL" if failed else "OK")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
