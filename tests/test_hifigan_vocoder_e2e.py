"""HiFi-GAN as the generation vocoder: config.yaml vocoder block ->
get_vocoder dispatch -> torch checkpoint load -> batched synthesis inside
generate_waveform (BASELINE config: 'Neural vocoder (HiFi-GAN) replacing
Griffin-Lim')."""

import json

import numpy as np
import pytest
import torch

import jax

from s2st_tpu.models.hifigan import HiFiGANConfig
from tests.make_tiny_corpus import make_tiny_corpus
from tests.test_hifigan import CFG as TINY_HIFI_CFG, TorchGenerator


def _write_hifigan_ckpt(tmp_path):
    torch.manual_seed(0)
    gen = TorchGenerator(TINY_HIFI_CFG).eval()
    ckpt = tmp_path / "hifigan.pt"
    torch.save({"generator": gen.state_dict()}, str(ckpt))
    cfg_json = tmp_path / "hifigan_config.json"
    cfg_json.write_text(json.dumps({
        "model_in_dim": TINY_HIFI_CFG.model_in_dim,
        "num_mels": TINY_HIFI_CFG.model_in_dim,
        "upsample_initial_channel": TINY_HIFI_CFG.upsample_initial_channel,
        "upsample_rates": list(TINY_HIFI_CFG.upsample_rates),
        "upsample_kernel_sizes": list(TINY_HIFI_CFG.upsample_kernel_sizes),
        "resblock": TINY_HIFI_CFG.resblock,
        "resblock_kernel_sizes": list(TINY_HIFI_CFG.resblock_kernel_sizes),
        "resblock_dilation_sizes": [
            list(d) for d in TINY_HIFI_CFG.resblock_dilation_sizes],
        "sampling_rate": 16000,
    }))
    return ckpt, cfg_json


def test_hifigan_vocoder_dispatch(tmp_path):
    from s2st_tpu.data.data_cfg import S2STDataConfig
    from s2st_tpu.generate.vocoder import HiFiGANVocoder, get_vocoder
    corpus = make_tiny_corpus(tmp_path / "corpus")
    ckpt, cfg_json = _write_hifigan_ckpt(tmp_path)
    cfg_path = corpus / "config.yaml"
    cfg_path.write_text(cfg_path.read_text() + f"""vocoder:
  type: hifigan
  checkpoint: {ckpt}
  config: {cfg_json}
""")
    data_cfg = S2STDataConfig(cfg_path)

    class A:
        vocoder = "hifigan"
    voc = get_vocoder(A(), data_cfg)
    assert isinstance(voc, HiFiGANVocoder)
    mel = np.random.RandomState(0).randn(2, 13, 8).astype(np.float32)
    wave = np.asarray(voc(jax.numpy.asarray(mel)))
    assert wave.shape == (2, 13 * voc.hop_size)
    assert np.all(np.isfinite(wave))


def test_generate_waveform_with_hifigan(tmp_path):
    from s2st_tpu.cli.train import main as train_main
    from s2st_tpu.cli.generate_waveform import main as gen_main
    corpus = make_tiny_corpus(tmp_path / "corpus")
    ckpt, cfg_json = _write_hifigan_ckpt(tmp_path)
    cfg_path = corpus / "config.yaml"
    cfg_path.write_text(cfg_path.read_text() + f"""vocoder:
  type: hifigan
  checkpoint: {ckpt}
  config: {cfg_json}
""")
    save = tmp_path / "ckpts"
    model_flags = [
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "1", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8",
        "--max-source-positions", "128", "--max-target-positions", "128",
        "--required-batch-size-multiple", "1",
    ]
    rc = train_main([
        str(corpus), "--save-dir", str(save), "--config-yaml", "config.yaml",
        "--train-subset", "train", "--valid-subset", "dev",
        "--arch", "s2st_transformer", *model_flags,
        "--max-tokens", "2000", "--max-epoch", "1",
        "--optimizer", "adam", "--lr", "0.001",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
        "--clip-norm", "1.0"])
    assert rc == 0
    results = tmp_path / "dump"
    rc = gen_main([
        str(corpus), "--config-yaml", "config.yaml", "--gen-subset", "test",
        "--task", "s2s_translation", "--arch", "s2st_transformer",
        "--path", str(save / "checkpoint_last.npz"), *model_flags,
        "--vocoder", "hifigan",
        "--max-tokens", "2000", "--max-iter", "8",
        "--dump-waveforms", "--results-path", str(results)])
    assert rc == 0
    wavs = list((results / "wav").glob("*_pred.wav"))
    assert len(wavs) == 4
    from s2st_tpu.data.audio_utils import read_wav
    wave, sr = read_wav(str(wavs[0]))
    assert len(wave) > 0 and np.all(np.isfinite(wave))
