"""HiFi-GAN JAX generator vs a torch oracle built from the public HiFi-GAN
architecture (weight-norm convs, MRF resblocks) — validates both the math
and the torch-checkpoint import path (transpose + weight-norm folding)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
from torch.nn.utils import weight_norm

import jax
import jax.numpy as jnp

from s2st_tpu.models.hifigan import (HiFiGANConfig, init_hifigan,
                                     load_torch_generator, synthesize)

CFG = HiFiGANConfig(
    model_in_dim=8, upsample_initial_channel=16,
    upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
    resblock="1", resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 3), (1, 3)))

LRELU = 0.1


class TorchResBlock1(nn.Module):
    def __init__(self, ch, k, dilations):
        super().__init__()
        self.convs1 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, dilation=d,
                                  padding=(k - 1) // 2 * d))
            for d in dilations])
        self.convs2 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, padding=(k - 1) // 2))
            for _ in dilations])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            h = c2(torch.nn.functional.leaky_relu(
                c1(torch.nn.functional.leaky_relu(x, LRELU)), LRELU))
            x = x + h
        return x


class TorchGenerator(nn.Module):
    """Public HiFi-GAN generator layout (state-dict keys conv_pre / ups.N /
    resblocks.N / conv_post)."""

    def __init__(self, cfg: HiFiGANConfig):
        super().__init__()
        self.cfg = cfg
        self.conv_pre = weight_norm(
            nn.Conv1d(cfg.model_in_dim, cfg.upsample_initial_channel, 7,
                      padding=3))
        self.ups = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        ch = cfg.upsample_initial_channel
        for u, k in zip(cfg.upsample_rates, cfg.upsample_kernel_sizes):
            self.ups.append(weight_norm(
                nn.ConvTranspose1d(ch, ch // 2, k, stride=u,
                                   padding=(k - u) // 2)))
            ch //= 2
            for rk, rd in zip(cfg.resblock_kernel_sizes,
                              cfg.resblock_dilation_sizes):
                self.resblocks.append(TorchResBlock1(ch, rk, rd))
        self.conv_post = weight_norm(nn.Conv1d(ch, 1, 7, padding=3))

    def forward(self, x):  # x: (B, n_mels, T)
        h = self.conv_pre(x)
        nk = len(self.cfg.resblock_kernel_sizes)
        for i, up in enumerate(self.ups):
            h = torch.nn.functional.leaky_relu(h, LRELU)
            h = up(h)
            acc = None
            for j in range(nk):
                y = self.resblocks[i * nk + j](h)
                acc = y if acc is None else acc + y
            h = acc / nk
        h = torch.nn.functional.leaky_relu(h, LRELU)
        return torch.tanh(self.conv_post(h)).squeeze(1)


def test_matches_torch_oracle(tmp_path):
    torch.manual_seed(0)
    gen = TorchGenerator(CFG).eval()
    x = torch.randn(2, CFG.model_in_dim, 17)
    with torch.no_grad():
        ref = gen(x).numpy()

    ckpt = tmp_path / "g.pt"
    torch.save({"generator": gen.state_dict()}, str(ckpt))
    params = load_torch_generator(str(ckpt), CFG)
    ours = np.asarray(synthesize(params, jnp.asarray(
        x.numpy().transpose(0, 2, 1)), CFG))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_upsample_factor():
    params = init_hifigan(jax.random.PRNGKey(0), CFG)
    x = jnp.zeros((1, 13, CFG.model_in_dim))
    wave = synthesize(params, x, CFG)
    assert wave.shape == (1, 13 * 4 * 4)


def test_jit_and_finite():
    params = init_hifigan(jax.random.PRNGKey(1), CFG)
    f = jax.jit(lambda p, x: synthesize(p, x, CFG))
    wave = np.asarray(f(params, jnp.ones((2, 9, CFG.model_in_dim))))
    assert np.all(np.isfinite(wave))
    assert np.all(np.abs(wave) <= 1.0)


def test_streaming_synthesis_matches_full():
    """Chunked synthesis with receptive-field overlap equals full-sequence
    synthesis (BASELINE config: streaming chunked synthesis on-device)."""
    from s2st_tpu.models.hifigan import (init_hifigan, receptive_field_frames,
                                         synthesize, synthesize_streaming)
    params = init_hifigan(jax.random.PRNGKey(3), CFG)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 50, CFG.model_in_dim).astype(np.float32))
    full = np.asarray(synthesize(params, x, CFG))
    stream = np.asarray(synthesize_streaming(params, x, CFG,
                                             chunk_frames=16))
    assert stream.shape == full.shape
    rf = receptive_field_frames(CFG)
    up = 16  # prod(upsample_rates) for CFG (4*4)
    # interior samples identical; the first/last chunk edges see zero
    # padding in both paths so they match everywhere
    np.testing.assert_allclose(stream, full, atol=2e-4)
