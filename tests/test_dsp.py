"""On-device DSP golden tests: STFT/iSTFT round trip, Griffin-Lim
reconstruction quality, mel filter banks vs torchaudio (when available),
kaldi fbank numerics (audio_utils + ops/dsp vs reference semantics,
SURVEY.md §7 risk 3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from s2st_tpu.data import audio_utils as au
from s2st_tpu.ops import dsp


SR = 16000


def _tone(freq=440.0, dur=0.3, sr=SR):
    t = np.arange(int(dur * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_stft_istft_roundtrip():
    wave = _tone()
    n_fft, win, hop = 512, 512, 128
    mag, phase = dsp.stft_mag_phase(jnp.asarray(wave), n_fft, win, hop)
    rec = np.asarray(dsp.istft(mag, phase, n_fft, win, hop))
    n = min(len(rec), len(wave)) - win
    # compare interior (edges lose window overlap)
    a, b = wave[win:n], rec[win:n]
    err = np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(a ** 2))
    assert err < 1e-3, err


def test_griffin_lim_reconstructs_tone():
    wave = _tone()
    n_fft, win, hop = 512, 512, 128
    mag, _ = dsp.stft_mag_phase(jnp.asarray(wave), n_fft, win, hop)
    import jax
    rec = np.asarray(dsp.griffin_lim(mag, n_fft, win, hop, n_iter=32,
                                     rng=jax.random.PRNGKey(0)))
    # spectral convergence: |STFT(rec)| close to target magnitude (GL on a
    # short clip converges slowly; edges dominate the residual)
    mag2, _ = dsp.stft_mag_phase(jnp.asarray(rec), n_fft, win, hop)
    tt = min(mag.shape[1], mag2.shape[1])
    num = float(jnp.linalg.norm(mag2[:, :tt] - mag[:, :tt]))
    den = float(jnp.linalg.norm(mag))
    assert num / den < 0.25, num / den


def test_logmel_extraction_shapes():
    wave = _tone()
    lm = au.extract_logmel_spectrogram(
        wave, SR, n_fft=1024, win_length=1024, hop_length=256, n_mels=80,
        f_min=20.0, f_max=8000.0)
    assert lm.shape[1] == 80
    assert np.all(np.isfinite(lm))


def test_pinv_mel_roundtrip():
    """logmel -> linear via pinv basis approximately inverts the mel warp."""
    wave = _tone()
    n_fft = 1024
    mag, _ = dsp.stft_mag_phase(jnp.asarray(wave), n_fft, 1024, 256)
    basis = au.mel_filters(SR, n_fft, 80, 0.0, SR / 2)
    mel = np.maximum(basis @ np.asarray(mag), 1e-10)  # (80, T)
    logmel = np.log(mel).T  # (T, 80)
    pinv = dsp.make_pinv_mel_basis(SR, n_fft, 80, 0.0, SR / 2)
    lin = np.asarray(dsp.logmel_to_linear(jnp.asarray(logmel)[None], pinv))[0]
    # energy concentrated at the tone bin
    peak_ref = np.argmax(np.asarray(mag).mean(axis=0))
    peak_rec = np.argmax(lin.mean(axis=0))
    assert abs(int(peak_ref) - int(peak_rec)) <= 2


def test_global_cmvn_stats():
    feats = [np.random.RandomState(i).randn(20, 5).astype(np.float32)
             for i in range(3)]
    stats = au.compute_global_cmvn(iter(feats))
    allf = np.concatenate(feats)
    np.testing.assert_allclose(stats["mean"], allf.mean(0), atol=1e-5)
    np.testing.assert_allclose(stats["std"], allf.std(0), atol=1e-4)


def test_wav_io_roundtrip(tmp_path):
    wave = _tone()
    p = str(tmp_path / "a.wav")
    au.write_wav(p, wave, SR)
    back, sr = au.read_wav(p)
    assert sr == SR
    np.testing.assert_allclose(back, wave, atol=1e-4)


def test_zip_manifest_roundtrip(tmp_path):
    from pathlib import Path
    d = tmp_path / "feats"
    d.mkdir()
    arrs = {}
    for name in ["a", "b"]:
        arr = np.random.rand(7, 3).astype(np.float32)
        np.save(d / f"{name}.npy", arr)
        arrs[name] = arr
    zp = tmp_path / "feats.zip"
    au.create_zip(d, zp)
    manifest = au.get_zip_manifest(zp)
    for name, arr in arrs.items():
        path = manifest[name]
        got = au.get_features_or_waveform(path)
        np.testing.assert_allclose(got, arr)


# ---------------------------------------------------------------------------
# hermetic goldens (tests/golden/dsp_goldens.npz): produced by an
# INDEPENDENT spec implementation (tests/golden/gen_dsp_goldens.py) so the
# parity evidence never skips — two separately-written implementations of
# the Kaldi-fbank / slaney / HTK filterbank specs must agree
# ---------------------------------------------------------------------------

from pathlib import Path

_GOLDEN = Path(__file__).parent / "golden" / "dsp_goldens.npz"


@pytest.fixture(scope="module")
def goldens():
    return np.load(_GOLDEN)


def test_kaldi_fbank_matches_golden(goldens):
    wave = goldens["wave"]
    for bins, key in ((24, "kaldi_fbank24"), (80, "kaldi_fbank80")):
        ours = au.kaldi_fbank(wave * (2 ** 15), sample_rate=SR,
                              num_mel_bins=bins)
        ref = goldens[key]
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_slaney_filterbank_matches_golden(goldens):
    ours = au.mel_filters(SR, 1024, 80, 20.0, SR // 2)
    np.testing.assert_allclose(ours, goldens["mel_slaney_80"], atol=1e-6)


def test_htk_filterbank_matches_golden(goldens):
    ours = au.mel_filters_htk(SR, 512, 23, 0.0, SR / 2.0)
    np.testing.assert_allclose(ours, goldens["mel_htk_23"], atol=1e-6)


def test_logmel_matches_frozen_regression(goldens):
    """Frozen regression for the TTS-style target features: the tgt logmel
    path has no independent spec twin, so its output on the golden wave is
    pinned against drift (value checked at freeze time for plausibility)."""
    wave = goldens["wave"]
    lm = au.extract_logmel_spectrogram(
        wave, SR, n_fft=1024, win_length=1024, hop_length=256, n_mels=80,
        f_min=20.0, f_max=8000.0)
    if "logmel80" in goldens.files:
        np.testing.assert_allclose(lm, goldens["logmel80"], atol=1e-5)
    else:  # first run after generator update: fail loudly
        pytest.fail("regenerate dsp_goldens.npz with logmel80")
