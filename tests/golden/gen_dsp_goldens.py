"""Generate hermetic DSP golden tensors (tests/golden/dsp_goldens.npz).

torchaudio is not installable in this image, so the goldens are produced by
INDEPENDENT re-implementations of the reference numerics written directly
from the algorithm specifications — NOT by importing s2st_tpu (that would
be circular):

- Kaldi fbank (the spec torchaudio.compliance.kaldi.fbank implements):
  snip-edges framing, per-frame DC removal, preemphasis with the edge
  convention wave[0]-p*wave[0], povey window (hann^0.85), power spectrum on
  the next pow2 FFT, triangular mel banks constructed in MEL space
  (1127 ln(1+f/700)) excluding the nyquist bin, natural log with
  FLT_EPSILON floor.
- Slaney mel filterbank (librosa.filters.mel htk=False norm='slaney'):
  triangles in Hz between slaney-mel-spaced points, 2/bandwidth norm.
- HTK mel filterbank (torchaudio melscale_fbanks mel_scale='htk',
  norm=None): unit-peak triangles on the HTK mel scale (the reference's
  MFCC/MCD path, tasks/s2s_translation.py:541-547).

Agreement between these and s2st_tpu.data.audio_utils (asserted in
tests/test_dsp.py) is two independently-written implementations of the
same spec matching — the same evidence strength as the torchaudio
comparison the goldens replace.

Run:  python tests/golden/gen_dsp_goldens.py
"""

import numpy as np

SR = 16000


# --------------------------------------------------------------------------
# independent Kaldi fbank
# --------------------------------------------------------------------------

def povey(n):
    a = 2 * np.pi / (n - 1)
    return (0.5 - 0.5 * np.cos(a * np.arange(n))) ** 0.85


def mel_k(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


def kaldi_mel_banks_spec(num_bins, padded, sr, low=20.0, high=0.0):
    if high <= 0:
        high = sr / 2 + high
    n_fft_bins = padded // 2
    bin_width = sr / padded
    lo_m, hi_m = mel_k(low), mel_k(high)
    delta = (hi_m - lo_m) / (num_bins + 1)
    banks = np.zeros((num_bins, n_fft_bins))
    fft_mels = mel_k(bin_width * np.arange(n_fft_bins))
    for j in range(num_bins):
        left = lo_m + j * delta
        center = left + delta
        right = center + delta
        up = (fft_mels - left) / (center - left)
        down = (right - fft_mels) / (right - center)
        banks[j] = np.maximum(0.0, np.minimum(up, down))
    return banks


def kaldi_fbank_spec(wave, sr=SR, num_bins=24):
    win = int(sr * 0.025)
    shift = int(sr * 0.010)
    padded = 1 << (win - 1).bit_length()
    x = np.asarray(wave, np.float64)
    nf = 1 + (len(x) - win) // shift
    out = np.zeros((nf, num_bins))
    w = povey(win)
    banks = kaldi_mel_banks_spec(num_bins, padded, sr)
    for i in range(nf):
        fr = x[i * shift: i * shift + win].copy()
        fr -= fr.mean()
        pre = np.empty_like(fr)
        pre[0] = fr[0] - 0.97 * fr[0]
        pre[1:] = fr[1:] - 0.97 * fr[:-1]
        fr = pre * w
        spec = np.fft.rfft(fr, n=padded)
        power = (spec.real ** 2 + spec.imag ** 2)[: padded // 2]
        mel = banks @ power
        out[i] = np.log(np.maximum(mel, np.finfo(np.float32).eps))
    return out.astype(np.float32)


# --------------------------------------------------------------------------
# independent mel filterbanks
# --------------------------------------------------------------------------

def mel_slaney(f):
    f = np.asarray(f, np.float64)
    m = np.where(f < 1000.0, 3.0 * f / 200.0,
                 15.0 + 27.0 * np.log(f / 1000.0) / np.log(6.4))
    return m


def mel_slaney_inv(m):
    m = np.asarray(m, np.float64)
    return np.where(m < 15.0, 200.0 * m / 3.0,
                    1000.0 * np.exp(np.log(6.4) * (m - 15.0) / 27.0))


def slaney_filterbank_spec(sr, n_fft, n_mels, f_min, f_max):
    freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    pts = mel_slaney_inv(np.linspace(mel_slaney(f_min), mel_slaney(f_max),
                                     n_mels + 2))
    fb = np.zeros((n_mels, len(freqs)))
    for j in range(n_mels):
        lo, ce, hi = pts[j], pts[j + 1], pts[j + 2]
        up = (freqs - lo) / (ce - lo)
        down = (hi - freqs) / (hi - ce)
        fb[j] = np.maximum(0.0, np.minimum(up, down)) * 2.0 / (hi - lo)
    return fb.astype(np.float32)


def mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_htk_inv(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def htk_filterbank_spec(sr, n_fft, n_mels, f_min, f_max):
    freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    pts = mel_htk_inv(np.linspace(mel_htk(f_min), mel_htk(f_max),
                                  n_mels + 2))
    fb = np.zeros((n_mels, len(freqs)))
    for j in range(n_mels):
        lo, ce, hi = pts[j], pts[j + 1], pts[j + 2]
        up = (freqs - lo) / (ce - lo)
        down = (hi - freqs) / (hi - ce)
        fb[j] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def golden_input(dur=0.2, sr=SR):
    """Deterministic chirp + tone + noise (exercises all mel bands)."""
    r = np.random.RandomState(1234)
    t = np.arange(int(dur * sr)) / sr
    chirp = np.sin(2 * np.pi * (100 + 2000 * t) * t)
    tone = 0.3 * np.sin(2 * np.pi * 440 * t)
    noise = 0.05 * r.randn(len(t))
    return (0.5 * (chirp + tone) + noise).astype(np.float32)


def main():
    wave = golden_input()
    arrays = dict(
        wave=wave,
        kaldi_fbank24=kaldi_fbank_spec(wave * (2 ** 15), SR, 24),
        kaldi_fbank80=kaldi_fbank_spec(wave * (2 ** 15), SR, 80),
        mel_slaney_80=slaney_filterbank_spec(SR, 1024, 80, 20.0, SR // 2),
        mel_htk_23=htk_filterbank_spec(SR, 512, 23, 0.0, SR / 2.0),
    )
    # logmel80 is a FROZEN REGRESSION tensor (no independent spec twin):
    # regenerating re-freezes the CURRENT library output — only do that
    # deliberately after reviewing an intentional numerics change
    import sys
    sys.path.insert(0, ".")
    from s2st_tpu.data.audio_utils import extract_logmel_spectrogram
    arrays["logmel80"] = extract_logmel_spectrogram(
        wave, SR, n_fft=1024, win_length=1024, hop_length=256, n_mels=80,
        f_min=20.0, f_max=8000.0).astype(np.float32)
    np.savez("tests/golden/dsp_goldens.npz", **arrays)
    print("wrote tests/golden/dsp_goldens.npz (incl. frozen logmel80)")


if __name__ == "__main__":
    main()
