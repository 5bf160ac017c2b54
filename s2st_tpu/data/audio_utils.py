"""Audio IO + host-side DSP (numpy), dependency-free.

Parity targets:
- ``fairseq/data/audio/audio_utils.py`` — waveform/zip-slice IO (:182-215),
  fourier/mel bases (:218-242), ``TTSSpectrogram`` conv-STFT (:245-271),
  ``TTSMelScale`` (:274-285);
- ``examples/speech_synthesis/data_utils.py:46-76`` — log-mel extraction
  (reflect-pad STFT -> slaney mel -> log(clamp(x, 1e-5)));
- torchaudio.compliance.kaldi.fbank defaults (used by
  ``fairseq/data/audio/audio_utils.py:137-149`` for source features):
  25ms/10ms povey window, preemphasis 0.97, DC removal, power spectrum,
  Kaldi (HTK-mel, un-normalized) filterbank, natural log.

The reference leans on soundfile/librosa/torchaudio; none are assumed here —
WAV IO uses the stdlib and the DSP is re-derived in numpy (golden-tested in
tests/test_dsp.py against the vendored tests/golden/dsp_goldens.npz, which
an independent spec implementation generates — see
tests/golden/gen_dsp_goldens.py). JAX on-device twins live in
``s2st_tpu.ops.dsp``.
"""

from __future__ import annotations

import io
import mmap
import struct
import wave
import zipfile
from pathlib import Path
from typing import BinaryIO, Dict, List, Optional, Tuple, Union

import numpy as np

FEATURE_OR_SF_AUDIO_FILE_EXTENSIONS = {".npy", ".wav", ".flac", ".ogg"}


# ---------------------------------------------------------------------------
# WAV IO (PCM16 only; enough for the Fisher/LJSpeech-style pipelines)
# ---------------------------------------------------------------------------

def read_wav(path_or_fp: Union[str, BinaryIO], normalization: bool = True
             ) -> Tuple[np.ndarray, int]:
    """Returns (waveform (T,) float32, sample_rate). normalization=False keeps
    the 16-bit integer scale (what kaldi fbank expects)."""
    with wave.open(path_or_fp if not isinstance(path_or_fp, str)
                   else open(path_or_fp, "rb")) as w:
        sr = w.getframerate()
        n = w.getnframes()
        sw = w.getsampwidth()
        ch = w.getnchannels()
        raw = w.readframes(n)
    if sw == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32)
        scale = 2.0 ** 15
    elif sw == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32)
        scale = 2.0 ** 31
    elif sw == 1:
        data = np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0
        scale = 2.0 ** 7
    else:
        raise ValueError(f"unsupported sample width {sw}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    if normalization:
        data = data / scale
    elif sw != 2:
        data = data / scale * 2.0 ** 15  # reference denormalizes to 16-bit scale
    return data, sr


def write_wav(path: str, waveform: np.ndarray, sample_rate: int):
    """waveform: float in [-1, 1] or int16-scale; writes PCM16."""
    x = np.asarray(waveform, dtype=np.float32).reshape(-1)
    if np.max(np.abs(x), initial=0.0) > 8.0:  # already int16-scale
        pcm = np.clip(x, -32768, 32767).astype("<i2")
    else:
        pcm = np.clip(x * 2.0 ** 15, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


# ---------------------------------------------------------------------------
# zip-slice / npy reads ("[zip_path]:[offset]:[length]" manifests)
# ---------------------------------------------------------------------------

def is_npy_data(data: bytes) -> bool:
    return data[0] == 147 and data[1] == 78


def mmap_read(path: str, offset: int, length: int) -> bytes:
    with open(path, "rb") as f:
        with mmap.mmap(f.fileno(), length=0, access=mmap.ACCESS_READ) as mm:
            return mm[offset:offset + length]


def parse_path(path: str) -> Tuple[str, List[int]]:
    if Path(path).suffix in FEATURE_OR_SF_AUDIO_FILE_EXTENSIONS:
        return path, []
    _path, *slice_ptr = path.split(":")
    if not Path(_path).is_file():
        raise FileNotFoundError(f"File not found: {_path}")
    assert len(slice_ptr) in {0, 2}, f"Invalid path: {path}"
    return _path, [int(i) for i in slice_ptr]


def get_features_or_waveform(path: str, need_waveform: bool = False,
                             use_sample_rate: Optional[int] = None) -> np.ndarray:
    """npy features, or waveform for .wav / zip-slices (audio_utils parity)."""
    _path, slice_ptr = parse_path(path)
    if not slice_ptr:
        if Path(_path).suffix == ".npy":
            return np.load(_path)
        w, _ = read_wav(_path, normalization=need_waveform)
        return w
    data = mmap_read(_path, slice_ptr[0], slice_ptr[1])
    if is_npy_data(data):
        return np.load(io.BytesIO(data))
    w, _ = read_wav(io.BytesIO(data), normalization=need_waveform)
    return w


def create_zip(data_root: Path, zip_path: Path):
    """Store (uncompressed) all .npy under data_root into one zip
    (examples/s2s_trans/preprocessing/data_utils.py create_zip parity)."""
    paths = sorted(Path(data_root).glob("*.npy"))
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
        for p in paths:
            zf.write(p, arcname=p.name)


def get_zip_manifest(zip_path: Path) -> Dict[str, str]:
    """id -> "zipfile:offset:length" entries for every stored member."""
    with zipfile.ZipFile(zip_path, "r") as zf:
        infos = zf.infolist()
    manifest = {}
    with open(zip_path, "rb") as f:
        for info in infos:
            f.seek(info.header_offset)
            header = f.read(30)
            assert header[:4] == b"PK\x03\x04"
            name_len = struct.unpack("<H", header[26:28])[0]
            extra_len = struct.unpack("<H", header[28:30])[0]
            offset = info.header_offset + 30 + name_len + extra_len
            manifest[Path(info.filename).stem] = \
                f"{zip_path}:{offset}:{info.compress_size}"
    return manifest


# ---------------------------------------------------------------------------
# mel filterbanks
# ---------------------------------------------------------------------------

def hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)


def mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


def mel_filters(sample_rate: int, n_fft: int, n_mels: int, f_min: float,
                f_max: float) -> np.ndarray:
    """librosa.filters.mel clone (htk=False, norm='slaney') -> (n_mels, 1+n_fft/2)."""
    fft_freqs = np.linspace(0, sample_rate / 2, 1 + n_fft // 2)
    mel_pts = np.linspace(hz_to_mel_slaney(f_min), hz_to_mel_slaney(f_max),
                          n_mels + 2)
    hz_pts = mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def hz_to_mel_htk(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (np.exp(np.asarray(m, np.float64) / 1127.0) - 1.0)


def mel_filters_htk(sample_rate: int, n_fft: int, n_mels: int, f_min: float,
                    f_max: float) -> np.ndarray:
    """torchaudio melscale_fbanks(mel_scale='htk', norm=None) clone
    (the torchaudio.transforms.MelSpectrogram DEFAULT — what the reference's
    MFCC/MCD metric uses, tasks/s2s_translation.py:541-547) ->
    (n_mels, 1 + n_fft//2), unit-peak triangles on the HTK mel scale."""
    fft_freqs = np.linspace(0, sample_rate / 2, 1 + n_fft // 2)
    mel_pts = np.linspace(hz_to_mel_htk(f_min), hz_to_mel_htk(f_max),
                          n_mels + 2)
    hz_pts = mel_to_hz_htk(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    return np.maximum(0.0, np.minimum(lower, upper)).astype(np.float32)


def kaldi_mel_banks(num_bins: int, window_length_padded: int, sample_rate: int,
                    low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """Kaldi MelBanks (un-normalized triangles on HTK mel) -> (num_bins, padded/2)."""
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_rate
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    fft_bin_width = sample_rate / window_length_padded
    mel_low = hz_to_mel_htk(low_freq)
    mel_high = hz_to_mel_htk(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    bin_mels = hz_to_mel_htk(np.arange(num_fft_bins) * fft_bin_width)  # (F,)
    left = mel_low + np.arange(num_bins)[:, None] * mel_delta
    center = left + mel_delta
    right = center + mel_delta
    up = (bin_mels[None, :] - left) / (center - left)
    down = (right - bin_mels[None, :]) / (right - center)
    return np.maximum(0.0, np.minimum(up, down)).astype(np.float32)


# ---------------------------------------------------------------------------
# TTS log-mel spectrogram (target features)
# ---------------------------------------------------------------------------

def tts_spectrogram(waveform: np.ndarray, n_fft: int, win_length: int,
                    hop_length: int, return_phase: bool = False):
    """Centered (reflect-pad n_fft//2) magnitude STFT with a hann window
    zero-padded to n_fft (TTSSpectrogram parity). waveform: (T,)."""
    pad = n_fft // 2
    x = np.pad(waveform.astype(np.float64), (pad, pad), mode="reflect")
    win = np.hanning(win_length + 1)[:-1]  # torch.hann_window(periodic=True)
    wpad = n_fft - win_length
    win = np.pad(win, (wpad // 2, wpad - wpad // 2))
    n_frames = 1 + (len(x) - n_fft) // hop_length
    idx = np.arange(n_fft)[None, :] + hop_length * np.arange(n_frames)[:, None]
    frames = x[idx] * win[None, :]
    spec = np.fft.rfft(frames, n=n_fft, axis=1)
    mag = np.abs(spec).T.astype(np.float32)  # (F, T)
    if return_phase:
        return mag, np.angle(spec).T.astype(np.float32)
    return mag


def extract_logmel_spectrogram(waveform: np.ndarray, sample_rate: int,
                               win_length: int = 1024, hop_length: int = 256,
                               n_fft: int = 1024, n_mels: int = 80,
                               f_min: float = 0.0, f_max: float = 8000.0,
                               eps: float = 1e-5) -> np.ndarray:
    """(T,) normalized waveform -> (T_frames, n_mels) float32 log-mel
    (examples/speech_synthesis/data_utils.py:46-76 parity)."""
    mag = tts_spectrogram(waveform, n_fft, win_length, hop_length)
    mel = mel_filters(sample_rate, n_fft, n_mels, f_min, f_max) @ mag
    return np.log(np.maximum(mel, eps)).T.astype(np.float32)


# ---------------------------------------------------------------------------
# Kaldi-style fbank (source features)
# ---------------------------------------------------------------------------

def _povey_window(n: int) -> np.ndarray:
    a = 2 * np.pi / (n - 1)
    return (0.5 - 0.5 * np.cos(a * np.arange(n))) ** 0.85


def kaldi_fbank(waveform: np.ndarray, sample_rate: int = 16000,
                num_mel_bins: int = 80, frame_length_ms: float = 25.0,
                frame_shift_ms: float = 10.0, preemphasis: float = 0.97,
                remove_dc_offset: bool = True, low_freq: float = 20.0,
                high_freq: float = 0.0) -> np.ndarray:
    """torchaudio.compliance.kaldi.fbank clone with default args (dither=0,
    povey window, snip_edges, power spectrum, natural log). waveform: (T,)
    at 16-bit integer scale. Returns (n_frames, num_mel_bins) float32."""
    window_size = int(sample_rate * frame_length_ms * 1e-3)
    window_shift = int(sample_rate * frame_shift_ms * 1e-3)
    padded = 1 << (window_size - 1).bit_length()  # round up to power of 2
    x = np.asarray(waveform, dtype=np.float64)
    if len(x) < window_size:
        return np.zeros((0, num_mel_bins), np.float32)
    n_frames = 1 + (len(x) - window_size) // window_shift
    idx = (np.arange(window_size)[None, :]
           + window_shift * np.arange(n_frames)[:, None])
    frames = x[idx]
    if remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if preemphasis != 0.0:
        first = frames[:, :1]
        frames = np.concatenate(
            [first - preemphasis * first,
             frames[:, 1:] - preemphasis * frames[:, :-1]], axis=1)
    frames = frames * _povey_window(window_size)[None, :]
    spec = np.fft.rfft(frames, n=padded, axis=1)
    power = (spec.real ** 2 + spec.imag ** 2)[:, :padded // 2]  # drop nyquist
    banks = kaldi_mel_banks(num_mel_bins, padded, sample_rate, low_freq, high_freq)
    mel = power @ banks.T.astype(np.float64)
    eps = np.finfo(np.float32).eps
    return np.log(np.maximum(mel, eps)).astype(np.float32)


# ---------------------------------------------------------------------------
# global CMVN
# ---------------------------------------------------------------------------

def compute_global_cmvn(feature_iter) -> Dict[str, np.ndarray]:
    """Streaming mean/std over an iterable of (T, C) arrays
    (examples/speech_synthesis/data_utils.py:189-221 parity)."""
    mean_x = mean_x2 = None
    n = 0
    for frames in feature_iter:
        frames = np.asarray(frames, dtype=np.float64)
        n += frames.shape[0]
        sx = frames.sum(axis=0)
        sx2 = (frames ** 2).sum(axis=0)
        mean_x = sx if mean_x is None else mean_x + sx
        mean_x2 = sx2 if mean_x2 is None else mean_x2 + sx2
    mean_x /= n
    mean_x2 /= n
    std = np.sqrt(np.maximum(mean_x2 - mean_x ** 2, 1e-10))
    return {"mean": mean_x.astype(np.float32), "std": std.astype(np.float32)}


def resample(waveform: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Polyphase resampling (sox-effects "rate" parity in spirit;
    audio_utils.convert_waveform in the reference shells out to sox)."""
    if orig_sr == new_sr:
        return waveform
    from math import gcd
    from scipy.signal import resample_poly
    g = gcd(orig_sr, new_sr)
    return resample_poly(waveform, new_sr // g, orig_sr // g).astype(
        waveform.dtype)
