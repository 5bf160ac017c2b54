"""Quantization ops: iPQ (product quantization) + scalar fake-quant (QAT).

TPU-native rebuild of the reference quantization subsystem
(``fairseq/modules/quantization/``):

- **quant_noise** (`fairseq/modules/quant_noise.py:10-108`): block dropout
  of weights during training so the model becomes robust to the subsequent
  iterative product quantization ("Training with Quantization Noise for
  Extreme Model Compression"). The reference registers a forward pre-hook
  per nn.Module; here it is a pure jittable weight transform applied inside
  the fused train step (same math: Bernoulli(p) per block, drop + 1/(1-p)
  rescale), so the masks fuse into the consuming matmul and never hit HBM.

- **PQ / EM** (`fairseq/modules/quantization/pq/{em,pq}.py`): k-means on
  weight sub-blocks. The E-step distance matrix is a single MXU matmul
  (|w|^2 - 2 c.w + |c|^2) and the M-step a segment-sum — both jitted; the
  rare empty-cluster split (`em.py:94-135`) stays on the host, as in the
  reference. Reshape conventions byte-match `pq.py:269-302` so centroids /
  assignments interop with fairseq checkpoints.

- **PQLinear / PQEmbedding** (`pq/modules/{qlinear,qemb}.py`): quantized
  layers re-instantiate the weight from ``centroids[assignments]`` each
  forward; centroids are the trainable parameter (iPQ centroid finetuning).
  Here the quantized layer is a *param subtree shape*: ``{"centroids",
  "assignments"[, "b"]}``, reconstructed inside ``nn.core.linear`` /
  ``embedding``; gradients flow to centroids through the gather.

- **scalar QAT** (`scalar/{ops.py,modules/qlinear.py,modules/qact.py}`):
  int8-emulated weights/activations with a straight-through estimator.
  ``tensor`` and ``channel`` observers match torch.ao's MinMaxObserver /
  PerChannelMinMaxObserver(symmetric) math exactly; ``histogram`` keeps the
  torch HistogramObserver *objective* (pick the clip range minimizing
  quantization MSE) but solves it with a jittable fixed grid search over
  clip fractions instead of torch's iterative bin search — on TPU the whole
  observer runs inside the step, so scale/zero_point are recomputed every
  step rather than cached for ``update_step`` steps (the cache exists in
  the reference purely to amortize a slow host-side observer).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# quant_noise (iPQ training noise)
# ---------------------------------------------------------------------------

def quant_noise_weight(rng, w: jnp.ndarray, p: float, block_size: int,
                       blocks_axis: int = 0) -> jnp.ndarray:
    """Block dropout on a 2D weight (`quant_noise.py:58-105`).

    The reference masks per (out_features, in_features // block_size) block
    with Bernoulli(p) = drop, then scales by 1/(1-p). ``blocks_axis`` is the
    axis holding in_features: 0 for our linear layout (in, out), 1 for the
    embedding layout (num_embeddings, dim).
    """
    if p <= 0:
        return w
    if blocks_axis == 1:
        return quant_noise_weight(rng, w.T, p, block_size, 0).T
    n_in, n_out = w.shape
    assert n_in % block_size == 0, \
        "Input features must be a multiple of block sizes"
    drop = jax.random.bernoulli(rng, p, (n_in // block_size, n_out))
    drop = jnp.repeat(drop, block_size, axis=0)
    scale = 1.0 / (1.0 - p)
    return jnp.where(drop, 0.0, w.astype(jnp.float32) * scale).astype(w.dtype)


# ---------------------------------------------------------------------------
# scalar fake-quant (QAT)
# ---------------------------------------------------------------------------

def scalar_quantize(w: jnp.ndarray, scale: jnp.ndarray, zero_point: jnp.ndarray,
                    bits: int = 8) -> jnp.ndarray:
    """`scalar/ops.py:15-20` quantize(): affine round-clamp-dequant."""
    max_val = 2 ** bits - 1
    w32 = w.astype(jnp.float32)
    return ((jnp.clip(jnp.round(w32 / scale + zero_point), 0, max_val)
             - zero_point) * scale).astype(w.dtype)


def observe_tensor(w: jnp.ndarray, bits: int = 8,
                   eps: float = float(np.finfo(np.float32).eps)
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """torch.ao MinMaxObserver (per-tensor affine, quint8) qparams math."""
    qmin, qmax = 0, 2 ** bits - 1
    w32 = w.astype(jnp.float32)
    min_val = jnp.minimum(w32.min(), 0.0)
    max_val = jnp.maximum(w32.max(), 0.0)
    scale = jnp.maximum((max_val - min_val) / float(qmax - qmin), eps)
    zero_point = jnp.clip(qmin - jnp.round(min_val / scale), qmin, qmax)
    return scale, zero_point


def observe_channel(w: jnp.ndarray, axis: int = -1, bits: int = 8,
                    eps: float = float(np.finfo(np.float32).eps)
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """torch.ao PerChannelMinMaxObserver(ch_axis, per_channel_symmetric,
    quint8): scale = max(|min|, max) / ((qmax - qmin) / 2), zp = 128.

    Returns per-channel scale/zero_point broadcastable against ``w``.
    """
    qmin, qmax = 0, 2 ** bits - 1
    w32 = w.astype(jnp.float32)
    axes = tuple(i for i in range(w.ndim) if i != axis % w.ndim)
    min_val = jnp.minimum(w32.min(axis=axes, keepdims=True), 0.0)
    max_val = jnp.maximum(w32.max(axis=axes, keepdims=True), 0.0)
    amax = jnp.maximum(-min_val, max_val)
    scale = jnp.maximum(amax / ((qmax - qmin) / 2.0), eps)
    zero_point = jnp.full_like(scale, float((qmax + 1) // 2))
    return scale, zero_point


def observe_histogram(w: jnp.ndarray, bits: int = 8, n_candidates: int = 32,
                      eps: float = float(np.finfo(np.float32).eps)
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Clip-range observer minimizing quantization MSE.

    Same objective as torch.ao HistogramObserver (used by the reference's
    default ``method="histogram"``, `scalar/ops.py:22-30`): choose a
    [min, max] clip narrower than the data range when that lowers the total
    quantization error. Solved TPU-natively: evaluate the true MSE of
    ``n_candidates`` symmetric shrinkages of the minmax range in parallel
    (one vectorized pass, jittable) and keep the argmin, instead of torch's
    sequential histogram-bin search.
    """
    qmin, qmax = 0, 2 ** bits - 1
    w32 = w.astype(jnp.float32).reshape(-1)
    min_val = jnp.minimum(w32.min(), 0.0)
    max_val = jnp.maximum(w32.max(), 0.0)
    # candidate clip ranges: keep fraction f of the minmax span
    fracs = jnp.linspace(1.0, 1.0 / n_candidates, n_candidates)

    def mse_for(frac):
        lo, hi = min_val * frac, max_val * frac
        scale = jnp.maximum((hi - lo) / float(qmax - qmin), eps)
        zp = jnp.clip(qmin - jnp.round(lo / scale), qmin, qmax)
        q = (jnp.clip(jnp.round(w32 / scale + zp), qmin, qmax) - zp) * scale
        return jnp.mean(jnp.square(q - w32)), scale, zp

    errs, scales, zps = jax.vmap(mse_for)(fracs)
    best = jnp.argmin(errs)
    return scales[best], zps[best]


def observe(w: jnp.ndarray, method: str, bits: int = 8, axis: int = -1
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if method == "tensor":
        return observe_tensor(w, bits)
    if method == "channel":
        return observe_channel(w, axis=axis, bits=bits)
    if method == "histogram":
        return observe_histogram(w, bits)
    raise ValueError(f"unknown scalar quantization method: {method}")


def scalar_qat_weight(rng, w: jnp.ndarray, p: float, bits: int = 8,
                      method: str = "histogram", axis: int = -1,
                      scale=None, zero_point=None) -> jnp.ndarray:
    """IntLinear/IntEmbedding weight transform (`scalar/modules/qlinear.py:
    69-103`): quantize a random fraction ``p`` of the weights (all of them
    when ``p == 1``, the eval regime) with a straight-through estimator;
    the non-noised weights are hard-clamped to the representable range.

    scale/zero_point: pass CACHED observer outputs to skip the observe
    pass — the reference recomputes them only every ``update_step=3000``
    iterations (qlinear.py:41,74) and uses the cached values in between.
    """
    w32 = w.astype(jnp.float32)
    if scale is None:
        scale, zero_point = observe(jax.lax.stop_gradient(w32), method, bits,
                                    axis=axis)
    q = scalar_quantize(jax.lax.stop_gradient(w32), scale, zero_point, bits)
    noise = q - jax.lax.stop_gradient(w32)
    if p < 1.0:
        keep = jax.random.bernoulli(rng, 1.0 - p, w.shape)  # 1 = no noise
        noise = jnp.where(keep, 0.0, noise)
    clamp_low = -scale * zero_point
    clamp_high = scale * (2 ** bits - 1 - zero_point)
    out = jnp.clip(w32, clamp_low, clamp_high) + jax.lax.stop_gradient(noise)
    return out.astype(w.dtype)


def scalar_qat_activation(y: jnp.ndarray, train: bool, bits: int = 8,
                          method: str = "histogram",
                          clamp_threshold: float = 5.0,
                          scale=None, zero_point=None) -> jnp.ndarray:
    """ActivationQuantizer (`scalar/modules/qact.py:57-88`) at the two
    operating points the reference uses (``quantize_model_`` hardcodes
    activation p=0): training → hard clamp to the representable range
    (noise fully masked); eval → fully fake-quantized activations. STE on
    both. ``clamp_threshold`` bounds the observer like the reference's
    [-5, 5] gradient-overflow clamp.

    scale/zero_point: CACHED observer outputs (the reference recomputes
    activation qparams only every ``update_step=1000`` forward passes,
    qact.py:40,60-63).
    """
    y32 = y.astype(jnp.float32)
    if scale is None:
        yd = jnp.clip(jax.lax.stop_gradient(y32), -clamp_threshold,
                      clamp_threshold)
        scale, zero_point = observe(yd, method, bits)
    clamp_low = -scale * zero_point
    clamp_high = scale * (2 ** bits - 1 - zero_point)
    clamped = jnp.clip(y32, clamp_low, clamp_high)
    if not train:
        q = scalar_quantize(jax.lax.stop_gradient(y32), scale, zero_point,
                            bits)
        return (clamped
                + jax.lax.stop_gradient(q - jnp.clip(
                    jax.lax.stop_gradient(y32), clamp_low, clamp_high))
                ).astype(y.dtype)
    return clamped.astype(y.dtype)


# ---------------------------------------------------------------------------
# PQ: EM k-means over weight blocks
# ---------------------------------------------------------------------------

def pq_reshape(w_out_in: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """`pq.py:269-285` step (1): (out, in) -> (block_size, n_blocks*out),
    columns enumerated block-major / out-minor."""
    out_features, in_features = w_out_in.shape
    assert in_features % block_size == 0, \
        "Linear: n_blocks must be a multiple of in_features"
    return (w_out_in.reshape(out_features, -1, block_size)
            .transpose(2, 1, 0).reshape(block_size, -1))


def pq_decode(centroids: jnp.ndarray, assignments: jnp.ndarray
              ) -> jnp.ndarray:
    """Reconstruct the torch-layout (out, in) weight from centroids
    (K, block_size) and 2D assignments (n_blocks, out) — the flat reference
    assignments (`qlinear.py:52-58`) reshaped to (n_blocks, out)."""
    n_blocks, out_features = assignments.shape
    block_size = centroids.shape[1]
    w = centroids[assignments]                      # (n_blocks, out, bs)
    return w.transpose(1, 0, 2).reshape(out_features, n_blocks * block_size)


@jax.jit
def _em_assign(W: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """E-step over the reshaped matrix W (bs, n_cols): nearest centroid by
    squared L2 (same argmin as `em.py:141-166`'s norm), as one MXU matmul."""
    w2 = jnp.sum(jnp.square(W), axis=0)             # (n_cols,)
    c2 = jnp.sum(jnp.square(centroids), axis=1)     # (K,)
    cross = centroids @ W                           # (K, n_cols) — MXU
    d2 = c2[:, None] - 2.0 * cross + w2[None, :]
    return jnp.argmin(d2, axis=0).astype(jnp.int32)


@jax.jit
def _em_centroids(W: jnp.ndarray, assignments: jnp.ndarray,
                  centroids: jnp.ndarray) -> jnp.ndarray:
    """M-step (`em.py:77-80`): per-cluster mean of assigned columns;
    empty clusters keep their previous centroid (resolved on the host)."""
    K = centroids.shape[0]
    sums = jax.ops.segment_sum(W.T, assignments, num_segments=K)  # (K, bs)
    counts = jax.ops.segment_sum(jnp.ones_like(assignments, jnp.float32),
                                 assignments, num_segments=K)
    mean = sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where(counts[:, None] > 0, mean, centroids)


class EmptyClusterResolveError(Exception):
    pass


def pq_em_encode(key, w_out_in: np.ndarray, block_size: int,
                 n_centroids: int = 256, n_iter: int = 20, eps: float = 1e-6,
                 max_tentatives: int = 30, verbose: bool = False,
                 init_centroids: Optional[np.ndarray] = None
                 ) -> Tuple[np.ndarray, np.ndarray, List[float]]:
    """Run the PQ EM loop (`pq.py:304-315` encode). Host-orchestrated with
    jitted E/M kernels; the empty-cluster split (`em.py:94-135`: most
    populated cluster splits, +-eps noise) runs on the host with JAX rng.

    Returns (centroids (K, bs) f32, assignments (n_blocks, out) int32,
    objective history). Like the reference, the returned assignments are
    the E-step of the LAST iteration (stale by one M-step — `em.py:57-90`);
    ``init_centroids`` overrides the random-column init (parity testing).
    """
    W = jnp.asarray(pq_reshape(jnp.asarray(w_out_in, jnp.float32),
                               block_size))
    out_features = w_out_in.shape[0]
    n_cols = W.shape[1]
    key, k0 = jax.random.split(key)
    if init_centroids is not None:
        centroids = jnp.asarray(init_centroids, jnp.float32)
    else:
        idx = jax.random.randint(k0, (n_centroids,), 0, n_cols)
        centroids = W[:, idx].T                      # (K, bs)
    objective: List[float] = []

    def resolve_empty(centroids, assignments, key):
        tentatives = 0
        while True:
            counts = np.bincount(np.asarray(assignments),
                                 minlength=n_centroids)
            empty = np.flatnonzero(counts == 0)
            if empty.size == 0:
                return centroids, assignments, key, tentatives
            if tentatives >= max_tentatives:
                raise EmptyClusterResolveError(
                    f"{empty.size} empty clusters remaining")
            key, k1, k2 = jax.random.split(key, 3)
            k_empty = int(jax.random.choice(k1, jnp.asarray(empty)))
            m = int(np.argmax(counts))
            e = jax.random.normal(k2, (W.shape[0],)) * eps
            centroids = centroids.at[k_empty].set(centroids[m] + e)
            centroids = centroids.at[m].add(-e)
            assignments = _em_assign(W, centroids)
            tentatives += 1

    assignments = _em_assign(W, centroids)
    try:
        for i in range(n_iter):
            assignments = _em_assign(W, centroids)
            centroids, assignments, key, _ = resolve_empty(
                centroids, assignments, key)
            centroids = _em_centroids(W, assignments, centroids)
            obj = float(jnp.linalg.norm(centroids[assignments].T - W))
            objective.append(obj)
            if verbose:
                print(f"PQ iter {i}: objective {obj:.6f}")
    except EmptyClusterResolveError:
        pass
    return (np.asarray(centroids, np.float32),
            np.asarray(assignments, np.int32).reshape(-1, out_features),
            objective)


def pq_quantize_linear(key, p: Params, block_size: int, n_centroids: int,
                       n_iter: int = 15, eps: float = 1e-6,
                       max_tentatives: int = 100) -> Params:
    """Quantize one of OUR linear param subtrees {"w" (in,out)[, "b"]} into
    {"centroids", "assignments"[, "b"]} (`pq/utils.py:quantize_model_`
    semantics for nn.Linear: weights quantized, biases kept)."""
    w_out_in = np.asarray(p["w"]).T
    centroids, assignments, _ = pq_em_encode(
        key, w_out_in, block_size, n_centroids, n_iter, eps, max_tentatives)
    out: Params = {"centroids": jnp.asarray(centroids),
                   "assignments": jnp.asarray(assignments)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def pq_quantize_embedding(key, p: Params, block_size: int, n_centroids: int,
                          n_iter: int = 15, eps: float = 1e-6,
                          max_tentatives: int = 100) -> Params:
    """Embedding weight (num_embeddings, dim) is already torch-layout
    (out=num_embeddings, in=dim) — blocks along dim (`pq/modules/qemb.py`)."""
    w = np.asarray(p["w"])
    centroids, assignments, _ = pq_em_encode(
        key, w, block_size, n_centroids, n_iter, eps, max_tentatives)
    return {"centroids": jnp.asarray(centroids),
            "assignments": jnp.asarray(assignments)}


def pq_linear_weight(p: Params, dtype=None) -> jnp.ndarray:
    """OUR-layout (in, out) weight view of a PQ-quantized linear subtree."""
    w = pq_decode(p["centroids"], p["assignments"]).T
    return w if dtype is None else w.astype(dtype)


def pq_embedding_weight(p: Params, dtype=None) -> jnp.ndarray:
    """(num_embeddings, dim) weight view of a PQ-quantized embedding."""
    w = pq_decode(p["centroids"], p["assignments"])
    return w if dtype is None else w.astype(dtype)
