"""Core functional NN layers over explicit param pytrees.

Design: every layer is a pair of functions
    ``<layer>_init(key, ...) -> params``   (params: nested dict of jnp arrays)
    ``<layer>(params, x, ...) -> y``       (pure; no hidden state)

Conventions:
- activations are batch-major ``(B, T, C)`` everywhere (TPU/XLA friendly;
  the reference uses torch's ``(T, B, C)`` — we deliberately do not).
- params are stored float32; matmuls run in the compute dtype (usually
  bfloat16) selected by the caller via ``cast_params`` / input dtype.
- dropout is explicit: pass an ``rng`` key and ``deterministic`` flag.

Parity notes reference the upstream fairseq fork (see SURVEY.md), e.g.
``fairseq/modules/multihead_attention.py``.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def uniform_fan(key, shape, fan_in, dtype=jnp.float32):
    """torch nn.Linear/Conv default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def xavier_uniform(key, shape, fan_in, fan_out, gain=1.0, dtype=jnp.float32):
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def calculate_gain(nonlinearity: str) -> float:
    if nonlinearity == "relu":
        return math.sqrt(2.0)
    if nonlinearity == "tanh":
        return 5.0 / 3.0
    if nonlinearity == "linear":
        return 1.0
    raise ValueError(nonlinearity)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int, bias: bool = True,
                init: str = "torch", gain: float = 1.0) -> Params:
    kw, kb = jax.random.split(key)
    if init == "xavier":
        w = xavier_uniform(kw, (in_dim, out_dim), in_dim, out_dim, gain)
    else:
        w = uniform_fan(kw, (in_dim, out_dim), in_dim)
    p = {"w": w}
    if bias:
        p["b"] = uniform_fan(kb, (out_dim,), in_dim)
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "centroids" in p:  # iPQ-quantized layer (ops/quantization.py): the
        # weight is re-instantiated from centroids[assignments] each forward
        # (fairseq pq/modules/qlinear.py:52-62); grads flow to centroids.
        from ..ops.quantization import pq_linear_weight
        w = pq_linear_weight(p, x.dtype)
    else:
        w = p["w"].astype(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return _maybe_quantize_activation(y)


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------

def embedding_init(key, num_embeddings: int, dim: int,
                   padding_idx: Optional[int] = None) -> Params:
    # fairseq Embedding init: normal(0, dim**-0.5), zero at padding_idx
    # (fairseq/models/transformer/transformer_legacy.py Embedding helper).
    w = jax.random.normal(key, (num_embeddings, dim)) * (dim ** -0.5)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return {"w": w}


def embedding(p: Params, ids: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    if "centroids" in p:  # iPQ-quantized table (fairseq pq/modules/qemb.py)
        from ..ops.quantization import pq_embedding_weight
        return _maybe_quantize_activation(pq_embedding_weight(p, dtype)[ids])
    return p["w"].astype(dtype)[ids]


# ---------------------------------------------------------------------------
# scalar-quantization activation hook (trace-time static)
# ---------------------------------------------------------------------------

# Set by train.quantization.scalar_act_quant() around a forward trace; the
# TPU-native form of fairseq's ActivationQuantizer forward hooks
# (modules/quantization/scalar/modules/qact.py): every linear/embedding
# output is clamped to the int8-representable range at train time and fully
# fake-quantized at eval. Trace-time constant — reading it under jit bakes
# the active config into the compiled program.
#
# Context forms:
#   (train, bits, method)                      — inline observers (legacy)
#   (train, bits, method, cache)               — amortized observers: cache
#     is a dict {"scales": (N,), "zps": (N,), "recompute": bool tracer,
#     "i": [site counter], "new": [collected (scale, zp) per site]} built
#     by train.quantization.wrap_loss_quant_noise. Site index = trace order
#     of linear/embedding calls, which is deterministic for a fixed model —
#     the reference's per-module hook identity, functionally.
_ACT_QUANT: list = [None]


def _maybe_quantize_activation(y: jnp.ndarray) -> jnp.ndarray:
    ctx = _ACT_QUANT[0]
    if ctx is None:
        return y
    from ..ops.quantization import observe, scalar_qat_activation
    train, bits, method = ctx[0], ctx[1], ctx[2]
    cache = ctx[3] if len(ctx) > 3 else None
    if cache is None:
        return scalar_qat_activation(y, train=train, bits=bits,
                                     method=method)
    if cache.get("count_only"):
        # site-count discovery trace (init_scalar_qat_cache): just count
        cache["i"][0] += 1
        return scalar_qat_activation(y, train=train, bits=bits,
                                     method=method)
    i = cache["i"][0]
    cache["i"][0] = i + 1
    import jax as _jax
    import jax.numpy as _jnp

    def _fresh(_):
        yd = _jnp.clip(_jax.lax.stop_gradient(y.astype(_jnp.float32)),
                       -5.0, 5.0)
        s, z = observe(yd, method, bits)
        return s, z

    def _cached(_):
        return cache["scales"][i], cache["zps"][i]

    # qact.py:60-63 parity: recompute every update_step passes, reuse the
    # cached qparams otherwise. A STATIC python-bool recompute (trainer's
    # host-side step counter) compiles the taken branch straight-line —
    # no per-site cond launch; a traced recompute falls back to lax.cond
    # (which still executes only the taken branch at runtime)
    if isinstance(cache["recompute"], bool):
        scale, zp = _fresh(None) if cache["recompute"] else _cached(None)
    else:
        scale, zp = _jax.lax.cond(cache["recompute"], _fresh, _cached,
                                  operand=None)
    cache["new"].append((scale, zp))
    return scalar_qat_activation(y, train=train, bits=bits, method=method,
                                 scale=scale, zero_point=zp)


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------

def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    # stats in f32 for stability under bf16 compute
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# BatchNorm (for Tacotron2 Postnet parity; running stats live in `stats`)
# ---------------------------------------------------------------------------

def batch_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def batch_norm_stats_init(dim: int) -> Params:
    return {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,)),
            "count": jnp.zeros((), jnp.int32)}


def batch_norm(p: Params, stats: Params, x: jnp.ndarray, *, train: bool,
               momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm over (B, T, C) with per-channel stats (torch BatchNorm1d parity,
    fairseq/models/text_to_speech/tacotron2.py Postnet). Returns (y, new_stats).
    Like the reference, padding frames are *included* in the batch statistics.
    """
    xf = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(xf, axis=(0, 1))
        var = jnp.var(xf, axis=(0, 1))
        n = x.shape[0] * x.shape[1]
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": (1 - momentum) * stats["mean"] + momentum * mean,
            "var": (1 - momentum) * stats["var"] + momentum * unbiased,
            "count": stats["count"] + 1,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(x.dtype), new_stats


# ---------------------------------------------------------------------------
# Conv1d  (activations (B, T, C); kernels stored (K, Cin, Cout) for lax)
# ---------------------------------------------------------------------------

def conv1d_init(key, in_ch: int, out_ch: int, kernel: int, bias: bool = True,
                init: str = "torch", gain: float = 1.0) -> Params:
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel
    if init == "xavier":
        w = xavier_uniform(kw, (kernel, in_ch, out_ch), fan_in, out_ch * kernel, gain)
    else:
        w = uniform_fan(kw, (kernel, in_ch, out_ch), fan_in)
    p = {"w": w}
    if bias:
        p["b"] = uniform_fan(kb, (out_ch,), fan_in)
    return p


def conv1d(p: Params, x: jnp.ndarray, stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """1D convolution over time. x: (B, T, C) -> (B, T', Cout)."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Dropout / activations / masks
# ---------------------------------------------------------------------------

# module switch (read at trace time): 8-bit threshold masks need 4x fewer
# random bits than bernoulli's fp32 uniforms; flip to False to restore the
# exact bernoulli stream
DROPOUT_MASK_BITS = True


def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array],
            deterministic: bool) -> jnp.ndarray:
    """Inverted dropout. Default: 8-bit threshold mask — the keep
    probability is quantized to 1/256 and the rescale uses the QUANTIZED
    keep, so the expectation stays exactly unbiased (see ROADMAP perf
    notes on RNG cost)."""
    if deterministic or rate <= 0.0 or rng is None:
        return x
    if not DROPOUT_MASK_BITS:
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))
    thresh = int(round(rate * 256.0))
    if thresh <= 0:
        return x
    keep = (256 - thresh) / 256.0
    bits = jax.random.bits(rng, x.shape, jnp.uint8)
    mask = bits >= thresh                 # P(keep) = (256 - thresh)/256
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def glu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def get_activation(name: str):
    # fairseq "gelu" is torch F.gelu = EXACT erf; the tanh approximation
    # is its "gelu_fast"/"gelu_accurate" (fairseq/utils.py
    # get_activation_fn). jax.nn.gelu defaults to the approximation, so
    # pin approximate=False for parity.
    return {"relu": jax.nn.relu,
            "gelu": lambda x: jax.nn.gelu(x, approximate=False),
            "gelu_fast": jax.nn.gelu, "gelu_accurate": jax.nn.gelu,
            "tanh": jnp.tanh,
            "swish": jax.nn.swish, "linear": lambda x: x}[name]


def lengths_to_padding_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True at PAD positions (fairseq lengths_to_padding_mask parity)."""
    pos = jnp.arange(max_len)[None, :]
    return pos >= lengths[:, None]


def lengths_to_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True at VALID positions."""
    return ~lengths_to_padding_mask(lengths, max_len)


def split_rngs(rng: Optional[jax.Array], n: int) -> Sequence[Optional[jax.Array]]:
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


def cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        tree)
