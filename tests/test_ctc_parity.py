"""CTC loss parity: optax.ctc_loss vs torch.nn.CTCLoss (SURVEY §7 risk 4 —
the reference uses cudnn CTC with reduction='mean' over per-example
nll/label_len; verify values AND input gradients)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax


def _setup(seed=0, b=3, t=20, v=11, n=6):
    r = np.random.RandomState(seed)
    logits = r.randn(b, t, v).astype(np.float32)
    logit_lens = np.array([20, 16, 12], np.int32)
    labels = r.randint(1, v, size=(b, n)).astype(np.int32)
    label_lens = np.array([6, 4, 3], np.int32)
    return logits, logit_lens, labels, label_lens


def _torch_ctc(logits, logit_lens, labels, label_lens, reduction):
    lt = torch.tensor(logits, requires_grad=True)
    lp = torch.log_softmax(lt, dim=-1).transpose(0, 1)  # (T, B, V)
    flat = torch.cat([torch.tensor(labels[i, :label_lens[i]])
                      for i in range(len(label_lens))])
    loss = torch.nn.CTCLoss(blank=0, reduction=reduction,
                            zero_infinity=True)(
        lp, flat, torch.tensor(logit_lens), torch.tensor(label_lens))
    loss.backward()
    return loss.item(), lt.grad.numpy()


def _jax_ctc(logits, logit_lens, labels, label_lens):
    t = logits.shape[1]
    n = labels.shape[1]
    logit_pad = (np.arange(t)[None] >= logit_lens[:, None]).astype(np.float32)
    label_pad = (np.arange(n)[None] >= label_lens[:, None]).astype(np.float32)

    def lf(lg):
        per_ex = optax.ctc_loss(lg, jnp.asarray(logit_pad),
                                jnp.asarray(labels), jnp.asarray(label_pad),
                                blank_id=0)
        # torch CTCLoss(reduction='mean'): nll/label_len averaged over batch
        return jnp.mean(per_ex / jnp.asarray(label_lens, jnp.float32))

    val, grad = jax.value_and_grad(lf)(jnp.asarray(logits))
    return float(val), np.asarray(grad)


def test_ctc_value_matches_torch():
    logits, logit_lens, labels, label_lens = _setup()
    ref, ref_grad = _torch_ctc(logits, logit_lens, labels, label_lens, "mean")
    ours, our_grad = _jax_ctc(logits, logit_lens, labels, label_lens)
    assert abs(ours - ref) / abs(ref) < 1e-4, (ours, ref)
    np.testing.assert_allclose(our_grad, ref_grad, atol=2e-4)


def test_ctc_per_example_sums():
    """sum-reduction parity (per-example nll identical)."""
    logits, logit_lens, labels, label_lens = _setup(seed=1)
    lt = torch.tensor(logits)
    lp = torch.log_softmax(lt, dim=-1).transpose(0, 1)
    flat = torch.cat([torch.tensor(labels[i, :label_lens[i]])
                      for i in range(len(label_lens))])
    ref = torch.nn.CTCLoss(blank=0, reduction="none", zero_infinity=True)(
        lp, flat, torch.tensor(logit_lens), torch.tensor(label_lens)).numpy()
    t, n = logits.shape[1], labels.shape[1]
    logit_pad = (np.arange(t)[None] >= logit_lens[:, None]).astype(np.float32)
    label_pad = (np.arange(n)[None] >= label_lens[:, None]).astype(np.float32)
    ours = np.asarray(optax.ctc_loss(
        jnp.asarray(logits), jnp.asarray(logit_pad), jnp.asarray(labels),
        jnp.asarray(label_pad), blank_id=0))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
