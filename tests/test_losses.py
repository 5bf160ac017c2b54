"""Loss parity tests vs torch reference semantics (s2st_loss.py).

torch (CPU) is available in the image; we use it only as a numerical oracle
for the primitive loss terms, mirroring the reference's formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from s2st_tpu.train import losses as L
from tests.conftest import make_batch


def test_bce_with_logits_matches_torch():
    r = np.random.RandomState(0)
    logits = r.randn(4, 13).astype(np.float32)
    targets = (r.rand(4, 13) > 0.8).astype(np.float32)
    mask = np.ones((4, 13), bool)
    mask[2, 9:] = False
    ours = float(L.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets),
                                   5.0, jnp.asarray(mask)))
    lt = torch.tensor(logits)[torch.tensor(mask)]
    tt = torch.tensor(targets)[torch.tensor(mask)]
    ref = F.binary_cross_entropy_with_logits(
        lt, tt, pos_weight=torch.tensor(5.0)).item()
    assert abs(ours - ref) < 1e-5


def test_label_smoothed_nll_matches_reference_formula():
    """Reference label_smoothed_nll_loss (s2st_loss.py:33-50): sum reduction,
    eps_i = eps/(V-1), pad positions dropped."""
    r = np.random.RandomState(1)
    v, n, eps = 11, 7, 0.1
    logits = r.randn(n, v).astype(np.float32)
    target = r.randint(0, v, size=n)
    target[3] = 1  # PAD
    lp = torch.log_softmax(torch.tensor(logits), dim=-1)
    nll = -lp.gather(-1, torch.tensor(target)[:, None])[:, 0]
    smooth = -lp.sum(dim=-1)
    keep = torch.tensor(target) != 1
    eps_i = eps / (v - 1)
    ref = ((1.0 - eps - eps_i) * nll[keep].sum()
           + eps_i * smooth[keep].sum()).item()
    lp_j = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ours, nll_sum = L.label_smoothed_nll_loss(lp_j, jnp.asarray(target), eps)
    assert abs(float(ours) - ref) < 1e-4
    assert abs(float(nll_sum) - nll[keep].sum().item()) < 1e-4


def test_masked_l1_mse_match_torch_masked_select():
    r = np.random.RandomState(2)
    x = r.randn(3, 9, 5).astype(np.float32)
    y = r.randn(3, 9, 5).astype(np.float32)
    lens = np.array([9, 4, 7], np.int32)
    mask = np.arange(9)[None, :] < lens[:, None]
    ours_l1 = float(L.masked_mean(jnp.abs(jnp.asarray(x) - jnp.asarray(y)),
                                  jnp.asarray(mask)[:, :, None]))
    xt, yt = torch.tensor(x), torch.tensor(y)
    mt = torch.tensor(mask)[:, :, None].expand_as(xt)
    ref_l1 = F.l1_loss(xt.masked_select(mt), yt.masked_select(mt)).item()
    assert abs(ours_l1 - ref_l1) < 1e-6


def test_guided_attention_penalizes_off_diagonal():
    b, tt, ts = 1, 10, 10
    lens = jnp.full((1,), 10, jnp.int32)
    diag = jnp.eye(tt)[None]
    off = jnp.roll(jnp.eye(tt), 5, axis=1)[None]
    l_diag = float(L.guided_attention_loss(diag, lens, lens, 0.4))
    l_off = float(L.guided_attention_loss(off, lens, lens, 0.4))
    assert l_diag < l_off


def test_full_loss_finite_and_composite(tiny_cfg, tiny_variables, tiny_batch):
    lcfg = L.LossConfig(use_guided_attention_loss=True, ctc_weight=0.5,
                        asr_ce_weight=0.3, st_ce_weight=0.3)
    loss, extras = L.s2st_loss(tiny_variables, tiny_cfg, lcfg, tiny_batch,
                               rng=jax.random.PRNGKey(0), train=True)
    log = extras["logging"]
    assert np.isfinite(float(loss))
    total = (float(log["l1_loss"]) + float(log["mse_loss"])
             + float(log["eos_loss"]) + float(log["attn_loss"])
             + float(log["ctc_loss"]) + float(log["aux_asr_loss"])
             + float(log["aux_st_loss"]))
    assert abs(float(loss) - total) < 1e-4
    assert float(log["ctc_loss"]) > 0
    assert float(log["aux_asr_loss"]) > 0


def test_loss_invariant_to_batch_padding(tiny_cfg, tiny_variables):
    """Rows beyond the real batch have length 0 and must not change the loss
    (static-shape bucketing correctness)."""
    lcfg = L.LossConfig()
    b1 = make_batch(tiny_cfg, b=2, seed=5)
    loss1, _ = L.s2st_loss(tiny_variables, tiny_cfg, lcfg, b1, train=False)

    b2 = {k: (np.concatenate([v, np.zeros_like(v[:1])], axis=0)
              if isinstance(v, np.ndarray) else v) for k, v in b1.items()}
    # padded row: all-PAD text, zero lengths
    b2["src_text"][2] = 1
    b2["tgt_text"][2] = 1
    b2["prev_src_text_tokens"][2] = 1
    b2["prev_tgt_text_tokens"][2] = 1
    loss2, _ = L.s2st_loss(tiny_variables, tiny_cfg, lcfg, b2, train=False)
    assert abs(float(loss1) - float(loss2)) < 1e-4


def test_grads_flow_to_all_heads(tiny_cfg, tiny_variables, tiny_batch):
    lcfg = L.LossConfig(use_guided_attention_loss=True, ctc_weight=0.5,
                        asr_ce_weight=0.3, st_ce_weight=0.3)

    def lf(params):
        loss, _ = L.s2st_loss({"params": params,
                               "stats": tiny_variables["stats"]},
                              tiny_cfg, lcfg, tiny_batch, train=False)
        return loss

    grads = jax.grad(lf)(tiny_variables["params"])
    for head in ("encoder", "decoder", "aux_asr_decoder", "aux_st_decoder"):
        gnorm = sum(float(jnp.sum(jnp.abs(g)))
                    for g in jax.tree_util.tree_leaves(grads[head]))
        assert gnorm > 0, f"no grad into {head}"
