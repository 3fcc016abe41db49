"""Training losses: the reference's 5-term objective
(ref: pytorch/fluid_net_train.py:229-285,371-375).

total = pL2*MSE(p, p_t) + divL2*MSE(div(U), 0) + pL1*L1(p, p_t)
      + divL1*L1(div(U), 0) + divLT*MSE(div(U_longterm), 0)

``mask`` (optional, (b, h, w) float/bool) excludes cells from the
divergence terms. This matters for training states that carry imposed
inlet/const BCs (e.g. plume rollout frames): the physical step re-clamps
those cells AFTER the projection, so divergence there is not the
projection's to remove — penalising it teaches the net to cancel the
inlet jet itself (observed r2: a div-only loss on plume frames produced a
net that suppressed the plume, RESULTS.md). The reference never hit this
because its Manta training scenes carry no const-BC masks.
"""
from typing import NamedTuple

import jax.numpy as jnp

from ..config import TrainConfig
from ..ops.stencils import velocity_divergence


class LossTerms(NamedTuple):
    total: jnp.ndarray
    p_l2: jnp.ndarray
    div_l2: jnp.ndarray
    p_l1: jnp.ndarray
    div_l1: jnp.ndarray
    div_lt: jnp.ndarray


def _masked_mean(x, mask):
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def short_term_losses(cfg: TrainConfig, p_out, U_out, flags, p_target,
                      mask=None):
    out_div = velocity_divergence(U_out, flags)
    p_l2 = cfg.p_l2_lambda * jnp.mean((p_out - p_target) ** 2)
    div_l2 = cfg.div_l2_lambda * _masked_mean(out_div**2, mask)
    p_l1 = cfg.p_l1_lambda * jnp.mean(jnp.abs(p_out - p_target))
    div_l1 = cfg.div_l1_lambda * _masked_mean(jnp.abs(out_div), mask)
    return p_l2, div_l2, p_l1, div_l1


def long_term_loss(cfg: TrainConfig, U_lt, flags, mask=None):
    div_lt = velocity_divergence(U_lt, flags)
    return cfg.div_lt_lambda * _masked_mean(div_lt**2, mask)
