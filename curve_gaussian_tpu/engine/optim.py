"""Per-group Adam with exponential-log LR schedules.

A deliberately explicit Adam (not optax) so topology surgery can slice /
concatenate the first-moment and second-moment buffers exactly like the
reference's optimizer surgery (scene/gaussian_model.py:460-533,
gaussian_curve_model.py:246-278): `AdamState.mu/nu` mirror the param dict
structure row-for-row.

LR groups mirror reference training_setup (gaussian_curve_model.py:200-232):
  curve_points: log-lerp lr_curve_points_init -> _final over
                position_lr_max_steps (delay disabled, as in the reference
                call which leaves lr_delay_steps=0)
  features_dc:  feature_lr        opacity_raw: opacity_lr
  width_raw:    scaling_lr        mask_raw:    mask_lr
  exposure:     log-lerp exposure_lr_init -> _final over iterations
Adam eps = 1e-15 (gaussian_curve_model.py:213).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from ..config import OptimizationConfig

B1, B2, EPS = 0.9, 0.999, 1e-15


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AdamState:
    mu: Dict[str, jnp.ndarray]
    nu: Dict[str, jnp.ndarray]
    count: jnp.ndarray  # scalar int32


def init_adam(params: Dict[str, jnp.ndarray]) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def expon_lr(
    step,
    lr_init: float,
    lr_final: float,
    max_steps: int,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
):
    """Log-linear interpolation (utils/general_utils.py:99-132)."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(
        jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t
    )
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay = 1.0
    return delay * log_lerp


def group_lrs(opt: OptimizationConfig, step) -> Dict[str, jnp.ndarray]:
    return {
        "curve_points": expon_lr(
            step,
            opt.lr_curve_points_init,
            opt.lr_curve_points_final,
            opt.position_lr_max_steps,
        ),
        "features_dc": jnp.asarray(opt.feature_lr),
        "opacity_raw": jnp.asarray(opt.opacity_lr),
        "width_raw": jnp.asarray(opt.scaling_lr),
        "mask_raw": jnp.asarray(opt.mask_lr),
        "exposure": expon_lr(
            step,
            opt.exposure_lr_init,
            opt.exposure_lr_final,
            opt.iterations,
            opt.exposure_lr_delay_steps,
            opt.exposure_lr_delay_mult,
        ),
    }


def adam_update(
    params: Dict[str, jnp.ndarray],
    grads: Dict[str, jnp.ndarray],
    state: AdamState,
    lrs: Dict[str, jnp.ndarray],
    freeze: Dict[str, bool] | None = None,
):
    """One Adam step; `freeze[k]=True` pins a group (reference fix_opacity
    sets the opacity group's lr to 0, gaussian_curve_model.py:270-278).

    Groups absent from `grads` pass through untouched (param, mu, nu):
    the training step statically excludes groups whose gradient is zero by
    construction (features_dc — the renderer forces colors to ones, same
    as the reference's dead SH path; exposure when train_test_exp is off),
    so their Adam elementwise traffic is skipped entirely.  Bit-identical
    to updating with a zero gradient (mu/nu stay zero, update is zero)."""
    count = state.count + 1
    c1 = 1.0 - B1**count.astype(jnp.float32)
    c2 = 1.0 - B2**count.astype(jnp.float32)
    new_p, new_mu, new_nu = {}, {}, {}
    for k in params:
        if k not in grads:
            new_p[k] = params[k]
            new_mu[k] = state.mu[k]
            new_nu[k] = state.nu[k]
            continue
        g = grads[k]
        mu = B1 * state.mu[k] + (1 - B1) * g
        nu = B2 * state.nu[k] + (1 - B2) * g * g
        update = (mu / c1) / (jnp.sqrt(nu / c2) + EPS)
        lr = lrs[k]
        if freeze and freeze.get(k, False):
            lr = 0.0
        new_p[k] = params[k] - lr * update
        new_mu[k] = mu
        new_nu[k] = nu
    return new_p, AdamState(mu=new_mu, nu=new_nu, count=count)
