"""Training loss assembly (reference train.py:101-146 + utils/loss_utils.py).

All terms are capacity-mask aware: padding curves/Gaussians are excluded
from every mean via weighted reductions.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import OptimizationConfig
from ..ops.ssim import ssim
from . import curve_state as cs


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    w = mask.astype(x.dtype)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def edge_aware_loss(image: jnp.ndarray, gt: jnp.ndarray, threshold: float = 0.1):
    """Class-balanced weighted MSE (utils/loss_utils.py:94-115).

    image, gt: [H, W].  Edge pixels (gt > thr) weigh 5*(Nneg+1)/N, background
    (Npos+1)/N.
    """
    pos = gt > threshold
    num_pos = jnp.sum(pos).astype(image.dtype)
    num_neg = jnp.sum(~pos).astype(image.dtype)
    n = num_pos + num_neg
    w_pos = 5.0 * (num_neg + 1.0) / n
    w_neg = (num_pos + 1.0) / n
    mask = jnp.where(pos, w_pos, w_neg)
    return jnp.mean((image - gt) ** 2 * mask)


def l1_loss(a, b):
    return jnp.abs(a - b).mean()


def psnr(a, b):
    mse = jnp.mean((a - b) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse + 1e-12))


def curve_smoothness(tangent: jnp.ndarray, alive: jnp.ndarray, n_gaussians: int):
    """mean(1 - |cos|) of consecutive Gaussian main axes (train.py:119-124).

    tangent: [C*M, 3] unnormalized tangents (the main axis direction equals
    the normalized tangent); alive: [C] curve mask.
    """
    from ..ops.bezier import safe_normalize

    m = n_gaussians
    t = safe_normalize(tangent.reshape(-1, m, 3))
    cos = jnp.abs(jnp.sum(t[:, :-1] * t[:, 1:], axis=-1))
    per_pair = 1.0 - cos  # [C, M-1]
    w = jnp.broadcast_to(alive[:, None], per_pair.shape)
    return masked_mean(per_pair, w)


def connectivity_loss(
    curve_points: jnp.ndarray,
    alive: jnp.ndarray,
    dist_threshold: float = 0.05,
):
    """Mean distance between nearby endpoint pairs of DIFFERENT curves
    (train.py:133-146).  The proximity mask is stop-gradient, the distances
    are not — endpoints are pulled together."""
    start = curve_points[:, 0]
    end = curve_points[:, 3]
    pts = jnp.concatenate([start, end], axis=0)  # [2C, 3]
    C = curve_points.shape[0]
    same = jnp.eye(C, dtype=bool)
    same = jnp.tile(same, (2, 2))
    d = jnp.sqrt(
        jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1) + 1e-12
    )
    pair_alive = jnp.concatenate([alive, alive])
    ok = pair_alive[:, None] & pair_alive[None, :] & (~same)
    sel = jax.lax.stop_gradient((d < dist_threshold) & ok)
    return masked_mean(d, sel)


def width_loss(state: cs.CurveState, floor: float):
    """Penalize widths above the floor (train.py:126-131)."""
    w = cs.curve_width(state)
    over = (w >= floor) & state.alive
    return masked_mean(w - floor, over)


def opacity_log_penalty(opacity: jnp.ndarray, visible: jnp.ndarray):
    """opacity_loss_weight * mean(log(1 + o^2/0.5)) over visible
    (train.py:114-117)."""
    return masked_mean(jnp.log1p(opacity**2 / 0.5), visible)


def total_loss(
    state: cs.CurveState,
    render_out: Dict[str, jnp.ndarray],
    gauss: Dict[str, jnp.ndarray],
    gt_image: jnp.ndarray,
    opt: OptimizationConfig,
    use_mask: bool,
    conn_on: bool | None = None,
):
    """Assemble the full training objective; returns (loss, aux dict).

    use_mask gates the mask sparsity term (reference train.py:110-111,
    iteration >= densify_until_iter); conn_on gates the endpoint
    connectivity term (train.py:133, iteration > conn_from_iter) — None
    falls back to use_mask (the two schedules coincide at default config).
    """
    if conn_on is None:
        conn_on = use_mask
    image = render_out["render"]
    ll1 = edge_aware_loss(image, gt_image)
    ssim_v = ssim(image, gt_image)
    loss = opt.lambda_mse * (
        (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1.0 - ssim_v)
    )

    aux = {"edge_l1": ll1, "ssim": ssim_v}

    if use_mask and opt.lambda_mask > 0:
        mask_term = masked_mean(
            jax.nn.sigmoid(state.mask_raw),
            jnp.broadcast_to(state.alive[:, None], state.mask_raw.shape),
        )
        loss = loss + opt.lambda_mask * mask_term
        aux["mask"] = mask_term

    visible = render_out["visibility"] & gauss["alive"]
    opa_term = opacity_log_penalty(gauss["opacity"], visible)
    loss = loss + opt.opacity_loss_weight * opa_term
    aux["opacity_pen"] = opa_term

    if opt.lambda_curve_smo > 0:
        smo = curve_smoothness(gauss["tangent"], state.alive, state.n_gaussians)
        loss = loss + opt.lambda_curve_smo * smo
        aux["curve_smo"] = smo

    if opt.lambda_width > 0:
        wl = width_loss(state, opt.width_floor)
        loss = loss + opt.lambda_width * wl
        aux["width"] = wl

    if opt.lambda_points_conn > 0 and conn_on:
        conn = connectivity_loss(
            state.curve_points, state.alive, opt.conn_dist_threshold
        )
        loss = loss + opt.lambda_points_conn * conn
        aux["curve_conn"] = conn

    aux["total"] = loss
    return loss, aux
