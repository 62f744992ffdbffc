"""Jitted training step + TrainState (reference train.py:75-243 hot path).

One compiled step = render -> loss -> backward -> Adam -> densify-stat
accumulation, all on device.  Host-side topology surgery lives in
models/surgery.py and runs at coarse cadence between steps.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# Per-executable XLA overrides.  XLA_FLAGS never reaches the remote axon
# compiler (CLAUDE.md); jit's compiler_options is the only channel that
# does.  Entry points that know they run on TPU export CGT_COMPILER_OPTS
# (a JSON dict) before importing this module; CPU test processes leave it
# unset (TPU backend flags would be rejected by the CPU compiler).
COMPILER_OPTS = json.loads(os.environ.get("CGT_COMPILER_OPTS", "null"))

from ..config import OptimizationConfig, PipelineConfig
from ..models import curve_state as cs
from ..models import losses as L
from ..ops.camera import Camera
from ..ops.render import render
from . import optim


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Dict[str, jnp.ndarray]
    opt: optim.AdamState
    is_bezier: jnp.ndarray  # [C] bool
    alive: jnp.ndarray  # [C] bool
    xyz_grad_accum: jnp.ndarray  # [C*M] accumulated |NDC grad| sums
    denom: jnp.ndarray  # [C*M] visible counts
    max_radii: jnp.ndarray  # [C*M] int32
    step: jnp.ndarray  # scalar int32
    opacity_frozen: jnp.ndarray  # scalar bool (after fix_opacity)


def init_train_state(state: cs.CurveState) -> TrainState:
    params = cs.trainable(state)
    n = state.capacity * state.n_gaussians
    return TrainState(
        params=params,
        opt=optim.init_adam(params),
        is_bezier=state.is_bezier,
        alive=state.alive,
        xyz_grad_accum=jnp.zeros((n,)),
        denom=jnp.zeros((n,)),
        max_radii=jnp.zeros((n,), jnp.int32),
        step=jnp.zeros((), jnp.int32),
        opacity_frozen=jnp.zeros((), bool),
    )


def curve_state_of(ts: TrainState) -> cs.CurveState:
    return cs.CurveState(**ts.params, is_bezier=ts.is_bezier, alive=ts.alive)


@functools.partial(
    jax.jit,
    static_argnames=(
        "opt_cfg", "pipe_cfg", "use_mask", "n_gaussians", "conn_on",
        "use_exposure",
    ),
    donate_argnums=(0,),
    compiler_options=COMPILER_OPTS,
)
def train_step(
    ts: TrainState,
    cam: Camera,
    gt_image: jnp.ndarray,
    bg: jnp.ndarray,
    opt_cfg: OptimizationConfig,
    pipe_cfg: PipelineConfig,
    use_mask: bool,
    n_gaussians: int,
    conn_on: bool | None = None,
    view_idx: jnp.ndarray | None = None,
    use_exposure: bool = False,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    return _train_step_impl(
        ts, cam, gt_image, bg, opt_cfg, pipe_cfg, use_mask, n_gaussians,
        conn_on=conn_on, view_idx=view_idx, use_exposure=use_exposure,
    )


def _train_step_impl(
    ts: TrainState,
    cam: Camera,
    gt_image: jnp.ndarray,  # [H, W]
    bg: jnp.ndarray,  # scalar
    opt_cfg: OptimizationConfig,
    pipe_cfg: PipelineConfig,
    use_mask: bool,
    n_gaussians: int,
    conn_on: bool | None = None,
    view_idx: jnp.ndarray | None = None,
    use_exposure: bool = False,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    cap = ts.alive.shape[0]
    P = cap * n_gaussians
    if use_exposure and view_idx is None:
        raise ValueError("use_exposure requires the step's view_idx")
    # statically-dead groups are excluded from grad + Adam entirely (their
    # gradient is zero by construction: the renderer forces colors to ones
    # like the reference's dead SH path, and exposure only enters the loss
    # under use_exposure).  adam_update passes absent groups through —
    # bit-identical to a zero-gradient update, minus the traffic.
    dead = ("features_dc",) + (() if use_exposure else ("exposure",))
    hold = {k: ts.params[k] for k in dead}

    def loss_fn(live_params, mean2d_offset):
        params = {**live_params, **hold}
        state = cs.CurveState(
            **params, is_bezier=ts.is_bezier, alive=ts.alive
        )
        gauss = cs.gaussians(
            state, use_mask=use_mask, mask_threshold=opt_cfg.mask_threshold
        )
        out = render(
            gauss["xyz"],
            gauss["scale"],
            gauss["quat"],
            gauss["opacity"],
            cam,
            bg=bg,
            alive=gauss["alive"],
            mean2d_offset=mean2d_offset,
            antialiasing=pipe_cfg.antialiasing,
            # the training loss consumes only the color channel; skipping
            # the allmap/invdepth channels cuts per-instance kernel work
            render_geo=False,
            compute_invdepth=False,
            capacity=pipe_cfg.tile_capacity,
            big_capacity=pipe_cfg.big_capacity,
            backend=pipe_cfg.backend,
            # learned per-view exposure (reference train_test_exp:
            # train.py:95, gaussian_renderer/__init__.py:132-135); grads
            # flow to params["exposure"][view_idx] through the loss
            exposure=params["exposure"][view_idx] if use_exposure else None,
        )
        loss, aux = L.total_loss(
            state, out, gauss, gt_image, opt_cfg, use_mask, conn_on=conn_on
        )
        return loss, (aux, out["visibility"] & gauss["alive"], out["radii"],
                      out["overflow"], out["tile_peak"],
                      out["big_peak"], out["big_overflow"])

    offset0 = jnp.zeros((P, 2), jnp.float32)
    live = {k: v for k, v in ts.params.items() if k not in dead}
    (loss, (aux, visible, radii, overflow, tile_peak, big_peak,
            big_overflow)), (gparams, goffset) = (
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            live, offset0
        )
    )

    lrs = optim.group_lrs(opt_cfg, ts.step.astype(jnp.float32))
    lrs = dict(lrs)
    lrs["opacity_raw"] = jnp.where(ts.opacity_frozen, 0.0, lrs["opacity_raw"])
    new_params, new_opt = optim.adam_update(ts.params, gparams, ts.opt, lrs)

    # densification statistics: accumulated norm of NDC-space screen grads of
    # visible Gaussians (train.py:184-187, gaussian_model.py:618-620;
    # pixel->NDC conversion: backward.cu:542-544 works in NDC*0.5*W units).
    ndc = goffset * jnp.asarray(
        [0.5 * cam.width, 0.5 * cam.height], goffset.dtype
    )
    gnorm = jnp.linalg.norm(ndc, axis=-1)
    vis_f = visible.astype(gnorm.dtype)
    new_ts = TrainState(
        params=new_params,
        opt=new_opt,
        is_bezier=ts.is_bezier,
        alive=ts.alive,
        xyz_grad_accum=ts.xyz_grad_accum + gnorm * vis_f,
        denom=ts.denom + vis_f,
        max_radii=jnp.maximum(ts.max_radii, jnp.where(visible, radii, 0)),
        step=ts.step + 1,
        opacity_frozen=ts.opacity_frozen,
    )
    metrics = dict(aux)
    metrics["overflow"] = overflow
    metrics["n_visible"] = jnp.sum(visible)
    metrics["tile_peak"] = tile_peak
    metrics["big_peak"] = big_peak
    metrics["big_overflow"] = big_overflow
    return new_ts, metrics


@functools.partial(
    jax.jit,
    static_argnames=(
        "opt_cfg", "pipe_cfg", "use_mask", "n_gaussians", "cam_geom",
        "conn_on", "use_exposure",
    ),
    donate_argnums=(0,),
    compiler_options=COMPILER_OPTS,
)
def train_steps_scan(
    ts: TrainState,
    cam_arrays,  # (w2c [K,4,4], proj [K,4,4], centers [K,3])
    gts: jnp.ndarray,  # [K, H, W]
    bg: jnp.ndarray,
    opt_cfg: OptimizationConfig,
    pipe_cfg: PipelineConfig,
    use_mask: bool,
    n_gaussians: int,
    cam_geom,  # (H, W, tanfovx, tanfovy) static
    conn_on: bool | None = None,
    n_active: jnp.ndarray | None = None,
    view_indices: jnp.ndarray | None = None,  # [K] int32 (use_exposure only)
    use_exposure: bool = False,
):
    """Run K training steps in ONE dispatch via lax.scan.

    Host-dispatch latency (significant on remote/tunneled TPU runtimes)
    amortizes over the chunk; surgery/logging happen between chunks on the
    host.  `n_active` (traced scalar) marks steps >= n_active as no-ops
    (state passes through unchanged): the driver pads every chunk to a
    fixed K so ONE compilation serves all event-boundary chunk lengths —
    scan-body compiles are minutes over the TPU tunnel, so trading a little
    padded compute for shape stability is a large net win.
    Returns (ts, stacked per-step metrics)."""
    h, w, tfx, tfy = cam_geom
    K = gts.shape[0]
    if use_exposure and view_indices is None:
        raise ValueError("use_exposure requires per-step view_indices")

    def body(ts, xs):
        if use_exposure:
            i, w2c, proj, ctr, gt, vix = xs
        else:
            i, w2c, proj, ctr, gt = xs
            vix = None
        cam = Camera(
            world_to_cam=w2c,
            full_proj=proj,
            cam_center=ctr,
            height=h,
            width=w,
            tanfovx=tfx,
            tanfovy=tfy,
        )
        ts2, metrics = _train_step_impl(
            ts, cam, gt, bg, opt_cfg, pipe_cfg, use_mask, n_gaussians,
            conn_on=conn_on, view_idx=vix, use_exposure=use_exposure,
        )
        if n_active is not None:
            act = i < n_active
            ts2 = jax.tree.map(
                lambda a, b: jnp.where(act, a, b), ts2, ts
            )
        return ts2, metrics

    idx = jnp.arange(K, dtype=jnp.int32)
    xs = (idx, *cam_arrays, gts)
    if use_exposure:
        xs = xs + (view_indices,)
    ts, metrics = jax.lax.scan(body, ts, xs)
    return ts, metrics


@functools.partial(
    jax.jit,
    static_argnames=(
        "pipe_cfg", "use_mask", "n_gaussians", "mask_threshold",
        "use_exposure",
    ),
    compiler_options=COMPILER_OPTS,
)
def eval_render(
    ts: TrainState,
    cam: Camera,
    pipe_cfg: PipelineConfig,
    bg: jnp.ndarray,
    use_mask: bool = False,
    n_gaussians: int = 12,
    mask_threshold: float = 0.01,
    view_idx: jnp.ndarray | None = None,
    use_exposure: bool = False,
):
    state = curve_state_of(ts)
    gauss = cs.gaussians(state, use_mask=use_mask, mask_threshold=mask_threshold)
    if use_exposure and view_idx is None:
        raise ValueError("use_exposure requires the view's train index")
    return render(
        gauss["xyz"],
        gauss["scale"],
        gauss["quat"],
        gauss["opacity"],
        cam,
        bg=bg,
        alive=gauss["alive"],
        antialiasing=pipe_cfg.antialiasing,
        render_geo=pipe_cfg.render_geo,
        capacity=pipe_cfg.tile_capacity,
        big_capacity=pipe_cfg.big_capacity,
        backend=pipe_cfg.backend,
        # reference applies the learned exposure at eval when train_test_exp
        # (gaussian_renderer/__init__.py:132-135 runs for every render call)
        exposure=ts.params["exposure"][view_idx] if use_exposure else None,
    )
