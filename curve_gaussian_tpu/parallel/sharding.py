"""Multi-chip scaling via jax.sharding Mesh + shard_map.

The reference is strictly single-GPU (SURVEY §2.3: no torch.distributed /
NCCL anywhere); this module is the green-field TPU scaling story:

  * VIEW-PARALLEL TRAINING (the default scaling axis): a batch of B views
    per step, sharded across the mesh's 'data' axis.  Curve parameters are
    replicated; every device renders + differentiates its own views; curve
    gradients are psum-averaged over ICI and the (replicated) Adam update
    is computed identically everywhere.  Each view's loss is entirely local
    — no halo exchange — so scaling efficiency is communication-bound only
    by one gradient all-reduce per step (a few MB), overlapped by XLA with
    the backward pass.
  * TILE-PARALLEL RENDERING: a single large view's tile rows sharded across
    chips for inference; each device bins and blends only its rows (the
    tile tables are per-row-group by construction, see ops/binning.py).

Gradient semantics: a B-view step with mean-reduction equals B reference
iterations' averaged gradient — batch scaling in the standard DP sense.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax import shard_map as _shard_map


def shard_map(f=None, *, mesh, in_specs, out_specs, check_rep=False):
    # thin adapter over jax.shard_map (check_rep was renamed to check_vma)
    return _shard_map(
        f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=check_rep,
    )
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import OptimizationConfig, PipelineConfig
from ..engine import optim
from ..engine.train import COMPILER_OPTS, TrainState
from ..models import curve_state as cs
from ..models import losses as L
from ..ops.camera import Camera
from ..ops.render import render


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def batch_cameras(cams: Sequence[Camera]) -> Camera:
    from ..ops.camera import stack_cameras

    return stack_cameras(list(cams))


def _one_view_grads(
    params,
    topo,
    cam_arrays: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    gt: jnp.ndarray,
    bg: jnp.ndarray,
    opt_cfg: OptimizationConfig,
    pipe_cfg: PipelineConfig,
    use_mask: bool,
    cam_geom,
    conn_on: bool | None = None,
    view_idx: jnp.ndarray | None = None,
    use_exposure: bool = False,
):
    is_bezier, alive = topo
    h, w, tfx, tfy = cam_geom
    w2c, proj, center = cam_arrays
    cam = Camera(
        world_to_cam=w2c,
        full_proj=proj,
        cam_center=center,
        height=h,
        width=w,
        tanfovx=tfx,
        tanfovy=tfy,
    )
    P_g = alive.shape[0] * params["mask_raw"].shape[1]
    # statically-dead groups excluded from grad (see train._train_step_impl)
    dead = ("features_dc",) + (() if use_exposure else ("exposure",))
    hold = {k: params[k] for k in dead}

    def loss_fn(live_params, offset):
        params = {**live_params, **hold}
        state = cs.CurveState(**params, is_bezier=is_bezier, alive=alive)
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
            mean2d_offset=offset,
            antialiasing=pipe_cfg.antialiasing,
            render_geo=False,
            compute_invdepth=False,
            capacity=pipe_cfg.tile_capacity,
            big_capacity=pipe_cfg.big_capacity,
            backend=pipe_cfg.backend,
            exposure=params["exposure"][view_idx] if use_exposure else None,
        )
        loss, aux = L.total_loss(
            state, out, gauss, gt, opt_cfg, use_mask, conn_on=conn_on
        )
        return loss, (
            aux["total"],
            out["visibility"] & gauss["alive"],
            out["radii"],
            out["overflow"],
            out["tile_peak"],
            out["big_overflow"],
        )

    offset0 = jnp.zeros((P_g, 2), jnp.float32)
    live = {k: v for k, v in params.items() if k not in dead}
    (loss, (total, visible, radii, overflow, tile_peak, big_ov)), (gp, goff) = (
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            live, offset0
        )
    )
    return gp, goff, total, visible, radii, overflow, tile_peak, big_ov


def _local_batch_step(
    ts: TrainState,
    xs,  # (w2c [Bl,4,4], proj [Bl,4,4], ctr [Bl,3], gt [Bl,H,W]) local shard
    bg: jnp.ndarray,
    opt_cfg: OptimizationConfig,
    pipe_cfg: PipelineConfig,
    use_mask: bool,
    conn_on: bool | None,
    cam_geom,
    n_dev: int = 0,
    view_idx: jnp.ndarray | None = None,  # [Bl] train-view ids
    use_exposure: bool = False,
):
    """One optimizer step from a LOCAL shard of a B-view batch.

    Must run inside a shard_map context with mesh axis 'data': local
    per-view gradients are scanned and summed, psum-averaged over ICI, and
    the (replicated) Adam + densify-stat update is computed identically on
    every device.  A B-view mean-reduced step equals B reference iterations'
    averaged gradient (standard DP batch scaling)."""
    w2c, proj, ctr, gt = xs
    nb = gt.shape[0]
    P_g = ts.alive.shape[0] * ts.params["mask_raw"].shape[1]
    if use_exposure and view_idx is None:
        raise ValueError("use_exposure requires per-view train indices")

    def body(carry, idx):
        (gp_acc, goff_acc, tot_acc, ov_acc, vis_acc, rad_acc, pk_acc,
         bov_acc) = carry
        gp, goff, total, visible, radii, ov, pk, bov = _one_view_grads(
            ts.params,
            (ts.is_bezier, ts.alive),
            (w2c[idx], proj[idx], ctr[idx]),
            gt[idx],
            bg,
            opt_cfg,
            pipe_cfg,
            use_mask,
            cam_geom,
            conn_on=conn_on,
            view_idx=view_idx[idx] if use_exposure else None,
            use_exposure=use_exposure,
        )
        return (
            jax.tree.map(jnp.add, gp_acc, gp),
            goff_acc + goff,
            tot_acc + total,
            ov_acc + ov,
            vis_acc | visible,
            jnp.maximum(rad_acc, radii),
            jnp.maximum(pk_acc, pk),
            bov_acc + bov,
        ), None

    dead = ("features_dc",) + (() if use_exposure else ("exposure",))
    init = (
        jax.tree.map(
            jnp.zeros_like,
            {k: v for k, v in ts.params.items() if k not in dead},
        ),
        jnp.zeros((P_g, 2), jnp.float32),
        jnp.zeros(()),
        jnp.zeros((), jnp.int32),
        jnp.zeros((P_g,), bool),
        jnp.zeros((P_g,), jnp.int32),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    (gp, goff, tot, ov, vis, rad, peak, big_ov), _ = jax.lax.scan(
        body, init, jnp.arange(nb)
    )
    if n_dev == 1:
        # 1-wide mesh (single-chip batched views): collectives are
        # identities, and on the tunneled runtime each one costs a host
        # round-trip — skip them statically
        nglobal = nb
        gp = jax.tree.map(lambda g: g / nglobal, gp)
        goff = goff / nglobal
        tot = tot / nglobal
    else:
        nglobal = nb * jax.lax.psum(1, "data")
        gp = jax.tree.map(lambda g: jax.lax.psum(g, "data") / nglobal, gp)
        goff = jax.lax.psum(goff, "data") / nglobal
        tot = jax.lax.psum(tot, "data") / nglobal
        ov = jax.lax.psum(ov, "data")
        vis = jax.lax.psum(vis.astype(jnp.int32), "data") > 0
        rad = jax.lax.pmax(rad, "data")
        peak = jax.lax.pmax(peak, "data")
        big_ov = jax.lax.psum(big_ov, "data")

    lrs = optim.group_lrs(opt_cfg, ts.step.astype(jnp.float32))
    lrs = dict(lrs)
    lrs["opacity_raw"] = jnp.where(ts.opacity_frozen, 0.0, lrs["opacity_raw"])
    new_params, new_opt = optim.adam_update(ts.params, gp, ts.opt, lrs)

    ndc = goff * jnp.asarray(
        [0.5 * cam_geom[1], 0.5 * cam_geom[0]], goff.dtype
    )
    gnorm = jnp.linalg.norm(ndc, axis=-1)
    vis_f = vis.astype(gnorm.dtype)
    new_ts = dataclasses.replace(
        ts,
        params=new_params,
        opt=new_opt,
        xyz_grad_accum=ts.xyz_grad_accum + gnorm * vis_f,
        denom=ts.denom + vis_f,
        max_radii=jnp.maximum(ts.max_radii, jnp.where(vis, rad, 0)),
        step=ts.step + 1,
    )
    metrics = {
        "total": tot,
        "overflow": ov,
        "n_visible": jnp.sum(vis),
        "tile_peak": peak,
        "big_overflow": big_ov,
    }
    return new_ts, metrics


@functools.partial(
    jax.jit,
    static_argnames=(
        "opt_cfg", "pipe_cfg", "use_mask", "mesh_shape", "cam_geom",
        "conn_on", "use_exposure",
    ),
    donate_argnums=(0,),
    compiler_options=COMPILER_OPTS,
)
def parallel_train_step(
    ts: TrainState,
    cam_arrays,  # (w2c [B,4,4], proj [B,4,4], centers [B,3]) sharded on B
    gts: jnp.ndarray,  # [B, H, W] sharded on B
    bg: jnp.ndarray,
    opt_cfg: OptimizationConfig,
    pipe_cfg: PipelineConfig,
    use_mask: bool,
    mesh_shape: Tuple[Tuple[str, int], ...],
    cam_geom: Tuple[int, int, float, float],
    conn_on: bool | None = None,
    view_indices: jnp.ndarray | None = None,  # [B] int32 (use_exposure)
    use_exposure: bool = False,
):
    """One data-parallel step over a B-view batch.

    mesh_shape: (("data", n),) — reconstructed here so the jitted function
    stays hashable.  Params replicated, views sharded, grads psum-averaged.
    """
    mesh = make_mesh(dict(mesh_shape)["data"])
    if use_exposure and view_indices is None:
        raise ValueError("use_exposure requires per-view train indices")
    # vi rides as a None pytree when exposure is off so the lowered module
    # (and its persistent-cache key) is unchanged from the pre-exposure code
    vi = view_indices if use_exposure else None

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), (P("data"), P("data"), P("data")), P("data"), P(),
            P("data") if use_exposure else P(),
        ),
        out_specs=(P(), P()),
        check_rep=False,
    )
    def run(ts, cam_arrays, gts, bg, vi):
        return _local_batch_step(
            ts, (*cam_arrays, gts), bg, opt_cfg, pipe_cfg, use_mask, conn_on,
            cam_geom, n_dev=dict(mesh_shape)["data"],
            view_idx=vi, use_exposure=use_exposure,
        )

    return run(ts, cam_arrays, gts, bg, vi)


@functools.partial(
    jax.jit,
    static_argnames=(
        "opt_cfg", "pipe_cfg", "use_mask", "mesh_shape", "cam_geom",
        "conn_on", "use_exposure",
    ),
    donate_argnums=(0,),
    compiler_options=COMPILER_OPTS,
)
def parallel_train_steps_scan(
    ts: TrainState,
    cam_arrays,  # (w2c [K,B,4,4], proj [K,B,4,4], centers [K,B,3])
    gts: jnp.ndarray,  # [K, B, H, W] sharded on B
    bg: jnp.ndarray,
    opt_cfg: OptimizationConfig,
    pipe_cfg: PipelineConfig,
    use_mask: bool,
    mesh_shape: Tuple[Tuple[str, int], ...],
    cam_geom: Tuple[int, int, float, float],
    conn_on: bool | None = None,
    n_active: jnp.ndarray | None = None,
    view_indices: jnp.ndarray | None = None,  # [K, B] int32 (use_exposure)
    use_exposure: bool = False,
):
    """K data-parallel steps (B views each) in ONE dispatch.

    The multi-chip counterpart of engine.train.train_steps_scan: the
    lax.scan lives INSIDE the shard_map, so per-step psum + replicated Adam
    run back-to-back on device and host-dispatch latency amortizes over the
    chunk.  `n_active` marks trailing steps as no-ops so the driver can pad
    chunks to one compiled shape (see train_steps_scan).
    Returns (ts, stacked per-step metrics [K])."""
    mesh = make_mesh(dict(mesh_shape)["data"])
    K = gts.shape[0]
    if use_exposure and view_indices is None:
        raise ValueError("use_exposure requires per-step view_indices")
    vi = view_indices if use_exposure else None

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(),
            (P(None, "data"), P(None, "data"), P(None, "data")),
            P(None, "data"),
            P(),
            P(),
            P(None, "data") if use_exposure else P(),
        ),
        out_specs=(P(), P()),
        check_rep=False,
    )
    def run(ts, cam_arrays, gts, bg, n_act, vi):
        def body(ts, xs):
            if use_exposure:
                i, w2c, proj, ctr, gt, vix = xs
            else:
                i, w2c, proj, ctr, gt = xs
                vix = None
            ts2, metrics = _local_batch_step(
                ts, (w2c, proj, ctr, gt), bg, opt_cfg, pipe_cfg, use_mask,
                conn_on, cam_geom, n_dev=dict(mesh_shape)["data"],
                view_idx=vix, use_exposure=use_exposure,
            )
            if n_act is not None:
                act = i < n_act
                ts2 = jax.tree.map(
                    lambda a, b: jnp.where(act, a, b), ts2, ts
                )
            return ts2, metrics

        idx = jnp.arange(K, dtype=jnp.int32)
        xs = (idx, *cam_arrays, gts)
        if use_exposure:
            xs = xs + (vi,)
        return jax.lax.scan(body, ts, xs)

    return run(ts, cam_arrays, gts, bg, n_active, vi)


def camera_batch_arrays(cams: Sequence[Camera], mesh: Mesh | None = None):
    """Stack per-view camera arrays [B,...], optionally sharded over 'data'."""
    w2c = jnp.stack([c.world_to_cam for c in cams])
    proj = jnp.stack([c.full_proj for c in cams])
    ctr = jnp.stack([c.cam_center for c in cams])
    if mesh is not None:
        sh = NamedSharding(mesh, P("data"))
        w2c, proj, ctr = (
            jax.device_put(w2c, sh),
            jax.device_put(proj, sh),
            jax.device_put(ctr, sh),
        )
    return (w2c, proj, ctr)


@functools.partial(
    jax.jit,
    static_argnames=("pipe_cfg", "mesh_shape", "cam_geom", "n_gaussians"),
    compiler_options=COMPILER_OPTS,
)
def tile_parallel_render(
    ts: TrainState,
    cam_arrays,  # (w2c [4,4], proj [4,4], center [3])
    cam_geom: Tuple[int, int, float, float],
    pipe_cfg: PipelineConfig,
    bg: jnp.ndarray,
    mesh_shape: Tuple[Tuple[str, int], ...],
    n_gaussians: int = 12,
):
    """Single-view render with the image's tile ROWS sharded across chips.

    Gaussians are replicated; each device bins/blends only its row block and
    the shards concatenate into the full image (pure spatial decomposition —
    rendering is embarrassingly parallel across tiles).  User entry points:
    ``scripts/render_curves.py --n-devices N`` (frame rendering) and the
    bench.py tile-parallel line; reference analogue: the tile decomposition
    of rasterizer_impl.cu:196-347."""
    H, W = cam_geom[0], cam_geom[1]
    cam_static = Camera(
        world_to_cam=cam_arrays[0],
        full_proj=cam_arrays[1],
        cam_center=cam_arrays[2],
        height=H,
        width=W,
        tanfovx=cam_geom[2],
        tanfovy=cam_geom[3],
    )
    state = cs.CurveState(**ts.params, is_bezier=ts.is_bezier, alive=ts.alive)
    gauss = cs.gaussians(state)
    return tile_parallel_render_gaussians(
        gauss, cam_static, pipe_cfg, bg, mesh_shape
    )


def tile_parallel_render_gaussians(
    gauss: dict,
    cam_static: Camera,
    pipe_cfg: PipelineConfig,
    bg,
    mesh_shape: Tuple[Tuple[str, int], ...],
):
    """tile_parallel_render at the Gaussian level (xyz/scale/quat/opacity
    [+alive] dict) — the shared core for TrainState renders and raw
    splat-set renders (render_curves.py)."""
    from ..ops.binning import TILE_H, bin_gaussians, tile_grid
    from ..ops.projection import preprocess
    from ..ops.rasterize_pallas import build_payload, tile_blend, untile_image
    from ..ops.render import main_axis_allmap

    mesh = make_mesh(dict(mesh_shape)["data"])
    n_dev = dict(mesh_shape)["data"]
    H, W = cam_static.height, cam_static.width
    rows_per_dev = (-(-H // (TILE_H * n_dev))) * TILE_H
    # preprocess once with the FULL camera (projection depends on full H/W),
    # replicated; each device then bins/blends only its row block by shifting
    # mean2d into local row coordinates.
    pre = preprocess(
        gauss["xyz"],
        gauss["scale"],
        gauss["quat"],
        gauss["opacity"],
        cam_static,
        alive=gauss.get("alive"),
    )
    allmap = main_axis_allmap(gauss["xyz"], gauss["quat"], cam_static)
    color = jnp.ones_like(gauss["opacity"])
    bg_arr = jnp.asarray(bg, jnp.float32).reshape(1)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("data")),
        out_specs=P("data"),
        check_rep=False,
    )
    def render_rows(pre_in, color, allmap, row_offsets):
        r0 = row_offsets[0].astype(pre_in.mean2d.dtype)
        local_pre = pre_in._replace(
            mean2d=pre_in.mean2d - jnp.asarray([0.0, 1.0]) * r0
        )
        binning = bin_gaussians(
            local_pre, rows_per_dev, W, capacity=pipe_cfg.tile_capacity
        )
        payload = build_payload(
            local_pre, color, allmap, binning, geo=True, invd=True, ones=True
        )
        nty, ntx = tile_grid(rows_per_dev, W)
        img, _, _, _ = tile_blend(payload, binning.counts, nty, ntx, True, True, True, bg_arr)
        img = untile_image(img, nty, ntx)
        return img[None, :rows_per_dev, :W]

    row_offsets = jnp.arange(n_dev, dtype=jnp.int32) * rows_per_dev
    img = render_rows(pre, color, allmap, row_offsets)
    return img.reshape(n_dev * rows_per_dev, W)[:H]
