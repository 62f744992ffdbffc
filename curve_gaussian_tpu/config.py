"""Configuration dataclasses (defaults mirror reference arguments/__init__.py).

The reference uses reflection over class attributes to build argparse flags
(arguments/__init__.py:19-45) and selects detector/dataset presets by
subclassing (:127-154).  We keep plain dataclasses + preset constructors and
an argparse bridge (add_args/from_args) for the CLI.
"""
from __future__ import annotations

import dataclasses
from argparse import ArgumentParser
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """reference ModelParams (arguments/__init__.py:47-66)."""

    sh_degree: int = 0
    n_gaussians: int = 12  # Gaussians per curve (M)
    source_path: str = ""
    detector: str = "DexiNed"  # or 'PidiNet'
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    train_test_exp: bool = False
    eval: bool = False
    # edge-map polarity handling ("auto" | "on" | "off"): real detector dumps
    # can be dark-edges-on-white (the reference inverts DexiNed maps itself,
    # edge_extraction/extract_para_edge.py:49-53); see
    # data/dataset.py:apply_edge_polarity
    invert_edges: str = "auto"


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """reference PipelineParams (arguments/__init__.py:68-75) + TPU knobs."""

    antialiasing: bool = False
    # gates the allmap/dir/alpha channels of EVAL renders (the training
    # path always skips them — the loss reads only the color channel, so
    # skipping is an exact optimization, not a semantic change)
    render_geo: bool = True
    # compat: the reference's pipe.debug enables CHECK_CUDA device syncs;
    # the TPU equivalent is train.py --detect-anomaly (jax_debug_nans)
    debug: bool = False
    # TPU-specific
    # max Gaussians per 32x32 pixel tile (multiple of 8 for the gradient
    # slab stores).  896 covers the worst-case seed grid (max tile count
    # 829 at 512^2 / 49k splats) and trims the [T,K] gradient-table
    # scatter/gathers ~12% vs 1024 (60.2 vs 57.5 it/s measured).  The
    # optional indirect blend flavor needs a multiple of 1024 (Mosaic 1-D
    # SMEM tiling) — render() falls back to the table kernels otherwise.
    tile_capacity: int = 896
    # big-rect tier capacity (ops/binning.py): Gaussians whose clipped
    # rect exceeds tier1_rect=4 tiles.  Curve splats are thin by
    # construction (curves sample to narrow Gaussian chains), so >4-tile
    # rects are rare — the worst-case bench scene has ZERO (round 4).
    # 1024 gives >2x headroom over any observed scene; the driver grows
    # it on big_overflow exactly like tile_capacity (the reference
    # re-allocates on demand the same way: rasterizer_impl.cu
    # resizeFunctional).  A 4096 tier cost ~0.3 ms/step of dead gathers
    # at the bench point.
    # 256 = the measured round-4 adaptive operating point (refscale runs
    # shrink 1024->256; mv2cyl big_peak 18); the driver grows it on
    # big_overflow like tile_capacity, so under-provisioning costs one
    # reported chunk + a warmed recompile, while the smaller static tier
    # is ~0.15 ms/step cheaper at the bench point (probe_r4_ab)
    big_capacity: int = 256
    max_big_capacity: int = 8192
    backend: str = "pallas"  # 'pallas' | 'reference'
    # what the training driver does when a chunk reports dropped tile
    # candidates (ops/binning.py overflow): 'grow' doubles tile_capacity at
    # the next chunk boundary (recompile), 'raise' fails fast, 'warn' only
    # logs.  The overflowed chunk itself ran with degraded gradients either
    # way — growth keeps subsequent chunks exact.
    overflow_policy: str = "grow"  # 'grow' | 'raise' | 'warn'
    max_tile_capacity: int = 8192
    # dropped candidates below tolerance * (visible Gaussians in the chunk)
    # are logged but do NOT trigger grow/raise: per-tile truncation keeps
    # the K nearest (front-most) instances, so the dropped tail is the most
    # occluded sliver of the scene — doubling capacity (a recompile and 2x
    # kernel VMEM) over a handful of candidates is a bad trade.  Set to 0
    # for exact-or-grow behavior.
    overflow_tolerance: float = 1e-4


@dataclasses.dataclass(frozen=True)
class OptimizationConfig:
    """reference OptimizationParams (arguments/__init__.py:77-124)."""

    iterations: int = 10_000
    # compat no-op, exactly as in the reference: get_expon_lr_func's delay
    # only acts over lr_delay_steps, which training_setup never passes
    # (defaults 0), so the mult never applies (general_utils.py:99-132,
    # gaussian_curve_model.py:200-232)
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    lr_curve_points_init: float = 5e-4
    lr_curve_points_final: float = 5e-6
    feature_lr: float = 2.5e-3
    opacity_lr: float = 0.025
    scaling_lr: float = 5e-3  # width LR
    mask_lr: float = 0.01
    exposure_lr_init: float = 0.01
    exposure_lr_final: float = 1e-3
    exposure_lr_delay_steps: int = 0
    exposure_lr_delay_mult: float = 0.0
    lambda_dssim: float = 0.1
    opacity_cull: float = 0.01
    opacity_cull_second: float = 0.05
    opacity_loss_weight: float = 0.01
    lambda_mse: float = 10.0
    lambda_curve_smo: float = 0.1
    lambda_points_conn: float = 0.1
    lambda_width: float = 0.01
    lambda_mask: float = 5e-4
    mask_threshold: float = 0.01
    merge_endpoints_flag: bool = True
    visible_checking: bool = False
    densification_interval: int = 2000
    densify_from_iter: int = 500
    densify_until_iter: int = 7000
    conn_from_iter: int = 7000
    densify_grad_threshold: float = 2000.0  # on ACCUMULATED NDC-grad sums
    random_background: bool = False
    width_floor: float = 5e-3  # width loss threshold (train.py:127)
    conn_dist_threshold: float = 0.05  # train.py:140
    # curve fitting / surgery thresholds
    threshold_line: float = 0.0015
    threshold_max_line: float = 0.005
    threshold_angle: float = 20.0
    threshold_angle_skip: float = 30.0
    distance_threshold: float = 0.02
    similarity_threshold: float = 0.97
    # schedule cadences (train.py:202-211): prune/trim fires at the interval
    # half-phase (reference: iter % 1000 == 500, > densify_until), split at
    # the full phase past split_from_iter (reference: % 1000 == 0, > 3000),
    # merge at the full phase past densify_until
    prune_trim_interval: int = 1000
    split_interval: int = 1000
    split_from_iter: int = 3000  # the reference's train.py:206 literal
    merge_interval: int = 1000


def pidinet_preset(opt: Optional[OptimizationConfig] = None) -> OptimizationConfig:
    """arguments/__init__.py:127-135."""
    o = opt or OptimizationConfig()
    return dataclasses.replace(
        o,
        lambda_mse=2.0,
        lambda_width=0.0,
        threshold_line=0.002,
        threshold_max_line=0.006,
        distance_threshold=0.03,
        similarity_threshold=0.95,
    )


def replica_preset(opt: Optional[OptimizationConfig] = None) -> OptimizationConfig:
    """arguments/__init__.py:138-146."""
    o = opt or OptimizationConfig()
    return dataclasses.replace(
        o,
        opacity_cull=0.05,
        lambda_mse=1.0,
        lambda_width=0.0,
        threshold_line=2e-4,
        threshold_max_line=1e-3,
        similarity_threshold=0.95,
    )


def mv2cyl_preset(opt: Optional[OptimizationConfig] = None) -> OptimizationConfig:
    """arguments/__init__.py:150-153."""
    o = opt or OptimizationConfig()
    return dataclasses.replace(o, lambda_points_conn=0.02)


PRESETS = {
    "default": lambda o=None: o or OptimizationConfig(),
    "pidinet": pidinet_preset,
    "replica": replica_preset,
    "mv2cyl": mv2cyl_preset,
}


def add_dataclass_args(parser: ArgumentParser, dc_type, prefix: str = "") -> None:
    for f in dataclasses.fields(dc_type):
        name = "--" + (prefix + f.name).replace("_", "-")
        if f.type in ("bool", bool):
            parser.add_argument(name, action="store_true", default=None)
        else:
            t = {"int": int, "float": float, "str": str}.get(str(f.type), None)
            if t is None:
                t = f.type if callable(f.type) else str
            parser.add_argument(name, type=t, default=None)


def dataclass_from_args(args, dc_type, base=None, prefix: str = ""):
    base = base or dc_type()
    updates = {}
    for f in dataclasses.fields(dc_type):
        v = getattr(args, (prefix + f.name), None)
        if v is not None:
            updates[f.name] = v
    return dataclasses.replace(base, **updates)
