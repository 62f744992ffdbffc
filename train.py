#!/usr/bin/env python
"""Training CLI (reference train.py equivalent).

Examples:
  # synthetic self-contained scene (no dataset needed):
  python train.py --synthetic --iterations 600 --image-size 128 --cpu

  # EMAP/ABC-style dataset directory:
  python train.py -s /data/ABC/00000168 -m out/00000168 -r 2
"""
from __future__ import annotations

import argparse
import dataclasses
import os

from curve_gaussian_tpu.config import PipelineConfig as _PipeCfg


def main():
    p = argparse.ArgumentParser(description="curve_gaussian_tpu trainer")
    p.add_argument("--source-path", "-s", default="")
    p.add_argument("--model-path", "-m", default="")
    p.add_argument("--resolution", "-r", type=int, default=-1)
    p.add_argument("--detector", default="DexiNed")
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--white-background", "-w", action="store_true")
    p.add_argument("--invert-edges", default="auto",
                   choices=["auto", "on", "off"],
                   help="edge-map polarity: invert dark-on-white detector "
                        "dumps (auto = scene mean intensity > 0.6)")
    p.add_argument("--train-test-exp", action="store_true",
                   help="learn a per-view affine exposure applied to the "
                        "render during training (reference train_test_exp)")
    p.add_argument("--test-iterations", nargs="+", type=int, default=[3000, 10000])
    p.add_argument("--save-iterations", nargs="+", type=int, default=[3000, 10000])
    p.add_argument("--checkpoint-iterations", nargs="+", type=int, default=[])
    p.add_argument("--start-checkpoint", default=None)
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--preset", default=None,
                   choices=[None, "default", "pidinet", "replica", "mv2cyl"])
    p.add_argument("--backend", default="pallas", choices=["pallas", "reference"])
    p.add_argument("--tile-capacity", type=int,
                   default=_PipeCfg.tile_capacity)
    p.add_argument("--n-gaussians", type=int, default=12)
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of one training chunk")
    p.add_argument("--scan-chunk", type=int, default=100,
                   help="training steps fused per dispatch (one compile)")
    p.add_argument("--views-per-step", type=int, default=1,
                   help="views per optimizer step, data-parallel over chips")
    p.add_argument("--n-devices", type=int, default=None,
                   help="cap on devices for the data-parallel mesh")
    # synthetic-scene mode
    p.add_argument("--synthetic", action="store_true",
                   help="train on a generated synthetic curve scene")
    p.add_argument("--synthetic-seed", type=int, default=0)
    p.add_argument("--synthetic-curves", type=int, default=8)
    p.add_argument("--synthetic-lines", type=int, default=3)
    p.add_argument("--synthetic-views", type=int, default=24)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--synthetic-noise", type=float, default=0.0)
    p.add_argument("--grid-init", type=int, default=15,
                   help="seed grid resolution per axis (reference: 15)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    # every OptimizationConfig hyperparameter as --opt-<name> (the
    # reference's reflection-based ParamGroup flags, arguments/__init__.py)
    from curve_gaussian_tpu.config import OptimizationConfig, add_dataclass_args

    add_dataclass_args(p, OptimizationConfig, prefix="opt_")
    p.add_argument("--detect-anomaly", action="store_true",
                   help="enable jax_debug_nans (reference --detect_anomaly)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


    from curve_gaussian_tpu.config import (
        ModelConfig,
        PipelineConfig,
        PRESETS,
    )
    from curve_gaussian_tpu.engine.loop import train_scene

    preset = args.preset
    if preset is None:
        sp = args.source_path
        preset = "replica" if "Replica" in sp else (
            "pidinet" if "ABC" in sp and args.detector == "PidiNet" else "default"
        )
    opt_cfg = PRESETS[preset]()
    from curve_gaussian_tpu.config import dataclass_from_args

    opt_cfg = dataclass_from_args(args, type(opt_cfg), base=opt_cfg, prefix="opt_")
    if args.iterations is not None:
        # compress the whole surgery schedule proportionally when the user
        # shortens the run (useful for smoke tests & quick fits)
        scale = args.iterations / opt_cfg.iterations
        opt_cfg = dataclasses.replace(
            opt_cfg,
            iterations=args.iterations,
            densify_from_iter=max(1, int(opt_cfg.densify_from_iter * scale)),
            densify_until_iter=max(2, int(opt_cfg.densify_until_iter * scale)),
            conn_from_iter=max(2, int(opt_cfg.conn_from_iter * scale)),
            densification_interval=max(
                1, int(opt_cfg.densification_interval * scale)
            ),
            prune_trim_interval=max(
                2, int(opt_cfg.prune_trim_interval * scale)
            ),
            split_interval=max(1, int(opt_cfg.split_interval * scale)),
            split_from_iter=max(1, int(opt_cfg.split_from_iter * scale)),
            merge_interval=max(1, int(opt_cfg.merge_interval * scale)),
            position_lr_max_steps=max(1, int(opt_cfg.position_lr_max_steps * scale)),
        )
    pipe_cfg = PipelineConfig(
        backend=args.backend, tile_capacity=args.tile_capacity
    )
    model_cfg = ModelConfig(
        source_path=args.source_path,
        model_path=args.model_path,
        detector=args.detector,
        resolution=args.resolution,
        white_background=args.white_background,
        eval=args.eval,
        n_gaussians=args.n_gaussians,
        train_test_exp=args.train_test_exp,
        invert_edges=args.invert_edges,
    )

    if args.synthetic:
        from curve_gaussian_tpu.data import synthetic

        print("generating synthetic scene...", flush=True)
        scene = synthetic.make_scene(
            seed=args.synthetic_seed,
            n_curves=args.synthetic_curves,
            n_lines=args.synthetic_lines,
            n_views=args.synthetic_views,
            height=args.image_size,
            width=args.image_size,
            backend=args.backend,
            noise=args.synthetic_noise,
        )
        cameras, edge_maps = scene.cameras, scene.edge_maps
        seed_points = synthetic.grid_seed_points(args.grid_init)
        model_path = args.model_path or f"output_synth/seed{args.synthetic_seed}"
        test_cams, test_maps = cameras[:2], edge_maps[:2]
        gt_scene = scene
    else:
        from curve_gaussian_tpu.data.dataset import load_scene

        scene = load_scene(model_cfg)
        cameras, edge_maps = scene.train_cameras, scene.train_edge_maps
        test_cams, test_maps = scene.test_cameras, scene.test_edge_maps
        seed_points = scene.seed_points
        model_path = args.model_path or "output/run"
        gt_scene = None

    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg_args"), "w") as f:
        f.write(repr(vars(args)))

    save_iters = sorted(set(args.save_iterations + [opt_cfg.iterations]))
    result = train_scene(
        cameras,
        edge_maps,
        seed_points,
        model_cfg,
        opt_cfg,
        pipe_cfg,
        model_path,
        test_cameras=test_cams,
        test_edge_maps=test_maps,
        test_iterations=args.test_iterations,
        save_iterations=save_iters,
        checkpoint_iterations=args.checkpoint_iterations,
        start_checkpoint=args.start_checkpoint,
        quiet=args.quiet,
        seed=args.seed,
        views_per_step=args.views_per_step,
        n_devices=args.n_devices,
        scan_chunk=args.scan_chunk,
        profile_dir=args.profile_dir,
    )

    # GT eval fires for ANY scene with ground-truth edges: synthetic scenes
    # carry them in memory; dataset scenes (all fabricated refscale-style
    # scenes, scripts/make_ref_scale_scene.py) ship a gt_edges.json in the
    # extraction format.  The reference only evals via a separate harness
    # (edge_extraction/eval_main.py); folding it into train.py removes the
    # manual step that left round 4's mv2cyl run unrecorded.
    import json

    gt_dict = None
    if gt_scene is not None:
        gt_dict = {
            "curves_ctl_pts": gt_scene.curves[gt_scene.is_bezier]
            .reshape(-1, 12)
            .tolist(),
            "lines_end_pts": gt_scene.curves[~gt_scene.is_bezier][:, [0, 3], :]
            .reshape(-1, 6)
            .tolist(),
        }
    else:
        gt_path = os.path.join(args.source_path or ".", "gt_edges.json")
        if args.source_path and os.path.exists(gt_path):
            with open(gt_path) as f:
                gt_dict = json.load(f)
    if gt_dict is not None:
        from curve_gaussian_tpu.eval import metrics as M
        from curve_gaussian_tpu.eval.extract import sample_edge_dict

        pred_pts, pred_dirs = sample_edge_dict(
            result.edge_dict, with_directions=True
        )
        gt_pts, gt_dirs = sample_edge_dict(gt_dict, with_directions=True)
        res = M.evaluate_edges(pred_pts, gt_pts, pred_dirs, gt_dirs)
        print("eval vs GT curves:")
        for k, v in res.items():
            print(f"  {k}: {v:.4f}")
        with open(os.path.join(model_path, "eval.json"), "w") as f:
            json.dump(res, f, indent=1)

    print("\nTraining complete.")


if __name__ == "__main__":
    main()
