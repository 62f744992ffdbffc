"""Subprocess (chipless) AOT compile warmer.

The in-process Prewarmer thread works — axon remote compiles are chipless,
so they run concurrent with training — but each .lower() costs ~5-10 s of
GIL and an in-flight remote compile slows foreground chunks 30-50%
(ROADMAP.md).  This module moves the whole lower+compile into a separate
python process: backend registration in a second process is instant and
does NOT contend for the chip grant (probed round 3), remote compiles are
chipless, and the persistent compile cache is shared across processes
(probed: 52 s compile -> 0.35 s re-compile of the identical module).  The
foreground then pays only its own (unavoidable, needed-anyway) trace +
cache-hit compile when a shape is first used.

A warm job is a list of picklable SPECS (ShapeDtypeStruct pytrees + the
static config dataclasses) rather than closures; `run_spec` reconstructs
the exact .lower().compile() the foreground will request — the SDS
lowering is bit-identical to the real-array lowering (pinned by
tests/test_prewarm_defer.py::test_sds_lowering_matches_real_arrays), so
the persistent-cache key matches.

CGT_COMPILER_OPTS and CGT_CACHE_DIR are inherited through the environment,
keeping the subprocess's jit compiler_options (part of the cache key)
identical to the foreground's.
"""
from __future__ import annotations

import os
import pickle
import subprocess
import sys
import tempfile
from typing import Dict, List


def combo_spec(
    ts_shapes, cam_shapes, gt_shape, bg_shape, opt_cfg, pipe_cfg,
    use_mask: bool, conn_on: bool, n_gaussians: int, cam_geom,
    mesh_shape=None, vi_shape=None,
) -> Dict:
    return {
        "kind": "psteps" if mesh_shape is not None else "steps",
        "ts_shapes": ts_shapes,
        "cam_shapes": tuple(cam_shapes),
        "gt_shape": gt_shape,
        "bg_shape": bg_shape,
        "opt_cfg": opt_cfg,
        "pipe_cfg": pipe_cfg,
        "use_mask": use_mask,
        "conn_on": conn_on,
        "n_gaussians": n_gaussians,
        "cam_geom": tuple(cam_geom),
        "mesh_shape": mesh_shape,
        # learned-exposure runs thread per-step view indices; None keeps the
        # lowered module identical to the pre-exposure shapes
        "vi_shape": vi_shape,
    }


def eval_spec(
    ts_shapes, cam_shapes, pipe_cfg, bg_shape, use_mask: bool,
    n_gaussians: int, mask_threshold: float,
) -> Dict:
    return {
        "kind": "eval",
        "ts_shapes": ts_shapes,
        "cam_shapes": cam_shapes,
        "pipe_cfg": pipe_cfg,
        "bg_shape": bg_shape,
        "use_mask": use_mask,
        "n_gaussians": n_gaussians,
        "mask_threshold": mask_threshold,
    }


def run_spec(spec: Dict) -> None:
    """Lower + compile one spec (populates the persistent compile cache)."""
    import jax
    import jax.numpy as jnp

    from . import train as T

    scalar_i = jax.ShapeDtypeStruct((), jnp.int32)
    kind = spec["kind"]
    vi_shape = spec.get("vi_shape")
    if kind == "steps":
        T.train_steps_scan.lower(
            spec["ts_shapes"], spec["cam_shapes"], spec["gt_shape"],
            spec["bg_shape"], spec["opt_cfg"], spec["pipe_cfg"],
            use_mask=spec["use_mask"], n_gaussians=spec["n_gaussians"],
            cam_geom=spec["cam_geom"], conn_on=spec["conn_on"],
            n_active=scalar_i,
            view_indices=vi_shape, use_exposure=vi_shape is not None,
        ).compile()
    elif kind == "psteps":
        from ..parallel import sharding as ps

        ps.parallel_train_steps_scan.lower(
            spec["ts_shapes"], spec["cam_shapes"], spec["gt_shape"],
            spec["bg_shape"], spec["opt_cfg"], spec["pipe_cfg"],
            use_mask=spec["use_mask"], mesh_shape=spec["mesh_shape"],
            cam_geom=spec["cam_geom"], conn_on=spec["conn_on"],
            n_active=scalar_i,
            view_indices=vi_shape, use_exposure=vi_shape is not None,
        ).compile()
    elif kind == "eval":
        T.eval_render.lower(
            spec["ts_shapes"], spec["cam_shapes"], spec["pipe_cfg"],
            spec["bg_shape"], use_mask=spec["use_mask"],
            n_gaussians=spec["n_gaussians"],
            mask_threshold=spec["mask_threshold"],
        ).compile()
    else:  # pragma: no cover - spec construction is package-internal
        raise ValueError(f"unknown warm spec kind {kind!r}")


def warm_subprocess(specs: List[Dict], timeout: float = 2400.0) -> bool:
    """Run `specs` through `python -m ...engine.warm` in a fresh process.
    Returns True when the process exits cleanly (cache populated)."""
    fd, path = tempfile.mkstemp(suffix=".warmspec")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(specs, f)
        proc = subprocess.run(
            [sys.executable, "-m", "curve_gaussian_tpu.engine.warm", path],
            capture_output=True,
            timeout=timeout,
        )
        if proc.returncode != 0:
            tail = proc.stderr.decode(errors="replace")[-2000:]
            print(f"subprocess warm failed (rc={proc.returncode}): {tail}",
                  flush=True)
        return proc.returncode == 0
    except Exception as e:  # pragma: no cover - best effort
        print(f"subprocess warm failed: {e}", flush=True)
        return False
    finally:
        try:
            os.unlink(path)
        except OSError:
            pass


def main(path: str) -> None:
    import jax

    # sitecustomize forces jax_platforms="axon,cpu" in every process; CPU
    # test runs set CGT_WARM_PLATFORM=cpu so the warm subprocess compiles
    # for the same backend as its (CPU-pinned) parent.
    plat = os.environ.get("CGT_WARM_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    cache_dir = os.environ.get("CGT_CACHE_DIR", "/root/.cache/jax_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    with open(path, "rb") as f:
        specs = pickle.load(f)
    for spec in specs:
        run_spec(spec)


if __name__ == "__main__":
    main(sys.argv[1])
