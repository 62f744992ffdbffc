"""Chunk-plan enumeration + compile pre-warm/deferral policy tests.

The driver's chunk schedule is deterministic (config-only), which is what
lets the Prewarmer compile every (kp, use_mask, conn_on) step shape ahead
of first use and lets capacity shrinks defer until their compile is warm
(engine/loop.py).  These tests pin the plan semantics to the original
while-loop chunking and exercise the deferral state machine on CPU with a
no-op compile service.
"""
import dataclasses

import numpy as np
import pytest

from curve_gaussian_tpu.config import (
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
)
from curve_gaussian_tpu.engine.loop import (
    Prewarmer,
    build_events,
    chunk_plan,
    future_combos,
)
from curve_gaussian_tpu.models import surgery


def _reference_chunks(first_iter, opt_cfg, events, scan_chunk):
    """The pre-refactor while-loop chunking, transcribed verbatim."""
    out = []
    iteration = first_iter
    while iteration < opt_cfg.iterations:
        next_event = min(
            [e for e in events if e > iteration] or [opt_cfg.iterations]
        )
        k = min(next_event - iteration, scan_chunk)
        kp = scan_chunk if k == scan_chunk else min(
            1 << (k - 1).bit_length() if k > 1 else 1, scan_chunk
        )
        um = (iteration + 1) >= opt_cfg.densify_until_iter
        co = (iteration + 1) > opt_cfg.conn_from_iter
        out.append((iteration, k, kp, um, co))
        iteration += k
    return out


@pytest.mark.parametrize("first_iter", [0, 3000, 7000])
def test_chunk_plan_matches_reference_loop(first_iter):
    opt = OptimizationConfig()  # the reference default 10k schedule
    events = build_events(first_iter, opt, (3000, 10000), (10000,), (10000,))
    plan = chunk_plan(first_iter, opt, events, 100)
    assert [tuple(c) for c in plan] == _reference_chunks(
        first_iter, opt, events, 100
    )
    # full coverage, boundary at every event
    assert sum(c.k for c in plan) == opt.iterations - first_iter
    ends = {c.start + c.k for c in plan}
    assert events <= ends | {first_iter}


def test_chunk_plan_flag_flips():
    opt = OptimizationConfig()
    events = build_events(0, opt, (), (), ())
    plan = chunk_plan(0, opt, events, 100)
    for c in plan:
        assert c.use_mask == ((c.start + 1) >= opt.densify_until_iter)
        assert c.conn_on == ((c.start + 1) > opt.conn_from_iter)
        assert 1 <= c.k <= c.kp <= 100
    # the single-iteration chunk between the use_mask boundary and
    # densify_until exists and has its own (1, True, False) shape
    combos = future_combos(plan, 0)
    assert (1, True, False) in combos
    assert combos[0] == (100, False, False)
    # ordered by first use: masked combos come after the unmasked head
    assert combos.index((100, True, True)) > 0


def test_future_combos_from_midpoint():
    opt = OptimizationConfig()
    plan = chunk_plan(0, opt, build_events(0, opt), 100)
    combos = future_combos(plan, opt.densify_until_iter)
    assert all(um for (_, um, _) in combos)


def test_want_tile_capacity_policy():
    from curve_gaussian_tpu.engine.loop import want_tile_capacity as w

    # shrinks straight to the 2x-headroom power of two
    assert w(50, 896) == 128
    assert w(100, 896) == 256
    # hysteresis: less than a 25% reduction -> stay
    assert w(300, 896) == 896  # want 1024 -> clamp 896 -> no change
    assert w(200, 896) == 512
    assert w(400, 1024) == 1024  # want 1024 == cur
    assert w(300, 1024) == 1024  # want 1024, not <= 768
    assert w(100, 512) == 256
    # floor respected (raised after an overflow at some K)
    assert w(10, 896, floor=512) == 512
    assert w(10, 512, floor=512) == 512
    # zero peak still floors
    assert w(0, 896) == 128


def test_prewarmer_drains_and_sets_event():
    import threading

    ran = []
    pw = Prewarmer(enabled=True, execute=True)
    evt = threading.Event()
    pw.submit(10, [lambda: ran.append(1), lambda: ran.append(2)], done_evt=evt)
    assert evt.wait(timeout=5.0)
    assert ran == [1, 2]
    # blocked service never drains
    evt2 = threading.Event()
    pwb = Prewarmer(enabled=True, execute=True, block=True)
    pwb.submit(10, [lambda: ran.append(3)], done_evt=evt2)
    assert not evt2.wait(timeout=0.2)
    assert 3 not in ran


def test_sds_lowering_matches_real_arrays():
    """The Prewarmer compiles from ShapeDtypeStructs; its executable must be
    THE one the foreground call needs (same lowered module => same persistent
    cache key).  Probed on hardware (52 s compile -> 0.35 s cache hit);
    pinned here on CPU."""
    import jax
    import jax.numpy as jnp

    from curve_gaussian_tpu.data import synthetic
    from curve_gaussian_tpu.engine import train as T
    from curve_gaussian_tpu.models import curve_state as cs

    H = W = 32
    cams = synthetic.ring_cameras(2, H, W)
    seed = synthetic.grid_seed_points(3)
    state = cs.init_state(seed, n_views=2, n_gaussians=4)
    ts = T.init_train_state(state)
    opt = OptimizationConfig()
    pipe = PipelineConfig(tile_capacity=128)
    w2c = jnp.stack([c.world_to_cam for c in cams])
    proj = jnp.stack([c.full_proj for c in cams])
    ctr = jnp.stack([c.cam_center for c in cams])
    geom = (H, W, cams[0].tanfovx, cams[0].tanfovy)
    kp = 2

    sds = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
    lo_sds = T.train_steps_scan.lower(
        jax.tree.map(sds, ts),
        tuple(jax.ShapeDtypeStruct((kp,) + a.shape[1:], a.dtype)
              for a in (w2c, proj, ctr)),
        jax.ShapeDtypeStruct((kp, H, W), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
        opt, pipe, use_mask=True, n_gaussians=4, cam_geom=geom,
        conn_on=False, n_active=jax.ShapeDtypeStruct((), jnp.int32),
    )
    vi = jnp.zeros((kp,), jnp.int32)
    lo_real = T.train_steps_scan.lower(
        ts, (w2c[vi], proj[vi], ctr[vi]), jnp.zeros((kp, H, W)),
        jnp.zeros((), jnp.float32), opt, pipe, use_mask=True, n_gaussians=4,
        cam_geom=geom, conn_on=False, n_active=jnp.asarray(1, jnp.int32),
    )
    assert lo_sds.as_text() == lo_real.as_text()


def _tiny_combo_spec():
    """A minimal 'steps' warm spec (mirrors the loop.py construction)."""
    import jax
    import jax.numpy as jnp

    from curve_gaussian_tpu.data import synthetic
    from curve_gaussian_tpu.engine import train as T
    from curve_gaussian_tpu.engine import warm
    from curve_gaussian_tpu.models import curve_state as cs

    H = W = 32
    cams = synthetic.ring_cameras(2, H, W)
    seed = synthetic.grid_seed_points(3)
    state = cs.init_state(seed, n_views=2, n_gaussians=4)
    ts = T.init_train_state(state)
    kp = 2
    sds = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
    w2c = jnp.stack([c.world_to_cam for c in cams])
    proj = jnp.stack([c.full_proj for c in cams])
    ctr = jnp.stack([c.cam_center for c in cams])
    cam_s = tuple(
        jax.ShapeDtypeStruct((kp,) + a.shape[1:], a.dtype)
        for a in (w2c, proj, ctr)
    )
    return warm.combo_spec(
        jax.tree.map(sds, ts), cam_s,
        jax.ShapeDtypeStruct((kp, H, W), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
        OptimizationConfig(), PipelineConfig(tile_capacity=128),
        use_mask=True, conn_on=False, n_gaussians=4,
        cam_geom=(H, W, cams[0].tanfovx, cams[0].tanfovy),
    )


def test_warm_spec_pickles_and_runs_inprocess():
    """Warm specs must survive a pickle round-trip (the subprocess channel)
    and run_spec must reconstruct a lowerable compile on this backend."""
    import pickle

    from curve_gaussian_tpu.engine import warm

    spec = pickle.loads(pickle.dumps(_tiny_combo_spec()))
    warm.run_spec(spec)  # lowers + compiles on the CPU test backend


@pytest.mark.slow
def test_warm_subprocess_end_to_end(monkeypatch):
    """The subprocess warmer (engine/warm.py __main__) must import, read the
    pickled specs, and compile cleanly in a fresh interpreter."""
    from curve_gaussian_tpu.engine import warm

    monkeypatch.setenv("CGT_WARM_PLATFORM", "cpu")
    monkeypatch.setenv("CGT_CACHE_DIR", "")
    assert warm.warm_subprocess([_tiny_combo_spec()], timeout=600)


def test_prewarmer_tuple_jobs_fall_back_to_thunks():
    """(thunk, spec) jobs run the thunk when subproc mode is off."""
    import threading

    ran = []
    pw = Prewarmer(enabled=True, execute=True, subproc=False)
    evt = threading.Event()
    pw.submit(5, [(lambda: ran.append("a"), {"kind": "x"})], done_evt=evt)
    assert evt.wait(timeout=5.0)
    assert ran == ["a"]


@pytest.fixture
def shrink_run(tmp_path, monkeypatch):
    """A tiny train_scene whose surgery forcibly shrinks capacity 512->256
    at iteration 12 (monkeypatched keep), ending with a real merge pass."""
    from curve_gaussian_tpu.data import synthetic
    from curve_gaussian_tpu.engine import loop as loop_mod

    orig = surgery.apply_schedule

    def forced(ts, iteration, opt):
        if iteration == 12:
            host = surgery.extract(ts)
            host = surgery.keep(host, np.arange(host.n) < 10)
            return surgery.repack(host, ts)
        return orig(ts, iteration, opt)

    monkeypatch.setattr(loop_mod.surgery, "apply_schedule", forced)

    scene = synthetic.make_scene(
        seed=3, n_curves=3, n_lines=1, n_views=4, height=64, width=128
    )
    seeds = synthetic.grid_seed_points(7)  # 343 -> capacity bucket 512
    opt = dataclasses.replace(
        OptimizationConfig(),
        iterations=24,
        densify_from_iter=100,  # no densification growth
        densify_until_iter=12,
        densification_interval=1000,
        conn_from_iter=12,
        position_lr_max_steps=100,
    )
    pipe = dataclasses.replace(PipelineConfig(), tile_capacity=128)
    model = ModelConfig(n_gaussians=4)

    def run(out):
        return loop_mod.train_scene(
            scene.cameras, scene.edge_maps, seeds, model, opt, pipe,
            str(tmp_path / out), quiet=True, scan_chunk=8,
        )

    return run


@pytest.mark.slow
def test_adaptive_tile_capacity_shrinks_mid_run(tmp_path, monkeypatch):
    """A run whose per-tile peaks sit far below tile_capacity must shrink K
    via the warm-before-switch policy (engine/loop.py adaptive block)."""
    from curve_gaussian_tpu.data import synthetic
    from curve_gaussian_tpu.engine.loop import train_scene

    monkeypatch.setenv("CGT_FORCE_PREWARM", "1")
    monkeypatch.delenv("CGT_DEFER_BLOCK", raising=False)
    scene = synthetic.make_scene(
        seed=4, n_curves=2, n_lines=1, n_views=4, height=64, width=128
    )
    seeds = scene.curves.mean(axis=1).astype(np.float32)
    opt = dataclasses.replace(
        OptimizationConfig(),
        iterations=30,
        densify_from_iter=100,
        densify_until_iter=10,
        densification_interval=1000,
        conn_from_iter=10,
        position_lr_max_steps=100,
    )
    # 3 curves x 4 gaussians over a 2x4-tile image: peaks are tiny, so the
    # policy must reach the 128 floor from 896
    pipe = PipelineConfig(tile_capacity=896)
    res = train_scene(
        scene.cameras, scene.edge_maps, seeds, ModelConfig(n_gaussians=4),
        opt, pipe, str(tmp_path / "adapt"), quiet=True, scan_chunk=8,
    )
    assert res.pipe_cfg.tile_capacity == 128
    assert int(res.ts.step) == 30


@pytest.mark.slow
def test_shrink_defers_while_compile_pending(shrink_run, monkeypatch):
    monkeypatch.setenv("CGT_FORCE_PREWARM", "1")
    monkeypatch.setenv("CGT_DEFER_BLOCK", "1")
    res = shrink_run("blocked")
    # compile never warms -> training stays at the old 512 bucket
    assert res.ts.alive.shape[0] == 512
    assert int(res.ts.step) == 24
    assert int(np.sum(np.asarray(res.ts.alive))) <= 10


@pytest.mark.slow
def test_shrink_switches_once_compile_warm(shrink_run, monkeypatch):
    monkeypatch.setenv("CGT_FORCE_PREWARM", "1")
    monkeypatch.delenv("CGT_DEFER_BLOCK", raising=False)
    res = shrink_run("warm")
    # the no-op compile service drains immediately -> the shrink lands at
    # the latest by the end-of-run surgery event
    assert res.ts.alive.shape[0] == 256
    assert int(res.ts.step) == 24
