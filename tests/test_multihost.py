"""Multi-host glue executed for real: 2-process jax.distributed on CPU.

SURVEY §2.3/§5: the reference has no distributed story (green-field);
parallel/multihost.py provides the initialization + global-mesh glue.  This
test actually RUNS it — two localhost processes form a 2-device global mesh
and drive one parallel_train_step (replicated params, views sharded across
processes, grads psum'd) — so the multi-host path is executed in CI, not
just importable.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

_CHILD = textwrap.dedent(
    """
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")

    port, pid = sys.argv[1], int(sys.argv[2])
    from curve_gaussian_tpu.parallel import multihost as mh

    got = mh.initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    assert got == pid == jax.process_index(), (got, pid)
    mesh = mh.global_mesh()
    assert len(jax.devices()) == 2, jax.devices()
    assert jax.process_count() == 2

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils as mhu
    from jax.sharding import PartitionSpec as P

    from curve_gaussian_tpu.config import OptimizationConfig, PipelineConfig
    from curve_gaussian_tpu.data import synthetic
    from curve_gaussian_tpu.engine.train import init_train_state
    from curve_gaussian_tpu.models import curve_state as cs
    from curve_gaussian_tpu.parallel import sharding as ps

    rng = np.random.default_rng(0)
    cams = synthetic.ring_cameras(2, 16, 128)
    state = cs.init_state(
        np.asarray([[0.4, 0.5, 0.5], [0.6, 0.5, 0.5]], np.float32),
        n_views=2, n_gaussians=8, capacity=cs.MIN_CAPACITY,
    )
    ts = init_train_state(state)  # identical on both processes (seeded)

    # each process contributes ITS view as the local shard of the batch
    cam = cams[pid]
    loc = lambda a: np.asarray(a)[None]
    cam_local = (loc(cam.world_to_cam), loc(cam.full_proj), loc(cam.cam_center))
    gt_local = rng.uniform(size=(2, 16, 128)).astype(np.float32)[pid][None]

    glob = lambda tree, spec: mhu.host_local_array_to_global_array(
        tree, mesh, spec
    )
    ts_g = glob(jax.tree.map(np.asarray, ts), P())
    cam_g = glob(cam_local, P("data"))
    gt_g = glob(gt_local, P("data"))

    ts2, metrics = ps.parallel_train_step(
        ts_g, cam_g, gt_g, jnp.zeros(()),
        OptimizationConfig(), PipelineConfig(tile_capacity=256),
        use_mask=False, mesh_shape=(("data", 2),),
        cam_geom=(cam.height, cam.width, cam.tanfovx, cam.tanfovy),
    )
    # outputs are replicated (out_specs P()): the local shard holds the value
    total = float(np.asarray(metrics["total"].addressable_shards[0].data))
    assert np.isfinite(total), total
    assert int(np.asarray(ts2.step.addressable_shards[0].data)) == 1
    print(f"proc {pid}: multihost step OK loss={total:.5f}", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_distributed_step(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["CGT_CACHE_DIR"] = ""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "multihost step OK" in out, out[-3000:]
