"""Cross-framework parity: an independent PyTorch transcription of the
reference math (EWA projection + alpha compositing, forward.cu formulas)
vs this framework's oracle — forward images AND input gradients.

The reference's CUDA pipeline cannot run here (no GPU); this torch CPU
transcription of the same formulas is the closest executable stand-in for
the 'curve-gradient allclose vs reference' target (BASELINE.md)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curve_gaussian_tpu.ops.camera import look_at_camera
from curve_gaussian_tpu.ops.projection import preprocess
from curve_gaussian_tpu.ops.rasterize_ref import rasterize_reference

torch = pytest.importorskip("torch")


def torch_render(xyz_t, scale_t, quat_t, opa_t, cam, H, W, bg=0.0):
    """Reference-math renderer in torch (float64 for a tight oracle)."""
    V = torch.tensor(np.asarray(cam.world_to_cam), dtype=torch.float64)
    Pm = torch.tensor(np.asarray(cam.full_proj), dtype=torch.float64)
    fx, fy = cam.focal_x, cam.focal_y

    # project
    hom = xyz_t @ Pm[:3, :3].T + Pm[:3, 3]
    w = xyz_t @ Pm[3, :3] + Pm[3, 3]
    ndc = hom[:, :2] / (w[:, None] + 1e-7)
    mx = ((ndc[:, 0] + 1) * W - 1) * 0.5
    my = ((ndc[:, 1] + 1) * H - 1) * 0.5
    tview = xyz_t @ V[:3, :3].T + V[:3, 3]
    depth = tview[:, 2]

    # cov3d = R S^2 R^T  (forward.cu:118-152 semantics)
    qw, qx, qy, qz = quat_t[:, 0], quat_t[:, 1], quat_t[:, 2], quat_t[:, 3]
    R = torch.stack(
        [
            torch.stack([1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)], -1),
            torch.stack([2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)], -1),
            torch.stack([2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)], -1),
        ],
        -2,
    )
    S2 = scale_t**2
    cov3d = torch.einsum("pij,pj,pkj->pik", R, S2, R)

    # EWA (forward.cu:78-113)
    limx, limy = 1.3 * cam.tanfovx, 1.3 * cam.tanfovy
    tz = tview[:, 2]
    tx = torch.clamp(tview[:, 0] / tz, -limx, limx) * tz
    ty = torch.clamp(tview[:, 1] / tz, -limy, limy) * tz
    J = torch.zeros((len(xyz_t), 2, 3), dtype=torch.float64)
    J[:, 0, 0] = fx / tz
    J[:, 0, 2] = -fx * tx / tz**2
    J[:, 1, 1] = fy / tz
    J[:, 1, 2] = -fy * ty / tz**2
    T = torch.einsum("pij,jk->pik", J, V[:3, :3])
    cov2d = torch.einsum("pij,pjk,plk->pil", T, cov3d, T)
    cxx = cov2d[:, 0, 0] + 0.3
    cyy = cov2d[:, 1, 1] + 0.3
    cxy = cov2d[:, 0, 1]
    det = cxx * cyy - cxy * cxy
    conic = torch.stack([cyy / det, -cxy / det, cxx / det], -1)
    valid = (depth > 0.2) & (det > 0)

    order = torch.argsort(torch.where(valid, depth, torch.inf))
    ys, xs = torch.meshgrid(
        torch.arange(H, dtype=torch.float64),
        torch.arange(W, dtype=torch.float64),
        indexing="ij",
    )
    Timg = torch.ones((H, W), dtype=torch.float64)
    active = torch.ones((H, W), dtype=torch.bool)
    C = torch.zeros((H, W), dtype=torch.float64)
    for p in order.tolist():
        if not bool(valid[p]):
            continue
        dx = mx[p] - xs
        dy = my[p] - ys
        # no per-pixel bbox test: forward.cu:336-372 gates only on the
        # power/alpha cutoffs (candidacy is tile-granular via binning)
        power = -0.5 * (conic[p, 0] * dx * dx + conic[p, 2] * dy * dy) - conic[p, 1] * dx * dy
        a_u = opa_t[p] * torch.exp(power)
        alpha = a_u + (torch.clamp(a_u, max=0.99) - a_u).detach()
        cand = (power <= 0) & (alpha >= 1.0 / 255.0)
        test_T = torch.where(cand, Timg * (1 - alpha), Timg)
        newly_done = cand & (test_T < 1e-4)
        contrib = cand & ~newly_done & active
        wgt = torch.where(contrib, alpha * Timg, torch.zeros(()))
        C = C + wgt  # color = 1
        Timg = torch.where(contrib, test_T, Timg)
        active = active & ~newly_done
    return C + Timg * bg


@pytest.fixture
def scene(rng):
    n = 30
    xyz = rng.uniform(-0.3, 0.3, size=(n, 3)).astype(np.float64)
    scale = np.abs(rng.normal(0.02, 0.01, size=(n, 3))).astype(np.float64) + 5e-3
    quat = rng.normal(size=(n, 4)).astype(np.float64)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    opa = rng.uniform(0.3, 0.9, size=n).astype(np.float64)
    cam = look_at_camera(eye=[0, 0.2, -1.8], target=[0, 0, 0], height=40, width=56)
    return xyz, scale, quat, opa, cam


def _jax_render(xyz, scale, quat, opa, cam, bg=0.25):
    pre = preprocess(
        jnp.asarray(xyz, jnp.float32),
        jnp.asarray(scale, jnp.float32),
        jnp.asarray(quat, jnp.float32),
        jnp.asarray(opa, jnp.float32),
        cam,
    )
    out = rasterize_reference(
        pre,
        jnp.ones(len(xyz), jnp.float32),
        jnp.zeros((len(xyz), 4), jnp.float32),
        jnp.asarray(bg, jnp.float32),
        cam.height,
        cam.width,
    )
    return out["render"]


def test_forward_matches_torch(scene):
    xyz, scale, quat, opa, cam = scene
    img_jax = np.asarray(_jax_render(xyz, scale, quat, opa, cam))
    img_t = torch_render(
        torch.tensor(xyz), torch.tensor(scale), torch.tensor(quat),
        torch.tensor(opa), cam, cam.height, cam.width, bg=0.25,
    ).numpy()
    assert np.abs(img_jax - img_t).max() < 1e-4
    assert img_t.max() > 0.3  # scene draws something


def test_gradients_match_torch(scene, rng):
    xyz, scale, quat, opa, cam = scene
    wimg = rng.normal(size=(cam.height, cam.width))

    def loss_jax(xyz_j, opa_j):
        pre = preprocess(
            xyz_j, jnp.asarray(scale, jnp.float32), jnp.asarray(quat, jnp.float32),
            opa_j, cam,
        )
        out = rasterize_reference(
            pre, jnp.ones(len(xyz), jnp.float32),
            jnp.zeros((len(xyz), 4), jnp.float32), jnp.asarray(0.25, jnp.float32),
            cam.height, cam.width,
        )
        return (out["render"] * jnp.asarray(wimg, jnp.float32)).sum()

    gx_j, go_j = jax.grad(loss_jax, argnums=(0, 1))(
        jnp.asarray(xyz, jnp.float32), jnp.asarray(opa, jnp.float32)
    )

    xyz_t = torch.tensor(xyz, requires_grad=True)
    opa_t = torch.tensor(opa, requires_grad=True)
    img = torch_render(
        xyz_t, torch.tensor(scale), torch.tensor(quat), opa_t, cam,
        cam.height, cam.width, bg=0.25,
    )
    (img * torch.tensor(wimg)).sum().backward()

    for a, b, name in (
        (np.asarray(gx_j), xyz_t.grad.numpy(), "xyz"),
        (np.asarray(go_j), opa_t.grad.numpy(), "opacity"),
    ):
        m = np.abs(b).max() + 1e-9
        assert np.abs(a - b).max() / m < 2e-3, name
        assert np.abs(b).max() > 0


@pytest.fixture(autouse=True)
def _pin_exact_depth_sort(exact_depth_sort):
    """This module compares against full-precision depth-order oracles;
    see the exact_depth_sort fixture (conftest) for why SORT_PACKED is
    exempted from bit-parity tiers."""
