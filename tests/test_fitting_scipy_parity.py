"""Closed-form Bézier LSQ vs scipy curve_fit on the reference's exact
parameterization (edge_extraction/fitting.py:14-71).

The reference solves a LINEAR least-squares problem with a nonlinear
optimizer (curve_fit over 12 scalar control-point params); our
fit_bezier_lsq solves it exactly.  Both must land on the same optimum.
"""
import numpy as np
from scipy.optimize import curve_fit

from curve_gaussian_tpu.models.fitting import fit_bezier_lsq


def _ref_bezier_curve(tt, *p):
    n = len(tt)
    matrix_t = np.concatenate(
        [(tt**3)[..., None], (tt**2)[..., None], tt[..., None],
         np.ones((n, 1))], axis=1).astype(float)
    matrix_w = np.array(
        [[-1, 3, -3, 1], [3, -6, 3, 0], [-3, 3, 0, 0], [1, 0, 0, 0]]
    ).astype(float)
    matrix_p = np.array(p, float).reshape(4, 3)
    return (matrix_t @ matrix_w @ matrix_p).reshape(-1)


def test_closed_form_matches_curve_fit_optimum():
    rng = np.random.default_rng(3)
    for _ in range(5):
        gt_cp = rng.normal(size=(4, 3))
        t = np.linspace(0, 1, 40)
        pts = _ref_bezier_curve(t, *gt_cp.ravel()).reshape(-1, 3)
        pts = pts + rng.normal(scale=2e-3, size=pts.shape)

        popt, _ = curve_fit(
            _ref_bezier_curve, t, pts.reshape(-1), p0=np.zeros(12)
        )
        ref_cp = popt.reshape(4, 3)
        ours = fit_bezier_lsq(pts, error_threshold=1.0)
        assert ours is not None
        # same linear optimum (curve_fit converges to it numerically)
        np.testing.assert_allclose(ours, ref_cp, rtol=0, atol=5e-4)


def test_rmse_threshold_semantics():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(40, 3))  # junk: no cubic fits this
    assert fit_bezier_lsq(pts, error_threshold=1e-6) is None
