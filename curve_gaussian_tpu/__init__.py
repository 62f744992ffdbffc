"""curve_gaussian_tpu — TPU-native framework for curve-aware Gaussian splatting.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
zhirui-gao/Curve-Gaussian (ICCV 2025): 3D parametric curve reconstruction
(cubic Béziers + line segments) from multi-view 2D edge maps, via a
differentiable single-channel Gaussian-splat rasterizer whose pixel-loss
gradients flow back into Bézier control points.

Design stance (TPU-first, not a port):
  * curve model = pure pytree of arrays + functions (no stateful classes)
  * rasterizer = vectorized jnp preprocess + sort-based tile binning +
    Pallas tile-blend kernel pair (fwd/bwd) behind jax.custom_vjp
  * gradient accumulation = deterministic segment-sum (no atomics)
  * topology surgery = host-side numpy at coarse cadence, with
    power-of-two capacity bucketing to bound XLA recompilations
  * multi-chip = jax.sharding Mesh: views (data-parallel) and/or image
    tile rows (spatial-parallel) sharded across chips, parameter grads
    psum'd over ICI
"""

__version__ = "0.1.0"
