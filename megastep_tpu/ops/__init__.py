"""Device compute ops: physics, light baking, and the raycast renderer.

Each op has a pure-``jnp`` reference implementation (the correctness ground truth,
mirroring the math of the reference CUDA kernels in ``/root/reference/megastep/src/
kernels.cu``) and, for the hot ops, a Pallas TPU kernel validated bit-for-bit against
the reference implementation.
"""
from . import geom, physics, bake, render
