"""Geometric device math: 2-D line intersection and projection.

Counterpart of the reference's CUDA device functions ``intersect``/``project``
(``/root/reference/megastep/src/kernels.cu:36-107``), written as broadcasting jnp
functions over (..., 2) point arrays so they vmap/fuse cleanly on TPU.

Conventions (identical to the reference):
  * an infinite line is parameterized as ``P + s*U``;
  * ``intersect`` returns the fractions ``s`` (along ``U`` from ``P``) and ``t``
    (along ``V`` from ``Q``) of the crossing point, or +inf for near-parallel lines;
  * ``project`` returns the fraction ``s`` of the projection of ``Q`` onto the line
    and the distance ``d`` from ``Q`` to the line.
"""
import jax.numpy as jnp

PARALLEL_EPS = 1e-3


def cross(v, w):
    """2-D cross product (z component) of (..., 2) arrays."""
    return v[..., 0] * w[..., 1] - v[..., 1] * w[..., 0]


def dot(v, w):
    """Dot product of (..., 2) arrays."""
    return v[..., 0] * w[..., 0] + v[..., 1] * w[..., 1]


def length(v):
    """Euclidean norm of (..., 2) arrays."""
    return jnp.sqrt(v[..., 0]**2 + v[..., 1]**2)


def intersect(p, u, q, v):
    """Intersection of the infinite lines ``p + s*u`` and ``q + t*v``.

    Returns ``(s, t)``; both are +inf where the lines are near-parallel
    (|cross(u, v)| < 1e-3, as in the reference kernel).
    """
    uxv = cross(u, v)
    pq = q - p
    distant = jnp.abs(uxv) < PARALLEL_EPS
    safe = jnp.where(distant, 1., uxv)
    s = jnp.where(distant, jnp.inf, cross(pq, v) / safe)
    t = jnp.where(distant, jnp.inf, cross(pq, u) / safe)
    return s, t


def project(p, u, q):
    """Projects ``q`` onto the infinite line ``p + s*u``.

    Returns ``(s, d)``: the fraction along ``u`` of the projection, and the distance
    from ``q`` to the line. Uses the reference's 1e-6 length regularizer.
    """
    ulen = length(u) + 1e-6
    pq = q - p
    s = dot(pq, u) / (ulen * ulen)
    d = jnp.abs(cross(pq, u)) / ulen
    return s, d


def rotate(angles_deg, p):
    """Rotates (..., 2) vectors by angles given in degrees (broadcasting)."""
    a = jnp.pi / 180 * angles_deg
    c, s = jnp.cos(a), jnp.sin(a)
    x, y = p[..., 0], p[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], -1)


def to_local_frame(angles_deg, p):
    """Rotates global-frame (..., 2) vectors into the frame local to an agent facing
    ``angles_deg`` (reference ``megastep/modules.py:10-15``)."""
    a = jnp.pi / 180 * angles_deg
    c, s = jnp.cos(a), jnp.sin(a)
    x, y = p[..., 0], p[..., 1]
    return jnp.stack([c * x + s * y, -s * x + c * y], -1)


def to_global_frame(angles_deg, p):
    """Inverse of :func:`to_local_frame` (reference ``megastep/modules.py:17-22``)."""
    return rotate(angles_deg, p)


def normalize_degrees(a):
    """Wraps angles into [-180, 180) (reference ``kernels.cu:173-175``)."""
    return ((a % 360.) + 180.) % 360. - 180.
