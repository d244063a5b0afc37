"""World-scale constants shared across the engine.

Mirrors the reference's module-level constants layer (``/root/reference/megastep/
core.py:10-14`` and ``megastep/geometry.py:9-11``): angles are in **degrees**, positions
in **meters**, one texel is 5 cm, and the agent is a disc of width 0.15 m whose collision
radius (also the camera near plane) is ``0.15/sqrt(2)``.
"""

AGENT_WIDTH = .15
TEXTURE_RES = .05

# Used for collision radius and near camera plane.
AGENT_RADIUS = 1 / 2**.5 * AGENT_WIDTH

# Geometry / floorplan constants.
MARGIN = 1.
MASK_RES = .2
SVG_SCALE = 100

# Lighting.
AMBIENT = .1
LUMINANCE = 2.


def gamma_encode(x):
    """Converts linear RGB data to viewable (gamma-corrected) values."""
    return x ** (1 / 2.2)


def gamma_decode(x):
    """Converts gamma-corrected RGB data to linear (interpolatable) values."""
    return x ** 2.2
