"""Shape-only observation/action space descriptors.

Counterpart of ``/root/reference/megastep/spaces.py``: spaces carry only the per-agent
shape information the network factories in :mod:`megastep_tpu.models.heads` need to
build intake/output heads. They hold no data and do no sampling.
"""


class MultiEmpty:
    """A space with no content."""
    shape = ()


class MultiVector:
    """A batch of ``n_agents`` float vectors of dimension ``dim``."""

    def __init__(self, n_agents, dim):
        self.shape = (n_agents, dim)


class MultiImage:
    """A batch of ``n_agents`` (C, H, W) images."""

    def __init__(self, n_agents, C, H, W):
        self.shape = (n_agents, C, H, W)


class MultiConstant:
    """A batch of ``n_agents`` constants."""

    def __init__(self, n_agents):
        self.shape = (n_agents,)


class MultiDiscrete:
    """A batch of ``n_agents`` categorical actions with ``n_actions`` options each."""

    def __init__(self, n_agents, n_actions):
        self.shape = (n_agents, n_actions)
