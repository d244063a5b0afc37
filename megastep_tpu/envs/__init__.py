"""Demo environments built on the engine.

Counterpart of ``/root/reference/megastep/demo/envs/``, redesigned for TPU: each env
is a lightweight object holding static config and device-constant tables, whose
``reset``/``step`` are *pure* functions over an explicit env-state pytree —
``reset(key) -> (state, world)``, ``step(state, decision, key) -> (state, world)`` —
so a whole rollout jits into one ``lax.scan`` and shards over a device mesh.

``world`` is the reference's decision/world arrdict protocol
(``/root/reference/docs/concepts.rst:447-493``): ``obs``, ``reward``, ``reset``.
"""
from .minimal import Minimal
from .explorer import Explorer
from .deathmatch import Deathmatch

__all__ = ['Minimal', 'Explorer', 'Deathmatch']
