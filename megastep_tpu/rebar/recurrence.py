"""Recurrent-state management — and why it's (mostly) gone.

The reference's ``rebar/recurrence.py`` is a registry of hidden ``State`` cells
buried inside module trees, with ``get``/``set``/``temp_clear_set`` to snapshot and
replay them during optimization (``recurrence.py:5-75``). In the functional TPU
stack that whole mechanism is replaced by *explicit* state: recurrent cores take and
return their state (see :class:`megastep_tpu.models.lstm.LSTM`), the training loop
carries it (``demo/train.py``), and the learner's replay-from-snapshot is a plain
minibatch slice of the carried pytree.

For users porting reference code, a minimal host-side :class:`State` cell and
tree ``get``/``set`` helpers are provided; nothing in megastep_tpu itself uses them.
"""
from ..arrdict import arrdict


class State:
    """A host-side lazily-initialized value cell (reference ``recurrence.py:5-27``)."""

    def __init__(self):
        self._value = None
        self._initialized = False

    def get(self, factory=None):
        if not self._initialized and factory is not None:
            self._value = factory()
            self._initialized = True
        return self._value

    def set(self, value):
        self._value = value
        self._initialized = True

    def clear(self):
        self._value = None
        self._initialized = False


def states(obj, prefix=()):
    """All State cells reachable from ``obj``'s attributes, keyed by dotted path."""
    out = {}
    for k, v in vars(obj).items():
        if isinstance(v, State):
            out['.'.join((*prefix, k))] = v
        elif hasattr(v, '__dict__'):
            out.update(states(v, (*prefix, k)))
    return out


def get(obj):
    """Snapshot of all State cells under ``obj``."""
    return arrdict({k: v.get() for k, v in states(obj).items()})


def set(obj, values):
    for k, v in states(obj).items():
        if k in values:
            v.set(values[k])


def clear(obj):
    for v in states(obj).values():
        v.clear()


class temp_clear_set:
    """Context manager: stash current cell values, install ``values``, restore on
    exit (reference ``recurrence.py:54-75``)."""

    def __init__(self, obj, values):
        self._obj = obj
        self._values = values
        self._stash = None

    def __enter__(self):
        self._stash = get(self._obj)
        clear(self._obj)
        set(self._obj, self._values)
        return self._obj

    def __exit__(self, *exc):
        clear(self._obj)
        set(self._obj, self._stash)
        return False


class Sequential:
    """A kwargs-passing sequential container (reference ``recurrence.py:77-82``):
    each callable receives the running value plus the shared kwargs. For flax-based
    stacks prefer explicit composition in a module's ``__call__``."""

    def __init__(self, *fns):
        self.fns = fns

    def __call__(self, x, **kwargs):
        for f in self.fns:
            x = f(x, **kwargs)
        return x
