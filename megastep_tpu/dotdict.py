"""Dict-with-attribute-access containers.

TPU-native counterpart of the reference ``rebar/dotdict.py`` (see
``/root/reference/rebar/dotdict.py:7-172``): an ordered mapping whose items can be read
as attributes, with method/attribute *forwarding* onto its values, tree-``map``/
``starmap`` helpers, and a pretty tree ``repr``. Re-designed for a JAX codebase: the
companion :class:`megastep_tpu.arrdict.arrdict` subclass is registered as a JAX pytree so
trees of arrays flow through ``jit``/``vmap``/``grad`` untouched.
"""
from functools import partialmethod


def treestr(t):
    """Renders a dotdict tree as an indented two-column table of keys and value
    summaries (shapes and dtypes for array-likes, reprs for scalars)."""
    key_length = max((len(str(k)) for k in t.keys()), default=0)
    max_spaces = 4 + key_length
    val_length = 100 - max_spaces

    lines = []
    for k, v in t.items():
        lead = f'{str(k):{key_length}s}    '
        if isinstance(v, dotdict):
            sub = treestr(v).splitlines()
            lines.append(lead + sub[0] if sub else lead)
            lines.extend(' ' * max_spaces + l for l in sub[1:])
        else:
            if hasattr(v, 'shape') and hasattr(v, 'dtype'):
                summary = f'{type(v).__name__}({tuple(v.shape)}, {v.dtype})'
            elif isinstance(v, (list, tuple)):
                summary = f'{type(v).__name__}[{len(v)}]'
            else:
                summary = repr(v)
            lines.append(lead + summary[:val_length])
    return '\n'.join(lines) if lines else f'{type(t).__name__}()'


def mapping(f):
    """Wraps ``f`` so that when called on a dict/dotdict it's applied to every leaf
    value, rebuilding the same tree type; non-dicts are passed straight through."""
    def g(x, *args, **kwargs):
        if isinstance(x, dict):
            return type(x)({k: g(v, *args, **kwargs) for k, v in x.items()})
        if isinstance(f, str):
            return getattr(x, f)(*args, **kwargs)
        return f(x, *args, **kwargs)
    return g


def starmapping(f):
    """Wraps ``f`` so that when called on several parallel trees it's applied
    leafwise across them."""
    def g(x, *args):
        if isinstance(x, dict):
            return type(x)({k: g(x[k], *(a[k] for a in args)) for k in x})
        if isinstance(f, str):
            return getattr(x, f)(*args)
        return f(x, *args)
    return g


def leaves(t):
    """All non-dict leaf values of the tree, depth-first."""
    if isinstance(t, dict):
        return [l for v in t.values() for l in leaves(v)]
    return [t]


class dotdict(dict):
    """An ordered dict whose string keys can also be read as attributes.

    Supports the reference's ergonomics: ``d.key`` access, ``d.map(f)`` leafwise
    mapping, ``d.starmap(f, other)`` multi-tree mapping, ``d.pipe(f)`` whole-tree
    application, attribute *forwarding* (``d.sum()`` calls ``.sum()`` on every leaf) and
    a pretty tree repr. Copies are shallow.
    """

    def __dir__(self):
        return sorted(set(super().__dir__()) | set(self.keys()))

    def __getattr__(self, key):
        if key.startswith('__'):
            raise AttributeError(key)
        try:
            return self[key]
        except KeyError:
            pass
        # Attribute forwarding: broadcast attribute/method access onto the values.
        try:
            forwarded = {k: getattr(v, key) for k, v in self.items()}
        except AttributeError:
            raise AttributeError(
                f'There is no "{key}" key and the values don\'t all have a "{key}" attribute') from None
        if any(callable(f) for f in forwarded.values()):
            def call(*args, **kwargs):
                return type(self)({k: f(*args, **kwargs) if callable(f) else f
                                   for k, f in forwarded.items()})
            return call
        return type(self)(forwarded)

    def __repr__(self):
        return f'{type(self).__name__}:\n{treestr(self)}'

    def __str__(self):
        return repr(self)

    # Stop attribute assignment silently diverging from item assignment.
    def __setattr__(self, key, value):
        raise ValueError('Setting attributes on a dotdict is not allowed; use item assignment d[key] = value')

    def copy(self):
        return type(self)(super().copy())

    def pipe(self, f, *args, **kwargs):
        """Applies ``f`` to the whole tree."""
        return f(self, *args, **kwargs)

    def map(self, f, *args, **kwargs):
        """Applies ``f`` to every leaf of the tree."""
        return mapping(f)(self, *args, **kwargs)

    def starmap(self, f, *args, **kwargs):
        """Applies ``f`` leafwise across this tree and the parallel trees ``args``."""
        return starmapping(f)(self, *args, **kwargs)
