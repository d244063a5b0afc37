"""Ragged arrays: variable-length per-env data in one packed buffer.

Counterpart of the reference's ``megastep/ragged.py`` + C++ ``Ragged``
(``/root/reference/megastep/src/common.h:102-155``): ``vals`` packed contiguously,
``widths`` per subarray, derived ``starts``/``ends``/``inverse``, int/slice
indexing.

Role in the TPU design: the *engine* does not consume raggeds — XLA needs static
shapes, so :func:`megastep_tpu.scene.scenery` compiles geometry into padded arrays
with width masks (SURVEY.md §7). Raggeds remain useful host-side (building scenes,
analyzing results) and as a conversion point for code ported from the reference:
:meth:`RaggedNumpy.padded` produces exactly the padded+mask layout the engine uses.
"""
import numpy as np

try:
    import jax
    import jax.numpy as jnp
    _HAVE_JAX = True
except ImportError:  # pragma: no cover
    _HAVE_JAX = False

__all__ = ['Ragged', 'RaggedNumpy']


class RaggedNumpy:
    """A ragged array over numpy storage (reference ``ragged.py:7-43``).

    :var vals: (total, ...) packed values.
    :var widths: (n,) subarray lengths.
    :var starts/ends: (n,) subarray extents.
    :var inverse: (total,) owning-subarray index of each value row.
    """

    def __init__(self, vals, widths):
        self.vals = np.asarray(vals)
        self.widths = np.asarray(widths)
        assert self.widths.sum() == len(self.vals), \
            f'widths sum to {self.widths.sum()}, vals has {len(self.vals)} rows'
        self.ends = self.widths.cumsum()
        self.starts = self.ends - self.widths

        # inverse via scatter-ADD + cumsum, like the C++ (common.h:88-99):
        # empty subarrays stack their +1 on the next start, so ids stay aligned.
        indices = np.zeros(len(self.vals) + 1, dtype=int)
        np.add.at(indices, self.starts, 1)
        self.inverse = indices[:len(self.vals)].cumsum() - 1

    def __len__(self):
        return len(self.widths)

    def __getitem__(self, i):
        if isinstance(i, int):
            return self.vals[self.starts[i]:self.ends[i]]
        if isinstance(i, slice):
            assert i.step in (None, 1), 'Only unit-step slices are supported'
            start, stop, _ = i.indices(len(self))
            return RaggedNumpy(
                self.vals[self.starts[start]:self.ends[stop - 1]] if stop > start
                else self.vals[:0],
                self.widths[start:stop])
        raise TypeError(f'Cannot index a ragged with {type(i)}')

    def __repr__(self):
        return f'{type(self).__name__}({len(self)} subarrays, {len(self.vals)} rows)'

    __str__ = __repr__

    def jaxify(self):
        """Device copy with jnp leaves (the reference's ``torchify``)."""
        return Ragged(jnp.asarray(self.vals), jnp.asarray(self.widths))

    def numpyify(self):
        return self

    def padded(self, length=None, value=0):
        """The engine's layout: ``(vals_padded (n, length, ...), mask (n, length))``.

        This is the ragged→padded conversion the scene compiler applies to every
        per-env array (SURVEY.md §7)."""
        length = int(self.widths.max()) if length is None else length
        shape = (len(self), length) + self.vals.shape[1:]
        out = np.full(shape, value, dtype=self.vals.dtype)
        mask = np.zeros((len(self), length), dtype=bool)
        for i in range(len(self)):
            w = self.widths[i]
            out[i, :w] = self.vals[self.starts[i]:self.ends[i]]
            mask[i, :w] = True
        return out, mask


if _HAVE_JAX:
    from flax import struct

    @struct.dataclass
    class _RaggedJax:
        """Device-side ragged (a flax pytree): packed ``vals`` + ``widths`` with
        derived indices — usable inside jit for masked/gather-style access."""
        vals: jax.Array
        widths: jax.Array
        starts: jax.Array
        ends: jax.Array
        inverse: jax.Array

        def __len__(self):
            return self.widths.shape[0]

        def numpyify(self):
            return RaggedNumpy(np.asarray(self.vals), np.asarray(self.widths))


def Ragged(vals, widths):
    """Factory dispatching on storage: numpy → :class:`RaggedNumpy`, jax → the
    device-side pytree (reference ``ragged.py:60-75``)."""
    if _HAVE_JAX and isinstance(vals, jax.Array):
        widths = jnp.asarray(widths)
        ends = jnp.cumsum(widths)
        starts = ends - widths
        indices = jnp.zeros(vals.shape[0], jnp.int32)
        indices = indices.at[starts].add(1, mode='drop')
        inverse = jnp.cumsum(indices) - 1
        return _RaggedJax(vals=vals, widths=widths, starts=starts, ends=ends,
                          inverse=inverse)
    return RaggedNumpy(vals, widths)
