"""Device vitals: TPU/accelerator memory stats into the metric streams.

TPU-native counterpart of the reference ``rebar/stats/gpu.py`` (nvidia-smi scrape,
``gpu.py:9-52``): JAX exposes per-device memory stats directly, so no subprocess is
needed. Records bytes-in-use / bytes-limit fractions per device, throttled.
"""
import time

from . import writing

_last = -1


def memory(device=0):
    """Records the peak/current memory fraction of one device
    (counterpart of ``gpu.py:9-15``)."""
    import jax
    d = jax.devices()[device]
    ms = d.memory_stats() if hasattr(d, 'memory_stats') else None
    if not ms:
        return
    limit = ms.get('bytes_limit') or ms.get('bytes_reservable_limit') or 1
    writing.max(f'device-memory/alloc/{device}', ms.get('bytes_in_use', 0) / limit)
    if 'peak_bytes_in_use' in ms:
        writing.max(f'device-memory/peak/{device}', ms['peak_bytes_in_use'] / limit)


def vitals(device=None, throttle=0):
    """Records memory vitals for one or all devices, at most once per ``throttle``
    seconds (counterpart of ``gpu.py:35-52``)."""
    global _last
    if time.time() - _last < throttle:
        return
    _last = time.time()

    import jax
    devices = jax.devices()
    if isinstance(device, int):
        devices = [devices[device]]
    for i, d in enumerate(devices):
        ms = d.memory_stats() if hasattr(d, 'memory_stats') else None
        if not ms:
            continue
        limit = ms.get('bytes_limit') or ms.get('bytes_reservable_limit') or 1
        writing.mean(f'device/memory/{i}', 100 * ms.get('bytes_in_use', 0) / limit)
