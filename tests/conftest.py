"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host platform
and splitting it into 8 virtual devices (SURVEY.md §4's "what the reference lacks").
Must run before jax is imported anywhere.
"""
import os

# Force, not setdefault: the ambient environment pins JAX_PLATFORMS=axon (the
# TPU tunnel); this suite is CPU-mesh by design.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

# Persistent compilation cache: the suite is compile-bound on CPU; caching makes
# repeat runs fast.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')

import matplotlib
matplotlib.use('Agg')


def pytest_configure(config):
    config.addinivalue_line('markers', 'slow: long-running training tests')
