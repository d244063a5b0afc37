"""Scaling harness (`parallel.scaling`) on the virtual 8-device CPU mesh.

Pins the BASELINE deliverable's measurement path: `measure()` must run the full
sharded train step with the documented defaults (``n_devices=None`` — round 2
crashed on this) and on an explicit 8-device mesh, and the 1→8 efficiency
arithmetic in `main()` must hold together.
"""
import jax
import pytest

from megastep_tpu.parallel import scaling


def _measure(n_envs, n_devices):
    return scaling.measure(n_envs, n_devices=n_devices, width=32,
                           buffer_size=4, steps=1, res=64, subsample=1)


def test_measure_default_devices():
    # The module docstring's own usage: no --devices flag. Must not crash.
    out = scaling.measure(16, width=32, buffer_size=4, steps=1, res=64,
                          subsample=1)
    assert out['n_devices'] == len(jax.devices()) == 8
    assert out['steps_per_s'] > 0
    assert out['n_envs'] == 16


def test_measure_single_and_full_mesh_efficiency(capsys):
    full = _measure(16, 8)
    single = _measure(2, 1)
    assert full['n_devices'] == 8 and single['n_devices'] == 1
    # main()'s efficiency arithmetic; on a 1-core CPU box the 8 virtual devices
    # timeshare one core, so only sanity-check that the numbers combine.
    eff = full['steps_per_s'] / (single['steps_per_s'] * 8)
    assert eff > 0
    print(f'8-device virtual-mesh efficiency (1-core CPU host): {eff:.1%}')


def test_main_cli(monkeypatch, capsys):
    monkeypatch.setattr(
        scaling, 'measure',
        lambda n_envs, n_devices=None, **kw: dict(
            steps_per_s=1000. if (n_devices or 8) > 1 else 150.,
            n_devices=n_devices or 8, n_envs=n_envs))
    monkeypatch.setattr('sys.argv', ['scaling'])
    scaling.main()
    out = capsys.readouterr().out
    assert 'scaling efficiency' in out
