"""The API-reference generator doubles as an import-coverage smoke test:
every documented module must import and expose its public surface."""
import pathlib
import subprocess
import sys


def test_genapi_runs(tmp_path):
    repo = pathlib.Path(__file__).parents[1]
    out = subprocess.run(
        [sys.executable, str(repo / 'docs' / 'genapi.py')],
        capture_output=True, text=True, timeout=600,
        env={'PATH': '/usr/bin:/bin:/usr/local/bin',
             'PYTHONPATH': str(repo),
             'JAX_PLATFORMS': 'cpu',
             'HOME': '/root'})
    assert out.returncode == 0, out.stderr[-2000:]
    api = (repo / 'docs' / 'api.md').read_text()
    # spot anchors: one symbol per layer
    for anchor in ('megastep_tpu.ops.fused', 'observe_grouped',
                   'megastep_tpu.rebar.fsm', 'megastep_tpu.demo.train'):
        assert anchor in api, anchor
