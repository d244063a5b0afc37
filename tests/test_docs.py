"""The API-reference generator doubles as an import-coverage smoke test:
every documented module must import and expose its public surface."""
import os
import pathlib
import subprocess
import sys


def test_genapi_runs(tmp_path):
    repo = pathlib.Path(__file__).parents[1]
    out_md = tmp_path / 'api.md'
    env = {k: v for k, v in os.environ.items()
           if k in ('PATH', 'HOME', 'TMPDIR', 'MPLCONFIGDIR')}
    env.update(PYTHONPATH=str(repo), JAX_PLATFORMS='cpu')
    out = subprocess.run(
        [sys.executable, str(repo / 'docs' / 'genapi.py'), str(out_md)],
        capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    api = out_md.read_text()
    # spot anchors: one symbol per layer
    for anchor in ('megastep_tpu.ops.fused', 'observe_grouped',
                   'megastep_tpu.rebar.fsm', 'megastep_tpu.demo.train'):
        assert anchor in api, anchor
    # deterministic: no memory addresses may leak into documented signatures
    assert ' at 0x' not in api


def test_site_builds(tmp_path, monkeypatch):
    """The publish pipeline's build step (docs/build.py, the reference's
    sphinx-build counterpart) renders every nav page to HTML."""
    repo = pathlib.Path(__file__).parents[1]
    sys.path.insert(0, str(repo / 'docs'))
    try:
        import build as docs_build
    finally:
        sys.path.pop(0)
    monkeypatch.setattr(docs_build, 'SITE', tmp_path / '_site')
    docs_build.build()
    for stem, _ in docs_build.PAGES:
        html = (tmp_path / '_site' / f'{stem}.html').read_text()
        assert '<main>' in html and 'megastep_tpu' in html
    index = (tmp_path / '_site' / 'index.html').read_text()
    assert 'class="current"' in index
