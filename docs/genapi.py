"""Generates docs/api.md from the package's docstrings — the counterpart of
the reference's sphinx autodoc pages (``/root/reference/docs/*.rst`` use
``automodule``/``autoclass`` over the same surface).

Run: ``JAX_PLATFORMS=cpu python docs/genapi.py [out.md]`` (default
``docs/api.md``).
"""
import importlib
import inspect
import pathlib
import re
import sys

MODULES = [
    'megastep_tpu.core', 'megastep_tpu.scene', 'megastep_tpu.geometry',
    'megastep_tpu.toys', 'megastep_tpu.floorplans', 'megastep_tpu.cubicasa',
    'megastep_tpu.polygons',
    'megastep_tpu.modules', 'megastep_tpu.spaces', 'megastep_tpu.plotting',
    'megastep_tpu.ragged', 'megastep_tpu.pytree', 'megastep_tpu.constants',
    'megastep_tpu.dotdict', 'megastep_tpu.arrdict',
    'megastep_tpu.ops.geom', 'megastep_tpu.ops.physics',
    'megastep_tpu.ops.render', 'megastep_tpu.ops.fused',
    'megastep_tpu.ops.bake',
    'megastep_tpu.envs.minimal', 'megastep_tpu.envs.explorer',
    'megastep_tpu.envs.deathmatch',
    'megastep_tpu.models.heads', 'megastep_tpu.models.lstm',
    'megastep_tpu.models.transformer', 'megastep_tpu.models.agent',
    'megastep_tpu.demo.learning', 'megastep_tpu.demo.train',
    'megastep_tpu.parallel.mesh', 'megastep_tpu.parallel.host',
    'megastep_tpu.parallel.checkpoint', 'megastep_tpu.parallel.scaling',
    'megastep_tpu.rebar.paths', 'megastep_tpu.rebar.numpy',
    'megastep_tpu.rebar.stats', 'megastep_tpu.rebar.logging',
    'megastep_tpu.rebar.storing', 'megastep_tpu.rebar.widgets',
    'megastep_tpu.rebar.plots', 'megastep_tpu.rebar.recording',
    'megastep_tpu.rebar.parallel', 'megastep_tpu.rebar.processes',
    'megastep_tpu.rebar.queuing', 'megastep_tpu.rebar.fsm',
    'megastep_tpu.rebar.interrupting', 'megastep_tpu.rebar.contextlib',
]


def first_para(doc):
    if not doc:
        return ''
    para = doc.strip().split('\n\n')[0]
    return ' '.join(line.strip() for line in para.splitlines())


def public_members(mod):
    names = getattr(mod, '__all__', None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith('_')]
    out = []
    for n in sorted(names):
        obj = getattr(mod, n, None)
        if inspect.ismodule(obj):
            continue
        if not (inspect.isfunction(obj) or inspect.isclass(obj)):
            continue
        if getattr(obj, '__module__', None) != mod.__name__:
            continue
        out.append((n, obj))
    return out


def signature(obj):
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return '(...)'
    # Default-value reprs can embed memory addresses (flax sentinels etc.) —
    # strip them so regeneration is deterministic across runs/machines.
    return re.sub(r'<([\w.]+)[^>]* at 0x[0-9a-f]+>', r'<\1>', sig)


def render_module(name):
    mod = importlib.import_module(name)
    lines = [f'## `{name}`', '']
    head = first_para(inspect.getdoc(mod))
    if head:
        lines += [head, '']
    for n, obj in public_members(mod):
        kind = 'class' if inspect.isclass(obj) else 'def'
        lines.append(f'- **`{n}{signature(obj)}`** ({kind}) — '
                     f'{first_para(inspect.getdoc(obj)) or "(undocumented)"}')
        if inspect.isclass(obj):
            for mn, mo in sorted(vars(obj).items()):
                if mn.startswith('_') or not inspect.isfunction(mo):
                    continue
                lines.append(f'    - `.{mn}{signature(mo)}` — '
                             f'{first_para(inspect.getdoc(mo)) or ""}')
    lines.append('')
    return lines


def main(path=None):
    out = ['# API reference',
           '',
           '*Generated from docstrings by `docs/genapi.py` — regenerate after '
           'changing public signatures.*',
           '']
    for name in MODULES:
        out += render_module(name)
    if path is None:
        path = pathlib.Path(__file__).parent / 'api.md'
    path = pathlib.Path(path)
    path.write_text('\n'.join(out))
    print(f'wrote {path} ({len(out)} lines)')


if __name__ == '__main__':
    main(*sys.argv[1:2])
