"""Live training dashboards.

Counterpart of the reference ``rebar/plots.py`` (Bokeh streaming dashboards,
``plots.py:180-233``). Bokeh is optional here; when absent, :func:`review` renders a
static matplotlib grid of the same stats — good enough for headless runs and CI.
"""
import re
from collections import defaultdict

from .stats import Reader


def timegroups(df):
    """Groups stat columns into charts by their ``chart/label`` name split
    (reference ``plots.py:173-177``)."""
    groups = defaultdict(list)
    for col in df.columns:
        m = re.match(r'^(.*?)/(.*)$', col)
        chart = m.group(1) if m else col
        groups[chart].append(col)
    return dict(groups)


def review(run_name=-1, rule='60s', prefix=''):
    """Static matplotlib dashboard of a finished (or running) run's stats."""
    import matplotlib.pyplot as plt
    df = Reader(run_name, prefix).resample(rule)
    groups = timegroups(df)
    if not groups:
        raise ValueError('No stats found for this run')

    n = len(groups)
    cols = min(n, 3)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, squeeze=False, figsize=(6 * cols, 3 * rows))
    axes = axes.flatten()
    for ax, (chart, columns) in zip(axes, groups.items()):
        for col in columns:
            series = df[col].dropna()
            ax.plot(series.index.total_seconds(), series.values,
                    label=col.split('/', 1)[-1])
        ax.set_title(chart)
        ax.legend(fontsize='small')
        ax.set_xlabel('seconds')
    for ax in axes[len(groups):]:
        ax.axis('off')
    fig.tight_layout()
    return fig


def view(run_name=-1, rule='15s'):
    """Live Bokeh dashboard (requires bokeh; reference ``plots.py:180-233``)."""
    try:
        import bokeh.io as bio
        import bokeh.plotting as bop
        import bokeh.layouts as bol
    except ImportError as e:
        raise ImportError(
            'bokeh is not installed; use plots.review() for a static dashboard') from e

    reader = Reader(run_name)
    df = reader.resample(rule)
    groups = timegroups(df)

    figures = []
    for chart, columns in groups.items():
        f = bop.figure(title=chart, width=350, height=250,
                       x_axis_label='seconds')
        for i, col in enumerate(columns):
            series = df[col].dropna()
            f.line(series.index.total_seconds(), series.values,
                   legend_label=col.split('/', 1)[-1])
        figures.append(f)

    grid = bol.gridplot([figures[i:i + 3] for i in range(0, len(figures), 3)])
    bio.show(grid)
    return grid
