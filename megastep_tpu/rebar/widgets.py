"""Side-by-side refreshable text panes for notebooks.

Counterpart of the reference ``rebar/widgets.py``: a :class:`Compositor` laying out
ipywidgets Output panes horizontally, each wrapped in a :class:`Output` with a
thread-guarded ``refresh``. Degrades to plain stdout when ipywidgets/IPython is
unavailable.
"""
import threading

WRITE_LOCK = threading.RLock()


class Output:

    def __init__(self, compositor, output, lines):
        self._compositor = compositor
        self._output = output
        self.lines = lines

    def refresh(self, content):
        from IPython.display import clear_output
        with WRITE_LOCK, self._output:
            clear_output(wait=True)
            print(content)

    def close(self):
        self._compositor.remove(self._output)


class StdoutOutput:
    """Console fallback: refresh just prints."""

    lines = 80

    def refresh(self, content):
        print(content)

    def close(self):
        pass


class Compositor:

    def __init__(self, lines=80):
        self.lines = lines
        self._box = None
        try:
            import ipywidgets as widgets
            from IPython.display import display
            from .logging import in_ipython
            if in_ipython():
                self._box = widgets.HBox(
                    layout=widgets.Layout(align_items='stretch'))
                display(self._box)
        except ImportError:
            pass

    def output(self):
        if self._box is None:
            return StdoutOutput()
        import ipywidgets as widgets
        output = widgets.Output(layout=widgets.Layout(width='100%'))
        self._box.children = (*self._box.children, output)
        return Output(self, output, self.lines)

    def remove(self, child):
        child.close()
        self._box.children = tuple(c for c in self._box.children if c != child)

    def clear(self):
        if self._box is None:
            return
        for child in self._box.children:
            self.remove(child)
