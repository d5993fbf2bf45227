"""Minimal single-axes U map view (reference ``chsimpy/mapview.py:13-109``,
used with ``--no-diagrams``)."""

from __future__ import annotations

import numpy as np

from .. import sysinfo
from .plotview import _pause_without_show, _setup_matplotlib


class MapView:
    def __init__(self, N):
        plt = _setup_matplotlib()
        self._plt = plt
        self.N = N
        self._blit = not sysinfo.is_notebook()
        self.axbackgrounds = None
        self.imode_defaulted = plt.isinteractive()
        plt.ioff()
        self.fig, axs = plt.subplots(
            1, 1, figsize=(4, 4), layout=None,
            gridspec_kw={'wspace': 0., 'hspace': 0., 'top': 1, 'right': 1,
                         'bottom': 0., 'left': 0.},
            clear=True)
        self.ax_Umap = axs
        self.Umap = self.ax_Umap.imshow(np.zeros((N, N)), cmap='plasma',
                                        aspect='equal', vmin=0.75, vmax=1.0)
        self.ax_Umap.axis('off')
        self.title = None
        if self.imode_defaulted:
            plt.ion()

    def set_Umap(self, U, threshold, title):
        from matplotlib import colors
        self.ax_Umap.set_title('')
        if U is None:
            return
        cmap = colors.LinearSegmentedColormap.from_list(
            'mylist', ['orange', 'yellow'], N=25)
        self.Umap.set_cmap(cmap)
        self.Umap.set_clim(vmin=np.min(U), vmax=np.max(U))
        self.Umap.set_data(np.real(U))
        self.title = title

    def imode_on(self):
        self._plt.ion()

    def imode_off(self):
        self._plt.ioff()

    def imode_default(self):
        if self.imode_defaulted:
            self.imode_on()
        else:
            self.imode_off()

    def prepare(self, show=True):
        self.fig.canvas.draw()
        if self._blit:
            self.axbackgrounds = [
                self.fig.canvas.copy_from_bbox(self.ax_Umap.bbox)]
            if show:
                self._plt.show(block=False)

    def finish(self):
        pass

    def show(self, block=False):
        if sysinfo.is_notebook():
            self.fig.canvas.toolbar_visible = False
            self.fig.canvas.header_visible = False
            self._plt.show(block=block)
        else:
            self._plt.show(block=block)
            _pause_without_show(self._plt, 1e-6)

    def draw(self):
        if self._blit:
            for cached_ax in self.axbackgrounds:
                self.fig.canvas.restore_region(cached_ax)
            self.ax_Umap.draw_artist(self.Umap)
            self.fig.canvas.blit(self.ax_Umap.bbox)
        else:
            if sysinfo.is_notebook():
                self.fig.canvas.draw()
            else:
                _pause_without_show(self._plt, 0.001)
        if not sysinfo.is_notebook() and self.title is not None:
            try:
                self.fig.canvas.manager.set_window_title(self.title)
            except Exception:
                pass
        self.fig.canvas.flush_events()

    def render_to(self, fname='map.png'):
        self.fig.savefig(fname, pad_inches=0.5, dpi=100)

    def __del__(self):
        try:
            if not sysinfo.is_notebook():
                self._plt.close(self.fig)
        except Exception:
            pass
