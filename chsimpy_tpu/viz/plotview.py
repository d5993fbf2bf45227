"""Six-panel diagnostics view (reference ``chsimpy/plotview.py:15-267``).

Panels: U map (binary colormap split at threshold), mid-row slice, total
energy E (+delt twin axis in adaptive mode), SA vs t^(1/3), surface energy
E2 with the separation marker, and the U histogram.  Blitting keeps live
updates cheap.  Data arrives as host numpy arrays pushed by the Simulator
once per update_every chunk (one device->host transfer per chunk).
"""

from __future__ import annotations

import numpy as np

from .. import sysinfo


def _setup_matplotlib():
    import matplotlib
    if not sysinfo.is_notebook():
        try:
            import PyQt5  # noqa: F401
            matplotlib.use('Qt5Agg')
        except ImportError:
            pass
    from matplotlib import pyplot as plt
    return plt


class PlotView:
    def __init__(self, N, XXX):
        plt = _setup_matplotlib()
        self._plt = plt
        self.N = N
        self.bins = 15
        self._blit = not sysinfo.is_notebook()
        self.axbackgrounds = None
        self.imode_defaulted = plt.isinteractive()
        plt.ioff()
        self.fig, axs = plt.subplots(
            3, 2, figsize=(10, 9), layout=None,
            gridspec_kw={'wspace': 0.3, 'hspace': 0.33, 'top': 0.95,
                         'right': 0.9, 'bottom': 0.075, 'left': 0.1},
            clear=True)
        self.ax_Umap = axs[0, 0]
        self.ax_Uline = axs[0, 1]
        self.ax_Eline = axs[1, 0]
        self.ax2_Eline = self.ax_Eline.twinx()
        self.ax_SAlines = axs[1, 1]
        self.ax_E2line = axs[2, 0]
        self.ax_Uhist = axs[2, 1]

        self.Umap = self.ax_Umap.imshow(np.zeros((N, N)), cmap='plasma',
                                        aspect='equal')
        self.Uline, = self.ax_Uline.plot(np.arange(N), np.zeros(N))
        self.ax_Uline.set_ylim(0.75, 1)
        self.Eline, = self.ax_Eline.plot([], [])
        self.ElineDelt, = self.ax2_Eline.plot([], [], color='gray')
        self.SAlines = [self.ax_SAlines.plot([], [])[0],
                        self.ax_SAlines.plot([], [])[0]]
        self.ax_SAlines.set_ylim(0.0, 1.0)
        self.SAlegend = None
        self.SAlinesV = None
        self.Uhist = None
        self.E2line, = self.ax_E2line.plot([], [])
        self.E2lineV = None
        self.E2lineText = None
        self.ax2_Eline.get_yaxis().set_visible(False)
        if self.imode_defaulted:
            plt.ion()

    # ------------------------------------------------------------------
    def set_Umap(self, U, threshold, title):
        from matplotlib import colors
        self.ax_Umap.set_title(title)
        if U is None:
            return
        cmap = colors.ListedColormap(['orange', 'yellow'])
        norm = colors.BoundaryNorm([0.0, threshold, 1], cmap.N, clip=True)
        self.Umap.set_cmap(cmap)
        self.Umap.set_norm(norm)
        self.Umap.set_data(np.real(U))

    def set_Uline(self, U, title):
        self.ax_Uline.set_title(title)
        if U is None:
            return
        self.Uline.set_ydata(U[int(self.N / 2) + 1, :])
        self.ax_Uline.grid(True)
        self.ax_Uline.set_ylabel('Concentration')

    def set_Eline(self, E, it_range, title, computed_steps):
        self.ax_Eline.set_title(title)
        self.ax2_Eline.set_ylabel('')
        self.ax2_Eline.get_yaxis().set_visible(False)
        if E is None:
            return
        self.Eline.set_data((it_range[:computed_steps], E[:computed_steps]))
        self.ax_Eline.set_xlim(0, computed_steps)
        self.ax_Eline.set_ylim(np.nanmin(E[:computed_steps]),
                               np.nanmax(E[:computed_steps]))
        self.ax_Eline.grid(True)
        self.ax_Eline.set_xlabel('')
        self.ax_Eline.set_ylabel('Energy E [kJ]')

    def set_Eline_delt(self, E, it_range, delt, title, computed_steps):
        self.ax_Eline.set_title(title)
        if E is None or delt is None:
            return
        self.Eline.set_data((it_range[:computed_steps], E[:computed_steps]))
        self.ax_Eline.set_xlim(0, computed_steps)
        self.ax_Eline.set_ylim(np.nanmin(E[:computed_steps]),
                               np.nanmax(E[:computed_steps]))
        self.ax_Eline.set_ylabel('Energy E [kJ]')
        self.ElineDelt.set_data((it_range[:computed_steps],
                                 delt[:computed_steps]))
        self.ax2_Eline.get_yaxis().set_visible(True)
        self.ax2_Eline.set_xlabel('Step')
        self.ax2_Eline.set_ylabel('delt (gray)')
        self.ax2_Eline.set_xlim(0, computed_steps)
        dmin = np.nanmin(delt[:computed_steps])
        dmax = np.nanmax(delt[:computed_steps])
        if dmax - dmin > 1e-20:
            self.ax2_Eline.set_ylim(dmin, dmax)

    def set_SAlines(self, domtime, SA, title, computed_steps, x2, t0):
        if SA is None or domtime is None:
            return
        self.SAlines[0].set_data((domtime[1:computed_steps],
                                  SA[1:computed_steps]))
        self.SAlines[1].set_data((domtime[1:computed_steps],
                                  1 - SA[1:computed_steps]))
        self.SAlines[0].set_label('low-silica')
        self.SAlines[1].set_label('silica-rich')
        if self.SAlegend is not None:
            self.SAlegend.remove()
        self.SAlegend = self.ax_SAlines.legend()
        self.ax_SAlines.set_xlim(0, x2)
        if t0 > 0:
            if self.SAlinesV is not None:
                self.SAlinesV.remove()
            self.SAlinesV = self.ax_SAlines.axvline(t0 ** (1 / 3),
                                                    color='black')
        self.ax_SAlines.set_title(title)
        self.ax_SAlines.grid(True)
        self.ax_SAlines.set_xlabel('Time ** 1/3')
        self.ax_SAlines.set_ylabel('Concentration Ratio')

    def set_E2line(self, E2, it_range, title, computed_steps, tau0, t0):
        self.ax_E2line.set_title(title)
        if E2 is None:
            return
        e2min = np.nanmin(E2[:computed_steps])
        e2max = np.nanmax(E2[:computed_steps])
        self.E2line.set_data((it_range[:computed_steps],
                              E2[:computed_steps]))
        self.ax_E2line.set_xlim(0, computed_steps)
        self.ax_E2line.set_ylim(e2min, 1.25 * e2max)
        if self.E2lineV is not None:
            self.E2lineV.remove()
        self.E2lineV = self.ax_E2line.axvline(tau0, color='black')
        if self.E2lineText is not None:
            self.E2lineText.remove()
        self.E2lineText = self.ax_E2line.text(
            tau0 - 0.05 * computed_steps, 0.25 * e2max,
            f"{t0:g} s @ {tau0} it", rotation=90)
        self.ax_E2line.set_xlabel('Step')
        self.ax_E2line.set_ylabel('Surface Energy E2 [kJ]')
        self.ax_E2line.grid(True)

    def set_Uhist(self, U, title):
        if U is None:
            return
        self.ax_Uhist.cla()
        try:
            import seaborn as sns
            self.Uhist = sns.histplot(data=np.real(U).ravel(),
                                      stat='probability',
                                      ax=self.ax_Uhist, bins=self.bins)
        except ImportError:
            _, _, patches = self.ax_Uhist.hist(
                np.real(U).ravel(), bins=self.bins, density=False,
                weights=np.full(U.size, 1.0 / U.size))
            self.Uhist = patches
        self.ax_Uhist.set_title(title)
        self.ax_Uhist.set_xlabel('Concentration')

    # ------------------------------------------------------------------
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
        for ax in (self.ax_E2line, self.ax_Eline):
            ax.get_xaxis().set_visible(False)
            ax.get_yaxis().set_visible(False)
        self.ax2_Eline.get_yaxis().set_visible(False)
        self.ax_Uhist.get_xaxis().set_visible(False)
        self.ax_Uhist.get_yaxis().set_visible(False)
        self.ax_SAlines.get_xaxis().set_visible(False)
        self.fig.canvas.draw()
        if self._blit:
            self.axbackgrounds = [
                self.fig.canvas.copy_from_bbox(ax.bbox)
                for ax in (self.ax_Eline, self.ax2_Eline, self.ax_Uhist,
                           self.ax_Uline, self.ax_Umap, self.ax_SAlines,
                           self.ax_E2line)]
            if show:
                self._plt.show(block=False)

    def finish(self):
        for ax in (self.ax_E2line, self.ax_Eline):
            ax.get_xaxis().set_visible(True)
            ax.get_yaxis().set_visible(True)
        self.ax2_Eline.get_yaxis().set_visible(True)
        self.ax_Uhist.get_xaxis().set_visible(True)
        self.ax_Uhist.get_yaxis().set_visible(True)
        self.ax_SAlines.get_xaxis().set_visible(True)

    def show(self, block=False):
        plt = self._plt
        if sysinfo.is_notebook():
            self.fig.canvas.toolbar_visible = False
            self.fig.canvas.header_visible = False
            if block:
                from IPython.display import display
                display(self.fig)
            else:
                plt.show(block=False)
        else:
            plt.show(block=block)
            _pause_without_show(plt, 1e-6)

    def draw(self):
        if self._blit:
            for cached_ax in self.axbackgrounds:
                self.fig.canvas.restore_region(cached_ax)
            self.ax_Eline.draw_artist(self.Eline)
            self.ax2_Eline.draw_artist(self.ElineDelt)
            if self.Uhist is not None and hasattr(self.Uhist, 'patches'):
                for p in self.Uhist.patches:
                    self.ax_Uhist.draw_artist(p)
            self.ax_Uline.draw_artist(self.Uline)
            self.ax_Umap.draw_artist(self.Umap)
            self.ax_SAlines.draw_artist(self.SAlines[0])
            self.ax_SAlines.draw_artist(self.SAlines[1])
            self.ax_E2line.draw_artist(self.E2line)
            if self.E2lineText is not None:
                self.ax_E2line.draw_artist(self.E2lineText)
            for ax in (self.ax_Eline, self.ax2_Eline, self.ax_Uhist,
                       self.ax_Uline, self.ax_Umap, self.ax_SAlines,
                       self.ax_E2line):
                self.fig.canvas.blit(ax.bbox)
        else:
            if sysinfo.is_notebook():
                self.fig.canvas.draw()
            else:
                _pause_without_show(self._plt, 0.001)
        self.fig.canvas.flush_events()

    def render_to(self, fname='diagrams.png'):
        self.fig.savefig(fname, pad_inches=0.5, dpi=100)

    def __del__(self):
        try:
            if not sysinfo.is_notebook():
                self._plt.close(self.fig)
        except Exception:
            pass


def _pause_without_show(plt, interval):
    import time
    manager = plt._pylab_helpers.Gcf.get_active()
    if manager is not None:
        canvas = manager.canvas
        if canvas.figure.stale:
            canvas.draw_idle()
        canvas.start_event_loop(interval)
    else:
        time.sleep(interval)
