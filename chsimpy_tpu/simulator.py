"""Run orchestrator: parameters -> solver -> views -> export.

Covers the reference Simulator's responsibilities
(``chsimpy/simulator.py:11-178``): wiring Parameters into the Solver,
driving either a single device solve or the live-view chunked loop
(``--update-every``), pushing trace data into the views, and dispatching
the YAML/CSV/PNG exports.  Design differences:

* solves run in on-device chunks regardless; the live loop just chooses
  the chunk boundary so each view refresh costs one host round trip;
* no BLAS-thread pinning — XLA owns on-chip parallelism (the reference
  pinned BLAS to one thread for reproducibility, simulator.py:12-14);
* views import matplotlib lazily so headless runs never touch a GUI stack.
"""

from __future__ import annotations

import numpy as np

from . import sysinfo
from .core.solver import Solver
from .io import csvio
from .params import Parameters


def build_view(params: Parameters):
    """View factory: full diagnostics panel unless ``--no-diagrams``."""
    if params.no_diagrams:
        from .viz.mapview import MapView
        return MapView(params.N)
    from .viz.plotview import PlotView
    return PlotView(params.N, params.XXX)


def solution_time_total(params: Parameters, solution) -> float:
    """Total simulated seconds represented by a solution's trace."""
    td = solution.timedata
    if td is None or len(td) == 0:
        return (1 / params.M_tilde
                * (solution.computed_steps - 1) * params.delt)
    return solution.domtime[-1] ** 3


def push_solution_view(view, params: Parameters, solution,
                       time_total: float) -> None:
    """Populate a view's panels from a solution (any source: live solver,
    ensemble member, imported trace)."""
    view.set_Umap(
        U=solution.U, threshold=params.threshold,
        title=f"U <> {params.threshold}, total time = "
              f"{sysinfo.sec_to_min_if(time_total)}, "
              f"steps = {solution.computed_steps}")
    if params.no_diagrams:
        return  # MapView renders only the field

    n = solution.computed_steps
    view.set_Uline(U=solution.U, title='Slice at U(N/2,:)')
    if params.adaptive_time:
        view.set_Eline_delt(E=solution.E, it_range=solution.it_range,
                            delt=solution.delt,
                            title='Total Energy', computed_steps=n)
    else:
        view.set_Eline(E=solution.E, it_range=solution.it_range,
                       title='Total Energy', computed_steps=n)
    view.set_SAlines(
        domtime=solution.domtime, SA=solution.SA,
        title=f"Area of high silica (U <> {params.threshold})",
        computed_steps=n, x2=time_total ** (1 / 3), t0=solution.t0)
    view.set_E2line(
        E2=solution.E2, it_range=solution.it_range,
        title=f"Surf.Energy | Separation t0 = "
              f"{sysinfo.sec_to_min_if(solution.t0)}",
        computed_steps=n, tau0=solution.tau0, t0=solution.t0)
    view.set_Uhist(solution.U, "Solution Histogram")


def render_solution_png(params: Parameters, solution, fname: str) -> None:
    """One-shot offscreen PNG of a finished solution (per-run experiment
    renders, reference ``chsimpy/experiment.py:104-109``)."""
    view = build_view(params)
    view.imode_off()
    push_solution_view(view, params, solution,
                       solution_time_total(params, solution))
    view.render_to(fname)
    try:
        view._plt.close(view.fig)
    except Exception:
        pass


# run-control fields the command line keeps when --restore loads the
# physics parameters from the checkpoint
_RESTORE_CLI_FIELDS = ('ntmax', 'time_max', 'update_every', 'no_gui', 'png',
                       'png_anim', 'yaml', 'export_csv', 'compress_csv',
                       'file_id', 'no_diagrams', 'checkpoint_file',
                       'checkpoint_every', 'restore_file')


class Simulator:
    def __init__(self, params: Parameters = None, U_init=None):
        self.params = params if params is not None else Parameters()
        if self.params.restore_file is not None:
            from .checkpoint import restore_solver
            solver = restore_solver(self.params.restore_file)
            # checkpoint's physics params win; run control from the CLI
            for name in _RESTORE_CLI_FIELDS:
                setattr(solver.params, name, getattr(self.params, name))
            self.params = solver.params
            self.solver = solver
        else:
            if U_init is None and self.params.Uinit_file is not None:
                U_init = csvio.csv_import_matrix(self.params.Uinit_file)
            self.solver = Solver(self.params, U_init)
        self.steps_total = 0
        self.solution_file_id = None
        self.view = self._make_view()
        if self.view is None:
            self.params.update_every = None  # nothing to refresh

    def _make_view(self):
        if not self.gui_required():
            return None
        return build_view(self.params)

    # ------------------------------------------------------------------
    # solving
    # ------------------------------------------------------------------
    def solve(self):
        self.solution_file_id = sysinfo.get_or_create_file_id(
            self.params.file_id)
        if self.steps_total == 0 and not self.solver._prepared:
            # a solver restored from a checkpoint is already prepared —
            # prepare() would reset the trajectory
            self.solver.prepare()
        if self.params.update_every is None:
            sol = self.solver.solve_or_resume(self.params.ntmax)
        else:
            sol = self._live_solve()
        if self.params.checkpoint_file is not None:
            from .checkpoint import save_checkpoint
            save_checkpoint(self.params.checkpoint_file, self.solver)
        return sol

    def _live_solve(self):
        """Chunked solve with a view refresh (and optional PNG frame)
        between chunks."""
        view = self.view
        view.prepare(show=self.gui_requested())
        if self.gui_requested():
            view.imode_on()
            view.show()
        else:
            view.imode_off()

        steps_end = self.params.ntmax
        if self.params.time_max is not None and self.params.time_max > 0:
            steps_end = sysinfo.get_int_max_value()
        dsteps = min(steps_end, self.params.update_every)
        assert dsteps > 0
        part = 0
        while self._live_should_continue(steps_end, dsteps):
            self.solver.solve_or_resume(dsteps)
            self._update_view()
            view.draw()
            if self.params.png_anim:
                view.render_to(f"{self.solution_file_id}.{part:05d}.png")
            self.steps_total += dsteps
            part += 1
            remaining = steps_end - self.steps_total
            if 0 < remaining < dsteps:
                dsteps = remaining
            elif remaining < 0:
                raise RuntimeError("steps_end or ntmax is too low")

        view.finish()
        solution = self.solver.solution
        if solution.tau0 == 0:
            # no energy fall happened: report the last step as tau0
            solution.tau0 = solution.computed_steps - 1
            solution.t0 = self.solver.time_passed
        return solution

    def _live_should_continue(self, steps_end, dsteps) -> bool:
        stop = self.solver.solution.stop_reason
        if stop == 'time-limit':
            return False
        if stop != 'None' and not self.params.full_sim:
            return False
        return (self.steps_total + dsteps) <= steps_end

    # ------------------------------------------------------------------
    # view data
    # ------------------------------------------------------------------
    def _sim_time_total(self, solution) -> float:
        return solution_time_total(self.params, solution)

    def _update_view(self):
        solution = self.solver.solution
        push_solution_view(self.view, self.params, solution,
                           self._sim_time_total(solution))

    # ------------------------------------------------------------------
    # artifacts
    # ------------------------------------------------------------------
    def export(self):
        fname_sol = f"{self.solution_file_id}.solution"
        solution = self.solver.solution

        if self.params.yaml:
            solution.yaml_export_scalars(fname=fname_sol + '.yaml')

        members = self.params.export_csv
        if members is not None:
            fext = 'csv.bz2' if self.params.compress_csv else 'csv'
            for member in members.replace(' ', '').split(','):
                varray = getattr(solution, member, None)
                # accept numpy arrays and device (jax) arrays alike
                if varray is not None and getattr(varray, 'ndim', 0) >= 1:
                    csvio.csv_export_matrix(
                        np.asarray(varray),
                        fname=f"{fname_sol}.{member}.{fext}")
        return fname_sol

    def render(self):
        if self.view is None:
            return
        self.view.imode_off()
        if self.gui_required():
            self._update_view()
        if self.params.png:
            self.view.render_to(f"{self.solution_file_id}.png")
        if self.gui_requested():
            self.view.show(block=sysinfo.is_notebook())
        self.view.imode_default()

    # ------------------------------------------------------------------
    def export_requested(self) -> bool:
        p = self.params
        return bool(p.export_csv is not None or p.yaml or p.png
                    or p.png_anim)

    def gui_requested(self) -> bool:
        return self.params.no_gui is False

    def gui_required(self) -> bool:
        return self.params.png or self.params.png_anim \
            or self.gui_requested()
