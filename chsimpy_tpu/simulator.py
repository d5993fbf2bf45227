"""Run orchestrator: parameters -> solver -> views -> export.

Mirrors the reference ``Simulator`` (``chsimpy/simulator.py:11-178``)
including the live-view chunked solve loop (``--update-every``), PNG/anim
rendering and the CSV/YAML export dispatch.  Differences by design:

* no BLAS-thread pinning (XLA owns on-chip parallelism; determinism comes
  from a fixed op set, reference pinned BLAS to 1 thread simulator.py:12-14);
* views import matplotlib lazily so headless/TPU-pod runs never touch a GUI
  toolkit.
"""

from __future__ import annotations

import numpy as np

from . import sysinfo
from .core.solver import Solver
from .io import csvio
from .params import Parameters


class Simulator:
    def __init__(self, params: Parameters = None, U_init=None):
        self.params = params if params is not None else Parameters()
        params = self.params
        if U_init is None and params.Uinit_file is not None:
            U_init = csvio.csv_import_matrix(params.Uinit_file)
        self.solver = Solver(params, U_init)
        self.steps_total = 0
        self.solution_file_id = None
        if self.gui_required():
            if params.no_diagrams:
                from .viz.mapview import MapView
                self.view = MapView(params.N)
            else:
                from .viz.plotview import PlotView
                self.view = PlotView(params.N, params.XXX)
        else:
            self.view = None
            self.params.update_every = None  # nothing to update

    # ------------------------------------------------------------------
    def solve(self):
        self.solution_file_id = sysinfo.get_or_create_file_id(
            self.params.file_id)
        if self.steps_total == 0:
            self.solver.prepare()
        if self.params.update_every is None:
            return self.solver.solve_or_resume(self.params.ntmax)

        # live plotting: run in update_every-sized chunks
        if self.gui_required():
            self.view.prepare(show=self.gui_requested())
        if self.gui_requested():
            self.view.imode_on()
            self.view.show()
        else:
            self.view.imode_off()

        part = 0
        steps_end = self.params.ntmax
        if self.params.time_max is not None and self.params.time_max > 0:
            steps_end = sysinfo.get_int_max_value()
        dsteps = min(steps_end, self.params.update_every)
        assert dsteps > 0
        while ((self.steps_total + dsteps) <= steps_end
               and (self.solver.solution.stop_reason == 'None'
                    or self.params.full_sim is True)
               and self.solver.solution.stop_reason != 'time-limit'):
            self.solver.solve_or_resume(dsteps)
            self._update_view()
            self.view.draw()
            if self.params.png_anim:
                fname = f"{self.solution_file_id}.{part:05d}.png"
                self.view.render_to(fname)
            self.steps_total += dsteps
            part += 1
            diff = steps_end - self.steps_total
            if 0 < diff < dsteps:
                dsteps = diff
            elif diff < 0:
                raise RuntimeError("steps_end or ntmax is too low")

        self.view.finish()
        if self.solver.solution.tau0 == 0:
            self.solver.solution.tau0 = self.solver.solution.computed_steps - 1
            self.solver.solution.t0 = self.solver.time_passed
        return self.solver.solution

    # ------------------------------------------------------------------
    def _update_view(self):
        view = self.view
        params = self.params
        solution = self.solver.solution
        if solution.timedata is None or len(solution.timedata) == 0:
            time_total = (1 / params.M_tilde
                          * (solution.computed_steps - 1) * params.delt)
        else:
            time_total = solution.domtime[-1] ** 3
        view.set_Umap(U=solution.U,
                      threshold=params.threshold,
                      title=f"U <> {params.threshold}, total time = "
                            f"{sysinfo.sec_to_min_if(time_total)}, "
                            f"steps = {solution.computed_steps}")
        if params.no_diagrams:
            return

        view.set_Uline(U=solution.U, title='Slice at U(N/2,:)')
        if params.adaptive_time:
            view.set_Eline_delt(E=solution.E,
                                it_range=solution.it_range,
                                delt=solution.delt,
                                title='Total Energy',
                                computed_steps=solution.computed_steps)
        else:
            view.set_Eline(E=solution.E,
                           it_range=solution.it_range,
                           title='Total Energy',
                           computed_steps=solution.computed_steps)
        view.set_SAlines(domtime=solution.domtime,
                         SA=solution.SA,
                         title=f"Area of high silica "
                               f"(U <> {params.threshold})",
                         computed_steps=solution.computed_steps,
                         x2=time_total ** (1 / 3),
                         t0=solution.t0)
        view.set_E2line(E2=solution.E2,
                        it_range=solution.it_range,
                        title=f"Surf.Energy | Separation t0 = "
                              f"{sysinfo.sec_to_min_if(solution.t0)}",
                        computed_steps=solution.computed_steps,
                        tau0=solution.tau0,
                        t0=solution.t0)
        view.set_Uhist(solution.U, "Solution Histogram")

    # ------------------------------------------------------------------
    def export(self):
        fname_sol = f"{self.solution_file_id}.solution"
        solution = self.solver.solution
        export_csv = self.params.export_csv

        if self.params.yaml:
            solution.yaml_export_scalars(fname=fname_sol + '.yaml')

        if export_csv is not None:
            fext = 'csv.bz2' if self.params.compress_csv else 'csv'
            for member in export_csv.replace(' ', '').split(','):
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

    def export_requested(self) -> bool:
        return (self.params.export_csv is not None or self.params.yaml
                or self.params.png or self.params.png_anim)

    def gui_requested(self) -> bool:
        return self.params.no_gui is False

    def gui_required(self) -> bool:
        return self.params.png or self.params.png_anim or self.gui_requested()
