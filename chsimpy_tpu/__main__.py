#!/usr/bin/env python
"""``python -m chsimpy_tpu`` — single-run CLI entry point.

Parse flags, run the simulation (with live view unless ``--no-gui``),
render/export artifacts, print the run summary."""

from __future__ import annotations

from . import sysinfo
from .cli import CLIParser
from .simulator import Simulator


def _summarize(simulator: Simulator, solution) -> str:
    t0_human = sysinfo.sec_to_min_if(solution.t0)
    lines = [f"computed_steps = {solution.computed_steps}, "
             f"t0 = {solution.t0:g} s ({t0_human}), "
             f"stop reason = {solution.stop_reason}"]
    if simulator.export_requested():
        lines.append(f"File ID = {simulator.solution_file_id}")
    return "\n".join(lines)


def main():
    import chsimpy_tpu as _ct
    _ct.honor_jax_platforms_env()
    parser = CLIParser()
    parser.print_info()
    params = parser.get_parameters()
    simulator = Simulator(params)
    print(str(params).replace(", '", "\n '"))

    solution = simulator.solve()
    simulator.render()
    simulator.export()
    print(_summarize(simulator, solution))
    if simulator.gui_requested():
        simulator.view.show(block=True)
    parser.parser.exit()


if __name__ == '__main__':
    main()
