#!/usr/bin/env python
"""Python-API walkthrough (the reference's ``examples/run.ipynb`` flow):
build Parameters interactively, solve, render, export, inspect the traces."""

import numpy as np

import chsimpy_tpu as ct


def main():
    params = ct.Parameters()
    params.N = 256
    params.ntmax = 500
    params.full_sim = True
    params.no_gui = True
    params.update_every = None
    params.precision = 'float64'

    simulator = ct.Simulator(params)
    solution = simulator.solve()

    print(f"computed steps: {solution.computed_steps}")
    print(f"stop reason:    {solution.stop_reason}")
    print(f"E[0]  = {solution.E[0]:.6e}")
    print(f"E[-1] = {solution.E[-1]:.6e}")
    print(f"final SA = {solution.SA[-1]:.4f}")
    print(f"U mean = {np.mean(solution.U):.6f} (mass conservation: "
          f"init {params.XXX})")

    # ensemble example: three perturbed members in one SPMD program
    from chsimpy_tpu import material
    from chsimpy_tpu.ensemble import EnsembleSolver
    A0 = material.A0(params.temp)
    A1 = material.A1(params.temp)
    pairs = np.array([[A0, A1],
                      [A0 * 1.005, A1 * 0.995],
                      [A0 * 0.995, A1 * 1.005]])
    params.kappa_tilde = None  # derive kappa per member via common tangent
    ens = EnsembleSolver(params, pairs)
    ens.prepare()
    sols = ens.solve_or_resume(200)
    for i, s in enumerate(sols):
        print(f"member {i}: A0={s.A0:.4f} E2_max={np.max(s.E2):.3e}")


if __name__ == '__main__':
    main()
