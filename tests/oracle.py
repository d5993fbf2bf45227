"""Self-contained NumPy/SciPy oracle of the Cahn-Hilliard step.

Implements the governing discrete equations (Ghiass et al. 2016, eq. 12) the
same way the reference does numerically — scipy.fftpack DCTs, float64 — but
as a pure function-style mini-implementation used only to property-test the
JAX engine on small grids.  Kept deliberately minimal: no CLI, no views, no
adaptivity beyond what tests need.
"""

from __future__ import annotations

import numpy as np
import scipy.fftpack as scifft


def derived_constants(N, L, R, temp, B, A0, A1, kappa_tilde, N_A=6.02214076e23):
    Am = (25.13 * 1e6 / N_A) ** (2 / 3) * N_A
    delx = L / (N - 1)
    return dict(Am=Am, Amr=1 / Am, delx=delx, delx2=delx ** 2,
                RT=R * temp, BRT=B * R * temp, A0=A0, A1=A1,
                kappa_tilde=kappa_tilde, L=L, B=B)


def coeff_grids(N, kappa_tilde, delt, delx2):
    e = (2 * np.cos(np.pi * np.arange(N) / (N - 1)) - 2)
    leig = e[:, None] + e[None, :]
    lam1 = delt / delx2
    lam2 = kappa_tilde * lam1 / delx2
    return 1 + lam2 * leig * leig, lam1 * leig


def energies(U, c):
    """Returns (E, E2, PS, Ra) given field U and constants dict c."""
    N = U.shape[0]
    DUx, DUy = np.gradient(U, c['delx'], axis=[0, 1], edge_order=1)
    Du2 = DUx ** 2 + DUy ** 2
    Uinv = 1 - U
    E2 = 0.5 * c['Amr'] * c['kappa_tilde'] * c['L'] ** 2 * np.mean(Du2)
    E = c['Amr'] * c['L'] ** 2 * np.mean(
        c['RT'] * (U * (np.log(U) - c['B']) + Uinv * np.log(Uinv))
        + (c['A0'] + c['A1'] * (Uinv - U)) * U * Uinv) + E2
    Um = U - np.mean(U)
    PS = np.sum(np.abs(Um)) / N ** 2
    mid = U[N // 2 + 1, :]
    Ra = np.mean(np.abs(mid - np.mean(mid)))
    return E, E2, PS, Ra


def chemical_potential(U, c):
    Uinv = 1 - U
    U2inv = Uinv - U
    return (c['RT'] * np.log(U / Uinv) - c['BRT']
            + (c['A0'] + c['A1'] * U2inv) * U2inv
            - 2 * c['A1'] * U * Uinv)


def run(U0, c, delt, nsteps, threshold, M_tilde,
        adaptive=False, delt_base=None, delt_max=None,
        jitter=None, jitter_samples=None, full_sim=True,
        time_limit=None):
    """Run nsteps of the semi-implicit spectral update, returning the
    timedata-like record list and final field.  Early-stop on energy fall
    unless full_sim."""
    N = U0.shape[0]
    U = U0.copy()
    CHeig, Seig = coeff_grids(N, c['kappa_tilde'], delt, c['delx2'])
    hat_U = scifft.dctn(U, norm='ortho')
    tds = 0.0
    rows = []
    E, E2, PS, Ra = energies(U, c)
    rows.append([0, E, E2, 0.0, 0.0, Ra, 0.0, PS, delt])
    E2_first = E2
    E2_prev = E2
    computed = 1
    skip = False
    tau0 = t0 = 0.0
    stop = 'None'
    for it in range(1, nsteps):
        mu = chemical_potential(U, c)
        if adaptive and computed > 500 and computed % 2 == 0:
            x = delt_max / np.sqrt(1 + (500 / 8) * np.abs(mu) ** 2)
            delt_dyn = np.linalg.norm(x, ord=-1)
            delt_new = max(delt_base, delt_dyn)
            if delt_new / delt > 1.15:
                delt = 0.75 * delt + 0.25 * delt_new
            else:
                delt = delt_new
            CHeig, Seig = coeff_grids(N, c['kappa_tilde'], delt, c['delx2'])
        tds += delt
        time_passed = tds / M_tilde
        if time_limit is not None and time_passed > time_limit:
            stop = 'time-limit'
            break
        hat_U = (hat_U + Seig * scifft.dctn(mu, norm='ortho')) / CHeig
        U = scifft.idctn(hat_U, norm='ortho')
        if jitter is not None:
            U = U + jitter * (2 * jitter_samples[it - 1] - 1)
        E, E2, PS, Ra = energies(U, c)
        L2 = np.linalg.norm(mu) / N ** 2
        SA = np.sum(U < threshold) / N ** 2
        rows.append([computed, E, E2, SA, time_passed ** (1 / 3),
                     Ra, L2, PS, delt])
        computed += 1
        if not skip and E2_prev > E2 > E2_first:
            tau0 = computed
            t0 = time_passed
            if not full_sim:
                stop = 'energy'
                break
            skip = True
        E2_prev = E2
    return dict(rows=np.array(rows), U=U, computed_steps=computed,
                tau0=tau0, t0=t0, stop=stop, tds=tds)
