"""Simulator orchestration: live-view chunked loop (update_every), PNG
rendering (headless Agg), png-anim series, tau0 fallback, and the
update_every == direct-path trace equivalence given the reference's
per-entry DCT recomputation semantics."""

import matplotlib

matplotlib.use('Agg')

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import chsimpy_tpu as ct  # noqa: E402


def params(**kw):
    p = ct.Parameters()
    p.N = 32
    p.ntmax = 30
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    p.kappa_tilde = 2.98911291966116e-4
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def test_live_view_chunked_loop(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = params(png=True, update_every=10, file_id='live')
    sim = ct.Simulator(p)
    assert sim.view is not None
    sol = sim.solve()
    assert sol.computed_steps == 30
    # tau0 fallback when no energy fall occurred (simulator.py:84-86)
    assert sol.tau0 == sol.computed_steps - 1
    sim.render()
    assert (tmp_path / 'live.png').exists()


def test_png_anim_series(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = params(png=True, png_anim=True, update_every=10, file_id='anim',
               ntmax=20)
    sim = ct.Simulator(p)
    sim.solve()
    assert (tmp_path / 'anim.00000.png').exists()
    assert (tmp_path / 'anim.00001.png').exists()


def test_mapview_no_diagrams(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = params(png=True, update_every=10, no_diagrams=True, file_id='map',
               ntmax=20)
    sim = ct.Simulator(p)
    from chsimpy_tpu.viz.mapview import MapView
    assert isinstance(sim.view, MapView)
    sim.solve()
    sim.render()
    assert (tmp_path / 'map.png').exists()


def test_update_every_matches_direct_with_same_entries():
    """The live-view path recomputes dctn(U) every update_every steps
    (reference solver.py:159); a direct run with explicit resumes at the
    same boundaries must produce identical bits."""
    p1 = params(ntmax=30)
    s1 = ct.Solver(p1)
    s1.prepare()
    for _ in range(3):
        s1.solve_or_resume(10)

    p2 = params(png=True, update_every=10, ntmax=30, file_id='x')
    sim = ct.Simulator(p2)
    sol2 = sim.solve()
    np.testing.assert_array_equal(s1.solution.U, sol2.U)
    np.testing.assert_array_equal(s1.solution.timedata.data(),
                                  sol2.timedata.data())


def test_no_gui_no_view():
    p = params()
    sim = ct.Simulator(p)
    assert sim.view is None
    assert sim.params.update_every is None


def test_gui_required_logic():
    p = params(png=True)
    sim = ct.Simulator(p)
    assert sim.gui_required() and not sim.gui_requested()
    assert sim.export_requested()
