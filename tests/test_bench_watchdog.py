"""bench.py watchdog: the driver metric must emit its one JSON line even
when the TPU tunnel is down (it fails by hanging, not erroring)."""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        'bench', os.path.join(REPO, 'bench.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_emit_failure_is_one_json_line(capsys):
    bench = _load_bench()
    bench._emit_failure('tunnel down', {'backend': 'none'})
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec['metric'] == 'ch_steps_per_s_N4096_chip'
    assert rec['value'] == 0.0 and rec['vs_baseline'] == 0.0
    assert rec['error'] == 'tunnel down'


def test_probe_backend_honors_jax_platforms_cpu():
    bench = _load_bench()
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    # the probe spawns its own subprocess; run it under the env the CLI
    # contract guarantees (chsimpy_tpu.honor_jax_platforms_env applies the
    # env var through the config API because the axon plugin overrides it)
    code = ("import sys; sys.path.insert(0, %r); import bench; "
            "ok, info = bench._probe_backend(); print(ok, info)" % REPO)
    r = subprocess.run([sys.executable, '-c', code], env=env,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.strip() == 'True cpu', r.stdout


def test_probe_timeout_reports_hang(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, 'PROBE_TIMEOUT_S', 2)
    # a probe that sleeps forever stands in for the hung tunnel
    monkeypatch.setattr(bench.sys, 'executable', sys.executable)
    real_run = subprocess.run

    def fake_run(cmd, **kw):
        return real_run([sys.executable, '-c', 'import time; time.sleep(60)'],
                        **kw)
    monkeypatch.setattr(bench.subprocess, 'run', fake_run)
    ok, info = bench._probe_backend_once()
    assert not ok
    assert 'hung' in info


def test_probe_retry_loop_survives_transient_outage(monkeypatch, capsys):
    """The round-2 failure mode: one failed probe must NOT zero the round.
    The retry loop keeps probing inside its budget and succeeds when the
    tunnel comes back; when it never does, the failure detail records the
    attempt count so an outage is distinguishable from a code bug."""
    bench = _load_bench()
    monkeypatch.setattr(bench, 'PROBE_TIMEOUT_S', 1)
    monkeypatch.setattr(bench, 'PROBE_RETRY_SLEEP_S', 0.01)
    monkeypatch.setattr(bench, 'PROBE_BUDGET_S', 30)

    calls = {'n': 0}

    def flapping_probe():
        calls['n'] += 1
        if calls['n'] < 3:
            return False, 'probe hung (tunnel down)'
        return True, 'tpu'
    monkeypatch.setattr(bench, '_probe_backend_once', flapping_probe)
    ok, info = bench._probe_backend()
    assert ok and calls['n'] == 3

    # permanent outage: budget exhausted, attempts recorded
    calls['n'] = 0
    monkeypatch.setattr(bench, '_probe_backend_once',
                        lambda: (False, 'probe hung (tunnel down)'))
    monkeypatch.setattr(bench, 'PROBE_BUDGET_S', 0.05)
    ok, info = bench._probe_backend()
    assert not ok
    assert 'probes over' in info


def test_chip_mutex_acquire_release_and_stale_break(tmp_path, monkeypatch):
    """The atomic chip mutex: mkdir-acquire, owner-tagged release, and
    crash-leftover breaking (dead holder pid)."""
    bench = _load_bench()
    monkeypatch.setattr(bench, 'CHIP_LOCK_DIR', str(tmp_path / 'chip.lock.d'))

    assert bench._acquire_chip_mutex(1)
    assert bench._mutex_owner() == ('bench', os.getpid())
    bench._release_chip_mutex()
    assert bench._mutex_owner() is None

    # held by a live foreign pid: acquisition times out, no takeover
    os.mkdir(bench.CHIP_LOCK_DIR)
    with open(os.path.join(bench.CHIP_LOCK_DIR, 'owner'), 'w') as f:
        f.write('battery 1')  # pid 1 is alive
    assert not bench._acquire_chip_mutex(0.05)
    assert bench._mutex_owner() == ('battery', 1)
    # _release only removes our own mutex
    bench._release_chip_mutex()
    assert bench._mutex_owner() == ('battery', 1)

    # dead holder pid = crash leftover: broken and re-acquired
    with open(os.path.join(bench.CHIP_LOCK_DIR, 'owner'), 'w') as f:
        f.write('battery 999999999')
    assert bench._acquire_chip_mutex(1)
    assert bench._mutex_owner() == ('bench', os.getpid())
    bench._release_chip_mutex()


def test_salvage_scopes_to_latest_battery_session(tmp_path, monkeypatch):
    """A stale positive bench line from a PREVIOUS battery session must
    never be re-emitted as the current round's metric; a positive line
    from the most recent session is salvaged with provenance."""
    bench = _load_bench()
    log = tmp_path / 'capture_r3.log'
    monkeypatch.setattr(bench, 'CAPTURE_LOG', str(log))

    old = ('{"metric": "ch_steps_per_s_N4096_chip", "value": 42.0, '
           '"unit": "steps/s", "vs_baseline": 302.8, "detail": {}}')
    log.write_text('== r3 capture battery 2026-08-16T01:00:00Z ==\n'
                   + old + '\n'
                   '== r3 capture battery (current) ==\n'
                   '--- python bench.py ---\n')
    assert bench._salvage_battery_bench() is None

    fresh = ('{"metric": "ch_steps_per_s_N4096_chip", "value": 171.2, '
             '"unit": "steps/s", "vs_baseline": 1234.3, "detail": {}}')
    with open(log, 'a') as f:
        f.write(fresh + '\n')
    rec = bench._salvage_battery_bench()
    assert rec is not None and rec['value'] == 171.2
    assert 'most recent battery session' in rec['detail']['source']
