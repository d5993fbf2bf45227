"""End-to-end crash/resume: run the UQ experiment with periodic
checkpoints, SIGKILL it mid-flight, --restore, and byte-compare the
results against an uninterrupted control run."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))

if __name__ == '__main__':
    import filecmp
    import signal
    import subprocess
    import tempfile
    import time

    repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    env = dict(_os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=repo)
    args = ['-R', '6', '-P', '2', '--A-source', 'sobol', '-N', '64',
            '--ntmax', '120', '-K', '3e-4', '--no-gui',
            '--export-csv', 'E2', '-f', 'cr']

    def run(d, extra, kill_after=None):
        pr = subprocess.Popen(
            [_sys.executable, '-m', 'chsimpy_tpu.experiment'] + args
            + extra, cwd=d, env=env, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
        if kill_after is None:
            return pr.wait()
        time.sleep(kill_after)
        pr.send_signal(signal.SIGKILL)
        pr.wait()
        return -9

    ctrl = tempfile.mkdtemp(prefix='cr_ctrl_')
    rc = run(ctrl, [])
    assert rc == 0, rc

    crash = tempfile.mkdtemp(prefix='cr_crash_')
    ck = ['--checkpoint-file', 'cr.ckpt', '--checkpoint-every', '30']
    run(crash, ck, kill_after=14.0)   # mid-campaign
    has_ckpt = _os.path.exists(_os.path.join(crash, 'cr.ckpt'))
    print(f"killed at 14s; checkpoint on disk: {has_ckpt}", flush=True)
    rc = run(crash, ck + ['--restore', 'cr.ckpt'])
    assert rc == 0, rc

    same = filecmp.cmp(_os.path.join(ctrl, 'cr-results.csv'),
                       _os.path.join(crash, 'cr-results.csv'),
                       shallow=False)
    rows_ok = all(filecmp.cmp(
        _os.path.join(ctrl, f'cr-run{r}.solution.E2.csv'),
        _os.path.join(crash, f'cr-run{r}.solution.E2.csv'),
        shallow=False) for r in range(6))
    print(f"results.csv byte-identical: {same}; "
          f"per-run E2 byte-identical: {rows_ok}", flush=True)
    assert same and rows_ok
    print("CRASH/RESUME DEMO PASS")
