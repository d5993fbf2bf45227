"""CLI surface tests: full reference flag parity + TPU flags + range checks
and cross-flag errors (reference cli_parser.py:116-171)."""

import pytest

from chsimpy_tpu.cli import CLIParser


def parse(argv):
    return CLIParser().get_parameters(argv)


def test_defaults():
    p = parse([])
    assert p.N == 512
    assert p.ntmax == int(1e6)
    assert p.seed == 2023
    assert p.XXX == 0.875
    assert p.delt == 3e-8
    assert p.generator == 'uniform'
    assert p.precision == 'float64'
    assert p.temp == 923.15


def test_all_sim_flags():
    p = parse(['-N', '256', '-n', '500', '-z', '-a', '--cinit', '0.9',
               '--threshold', '0.88', '--temperature', '900',
               '--A0', '-140', '--A1', '-80', '-K', '0.0003',
               '--dt', '1e-8', '-g', 'sobol', '-s', '7', '-j', '0.05'])
    assert p.N == 256 and p.ntmax == 500
    assert p.full_sim and p.adaptive_time
    assert p.XXX == 0.9 and p.threshold == 0.88
    assert p.temp == 900
    assert p.A0_const == -140 and p.A1_const == -80
    assert p.func_A0(900) == -140  # constant override ignores temperature
    assert p.kappa_tilde == 0.0003
    assert p.delt == 1e-8
    assert p.generator == 'sobol' and p.seed == 7 and p.jitter == 0.05


def test_output_flags():
    p = parse(['--no-gui', '--png', '--yaml', '--export-csv', 'U,E2',
               '-C', '-f', 'myrun', '--update-every', '50',
               '--no-diagrams'])
    assert p.no_gui and p.png and p.yaml
    assert p.export_csv == 'U,E2' and p.compress_csv
    assert p.file_id == 'myrun'
    assert p.update_every == 50 and p.no_diagrams


def test_tpu_flags():
    p = parse(['--precision', 'float32', '--chunk-size', '256',
               '--mesh', '2x4', '--jitter-backend', 'device'])
    assert p.precision == 'float32'
    assert p.chunk_size == 256
    assert p.mesh_shape == (2, 4)
    assert p.jitter_backend == 'device'
    p = parse(['--inv-band', '512', '--otf-coeffs', '1'])
    assert p.inv_band == 512
    assert p.otf_coeffs == 1
    assert parse([]).otf_coeffs is None      # auto


@pytest.mark.parametrize('argv', [
    ['--cinit', '0.5'],           # out of [0.85, 0.95]
    ['--threshold', '0.99'],
    ['--dt', '1e-5'],             # out of [1e-12, 1e-6]
    ['--update-every', '1'],      # must be >= 2
    ['--png-anim'],               # requires --update-every
    ['--export-csv', ''],
    ['-C'],                       # compress without export
    ['--mesh', 'foo'],
    ['--checkpoint-every', '50'],  # requires --checkpoint-file
    ['--otf-coeffs', '2'],         # only 0/1
])
def test_invalid_args_exit(argv):
    with pytest.raises(SystemExit):
        parse(argv)


def test_parameter_file_overrides_cli(tmp_path):
    import chsimpy_tpu as ct
    p0 = ct.Parameters()
    p0.N = 128
    p0.seed = 42
    f = tmp_path / 'params.yaml'
    p0.yaml_export_scalars(str(f))
    # reference semantics: the YAML file overrides CLI values
    p = parse(['-N', '999', '-p', str(f)])
    assert p.N == 128
    assert p.seed == 42


def test_cli_entry_honors_jax_platforms_env(tmp_path):
    """Guardrail for honor_jax_platforms_env (chsimpy_tpu/__init__.py):
    platform plugins (the axon TPU tunnel) override the JAX_PLATFORMS env
    var, so CLI entries re-apply it via the config API.  A CLI run under
    JAX_PLATFORMS=cpu must execute on the CPU backend — run in a subprocess
    so this test owns backend initialization."""
    import os
    import subprocess
    import sys
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    # the subprocess runs from tmp_path; keep the repo importable there
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env['PYTHONPATH'] = repo_root + os.pathsep + env.get('PYTHONPATH', '')
    code = (
        "import sys; sys.argv = ['chsimpy', '-n', '3', '-N', '16',"
        " '--no-gui']\n"
        "from chsimpy_tpu.__main__ import main\n"
        "try:\n"
        "    main()\n"
        "except SystemExit:\n"
        "    pass\n"
        "import jax\n"
        "print('BACKEND=' + jax.default_backend())\n")
    out = subprocess.run([sys.executable, '-c', code], env=env,
                         cwd=str(tmp_path), capture_output=True, text=True,
                         timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'BACKEND=cpu' in out.stdout


def test_ozaki_fwd_pairs_flag():
    """--ozaki-fwd-pairs parses to a tuple and rejects malformed input."""
    import pytest

    from chsimpy_tpu.cli import CLIParser
    p = CLIParser().get_parameters(['--ozaki-fwd-pairs', '2,4'])
    assert p.ozaki_fwd_pairs == (2, 4)
    p = CLIParser().get_parameters([])
    assert p.ozaki_fwd_pairs is None   # resolver supplies the (3, 5) default
    for bad in ('2', 'a,b', '8,9'):
        with pytest.raises(SystemExit):
            CLIParser().get_parameters(['--ozaki-fwd-pairs', bad])
