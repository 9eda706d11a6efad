"""Subprocess tests for the driver entry points in __graft_entry__.py.

These replicate exactly what the external driver does: a fresh Python process
(with the ambient sitecustomize that pre-imports jax and pins JAX_PLATFORMS)
imports __graft_entry__ and calls dryrun_multichip(8) / entry(). Round 1 failed
this gate because importing the package triggered a device computation at import
time (models/gp.py LOG_2_PI) before the entry could pick the CPU platform
(MULTICHIP_r01.json rc=1). This test pins the fix.
"""
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(code: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )


def test_package_import_does_not_initialize_backend():
    # Importing the package must not run any device computation: after import,
    # switching platforms via jax.config must still succeed.
    r = _run(
        "import gaussian_process_optimization_tpu\n"
        "import gaussian_process_optimization_tpu.models.gp\n"
        "import gaussian_process_optimization_tpu.models.tp\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 4)\n"
        "assert jax.device_count() == 4, jax.device_count()\n"
        "print('import-clean ok')\n"
    )
    assert r.returncode == 0, r.stderr
    assert "import-clean ok" in r.stdout


def test_dryrun_multichip_8_as_driver():
    r = _run("import __graft_entry__; __graft_entry__.dryrun_multichip(8)")
    assert r.returncode == 0, r.stderr
    assert "dryrun_multichip(8)" in r.stdout, r.stdout


def test_entry_compiles_on_cpu():
    r = _run(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__\n"
        "fn, args = __graft_entry__.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "jax.block_until_ready(out)\n"
        "print('entry ok')\n"
    )
    assert r.returncode == 0, r.stderr
    assert "entry ok" in r.stdout
