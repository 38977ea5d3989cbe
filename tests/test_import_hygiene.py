"""Import hygiene: ``import slamtpu`` must be side-effect-free on devices.

The driver imports ``__graft_entry__`` in an environment whose default JAX
backend can be broken (libtpu client/terminal version skew — see
MULTICHIP_r02.json). Any module-level ``jnp.*`` op initializes that backend at
import time and kills the process before the entry points' own backend
probing/fallback can run.

These tests run in SUBPROCESSES because this test process's conftest pins a
healthy CPU backend (and initializes it), which would mask the bug. This
environment also force-registers its accelerator plugin from sitecustomize and
overrides ``JAX_PLATFORMS``, so "break the backend via env var" is not
reproducible here; instead we assert the load-bearing property directly: after
importing every slamtpu module and ``__graft_entry__``, NO JAX backend has
been initialized.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

# heavy lane: each test spawns a subprocess that re-imports the whole package
# cold (~40 s each); excluded from the default fast lane (pytest.ini)
pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent

_NO_BACKEND_CHECK = """
import jax
from jax._src import xla_bridge
assert not xla_bridge._backends, (
    'importing slamtpu initialized JAX backends: %r' % list(xla_bridge._backends)
)
print('NO_BACKEND_INITIALIZED')
"""


def _run(code: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
        env=env,
    )


def test_import_all_slamtpu_modules_initializes_no_backend():
    r = _run(
        "import importlib, pkgutil\n"
        "import slamtpu\n"
        "for m in pkgutil.walk_packages(slamtpu.__path__, 'slamtpu.'):\n"
        "    importlib.import_module(m.name)\n"
        + _NO_BACKEND_CHECK
    )
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "NO_BACKEND_INITIALIZED" in r.stdout


def test_import_graft_entry_initializes_no_backend():
    r = _run("import __graft_entry__\n" + _NO_BACKEND_CHECK)
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "NO_BACKEND_INITIALIZED" in r.stdout


def test_dryrun_multichip_routes_to_cpu_when_probe_fails():
    """When the subprocess probe reports the default backend broken,
    dryrun_multichip must pin this process to host CPU (with enough virtual
    devices) BEFORE any backend initializes, and complete on the CPU mesh.

    The probe is stubbed to fail: this environment's accelerator is healthy,
    so the real probe cannot be made to fail from the outside, but everything
    downstream of the probe — the jax_platforms/jax_num_cpu_devices rerouting
    and the full dryrun body — runs for real.
    """
    r = _run(
        "import __graft_entry__\n"
        "__graft_entry__._default_backend_ok = lambda: False\n"
        "__graft_entry__.dryrun_multichip(2)\n"
        "import jax\n"
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
        "print('DRYRUN_ON_CPU')\n"
    )
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "DRYRUN_ON_CPU" in r.stdout
