"""Early pytest plugin: re-exec the test session with a clean CPU env.

Loaded via `addopts = -p vmambair_tpu._pytest_boot` (pytest.ini) so its
`pytest_load_initial_conftests` runs BEFORE the builtin capture plugin
starts fd-level capture (pluggy runs tryfirst hooks LIFO: this plugin
registers after capture, so it fires first). Re-executing from
tests/conftest.py is too late — fd 1 is already redirected into the
capture tempfile and the child's entire output vanishes (exit codes stay
correct, logs are lost).

Why re-exec at all: the ambient environment preloads JAX bound to the
axon TPU tunnel at interpreter boot (PYTHONPATH sitecustomize). Unit tests
need local CPU with 8 virtual devices, chosen before any jax import.
"""

import os
import sys

import pytest

_FLAG = "--xla_force_host_platform_device_count=8"


def _env_ok() -> bool:
    stubs = os.path.join(os.path.dirname(__file__), "_test_stubs")
    return (
        os.environ.get("JAX_PLATFORMS") == "cpu"
        and not os.environ.get("PALLAS_AXON_POOL_IPS")
        and _FLAG in os.environ.get("XLA_FLAGS", "")
        and stubs in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    )


def _clean_env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disables the axon sitecustomize
    flags = env.get("XLA_FLAGS", "")
    if _FLAG not in flags:
        env["XLA_FLAGS"] = (flags + " " + _FLAG).strip()
    env.setdefault("JAX_ENABLE_X64", "0")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    # hide zstandard so JAX's cache uses zlib: the zstandard C extension
    # SIGABRTs in the cache-write path late in full-suite runs (see
    # vmambair_tpu/_test_stubs/zstandard.py)
    stubs = os.path.join(os.path.dirname(__file__), "_test_stubs")
    pp = env.get("PYTHONPATH", "")
    if stubs not in pp.split(os.pathsep):
        env["PYTHONPATH"] = stubs + (os.pathsep + pp if pp else "")
    env["_VMAMBAIR_TEST_REEXEC"] = "1"
    return env


def pytest_addoption(parser):
    # pytest_addoption fires while plugins register, BEFORE the capture
    # plugin's pytest_load_initial_conftests hookwrapper redirects fd 1
    # (a wrapper's before-part precedes every tryfirst impl, so no later
    # hook can re-exec with a usable stdout)
    if _env_ok():
        return
    if os.environ.get("_VMAMBAIR_TEST_REEXEC") == "1":
        raise RuntimeError(
            "test env re-exec loop — check vmambair_tpu/_pytest_boot.py"
        )
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        _clean_env(),
    )
