"""Test config: force an 8-device virtual CPU platform before JAX import.

Mirrors the reference's approach of testing multi-GPU code paths without a
cluster (`RealSR/tests/data/test_realesrgan_model.yml` uses `dist: False` on
CPU); here we go further and actually get 8 devices for sharding tests.

The ambient environment preloads JAX with the `axon` TPU-tunnel backend from
a sitecustomize hook *at interpreter boot* (PYTHONPATH=/root/.axon_site), so
setting env vars here is too late — jax is already imported and bound to the
tunnel. Unit tests must run on local CPU (fast compiles, 8 virtual devices),
so if the environment isn't already correct we re-exec pytest with a clean
env before any test imports jax.
"""

import os
import sys

_FLAG = "--xla_force_host_platform_device_count=8"


_STUBS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "vmambair_tpu", "_test_stubs",
)


def _env_ok() -> bool:
    return (
        os.environ.get("JAX_PLATFORMS") == "cpu"
        and not os.environ.get("PALLAS_AXON_POOL_IPS")
        and _FLAG in os.environ.get("XLA_FLAGS", "")
        and _STUBS in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    )


if not _env_ok():
    if os.environ.get("_VMAMBAIR_TEST_REEXEC") == "1":
        raise RuntimeError("test env re-exec loop — check tests/conftest.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # empty pool-IPs disables the axon sitecustomize TPU registration
    env["PALLAS_AXON_POOL_IPS"] = ""
    flags = env.get("XLA_FLAGS", "")
    if _FLAG not in flags:
        env["XLA_FLAGS"] = (flags + " " + _FLAG).strip()
    env.setdefault("JAX_ENABLE_X64", "0")
    # persistent compile cache: XLA CPU compiles dominate test wall-time
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    # hide zstandard so the cache uses zlib (the zstandard C extension
    # SIGABRTs in full-suite runs; see vmambair_tpu/_test_stubs/)
    pp = env.get("PYTHONPATH", "")
    if _STUBS not in pp.split(os.pathsep):
        env["PYTHONPATH"] = _STUBS + (os.pathsep + pp if pp else "")
    env["_VMAMBAIR_TEST_REEXEC"] = "1"
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        env,
    )
