"""Test config: force an 8-device virtual CPU platform before JAX import.

Mirrors the reference's approach of testing multi-GPU code paths without a
cluster (`RealSR/tests/data/test_realesrgan_model.yml` uses `dist: False` on
CPU); here we go further and actually get 8 devices for sharding tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
