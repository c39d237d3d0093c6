"""Test configuration: force an 8-virtual-device CPU mesh so sharded code
paths are testable without TPU hardware (SURVEY.md §4.3)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
