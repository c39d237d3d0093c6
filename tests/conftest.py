"""Test configuration: force an 8-virtual-device CPU mesh so sharded code
paths are testable without TPU hardware (SURVEY.md §4.3).

Note: the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel), so we
must overwrite, not setdefault.  Set PROGRAPHMSA_TEST_TPU=1 to run the test
suite against the real chip instead.
"""

import os

if not os.environ.get("PROGRAPHMSA_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
