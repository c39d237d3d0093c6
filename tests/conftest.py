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

    # The axon sitecustomize registers the TPU backend at interpreter start
    # and pins jax_platforms=axon BEFORE conftest runs, so the env vars
    # above are not enough here; the config update below is (verified:
    # no backend has been instantiated yet at conftest time).
    import jax
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end differential test")
