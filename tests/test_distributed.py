"""Multi-controller scaffolding: a 1-process 'cluster' on CPU.

A real multi-host run needs multiple machines; what CAN be validated here
is that the env-driven activation path works end to end: the process joins
a (single-member) jax.distributed cluster, the mesh builds from the global
device list, and the CLI still produces byte-identical output.  Runs in a
subprocess so the distributed backend doesn't leak into other tests.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys
sys.path.insert(0, %r)
from prographmsa_tpu.parallel.distributed import maybe_initialize, is_enabled
assert is_enabled()
assert maybe_initialize()
import jax
assert jax.process_count() == 1
assert jax.device_count() >= 1
from prographmsa_tpu.parallel.mesh import make_mesh
mesh = make_mesh(jax.device_count())
assert mesh.size == jax.device_count()
print("DIST-OK")
""" % (REPO,)


def test_single_process_cluster():
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               PROGRAPHMSA_DIST="1",
               PROGRAPHMSA_COORD="127.0.0.1:18476",
               PROGRAPHMSA_NUM_PROCESSES="1",
               PROGRAPHMSA_PROCESS_ID="0")
    out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DIST-OK" in out.stdout


def test_disabled_is_noop():
    from prographmsa_tpu.parallel.distributed import (is_enabled,
                                                      maybe_initialize)
    os.environ.pop("PROGRAPHMSA_DIST", None)
    assert not is_enabled()
    assert maybe_initialize() is False
