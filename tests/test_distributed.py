"""Two-process jax.distributed test: the multi-host (DCN) path for real.

The reference's emulation ladder tests multi-instance execution without
hardware (sw_emu, README.md:137-146); the single-process 8-virtual-device
tests here are that analogue.  This test goes one rung further: TWO OS
processes with a localhost coordinator — the exact code path of a
multi-host pod (jax.distributed.initialize + a global mesh whose site
axis spans processes + cross-process psum), minus only the physical DCN.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_plf():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=env) for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        res = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert res, f"no RESULT line:\n{out}\n{err}"
        outs.append(res[0])

    # both processes must agree on the psum'd scalars
    assert outs[0] == outs[1], outs

    # cross-check against the single-process golden model
    from plf_tpu.reference import plf_reference
    rng = np.random.default_rng(7)   # same case as the worker
    n, e = 2000, 16
    x1 = (rng.random((n, e)) * 0.99 + 0.01).astype(np.float32)
    x2 = (rng.random((n, e)) * 0.99 + 0.01).astype(np.float32)
    x1[1::5] *= np.float32(1e-8)
    x2[1::5] *= np.float32(1e-8)
    left = rng.random((4, 4, 4)).astype(np.float32)
    right = rng.random((4, 4, 4)).astype(np.float32)
    ev = rng.random((4, 4)).astype(np.float32)
    wgt = rng.integers(1, 4, size=n).astype(np.int32)
    x3, sv, inc_ref = plf_reference(x1.reshape(n, 4, 4),
                                    x2.reshape(n, 4, 4), left, right, ev,
                                    wgt)
    inc = int(outs[0].split("inc=")[1].split()[0])
    assert inc == int(inc_ref), (inc, int(inc_ref))
    chk = float(outs[0].split("chk=")[1])
    np.testing.assert_allclose(chk, float(x3.sum(dtype=np.float64)),
                               rtol=1e-5)
