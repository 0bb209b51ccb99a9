"""Multi-process (multi-host analog) execution: 2 localhost CPU processes
with 4 virtual devices each must reproduce the single-process 8-device fit
exactly (VERDICT r4 missing #1; SURVEY §7 step 6).

This exercises the real multi-host code paths — jax.distributed
initialization, process-aware array placement
(make_array_from_process_local_data in parallel/mesh.py:_put), cross-process
collectives, and process_allgather result assembly (mesh.py:to_host) — with
localhost TCP standing in for DCN."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import atlasqtl_tpu as aq
from atlasqtl_tpu.parallel.mesh import make_mesh
from conftest import simulate_fixture


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _mp_env(n_dev):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("_ATLASQTL_TEST_REEXEC", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_X64"] = "1"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_dev}"
    return env


def _run_pair(tmp_path, mesh_kind, maxit):
    # three attempts with fresh ports: besides the (rare) ephemeral-port
    # race at startup, the 2-process run occasionally wedges in a
    # cross-process collective mid-fit with both workers aligned on the
    # same iteration and every Gloo communicator connected — an
    # XLA-CPU/Gloo transport race, not an application bug (stack dumps in
    # the worker logs; real pods use ICI collectives, not Gloo).  Each
    # worker's faulthandler watchdog bounds a wedged attempt to ~5 min.
    last_err = None
    for attempt in range(3):
        try:
            return _run_pair_once(tmp_path, mesh_kind, attempt, maxit)
        except (AssertionError, subprocess.TimeoutExpired) as e:
            last_err = e
    raise last_err


def _run_pair_once(tmp_path, mesh_kind, attempt, maxit):
    port = _free_port()
    script = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    outs = [str(tmp_path / f"a{attempt}_proc{i}.npz") for i in range(2)]
    # worker output goes to FILES, not pipes: both logs stream to disk
    # concurrently (a PIPE is only drained one process at a time by the
    # sequential communicate() below), and a timed-out attempt leaves a
    # readable trace incl. the worker's faulthandler stack dump
    logf = [str(tmp_path / f"a{attempt}_proc{i}.log") for i in range(2)]
    procs = []
    for i in range(2):
        with open(logf[i], "wb") as fh:
            procs.append(subprocess.Popen(
                [sys.executable, script, str(port), str(i), "2", outs[i],
                 mesh_kind, str(maxit)],
                env=_mp_env(4), stdout=fh, stderr=subprocess.STDOUT))
    try:
        for pr in procs:
            # the workers' own 300 s faulthandler watchdog dumps stacks
            # and exits first; this outer bound is the backstop
            pr.wait(timeout=420)
    except subprocess.TimeoutExpired:
        for p2 in procs:
            p2.kill()
        for p2 in procs:
            p2.wait()
        raise
    for pr, lf in zip(procs, logf):
        with open(lf, errors="replace") as fh:
            lg = fh.read()
        assert pr.returncode == 0, f"mp worker failed:\n{lg[-4000:]}"
    return [dict(np.load(o)) for o in outs]


@pytest.mark.parametrize("mesh_kind", ["1d", "2d"])
def test_two_process_fit_matches_single(tmp_path, mesh_kind):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    # 1d runs to full convergence; 2d caps at 20 iterations — identical
    # placement/collective/allgather coverage (every code path fires
    # every iteration) with ~3x fewer cross-process collectives exposed
    # to the Gloo transport race documented in _run_pair
    maxit = 20 if mesh_kind == "2d" else 1000
    results = _run_pair(tmp_path, mesh_kind, maxit)

    # single-process reference on the same 8 (local) devices
    y, x, _ = simulate_fixture(q=32)
    mesh = make_mesh(jax.devices()[:8],
                     p_shards=2 if mesh_kind == "2d" else 1)
    ref = aq.atlasqtl(y, x, p0=(5, 25), dtype=jnp.float64, verbose=0,
                      user_seed=123, mesh=mesh, maxit=maxit)

    for r in results:
        assert bool(r["converged"]) == ref.converged
        assert int(r["it"]) == ref.it
        np.testing.assert_allclose(float(r["lb"]), ref.lb_opt, rtol=1e-10)
        np.testing.assert_allclose(r["gam"], ref.gam_vb, atol=1e-10)
        np.testing.assert_allclose(r["beta"], ref.beta_vb, atol=1e-10)
        np.testing.assert_allclose(r["theta"], ref.theta_vb, atol=1e-10)
        np.testing.assert_allclose(r["zeta"], ref.zeta_vb, atol=1e-10)
    # both processes assembled identical full results (to_host allgather)
    np.testing.assert_array_equal(results[0]["gam"], results[1]["gam"])
