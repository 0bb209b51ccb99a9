import os
import sys

# Tests run on a virtual 8-device CPU mesh; float64 enabled for
# reference-grade precision checks.  If this interpreter was booted with the
# axon TPU plugin pre-registered (sitecustomize), selecting the CPU backend
# post-hoc deadlocks — re-exec once with a scrubbed environment.
if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and not os.environ.get("_ATLASQTL_TEST_REEXEC")):
    import subprocess

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["_ATLASQTL_TEST_REEXEC"] = "1"
    # unique log per run — concurrent suite invocations used to clobber a
    # shared _last_run.log; keep the old name as a symlink to the latest
    _log = os.path.join(os.path.dirname(__file__),
                        f"_last_run_{os.getpid()}.log")
    _latest = os.path.join(os.path.dirname(__file__), "_last_run.log")
    try:
        if os.path.islink(_latest) or os.path.exists(_latest):
            os.remove(_latest)
        os.symlink(os.path.basename(_log), _latest)
    except OSError:
        pass
    with open(_log, "wb") as fh:
        rc = subprocess.call([sys.executable, "-m", "pytest"] + sys.argv[1:],
                             env=env, stdout=fh, stderr=subprocess.STDOUT)
    # replay the inner run's report past pytest's fd capture if possible
    try:
        with open(_log, "rb") as fh:
            os.write(2, fh.read())
    except OSError:
        pass
    os._exit(rc)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_ENABLE_X64", "1")

import numpy as np
import pytest


def simulate_fixture(n=100, p=75, p_act=10, q=20, seed=123, missing_frac=0.0):
    """Simulation mirroring the reference test fixture
    (tests/testthat/main.R:1-41): binomial(2, 0.2) genotype-like X, dense
    effects of the active block on all responses."""
    rng = np.random.default_rng(seed)
    x = rng.binomial(2, 0.2, size=(n, p)).astype(np.float64)
    beta = np.zeros((p, q))
    beta[:p_act] = rng.normal(1.0, 0.5, size=(p_act, q))
    y = x @ beta + rng.normal(size=(n, q))
    if missing_frac > 0:
        mask = rng.uniform(size=y.shape) < missing_frac
        y = y.copy()
        y[mask] = np.nan
    return y, x, p_act


@pytest.fixture
def fixture_small():
    return simulate_fixture()


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules: a full-suite run
    accumulates hundreds of XLA:CPU executables in one process, and the
    compiler segfaulted reproducibly near the end of the suite (inside
    backend_compile_and_load, ~test #88) until caches were dropped.
    Within-module cache reuse is preserved; cross-module reuse is rare."""
    import jax
    jax.clear_caches()
    yield
