"""Sharding equivalence: the q-sharded 8-device mesh run must match the
single-device run (same math, collectives inserted by GSPMD)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from atlasqtl_tpu.types import Config
from atlasqtl_tpu.models import global_local as gl
from atlasqtl_tpu.inference import elicitation as elic
from atlasqtl_tpu.io.prepare import prepare_data
from atlasqtl_tpu.ops.sweep import block_gram
from atlasqtl_tpu.parallel import mesh as pmesh

from conftest import simulate_fixture


@pytest.fixture(scope="module")
def setup():
    y, x, _ = simulate_fixture(n=80, p=48, p_act=6, q=32, seed=3)
    dat = prepare_data(y, x, 0.1, 1000)
    p_eff, q_eff = dat.x.shape[1], dat.y.shape[1]
    cfg = Config(dtype=jnp.float64, block_size=16, shr_fac_inv=float(q_eff))
    mesh = pmesh.make_mesh()
    data = gl.build_data(dat.x, dat.y, cfg,
                         q_pad_to=pmesh.q_pad_multiple(mesh))
    hyper_spec = elic.auto_set_hyper(dat.y, p_eff, (3, 10))
    hyper = gl.build_hyper(hyper_spec, data.y.shape[1], cfg)
    init = elic.auto_set_init(dat.y, p_eff, (3, 10), float(q_eff), 42)
    state = gl.build_state(init, data, cfg)
    gram = block_gram(data.x, cfg.block_size)
    return cfg, data, hyper, state, gram, mesh, p_eff, q_eff


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_2d_mesh_p_axis_is_minor():
    """Device layout contract (docs/DESIGN.md §6): the p axis varies
    FASTEST over the device list, so a p-pipeline column is a run of
    consecutive devices — the per-step (n, q_tile) ppermute tiles ride
    intra-host/ICI links and only the small q-axis psums cross hosts."""
    mesh = pmesh.make_mesh(jax.devices()[:8], p_shards=2)
    dev = np.asarray(mesh.devices)
    assert dev.shape == (2, 4)
    for qcol in range(4):
        ids = [d.id for d in dev[:, qcol]]
        assert ids[1] == ids[0] + 1, (qcol, ids)


def test_sharded_iterations_match_single_device(setup):
    cfg, data, hyper, state, gram, mesh, p, q = setup

    # single-device reference trajectory
    s_ref = state
    for _ in range(3):
        s_ref = gl.cavi_iteration(data, hyper, s_ref, gram, 1.0, 1.0,
                                  cfg=cfg, annealed=False)
    lb_ref = float(gl.compute_elbo(data, hyper, s_ref, cfg=cfg))

    # sharded trajectory
    data_s = pmesh.shard_data(data, mesh)
    hyper_s = pmesh.shard_hyper(hyper, mesh)
    s_shard = pmesh.shard_state(state, mesh)
    for _ in range(3):
        s_shard = gl.cavi_iteration(data_s, hyper_s, s_shard, gram, 1.0, 1.0,
                                    cfg=cfg, annealed=False)
    lb_shard = float(gl.compute_elbo(data_s, hyper_s, s_shard, cfg=cfg))

    np.testing.assert_allclose(np.asarray(s_shard.gam)[:p, :q],
                               np.asarray(s_ref.gam)[:p, :q],
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_shard.theta)[:p],
                               np.asarray(s_ref.theta)[:p],
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(lb_shard, lb_ref, rtol=1e-10)


def test_sharded_layout_is_q_partitioned(setup):
    cfg, data, hyper, state, gram, mesh, p, q = setup
    data_s = pmesh.shard_data(data, mesh)
    s = pmesh.shard_state(state, mesh)
    # gam sharded over q across 8 devices
    shard_shapes = {sh.data.shape for sh in s.gam.addressable_shards}
    assert shard_shapes == {(s.gam.shape[0], s.gam.shape[1] // 8)}
    # after one iteration the output preserves the q-sharding
    s2 = gl.cavi_iteration(data_s, hyper, s, gram, 1.0, 1.0, cfg=cfg,
                           annealed=False)
    shard_shapes2 = {sh.data.shape for sh in s2.gam.addressable_shards}
    assert shard_shapes2 == shard_shapes


def test_sharded_e2e_api(setup):
    import atlasqtl_tpu as aq
    y, x, p_act = simulate_fixture(n=80, p=48, p_act=6, q=32, seed=3)
    mesh = pmesh.make_mesh()
    res = aq.atlasqtl(y, x, p0=(3, 10), dtype=jnp.float64, verbose=0,
                      user_seed=42, mesh=mesh)
    assert res.converged
    hot = res.hotspot_sizes()
    assert (hot[:p_act] > 0).any()


@pytest.mark.parametrize("p_shards,q_shards", [(2, 4), (4, 2)])
def test_2d_mesh_matches_single_device(p_shards, q_shards):
    """2-D (p x q) mesh with the pipelined sweep (parallel/pipeline.py):
    q-tiles flow through the p-stages so the exact Gauss-Seidel order is
    preserved — the trajectory must equal the single-device one."""
    y, x, _ = simulate_fixture(n=80, p=60, p_act=6, q=32, seed=3)
    dat = prepare_data(y, x, 0.1, 1000)
    p_eff, q_eff = dat.x.shape[1], dat.y.shape[1]
    cfg = Config(dtype=jnp.float64, block_size=16, shr_fac_inv=float(q_eff))
    cfg_m = Config(dtype=jnp.float64, block_size=16, shr_fac_inv=float(q_eff),
                   q_axis="q", p_axis="p")
    mesh = pmesh.make_mesh(p_shards=p_shards)
    data = gl.build_data(dat.x, dat.y, cfg,
                         q_pad_to=pmesh.q_pad_multiple(mesh),
                         p_shards=p_shards)
    hyper = gl.build_hyper(elic.auto_set_hyper(dat.y, p_eff, (3, 10)),
                           data.y.shape[1], cfg)
    init = elic.auto_set_init(dat.y, p_eff, (3, 10), float(q_eff), 42)
    state = gl.build_state(init, data, cfg)
    gram = block_gram(data.x, cfg.block_size)

    s_ref = state
    for _ in range(3):
        s_ref = gl.cavi_iteration(data, hyper, s_ref, gram, 1.0, 1.0,
                                  cfg=cfg, annealed=False)
    lb_ref = float(gl.compute_elbo(data, hyper, s_ref, cfg=cfg))

    data_s = pmesh.shard_data(data, mesh)
    hyper_s = pmesh.shard_hyper(hyper, mesh)
    s_sh = pmesh.shard_state(state, mesh)
    for _ in range(3):
        s_sh = gl.cavi_iteration(data_s, hyper_s, s_sh, gram, 1.0, 1.0,
                                 cfg=cfg_m, annealed=False, mesh=mesh)
    lb_sh = float(gl.compute_elbo(data_s, hyper_s, s_sh, cfg=cfg_m))

    p_pad, q_pad = data.x.shape[1], data.y.shape[1]
    np.testing.assert_allclose(np.asarray(s_sh.gam), np.asarray(s_ref.gam),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_sh.theta),
                               np.asarray(s_ref.theta), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_sh.fitted),
                               np.asarray(s_ref.fitted), rtol=1e-9,
                               atol=1e-11)
    np.testing.assert_allclose(lb_sh, lb_ref, rtol=1e-10)
    # layout really is 2-D partitioned
    shapes = {sh.data.shape for sh in s_sh.gam.addressable_shards}
    assert shapes == {(p_pad // p_shards, q_pad // q_shards)}


def test_sharded_fused_sweep_matches_single_device():
    """The shard_map-wrapped fused kernel must agree with the single-device
    fused kernel (f32, interpret mode on CPU)."""
    y, x, _ = simulate_fixture(n=80, p=256, p_act=6, q=64, seed=13)
    dat = prepare_data(y, x, 0.1, 1000)
    p_eff, q_eff = dat.x.shape[1], dat.y.shape[1]
    mesh = pmesh.make_mesh()
    cfg = Config(dtype=jnp.float32, block_size=128, shr_fac_inv=float(q_eff),
                 sweep="fused")
    cfg_m = Config(dtype=jnp.float32, block_size=128,
                   shr_fac_inv=float(q_eff), sweep="fused", q_axis="q")
    data = gl.build_data(dat.x, dat.y, cfg, q_pad_to=128 * 8)
    hyper = gl.build_hyper(elic.auto_set_hyper(dat.y, p_eff, (3, 10)),
                           data.y.shape[1], cfg)
    init = elic.auto_set_init(dat.y, p_eff, (3, 10), float(q_eff), 42)
    state = gl.build_state(init, data, cfg)
    gram = block_gram(data.x, 128)

    s_ref = gl.cavi_iteration(data, hyper, state, gram, 1.0, 1.0, cfg=cfg,
                              annealed=False)

    data_s = pmesh.shard_data(data, mesh)
    hyper_s = pmesh.shard_hyper(hyper, mesh)
    state_s = pmesh.shard_state(state, mesh)
    s_shard = gl.cavi_iteration(data_s, hyper_s, state_s, gram, 1.0, 1.0,
                                cfg=cfg_m, annealed=False, mesh=mesh)
    np.testing.assert_allclose(np.asarray(s_shard.gam), np.asarray(s_ref.gam),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(s_shard.theta),
                               np.asarray(s_ref.theta), atol=5e-5)
    np.testing.assert_allclose(np.asarray(s_shard.fitted),
                               np.asarray(s_ref.fitted), atol=5e-3)


@pytest.mark.parametrize("p_shards,q_shards", [(2, 4), (4, 2)])
def test_2d_mesh_exact_missing_matches_single_device(p_shards, q_shards):
    """Exact-missing on the 2-D (p x q) mesh (pipelined masked-F sweep,
    parallel/pipeline.py:pipelined_sweep_missing_2d) equals the
    single-device blocked missing sweep — closes the last
    feature x parallelism hole (VERDICT r2 #4)."""
    y, x, _ = simulate_fixture(n=80, p=60, p_act=6, q=32, seed=3,
                               missing_frac=0.2)
    dat = prepare_data(y, x, 0.1, 1000)
    p_eff, q_eff = dat.x.shape[1], dat.y.shape[1]
    cfg = Config(dtype=jnp.float64, block_size=16, mis_block=8,
                 shr_fac_inv=float(q_eff))
    cfg_m = Config(dtype=jnp.float64, block_size=16, mis_block=8,
                   shr_fac_inv=float(q_eff), q_axis="q", p_axis="p")
    mesh = pmesh.make_mesh(p_shards=p_shards)
    data = gl.build_data(dat.x, dat.y, cfg,
                         q_pad_to=pmesh.q_pad_multiple(mesh),
                         p_shards=p_shards)
    assert data.x_norm_sq is not None    # exact-missing path active
    hyper = gl.build_hyper(elic.auto_set_hyper(dat.y, p_eff, (3, 10)),
                           data.y.shape[1], cfg)
    init = elic.auto_set_init(dat.y, p_eff, (3, 10), float(q_eff), 42)
    state = gl.build_state(init, data, cfg)
    gram = block_gram(data.x, cfg.block_size)

    s_ref = state
    for _ in range(3):
        s_ref = gl.cavi_iteration(data, hyper, s_ref, gram, 1.0, 1.0,
                                  cfg=cfg, annealed=False)
    lb_ref = float(gl.compute_elbo(data, hyper, s_ref, cfg=cfg))

    data_s = pmesh.shard_data(data, mesh)
    hyper_s = pmesh.shard_hyper(hyper, mesh)
    s_sh = pmesh.shard_state(state, mesh)
    for _ in range(3):
        s_sh = gl.cavi_iteration(data_s, hyper_s, s_sh, gram, 1.0, 1.0,
                                 cfg=cfg_m, annealed=False, mesh=mesh)
    lb_sh = float(gl.compute_elbo(data_s, hyper_s, s_sh, cfg=cfg_m))

    np.testing.assert_allclose(np.asarray(s_sh.gam), np.asarray(s_ref.gam),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_sh.theta),
                               np.asarray(s_ref.theta), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_sh.fitted),
                               np.asarray(s_ref.fitted), rtol=1e-9,
                               atol=1e-11)
    np.testing.assert_allclose(lb_sh, lb_ref, rtol=1e-10)


def test_2d_mesh_exact_missing_e2e_api():
    """End-to-end atlasqtl() with missing='exact' on a 2-D mesh (the
    NotImplementedError gate is gone)."""
    import atlasqtl_tpu as aq
    y, x, p_act = simulate_fixture(n=80, p=48, p_act=6, q=32, seed=5,
                                   missing_frac=0.15)
    mesh = pmesh.make_mesh(p_shards=2)
    res = aq.atlasqtl(y, x, p0=(3, 10), dtype=jnp.float64, verbose=0,
                      user_seed=42, mesh=mesh, missing="exact", maxit=600)
    assert res.converged
    assert (res.hotspot_sizes()[:p_act] > 0).any()


def test_2d_mesh_lite_matches_full():
    """The lite 2-D pipeline (beta-carry tiles, fused processor forced to
    interpret mode via sweep='fused') must equal the full-emission 2-D
    pipeline and the single-device fused lite iteration — the pod-scale
    steady-state traffic optimization changes scheduling, not math."""
    y, x, _ = simulate_fixture(n=64, p=300, p_act=6, q=512, seed=3)
    dat = prepare_data(y, x, 0.1, 1000)
    p_eff, q_eff = dat.x.shape[1], dat.y.shape[1]
    cfg1 = Config(dtype=jnp.float32, block_size=128, sweep="fused",
                  shr_fac_inv=float(q_eff))
    cfg_m = Config(dtype=jnp.float32, block_size=128, sweep="fused",
                   shr_fac_inv=float(q_eff), q_axis="q", p_axis="p")
    mesh = pmesh.make_mesh(jax.devices()[:4], p_shards=2)
    data = gl.build_data(dat.x, dat.y, cfg1, q_pad_to=256, p_shards=2)
    hyper = gl.build_hyper(elic.auto_set_hyper(dat.y, p_eff, (3, 10)),
                           data.y.shape[1], cfg1)
    init = elic.auto_set_init(dat.y, p_eff, (3, 10), float(q_eff), 42)
    state0 = gl.build_state(init, data, cfg1)

    gram = block_gram(data.x, cfg1.block_size)
    # single-device fused: one lite then one full iteration
    s_ref = gl.cavi_iteration(data, hyper, state0, gram, 1.0, 1.0,
                              cfg=cfg1, annealed=False, lite=True)
    s_ref = gl.cavi_iteration(data, hyper, s_ref, gram, 1.0, 1.0,
                              cfg=cfg1, annealed=False, lite=False)

    data_s = pmesh.shard_data(data, mesh)
    hyper_s = pmesh.shard_hyper(hyper, mesh)
    s_sh = pmesh.shard_state(state0, mesh)
    s_sh = gl.cavi_iteration(data_s, hyper_s, s_sh, gram, 1.0, 1.0,
                             cfg=cfg_m, annealed=False, mesh=mesh, lite=True)
    s_sh = gl.cavi_iteration(data_s, hyper_s, s_sh, gram, 1.0, 1.0,
                             cfg=cfg_m, annealed=False, mesh=mesh,
                             lite=False)

    np.testing.assert_allclose(np.asarray(s_sh.gam), np.asarray(s_ref.gam),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_sh.fitted),
                               np.asarray(s_ref.fitted), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_sh.theta),
                               np.asarray(s_ref.theta), rtol=2e-4,
                               atol=1e-6)
