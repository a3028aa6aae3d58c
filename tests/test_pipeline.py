"""Fused-pipeline tests: CompiledTick vs the step-by-step facade, batching,
and the sharded scenario solver."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import CASE_FSTAR, CASE_Q, URDF, full_q, make_standard_robot


@pytest.fixture(scope="module")
def tick64(tocabi_model):
    from libdwbc_tpu.wbc.pipeline import CompiledTick, standard_tocabi_config

    cfg = standard_tocabi_config(tocabi_model, qp_iters=25)
    return CompiledTick(tocabi_model, cfg, dtype=jnp.float64)


def test_fused_matches_stepwise(tick64):
    """The single-graph tick reproduces the facade's stage-by-stage result."""
    rd = make_standard_robot(1)
    rd.CalcContactConstraint()
    rd.CalcGravCompensation()
    rd.CalcTaskControlTorque(True)
    rd.CalcContactRedistribute(True)

    f1, f2 = CASE_FSTAR[1]
    res = tick64(full_q(CASE_Q[1]), np.zeros(39), (f1, f2))
    np.testing.assert_allclose(
        np.asarray(res.torque_grav), np.asarray(rd.torque_grav_), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res.torque_task), np.asarray(rd.torque_task_), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res.torque_contact), np.asarray(rd.torque_contact_), atol=1e-6
    )


def test_batched_consistency(tick64):
    B = 3
    rng = np.random.default_rng(0)
    qs = np.stack([full_q(CASE_Q[1] + 0.01 * rng.standard_normal(33)) for _ in range(B)])
    qds = np.zeros((B, 39))
    f1, f2 = CASE_FSTAR[1]
    fs = (np.tile(f1, (B, 1)), np.tile(f2, (B, 1)))
    batched = tick64.batched()
    out = batched(jnp.array(qs), jnp.array(qds), tuple(jnp.array(f) for f in fs))
    single = tick64(qs[1], qds[1], (f1, f2))
    np.testing.assert_allclose(
        np.asarray(out.torque_cmd[1]), np.asarray(single.torque_cmd), atol=1e-8
    )
    assert np.isfinite(np.asarray(out.torque_cmd)).all()


def test_three_level_hierarchy_single_support(tocabi_model):
    """BASELINE config 3: single support + swing-foot task, 3 levels."""
    from libdwbc_tpu.wbc.pipeline import CompiledTick, standard_tocabi_config

    cfg = standard_tocabi_config(tocabi_model, both_feet=False, swing_task=True, qp_iters=25)
    tick = CompiledTick(tocabi_model, cfg, dtype=jnp.float64)
    f1 = np.array([0.1, 0.2, 0.1, 0.1, -0.1, 0.1])
    f2 = np.array([0.1, -0.1, 0.1])
    f3 = np.array([0.0, 0.0, 0.5, 0.0, 0.0, 0.0])
    res = tick(full_q(CASE_Q[1]), np.zeros(39), (f1, f2, f3))
    tau = np.asarray(res.torque_cmd)
    assert np.isfinite(tau).all()
    assert float(res.qp_primal_res) < 1e-6
    # single foot contact: 10 constraint rows, 0-dim redistribution space
    assert res.contact_force.shape[-1] == 6
    # support-foot normal force carries the robot's weight (reaction frame:
    # fz negative, |fz| ≈ m g ± task-induced transients)
    fz = float(res.contact_force[2])
    assert fz < -400.0


def test_sharded_scenario_grid(tocabi_model):
    from libdwbc_tpu.parallel.mesh import make_mesh, sharded_batch_solver
    from libdwbc_tpu.wbc.pipeline import CompiledTick, standard_tocabi_config

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs multiple (virtual) devices")
    cfg = standard_tocabi_config(tocabi_model, qp_iters=8)
    tick = CompiledTick(tocabi_model, cfg, dtype=jnp.float32)
    mesh = make_mesh(devices=jax.devices())
    step, sh = sharded_batch_solver(tick._tick_impl, mesh)
    H = mesh.shape["hyp"] * 2
    R = mesh.shape["roll"] * 2
    rng = np.random.default_rng(1)
    q = full_q(CASE_Q[1]).astype(np.float32)
    qs = np.tile(q, (H, R, 1))
    qs[..., 6:39] += 0.01 * rng.standard_normal((H, R, 33)).astype(np.float32)
    qds = np.zeros((H, R, 39), dtype=np.float32)
    f1, f2 = CASE_FSTAR[1]
    fs = (
        np.tile(f1, (H, R, 1)).astype(np.float32),
        np.tile(f2, (H, R, 1)).astype(np.float32),
    )
    res, best, best_cost = step(
        jax.device_put(qs, sh),
        jax.device_put(qds, sh),
        tuple(jax.device_put(f, sh) for f in fs),
    )
    assert res.torque_cmd.shape == (H, R, 33)
    assert np.isfinite(float(best_cost))
    assert 0 <= int(best) < H * R


def test_multihost_entry_single_process(tocabi_model):
    """Multi-host entry machinery in the 1-process case: make_global_mesh
    falls back to the local mesh and host_local_scenarios builds the global
    arrays via make_array_from_process_local_data (the code path a real
    2-host launch runs, minus DCN).  benchmarks/scaling.py --distributed
    drives exactly these helpers."""
    from libdwbc_tpu.parallel.mesh import (
        host_local_scenarios, init_distributed, make_global_mesh,
        sharded_batch_solver,
    )
    from libdwbc_tpu.wbc.pipeline import CompiledTick, standard_tocabi_config

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    # no coordinator configured → must be a no-op, not a hang/crash
    assert init_distributed() is False
    mesh = make_global_mesh()
    assert set(mesh.axis_names) == {"hyp", "roll"}

    cfg = standard_tocabi_config(tocabi_model, qp_iters=8)
    tick = CompiledTick(tocabi_model, cfg, dtype=jnp.float32)
    step, _ = sharded_batch_solver(tick._tick_impl, mesh)

    H = mesh.shape["hyp"]
    R = mesh.shape["roll"]
    q = full_q(CASE_Q[1]).astype(np.float32)
    f1, f2 = CASE_FSTAR[1]

    def make_local(hs, rs):
        h, r = hs.stop - hs.start, rs.stop - rs.start
        return (
            np.tile(q, (h, r, 1)),
            np.zeros((h, r, 39), np.float32),
            np.tile(f1, (h, r, 1)).astype(np.float32),
            np.tile(f2, (h, r, 1)).astype(np.float32),
        )

    qs, qds, f0g, f1g = host_local_scenarios(mesh, make_local)
    assert qs.shape == (H, R, 40)
    res, best, best_cost = step(qs, qds, (f0g, f1g))
    assert res.torque_cmd.shape == (H, R, 33)
    assert np.isfinite(float(best_cost))
