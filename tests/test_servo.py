"""On-device trajectory + PD servo (VERDICT r1 item 3).

The reference computes f* inside the tick (``UpdateTaskSpace``,
/root/reference/src/dwbc.cpp:685-793; ``GetFstarPosPD``/``GetFstarRotPD``,
src/task.cpp:268-339).  Here the servo runs INSIDE CompiledTick /
make_control_loop — a K-tick on-device rollout tracks a trajectory without
any host round trip: quintic position spline, slerp rotation trajectory,
PD(+accel ff), and SetPDerrorRegulation-style error clamping
(src/task.cpp:341-346).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import CASE_FSTAR, CASE_Q, full_q


@pytest.fixture(scope="module")
def swing_setup(tocabi_model):
    """Single-support stance + 3-level hierarchy with a swing-foot 6D task
    (BASELINE config 3 / standard_tocabi_config(swing_task=True))."""
    from libdwbc_tpu.wbc.pipeline import CompiledTick, standard_tocabi_config

    cfg = standard_tocabi_config(
        tocabi_model, both_feet=False, swing_task=True, qp_iters=25
    )
    tick = CompiledTick(tocabi_model, cfg, dtype=jnp.float64)
    return tocabi_model, cfg, tick


def _swing_servo(model, tick, q, qd, target_offset, tf=0.2, dtype=jnp.float64):
    from libdwbc_tpu.wbc.pipeline import make_servo

    st = tick.kin.update(jnp.asarray(q, dtype), jnp.asarray(qd, dtype))
    link = 12  # right foot
    p0 = np.asarray(st.p[link])
    R0 = np.asarray(st.R[link])
    servo = make_servo(
        pos_init=p0, pos_des=p0 + target_offset,
        rot_init=R0, rot_des=R0,
        t=0.0, t0=0.0, tf=tf,
        pos_p=400.0, pos_d=40.0, rot_p=400.0, rot_d=40.0,
        dtype=dtype,
    )
    return servo, p0


def test_servo_fstar_matches_host_primitives(swing_setup):
    """servo_fstar == the host-side traj primitives (quintic + PD) when no
    clamping binds."""
    from libdwbc_tpu.utils.traj import fstar_pos_pd
    from libdwbc_tpu.wbc.pipeline import make_servo, servo_fstar

    rng = np.random.default_rng(0)
    p0 = rng.standard_normal(3)
    pf = p0 + [0.1, 0.0, 0.05]
    cur_p = p0 + 0.01 * rng.standard_normal(3)
    cur_v = 0.1 * rng.standard_normal(3)
    R0 = np.eye(3)

    sp = make_servo(
        pos_init=p0, pos_des=pf, rot_init=R0, rot_des=R0,
        t=0.07, t0=0.0, tf=0.2, pos_p=400.0, pos_d=40.0, dtype=jnp.float64,
    )
    f6 = np.asarray(
        servo_fstar(
            sp, jnp.asarray(cur_p), jnp.asarray(cur_v),
            jnp.asarray(R0), jnp.zeros(3),
        )
    )
    f_ref, _, _ = fstar_pos_pd(
        jnp.asarray(0.07), 0.0, 0.2,
        jnp.asarray(p0), jnp.zeros(3), jnp.asarray(pf), jnp.zeros(3),
        jnp.asarray(cur_p), jnp.asarray(cur_v), 400.0, 40.0, 1.0,
    )
    np.testing.assert_allclose(f6[0:3], np.asarray(f_ref), atol=1e-12)
    # rotation servo at rot_des == rot_init == current → pure zero
    np.testing.assert_allclose(f6[3:6], 0.0, atol=1e-12)


def test_error_clamping_regulates_fstar():
    """SetPDerrorRegulation semantics: with max_p_err set, a large position
    error saturates and f* scales with the clamp, not the raw error."""
    from libdwbc_tpu.wbc.pipeline import make_servo, servo_fstar

    p0 = np.zeros(3)
    sp = make_servo(
        pos_init=p0, pos_des=p0, rot_init=np.eye(3), rot_des=np.eye(3),
        t=1.0, t0=0.0, tf=0.5,  # spline finished: target = pos_des
        pos_p=100.0, pos_d=0.0, max_p_err=0.05, dtype=jnp.float64,
    )
    far = jnp.asarray([10.0, 0.0, 0.0])  # 10 m away
    f6 = np.asarray(
        servo_fstar(sp, far, jnp.zeros(3), jnp.eye(3), jnp.zeros(3))
    )
    np.testing.assert_allclose(f6[0], -100.0 * 0.05, atol=1e-12)


def test_on_device_swing_tracking_rollout(swing_setup):
    """K ticks inside one lax.scan with forward-dynamics transition and NO
    host-side f* updates — the functional gap VERDICT r1 item 3 flagged.
    The realistic controller shape: every level is servo-driven (pelvis 6D
    hold + torso-rotation hold + swing-foot quintic), so the closed loop
    stabilizes the stance while the swing foot tracks."""
    from libdwbc_tpu.wbc.loop import forward_dynamics_transition, make_control_loop
    from libdwbc_tpu.wbc.pipeline import make_servo

    model, cfg, tick = swing_setup
    q = full_q(CASE_Q[1])
    qd = np.zeros(model.ndof)

    st0 = tick.kin.update(jnp.asarray(q, jnp.float64), jnp.asarray(qd, jnp.float64))
    pelvis_servo = make_servo(
        pos_init=np.asarray(st0.p[0]), pos_des=np.asarray(st0.p[0]),
        rot_init=np.asarray(st0.R[0]), rot_des=np.asarray(st0.R[0]),
        tf=0.01, pos_p=400.0, pos_d=40.0, rot_p=400.0, rot_d=40.0,
        dtype=jnp.float64,
    )
    torso_servo = make_servo(
        rot_init=np.asarray(st0.R[15]), rot_des=np.asarray(st0.R[15]),
        tf=0.01, rot_p=100.0, rot_d=20.0, dtype=jnp.float64,
    )
    # 1.5 cm over 150 ms: peak commanded acceleration ~5.8·Δz/tf² ≈ 3.9 m/s²
    offset = np.array([0.0, 0.0, 0.015])
    K, dt = 150, 0.001
    swing_servo, p0 = _swing_servo(model, tick, q, qd, offset, tf=K * dt)

    loop = make_control_loop(
        tick, transition=forward_dynamics_transition(tick), K=K, dt=dt,
        warm_start=True, warm_iters=12, gap_fallback=1e-6,
    )
    servos = ((pelvis_servo,), (torso_servo,), (swing_servo,))
    fstars = (
        jnp.zeros(6, jnp.float64),
        jnp.zeros(3, jnp.float64),
        jnp.zeros(6, jnp.float64),
    )
    res = loop(jnp.asarray(q), jnp.asarray(qd), fstars, servos=servos)
    assert np.isfinite(np.asarray(res.torques)).all()

    st_end = tick.kin.update(res.q_final, res.qdot_final)
    p_end = np.asarray(st_end.p[12])
    # moved meaningfully toward the +1.5 cm target (crude semi-implicit
    # integrator + short horizon: demand >50% progress, not convergence)
    progress = (p_end[2] - p0[2]) / offset[2]
    assert progress > 0.5, f"swing foot tracked only {progress:.1%}"
    # and did not fly off in x/y
    assert abs(p_end[0] - p0[0]) < 0.05
    assert abs(p_end[1] - p0[1]) < 0.05
    # the pelvis servo held the base
    assert abs(np.asarray(st_end.p[0])[2] - np.asarray(st0.p[0])[2]) < 0.03


def test_custom_frame_task_point_in_fused_tick(tocabi_model):
    """(mode, link, point) task specs: the fused tick's custom-frame task
    jacobian matches the facade's frame_point_jacobian path (VERDICT r1
    item 8: custom-frame task points in PipelineConfig.task_specs)."""
    from libdwbc_tpu.wbc import types as T
    from libdwbc_tpu.wbc.pipeline import CompiledTick, PipelineConfig, standard_tocabi_config

    base = standard_tocabi_config(tocabi_model, qp_iters=25)
    pt = (0.05, 0.0, -0.1)
    cfg = PipelineConfig(
        contacts=base.contacts,
        task_specs=(
            ((T.TASK_LINK_6D, 0),),
            ((T.TASK_LINK_POSITION_CUSTOM_FRAME, 15, pt),),
        ),
        torque_limit=base.torque_limit,
        qp_iters=25,
    )
    tick = CompiledTick(tocabi_model, cfg, dtype=jnp.float64)
    q = full_q(CASE_Q[1])
    st = tick.kin.update(jnp.asarray(q), jnp.zeros(39))
    fk = tick._fk_from_state(st)
    J = tick._task_jacobian(st, fk, 1)
    J_ref = tick.kin.frame_point_jacobian(
        fk, 15, jnp.asarray(pt, jnp.float64)
    )[0:3]
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref), atol=1e-14)
    # and the whole tick stays healthy
    f1, _ = CASE_FSTAR[1]
    res = tick(q, np.zeros(39), (f1, np.zeros(3)))
    assert np.isfinite(np.asarray(res.torque_cmd)).all()
    assert float(res.qp_primal_res) < 1e-6
