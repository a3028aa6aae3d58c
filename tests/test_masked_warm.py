"""MaskedTick warm-start + servo + loop support (VERDICT r2 item 3).

The reference keeps one persistent hot-started CQuadraticProgram per QP it
owns (/root/reference/include/dwbc.h:222-228) — including when the contact
set changes.  Round 2 gave only CompiledTick the warm carry; this asserts
the masked/hypothesis path has the same capability: warm ticks at the
serving iteration budget match an independent cold full-budget solve, per
scenario of a mixed contact-mode batch, and make_control_loop drives a
MaskedTick directly.
"""

import numpy as np
import jax.numpy as jnp

import pytest

from conftest import CASE_FSTAR, CASE_Q, full_q

WARM_ITERS = 7


@pytest.fixture(scope="module")
def masked_tick(tocabi_model):
    from libdwbc_tpu.wbc.masked import MaskedTick
    from libdwbc_tpu.wbc.pipeline import standard_tocabi_config

    cfg = standard_tocabi_config(tocabi_model, qp_iters=25)
    return tocabi_model, MaskedTick(tocabi_model, cfg, dtype=jnp.float64)


def test_masked_warm_tick_torque_parity(masked_tick):
    """Chain warm masked ticks over drifting states (mixed contact modes in
    one batch); compare each warm 7-iter torque against a cold 25-iter solve
    at the same state.  Tolerance policy per CLAUDE.md: τ_grav tight,
    τ_task ≤ 2e-3, τ_cmd spread confined to span(NwJw)."""
    model, mt = masked_tick
    f1, f2 = CASE_FSTAR[1]
    B = 2
    fstars = (
        jnp.asarray(np.tile(f1, (B, 1)), jnp.float64),
        jnp.asarray(np.tile(f2, (B, 1)), jnp.float64),
    )
    # scenario 0: double support; scenario 1: left-foot single support
    cmask = jnp.asarray(np.array([[1.0, 1.0], [1.0, 0.0]]), jnp.float64)

    rng = np.random.default_rng(11)
    q = np.tile(full_q(CASE_Q[1]), (B, 1))
    qd = np.zeros((B, model.ndof))

    warm = mt.init_warm((B,))
    res, warm = mt._tick_impl(
        jnp.asarray(q), jnp.asarray(qd), fstars, cmask, warm=warm, qp_iters=25
    )
    worst_task = 0.0
    for k in range(4):
        q = q.copy()
        q[:, 6:39] += 1e-3 * rng.standard_normal((B, 33))
        res_w, warm = mt._tick_impl(
            jnp.asarray(q), jnp.asarray(qd), fstars, cmask, warm=warm,
            qp_iters=WARM_ITERS,
        )
        res_c = mt(q, qd, fstars, cmask)
        assert float(np.asarray(res_w.qp_primal_res).max()) < 1e-8
        assert float(np.asarray(res_w.qp_gap).max()) < 1e-5
        np.testing.assert_allclose(
            np.asarray(res_w.torque_grav), np.asarray(res_c.torque_grav),
            atol=1e-10,
        )
        worst_task = max(worst_task, float(np.abs(
            np.asarray(res_w.torque_task) - np.asarray(res_c.torque_task)
        ).max()))
        # τ_cmd spread must be a pure contact-force redistribution:
        # in span(NwJw) per scenario (flat-face policy, CLAUDE.md)
        from libdwbc_tpu.wbc import masked as mk

        st = mt.kin.update(
            jnp.asarray(q), jnp.asarray(qd),
            J_bodies=mt._J_bodies, points=mt._points,
        )
        J_C = jnp.concatenate(
            [st.J_pts[..., i, :, :] for i in range(len(mt.cfg.contacts))],
            axis=-2,
        )
        row_mask = jnp.repeat(cmask, 6, axis=-1)
        cs = mk.masked_contact_space(
            J_C * row_mask[..., :, None], st.A_inv, row_mask
        )
        for b in range(B):
            d_cmd = (
                np.asarray(res_w.torque_cmd)[b] - np.asarray(res_c.torque_cmd)[b]
            )
            NwJw = np.asarray(cs.NwJw)[b]
            z, *_ = np.linalg.lstsq(NwJw, d_cmd, rcond=None)
            resid = np.abs(NwJw @ z - d_cmd).max()
            # bound = the τ_task tolerance (CLAUDE.md policy ≤ 2e-3): the
            # out-of-span component is exactly the grav+task discrepancy —
            # for single support NwJw ≡ 0 and the residual IS the τ_task
            # warm-vs-cold difference (measured 1.06e-3 at tick 1)
            assert resid < 2e-3, (
                f"tick {k} scen {b}: warm-cold τ spread leaves span(NwJw) "
                f"by {resid:.2e}"
            )
    assert worst_task < 2e-3, f"masked warm-tick τ_task drift {worst_task:.2e}"


def test_masked_loop_with_warm_and_fallback(masked_tick):
    """make_control_loop drives a MaskedTick: warm loop with gap fallback
    stays feasible; cold-budget loop agrees to the flat-face bound."""
    from libdwbc_tpu.wbc.loop import make_control_loop

    model, mt = masked_tick
    f1, f2 = CASE_FSTAR[1]
    B = 2
    fstars = (
        jnp.asarray(np.tile(f1, (B, 1)), jnp.float64),
        jnp.asarray(np.tile(f2, (B, 1)), jnp.float64),
    )
    cmask = jnp.asarray(np.array([[1.0, 1.0], [1.0, 0.0]]), jnp.float64)
    q = jnp.asarray(np.tile(full_q(CASE_Q[1]), (B, 1)))
    qd = jnp.zeros((B, model.ndof), jnp.float64)

    K = 3
    loop_warm = make_control_loop(
        mt, K=K, warm_start=True, warm_iters=WARM_ITERS, gap_fallback=1e-6
    )
    loop_full = make_control_loop(mt, K=K, warm_start=True, warm_iters=25)
    r_w = loop_warm(q, qd, fstars, cmask)
    r_f = loop_full(q, qd, fstars, cmask)
    assert float(np.asarray(r_w.qp_primal_res).max()) < 1e-8
    np.testing.assert_allclose(
        np.asarray(r_w.torques), np.asarray(r_f.torques), atol=5e-2
    )

    # a CompiledTick loop must reject a stray contact_mask
    from libdwbc_tpu.wbc.pipeline import CompiledTick, standard_tocabi_config

    tick = CompiledTick(
        model, standard_tocabi_config(model, qp_iters=8), dtype=jnp.float64
    )
    loop_plain = make_control_loop(tick, K=2)
    with pytest.raises(ValueError, match="contact_mask"):
        loop_plain(q[0], qd[0], (jnp.zeros(6), jnp.zeros(3)), cmask[0])


def test_masked_warm_chain_dual_stays_bounded(tocabi_model):
    """Regression (round 4): on a single-support lane the padded
    redistribution QP has only dead rows, and τ sitting exactly at the
    torque limit (f32 roundoff from the preceding task QP) makes one of
    them ε-infeasible — 0·x ≤ −ε.  The dual then legitimately diverges;
    before the w_cap dual safeguard + warm-clip + diagnostic gating
    (reference guard `if (contact_dof > 0)` with contact_dof =
    total_contact_dof - 6, src/dwbc.cpp:1424) the
    lane's qp_gap reached 1e27→NaN by tick 3 of a warm chain and the
    exploded λ poisoned every later restart."""
    from libdwbc_tpu.wbc.fused import FusedTick
    from libdwbc_tpu.wbc.pipeline import standard_tocabi_config

    model = tocabi_model
    cfg = standard_tocabi_config(model, qp_iters=12)
    ft = FusedTick(model, cfg, dtype=jnp.float32, backend="xla", masked=True)
    B = 6
    rng = np.random.default_rng(0)
    q = full_q(CASE_Q[1]).astype(np.float32)
    qs = np.tile(q, (B, 1))
    qs[:, 6:39] += 0.02 * rng.standard_normal((B, 33)).astype(np.float32)
    qds = np.zeros((B, model.ndof), np.float32)
    fs = tuple(
        np.tile(f, (B, 1)).astype(np.float32) for f in CASE_FSTAR[1]
    )
    masks = np.array([[1, 1], [1, 0], [0, 1]], np.float32)[np.arange(B) % 3]
    warm = ft.init_warm((B,))
    for k in range(8):
        res, warm = ft._tick_impl(
            qs, qds, fs, contact_mask=masks, warm=warm,
            qp_iters=12 if k == 0 else 7,
        )
    g = np.asarray(res.qp_gap)
    # bound: a fixed 7-iter f32 warm tick legitimately parks at ~1e-4
    # normalized complementarity on some lanes (measured 1.2e-4); the
    # serving gate (cfg.qp_fail_gap / gap_fallback) is 1e-3, so assert
    # half that — the regression guarded here read 1e27→NaN by tick 3
    assert np.isfinite(g).all() and g.max() < 5e-4, g
    assert np.isfinite(np.asarray(res.torque_cmd)).all()
    lam_max = max(float(np.asarray(l).max()) for _, l in warm)
    assert lam_max < 1e6, lam_max


def test_mask_flip_warm_recovery(masked_tick):
    """Warm-carry validity across a hypothesis flip (VERDICT r04 item 6):
    in serving, the hypothesis selector changes a lane's contact mask
    between ticks, so the warm primal/dual from the OLD mode seeds the NEW
    mode's QP — the analog of qpOASES hot-start-after-SetContact
    (include/dwbc.h:432-474 resize → re-init).  Chain warm both-feet ticks,
    flip lane 1 to left-single-support mid-chain, keep the warm carry, and
    assert recovery within the warm budget: diagnostics healthy and τ
    matching an independent cold full-budget solve at the warm-parity
    tolerances (τ_grav 1e-10 / τ_task 2e-3, CLAUDE.md policy)."""
    model, mt = masked_tick
    f1, f2 = CASE_FSTAR[1]
    B = 2
    fstars = (
        jnp.asarray(np.tile(f1, (B, 1)), jnp.float64),
        jnp.asarray(np.tile(f2, (B, 1)), jnp.float64),
    )
    q = np.tile(full_q(CASE_Q[1]), (B, 1))
    qd = np.zeros((B, model.ndof))
    cm_both = jnp.asarray(np.array([[1.0, 1.0], [1.0, 1.0]]))
    cm_flip = jnp.asarray(np.array([[1.0, 1.0], [1.0, 0.0]]))

    warm = mt.init_warm((B,))
    res, warm = mt._tick_impl(
        jnp.asarray(q), jnp.asarray(qd), fstars, cm_both, warm=warm,
        qp_iters=25,
    )
    for _ in range(3):
        res, warm = mt._tick_impl(
            jnp.asarray(q), jnp.asarray(qd), fstars, cm_both, warm=warm,
            qp_iters=WARM_ITERS,
        )
    # flip lane 1 both→left; continue at the WARM budget with the stale
    # warm state
    res_f, warm = mt._tick_impl(
        jnp.asarray(q), jnp.asarray(qd), fstars, cm_flip, warm=warm,
        qp_iters=WARM_ITERS,
    )
    assert np.isfinite(np.asarray(res_f.torque_cmd)).all()
    # one more warm tick must be fully recovered; assert against cold
    res_f2, warm = mt._tick_impl(
        jnp.asarray(q), jnp.asarray(qd), fstars, cm_flip, warm=warm,
        qp_iters=WARM_ITERS,
    )
    res_cold = mt(q, qd, fstars, cm_flip)
    for r, tag in ((res_f, "flip tick"), (res_f2, "flip+1 tick")):
        assert float(np.asarray(r.qp_primal_res).max()) < 1e-8, tag
        assert float(np.asarray(r.qp_gap).max()) < 1e-5, tag
        assert not np.asarray(r.qp_error).any(), tag
        np.testing.assert_allclose(
            np.asarray(r.torque_grav), np.asarray(res_cold.torque_grav),
            atol=1e-10, err_msg=tag,
        )
        np.testing.assert_allclose(
            np.asarray(r.torque_task), np.asarray(res_cold.torque_task),
            atol=2e-3, err_msg=tag,
        )
    # the flipped lane's warm duals must not have been poisoned by the
    # old mode's multipliers
    lam_max = max(float(np.asarray(l).max()) for _, l in warm)
    assert lam_max < 1e6, lam_max
