"""Centroidal momentum utilities.

Explicit per-link angular-momentum-matrix construction
(``CalcAngularMomentumMatrix``, /root/reference/src/dwbc.cpp:1633-1680) —
the slow-but-explicit cross-check for the fast CMM-from-mass-matrix path
(kin.engine.update) — plus the momentum observer.  All batched.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..kin.engine import KinState, Kinematics
from ..kin.rotations import skew


def virtual_cmm(kin: Kinematics, st: KinState, body_mask=None, about=None):
    """Angular-momentum matrix of an arbitrary body SUBSET about an
    arbitrary point — the tpu-native ``CalcVirtualCMM``
    (/root/reference/src/dwbc.cpp:1682-1709).  The reference builds a
    throw-away RBDL "virtual model" from a link list; here the virtual
    model is just a 0/1 body mask over the compiled model (no model
    surgery, jit-safe, batched).

    body_mask: (nbody,) 0/1 weights (None = all bodies, the full CMM);
    about: (...,3) reference point (None = the whole-body COM).
    Returns the 3×ndof matrix H with H·q̇ = angular momentum of the
    selected bodies about ``about`` (world frame).

    Requires a FULL (un-narrowed) KinState: st.J indexed over all bodies.
    """
    if st.J.shape[-3] != kin.nbody:
        raise ValueError(
            "virtual_cmm needs a full KinState (st.J over all bodies); got a "
            f"narrowed update with {st.J.shape[-3]} of {kin.nbody} body rows. "
            "Re-run kin.update without J_bodies narrowing."
        )
    m = kin.model
    mass = jnp.asarray(m.mass, st.A.dtype)
    if body_mask is not None:
        mass = mass * jnp.asarray(body_mask, st.A.dtype)
    com_l = jnp.asarray(m.com, st.A.dtype)
    inertia_l = jnp.asarray(m.inertia, st.A.dtype)
    if body_mask is not None:
        inertia_l = inertia_l * jnp.asarray(body_mask, st.A.dtype)[:, None, None]

    R = st.R
    Jv = st.J[..., :, 0:3, :]
    Jw = st.J[..., :, 3:6, :]
    x = st.p

    sk_c = skew(com_l)                        # (nbody,3,3)
    # world inertia about body origin + parallel axis pieces
    Iw = jnp.einsum("...bij,bjk,...blk->...bil", R,
                    inertia_l + mass[:, None, None] * sk_c @ jnp.swapaxes(sk_c, -1, -2),
                    R)
    RcRT = jnp.einsum("...bij,bjk,...blk->...bil", R, sk_c, R)   # R skew(c) Rᵀ

    sk_x = skew(x)
    top = (
        jnp.einsum("...bij,...bjn->...bin", Iw + sk_x @ jnp.swapaxes(RcRT, -1, -2) * mass[:, None, None], Jw)
        + jnp.einsum("...bij,...bjn->...bin", RcRT * mass[:, None, None] + mass[:, None, None] * sk_x, Jv)
    )
    bot = (
        jnp.einsum("...bij,...bjn->...bin", jnp.swapaxes(RcRT, -1, -2) * mass[:, None, None], Jw)
        + mass[:, None, None] * Jv
    )
    H_top = jnp.sum(top, axis=-3)
    H_bot = jnp.sum(bot, axis=-3)
    ref = st.com_pos if about is None else jnp.asarray(about, st.A.dtype)
    return H_top - skew(ref) @ H_bot


def angular_momentum_matrix(kin: Kinematics, st: KinState):
    """Explicit 3×ndof angular-momentum matrix about the whole-body COM
    (``CalcAngularMomentumMatrix``, src/dwbc.cpp:1633-1680).

    H(q)·q̇ = angular momentum about the COM (world frame).  Built from
    per-body spatial inertias and jacobians; mathematically equal to the
    bottom rows of st.CMM.
    """
    return virtual_cmm(kin, st)


def momentum(st: KinState):
    """[linear momentum; angular momentum about COM] = CMM · q̇."""
    return jnp.einsum("...in,...n->...i", st.CMM, st.qdot)


def average_velocity(st: KinState):
    """Locked-inertia average 6D velocity of the robot (COM frame)."""
    return jnp.einsum("...in,...n->...i", st.Jcom_total, st.qdot)
