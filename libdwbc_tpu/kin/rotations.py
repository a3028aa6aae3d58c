"""Rotation / quaternion primitives (JAX, batched-friendly)."""

from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """Skew-symmetric matrix of v (…,3) → (…,3,3).

    Matches DWBC::skew (/root/reference/src/math.cpp:9-21).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def quat_to_matrix(q_xyzw):
    """Quaternion (x,y,z,w) to rotation matrix (body→world), unnormalized-safe."""
    x, y, z, w = q_xyzw[..., 0], q_xyzw[..., 1], q_xyzw[..., 2], q_xyzw[..., 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / n, 0.0)
    xs, ys, zs = x * s, y * s, z * s
    wx, wy, wz = w * xs, w * ys, w * zs
    xx, xy, xz = x * xs, x * ys, x * zs
    yy, yz, zz = y * ys, y * zs, z * zs
    r00 = 1.0 - (yy + zz)
    r01 = xy - wz
    r02 = xz + wy
    r10 = xy + wz
    r11 = 1.0 - (xx + zz)
    r12 = yz - wx
    r20 = xz - wy
    r21 = yz + wx
    r22 = 1.0 - (xx + yy)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R):
    """Rotation matrix (body→world) → quaternion (x,y,z,w), w >= 0 branch-free.

    Uses the numerically stable 4-branch construction combined with where().
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # candidate 0: trace
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-30)) / 2.0
    q0 = jnp.stack(
        [(m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0), qw0],
        axis=-1,
    )
    # candidate 1: x major
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-30)) / 2.0
    q1 = jnp.stack(
        [qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1), (m21 - m12) / (4 * qx1)],
        axis=-1,
    )
    # candidate 2: y major
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-30)) / 2.0
    q2 = jnp.stack(
        [(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2), (m02 - m20) / (4 * qy2)],
        axis=-1,
    )
    # candidate 3: z major
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-30)) / 2.0
    q3 = jnp.stack(
        [(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3, (m10 - m01) / (4 * qz3)],
        axis=-1,
    )

    use0 = (tr > 0.0)[..., None]
    usex = ((m00 >= m11) & (m00 >= m22))[..., None]
    usey = (m11 >= m22)[..., None]
    q = jnp.where(use0, q0, jnp.where(usex, q1, jnp.where(usey, q2, q3)))
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def axis_angle_matrix(axis, angle):
    """Rodrigues rotation about `axis` (…,3, unit) by `angle` (…)."""
    a = axis
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    K = skew(a)
    aaT = a[..., :, None] * a[..., None, :]
    eye = jnp.eye(3, dtype=axis.dtype)
    return c * eye + s * K + (1.0 - c) * aaT


def quat_mul(a, b):
    """Hamilton product, (x,y,z,w) layout."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_slerp(q0, q1, t):
    """Spherical interpolation between quaternions (x,y,z,w)."""
    d = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(d[..., None] < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-8
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
    out = w0[..., None] * q0 + w1[..., None] * q1
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def rotation_log(R):
    """Matrix log of a rotation → angle*axis vector (…,3)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    scale = jnp.where(jnp.abs(sin_t) < 1e-8, 0.5, theta / (2.0 * jnp.where(jnp.abs(sin_t) < 1e-8, 1.0, sin_t)))
    return v * scale[..., None]


def get_phi(R_current, R_desired):
    """Orientation error vector, DWBC::GetPhi (/root/reference/src/math.cpp:276-291).

    phi = 0.5 * sum_i v_i × w_i  where v_i/w_i are the column triads.
    """
    s = jnp.cross(R_current[..., :, 0], R_desired[..., :, 0], axis=-1)
    s = s + jnp.cross(R_current[..., :, 1], R_desired[..., :, 1], axis=-1)
    s = s + jnp.cross(R_current[..., :, 2], R_desired[..., :, 2], axis=-1)
    return 0.5 * s
