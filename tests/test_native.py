"""Native host runtime (C++): compiler parity, golden IO, RT loop."""

import os
import shutil

import numpy as np
import pytest

from conftest import GOLDEN_DIR, URDF

pytestmark = pytest.mark.skipif(
    shutil.which("cmake") is None, reason="no cmake toolchain"
)


@pytest.fixture(scope="module")
def native():
    from libdwbc_tpu import native as nat

    nat.get_lib(auto_build=True)
    return nat


def test_native_compiler_matches_python(native, tocabi_model, tmp_path):
    out = str(tmp_path / "tocabi.dwbcm")
    native.compile_urdf_native(URDF, out, floating=True)
    m2 = native.load_dwbcm(out)
    m = tocabi_model
    assert m2.body_names == m.body_names
    assert m2.joint_names == m.joint_names
    np.testing.assert_array_equal(m2.parent, m.parent)
    np.testing.assert_array_equal(m2.q_index, m.q_index)
    np.testing.assert_allclose(m2.X_T_rot, m.X_T_rot, atol=1e-15)
    np.testing.assert_allclose(m2.X_T_trans, m.X_T_trans, atol=1e-15)
    np.testing.assert_allclose(m2.axis, m.axis, atol=1e-15)
    np.testing.assert_allclose(m2.mass, m.mass, atol=1e-12)
    np.testing.assert_allclose(m2.com, m.com, atol=1e-14)
    np.testing.assert_allclose(m2.inertia, m.inertia, atol=1e-13)
    assert abs(m2.total_mass - m.total_mass) < 1e-10
    assert set(m2.fixed_frames) == set(m.fixed_frames)


def test_native_model_runs_pipeline(native, tmp_path):
    """A natively compiled model drives the JAX kinematics identically."""
    import jax.numpy as jnp

    from conftest import CASE_Q, full_q
    from libdwbc_tpu.kin.engine import Kinematics
    from libdwbc_tpu.utils.golden import read_golden

    out = str(tmp_path / "tocabi.dwbcm")
    native.compile_urdf_native(URDF, out)
    model = native.load_dwbcm(out)
    kin = Kinematics(model)
    st = kin.update(jnp.array(full_q(CASE_Q[1])), jnp.array(np.zeros(39)))
    g = read_golden(os.path.join(GOLDEN_DIR, "1", "A_inv_"))
    assert np.linalg.norm(np.asarray(st.A_inv) - g) < 1e-11


def test_native_golden_io(native, tmp_path):
    from libdwbc_tpu.utils.golden import read_golden, write_golden

    rng = np.random.default_rng(0)
    M = rng.standard_normal((7, 5))
    p = str(tmp_path / "mat.bin")
    write_golden(p, M)
    # native reader agrees with python writer
    assert native.golden_diff_native(p, M) < 1e-15
    assert native.golden_diff_native(p, M + 1e-3) == pytest.approx(
        np.sqrt(M.size) * 1e-3, rel=1e-6
    )
    # python reader agrees with native-format goldens from the reference tree
    ref = os.path.join(GOLDEN_DIR, "1", "torque_grav_")
    if os.path.exists(ref):
        g = read_golden(ref)
        assert native.golden_diff_native(ref, g) < 1e-15


def test_native_rt_loop(native):
    got = []

    def producer(state, tick):
        state[:] = tick

    def consumer(state, out):
        out[0] = state[0] * 2
        got.append(state[0])

    stats = native.run_rt_loop(
        period_us=2000, ticks=50, state_dim=4, out_dim=1,
        producer=producer, consumer=consumer,
    )
    assert stats["ticks"] > 0
    assert stats["avg_us"] >= 0
    assert len(got) == stats["ticks"]
