"""End-to-end serving integration rollout (VERDICT r2 item 8).

Runs examples/serving_demo.py's three phases — batched RL-bridge serving,
on-device servo weight shift (closed loop, warm QPs, gap fallback), and the
contact-hypothesis sweep + single-support swing — asserting feasibility
throughout.  This is the cross-surface integration coverage none of the
unit suites provide.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "examples")
)


def test_serving_demo_end_to_end():
    import serving_demo

    report = serving_demo.main(
        n_ticks=300, n_envs=16, verbose=False, force_cpu=False
    )  # conftest already forced CPU + x64
    assert report["A_batched_bridge"]["tau_absmax"] <= 300.0
    assert report["B_weight_shift"]["pelvis_err_end"] < 0.5 * report[
        "B_weight_shift"]["pelvis_err_start"]
    assert report["B_weight_shift"]["qp_primal_res_max"] < 1e-4
    assert report["C_single_support"]["swing_lift_m"] > 0.008
    assert report["C_single_support"]["qp_primal_res_max"] < 1e-4
