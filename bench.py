"""Benchmark: WBC solves/s/chip on the 33-DoF Tocabi (BASELINE.json metric).

Runs the full fused control tick (kinematics → contact space → 2-level HQP
→ contact redistribution) as a batched compiled graph on the available
accelerator, plus a single-lane latency measurement against the reference's
1 kHz control budget.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline: the reference controller is a real-time 1 kHz single-robot
loop (tests/test_thread.cpp:107-112 — one solve per ms). vs_baseline is
therefore solves/s ÷ 1000: how many reference-equivalent 1 kHz control
streams one chip sustains.
"""

import json
import time

import numpy as np


def main():
    import jax

    import __graft_entry__ as ge

    model, tick = ge._model_and_tick(qp_iters=12)
    q, qd, fstars = ge._example_inputs(model)

    B = 1024
    rng = np.random.default_rng(0)
    qs = np.tile(q, (B, 1)).astype(np.float32)
    qs[:, 6:39] += 0.02 * rng.standard_normal((B, 33)).astype(np.float32)
    qds = np.zeros((B, model.ndof), dtype=np.float32)
    fs = tuple(
        np.tile(f, (B, 1)).astype(np.float32)
        + 0.05 * rng.standard_normal((B, f.shape[0])).astype(np.float32)
        for f in fstars
    )

    batched = tick.batched()
    qs_d, qds_d = jax.device_put(qs), jax.device_put(qds)
    fs_d = tuple(jax.device_put(f) for f in fs)

    # compile + warm up
    out = batched(qs_d, qds_d, fs_d)
    jax.block_until_ready(out.torque_cmd)
    assert np.isfinite(np.asarray(out.torque_cmd)).all(), "non-finite torques"

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = batched(qs_d, qds_d, fs_d)
    jax.block_until_ready(out.torque_cmd)
    dt = time.perf_counter() - t0
    solves_per_sec = B * iters / dt

    # single-lane latency (p50/p99) vs the 1 kHz budget
    single = jax.jit(tick._tick_impl)
    sq, sqd = jax.device_put(q), jax.device_put(qd)
    sfs = tuple(jax.device_put(f) for f in fstars)
    r = single(sq, sqd, sfs)
    jax.block_until_ready(r.torque_cmd)
    lat = []
    for _ in range(100):
        t1 = time.perf_counter()
        r = single(sq, sqd, sfs)
        jax.block_until_ready(r.torque_cmd)
        lat.append(time.perf_counter() - t1)
    lat_ms = np.array(lat) * 1e3

    print(
        json.dumps(
            {
                "metric": "wbc_solves_per_sec_per_chip",
                "value": round(solves_per_sec, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_sec / 1000.0, 2),
                "batch": B,
                "single_lane_p50_ms": round(float(np.percentile(lat_ms, 50)), 3),
                "single_lane_p99_ms": round(float(np.percentile(lat_ms, 99)), 3),
                "qp_gap_max": float(np.asarray(out.qp_gap).max()),
                "qp_primal_res_max": float(np.asarray(out.qp_primal_res).max()),
            }
        )
    )


if __name__ == "__main__":
    main()
