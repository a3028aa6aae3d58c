"""Single-lane (batch-1) serving cost: the 1 kHz product lane, measured.

The reference's entire deployment shape is ONE robot at 1 kHz
(/root/reference/tests/test_thread.cpp:107-112 — one solve per ms, p99
budget <1 ms).  The fused Pallas tick's element-leading layout puts the
batch on the (sublane, lane) = (8, 128) tile — the hardware floor for f32
VMEM tiles — so a batch-1 tick computes a full 1024-lane tile with 1023
edge-replicated free riders.  The "narrow tile" question (VERDICT r04 #4)
is therefore settled by measurement, not by a narrower kernel:

* a (1, 128) or (8, 8) block is not a smaller unit of VPU work — f32 VMEM
  tiles are (8, 128) and Mosaic pads narrower blocks to that shape, so the
  per-tile compute time is identical;
* what COULD differ is per-tick overhead outside the tile (kernel launch,
  scan plumbing).  This harness measures exactly that: the single-lane
  per-tick slope vs the batch-1024 per-tick time — same tile work, so any
  gap IS the per-launch overhead, and it bounds what any narrower-tile
  variant could save.

Rows written to benchmarks/single_lane_r{N}.json:
  fused_b1        — batch-1 fused tick, two-chain slope (bench.py method)
  fused_b1024     — batch-1024 (one full tile) per-tick, same chain shape
  loop_b1_fallback — batch-1 persistent on-device control loop
                    (wbc/loop.py::make_control_loop) with warm start AND
                    the per-lane gap_fallback safety net armed: the actual
                    product serving shape for one robot.

Run: python benchmarks/single_lane.py [--out FILE]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "single_lane_r05.json"))
    ap.add_argument("--reps", type=int, default=60)
    ap.add_argument("--warm-iters", type=int, default=7)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    import __graft_entry__ as ge
    import bench

    model, tick = ge._model_and_tick(qp_iters=12)
    q, qd, fstars = ge._example_inputs(model)
    rtt = bench._rtt(jax, jnp)

    os.environ["DWBC_BENCH_SINGLE_REPS"] = str(args.reps)
    rows = {}

    # --- batch-1 fused tick: the two-chain slope estimator from bench.py
    rows["fused_b1"] = bench._single_lane(
        jax, jnp, tick, model, q, qd, fstars, rtt, args.warm_iters
    )

    # --- batch-1024: ONE full (8,128) tile — identical tile work to batch 1
    B, K = 1024, 256
    rng = np.random.default_rng(0)
    qs = np.tile(q, (B, 1)).astype(np.float32)
    qs[:, 6:39] += 0.02 * rng.standard_normal((B, 33)).astype(np.float32)
    qds = np.zeros((B, model.ndof), np.float32)
    fsb = tuple(
        jax.device_put(np.tile(f, (B, 1)).astype(np.float32)) for f in fstars
    )

    @jax.jit
    def chained(q0, qd0, fstars_):
        warm0 = tick.init_warm((q0.shape[0],))
        res0, warm = tick._tick_impl(q0, qd0, fstars_, warm=warm0, qp_iters=12)
        q1 = q0.at[:, 6:39].add(1e-6 * jnp.tanh(res0.torque_cmd))

        def body(carry, _):
            qq, w = carry
            res, w = tick._tick_impl(qq, qd0, fstars_, warm=w,
                                     qp_iters=args.warm_iters)
            return (qq.at[:, 6:39].add(1e-6 * jnp.tanh(res.torque_cmd)), w), None

        (qq, _), _ = jax.lax.scan(body, (q1, warm), None, length=K - 1)
        return qq

    a = (jax.device_put(qs), jax.device_put(qds), fsb)
    float(jnp.sum(chained(*a)))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(chained(*a)))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    per_tick_ms = max(dt - rtt, 1e-9) / K * 1e3
    rows["fused_b1024"] = dict(
        per_tick_ms=round(per_tick_ms, 4),
        chained_ticks=K,
        run_spread=round((max(times) - min(times)) / dt, 4),
    )

    # per-launch overhead bound: single-lane slope minus the full-tile time.
    # Both run the same (8,128)-tile compute, so the difference is scan /
    # launch overhead — the ceiling on what ANY narrower-tile variant could
    # recover (the tile itself cannot shrink below (8,128) for f32).
    rows["per_launch_overhead_ms"] = round(
        rows["fused_b1"]["single_lane_ms_p50"] - per_tick_ms, 4
    )

    # --- batch-1 persistent loop with warm start + gap_fallback armed
    from libdwbc_tpu.wbc.loop import make_control_loop

    def _advance(qq, qqd, res, dt_):
        return qq.at[6:39].add(1e-6 * jnp.tanh(res.torque_cmd)), qqd

    K1, K2 = 128, 512
    loops = {
        k: make_control_loop(tick, transition=_advance, K=k, warm_start=True,
                             warm_iters=args.warm_iters, gap_fallback=1e-3)
        for k in (K1, K2)
    }
    sq = jax.device_put(q.astype(np.float32))
    sqd = jax.device_put(qd.astype(np.float32))
    sfs = tuple(jax.device_put(f.astype(np.float32)) for f in fstars)
    for lp in loops.values():
        float(jnp.sum(lp(sq, sqd, sfs).q_final))
    t1s, t2s = [], []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        lr1 = loops[K1](sq, sqd, sfs)
        float(jnp.sum(lr1.q_final))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        lr2 = loops[K2](sq, sqd, sfs)
        float(jnp.sum(lr2.q_final))
        t2s.append(time.perf_counter() - t0)
    lat = (np.array(t2s) - np.array(t1s)) * 1e3 / (K2 - K1)
    rows["loop_b1_fallback"] = dict(
        per_tick_ms_p50=round(float(np.percentile(lat, 50)), 4),
        per_tick_ms_p99=round(float(np.percentile(lat, 99)), 4),
        spread_ms=round(float(lat.max() - lat.min()), 4),
        chain_k=K1, chain_k2=K2, reps=args.reps,
        gap_fallback=1e-3,
        qp_error_ticks=int(np.asarray(lr2.qp_error).sum()),
        qp_primal_res_max=float(np.asarray(lr2.qp_primal_res).max()),
    )

    out = dict(
        backend=jax.default_backend(),
        host_device_rtt_ms=round(rtt * 1e3, 2),
        note="(8,128) is the f32 VMEM tile floor — batch-1 and batch-1024 "
             "run the same tile; their per-tick delta bounds any "
             "narrower-tile saving at the per-launch overhead",
        **rows,
    )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
