"""Benchmark: WBC solves/s/chip on the 33-DoF Tocabi (BASELINE.json metric).

Runs the full fused control tick (kinematics → contact space → 2-level HQP
→ contact redistribution) as a batched compiled graph on the available
accelerator.

Measurement methodology (important on tunneled/remote TPU setups):
* K ticks are chained *on device* inside one lax.scan with a data-dependent
  state perturbation between ticks, so the device must execute them
  serially and no host-side async/caching artifact can fake throughput;
* the host↔device round-trip floor (RTT) is measured with a trivial kernel
  and subtracted — on tunneled devices the RTT (tens of ms) would otherwise
  swamp per-call numbers. single-lane latency is reported both raw and
  RTT-corrected for the same reason.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline: the reference controller is a real-time 1 kHz single-robot
loop (tests/test_thread.cpp:107-112 — one solve per ms). vs_baseline is
therefore solves/s ÷ 1000: how many reference-equivalent 1 kHz control
streams one chip sustains.
"""

import json
import os
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)


def _rtt(jax, jnp):
    f = jax.jit(lambda x: x * 2.0)
    x0 = jax.device_put(np.ones(8, np.float32))
    float(jnp.sum(f(x0)))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(jnp.sum(f(x0)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
    except Exception:
        pass

    import __graft_entry__ as ge

    model, tick = ge._model_and_tick(qp_iters=12)
    q, qd, fstars = ge._example_inputs(model)

    rtt = _rtt(jax, jnp)

    B = 1024
    # tick 0 cold (12 iters) + K-1 warm ticks; K must put the chain's device
    # time well above the tunnel-RTT jitter.  K=64 (r03) gave a ~26 ms chain
    # — the same order as the ~27 ms RTT — and produced 27% run-to-run
    # throughput swings (3.19M driver vs 4.38M builder).  K=256 puts the
    # chain at ~100 ms so RTT jitter divides down to <5%; the median of
    # BENCH_REPEATS timed runs (+ reported spread) absorbs the rest.
    K = int(os.environ.get("DWBC_BENCH_K", "256"))
    REPEATS = int(os.environ.get("DWBC_BENCH_REPEATS", "5"))
    rng = np.random.default_rng(0)
    qs = np.tile(q, (B, 1)).astype(np.float32)
    qs[:, 6:39] += 0.02 * rng.standard_normal((B, 33)).astype(np.float32)
    qds = np.zeros((B, model.ndof), dtype=np.float32)
    fs = tuple(
        jax.device_put(
            np.tile(f, (B, 1)).astype(np.float32)
            + 0.05 * rng.standard_normal((B, f.shape[0])).astype(np.float32)
        )
        for f in fstars
    )

    # native broadcast over the leading batch dim (NOT vmap: under vmap the
    # QP layer sees unbatched shapes and cannot route to the Pallas
    # lane-batched megakernel — verified by tracing _pallas_eligible)
    #
    # Warm-start serving shape: consecutive control ticks hot-start each QP
    # from the previous tick's primal/dual point — exactly the reference's
    # persistent qpOASES hot-start mode (include/dwbc.h:222-228).  Tick 0
    # runs the full iteration budget; subsequent ticks run WARM_ITERS.
    # Accuracy is *measured*, not assumed: qp_gap/qp_primal_res maxima over
    # every tick (including the warm ones) are reported in the JSON line.
    WARM_ITERS = int(os.environ.get("DWBC_BENCH_WARM_ITERS", "7"))

    @jax.jit
    def chained(q0, qd0, fstars_):
        warm0 = tick.init_warm((q0.shape[0],))
        res0, warm = tick._tick_impl(q0, qd0, fstars_, warm=warm0, qp_iters=12)
        dq = 1e-6 * jnp.tanh(res0.torque_cmd[:, : model.model_dof])
        q1 = q0.at[:, 6 : 6 + model.model_dof].add(dq)

        def body(carry, _):
            qq, qqd, w = carry
            res, w = tick._tick_impl(qq, qqd, fstars_, warm=w, qp_iters=WARM_ITERS)
            dq = 1e-6 * jnp.tanh(res.torque_cmd[:, : model.model_dof])
            qq = qq.at[:, 6 : 6 + model.model_dof].add(dq)
            # max over the WHOLE batch (a [0] index here once hid garbage
            # on ~0.5% of lanes — the f32 near-singular-task bug)
            return (qq, qqd, w), (jnp.max(res.qp_gap), jnp.max(res.qp_primal_res))

        (qq, _, _), diag = jax.lax.scan(
            body, (q1, qd0, warm), None, length=K - 1
        )
        diag = (
            jnp.concatenate([jnp.max(res0.qp_gap)[None], diag[0]]),
            jnp.concatenate([jnp.max(res0.qp_primal_res)[None], diag[1]]),
        )
        return qq, diag

    q_d = jax.device_put(qs)
    qd_d = jax.device_put(qds)
    qq, diag = chained(q_d, qd_d, fs)
    float(jnp.sum(qq))  # compile + warm
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        qq, diag = chained(q_d, qd_d, fs)
        _ = float(jnp.sum(qq))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    run_spread = (max(times) - min(times)) / dt
    per_tick = max(dt - rtt, 1e-9) / K
    solves_per_sec = B / per_tick
    assert np.isfinite(np.asarray(qq)).all(), "non-finite state after ticks"

    single_lane = {}
    if os.environ.get("DWBC_BENCH_SINGLE", "1") == "1":
        single_lane = _single_lane(
            jax, jnp, tick, model, q, qd, fstars, rtt, WARM_ITERS
        )

    # Hardware torque-truth guard (round 3): the SAME tick on the CPU
    # backend for a few scenarios — catches silent numeric corruption of
    # the accelerator path (this is how the bf16-default-matmul bug that
    # skewed τ by up to 119 Nm was caught; see libdwbc_tpu/__init__.py).
    tau_truth = None
    if os.environ.get("DWBC_BENCH_TRUTH", "1") == "1":
        try:
            cpu = jax.devices("cpu")[0]
            nchk = 4
            # CPU side: the INDEPENDENT XLA formulation (CompiledTick) with
            # its TPU-kernel routing gated off — a genuine cross-check, not
            # the same program twice
            os.environ["DWBC_PALLAS_LINALG"] = "0"
            os.environ["DWBC_PALLAS_QP"] = "0"
            try:
                _, tick_cpu = ge._model_and_tick(qp_iters=12, fused=False)
                args_cpu = (
                    jax.device_put(qs[:nchk], cpu),
                    jax.device_put(qds[:nchk], cpu),
                    tuple(jax.device_put(np.asarray(f)[:nchk], cpu) for f in fs),
                )
                r_cpu = tick_cpu._tick_impl(*args_cpu, qp_iters=12)
                jax.block_until_ready(r_cpu.torque_cmd)
            finally:
                os.environ.pop("DWBC_PALLAS_LINALG", None)
                os.environ.pop("DWBC_PALLAS_QP", None)
            r_dev = tick._tick_impl(
                jax.device_put(qs[:nchk]), jax.device_put(qds[:nchk]),
                tuple(jax.device_put(np.asarray(f)[:nchk]) for f in fs),
                qp_iters=12,
            )
            dg = float(np.abs(np.asarray(r_cpu.torque_grav)
                              - np.asarray(r_dev.torque_grav)).max())
            dc = float(np.abs(np.asarray(r_cpu.torque_cmd)
                              - np.asarray(r_dev.torque_cmd)).max())
            tau_truth = {"tau_grav_vs_cpu": round(dg, 6),
                         "tau_cmd_vs_cpu": round(dc, 6)}
            # τ_grav is pre-QP linear algebra: anything beyond f32 roundoff
            # means the accelerator path is numerically corrupt
            assert dg < 0.05, f"device torque_grav diverges from CPU: {dg}"
        except AssertionError:
            raise
        except Exception as e:  # no CPU backend in some deployments
            tau_truth = {"truth_guard_error": str(e)[:120]}

    print(
        json.dumps(
            {
                "metric": "wbc_solves_per_sec_per_chip",
                "value": round(solves_per_sec, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_sec / 1000.0, 2),
                "batch": B,
                "chained_ticks": K,
                "bench_repeats": REPEATS,
                "run_spread": round(run_spread, 4),
                "warm_iters": WARM_ITERS,
                "host_device_rtt_ms": round(rtt * 1e3, 2),
                **single_lane,
                "qp_gap_max": float(np.asarray(diag[0]).max()),
                "qp_primal_res_max": float(np.asarray(diag[1]).max()),
                **(tau_truth or {}),
            }
        )
    )


def _single_lane(jax, jnp, tick, model, q, qd, fstars, rtt, warm_iters):
    """Measured single-lane (batch-1) per-tick latency — the BASELINE.md
    north-star "<1 ms p99 single-lane".  Ticks chained on device with the
    warm-start serving shape (tick 0 full budget, warm ticks at warm_iters,
    mirroring the batch path and the reference's persistent hot-start
    qpOASES solvers).

    Measurement (round-5 rework): per rep, TWO chain lengths K and 4K are
    timed and the per-tick time is the SLOPE (t_4K − t_K)/(3K).  The r04
    estimator ((chain − RTT_est)/K) left the tunnel-RTT jitter divided by
    only K and carried the bias of a separately-measured trivial-kernel RTT
    — its spread (0.28 ms) was the order of the p50 itself.  The slope
    cancels the per-call overhead (and its mean) per sample and divides the
    residual jitter by 3K; the per-rep intercept (t_K − K·slope) is
    reported as a sanity check that the cancelled overhead matches the
    measured RTT.  The compiled tick is a fixed instruction stream (static
    shapes, fixed IPM iterations), so true on-device per-tick variance is
    ~0 and the reported p99 spread is the honest estimator envelope.
    p50/p95/p99 over R slope samples."""
    import numpy as np
    import time

    K1 = 128
    K2 = 512
    R = int(os.environ.get("DWBC_BENCH_SINGLE_REPS", "100"))

    def make_chain(K):
        @jax.jit
        def chained_single(q0, qd0, fstars_):
            warm0 = tick.init_warm(())
            res0, warm = tick._tick_impl(
                q0, qd0, fstars_, warm=warm0, qp_iters=12
            )
            q1 = q0.at[6 : 6 + model.model_dof].add(
                1e-6 * jnp.tanh(res0.torque_cmd)
            )

            def body(carry, _):
                qq, qqd, w = carry
                res, w = tick._tick_impl(
                    qq, qqd, fstars_, warm=w, qp_iters=warm_iters
                )
                qq = qq.at[6 : 6 + model.model_dof].add(
                    1e-6 * jnp.tanh(res.torque_cmd)
                )
                return (qq, qqd, w), None

            (qq, _, _), _ = jax.lax.scan(
                body, (q1, qd0, warm), None, length=K - 1
            )
            return qq

        return chained_single

    chain1 = make_chain(K1)
    chain2 = make_chain(K2)
    sq = jax.device_put(q.astype(np.float32))
    sqd = jax.device_put(qd.astype(np.float32))
    sfs = tuple(jax.device_put(f.astype(np.float32)) for f in fstars)
    float(jnp.sum(chain1(sq, sqd, sfs)))
    float(jnp.sum(chain2(sq, sqd, sfs)))
    t1s, t2s = [], []
    for _ in range(R):
        t0 = time.perf_counter()
        float(jnp.sum(chain1(sq, sqd, sfs)))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(jnp.sum(chain2(sq, sqd, sfs)))
        t2s.append(time.perf_counter() - t0)
    t1s = np.array(t1s) * 1e3
    t2s = np.array(t2s) * 1e3
    lat_ms = (t2s - t1s) / (K2 - K1)           # per-tick slope, per rep
    intercept_ms = t1s - K1 * lat_ms           # per-call overhead estimate
    return {
        "single_lane_reps": R,
        "single_lane_chain_k": K1,
        "single_lane_chain_k2": K2,
        "single_lane_method": "two-chain slope (t_4K - t_K)/(3K)",
        "single_lane_ms_p50": round(float(np.percentile(lat_ms, 50)), 4),
        "single_lane_ms_p95": round(float(np.percentile(lat_ms, 95)), 4),
        "single_lane_ms_p99": round(float(np.percentile(lat_ms, 99)), 4),
        "single_lane_ms_spread": round(
            float(lat_ms.max() - lat_ms.min()), 4
        ),
        "single_lane_intercept_ms_p50": round(
            float(np.percentile(intercept_ms, 50)), 2
        ),
        # kept for cross-round comparability with r01-r04 records
        "single_lane_ms_rtt_corrected": round(
            float(np.percentile(lat_ms, 50)), 4
        ),
    }


if __name__ == "__main__":
    main()
