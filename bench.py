"""Headline benchmark: MUNIN junction-tree BP calibration on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline: reference pgmpy v1.0.0 CPU on this machine.  pgmpy's
`BeliefPropagation(munin).calibrate()` did not complete within a 3400 s
cap (it was still inside its H6 triangulation); the recorded baseline
below is therefore a LOWER BOUND on the reference wall time, making
vs_baseline a conservative (under-)estimate of the true speedup.
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pgmpy_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# reference pgmpy-CPU MUNIN calibrate: >3400 s (timed out; lower bound)
BASELINE_MUNIN_CALIBRATE_S = 3400.0


def main():
    import jax.numpy as jnp

    from pgmpy_tpu.inference.bp import BeliefPropagation
    from pgmpy_tpu.utils.utils import get_example_model

    # establish the device connection before any timer: the first device op
    # pays ~2s of one-time tunnel/runtime initialization that is not a
    # property of the library
    jnp.zeros(1).block_until_ready()

    t0 = time.time()
    model = get_example_model("munin")
    load_s = time.time() - t0

    t0 = time.time()
    bp = BeliefPropagation(model)
    structure_s = time.time() - t0

    t0 = time.time()
    bp.calibrate()
    first_s = time.time() - t0

    # steady state should measure the background-compiled monolithic
    # program (hot-swapped in by JunctionTreeProgram.executor); profiling
    # (r4) showed it at 13.6-15.1 ms vs ~20-24 ms for the 6-dispatch
    # chunked pipeline
    t0 = time.time()
    bp._program.wait_for_upgrade("marginalize", timeout=180)
    upgrade_wait_s = time.time() - t0

    times = []
    for _ in range(7):
        t0 = time.time()
        bp._calibrate_junction_tree("marginalize")
        # honest wall time: wait for the device program, not just dispatch
        jax.block_until_ready(bp._raw_beliefs)
        times.append(time.time() - t0)
    # median-of-7: robust to background machine noise (driver-recorded r1
    # numbers regressed ~2x under CPU contention)
    times.sort()
    steady = times[len(times) // 2]
    steady_spread = {
        "min": round(times[0], 4),
        "median": round(steady, 4),
        "max": round(times[-1], 4),
    }

    # per-metric spread so noise vs regression is decidable (VERDICT r3 #3)
    spreads = {}

    def median_time(fn, reps=3, key=None):
        """Median wall time of ``fn(rep_index)`` — robust to machine noise.

        When ``key`` is given, record min/median/max under that name so the
        output carries dispersion, not just a point estimate.
        """
        ts = []
        for i in range(reps):
            t0 = time.time()
            fn(i)
            ts.append(time.time() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        if key is not None:
            spreads[key] = {
                "min": round(ts[0], 5),
                "median": round(med, 5),
                "max": round(ts[-1], 5),
            }
        return med

    # secondary metrics: MUNIN BP query, ALARM VE query latency,
    # batched-predict throughput, sampling throughput
    secondary = {}
    try:
        from pgmpy_tpu.inference.ve import VariableElimination

        # MUNIN post-calibration BP query: compiled per-signature path
        # (VERDICT r2: the old path re-ran the full JT compile per query)
        munin_nodes = sorted(model.nodes(), key=str)
        bq_var, bq_ev = munin_nodes[0], munin_nodes[len(munin_nodes) // 2]
        ev_state = model.get_cpds(bq_ev).state_names[bq_ev][0]
        bp.query([bq_var], evidence={bq_ev: ev_state})  # warm/compile
        n_bq = 50

        def bp_round(_):
            for _ in range(n_bq):
                bp.query([bq_var], evidence={bq_ev: ev_state})

        secondary["munin_bp_query_ms"] = round(
            median_time(bp_round, reps=3, key="munin_bp_query") / n_bq * 1000, 3
        )

        # batched BP queries: same compiled signature, vmapped over rows
        ev_states = model.get_cpds(bq_ev).state_names[bq_ev]
        batch_rows = 2048
        batch_ev = {bq_ev: [ev_states[i % len(ev_states)] for i in range(batch_rows)]}
        import numpy as np

        np.asarray(bp.query_batch([bq_var], batch_ev)[0])  # warm/compile
        t = median_time(
            lambda i: np.asarray(bp.query_batch([bq_var], batch_ev)[0]),
            reps=3,
            key="munin_bp_query_batch",
        )
        secondary["munin_bp_query_batch_rows_per_s"] = int(batch_rows / t)

        alarm = get_example_model("alarm")
        infer = VariableElimination(alarm)
        infer.query(
            ["HISTORY"], evidence={"CVP": "LOW", "HR": "HIGH"}, show_progress=False
        )  # warm the compiled contraction
        n_q = 100

        def ve_round(_):
            for _ in range(n_q):
                infer.query(
                    ["HISTORY"],
                    evidence={"CVP": "LOW", "HR": "HIGH"},
                    show_progress=False,
                )

        secondary["alarm_ve_query_ms"] = round(
            median_time(ve_round, reps=3, key="alarm_ve_query") / n_q * 1000, 3
        )

        # batched predict throughput (query_batch path; the reference
        # predicts per-unique-row with a joblib pool,
        # DiscreteBayesianNetwork.py:731-911)
        pred_df = alarm.simulate(n_samples=2000, seed=7, show_progress=False)
        pred_df = pred_df.drop(columns=["BP", "HISTORY"])
        n_rows = len(pred_df)
        alarm.predict(pred_df)  # warm
        t = median_time(lambda i: alarm.predict(pred_df), reps=3,
                        key="alarm_predict")
        secondary["alarm_predict_rows_per_s"] = int(n_rows / t)

        alarm.simulate(n_samples=100_000, seed=0, show_progress=False)  # warm
        t = median_time(
            lambda i: alarm.simulate(
                n_samples=100_000, seed=i + 1, show_progress=False
            ),
            reps=3,
            key="alarm_forward",
        )
        secondary["alarm_forward_samples_per_s"] = int(100_000 / t)

        from pgmpy_tpu.sampling import GibbsSampling

        gibbs = GibbsSampling(alarm)
        import numpy as np

        np.asarray(gibbs.sample_chains(n_chains=10_000, size=20, seed=0))  # warm
        t = median_time(
            lambda i: np.asarray(
                gibbs.sample_chains(n_chains=10_000, size=20, seed=i + 1)
            ),
            reps=3,
            key="alarm_gibbs",
        )
        secondary["alarm_gibbs_10k_chain_sweeps_per_s"] = int(20 * 10_000 / t)

        from pgmpy_tpu.sampling.nuts_jax import VectorizedNUTS

        ecoli = get_example_model("ecoli70")
        # joint_gaussian() is the unrounded 3-tuple (to_joint_gaussian is the
        # reference's 2-tuple public contract — r3's silent-unpack bug)
        _, mu, _ = ecoli.joint_gaussian()
        nuts = VectorizedNUTS(ecoli, max_depth=6)
        # warm with IDENTICAL static shapes (scan length is baked into the
        # compiled program)
        out = nuts.sample(mu.copy(), num_samples=120, num_adapt=20,
                          stepsize=0.17, n_chains=1024, seed=0)
        n_out = out.shape[0] * out.shape[1]
        t = median_time(
            lambda i: nuts.sample(mu.copy(), num_samples=120, num_adapt=20,
                                  stepsize=0.17, n_chains=1024, seed=i + 1),
            reps=3,
            key="ecoli70_nuts",
        )
        secondary["ecoli70_nuts_samples_per_s"] = int(n_out / t)

        # structure learning on device (r4): PC skeleton + HillClimb on
        # sampled ALARM data — one batched count dispatch per level /
        # iteration (reference fans these out over joblib workers,
        # BaseConstraintEstimator.py:264, HillClimbSearch.py:63-140)
        from pgmpy_tpu.estimators import PC, HillClimbSearch

        sl_df = alarm.simulate(n_samples=2000, seed=3, show_progress=False)
        pc_est = PC(sl_df)
        pc_est.build_skeleton(ci_test="chi_square", max_cond_vars=1)  # warm
        t = median_time(
            lambda i: PC(sl_df).build_skeleton(
                ci_test="chi_square", max_cond_vars=2
            ),
            reps=3,
            key="alarm_pc_skeleton",
        )
        secondary["alarm_pc_skeleton_s"] = round(t, 3)

        t = median_time(
            lambda i: HillClimbSearch(sl_df).estimate(
                scoring_method="bic-d", show_progress=False
            ),
            reps=3,
            key="alarm_hillclimb",
        )
        secondary["alarm_hillclimb_s"] = round(t, 3)
    except Exception as e:  # secondary metrics must never fail the bench
        secondary["error"] = str(e)[:200]

    # fail loudly on missing keys (r3 shipped with the NUTS metric silently
    # dead): every expected secondary must be present or named in "missing"
    expected = [
        "munin_bp_query_ms",
        "munin_bp_query_batch_rows_per_s",
        "alarm_ve_query_ms",
        "alarm_predict_rows_per_s",
        "alarm_forward_samples_per_s",
        "alarm_gibbs_10k_chain_sweeps_per_s",
        "ecoli70_nuts_samples_per_s",
    ]
    missing = [k for k in expected if k not in secondary]
    if missing:
        secondary["missing"] = missing

    result = {
        "metric": "munin_bp_calibration_wall_time",
        "value": round(steady, 4),
        "unit": "seconds",
        "vs_baseline": round(BASELINE_MUNIN_CALIBRATE_S / steady, 1),
        "notes": {
            "network": "MUNIN (1041 vars, 835 cliques)",
            "device": str(jax.devices()[0]),
            "load_s": round(load_s, 2),
            "structure_compile_s": round(structure_s, 2),
            "first_calibrate_incl_xla_compile_s": round(first_s, 2),
            "monolithic_upgrade_wait_s": round(upgrade_wait_s, 2),
            "perf": (
                "r4 profile (v5e): est 2.6 GB moved/calibration, HBM "
                "roofline ~3 ms; chunked 6-dispatch steady ~20-24 ms "
                "(16% of roofline), monolithic single-program steady "
                "13.6-15.1 ms — background-compiled (~24 s) and "
                "hot-swapped after first calibrate"
            ),
            "baseline": "pgmpy-CPU calibrate() timed out at 3400s (lower bound)",
            "steady_spread": steady_spread,
            "secondary": secondary,
            "spreads": spreads,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
