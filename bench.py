"""Headline benchmark: MUNIN junction-tree BP calibration on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline: reference pgmpy v1.0.0 CPU on this machine.  pgmpy's
`BeliefPropagation(munin).calibrate()` did not complete within a 3400 s
cap (it was still inside its H6 triangulation); the recorded baseline
below is therefore a LOWER BOUND on the reference wall time, making
vs_baseline a conservative (under-)estimate of the true speedup.

Learning-lane baselines were measured in r5 with
`tools/measure_ref_learning.py` (median of 3, n_jobs=1, same data) and
recorded in BASELINE.md — the structure/learning secondaries below carry
real vs_baseline multipliers against them.
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

# reference pgmpy-CPU learning lane (BASELINE.md "Measured — learning lane",
# tools/measure_ref_learning.py medians on this machine, r5)
BASELINE_REF = {
    "alarm_predict_rows_per_s": 72,
    "alarm_pc_skeleton_s": 23.374,
    "alarm_hillclimb_s": 8.5,
    "alarm_treesearch_s": 1.878,
    "alarm_mle_2000_s": 0.159,
    "alarm_mle_100k_s": 0.347,
    "alarm_forward_samples_per_s": 49504,
}


def main():
    import numpy as np

    import jax.numpy as jnp

    bench_t0 = time.time()

    def progress(msg):
        # stage-by-stage stderr trail: if the bench is killed mid-run the
        # last line names the stage that ate the time
        print(f"[bench +{time.time() - bench_t0:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    from pgmpy_tpu.inference.bp import BeliefPropagation
    from pgmpy_tpu.utils.utils import get_example_model

    # establish the device connection before any timer: the first device op
    # pays ~2s of one-time tunnel/runtime initialization that is not a
    # property of the library
    jnp.zeros(1).block_until_ready()

    # measured host<->device roundtrip (tunnel latency): lets readers
    # separate dispatch latency from device compute in the numbers below
    t0 = time.time()
    for _ in range(5):
        jnp.zeros(1).block_until_ready()
    tunnel_roundtrip_ms = (time.time() - t0) / 5 * 1000

    progress("loading munin")
    t0 = time.time()
    model = get_example_model("munin")
    load_s = time.time() - t0

    t0 = time.time()
    bp = BeliefPropagation(model)
    structure_s = time.time() - t0

    progress("first calibrate (incl. chunked XLA compile)")
    t0 = time.time()
    bp.calibrate()
    first_s = time.time() - t0

    # steady state measures the background-compiled monolithic program
    # (hot-swapped in by JunctionTreeProgram.executor): stage0 fused, one
    # dispatch per calibration, clique-merged schedule (r5)
    progress("waiting for monolithic upgrade")
    t0 = time.time()
    bp._program.wait_for_upgrade("marginalize", timeout=180)
    upgrade_wait_s = time.time() - t0

    # r4's unexplained 16x tail (steady max 0.267 s vs 0.0164 median) was
    # the first EXECUTION of the freshly hot-swapped monolithic program
    # paying its one-time program-load/staging cost inside the timed loop.
    # Warm it untimed, then time.
    bp._calibrate_junction_tree("marginalize")
    jax.block_until_ready(bp._raw_beliefs)

    times = []
    for _ in range(15):
        t0 = time.time()
        bp._calibrate_junction_tree("marginalize")
        # honest wall time: wait for program completion.  Block on ONE
        # output buffer, not the whole 440-buffer pytree: an XLA program's
        # outputs become ready together when execution finishes, but the
        # tunnel charges a per-HANDLE sync for each blocked array — r5
        # traced 6.7 ms vs ~90 ms swings in this loop to tunnel-state-
        # dependent per-handle sync cost, not the device (the
        # readback_median below hard-bounds true execution).
        jax.block_until_ready(bp._raw_beliefs[0][0])
        times.append(time.time() - t0)
    times.sort()
    steady = times[len(times) // 2]
    steady_spread = {
        "min": round(times[0], 4),
        "median": round(steady, 4),
        "p95": round(times[max(0, int(len(times) * 0.95) - 1)], 4),
        "max": round(times[-1], 4),
    }

    # integrity variant: the tunnel's block_until_ready can under-report
    # for some programs (CLAUDE.md r5 notes), so ALSO time calibration
    # with a forced scalar readback of one output buffer — XLA programs
    # materialize all outputs together, so one value proves the whole
    # program executed.  (Do NOT sum the whole belief list here: a
    # 330-argument readback program pays per-argument tunnel marshalling
    # and measures the proxy layer, not the device.)
    one_sum = jax.jit(lambda b0: b0.sum())
    float(np.asarray(one_sum(bp._raw_beliefs[0][0])))  # warm
    rb_times = []
    for _ in range(7):
        t0 = time.time()
        bp._calibrate_junction_tree("marginalize")
        float(np.asarray(one_sum(bp._raw_beliefs[0][0])))
        rb_times.append(time.time() - t0)
    rb_times.sort()
    steady_spread["readback_median"] = round(rb_times[len(rb_times) // 2], 4)

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
            progress(f"done {key}: median {med:.4f}s")
        return med

    def marginal_device_s(fn, k=4):
        """Marginal device seconds per call of ``fn(i) -> jax arrays``.

        Chains k dispatches with ONE final block vs a single dispatch:
        (T_k - T_1)/(k-1) cancels the fixed tunnel roundtrip + host
        overhead, leaving per-call device time — so tunnel noise and real
        kernel regressions separate (VERDICT r4 #6).
        """
        jax.block_until_ready(fn(0))  # warm
        t0 = time.time()
        jax.block_until_ready(fn(1))
        t1 = time.time() - t0
        t0 = time.time()
        outs = [fn(2 + i) for i in range(k)]
        jax.block_until_ready(outs)
        tk = time.time() - t0
        return max((tk - t1) / (k - 1), 0.0)

    # secondary metrics: MUNIN BP query, ALARM VE query latency,
    # batched-predict throughput, sampling throughput, structure learning
    secondary = {}
    try:
        from pgmpy_tpu.inference.ve import VariableElimination

        # MUNIN post-calibration BP query: compiled per-signature path
        munin_nodes = sorted(model.nodes(), key=str)
        bq_var, bq_ev = munin_nodes[0], munin_nodes[len(munin_nodes) // 2]
        ev_state = model.get_cpds(bq_ev).state_names[bq_ev][0]
        progress("warm munin bp query (per-signature compile)")
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

        progress("warm munin bp query_batch")
        np.asarray(bp.query_batch([bq_var], batch_ev)[0])  # warm/compile
        t = median_time(
            lambda i: np.asarray(bp.query_batch([bq_var], batch_ev)[0]),
            reps=3,
            key="munin_bp_query_batch",
        )
        secondary["munin_bp_query_batch_rows_per_s"] = int(batch_rows / t)

        progress("alarm secondaries")
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

        # ---- samplers: wall throughput + marginal device time ---------- #
        progress("warm alarm forward sampling")
        alarm.simulate(n_samples=100_000, seed=0, show_progress=False)  # warm
        t = median_time(
            lambda i: alarm.simulate(
                n_samples=100_000, seed=i + 1, show_progress=False
            ),
            reps=3,
            key="alarm_forward",
        )
        secondary["alarm_forward_samples_per_s"] = int(100_000 / t)
        from pgmpy_tpu.sampling.forward import BayesianModelSampling

        # reuse the model's cached compiled sampler (a fresh
        # CompiledAncestralSampler would recompile the whole program)
        cas = BayesianModelSampling(alarm).sampler
        fwd_mask = jnp.full((len(cas.cards),), -1, dtype=jnp.int32)
        # NOTE: must chain the JITTED program — calling the raw method
        # re-traces per call and measures tracing, not the device
        secondary["alarm_forward_device_s"] = round(
            marginal_device_s(
                lambda i: cas._forward_jit(
                    jax.random.PRNGKey(i), 100_000, fwd_mask
                )
            ),
            5,
        )

        from pgmpy_tpu.sampling import GibbsSampling

        gibbs = GibbsSampling(alarm)
        progress("warm gibbs chains")
        np.asarray(gibbs.sample_chains(n_chains=10_000, size=20, seed=0))  # warm
        t = median_time(
            lambda i: np.asarray(
                gibbs.sample_chains(n_chains=10_000, size=20, seed=i + 1)
            ),
            reps=3,
            key="alarm_gibbs",
        )
        secondary["alarm_gibbs_10k_chain_sweeps_per_s"] = int(20 * 10_000 / t)
        compiled = gibbs._compiled
        d = len(compiled.cards)
        init = jnp.stack(
            [
                jax.random.randint(
                    jax.random.PRNGKey(j), (10_000,), 0, int(compiled.cards[j])
                )
                for j in range(d)
            ],
            axis=1,
        ).astype(jnp.int32)
        secondary["alarm_gibbs_device_s"] = round(
            marginal_device_s(
                lambda i: compiled._run(jax.random.PRNGKey(i), 20, init)
            ),
            5,
        )

        from pgmpy_tpu.sampling.nuts_jax import VectorizedNUTS

        ecoli = get_example_model("ecoli70")
        # joint_gaussian() is the unrounded 3-tuple (to_joint_gaussian is the
        # reference's 2-tuple public contract — r3's silent-unpack bug)
        _, mu, _ = ecoli.joint_gaussian()
        nuts = VectorizedNUTS(ecoli, max_depth=6)
        # warm with IDENTICAL static shapes (scan length is baked into the
        # compiled program)
        progress("warm nuts (compile)")
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
        # nuts.sample blocks internally (acceptance-rate readback), so its
        # wall time is ~device + one tunnel roundtrip; report the corrected
        # device estimate rather than a chained measurement
        secondary["ecoli70_nuts_device_s"] = round(
            max(t - tunnel_roundtrip_ms / 1000, 0.0), 4
        )

        # ---- loopy BP on a non-tree MRF (device flooding engine, r5) --- #
        from pgmpy_tpu.factors.discrete import DiscreteFactor
        from pgmpy_tpu.inference.fg_bp import (
            BeliefPropagationWithMessagePassing,
        )
        from pgmpy_tpu.models import FactorGraph

        rng = np.random.default_rng(3)
        n_grid = 16
        names = [[f"x{i}_{j}" for j in range(n_grid)] for i in range(n_grid)]
        fg = FactorGraph()
        fg.add_nodes_from(v for row in names for v in row)
        grid_factors = []
        for i in range(n_grid):
            for j in range(n_grid):
                for di, dj in ((0, 1), (1, 0)):
                    i2, j2 = i + di, j + dj
                    if i2 < n_grid and j2 < n_grid:
                        grid_factors.append(DiscreteFactor(
                            [names[i][j], names[i2][j2]], [2, 2],
                            np.exp(0.2 * rng.standard_normal((2, 2)))))
        fg.add_factors(*grid_factors)
        for f in grid_factors:
            fg.add_edges_from((v, f) for v in f.variables)
        loopy = BeliefPropagationWithMessagePassing(fg)
        progress("warm grid16 loopy bp (compile)")
        loopy.query([names[0][0]])  # warm/compile
        t = median_time(
            lambda i: loopy.query([names[0][0]]), reps=3,
            key="grid16_loopy_bp",
        )
        secondary["grid16_loopy_bp_ms"] = round(t * 1000, 2)

        # ---- DBN filtering via SMC particle filter (north-star #5) ---- #
        from pgmpy_tpu.factors.cpd import TabularCPD
        from pgmpy_tpu.models import DynamicBayesianNetwork
        from pgmpy_tpu.sampling.smc import ParticleFilter

        dbn = DynamicBayesianNetwork()
        dbn.add_edges_from(
            [(("rain", 0), ("umbrella", 0)), (("rain", 0), ("rain", 1))]
        )
        dbn.add_cpds(
            TabularCPD(("rain", 0), 2, [[0.5], [0.5]]),
            TabularCPD(("umbrella", 0), 2, [[0.8, 0.1], [0.2, 0.9]],
                       evidence=[("rain", 0)], evidence_card=[2]),
            TabularCPD(("rain", 1), 2, [[0.7, 0.3], [0.3, 0.7]],
                       evidence=[("rain", 0)], evidence_card=[2]),
            TabularCPD(("umbrella", 1), 2, [[0.8, 0.1], [0.2, 0.9]],
                       evidence=[("rain", 1)], evidence_card=[2]),
        )
        n_particles, horizon = 16384, 200
        pf = ParticleFilter(dbn, n_particles=n_particles)
        smc_ev = {("umbrella", t): t % 2 for t in range(0, horizon, 3)}
        progress("warm smc (compile)")
        pf.filter(evidence=smc_ev, n_time_slices=horizon, seed=0)  # warm
        t = median_time(
            lambda i: pf.filter(evidence=smc_ev, n_time_slices=horizon,
                                seed=i + 1),
            reps=3,
            key="dbn_smc",
        )
        secondary["dbn_smc_particle_steps_per_s"] = int(
            n_particles * horizon / t
        )

        # ---- structure learning + parameter fitting (r4/r5) ------------ #
        # one batched count dispatch per level/iteration (reference fans
        # these out over joblib workers, BaseConstraintEstimator.py:264,
        # HillClimbSearch.py:63-140); baselines measured r5
        from pgmpy_tpu.estimators import (
            PC,
            HillClimbSearch,
            MaximumLikelihoodEstimator,
            TreeSearch,
        )

        sl_df = alarm.simulate(n_samples=2000, seed=3, show_progress=False)
        pc_est = PC(sl_df)
        progress("warm pc skeleton")
        pc_est.build_skeleton(ci_test="chi_square", max_cond_vars=1,
                              show_progress=False)  # warm
        t = median_time(
            lambda i: PC(sl_df).build_skeleton(
                ci_test="chi_square", max_cond_vars=2, show_progress=False
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

        t = median_time(
            lambda i: TreeSearch(sl_df).estimate(show_progress=False),
            reps=3,
            key="alarm_treesearch",
        )
        secondary["alarm_treesearch_s"] = round(t, 3)

        from pgmpy_tpu.models import DiscreteBayesianNetwork

        mle_edges = list(alarm.edges())

        def mle_fit(df):
            m = DiscreteBayesianNetwork(mle_edges)
            MaximumLikelihoodEstimator(m, df).get_parameters()

        progress("warm mle")
        mle_fit(sl_df)  # warm
        t = median_time(lambda i: mle_fit(sl_df), reps=3, key="alarm_mle_2000")
        secondary["alarm_mle_2000_s"] = round(t, 4)

        progress("mle 100k config")
        big_df = alarm.simulate(n_samples=100_000, seed=5, show_progress=False)
        mle_fit(big_df)  # warm
        t = median_time(lambda i: mle_fit(big_df), reps=3, key="alarm_mle_100k")
        secondary["alarm_mle_100k_s"] = round(t, 4)

        # vs_baseline multipliers for everything with a measured reference
        # number (BASELINE.md, learning lane)
        vs = {}
        for k, ref in BASELINE_REF.items():
            if k in secondary:
                ours = secondary[k]
                if k.endswith("_per_s"):
                    vs[k] = round(ours / ref, 2)
                else:
                    vs[k] = round(ref / ours, 2)
        secondary["vs_reference"] = vs
    except Exception as e:  # secondary metrics must never fail the bench
        import traceback

        secondary["error"] = str(e)[:200]
        tb = traceback.extract_tb(e.__traceback__)
        secondary["error_at"] = [
            f"{os.path.basename(f.filename)}:{f.lineno} {f.name}"
            for f in tb[-4:]
        ]

    # fail loudly on missing keys (r3 shipped with the NUTS metric silently
    # dead): every expected secondary must be present or named in "missing"
    expected = [
        "munin_bp_query_ms",
        "munin_bp_query_batch_rows_per_s",
        "alarm_ve_query_ms",
        "alarm_predict_rows_per_s",
        "alarm_forward_samples_per_s",
        "alarm_forward_device_s",
        "alarm_gibbs_10k_chain_sweeps_per_s",
        "alarm_gibbs_device_s",
        "ecoli70_nuts_samples_per_s",
        "grid16_loopy_bp_ms",
        "dbn_smc_particle_steps_per_s",
        "alarm_pc_skeleton_s",
        "alarm_hillclimb_s",
        "alarm_treesearch_s",
        "alarm_mle_2000_s",
        "alarm_mle_100k_s",
        "vs_reference",
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
            "network": "MUNIN (1041 vars; 330 cliques after r5 clique merge)",
            "device": str(jax.devices()[0]),
            "tunnel_roundtrip_ms": round(tunnel_roundtrip_ms, 2),
            "load_s": round(load_s, 2),
            "structure_compile_s": round(structure_s, 2),
            "first_calibrate_incl_xla_compile_s": round(first_s, 2),
            "monolithic_upgrade_wait_s": round(upgrade_wait_s, 2),
            "perf": (
                "r5: clique-merge pass (cap 2^20, 1668->658 messages) + "
                "stage0-fused monolithic program; measured sweep 11.2 ms "
                "(unmerged) -> 4.2 ms median / 3.8 ms min on quiet v5e, "
                "vs ~3.8 ms HBM roofline for the 3.15 GB moved. r4 tail "
                "cause found: first run of the hot-swapped program paid "
                "program-load inside the timed loop; now warmed untimed."
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
