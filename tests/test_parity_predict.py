"""Reference-parity goldens + batched query/predict tests.

``reference_goldens.json`` holds posteriors computed by running the
reference pgmpy v1.0.0 (CPU) on the bundled example networks with
deterministic random queries.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from pgmpy_tpu.inference import VariableElimination
from pgmpy_tpu.models import DiscreteBayesianNetwork
from pgmpy_tpu.factors import TabularCPD
from pgmpy_tpu.utils import get_example_model

# numeric golden module: re-runs on the real chip in the TPU parity lane
pytestmark = pytest.mark.tpu


GOLDENS = json.load(
    open(os.path.join(os.path.dirname(__file__), "reference_goldens.json"))
)


class TestReferenceParity:
    @pytest.mark.parametrize("net", sorted(GOLDENS.keys()))
    def test_posteriors_match_reference(self, net):
        model = get_example_model(net)
        infer = VariableElimination(model)
        for q in GOLDENS[net]:
            res = infer.query(
                [q["variable"]], evidence=q["evidence"] or None, show_progress=False
            )
            # align state order to the reference's
            got = np.asarray(res.values, dtype=np.float64)
            order = [res.state_names[q["variable"]].index(s) for s in q["states"]]
            np.testing.assert_allclose(
                got[order], q["values"], atol=2e-5,
                err_msg=f"{net}: {q['variable']} | {q['evidence']}",
            )


def student_bn():
    model = DiscreteBayesianNetwork(
        [("diff", "grade"), ("intel", "grade"), ("grade", "letter"), ("intel", "SAT")]
    )
    model.add_cpds(
        TabularCPD("diff", 2, [[0.6], [0.4]]),
        TabularCPD("intel", 2, [[0.7], [0.3]]),
        TabularCPD(
            "grade", 3,
            [[0.3, 0.05, 0.9, 0.5], [0.4, 0.25, 0.08, 0.3], [0.3, 0.7, 0.02, 0.2]],
            evidence=["intel", "diff"], evidence_card=[2, 2],
        ),
        TabularCPD(
            "letter", 2, [[0.1, 0.4, 0.99], [0.9, 0.6, 0.01]],
            evidence=["grade"], evidence_card=[3],
        ),
        TabularCPD(
            "SAT", 2, [[0.95, 0.2], [0.05, 0.8]],
            evidence=["intel"], evidence_card=[2],
        ),
    )
    return model


class TestQueryBatch:
    def test_matches_rowwise_queries(self):
        model = student_bn()
        infer = VariableElimination(model)
        evidence = {"grade": [0, 1, 2, 0], "SAT": [1, 0, 1, 0]}
        values, state_names = infer.query_batch(["intel"], evidence)
        values = np.asarray(values)
        for i in range(4):
            row_ev = {"grade": evidence["grade"][i], "SAT": evidence["SAT"][i]}
            expected = infer.query(["intel"], evidence=row_ev, show_progress=False)
            np.testing.assert_allclose(
                values[i], np.asarray(expected.values), atol=1e-5, err_msg=str(row_ev)
            )

    def test_joint_batch(self):
        model = student_bn()
        infer = VariableElimination(model)
        evidence = {"letter": [0, 1]}
        values, state_names = infer.query_batch(["intel", "diff"], evidence)
        assert np.asarray(values).shape == (2, 2, 2)
        for i, state in enumerate([0, 1]):
            expected = infer.query(
                ["intel", "diff"], evidence={"letter": state}, show_progress=False
            )
            np.testing.assert_allclose(
                np.asarray(values)[i], np.asarray(expected.values), atol=1e-5
            )


class TestPredict:
    def test_predict_map(self):
        model = student_bn()
        data = pd.DataFrame(
            {"grade": [0, 2, 1], "SAT": [1, 0, 1], "letter": [1, 0, 1], "diff": [0, 1, 0]}
        )
        preds = model.predict(data)
        assert list(preds.columns) == ["intel"]
        infer = VariableElimination(model)
        for i in range(3):
            expected = infer.map_query(
                ["intel"], evidence=data.iloc[i].to_dict(), show_progress=False
            )
            assert preds.iloc[i]["intel"] == expected["intel"], i

    def test_predict_probability(self):
        model = student_bn()
        data = pd.DataFrame(
            {"grade": [0, 2], "SAT": [1, 0], "letter": [1, 0], "diff": [0, 1]}
        )
        probs = model.predict_probability(data)
        assert set(probs.columns) == {"intel_0", "intel_1"}
        infer = VariableElimination(model)
        for i in range(2):
            expected = np.asarray(
                infer.query(
                    ["intel"], evidence=data.iloc[i].to_dict(), show_progress=False
                ).values
            )
            np.testing.assert_allclose(
                probs.iloc[i].to_numpy(), expected, atol=1e-5
            )

    def test_predict_no_missing_raises(self):
        model = student_bn()
        data = pd.DataFrame(
            {"grade": [0], "SAT": [1], "letter": [1], "diff": [0], "intel": [0]}
        )
        with pytest.raises(ValueError):
            model.predict(data)

    def test_predict_stochastic_distribution(self):
        """Stochastic predict draws from the posterior in ONE batched
        categorical (no per-row host loop); empirical frequencies over many
        identical rows match the posterior."""
        model = student_bn()
        n = 4000
        data = pd.DataFrame(
            {"grade": [0] * n, "SAT": [1] * n, "letter": [1] * n, "diff": [0] * n}
        )
        preds = model.predict(data, stochastic=True, seed=0)
        infer = VariableElimination(model)
        expected = np.asarray(
            infer.query(
                ["intel"], evidence={"grade": 0, "SAT": 1, "letter": 1, "diff": 0},
                show_progress=False,
            ).values,
            dtype=np.float64,
        )
        freq = preds["intel"].value_counts(normalize=True).reindex([0, 1]).fillna(0)
        np.testing.assert_allclose(freq.to_numpy(), expected, atol=0.03)

    def test_predict_stochastic_seed_reproducible(self):
        model = student_bn()
        data = pd.DataFrame({"grade": [0, 1, 2], "SAT": [1, 0, 1],
                             "letter": [1, 0, 1], "diff": [0, 1, 0]})
        p1 = model.predict(data, stochastic=True, seed=42)
        p2 = model.predict(data, stochastic=True, seed=42)
        assert p1.equals(p2)

    def test_batch_program_cached_across_predict_calls(self):
        # r3 perf fix: query_batch must reuse its compiled per-signature
        # program instead of rebuilding + retracing per predict call
        from unittest import mock

        from pgmpy_tpu.inference.ve import VariableElimination

        model = student_bn()
        data = pd.DataFrame({"grade": [0, 1, 2], "SAT": [1, 0, 1],
                             "letter": [1, 0, 1], "diff": [0, 1, 0]})
        with mock.patch.object(
            VariableElimination, "batch_query_program",
            side_effect=VariableElimination.batch_query_program,
            autospec=True,
        ) as spy:
            model.predict(data)
            model.predict(data)
            model.predict(data)
        assert spy.call_count == 1
        # model edits invalidate the cache
        cpd = model.get_cpds("SAT")
        model.remove_cpds(cpd)
        model.add_cpds(cpd)
        with mock.patch.object(
            VariableElimination, "batch_query_program",
            side_effect=VariableElimination.batch_query_program,
            autospec=True,
        ) as spy:
            model.predict(data)
        assert spy.call_count == 1
