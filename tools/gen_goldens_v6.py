"""Generate tests/reference_goldens_v6.json by RUNNING the reference pgmpy:

- pillai_trace (coef, p) on the shared mixed frame, with the reference's
  XGBoost ``_get_predictions`` monkeypatched to the shared deterministic
  least-squares predictor from tests/_golden_data.py (XGBoost is absent in
  this environment and non-deterministic across builds anyway).  This pins
  everything DOWNSTREAM of the regressor: one-hot residual assembly,
  sklearn-CCA canonical correlations, and the Muller-Peterson F p-value
  (reference CITests.py:638-755).
- DAG.edge_strength on the same frame (conditioning-set semantics +
  effect-size contract, reference base/DAG.py:1560-1746).
- UAI and XBN interop fixtures: the reference's writers serialize
  tests/testdata/net{0,1}.bif as ref{i}.uai / ref{i}.xbn, and the
  reference's READERS are asserted (in-process) to reconstruct
  pgmpy_tpu-written UAI/XBN strings — both directions of file-level
  compatibility.

Run with:
  sh tools/make_refshims.sh
  PYTHONPATH=/tmp/refshims:/root/reference python tools/gen_goldens_v6.py
"""

import json
import os
import sys

import numpy as np
import pandas as pd

import jax

jax.config.update("jax_platforms", "cpu")  # axon plugin unavailable here

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", "tests"))
sys.path.insert(0, os.path.join(HERE, ".."))  # pgmpy_tpu for the interop leg

from _golden_data import (  # noqa: E402
    EDGE_STRENGTH_DAG,
    PILLAI_CASES,
    linear_lstsq_predict,
    pillai_encode_Z,
    standalone_mixed_frame,
)

import pgmpy.estimators.CITests as ref_citests  # noqa: E402
from pgmpy.base import DAG  # noqa: E402
from pgmpy.readwrite import BIFReader as RefBIFReader  # noqa: E402
from pgmpy.readwrite import UAIReader as RefUAIReader  # noqa: E402
from pgmpy.readwrite import UAIWriter as RefUAIWriter  # noqa: E402
from pgmpy.readwrite import XBNReader as RefXBNReader  # noqa: E402
from pgmpy.readwrite import XBNWriter as RefXBNWriter  # noqa: E402

N_ROWS = 600
SEED = 977
TESTDATA = os.path.join(HERE, "..", "tests", "testdata")


def fake_get_predictions(X, Y, Z, data, **kwargs):
    """Deterministic stand-in for the reference's XGBoost predictions,
    mirroring its factorize/column-order semantics exactly."""
    Zm = np.column_stack(
        [np.ones(data.shape[0]), pillai_encode_Z(data, Z)]
    )

    def one(v):
        col = data.loc[:, v]
        if col.dtype == "category":
            codes, idx = pd.factorize(col)
            onehot = np.eye(len(idx))[codes]
            return linear_lstsq_predict(Zm, onehot), idx
        return linear_lstsq_predict(Zm, col.to_numpy(dtype=np.float64)), None

    pred_x, xi = one(X)
    pred_y, yi = one(Y)
    return pred_x, pred_y, xi, yi


def gen_pillai(df):
    ref_citests._get_predictions = fake_get_predictions
    out = []
    for X, Y, Z in PILLAI_CASES:
        coef, p = ref_citests.pillai_trace(X, Y, Z, df, boolean=False)
        out.append(
            {"X": X, "Y": Y, "Z": list(Z), "coef": float(coef), "p": float(p)}
        )
        print(f"pillai {X} _|_ {Y} | {Z}: coef={coef:.10f} p={p:.6g}")
    return out


def gen_edge_strength(df):
    ref_citests._get_predictions = fake_get_predictions
    dag = DAG(EDGE_STRENGTH_DAG)
    strengths = dag.edge_strength(df)
    out = {f"{u}->{v}": float(s) for (u, v), s in strengths.items()}
    print("edge_strength:", out)
    return out


def gen_io_fixtures():
    """Write reference-authored UAI/XBN fixtures and assert the reverse
    direction (pgmpy_tpu writers -> reference readers) in-process."""
    from pgmpy_tpu.readwrite import UAIWriter as OurUAIWriter
    from pgmpy_tpu.readwrite import XBNWriter as OurXBNWriter
    from pgmpy_tpu.readwrite import BIFReader as OurBIFReader

    results = {}
    for i in (0, 1):
        bif = os.path.join(TESTDATA, f"net{i}.bif")
        ref_model = RefBIFReader(bif).get_model()

        # --- reference writers -> committed fixtures (our readers tested in CI)
        RefUAIWriter(ref_model).write_uai(os.path.join(TESTDATA, f"ref{i}.uai"))
        RefXBNWriter(ref_model).write_xbn(os.path.join(TESTDATA, f"ref{i}.xbn"))

        # --- our writers -> reference readers, asserted here
        our_model = OurBIFReader(bif).get_model()
        uai_str = OurUAIWriter(our_model).__str__()
        ref_back = RefUAIReader(string=uai_str).get_model()
        # UAI renames to var_N; the reference reading ITS OWN file and the
        # reference reading OUR string must produce the identical model
        ref_own = RefUAIReader(path=os.path.join(TESTDATA, f"ref{i}.uai")).get_model()
        assert set(ref_back.nodes()) == set(ref_own.nodes())
        assert set(ref_back.edges()) == set(ref_own.edges())
        for node in ref_own.nodes():
            want = ref_own.get_cpds(node)
            got = ref_back.get_cpds(node)
            assert list(want.variables) == list(got.variables), node
            np.testing.assert_allclose(
                got.get_values(), want.get_values(), atol=1e-6, err_msg=node
            )

        import tempfile

        with tempfile.NamedTemporaryFile("w", suffix=".xbn", delete=False) as f:
            OurXBNWriter(our_model).write_xbn(f.name)
            xbn_path = f.name
        ref_back2 = RefXBNReader(path=xbn_path).get_model()
        assert set(map(str, ref_back2.nodes())) == set(map(str, ref_model.nodes()))
        assert {tuple(map(str, e)) for e in ref_back2.edges()} == {
            tuple(map(str, e)) for e in ref_model.edges()
        }
        for node in ref_model.nodes():
            want = np.asarray(ref_model.get_cpds(str(node)).get_values(), float)
            got = np.asarray(ref_back2.get_cpds(str(node)).get_values(), float)
            np.testing.assert_allclose(got, want, atol=1e-6, err_msg=str(node))
        os.unlink(xbn_path)
        results[f"net{i}"] = {
            "uai_ref_reads_ours": True,
            "xbn_ref_reads_ours_exact": True,
        }
        print(f"net{i}: interop both directions ok")
    return results


def main():
    df = standalone_mixed_frame(N_ROWS, SEED)
    goldens = {
        "meta": {"n_rows": N_ROWS, "seed": SEED},
        "pillai": gen_pillai(df),
        "edge_strength": gen_edge_strength(df),
        "io_interop": gen_io_fixtures(),
    }
    out = os.path.join(HERE, "..", "tests", "reference_goldens_v6.json")
    with open(out, "w") as f:
        json.dump(goldens, f, indent=1, sort_keys=True)
    print("wrote", out)


if __name__ == "__main__":
    main()
