import os
import tempfile

import numpy as np
import pytest

from pgmpy_tpu.factors import TabularCPD
from pgmpy_tpu.models import DiscreteBayesianNetwork, DiscreteMarkovNetwork
from pgmpy_tpu.readwrite import get_reader, get_writer
from pgmpy_tpu.readwrite.bif import BIFReader, BIFWriter
from pgmpy_tpu.readwrite.net import NETReader, NETWriter
from pgmpy_tpu.readwrite.uai import UAIReader, UAIWriter
from pgmpy_tpu.readwrite.xbn import XBNReader, XBNWriter
from pgmpy_tpu.readwrite.xdsl import XDSLReader, XDSLWriter
from pgmpy_tpu.readwrite.xmlbif import XMLBIFReader, XMLBIFWriter

# numeric golden module: re-runs on the real chip in the TPU parity lane
pytestmark = pytest.mark.tpu



def cancer_model():
    model = DiscreteBayesianNetwork([("Pollution", "Cancer"), ("Smoker", "Cancer")])
    model.name = "cancer"
    model.add_cpds(
        TabularCPD(
            "Pollution", 2, [[0.9], [0.1]],
            state_names={"Pollution": ["low", "high"]},
        ),
        TabularCPD(
            "Smoker", 2, [[0.3], [0.7]],
            state_names={"Smoker": ["True", "False"]},
        ),
        TabularCPD(
            "Cancer", 2,
            [[0.03, 0.05, 0.001, 0.02], [0.97, 0.95, 0.999, 0.98]],
            evidence=["Smoker", "Pollution"], evidence_card=[2, 2],
            state_names={
                "Cancer": ["True", "False"],
                "Smoker": ["True", "False"],
                "Pollution": ["low", "high"],
            },
        ),
    )
    return model


def assert_models_equal(m1, m2):
    assert set(m1.nodes()) == set(m2.nodes())
    assert set(m1.edges()) == set(m2.edges())
    for node in m1.nodes():
        c1, c2 = m1.get_cpds(node), m2.get_cpds(node)
        assert c1.to_factor() == c2.to_factor(), node


class TestRoundTrips:
    @pytest.mark.parametrize(
        "writer_cls,reader_cls,ext",
        [
            (BIFWriter, BIFReader, "bif"),
            (XMLBIFWriter, XMLBIFReader, "xml"),
            (NETWriter, NETReader, "net"),
            (XDSLWriter, XDSLReader, "xdsl"),
            (XBNWriter, XBNReader, "xbn"),
        ],
    )
    def test_roundtrip(self, writer_cls, reader_cls, ext):
        model = cancer_model()
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, f"model.{ext}")
            writer_cls(model).write_file(path)
            back = reader_cls(path=path).get_model()
        assert_models_equal(model, back)

    def test_uai_bayes_roundtrip(self):
        model = cancer_model()
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "model.uai")
            UAIWriter(model).write_file(path)
            back = UAIReader(path=path).get_model()
        # UAI renames variables to var_i; compare distributions structurally
        assert len(back.nodes()) == 3
        assert back.check_model()

    def test_uai_markov(self):
        from pgmpy_tpu.factors import DiscreteFactor

        mn = DiscreteMarkovNetwork([("a", "b")])
        mn.add_factors(DiscreteFactor(["a", "b"], [2, 2], [1.0, 2.0, 3.0, 4.0]))
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "model.uai")
            UAIWriter(mn).write_file(path)
            back = UAIReader(path=path).get_model()
        assert isinstance(back, DiscreteMarkovNetwork)
        np.testing.assert_allclose(
            np.asarray(back.get_factors()[0].values).ravel(), [1, 2, 3, 4]
        )

    def test_model_save_load(self):
        model = cancer_model()
        with tempfile.TemporaryDirectory() as d:
            for ext in ["bif", "xmlbif", "net", "xdsl", "xbn"]:
                path = os.path.join(d, f"model.{ext}")
                model.save(path, filetype=ext)
                back = DiscreteBayesianNetwork.load(path, filetype=ext)
                assert_models_equal(model, back)

    def test_bif_gz_roundtrip(self):
        model = cancer_model()
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "model.bif.gz")
            BIFWriter(model).write_file(path)
            back = BIFReader(path=path).get_model()
        assert_models_equal(model, back)

    def test_unknown_format(self):
        with pytest.raises(ValueError):
            get_reader("bogus")
        with pytest.raises(ValueError):
            get_writer("bogus")


DOG_BIF = """
network dog {
}
variable bowel-problem {
  type discrete [ 2 ] { true, false };
  property position = (335, 99) ;
}
variable dog-out {
  type discrete [ 2 ] { true, false };
  property position = (300, 195) ;
}
probability ( bowel-problem ) {
  table 0.01, 0.99;
}
probability ( dog-out | bowel-problem ) {
  (true) 0.99, 0.01;
  (false) 0.3, 0.7;
}
"""


class TestBIFGrammar:
    def test_flat_table_with_parents_c_order(self):
        """Flat `table` rows for conditional blocks reshape C-order:
        child slowest, parent configs fastest (ref BIF.py:287-294)."""
        bif = """
network t {
}
variable A {
  type discrete [ 2 ] { a0, a1 };
}
variable B {
  type discrete [ 2 ] { b0, b1 };
}
probability ( A ) {
  table 0.4, 0.6;
}
probability ( B | A ) {
  table 0.1, 0.2, 0.9, 0.8;
}
"""
        reader = BIFReader(string=bif)
        np.testing.assert_allclose(
            reader.get_values()["B"], [[0.1, 0.2], [0.9, 0.8]]
        )

    def test_default_rows_fill_unlisted_configs(self):
        bif = """
network t {
}
variable A {
  type discrete [ 3 ] { a0, a1, a2 };
}
variable B {
  type discrete [ 2 ] { b0, b1 };
}
probability ( A ) {
  table 0.2, 0.3, 0.5;
}
probability ( B | A ) {
  default 0.5, 0.5;
  (a0) 0.9, 0.1;
}
"""
        reader = BIFReader(string=bif)
        np.testing.assert_allclose(
            reader.get_values()["B"], [[0.9, 0.5, 0.5], [0.1, 0.5, 0.5]]
        )

    def test_property_parse(self):
        reader = BIFReader(string=DOG_BIF)
        assert reader.get_property() == {
            "bowel-problem": ["position = (335, 99)"],
            "dog-out": ["position = (300, 195)"],
        }

    def test_property_to_node_attrs(self):
        model = BIFReader(string=DOG_BIF, include_properties=True).get_model()
        assert model.nodes["bowel-problem"]["position"] == "(335, 99)"

    def test_property_roundtrip(self):
        model = BIFReader(string=DOG_BIF, include_properties=True).get_model()
        text = BIFWriter(model).get_string()
        back = BIFReader(string=text, include_properties=True).get_model()
        assert back.nodes["dog-out"]["position"] == "(300, 195)"
        assert_models_equal(model, back)


class TestInferenceAfterLoad:
    def test_xmlbif_posterior_matches_bif(self):
        """Same network through two formats gives identical posteriors."""
        from pgmpy_tpu.inference import VariableElimination

        model = cancer_model()
        with tempfile.TemporaryDirectory() as d:
            p1 = os.path.join(d, "m.bif")
            p2 = os.path.join(d, "m.xml")
            BIFWriter(model).write_file(p1)
            XMLBIFWriter(model).write_file(p2)
            m1 = BIFReader(path=p1).get_model()
            m2 = XMLBIFReader(path=p2).get_model()
        q1 = VariableElimination(m1).query(
            ["Cancer"], evidence={"Smoker": "True"}, show_progress=False
        )
        q2 = VariableElimination(m2).query(
            ["Cancer"], evidence={"Smoker": "True"}, show_progress=False
        )
        assert q1 == q2
