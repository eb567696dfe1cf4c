"""Deep readwrite tests: literal file-string goldens + cross-format parity.

Mirrors the depth of the reference readwrite suites
(/root/reference/pgmpy/tests/test_readwrite/, ~7k LoC): parsing literal
strings with asymmetric tables (so any axis/column transposition fails
loudly), writer round-trips for every format, and a cross-format check
that the same model produces the same VE posterior through each codec.
"""

import gzip

import numpy as np
import pytest

from pgmpy_tpu.factors import TabularCPD
from pgmpy_tpu.inference.ve import VariableElimination
from pgmpy_tpu.models import DiscreteBayesianNetwork
from pgmpy_tpu.readwrite import (
    BIFReader,
    BIFWriter,
    NETReader,
    NETWriter,
    UAIReader,
    UAIWriter,
    XBNReader,
    XBNWriter,
    XDSLReader,
    XDSLWriter,
    XMLBIFReader,
    XMLBIFWriter,
)

BIF_STRING = """network "rain" {
  property author test ;
}
variable rain {
  type discrete [ 2 ] { yes, no };
  property position = (100, 200) ;
}
variable sprinkler {
  type discrete [ 2 ] { on, off };
}
variable grass {
  type discrete [ 3 ] { wet, damp, dry };
}
probability ( rain ) {
  table 0.2, 0.8;
}
probability ( sprinkler | rain ) {
  ( yes ) 0.01, 0.99;
  ( no ) 0.4, 0.6;
}
probability ( grass | rain, sprinkler ) {
  ( yes, on ) 0.99, 0.009, 0.001;
  ( yes, off ) 0.8, 0.15, 0.05;
  ( no, on ) 0.9, 0.07, 0.03;
  ( no, off ) 0.01, 0.09, 0.9;
}
"""


class TestBIFParsing:
    def setup_method(self):
        self.reader = BIFReader(string=BIF_STRING, include_properties=True)

    def test_network_name(self):
        assert self.reader.get_network_name() == "rain"

    def test_variables(self):
        assert self.reader.get_variables() == ["rain", "sprinkler", "grass"]

    def test_states(self):
        states = self.reader.get_states()
        assert states["rain"] == ["yes", "no"]
        assert states["grass"] == ["wet", "damp", "dry"]

    def test_parents(self):
        parents = self.reader.get_parents()
        assert parents["rain"] == []
        assert parents["sprinkler"] == ["rain"]
        assert parents["grass"] == ["rain", "sprinkler"]

    def test_edges(self):
        assert sorted(map(tuple, self.reader.get_edges())) == [
            ("rain", "grass"), ("rain", "sprinkler"), ("sprinkler", "grass")]

    def test_property(self):
        props = self.reader.get_property()
        assert props["rain"] == ["position = (100, 200)"]

    def test_values_column_order(self):
        # columns: (rain, sprinkler) with sprinkler (LAST parent) fastest
        vals = self.reader.get_values()["grass"]
        np.testing.assert_allclose(
            vals,
            [[0.99, 0.8, 0.9, 0.01],
             [0.009, 0.15, 0.07, 0.09],
             [0.001, 0.05, 0.03, 0.9]])

    def test_conditional_row_order_irrelevant(self):
        scrambled = BIF_STRING.replace(
            "  ( yes, on ) 0.99, 0.009, 0.001;\n  ( yes, off ) 0.8, 0.15, 0.05;",
            "  ( yes, off ) 0.8, 0.15, 0.05;\n  ( yes, on ) 0.99, 0.009, 0.001;")
        vals = BIFReader(string=scrambled).get_values()["grass"]
        np.testing.assert_allclose(vals[0], [0.99, 0.8, 0.9, 0.01])

    def test_model_posterior(self):
        model = self.reader.get_model()
        phi = VariableElimination(model).query(
            ["rain"], evidence={"grass": "wet"}, show_progress=False)
        # hand-computed: P(rain=yes, grass=wet) = .2*(.01*.99+.99*.8)
        py = 0.2 * (0.01 * 0.99 + 0.99 * 0.8)
        pn = 0.8 * (0.4 * 0.9 + 0.6 * 0.01)
        want = py / (py + pn)
        idx = model.get_cpds("rain").state_names["rain"].index("yes")
        assert float(np.asarray(phi.values)[idx]) == pytest.approx(
            want, abs=1e-5)

    def test_cardinality_state_mismatch_raises(self):
        bad = BIF_STRING.replace("[ 2 ] { yes, no }", "[ 3 ] { yes, no }")
        with pytest.raises(ValueError):
            BIFReader(string=bad)

    def test_flat_table_with_parents_c_order(self):
        # flat `table` with a parent: child slowest, parent fastest
        s = """network t {}
variable a { type discrete [ 2 ] { a0, a1 }; }
variable b { type discrete [ 2 ] { b0, b1 }; }
probability ( a ) { table 0.5, 0.5; }
probability ( b | a ) { table 0.1, 0.7, 0.9, 0.3; }
"""
        vals = BIFReader(string=s).get_values()["b"]
        np.testing.assert_allclose(vals, [[0.1, 0.7], [0.9, 0.3]])

    def test_default_row_fills_missing_configs(self):
        s = """network t {}
variable a { type discrete [ 2 ] { a0, a1 }; }
variable b { type discrete [ 2 ] { b0, b1 }; }
probability ( b | a ) {
  ( a0 ) 0.3, 0.7;
  default 0.25, 0.75;
}
probability ( a ) { table 0.5, 0.5; }
"""
        vals = BIFReader(string=s).get_values()["b"]
        np.testing.assert_allclose(vals, [[0.3, 0.25], [0.7, 0.75]])

    def test_gzip_roundtrip(self, tmp_path):
        path = tmp_path / "rain.bif.gz"
        with gzip.open(path, "wt") as f:
            f.write(BIF_STRING)
        model = BIFReader(path=str(path)).get_model()
        assert set(model.nodes()) == {"rain", "sprinkler", "grass"}


class TestBIFWriter:
    def test_roundtrip_preserves_everything(self):
        model = BIFReader(string=BIF_STRING, include_properties=True).get_model()
        text = BIFWriter(model).get_string()
        again = BIFReader(string=text).get_model()
        assert set(again.edges()) == set(model.edges())
        for node in model.nodes():
            a = np.asarray(model.get_cpds(node).get_values(), dtype=np.float64)
            b = np.asarray(again.get_cpds(node).get_values(), dtype=np.float64)
            np.testing.assert_allclose(a, b, atol=1e-9)
            assert (again.get_cpds(node).state_names[node]
                    == model.get_cpds(node).state_names[node])

    def test_properties_persisted(self):
        model = BIFReader(string=BIF_STRING, include_properties=True).get_model()
        text = BIFWriter(model).get_string()
        assert "property" in text
        props = BIFReader(string=text, include_properties=True).get_property()
        assert props["rain"] == ["position = (100, 200)"]


XMLBIF_STRING = """<?xml version="1.0"?>
<BIF VERSION="0.3">
<NETWORK>
<NAME>toy</NAME>
<VARIABLE TYPE="nature">
    <NAME>a</NAME>
    <OUTCOME>a0</OUTCOME>
    <OUTCOME>a1</OUTCOME>
    <PROPERTY>position = (73, 165)</PROPERTY>
</VARIABLE>
<VARIABLE TYPE="nature">
    <NAME>b</NAME>
    <OUTCOME>b0</OUTCOME>
    <OUTCOME>b1</OUTCOME>
    <OUTCOME>b2</OUTCOME>
</VARIABLE>
<DEFINITION>
    <FOR>a</FOR>
    <TABLE>0.3 0.7</TABLE>
</DEFINITION>
<DEFINITION>
    <FOR>b</FOR>
    <GIVEN>a</GIVEN>
    <TABLE>0.1 0.2 0.7 0.5 0.25 0.25</TABLE>
</DEFINITION>
</NETWORK>
</BIF>
"""


class TestXMLBIF:
    def test_parse_literal(self):
        reader = XMLBIFReader(string=XMLBIF_STRING)
        assert sorted(reader.get_variables()) == ["a", "b"]
        assert reader.get_states()["b"] == ["b0", "b1", "b2"]
        assert reader.get_parents()["b"] == ["a"]
        assert list(map(tuple, reader.get_edges())) == [("a", "b")]

    def test_table_layout(self):
        # reference XMLBIF layout: TABLE iterates child fastest? No —
        # row per parent config, child state fastest within a row
        model = XMLBIFReader(string=XMLBIF_STRING).get_model()
        cpd = model.get_cpds("b")
        vals = np.asarray(cpd.get_values(), dtype=np.float64)
        np.testing.assert_allclose(vals, [[0.1, 0.5], [0.2, 0.25], [0.7, 0.25]])

    def test_writer_roundtrip(self):
        model = XMLBIFReader(string=XMLBIF_STRING).get_model()
        text = str(XMLBIFWriter(model))
        again = XMLBIFReader(string=text).get_model()
        assert set(again.edges()) == set(model.edges())
        np.testing.assert_allclose(
            np.asarray(again.get_cpds("b").get_values(), dtype=np.float64),
            np.asarray(model.get_cpds("b").get_values(), dtype=np.float64),
            atol=1e-9)

    def test_probabilities_sum_to_one(self):
        model = XMLBIFReader(string=XMLBIF_STRING).get_model()
        assert model.check_model()


UAI_MARKOV = """MARKOV
3
2 2 3
3
2 0 1
2 0 2
1 2
4
 4.000 2.400
 1.000 0.000
6
 2.2500 3.2500 3.7500
 0.0000 0.5000 1.0000
3
 0.333 0.333 0.334
"""

UAI_BAYES = """BAYES
2
2 3
2
1 0
2 0 1
2
 0.4 0.6
6
 0.2 0.1
 0.3 0.1
 0.5 0.8
"""


class TestUAI:
    def test_markov_parse(self):
        reader = UAIReader(string=UAI_MARKOV)
        assert reader.network_type == "MARKOV"
        assert reader.get_variables() == ["var_0", "var_1", "var_2"]
        assert reader.get_domain() == {"var_0": "2", "var_1": "2", "var_2": "3"}

    def test_markov_model_partition(self):
        model = UAIReader(string=UAI_MARKOV).get_model()
        assert set(model.nodes()) == {"var_0", "var_1", "var_2"}
        factors = model.get_factors()
        assert len(factors) == 3

    def test_bayes_parse(self):
        # reference layout: table entries are child-major (child slowest)
        model = UAIReader(string=UAI_BAYES).get_model()
        assert set(model.edges()) == {("var_0", "var_1")}
        cpd = model.get_cpds("var_1")
        vals = np.asarray(cpd.get_values(), dtype=np.float64)
        np.testing.assert_allclose(vals, [[0.2, 0.1], [0.3, 0.1], [0.5, 0.8]])

    def test_bayes_roundtrip(self):
        model = UAIReader(string=UAI_BAYES).get_model()
        text = UAIWriter(model).get_string()
        again = UAIReader(string=text).get_model()
        np.testing.assert_allclose(
            np.asarray(again.get_cpds("var_1").get_values(), dtype=np.float64),
            np.asarray(model.get_cpds("var_1").get_values(), dtype=np.float64),
            atol=1e-6)


def _asym_model():
    """3-node model with distinct cardinalities and asymmetric values so a
    transposed or permuted table cannot round-trip silently."""
    model = DiscreteBayesianNetwork([("x", "z"), ("y", "z")])
    model.add_cpds(
        TabularCPD("x", 2, [[0.13], [0.87]], state_names={"x": ["x0", "x1"]}),
        TabularCPD("y", 3, [[0.2], [0.3], [0.5]],
                   state_names={"y": ["y0", "y1", "y2"]}),
        TabularCPD(
            "z", 2,
            [[0.01, 0.12, 0.23, 0.34, 0.45, 0.56],
             [0.99, 0.88, 0.77, 0.66, 0.55, 0.44]],
            evidence=["x", "y"], evidence_card=[2, 3],
            state_names={"z": ["z0", "z1"], "x": ["x0", "x1"],
                         "y": ["y0", "y1", "y2"]}))
    return model


def _posterior(model):
    phi = VariableElimination(model).query(
        ["x"], evidence={"z": "z0"}, show_progress=False)
    order = model.get_cpds("x").state_names["x"]
    vals = np.asarray(phi.values, dtype=np.float64)
    return {s: vals[i] for i, s in enumerate(order)}


class TestCrossFormatParity:
    @pytest.mark.parametrize("reader_cls,writer_cls", [
        (BIFReader, BIFWriter),
        (XMLBIFReader, XMLBIFWriter),
        (NETReader, NETWriter),
        (XDSLReader, XDSLWriter),
    ])
    def test_posterior_identical_through_codec(self, reader_cls, writer_cls):
        model = _asym_model()
        text = str(writer_cls(model))
        again = reader_cls(string=text).get_model()
        want = _posterior(model)
        got = _posterior(again)
        for s in want:
            assert got[s] == pytest.approx(want[s], abs=1e-6)

    def test_xbn_roundtrip(self):
        model = _asym_model()
        writer = XBNWriter(model)
        again = XBNReader(string=str(writer)).get_model()
        want = _posterior(model)
        got = _posterior(again)
        for s in want:
            assert got[s] == pytest.approx(want[s], abs=1e-6)

    @pytest.mark.parametrize("ext", ["bif", "xmlbif", "net", "xdsl"])
    def test_file_roundtrip_with_save_load(self, tmp_path, ext):
        model = _asym_model()
        path = str(tmp_path / f"m.{ext}")
        model.save(path)
        again = DiscreteBayesianNetwork.load(path)
        want = _posterior(model)
        got = _posterior(again)
        for s in want:
            assert got[s] == pytest.approx(want[s], abs=1e-6)

    def test_filetype_inference_mismatch(self, tmp_path):
        model = _asym_model()
        with pytest.raises(ValueError):
            model.save(str(tmp_path / "m.unknownext"))


class TestExampleZooIntegrity:
    """The bundled example networks are the fixture backbone — spot-check
    a few parse to valid models with the documented sizes."""

    @pytest.mark.parametrize("name,n_nodes,n_edges", [
        ("asia", 8, 8),
        ("cancer", 5, 4),
        ("alarm", 37, 46),
        ("insurance", 27, 52),
    ])
    def test_zoo_shapes(self, name, n_nodes, n_edges):
        from pgmpy_tpu.utils.utils import get_example_model

        model = get_example_model(name)
        assert len(model.nodes()) == n_nodes
        assert len(model.edges()) == n_edges
        assert model.check_model()

    def test_unknown_example_raises(self):
        from pgmpy_tpu.utils.utils import get_example_model

        with pytest.raises(ValueError):
            get_example_model("not_a_network")
