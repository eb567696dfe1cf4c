import networkx as nx
import pytest

from pgmpy_tpu.base import DAG, PDAG, UndirectedGraph
from pgmpy_tpu.independencies import Independencies, IndependenceAssertion


def student_dag():
    return DAG([("diff", "grade"), ("intel", "grade"), ("grade", "letter"), ("intel", "SAT")])


class TestDAGBasics:
    def test_cycle_rejected(self):
        with pytest.raises(ValueError):
            DAG([("a", "b"), ("b", "c"), ("c", "a")])

    def test_add_edge_cycle_rejected(self):
        dag = DAG([("a", "b")])
        with pytest.raises(ValueError):
            dag.add_edge("b", "a")
        assert not dag.has_edge("b", "a")

    def test_parents_children(self):
        dag = student_dag()
        assert set(dag.get_parents("grade")) == {"diff", "intel"}
        assert set(dag.get_children("intel")) == {"grade", "SAT"}
        assert set(dag.get_leaves()) == {"letter", "SAT"}
        assert set(dag.get_roots()) == {"diff", "intel"}

    def test_markov_blanket(self):
        dag = DAG([("x", "y"), ("z", "y"), ("y", "w")])
        assert set(dag.get_markov_blanket("x")) == {"y", "z"}

    def test_latents(self):
        dag = DAG([("a", "b")], latents=["a"])
        assert dag.latents == {"a"}
        assert dag.observed == {"b"}

    def test_moralize(self):
        moral = student_dag().moralize()
        assert moral.has_edge("diff", "intel")
        assert moral.has_edge("diff", "grade")
        assert not moral.has_edge("diff", "SAT")

    def test_do(self):
        dag = student_dag().do(["grade"])
        assert dag.get_parents("grade") == []
        assert dag.has_edge("grade", "letter")

    def test_copy_independent(self):
        dag = student_dag()
        cp = dag.copy()
        cp.remove_edge("grade", "letter")
        assert dag.has_edge("grade", "letter")


class TestDSeparation:
    def test_active_trail_chain(self):
        chain = DAG([("x", "y"), ("y", "z")])
        assert chain.active_trail_nodes("x")["x"] == {"x", "y", "z"}
        assert chain.active_trail_nodes("x", observed="y")["x"] == {"x"}

    def test_collider(self):
        dag = DAG([("diff", "grade"), ("intel", "grade")])
        # blocked without evidence
        assert not dag.is_dconnected("diff", "intel")
        # opened by conditioning on collider
        assert dag.is_dconnected("diff", "intel", observed="grade")

    def test_descendant_of_collider_opens(self):
        dag = DAG([("a", "c"), ("b", "c"), ("c", "d")])
        assert dag.is_dconnected("a", "b", observed="d")

    def test_minimal_dseparator(self):
        chain = DAG([("x", "y"), ("y", "z")])
        assert chain.minimal_dseparator("x", "z") == {"y"}

    def test_minimal_dseparator_adjacent_raises(self):
        with pytest.raises(ValueError):
            DAG([("x", "y")]).minimal_dseparator("x", "y")

    def test_local_independencies(self):
        ind = student_dag().local_independencies("grade")
        expected = Independencies(["grade", "SAT", {"diff", "intel"}])
        assert ind == expected

    def test_get_independencies_chain(self):
        ind = DAG([("x", "y"), ("y", "z")]).get_independencies()
        assert IndependenceAssertion("x", "z", "y") in ind.get_assertions()


class TestPDAGAndCPDAG:
    def test_immoralities(self):
        dag = DAG([("diff", "grade"), ("intel", "grade"), ("intel", "SAT")])
        assert dag.get_immoralities() == {"grade": [("diff", "intel")]}

    def test_iequivalence(self):
        # chain and fork are I-equivalent; collider is not
        chain = DAG([("x", "y"), ("y", "z")])
        fork = DAG([("y", "x"), ("y", "z")])
        collider = DAG([("x", "y"), ("z", "y")])
        assert chain.is_iequivalent(fork)
        assert not chain.is_iequivalent(collider)

    def test_to_pdag_keeps_vstructure(self):
        dag = DAG([("diff", "grade"), ("intel", "grade"), ("intel", "SAT")])
        pdag = dag.to_pdag()
        assert ("diff", "grade") in pdag.directed_edges
        assert ("intel", "grade") in pdag.directed_edges
        assert pdag.has_undirected_edge("intel", "SAT")

    def test_meek_r1(self):
        pdag = PDAG(directed_ebunch=[("A", "B")], undirected_ebunch=[("B", "C")])
        out = pdag.apply_meeks_rules()
        assert ("B", "C") in out.directed_edges

    def test_meek_r2(self):
        pdag = PDAG(directed_ebunch=[("A", "B"), ("B", "C")], undirected_ebunch=[("A", "C")])
        out = pdag.apply_meeks_rules()
        assert ("A", "C") in out.directed_edges

    def test_to_dag_no_new_vstructures(self):
        pdag = PDAG(
            directed_ebunch=[("A", "B"), ("C", "B")],
            undirected_ebunch=[("C", "D"), ("D", "A")],
        )
        dag = pdag.to_dag()
        assert nx.is_directed_acyclic_graph(dag)
        assert ("A", "B") in dag.edges()
        assert ("C", "B") in dag.edges()
        # no extra immoralities beyond the original one at B
        assert set(dag.get_immoralities().keys()) == {"B"}

    def test_pdag_roundtrip_cpdag(self):
        dag = student_dag()
        back = dag.to_pdag().to_dag()
        assert dag.is_iequivalent(back)


class TestUndirectedGraph:
    def test_clique_and_triangulated(self):
        g = UndirectedGraph([("a", "b"), ("b", "c"), ("a", "c")])
        assert g.is_clique(["a", "b", "c"])
        assert g.is_triangulated()
        g2 = UndirectedGraph([("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
        assert not g2.is_triangulated()


class TestParsers:
    def test_lavaan(self):
        dag = DAG.from_lavaan(string="y ~ x1 + x2\nf =~ y1 + y2")
        assert ("x1", "y") in dag.edges()
        assert ("f", "y1") in dag.edges()
        assert "f" in dag.latents

    def test_dagitty(self):
        dag = DAG.from_dagitty(string='dag { x -> y ; u [latent] ; u -> x ; u -> y }')
        assert ("x", "y") in dag.edges()
        assert dag.latents == {"u"}

    def test_roundtrip_dagitty(self):
        dag = student_dag()
        dag2 = DAG.from_dagitty(string=dag.to_dagitty())
        assert set(dag2.edges()) == set(dag.edges())


class TestIndependencies:
    def test_closure_symmetry(self):
        ind = Independencies(["a", "b"])
        closure = ind.closure()
        assert IndependenceAssertion("b", "a") in closure.get_assertions()

    def test_closure_weak_union(self):
        ind = Independencies(["a", ["b", "c"]])
        closure = ind.closure()
        assert IndependenceAssertion("a", "b", "c") in closure.get_assertions()

    def test_entails(self):
        ind = Independencies(["a", ["b", "c"]])
        assert ind.entails(Independencies(["a", "b"]))
        assert not ind.entails(Independencies(["b", "c"]))

    def test_reduce(self):
        ind = Independencies(["a", ["b", "c"]], ["a", "b"])
        reduced = ind.reduce()
        assert len(reduced) == 1

    def test_equality_unordered(self):
        i1 = Independencies(["a", "b"], ["c", "d"])
        i2 = Independencies(["c", "d"], ["b", "a"])
        assert i1 == i2


class TestRandomDAG:
    def test_random_is_dag(self):
        dag = DAG.get_random(n_nodes=8, edge_prob=0.5, seed=0)
        assert nx.is_directed_acyclic_graph(dag)
        assert len(dag.nodes()) == 8

    def test_random_latents(self):
        dag = DAG.get_random(n_nodes=8, edge_prob=0.3, latents=True, seed=3)
        assert dag.latents <= set(dag.nodes())


class TestPlotting:
    def test_to_daft_importerror_without_dep(self):
        from pgmpy_tpu.base import DAG

        dag = DAG([("a", "b")])
        try:
            import daft  # noqa: F401

            pgm = dag.to_daft()
            assert pgm is not None
        except ImportError:
            import pytest

            with pytest.raises(ImportError, match="daft"):
                dag.to_daft()

    def test_to_daft_bad_layout(self):
        from pgmpy_tpu.base import DAG
        import pytest

        dag = DAG([("a", "b")])
        pytest.importorskip("daft")
        with pytest.raises(ValueError):
            dag.to_daft(node_pos="bogus")

    def test_to_graphviz(self):
        from pgmpy_tpu.base import DAG
        import pytest

        pytest.importorskip("pygraphviz")
        dag = DAG([("a", "b")])
        agraph = dag.to_graphviz()
        assert set(agraph.nodes()) == {"a", "b"}
