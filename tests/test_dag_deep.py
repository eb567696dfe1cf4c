"""Deep DAG/PDAG semantics tests.

Mirrors the coverage depth of the reference suite
(/root/reference/pgmpy/tests/test_base/test_DAG.py, 2213 LoC) with an
independent oracle: brute-force path-based d-separation (enumerate every
undirected path, apply the blocking rules directly) checked against the
Bayes-ball implementation over exhaustive (x, y, Z) triples on a zoo of
small graphs.
"""

import itertools

import networkx as nx
import pytest

from pgmpy_tpu.base import DAG, PDAG


# --------------------------------------------------------------------- #
# brute-force d-separation oracle (path definition, independent of the
# Bayes-ball implementation under test)
# --------------------------------------------------------------------- #
def _all_undirected_paths(dag, x, y):
    g = dag.to_undirected()
    return list(nx.all_simple_paths(g, x, y))


def _path_is_active(dag, path, z):
    """Pearl's rules: a path is active given Z iff every chain/fork node on
    it is outside Z and every collider is in Z or has a descendant in Z."""
    z = set(z)
    for i in range(1, len(path) - 1):
        prev, node, nxt = path[i - 1], path[i], path[i + 1]
        into_left = dag.has_edge(prev, node)
        into_right = dag.has_edge(nxt, node)
        if into_left and into_right:  # collider
            desc = set(nx.descendants(dag, node)) | {node}
            if not (desc & z):
                return False
        else:  # chain or fork
            if node in z:
                return False
    return True


def _brute_dconnected(dag, x, y, z):
    return any(_path_is_active(dag, p, z) for p in _all_undirected_paths(dag, x, y))


GRAPH_ZOO = [
    # classic chain / fork / collider
    [("A", "B"), ("B", "C")],
    [("B", "A"), ("B", "C")],
    [("A", "B"), ("C", "B")],
    # diamond
    [("A", "B"), ("A", "C"), ("B", "D"), ("C", "D")],
    # collider with descendant
    [("A", "C"), ("B", "C"), ("C", "D")],
    # M-graph
    [("A", "B"), ("C", "B"), ("C", "D"), ("E", "D")],
    # Koller & Friedman student network shape
    [("D", "G"), ("I", "G"), ("G", "L"), ("I", "S"), ("S", "J"), ("L", "J")],
    # dense 5-node
    [("A", "B"), ("A", "C"), ("B", "D"), ("C", "D"), ("B", "E"), ("D", "E")],
]


@pytest.mark.parametrize("edges", GRAPH_ZOO, ids=range(len(GRAPH_ZOO)))
def test_dsep_matches_brute_force(edges):
    dag = DAG(edges)
    nodes = sorted(dag.nodes())
    for x, y in itertools.combinations(nodes, 2):
        others = [n for n in nodes if n not in (x, y)]
        for r in range(len(others) + 1):
            for z in itertools.combinations(others, r):
                got = dag.is_dconnected(x, y, observed=list(z) or None)
                want = _brute_dconnected(dag, x, y, z)
                assert got == want, (edges, x, y, z, got, want)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_dsep_matches_brute_force_random(seed):
    dag = DAG.get_random(n_nodes=6, edge_prob=0.4, seed=seed)
    nodes = sorted(dag.nodes(), key=str)
    for x, y in itertools.combinations(nodes, 2):
        others = [n for n in nodes if n not in (x, y)]
        for z in itertools.combinations(others, 2):
            got = dag.is_dconnected(x, y, observed=list(z))
            want = _brute_dconnected(dag, x, y, z)
            assert got == want


# --------------------------------------------------------------------- #
# hand goldens for the classic structures
# --------------------------------------------------------------------- #
class TestCanonicalTriples:
    def test_chain(self):
        dag = DAG([("A", "B"), ("B", "C")])
        assert dag.is_dconnected("A", "C")
        assert not dag.is_dconnected("A", "C", observed=["B"])

    def test_fork(self):
        dag = DAG([("B", "A"), ("B", "C")])
        assert dag.is_dconnected("A", "C")
        assert not dag.is_dconnected("A", "C", observed=["B"])

    def test_collider(self):
        dag = DAG([("A", "B"), ("C", "B")])
        assert not dag.is_dconnected("A", "C")
        assert dag.is_dconnected("A", "C", observed=["B"])

    def test_collider_descendant_activates(self):
        dag = DAG([("A", "C"), ("B", "C"), ("C", "D")])
        assert not dag.is_dconnected("A", "B")
        assert dag.is_dconnected("A", "B", observed=["D"])

    def test_student_network_goldens(self):
        dag = DAG(
            [("diff", "grade"), ("intel", "grade"), ("grade", "letter"),
             ("intel", "sat")]
        )
        assert not dag.is_dconnected("diff", "intel")
        assert dag.is_dconnected("diff", "intel", observed=["grade"])
        assert dag.is_dconnected("diff", "intel", observed=["letter"])
        assert dag.is_dconnected("diff", "letter")
        assert not dag.is_dconnected("diff", "letter", observed=["grade"])
        assert dag.is_dconnected("diff", "sat", observed=["grade"])
        assert not dag.is_dconnected("diff", "sat")
        assert not dag.is_dconnected(
            "grade", "sat", observed=["intel"]
        )


class TestActiveTrailNodes:
    def test_no_evidence(self):
        dag = DAG([("D", "G"), ("I", "G"), ("G", "L"), ("I", "S")])
        assert dag.active_trail_nodes("D")["D"] == {"D", "G", "L"}
        assert dag.active_trail_nodes("I")["I"] == {"I", "G", "L", "S"}

    def test_with_evidence(self):
        dag = DAG([("D", "G"), ("I", "G"), ("G", "L"), ("I", "S")])
        assert dag.active_trail_nodes("D", observed="G")["D"] == {"D", "I", "S"}
        # L is evidence -> collider G activated through its descendant
        assert "I" in dag.active_trail_nodes("D", observed="L")["D"]

    def test_multiple_starts(self):
        dag = DAG([("A", "B"), ("B", "C")])
        out = dag.active_trail_nodes(["A", "C"], observed="B")
        assert out["A"] == {"A"}
        assert out["C"] == {"C"}

    def test_latents_excluded_by_default(self):
        dag = DAG([("L", "X"), ("L", "Y")], latents=["L"])
        trail = dag.active_trail_nodes("X")["X"]
        assert "L" not in trail and "Y" in trail
        trail = dag.active_trail_nodes("X", include_latents=True)["X"]
        assert "L" in trail


class TestMinimalDseparator:
    def test_chain(self):
        dag = DAG([("A", "B"), ("B", "C")])
        assert dag.minimal_dseparator("A", "C") == {"B"}

    def test_diamond(self):
        dag = DAG([("A", "B"), ("A", "C"), ("B", "D"), ("C", "D")])
        assert dag.minimal_dseparator("A", "D") == {"B", "C"}

    def test_adjacent_raises(self):
        dag = DAG([("A", "B")])
        with pytest.raises(ValueError):
            dag.minimal_dseparator("A", "B")

    def test_returned_set_separates_and_is_minimal(self):
        for seed in range(6):
            dag = DAG.get_random(n_nodes=7, edge_prob=0.3, seed=seed)
            nodes = sorted(dag.nodes(), key=str)
            for x, y in itertools.combinations(nodes, 2):
                if dag.has_edge(x, y) or dag.has_edge(y, x):
                    continue
                sep = dag.minimal_dseparator(x, y)
                if sep is None:
                    continue
                assert not _brute_dconnected(dag, x, y, sep)
                for drop in sep:
                    assert _brute_dconnected(dag, x, y, sep - {drop}), (
                        "separator not minimal", x, y, sep, drop)

    def test_latent_avoidance(self):
        dag = DAG([("A", "L"), ("L", "B"), ("A", "C"), ("C", "B")],
                  latents=["L"])
        sep = dag.minimal_dseparator("A", "B")
        assert sep is None or "L" not in sep


class TestMoralizeAndBlanket:
    def test_moralize_marries_parents(self):
        dag = DAG([("A", "C"), ("B", "C")])
        moral = dag.moralize()
        assert moral.has_edge("A", "B")
        assert moral.has_edge("A", "C") and moral.has_edge("B", "C")

    def test_moralize_diamond(self):
        dag = DAG([("A", "B"), ("A", "C"), ("B", "D"), ("C", "D")])
        moral = dag.moralize()
        assert set(map(frozenset, moral.edges())) == {
            frozenset(e) for e in
            [("A", "B"), ("A", "C"), ("B", "D"), ("C", "D"), ("B", "C")]
        }

    def test_markov_blanket_definition(self):
        for seed in range(5):
            dag = DAG.get_random(n_nodes=8, edge_prob=0.3, seed=seed)
            for node in dag.nodes():
                parents = set(dag.get_parents(node))
                children = set(dag.get_children(node))
                coparents = set()
                for c in children:
                    coparents |= set(dag.get_parents(c))
                want = (parents | children | coparents) - {node}
                assert set(dag.get_markov_blanket(node)) == want

    def test_ancestral_graph(self):
        dag = DAG([("A", "B"), ("B", "C"), ("D", "C"), ("C", "E")])
        anc = dag.get_ancestral_graph(["C"])
        assert set(anc.nodes()) == {"A", "B", "C", "D"}
        anc = dag.get_ancestral_graph(["B"])
        assert set(anc.nodes()) == {"A", "B"}


class TestImmoralitiesAndEquivalence:
    def test_immoralities_golden(self):
        dag = DAG([("A", "C"), ("B", "C"), ("C", "D")])
        assert dag.get_immoralities() == {"C": [("A", "B")]}

    def test_married_parents_not_immoral(self):
        dag = DAG([("A", "C"), ("B", "C"), ("A", "B")])
        assert dag.get_immoralities() == {}

    def test_iequivalence_chain_fork(self):
        chain = DAG([("A", "B"), ("B", "C")])
        rev = DAG([("C", "B"), ("B", "A")])
        fork = DAG([("B", "A"), ("B", "C")])
        collider = DAG([("A", "B"), ("C", "B")])
        assert chain.is_iequivalent(rev)
        assert chain.is_iequivalent(fork)
        assert not chain.is_iequivalent(collider)

    def test_iequivalence_different_skeleton(self):
        a = DAG([("A", "B"), ("B", "C")])
        b = DAG([("A", "B"), ("A", "C")])
        nodes_match = set(a.nodes()) == set(b.nodes())
        assert nodes_match and not a.is_iequivalent(b)


class TestPDAGAndCPDAG:
    def test_to_pdag_preserves_immorality(self):
        dag = DAG([("A", "C"), ("B", "C")])
        pdag = dag.to_pdag()
        assert ("A", "C") in pdag.directed_edges
        assert ("B", "C") in pdag.directed_edges

    def test_to_pdag_chain_fully_undirected(self):
        dag = DAG([("A", "B"), ("B", "C")])
        pdag = dag.to_pdag()
        assert len(pdag.directed_edges) == 0
        assert {frozenset(e) for e in pdag.undirected_edges} == {
            frozenset(("A", "B")), frozenset(("B", "C"))}

    def test_pdag_to_dag_roundtrip_equivalence_class(self):
        for seed in range(8):
            dag = DAG.get_random(n_nodes=6, edge_prob=0.4, seed=seed)
            ext = dag.to_pdag().to_dag()
            # extension must be in the same Markov equivalence class
            assert {frozenset(e) for e in ext.edges()} == {
                frozenset(e) for e in dag.edges()}
            assert ext.get_immoralities() == dag.get_immoralities()

    def test_meek_rule_1(self):
        # A->B with B-C and A,C nonadjacent: orient B->C
        pdag = PDAG(directed_ebunch=[("A", "B")], undirected_ebunch=[("B", "C")])
        out = pdag.apply_meeks_rules(inplace=False)
        assert ("B", "C") in out.directed_edges

    def test_meek_rule_2(self):
        # A->B->C with A-C: orient A->C
        pdag = PDAG(directed_ebunch=[("A", "B"), ("B", "C")],
                    undirected_ebunch=[("A", "C")])
        out = pdag.apply_meeks_rules(inplace=False)
        assert ("A", "C") in out.directed_edges


class TestDoOperator:
    def test_do_removes_in_edges(self):
        dag = DAG([("A", "B"), ("C", "B"), ("B", "D")])
        done = dag.do(["B"])
        assert set(done.edges()) == {("B", "D")}
        assert set(done.nodes()) == {"A", "B", "C", "D"}

    def test_do_multiple(self):
        dag = DAG([("A", "B"), ("B", "C"), ("A", "C")])
        done = dag.do(["B", "C"])
        assert set(done.edges()) == set()

    def test_do_not_inplace_by_default(self):
        dag = DAG([("A", "B")])
        dag.do(["B"])
        assert set(dag.edges()) == {("A", "B")}


class TestConstructionAndParsers:
    def test_cycle_rejected(self):
        with pytest.raises(ValueError):
            DAG([("A", "B"), ("B", "C"), ("C", "A")])

    def test_self_loop_rejected(self):
        with pytest.raises(ValueError):
            DAG([("A", "A")])

    def test_latents_tracked(self):
        dag = DAG([("L", "X")], latents=["L"])
        assert dag.latents == {"L"}

    def test_from_lavaan_regression(self):
        dag = DAG.from_lavaan("y ~ x1 + x2\nx2 ~ x1")
        assert set(dag.edges()) == {("x1", "y"), ("x2", "y"), ("x1", "x2")}

    def test_from_lavaan_latent(self):
        dag = DAG.from_lavaan("f =~ a + b\n")
        assert set(dag.edges()) == {("f", "a"), ("f", "b")}
        assert "f" in dag.latents

    def test_from_dagitty(self):
        dag = DAG.from_dagitty('dag{ x -> y ; z -> y }')
        assert set(dag.edges()) == {("x", "y"), ("z", "y")}

    def test_lavaan_roundtrip(self):
        dag = DAG([("x", "y"), ("z", "y")])
        again = DAG.from_lavaan(dag.to_lavaan())
        assert set(again.edges()) == set(dag.edges())

    def test_dagitty_roundtrip(self):
        dag = DAG([("x", "y"), ("z", "y")])
        again = DAG.from_dagitty(dag.to_dagitty())
        assert set(again.edges()) == set(dag.edges())

    def test_get_random_properties(self):
        dag = DAG.get_random(n_nodes=10, edge_prob=0.5, seed=7)
        assert nx.is_directed_acyclic_graph(dag)
        assert len(dag.nodes()) == 10
        again = DAG.get_random(n_nodes=10, edge_prob=0.5, seed=7)
        assert set(again.edges()) == set(dag.edges())

    def test_get_random_latents(self):
        dag = DAG.get_random(n_nodes=6, edge_prob=0.5, latents=True, seed=3)
        assert dag.latents <= set(dag.nodes())

    def test_roots_and_leaves(self):
        dag = DAG([("A", "B"), ("B", "C"), ("A", "C")])
        assert set(dag.get_roots()) == {"A"}
        assert set(dag.get_leaves()) == {"C"}

    def test_eq_ignores_edge_insertion_order(self):
        a = DAG([("A", "B"), ("C", "B")])
        b = DAG([("C", "B"), ("A", "B")])
        assert a == b

    def test_copy_independent(self):
        a = DAG([("A", "B")], latents=["A"])
        b = a.copy()
        b.add_edge("B", "C")
        assert "C" not in a.nodes()
        assert b.latents == {"A"}


class TestLocalIndependencies:
    def test_chain_local(self):
        dag = DAG([("A", "B"), ("B", "C")])
        ind = dag.local_independencies("C")
        # C independent of A given B
        assertions = ind.get_assertions()
        assert len(assertions) == 1
        a = assertions[0]
        assert a.event1 == {"C"} and a.event2 == {"A"} and a.event3 == {"B"}

    def test_root_no_parents(self):
        dag = DAG([("A", "B"), ("C", "B")])
        ind = dag.local_independencies("A")
        a = ind.get_assertions()[0]
        assert a.event1 == {"A"} and a.event2 == {"C"} and a.event3 == set()

    def test_get_independencies_complete_graph_empty(self):
        dag = DAG([("A", "B"), ("A", "C"), ("B", "C")])
        assert dag.get_independencies().get_assertions() == []

    def test_get_independencies_sound(self):
        for seed in range(4):
            dag = DAG.get_random(n_nodes=6, edge_prob=0.4, seed=seed)
            for a in dag.get_independencies().get_assertions():
                for x in a.event1:
                    for y in a.event2:
                        assert not _brute_dconnected(dag, x, y, a.event3)
