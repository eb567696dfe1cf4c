"""Conditional-independence assertion sets.

Host-side symbolic machinery with behavior parity to the reference
(``/root/reference/pgmpy/independencies/Independencies.py:6-531``):
assertion containers, the semi-graphoid closure (symmetry, decomposition,
weak union, contraction) and entailment/reduction over it.  Pure Python —
nothing here touches the device.
"""

import itertools


class IndependenceAssertion:
    """(X ⟂ Y | Z): ``event1`` independent of ``event2`` given ``event3``."""

    def __init__(self, event1=[], event2=[], event3=[]):
        if event1 and not event2:
            raise ValueError("event2 needs to be specified")
        if any([event2, event3]) and not event1:
            raise ValueError("event1 needs to be specified")
        if event3 and not all([event1, event2]):
            raise ValueError(
                "event1 and event2 need to be specified before event3 can be specified"
            )
        self.event1 = frozenset(self._to_iterable(event1))
        self.event2 = frozenset(self._to_iterable(event2))
        self.event3 = frozenset(self._to_iterable(event3))
        self.all_vars = frozenset().union(self.event1, self.event2, self.event3)

    @staticmethod
    def _to_iterable(event):
        if isinstance(event, str) or not hasattr(event, "__iter__"):
            return [event]
        return event

    def __str__(self):
        e1 = ", ".join(sorted(map(str, self.event1)))
        e2 = ", ".join(sorted(map(str, self.event2)))
        if self.event3:
            e3 = ", ".join(sorted(map(str, self.event3)))
            return f"({e1} ⟂ {e2} | {e3})"
        return f"({e1} ⟂ {e2})"

    __repr__ = __str__

    def __eq__(self, other):
        if not isinstance(other, IndependenceAssertion):
            return False
        return (self.event3 == other.event3) and (
            {self.event1, self.event2} == {other.event1, other.event2}
        )

    def __ne__(self, other):
        return not self.__eq__(other)

    def __hash__(self):
        return hash((frozenset((self.event1, self.event2)), self.event3))

    def get_assertion(self):
        return self.event1, self.event2, self.event3

    def latex_string(self):
        e1 = ", ".join(sorted(map(str, self.event1)))
        e2 = ", ".join(sorted(map(str, self.event2)))
        e3 = ", ".join(sorted(map(str, self.event3)))
        return rf"{e1} \perp {e2} \mid {e3}"


class Independencies:
    """A set of CI assertions with semi-graphoid reasoning.

    Examples
    --------
    >>> from pgmpy_tpu.independencies import Independencies
    >>> ind = Independencies(["X", ["Y", "Z"]])
    >>> print(ind)
    (X ⟂ Y, Z)
    >>> ind.entails(Independencies(["X", "Y"]))  # decomposition axiom
    True
    >>> len(ind.closure().get_assertions())
    5
    """

    def __init__(self, *assertions):
        self.independencies = []
        self.add_assertions(*assertions)

    def __str__(self):
        return "\n".join(str(a) for a in self.independencies)

    __repr__ = __str__

    def __eq__(self, other):
        if not isinstance(other, Independencies):
            return False
        return all(a in other.get_assertions() for a in self.get_assertions()) and all(
            a in self.get_assertions() for a in other.get_assertions()
        )

    def __ne__(self, other):
        return not self.__eq__(other)

    def __len__(self):
        return len(self.independencies)

    def __iter__(self):
        return iter(self.independencies)

    def contains(self, assertion):
        if not isinstance(assertion, IndependenceAssertion):
            raise TypeError(
                f"' in <Independencies()>' requires IndependenceAssertion as left operand, not {type(assertion)}"
            )
        return assertion in self.get_assertions()

    __contains__ = contains

    def get_all_variables(self):
        return frozenset().union(*[a.all_vars for a in self.independencies]) if self.independencies else frozenset()

    def get_assertions(self):
        return self.independencies

    def add_assertions(self, *assertions):
        for assertion in assertions:
            if isinstance(assertion, IndependenceAssertion):
                self.independencies.append(assertion)
            else:
                try:
                    self.independencies.append(
                        IndependenceAssertion(assertion[0], assertion[1], assertion[2])
                    )
                except IndexError:
                    self.independencies.append(
                        IndependenceAssertion(assertion[0], assertion[1])
                    )

    def closure(self):
        """Complete the set under the semi-graphoid axioms.

        Uses symmetry, decomposition, weak union and contraction applied to a
        fixpoint (Pearl 1988).
        """

        def single_rules(ind):
            # symmetry
            out = {IndependenceAssertion(ind.event2, ind.event1, ind.event3)}
            # decomposition + weak union over all splits of event2
            e2 = list(ind.event2)
            for r in range(1, len(e2)):
                for subset in itertools.combinations(e2, r):
                    rest = ind.event2 - set(subset)
                    # decomposition: X ⟂ YW | Z  =>  X ⟂ Y | Z
                    out.add(IndependenceAssertion(ind.event1, set(subset), ind.event3))
                    # weak union: X ⟂ YW | Z  =>  X ⟂ Y | ZW
                    out.add(
                        IndependenceAssertion(
                            ind.event1, set(subset), ind.event3 | rest
                        )
                    )
            return out

        def contraction(ind1, ind2):
            # X ⟂ W | ZY  and  X ⟂ Y | Z  =>  X ⟂ WY | Z
            out = set()
            for a, b in ((ind1, ind2), (ind2, ind1)):
                for x1, w in ((a.event1, a.event2), (a.event2, a.event1)):
                    for x2, y in ((b.event1, b.event2), (b.event2, b.event1)):
                        if x1 == x2 and a.event3 == (b.event3 | y):
                            out.add(IndependenceAssertion(x1, w | y, b.event3))
            return out

        all_independencies = set()
        new_inds = set(self.independencies)
        while new_inds:
            new_pairs = (
                set(itertools.permutations(new_inds, 2))
                | set(itertools.product(new_inds, all_independencies))
                | set(itertools.product(all_independencies, new_inds))
            )
            all_independencies |= new_inds
            derived = set()
            for ind in new_inds:
                derived |= single_rules(ind)
            for ind1, ind2 in new_pairs:
                derived |= contraction(ind1, ind2)
            new_inds = derived - all_independencies

        return Independencies(*list(all_independencies))

    def entails(self, entailed_independencies):
        """True if every assertion in ``entailed_independencies`` follows
        from this set under the semi-graphoid axioms."""
        if not isinstance(entailed_independencies, Independencies):
            return False
        closure = set(self.closure().get_assertions())
        return all(
            a in closure for a in entailed_independencies.get_assertions()
        )

    def is_equivalent(self, other):
        return self.entails(other) and other.entails(self)

    def get_factorized_product(self, random_variables=None, latex=False):
        """Unimplemented in the reference as well (ref Independencies.py:387-396
        is a bare TODO) — kept for API parity."""
        return None

    def reduce(self, inplace=False):
        """Remove assertions that are entailed by the remaining ones."""
        kept = list(self.independencies)
        i = 0
        while i < len(kept):
            candidate = kept[i]
            rest = Independencies(*[a for j, a in enumerate(kept) if j != i])
            if rest.entails(Independencies(candidate)):
                kept.pop(i)
            else:
                i += 1
        if inplace:
            self.independencies = kept
            return self
        return Independencies(*kept)

    def latex_string(self):
        return [a.latex_string() for a in self.independencies]
