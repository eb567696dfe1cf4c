"""FactorSet: lazy set-of-factors algebra (product = union, division adds
inverted factors).

Parity: ``/root/reference/pgmpy/factors/FactorSet.py:6-447``.
"""

from functools import reduce


class FactorSet:
    def __init__(self, *factors_args):
        self.factors = set(factors_args)

    def add_factors(self, *factors):
        self.factors.update(factors)

    def remove_factors(self, *factors):
        for factor in factors:
            self.factors.remove(factor)

    def get_factors(self):
        return self.factors

    def product(self, factorset, inplace=True):
        """Product of two factor sets = union of their factors."""
        factor_set = self if inplace else self.copy()
        factor_set.add_factors(*factorset.factors)
        if not inplace:
            return factor_set

    def divide(self, factorset, inplace=True):
        """Division = union with the element-wise inverted factors."""
        factor_set = self if inplace else self.copy()
        inverted = [
            factor.identity_factor().divide(factor, inplace=False)
            for factor in factorset.factors
        ]
        factor_set.add_factors(*inverted)
        if not inplace:
            return factor_set

    def marginalize(self, variables, inplace=True):
        """Marginalize ``variables`` out of every factor containing them."""
        if isinstance(variables, str):
            raise TypeError("Expected list or array-like type got type str")
        factor_set = self if inplace else self.copy()
        to_update = [f for f in factor_set.factors if set(f.scope()) & set(variables)]
        for factor in to_update:
            factor_set.remove_factors(factor)
            factor_set.add_factors(
                factor.marginalize(
                    list(set(factor.scope()) & set(variables)), inplace=False
                )
            )
        if not inplace:
            return factor_set

    def __mul__(self, other):
        return self.product(other, inplace=False)

    def __truediv__(self, other):
        return self.divide(other, inplace=False)

    __div__ = __truediv__

    def __str__(self):
        return self.factors.__str__()

    __repr__ = __str__

    def copy(self):
        return FactorSet(*self.factors)


def factorset_product(*factorsets_list):
    if not all(isinstance(fs, FactorSet) for fs in factorsets_list):
        raise TypeError("Input parameters must be FactorSet instances")
    return reduce(lambda fs1, fs2: fs1.product(fs2, inplace=False), factorsets_list)


def factorset_divide(factorset1, factorset2):
    if not isinstance(factorset1, FactorSet) or not isinstance(factorset2, FactorSet):
        raise TypeError("factorset1 and factorset2 must be FactorSet instances")
    return factorset1.divide(factorset2, inplace=False)
