"""FactorDict: clique -> factor mapping used by junction trees and
marginal-based estimators.

Parity: ``/root/reference/pgmpy/factors/FactorDict.py:13-75``.
"""

import numpy as np

from pgmpy_tpu.factors.discrete import DiscreteFactor


class FactorDict(dict):
    def get_factors(self):
        """Set of the contained factors (ref FactorDict.py:52)."""
        return set(self.values())

    @classmethod
    def from_dataframe(cls, df, marginals):
        """Empirical (count) marginals of ``df`` over each clique in
        ``marginals``."""
        factor_dict = cls()
        for clique in marginals:
            clique = tuple(clique)
            sub = df.loc[:, list(clique)]
            state_names = {v: sorted(sub[v].unique().tolist()) for v in clique}
            cards = [len(state_names[v]) for v in clique]
            codes = np.stack(
                [sub[v].map({s: i for i, s in enumerate(state_names[v])}).to_numpy() for v in clique],
                axis=1,
            )
            flat = np.ravel_multi_index(codes.T, cards)
            counts = np.bincount(flat, minlength=int(np.prod(cards))).astype(float)
            factor_dict[clique] = DiscreteFactor(
                list(clique), cards, counts, state_names=state_names
            )
        return factor_dict

    def dot(self, other):
        """Sum over cliques of <self[clique], other[clique]> (flattened)."""
        total = 0.0
        for clique, factor in self.items():
            other_factor = other[clique]
            a = np.asarray(factor.values, dtype=np.float64).ravel()
            b = np.asarray(other_factor.values, dtype=np.float64).ravel()
            total += float(a @ b)
        return total

    def product(self):
        """Product of all factors in the dict."""
        from pgmpy_tpu.factors.factor_ops import factor_product

        factors = list(self.values())
        return factor_product(*factors)
