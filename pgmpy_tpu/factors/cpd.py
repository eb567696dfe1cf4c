"""TabularCPD: a conditional probability distribution P(variable | evidence).

Behavior-parity rebuild of the reference CPD
(``/root/reference/pgmpy/factors/discrete/CPD.py:20-899``) on top of the
JAX-backed :class:`~pgmpy_tpu.factors.discrete.DiscreteFactor`.  Axis layout
matches the reference: factor variables are ``[variable] + evidence`` and the
2-D constructor values have shape ``(variable_card, prod(evidence_card))``
with the last evidence variable cycling fastest.
"""

__doc__ += """

Examples
--------
>>> import numpy as np
>>> from pgmpy_tpu.factors import TabularCPD
>>> cpd = TabularCPD("grade", 2,
...                  [[0.9, 0.6, 0.3], [0.1, 0.4, 0.7]],
...                  evidence=["intel"], evidence_card=[3])
>>> cpd.variable, cpd.variables
('grade', ['grade', 'intel'])
>>> np.asarray(cpd.get_values(), dtype=float).round(1).tolist()
[[0.9, 0.6, 0.3], [0.1, 0.4, 0.7]]
>>> phi = cpd.to_factor()
>>> np.asarray(phi.marginalize(["grade"], inplace=False).values,
...            dtype=float).round(1).tolist()
[1.0, 1.0, 1.0]
"""

import numbers
from itertools import chain

import jax.numpy as jnp
import numpy as np

from pgmpy_tpu.config import config, logger
from pgmpy_tpu.factors.discrete import DiscreteFactor


class TabularCPD(DiscreteFactor):
    def __init__(
        self,
        variable,
        variable_card,
        values,
        evidence=None,
        evidence_card=None,
        state_names={},
    ):
        self.variable = variable
        if not isinstance(variable_card, numbers.Integral):
            raise TypeError("Event cardinality must be an integer")
        self.variable_card = int(variable_card)

        variables = [variable]
        cardinality = [self.variable_card]
        if evidence_card is not None:
            if isinstance(evidence_card, numbers.Real):
                raise TypeError("Evidence card must be a list of numbers")
            cardinality.extend(int(c) for c in evidence_card)
        if evidence is not None:
            if isinstance(evidence, str):
                raise TypeError("Evidence must be list, tuple or array of strings.")
            if evidence_card is None:
                raise ValueError("Evidence card must be provided if Evidence is provided!")
            if len(evidence_card) != len(evidence):
                raise ValueError("Length of evidence_card doesn't match length of evidence")
            variables.extend(evidence)

        values = np.asarray(values)
        if values.ndim != 2:
            raise TypeError("Values must be a 2D list/array")
        expected_shape = (
            (self.variable_card, 1)
            if evidence is None
            else (self.variable_card, int(np.prod([int(c) for c in evidence_card])))
        )
        if values.shape != expected_shape:
            raise ValueError(
                f"values must be of shape {expected_shape}. Got shape: {values.shape}"
            )
        if not isinstance(state_names, dict):
            raise ValueError(f"state_names must be of type dict. Got {type(state_names)}")

        super().__init__(variables, cardinality, values.flatten(), state_names=state_names)
        # validity decided here while the values are still host-side numpy:
        # check_model on large networks must not pay one device round-trip
        # per CPD (minutes over a remote TPU link)
        self._is_valid_cpd = bool(
            np.allclose(values.astype(np.float64).sum(axis=0), 1.0, atol=0.01)
        )

    @classmethod
    def _from_device_values(
        cls,
        variable,
        variable_card,
        device_values,
        evidence,
        evidence_card,
        state_names,
        is_valid,
    ):
        """Fast constructor for batched model loading: ``device_values`` is
        an already-shaped, already-on-device array (one ``jax.device_put``
        for the WHOLE model instead of one transfer + eager reshape compile
        per CPD — the reference loads MUNIN's 1041 CPDs one pandas table at
        a time, ``readwrite/BIF.py:361``).  Validity is computed host-side
        by the caller before packing."""
        cpd = cls.__new__(cls)
        cpd.variable = variable
        cpd.variable_card = int(variable_card)
        evidence = list(evidence or [])
        cpd.variables = [variable] + evidence
        cpd.cardinality = np.asarray(
            [variable_card] + [int(c) for c in (evidence_card or [])], dtype=np.int64
        )
        cpd._values = device_values
        cpd.store_state_names(
            cpd.variables, [int(c) for c in cpd.cardinality], state_names
        )
        cpd._is_valid_cpd = bool(is_valid)
        return cpd

    def __repr__(self):
        evidence = self.variables[1:]
        evidence_card = self.cardinality[1:]
        s = f"<TabularCPD representing P({self.variable}:{self.variable_card}"
        if evidence:
            s += " | " + ", ".join(
                f"{var}:{int(card)}" for var, card in zip(evidence, evidence_card)
            )
        return s + f") at {hex(id(self))}>"

    def get_values(self):
        """CPD as a 2-D array (rows = variable states, cols = evidence
        configurations, last evidence fastest)."""
        if self.variable in self.variables:
            return np.asarray(self.values).reshape(
                self.cardinality[0], int(np.prod(self.cardinality[1:]))
            )
        return np.asarray(self.values).reshape(int(np.prod(self.cardinality)), 1)

    def __str__(self):
        return self._make_table_str(tablefmt="grid")

    def _make_table_str(self, tablefmt="grid", print_state_names=True):
        from pgmpy_tpu.utils.tabulate import tabulate

        headers_list = []
        evidence = self.variables[1:]
        evidence_card = [int(c) for c in self.cardinality[1:]]
        if evidence:
            col_indexes = np.array(
                [list(i) for i in np.ndindex(*evidence_card)]
            )
            for i, var in enumerate(evidence):
                row = [str(var)] + [
                    f"{var}({self.state_names[var][d]})" if print_state_names else f"{var}_{d}"
                    for d in col_indexes.T[i]
                ]
                headers_list.append(row)
        var_rows = []
        values = self.get_values()
        for i in range(self.variable_card):
            name = (
                f"{self.variable}({self.state_names[self.variable][i]})"
                if print_state_names
                else f"{self.variable}_{i}"
            )
            var_rows.append([name] + [float(v) for v in values[i]])
        all_rows = headers_list + var_rows
        return tabulate(all_rows, tablefmt=tablefmt, floatfmt=".4f")

    def copy(self):
        evidence = self.variables[1:] or None
        evidence_card = [int(c) for c in self.cardinality[1:]] or None
        return TabularCPD(
            self.variable,
            self.variable_card,
            self.get_values(),
            evidence=evidence,
            evidence_card=evidence_card,
            state_names={k: list(v) for k, v in self.state_names.items()},
        )

    def normalize(self, inplace=True):
        """Rescale each column (evidence configuration) to sum to 1."""
        cpd = self if inplace else self.copy()
        vals = cpd.values
        col_sums = jnp.sum(vals, axis=0, keepdims=True)
        cpd.values = vals / col_sums
        cpd._is_valid_cpd = True
        if not inplace:
            return cpd

    def marginalize(self, variables, inplace=True):
        if self.variable in variables:
            raise ValueError(
                "Marginalization not allowed on the variable on which CPD is defined"
            )
        cpd = self if inplace else self.copy()
        DiscreteFactor.marginalize(cpd, variables)
        cpd.normalize()
        if not inplace:
            return cpd

    def reduce(self, values, inplace=True, show_warnings=True):
        if self.variable in (value[0] for value in values):
            raise ValueError("Reduce not allowed on the variable on which CPD is defined")
        cpd = self if inplace else self.copy()
        DiscreteFactor.reduce(cpd, values, show_warnings=show_warnings)
        cpd.normalize()
        if not inplace:
            return cpd

    def to_factor(self):
        phi = DiscreteFactor.__new__(DiscreteFactor)
        phi.variables = list(self.variables)
        phi.cardinality = self.cardinality.copy()
        phi.values = self.values
        phi.state_names = {k: list(v) for k, v in self.state_names.items()}
        phi.name_to_no = {k: dict(v) for k, v in self.name_to_no.items()}
        phi.no_to_name = {k: dict(v) for k, v in self.no_to_name.items()}
        return phi

    def reorder_parents(self, new_order, inplace=True):
        """Permute the evidence variables into ``new_order``; returns the 2-D
        values in the new order (reference semantics ``CPD.py:598-730``)."""
        current = self.variables[1:]
        if len(current) < 2 or set(new_order) - set(current):
            raise ValueError("New order either has missing or extra arguments")
        if new_order == current:
            logger.warning("Same ordering provided as current")
            return self.get_values()
        axes = [0] + [current.index(var) + 1 for var in new_order]
        new_values = jnp.transpose(self.values, axes)
        if inplace:
            self.variables = [self.variable] + list(new_order)
            self.cardinality = self.cardinality[axes]
            self.values = new_values
            return self.get_values()
        return np.asarray(new_values).reshape(
            self.cardinality[0], int(np.prod([new_values.shape[i] for i in range(1, new_values.ndim)]))
        )

    def get_evidence(self):
        return self.variables[:0:-1]

    def to_dataframe(self):
        """CPD as a pandas DataFrame with evidence-configuration MultiIndex."""
        import pandas as pd

        evidence = self.variables[1:]
        values = self.get_values().T
        columns = pd.Index(self.state_names[self.variable], name=self.variable)
        if evidence:
            index = pd.MultiIndex.from_product(
                [self.state_names[v] for v in evidence], names=evidence
            )
        else:
            index = pd.Index([0])
        return pd.DataFrame(values, index=index, columns=columns)

    def to_csv(self, filename):
        self.to_dataframe().to_csv(filename)

    @staticmethod
    def batch_build(specs):
        """Build many CPDs with ONE host->device transfer.

        ``specs``: iterable of (variable, variable_card, values_2d,
        evidence, evidence_card, state_names) tuples.  Validity is checked
        host-side; all value arrays ship in a single ``jax.device_put`` of
        the pre-shaped numpy list (loading MUNIN's 1041 CPDs drops from
        ~50s of per-CPD transfers + eager reshape compiles to <0.2s)."""
        import jax

        np_dtype = np.dtype(config.DTYPE)
        host, meta = [], []
        for variable, card, values, evidence, evidence_card, state_names in specs:
            v64 = np.asarray(values, dtype=np.float64)
            is_valid = bool(np.allclose(v64.sum(axis=0), 1.0, atol=0.01))
            shape = (int(card),) + tuple(int(c) for c in (evidence_card or []))
            host.append(np.ascontiguousarray(v64.reshape(shape), dtype=np_dtype))
            meta.append((variable, card, evidence, evidence_card, state_names, is_valid))
        if len(host) > 64:
            # buffer creation over a remote link is latency-bound per array;
            # stripe the transfer across threads
            import concurrent.futures

            stripes = [host[i::8] for i in range(8)]
            with concurrent.futures.ThreadPoolExecutor(8) as pool:
                outs = list(pool.map(jax.device_put, stripes))
            device = [None] * len(host)
            for lane, out in enumerate(outs):
                device[lane::8] = out
        else:
            device = jax.device_put(host)
        return [
            TabularCPD._from_device_values(
                variable, card, arr, evidence, evidence_card, state_names, is_valid
            )
            for arr, (variable, card, evidence, evidence_card, state_names, is_valid)
            in zip(device, meta)
        ]

    @staticmethod
    def get_random(variable, evidence=None, cardinality=None, state_names={}, seed=None):
        """Random CPD on ``variable`` with parents ``evidence``."""
        generator = np.random.default_rng(seed=seed)
        evidence = list(evidence) if evidence is not None else []
        if cardinality is None:
            cardinality = {var: 2 for var in chain([variable], evidence)}
        else:
            for var in chain([variable], evidence):
                if var not in cardinality:
                    raise ValueError(f"Cardinality for variable: {var} not specified.")
        parent_card = [cardinality[var] for var in evidence]
        ncols = int(np.prod(parent_card)) if evidence else 1
        values = generator.random((cardinality[variable], ncols))
        values = values / values.sum(axis=0)
        if evidence:
            return TabularCPD(
                variable, cardinality[variable], values,
                evidence=evidence, evidence_card=parent_card, state_names=state_names,
            )
        return TabularCPD(variable, cardinality[variable], values, state_names=state_names)

    @staticmethod
    def get_uniform(variable, evidence=None, cardinality=None, state_names={}, seed=None):
        """Uniform CPD on ``variable`` with parents ``evidence``."""
        evidence = list(evidence) if evidence is not None else []
        if cardinality is None:
            cardinality = {var: 2 for var in chain([variable], evidence)}
        else:
            for var in chain([variable], evidence):
                if var not in cardinality:
                    raise ValueError(f"Cardinality for variable: {var} not specified.")
        parent_card = [cardinality[var] for var in evidence]
        ncols = int(np.prod(parent_card)) if evidence else 1
        card = cardinality[variable]
        values = np.full((card, ncols), 1.0 / card)
        if evidence:
            return TabularCPD(
                variable, card, values,
                evidence=evidence, evidence_card=parent_card, state_names=state_names,
            )
        return TabularCPD(variable, card, values, state_names=state_names)
