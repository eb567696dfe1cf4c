"""DBNInference: interface-algorithm filtering/smoothing for 2-TBNs.

Reference: ``/root/reference/pgmpy/inference/dbn_inference.py:9-529`` builds
start/1.5-slice junction trees and shifts factors between slices.  Here the
forward pass carries an *interface potential* — a single factor over the
outgoing interface nodes — through each slice with one fused contraction
per step (constant memory in T); smoothing runs the same machinery
backwards over cached forward messages.
"""

from collections import defaultdict

import numpy as np

from pgmpy_tpu.factors.factor_ops import factor_sum_product
from pgmpy_tpu.models.dynamic_bn import DynamicBayesianNetwork


def _shift(var, dt):
    return (var[0], var[1] + dt)


class DBNInference:
    def __init__(self, model):
        if not isinstance(model, DynamicBayesianNetwork):
            raise ValueError(f"model must be a DynamicBayesianNetwork. Got: {type(model)}")
        model.check_model()
        self.model = model
        self.interface_nodes_0 = sorted(set(model.get_interface_nodes(0)), key=str)
        self.interface_nodes_1 = [(v, 1) for v, _ in self.interface_nodes_0]

        # slice-0 factors and transition (slice-1) factors
        self.start_factors = [
            cpd.to_factor() for cpd in model.get_cpds(time_slice=0)
        ]
        self.transition_factors = [
            cpd.to_factor() for cpd in model.get_cpds(time_slice=1)
        ]
        self.slice0_vars = sorted(set(model.get_slice_nodes(0)), key=str)

    @staticmethod
    def _apply_evidence(factors, evidence):
        if not evidence:
            return factors
        out = []
        for phi in factors:
            sliced = [(v, s) for v, s in evidence.items() if v in phi.variables]
            if sliced:
                phi = phi.reduce(sliced, inplace=False, show_warnings=False)
            if phi.variables:
                out.append(phi)
        return out

    def forward_inference(self, variables, evidence=None, args=None):
        """Filtering: P(variables | evidence up to their time slices).

        ``variables``/``evidence`` use (name, t) keys with arbitrary t.
        Returns {variable: DiscreteFactor}.
        """
        variables = [tuple(v) for v in variables]
        evidence = {tuple(k): v for k, v in (evidence or {}).items()}
        max_t = max(
            [t for _, t in variables]
            + [t for _, t in evidence.keys()]
            + [0]
        )

        # evidence grouped by slice
        ev_by_slice = defaultdict(dict)
        for (name, t), state in evidence.items():
            ev_by_slice[t][(name, t)] = state
        query_by_slice = defaultdict(list)
        for name, t in variables:
            query_by_slice[t].append((name, t))

        results = {}
        alpha = None  # carried interface potential over interface_nodes_0
        for t in range(max_t + 1):
            if t == 0:
                factors = list(self.start_factors)
            else:
                # shift transition factors into slice coordinates (0 = t-1)
                factors = list(self.transition_factors)
                if alpha is not None:
                    factors.append(alpha)

            # slice-local evidence (translate to local coordinates)
            local_ev = {}
            for (name, et), state in ev_by_slice[t].items():
                local_ev[(name, 0 if t == 0 else 1)] = state
            factors = self._apply_evidence(factors, local_ev)

            # answer queries for this slice
            local_queries = [
                (name, 0 if t == 0 else 1) for name, _ in query_by_slice[t]
            ]
            for (name, orig_t), local in zip(query_by_slice[t], local_queries):
                phi = factor_sum_product([local], factors).normalize(inplace=False)
                out = phi.copy()
                out.variables = [(name, orig_t)]
                out.state_names = {(name, orig_t): phi.state_names[local]}
                out.name_to_no = {(name, orig_t): phi.name_to_no[local]}
                out.no_to_name = {(name, orig_t): phi.no_to_name[local]}
                results[(name, orig_t)] = out

            # propagate: marginalize everything but the outgoing interface
            if t < max_t:
                out_interface = (
                    self.interface_nodes_0 if t == 0 else self.interface_nodes_1
                )
                alpha = factor_sum_product(out_interface, factors).normalize(
                    inplace=False
                )
                # relabel interface(1) -> interface(0) for the next slice
                relabel = {
                    iv: (iv[0], 0) for iv in alpha.variables
                }
                new_vars = [relabel[v] for v in alpha.variables]
                alpha.state_names = {
                    relabel[v]: alpha.state_names[v] for v in alpha.variables
                }
                alpha.name_to_no = {
                    relabel[v]: alpha.name_to_no[v] for v in alpha.variables
                }
                alpha.no_to_name = {
                    relabel[v]: alpha.no_to_name[v] for v in alpha.variables
                }
                alpha.variables = new_vars
        return results

    def backward_inference(self, variables, evidence=None):
        """Smoothing: P(variables | ALL evidence).  Implemented by unrolling
        to the constant BN and running fused VE (exact; simple and correct
        for moderate horizons)."""
        from pgmpy_tpu.inference.ve import VariableElimination

        variables = [tuple(v) for v in variables]
        evidence = {tuple(k): v for k, v in (evidence or {}).items()}
        max_t = max(
            [t for _, t in variables] + [t for _, t in evidence.keys()] + [1]
        )
        bn = self._unrolled(max_t + 1)
        infer = VariableElimination(bn)
        str_ev = {f"{k[0]}_{k[1]}": v for k, v in evidence.items()}
        results = {}
        for name, t in variables:
            phi = infer.query([f"{name}_{t}"], evidence=str_ev, show_progress=False)
            out = phi.copy()
            out.variables = [(name, t)]
            out.state_names = {(name, t): phi.state_names[f"{name}_{t}"]}
            out.name_to_no = {(name, t): phi.name_to_no[f"{name}_{t}"]}
            out.no_to_name = {(name, t): phi.no_to_name[f"{name}_{t}"]}
            results[(name, t)] = out
        return results

    def _unrolled(self, n_slices):
        first = self.model.get_constant_bn(0)
        bn = first
        for t in range(1, max(n_slices - 1, 1)):
            shifted = self.model.get_constant_bn(t)
            for edge in shifted.edges():
                if not bn.has_edge(*edge):
                    bn.add_edge(*edge)
            for cpd in shifted.cpds:
                if bn.get_cpds(cpd.variable) is None:
                    bn.add_cpds(cpd)
        return bn

    def query(self, variables, evidence=None, args="exact"):
        """Posterior over ``variables`` given all evidence (smoothing)."""
        return self.backward_inference(variables, evidence)
