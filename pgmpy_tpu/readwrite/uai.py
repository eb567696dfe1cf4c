"""UAI competition format reader/writer (MARKOV / BAYES).

Parity: ``/root/reference/pgmpy/readwrite/UAI.py``.
"""

import re

import numpy as np

from pgmpy_tpu.factors.discrete import DiscreteFactor


class UAIReader:
    def __init__(self, path=None, string=None):
        if path is not None:
            with open(path) as f:
                self.network = f.read()
        elif string is not None:
            self.network = string
        else:
            raise ValueError("Must specify either path or string")

        self._token_grammar = re.compile(r"\S+")
        tokens = self._token_grammar.findall(self.network)
        pos = 0
        self.network_type = tokens[pos]; pos += 1
        n_vars = int(tokens[pos]); pos += 1
        self.domain = [int(tokens[pos + i]) for i in range(n_vars)]; pos += n_vars
        n_funcs = int(tokens[pos]); pos += 1
        self.scopes = []
        for _ in range(n_funcs):
            size = int(tokens[pos]); pos += 1
            self.scopes.append([int(tokens[pos + i]) for i in range(size)])
            pos += size
        self.table_values = []
        for scope in self.scopes:
            n_entries = int(tokens[pos]); pos += 1
            self.table_values.append(
                [float(tokens[pos + i]) for i in range(n_entries)]
            )
            pos += n_entries

        self.variables = [f"var_{i}" for i in range(n_vars)]
        self.edges = self.get_edges()
        self.tables = self.get_tables()

    def get_grammar(self):
        """The UAI token grammar.  The reference builds a pyparsing
        expression (UAI.py:63); the format is a flat whitespace-separated
        token stream here, so the token regex is the grammar object."""
        return self._token_grammar

    def get_variables(self):
        return list(self.variables)

    def get_network_type(self):
        return self.network_type

    def get_domain(self):
        return {f"var_{i}": str(c) for i, c in enumerate(self.domain)}

    def get_edges(self):
        edges = set()
        for scope in self.scopes:
            if self.network_type == "BAYES":
                child = scope[-1]
                for parent in scope[:-1]:
                    edges.add((f"var_{parent}", f"var_{child}"))
            else:
                for i in range(len(scope)):
                    for j in range(i + 1, len(scope)):
                        edges.add((f"var_{scope[i]}", f"var_{scope[j]}"))
        return edges

    def get_tables(self):
        tables = []
        for scope, values in zip(self.scopes, self.table_values):
            tables.append(([f"var_{i}" for i in scope], [str(v) for v in values]))
        return tables

    def get_model(self):
        from pgmpy_tpu.models.discrete_bn import DiscreteBayesianNetwork
        from pgmpy_tpu.models.markov_network import DiscreteMarkovNetwork

        if self.network_type == "BAYES":
            from pgmpy_tpu.factors.cpd import TabularCPD

            model = DiscreteBayesianNetwork()
            model.add_nodes_from(self.variables)
            model.add_edges_from(self.edges)
            cpds = []
            for scope, values in zip(self.scopes, self.table_values):
                child = scope[-1]
                parents = scope[:-1]
                child_card = self.domain[child]
                arr = np.asarray(values).reshape(-1, child_card).T
                cpds.append(
                    TabularCPD(
                        f"var_{child}",
                        child_card,
                        arr,
                        evidence=[f"var_{p}" for p in parents] or None,
                        evidence_card=[self.domain[p] for p in parents] or None,
                    )
                )
            model.add_cpds(*cpds)
            return model
        model = DiscreteMarkovNetwork()
        model.add_nodes_from(self.variables)
        model.add_edges_from(self.edges)
        factors = []
        for scope, values in zip(self.scopes, self.table_values):
            factors.append(
                DiscreteFactor(
                    [f"var_{i}" for i in scope],
                    [self.domain[i] for i in scope],
                    np.asarray(values),
                )
            )
        model.add_factors(*factors)
        return model


class UAIWriter:
    def __init__(self, model):
        from pgmpy_tpu.models.discrete_bn import DiscreteBayesianNetwork
        from pgmpy_tpu.models.markov_network import DiscreteMarkovNetwork

        self.model = model
        if isinstance(model, DiscreteBayesianNetwork):
            self.network_type = "BAYES"
        elif isinstance(model, DiscreteMarkovNetwork):
            self.network_type = "MARKOV"
        else:
            raise TypeError(f"Unsupported model type: {type(model)}")
        model.check_model()

    def get_nodes(self):
        """{variable: cardinality} in the writer's canonical order."""
        model = self.model
        if self.network_type == "BAYES":
            return {
                str(v): str(model.get_cpds(v).variable_card)
                for v in sorted(model.nodes(), key=str)
            }
        card = model.get_cardinality()
        return {str(v): str(card[v]) for v in sorted(model.nodes(), key=str)}

    def get_domain(self):
        """Reference-name alias of get_nodes (ref UAI.py)."""
        return self.get_nodes()

    def get_functions(self):
        """Function scopes as variable-index lists."""
        model = self.model
        variables = sorted(model.nodes(), key=str)
        var_index = {v: i for i, v in enumerate(variables)}
        if self.network_type == "BAYES":
            return [
                [var_index[p] for p in model.get_cpds(v).variables[1:]]
                + [var_index[v]]
                for v in variables
            ]
        return [
            [var_index[v] for v in f.variables] for f in model.get_factors()
        ]

    def get_tables(self):
        """Flat probability tables, one list per function."""
        import numpy as np

        model = self.model
        if self.network_type == "BAYES":
            variables = sorted(model.nodes(), key=str)
            out = []
            for v in variables:
                cpd = model.get_cpds(v)
                # UAI order: parent configs slowest, child fastest
                out.append(
                    np.asarray(cpd.get_values(), dtype=np.float64)
                    .T.ravel().tolist()
                )
            return out
        return [
            np.asarray(f.values, dtype=np.float64).ravel().tolist()
            for f in model.get_factors()
        ]

    def get_string(self):
        model = self.model
        variables = sorted(model.nodes(), key=str)
        var_index = {v: i for i, v in enumerate(variables)}
        lines = [self.network_type, str(len(variables))]
        if self.network_type == "BAYES":
            cards = [str(model.get_cpds(v).variable_card) for v in variables]
        else:
            card_map = model.get_cardinality()
            cards = [str(card_map[v]) for v in variables]
        lines.append(" ".join(cards))

        if self.network_type == "BAYES":
            funcs = []
            tables = []
            for v in variables:
                cpd = model.get_cpds(v)
                parents = cpd.variables[1:]
                scope = [var_index[p] for p in parents] + [var_index[v]]
                funcs.append(f"{len(scope)} " + " ".join(map(str, scope)))
                values = cpd.get_values().T.ravel()
                tables.append((len(values), values))
        else:
            funcs = []
            tables = []
            for factor in model.get_factors():
                scope = [var_index[v] for v in factor.variables]
                funcs.append(f"{len(scope)} " + " ".join(map(str, scope)))
                values = np.asarray(factor.values).ravel()
                tables.append((len(values), values))
        lines.append(str(len(funcs)))
        lines.extend(funcs)
        lines.append("")
        for n, values in tables:
            lines.append(str(n))
            lines.append(" ".join(repr(float(v)) for v in values))
            lines.append("")
        return "\n".join(lines)

    def __str__(self):
        return self.get_string()

    def write_uai(self, filename):
        self.write_file(filename)

    def write(self, filename):
        """Reference-name alias for write_file."""
        self.write_file(filename)

    def write_file(self, filename):
        with open(filename, "w") as f:
            f.write(self.get_string())
