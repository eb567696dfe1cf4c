"""State-name <-> integer-index bookkeeping shared by all factor classes.

Host-side metadata only — device arrays always carry integer state codes.
Behavioral parity with the reference mixin
(``/root/reference/pgmpy/utils/state_name.py:8-145``): each variable has an
ordered list of state names plus bidirectional name<->number maps; factors
created without explicit state names get ``range(cardinality)``.
"""


class StateNameMixin:
    def store_state_names(self, variables, cardinality, state_names):
        """Initialize ``state_names``, ``name_to_no`` and ``no_to_name``."""
        if state_names:
            for var in state_names:
                if not isinstance(state_names[var], (list, tuple)):
                    raise ValueError(
                        f"The state names of variable {var} must be a list or tuple."
                    )
                seen = set()
                for name in state_names[var]:
                    if name in seen:
                        raise ValueError(
                            f"Repeated state name for variable: {var} found."
                        )
                    seen.add(name)

        self.state_names = {}
        self.name_to_no = {}
        self.no_to_name = {}
        for var, card in zip(variables, cardinality):
            card = int(card)
            if state_names and var in state_names:
                names = list(state_names[var])
                if len(names) != card:
                    raise ValueError(
                        f"Number of state names for variable {var} doesn't match "
                        f"its cardinality: expected {card}, got {len(names)}."
                    )
            else:
                names = list(range(card))
            self.state_names[var] = names
            self.name_to_no[var] = {name: no for no, name in enumerate(names)}
            self.no_to_name[var] = {no: name for no, name in enumerate(names)}

    def get_state_names(self, var, state_no):
        """Name of state number ``state_no`` of ``var``."""
        return self.no_to_name[var][state_no]

    def get_state_no(self, var, state_name):
        """Integer code of state ``state_name`` of ``var``."""
        return self.name_to_no[var][state_name]

    def add_state_names(self, phi1):
        """Absorb state-name metadata from another factor (used by binary
        factor ops so the result knows every variable's states)."""
        other = phi1
        if other is None:
            return
        self.state_names.update(other.state_names)
        self.name_to_no.update(other.name_to_no)
        self.no_to_name.update(other.no_to_name)

    def del_state_names(self, var_list):
        """Drop metadata for variables summed/maxed out of scope."""
        for var in var_list:
            self.state_names.pop(var, None)
            self.name_to_no.pop(var, None)
            self.no_to_name.pop(var, None)
