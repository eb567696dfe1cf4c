"""Node role annotations (exposure / outcome / latent / ...) for graphs.

Host-side metadata mirror of the reference roles mixin
(``/root/reference/pgmpy/base/_mixin_roles.py:6-224``): roles are stored as
node attributes; ``latents`` is the role-"latent" view used throughout
inference and learning.
"""

_ROLE_KEY = "__role__"
_KNOWN_ROLES = {"exposure", "outcome", "adjustment", "latent", "mediator", "instrument"}


class GraphRolesMixin:
    def get_role(self, role):
        """All nodes carrying ``role``."""
        return [
            n for n, data in self.nodes(data=True) if role in data.get(_ROLE_KEY, ())
        ]

    def get_roles(self):
        """Set of roles present in the graph."""
        roles = set()
        for _, data in self.nodes(data=True):
            roles |= set(data.get(_ROLE_KEY, ()))
        return roles

    def get_role_dict(self):
        return {role: self.get_role(role) for role in sorted(self.get_roles())}

    def has_role(self, role):
        return len(self.get_role(role)) > 0

    @property
    def roles(self):
        """role -> nodes mapping (the reference documents this view in its
        identification examples; its mixin only ships get_role_dict)."""
        return self.get_role_dict()

    def with_role(self, role, variables, inplace=False):
        graph = self if inplace else self.copy()
        if isinstance(variables, str):
            variables = [variables]
        for var in variables:
            if var not in graph.nodes():
                raise ValueError(f"Node {var} not in graph.")
            roles = set(graph.nodes[var].get(_ROLE_KEY, ()))
            roles.add(role)
            graph.nodes[var][_ROLE_KEY] = roles
        return None if inplace else graph

    def without_role(self, role, variables=None, inplace=False):
        graph = self if inplace else self.copy()
        if variables is None:
            variables = graph.get_role(role)
        elif isinstance(variables, str):
            variables = [variables]
        for var in variables:
            roles = set(graph.nodes[var].get(_ROLE_KEY, ()))
            roles.discard(role)
            graph.nodes[var][_ROLE_KEY] = roles
        return None if inplace else graph

    def is_valid_causal_structure(self):
        """Both 'exposure' and 'outcome' roles must be present; raises
        otherwise (ref ``_mixin_roles.py:140-158``)."""
        has_exposure = self.has_role("exposure")
        has_outcome = self.has_role("outcome")
        if has_exposure and has_outcome:
            return True
        problems = []
        if not has_exposure:
            problems.append("no 'exposure' role was defined")
        if not has_outcome:
            problems.append("no 'outcome' role was defined")
        raise ValueError(
            f"{type(self)} must have at least one 'exposure' and one 'outcome' "
            f"role defined, but {', and '.join(problems)}."
        )

    @property
    def latents(self):
        return set(self.get_role("latent"))

    @latents.setter
    def latents(self, variables):
        if isinstance(variables, str):
            variables = [variables]
        # clear previous latent annotations, then re-apply
        for var in self.get_role("latent"):
            roles = set(self.nodes[var].get(_ROLE_KEY, ()))
            roles.discard("latent")
            self.nodes[var][_ROLE_KEY] = roles
        for var in variables:
            if var in self.nodes():
                roles = set(self.nodes[var].get(_ROLE_KEY, ()))
                roles.add("latent")
                self.nodes[var][_ROLE_KEY] = roles
            else:
                # allow declaring latents before nodes exist (parity with
                # reference constructors that take `latents=` up front)
                self.add_node(var)
                self.nodes[var][_ROLE_KEY] = {"latent"}

    @property
    def observed(self):
        return set(self.nodes()) - self.latents
