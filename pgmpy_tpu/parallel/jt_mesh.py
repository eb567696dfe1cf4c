"""Model-parallel junction-tree calibration across a device mesh.

The reference has no distributed layer at all (``SURVEY.md`` §2.8); this is
the TPU-native design for the north-star axis "MUNIN-class calibration
across chips".

Design: the clique tree is partitioned host-side into balanced CONNECTED
subtrees (one part per device, carved bottom-up from a rooted DFS).  Each
part compiles to its own device-resident program — stage-0 potentials plus
its local two-pass message schedule — and the parts exchange only the
sepset messages on the (few) tree edges that cross part boundaries:

  upward phase   parts run children-before-parents; each part multiplies
                 the boundary sepset messages from its child parts into the
                 receiving cliques, runs its internal upward sweep, and
                 emits one sepset message toward its parent part,
  downward phase parts run parents-before-children; each part absorbs the
                 ratio message from its parent part, runs its internal
                 downward sweep, and emits ratio messages to its children.

Parts at the same depth of the part-tree dispatch asynchronously, so
independent branches calibrate concurrently on different devices.  Only
sepset-sized tensors ever cross devices — the clique beliefs (the big
tensors) are born and die on their owning device.  This is MPMD-style
model parallelism (per-device programs with point-to-point transfers,
which on a real pod ride ICI); the samplers' SPMD ``shard_map`` lanes live
in :mod:`pgmpy_tpu.parallel.mesh`.

The per-message arithmetic is IDENTICAL to the single-device
``JunctionTreeProgram`` (same sigma / mu ratio updates, same sepset
canonicalization), so the calibrated beliefs match the single-device
program to float tolerance for any device count and any partition.
"""

import collections

import networkx as nx
import numpy as np

import jax
import jax.numpy as jnp

from pgmpy_tpu.config import TINY, config
from pgmpy_tpu.inference.bp import _broadcast_spec, _expand


def partition_rooted_tree(tree, root, n_parts):
    """Carve a rooted tree into balanced CONNECTED parts, targeting
    ``n_parts`` of them.

    Bottom-up DFS accumulation: a node absorbs its children's pending
    buckets and seals a part once the bucket reaches the target size (the
    subtree root seals whatever remains).  Because absorbing several child
    buckets at once overshoots the target, a first carve often yields
    FEWER than ``n_parts`` parts (pigs/362 gave 6 of 8) — so a refinement
    loop re-carves the largest part in two until the requested count is
    reached (or the largest part is a single node / unsplittable star).
    Returns (parts, tops, parent) where ``parts[i]`` is the node list of
    part i and ``tops[i]`` its highest node (adjacent to the parent part).
    """
    nodes = list(nx.dfs_postorder_nodes(tree, root))
    parent = {c: p for p, c in nx.bfs_edges(tree, root)}

    def carve(node_list, sub_root, target):
        sub = tree.subgraph(node_list)
        pending = collections.defaultdict(list)
        parts, tops = [], []
        for node in nx.dfs_postorder_nodes(sub, sub_root):
            bucket = [node]
            for child in sub.neighbors(node):
                if parent.get(child) is node and child in pending:
                    bucket.extend(pending.pop(child))
            if len(bucket) >= target or node == sub_root:
                parts.append(bucket)
                tops.append(node)
            else:
                pending[node] = bucket
        return parts, tops

    def split2(node_list, sub_root):
        """Best-edge 2-way split: cut the edge whose lower subtree is
        closest to half the part (always succeeds for >= 2 nodes, unlike
        a threshold carve, which can't split e.g. a root whose child
        subtrees are all below target)."""
        sub = tree.subgraph(node_list)
        size = {}
        for node in nx.dfs_postorder_nodes(sub, sub_root):
            size[node] = 1 + sum(
                size[c]
                for c in sub.neighbors(node)
                if parent.get(c) == node and c in size
            )
        n = len(node_list)
        best = min(
            (x for x in node_list if x != sub_root),
            key=lambda x: abs(size[x] - n / 2),
        )
        lower = set()
        stack = [best]
        while stack:
            x = stack.pop()
            lower.add(x)
            for c in sub.neighbors(x):
                if parent.get(c) == x:
                    stack.append(c)
        upper = [x for x in node_list if x not in lower]
        return [list(lower), upper], [best, sub_root]

    target = max(1, -(-len(nodes) // int(n_parts)))
    parts, tops = carve(nodes, root, target)
    while len(parts) < int(n_parts):
        i = max(range(len(parts)), key=lambda j: len(parts[j]))
        if len(parts[i]) < 2:
            break
        sub_parts, sub_tops = split2(parts[i], tops[i])
        parts[i : i + 1] = sub_parts
        tops[i : i + 1] = sub_tops
    return parts, tops, parent


class ShardedJunctionTreeCalibration:
    """Per-part compiled calibration programs over the devices of a mesh.

    Parameters
    ----------
    program : JunctionTreeProgram (the single-device compile artifact; its
        clique structure, factor assignment and cards are reused)
    mesh : jax.sharding.Mesh (its devices carry the parts; parts are
        assigned round-robin when there are more parts than devices)
    """

    def __init__(self, program, mesh):
        self.program = program
        devices = list(np.asarray(mesh.devices).flat)
        self.devices = devices
        cliques = program.cliques

        # ---- host: partition every tree component ---------------------- #
        tree = nx.Graph()
        tree.add_nodes_from(range(len(cliques)))
        index = program.index
        for edge_key in program.edge_ids:
            c1, c2 = tuple(edge_key)
            tree.add_edge(index[c1], index[c2])

        # root each component at the SAME clique the single-device program
        # used: with normalized messages the per-clique scale depends on
        # the rooted schedule, and parity with the program requires parity
        # of roots
        roots_by_clique = {
            index[r]: True for r in getattr(program, "component_roots", [])
        }
        all_parts, all_tops, parent_of = [], [], {}
        for component in nx.connected_components(tree):
            sub = tree.subgraph(component)
            in_comp = [c for c in component if c in roots_by_clique]
            root = in_comp[0] if in_comp else min(component)
            n_here = max(1, round(len(devices) * len(component) / len(cliques)))
            parts, tops, parent = partition_rooted_tree(sub, root, n_here)
            all_parts.extend(parts)
            all_tops.extend(tops)
            parent_of.update(parent)

        self.n_parts = len(all_parts)
        part_of = {}
        for p_idx, part in enumerate(all_parts):
            for c in part:
                part_of[c] = p_idx

        # part tree: parent part of part i holds parent_of[tops[i]]
        self.part_parent = []
        for p_idx, top in enumerate(all_tops):
            up = parent_of.get(top)
            self.part_parent.append(part_of[up] if up is not None else None)
        self.part_children = [[] for _ in all_parts]
        for p_idx, pp in enumerate(self.part_parent):
            if pp is not None:
                self.part_children[pp].append(p_idx)

        # depth of each part (for phase scheduling)
        self.part_depth = [0] * self.n_parts
        changed = True
        while changed:
            changed = False
            for p_idx, pp in enumerate(self.part_parent):
                if pp is not None and self.part_depth[p_idx] != self.part_depth[pp] + 1:
                    self.part_depth[p_idx] = self.part_depth[pp] + 1
                    changed = True

        self.device_of_part = [devices[i % len(devices)] for i in range(self.n_parts)]

        # ---- host: compile the per-part programs ------------------------ #
        # message spec helper identical to JunctionTreeProgram's
        def message_spec(src_c, dst_c):
            sepset = sorted(set(cliques[src_c]) & set(cliques[dst_c]), key=str)
            src_vars = list(cliques[src_c])
            reduce_axes = tuple(
                i for i, v in enumerate(src_vars) if v not in sepset
            )
            kept = [v for v in src_vars if v in sepset]
            perm = tuple(kept.index(v) for v in sepset)
            bperm, bspec = _broadcast_spec(sepset, list(cliques[dst_c]))
            return reduce_axes, perm, (bperm, bspec)

        normalize = program.normalize_messages

        self.parts = []
        for p_idx, (part, top) in enumerate(zip(all_parts, all_tops)):
            local_of = {c: i for i, c in enumerate(part)}
            local_tree = tree.subgraph(part)
            bfs = list(nx.bfs_edges(local_tree, top))
            upward = [(c, p) for p, c in reversed(bfs)]
            downward = list(bfs)

            # factors assigned to this part's cliques, re-indexed locally so
            # the part program only receives (and transfers) what it uses
            factor_ids = []
            f_specs = []  # (local factor idx, local clique, perm, spec)
            for c in part:
                for f_idx, perm, spec in program.potential_specs[c]:
                    if f_idx not in factor_ids:
                        factor_ids.append(f_idx)
                    f_specs.append((factor_ids.index(f_idx), local_of[c], perm, spec))
            local_shapes = [program.clique_shapes[c] for c in part]

            # incoming upward boundaries: child parts' tops hang off nodes
            # in this part
            in_up = []  # (child_part, receiving local clique, (bperm,bspec), edge_id)
            for ch_part in self.part_children[p_idx]:
                ch_top = all_tops[ch_part]
                recv = parent_of[ch_top]
                sepset = sorted(
                    set(cliques[ch_top]) & set(cliques[recv]), key=str
                )
                bperm, bspec = _broadcast_spec(sepset, list(cliques[recv]))
                edge_id = program.edge_ids[
                    frozenset((cliques[ch_top], cliques[recv]))
                ]
                in_up.append((ch_part, local_of[recv], (bperm, bspec), edge_id))

            # outgoing upward boundary: top -> parent_of[top]
            out_up = None
            if self.part_parent[p_idx] is not None:
                up_node = parent_of[top]
                sepset = sorted(set(cliques[top]) & set(cliques[up_node]), key=str)
                src_vars = list(cliques[top])
                reduce_axes = tuple(
                    i for i, v in enumerate(src_vars) if v not in sepset
                )
                kept = [v for v in src_vars if v in sepset]
                perm = tuple(kept.index(v) for v in sepset)
                bperm, bspec = _broadcast_spec(sepset, list(cliques[top]))
                out_up = (local_of[top], reduce_axes, perm, (bperm, bspec))

            internal_msgs_up = [
                (local_of[s], local_of[d], *message_spec(s, d), True)
                for s, d in upward
            ]
            internal_msgs_down = [
                (local_of[s], local_of[d], *message_spec(s, d), False)
                for s, d in downward
            ]
            internal_edge_ids = [
                program.edge_ids[frozenset((cliques[s], cliques[d]))]
                for s, d in upward
            ]

            # downward boundary sends: for each child part, ratio from the
            # receiving clique back over the boundary edge
            down_sends = []  # (local clique, reduce_axes, perm) aligned w/ in_up
            for ch_part, recv_local, _, edge_id in in_up:
                recv_c = part[recv_local]
                ch_top = all_tops[ch_part]
                sepset = sorted(
                    set(cliques[ch_top]) & set(cliques[recv_c]), key=str
                )
                src_vars = list(cliques[recv_c])
                reduce_axes = tuple(
                    i for i, v in enumerate(src_vars) if v not in sepset
                )
                kept = [v for v in src_vars if v in sepset]
                perm = tuple(kept.index(v) for v in sepset)
                down_sends.append((recv_local, reduce_axes, perm))

            # incoming downward boundary: ratio broadcast into top
            in_down_spec = None
            if self.part_parent[p_idx] is not None:
                up_node = parent_of[top]
                sepset = sorted(set(cliques[top]) & set(cliques[up_node]), key=str)
                in_down_spec = _broadcast_spec(sepset, list(cliques[top]))

            def make_up(f_specs=f_specs, local_shapes=local_shapes,
                        in_up=in_up, msgs=internal_msgs_up, out_up=out_up):
                def up(factor_arrays, boundary_in):
                    beliefs = [None] * len(local_shapes)
                    for f_idx, lc, perm, spec in f_specs:
                        arr = _expand(factor_arrays[f_idx], perm, spec)
                        if beliefs[lc] is None:
                            beliefs[lc] = jnp.broadcast_to(arr, local_shapes[lc])
                        else:
                            beliefs[lc] = beliefs[lc] * arr
                    for lc in range(len(local_shapes)):
                        if beliefs[lc] is None:
                            beliefs[lc] = jnp.ones(local_shapes[lc], dtype=config.DTYPE)
                    # absorb child-part upward messages (fresh: multiply)
                    for sigma, (_, recv_local, (bperm, bspec), _) in zip(
                        boundary_in, in_up
                    ):
                        beliefs[recv_local] = beliefs[recv_local] * _expand(
                            sigma, bperm, bspec
                        )
                    mu_local = []
                    for src, dst, reduce_axes, perm, (bperm, bspec), fresh in msgs:
                        sigma = jnp.sum(beliefs[src], axis=reduce_axes)
                        if perm != tuple(range(len(perm))):
                            sigma = jnp.transpose(sigma, perm)
                        if normalize:
                            sigma = sigma / jnp.maximum(jnp.sum(sigma), TINY)
                        beliefs[dst] = beliefs[dst] * _expand(sigma, bperm, bspec)
                        mu_local.append(sigma)
                    if out_up is not None:
                        src, reduce_axes, perm, _ = out_up
                        sigma = jnp.sum(beliefs[src], axis=reduce_axes)
                        if perm != tuple(range(len(perm))):
                            sigma = jnp.transpose(sigma, perm)
                        if normalize:
                            sigma = sigma / jnp.maximum(jnp.sum(sigma), TINY)
                        return tuple(beliefs), tuple(mu_local), sigma
                    return tuple(beliefs), tuple(mu_local), jnp.zeros((1,), dtype=config.DTYPE)

                return up

            def make_down(msgs=internal_msgs_down, in_down_spec=in_down_spec,
                          down_sends=down_sends, top_local=local_of[top]):
                def down(beliefs_in, mu_up, in_ratio, boundary_mu):
                    beliefs = list(beliefs_in)
                    if in_down_spec is not None:
                        bperm, bspec = in_down_spec
                        beliefs[top_local] = beliefs[top_local] * _expand(
                            in_ratio, bperm, bspec
                        )
                    mu_final = []
                    for (src, dst, reduce_axes, perm, (bperm, bspec), _), mu_prev in zip(
                        msgs, mu_up[::-1]
                    ):
                        sigma = jnp.sum(beliefs[src], axis=reduce_axes)
                        if perm != tuple(range(len(perm))):
                            sigma = jnp.transpose(sigma, perm)
                        if normalize:
                            sigma = sigma / jnp.maximum(jnp.sum(sigma), TINY)
                        ratio = sigma / jnp.maximum(mu_prev, TINY)
                        beliefs[dst] = beliefs[dst] * _expand(ratio, bperm, bspec)
                        mu_final.append(sigma)
                    # ratios to child parts + final boundary sepset beliefs
                    out_ratios, out_mus = [], []
                    for (recv_local, reduce_axes, perm), mu_b in zip(
                        down_sends, boundary_mu
                    ):
                        sigma = jnp.sum(beliefs[recv_local], axis=reduce_axes)
                        if perm != tuple(range(len(perm))):
                            sigma = jnp.transpose(sigma, perm)
                        if normalize:
                            sigma = sigma / jnp.maximum(jnp.sum(sigma), TINY)
                        out_ratios.append(sigma / jnp.maximum(mu_b, TINY))
                        out_mus.append(sigma)
                    return (
                        tuple(beliefs),
                        tuple(mu_final),
                        tuple(out_ratios),
                        tuple(out_mus),
                    )

                return down

            self.parts.append(
                {
                    "cliques": part,
                    "top": top,
                    "local_of": local_of,
                    "factor_ids": factor_ids,
                    "up": jax.jit(make_up()),
                    "down": jax.jit(make_down()),
                    "internal_edge_ids": internal_edge_ids,
                    "in_up": in_up,
                    "boundary_edge_id": (
                        program.edge_ids[
                            frozenset((cliques[top], cliques[parent_of[top]]))
                        ]
                        if self.part_parent[p_idx] is not None
                        else None
                    ),
                }
            )

    # ------------------------------------------------------------------ #
    def calibrate(self, factor_arrays):
        """Distributed two-pass calibration; returns (beliefs, mu) in the
        single-device ``JunctionTreeProgram`` layout (beliefs indexed by
        clique id, mu by edge id)."""
        program = self.program
        n_cliques = len(program.cliques)
        beliefs_out = [None] * n_cliques
        mu_out = [None] * program.n_edges

        # place each part's (local) factor inputs on its device
        part_inputs = []
        for p_idx, part in enumerate(self.parts):
            dev = self.device_of_part[p_idx]
            part_inputs.append(
                [
                    jax.device_put(jnp.asarray(factor_arrays[i]), dev)
                    for i in part["factor_ids"]
                ]
            )

        # ---- upward phase: deepest parts first -------------------------- #
        depths = sorted(set(self.part_depth), reverse=True)
        up_state = [None] * self.n_parts  # (beliefs, mu_local)
        up_boundary = [None] * self.n_parts  # sigma toward parent part
        for depth in depths:
            for p_idx in [i for i, d in enumerate(self.part_depth) if d == depth]:
                part = self.parts[p_idx]
                dev = self.device_of_part[p_idx]
                boundary_in = tuple(
                    jax.device_put(up_boundary[ch], dev)
                    for ch, _, _, _ in part["in_up"]
                )
                bel, mu_local, sigma = part["up"](part_inputs[p_idx], boundary_in)
                up_state[p_idx] = (bel, mu_local)
                if self.part_parent[p_idx] is not None:
                    up_boundary[p_idx] = sigma

        # ---- downward phase: shallowest parts first --------------------- #
        down_ratio = [None] * self.n_parts
        for depth in sorted(set(self.part_depth)):
            for p_idx in [i for i, d in enumerate(self.part_depth) if d == depth]:
                part = self.parts[p_idx]
                dev = self.device_of_part[p_idx]
                bel, mu_local = up_state[p_idx]
                in_ratio = (
                    jax.device_put(down_ratio[p_idx], dev)
                    if down_ratio[p_idx] is not None
                    else jnp.zeros((1,), dtype=config.DTYPE)
                )
                boundary_mu = tuple(
                    jax.device_put(up_boundary[ch], dev)
                    for ch, _, _, _ in part["in_up"]
                )
                bel, mu_final, out_ratios, out_mus = part["down"](
                    bel, mu_local, in_ratio, boundary_mu
                )
                # stash results into the global layout
                for c, b in zip(part["cliques"], bel):
                    beliefs_out[c] = b
                for edge_id, m in zip(part["internal_edge_ids"], mu_final[::-1]):
                    mu_out[edge_id] = m
                for (ch, _, _, edge_id), ratio, mu_b in zip(
                    part["in_up"], out_ratios, out_mus
                ):
                    down_ratio[ch] = ratio
                    mu_out[edge_id] = mu_b
        return beliefs_out, mu_out


def sharded_jt_calibrate(model, mesh=None):
    """Calibrate ``model``'s junction tree with clique tensors sharded
    (partitioned) across the mesh devices; returns
    ``(clique_beliefs, sepset_beliefs)`` dicts of numpy arrays keyed like
    ``BeliefPropagation``'s (clique tuple / frozenset edge)."""
    from pgmpy_tpu.inference.bp import BeliefPropagation
    from pgmpy_tpu.parallel.mesh import get_mesh

    if mesh is None:
        mesh = get_mesh()
    bp = BeliefPropagation(model)
    program = bp._program
    sharded = ShardedJunctionTreeCalibration(program, mesh)
    arrays = [f.values for f in bp._input_factors]
    beliefs, mu = sharded.calibrate(arrays)
    clique_beliefs = {
        clique: np.asarray(b) for clique, b in zip(program.cliques, beliefs)
    }
    sepset_beliefs = {}
    for edge_key, edge_id in program.edge_ids.items():
        sepset_beliefs[edge_key] = (
            np.asarray(mu[edge_id]) if mu[edge_id] is not None else None
        )
    return clique_beliefs, sepset_beliefs
