"""BeliefPropagation: junction-tree calibration as ONE compiled XLA program.

Reference behavior: ``/root/reference/pgmpy/inference/ExactInference.py:725-1319``
(Lauritzen-Spiegelhalter belief update, Koller & Friedman Alg. 10.3).

TPU-native redesign: the reference loops Python-level messages with an
O(edges) convergence re-check per root candidate.  Here the host compiles
the clique tree into a *static program*:

  stage 0: clique potentials = broadcast-products of the assigned CPT/factor
           arrays (no eager per-clique factor_product on host),
  stage 1: two-pass message schedule (leaves->root, root->leaves — provably
           exact in one sweep, no convergence checks),

and the whole thing is traced once into a single ``jax.jit`` over the raw
factor arrays.  XLA fuses the per-message op chains; repeat calibrations
(same structure, new CPT values) cost one kernel launch.  Messages are
sum-normalized in-flight to keep f32 scale; queries normalize at the end,
so only relative values matter.  Disconnected clique *forests* (from pruned
models) are supported throughout.
"""

import itertools

import networkx as nx
import numpy as np

import jax
import jax.numpy as jnp

from pgmpy_tpu.config import TINY
from pgmpy_tpu.factors.discrete import DiscreteFactor
from pgmpy_tpu.inference.base import Inference
from pgmpy_tpu.inference.ve import VariableElimination
from pgmpy_tpu.models.cluster_graph import ClusterGraph
from pgmpy_tpu.models.discrete_bn import DiscreteBayesianNetwork
from pgmpy_tpu.models.factor_graph import FactorGraph
from pgmpy_tpu.models.junction_tree import JunctionTree
from pgmpy_tpu.models.markov_network import DiscreteMarkovNetwork, greedy_elimination_order


def _safe_div(a, b):
    out = a / b
    return jnp.where(jnp.isnan(out) | jnp.isinf(out), 0.0, out)


def _broadcast_spec(src_vars, dst_vars):
    """(perm, shape_spec) to expand an array over ``src_vars`` into the axis
    layout of ``dst_vars`` (src_vars ⊆ dst_vars)."""
    in_dst_order = [v for v in dst_vars if v in src_vars]
    perm = tuple(src_vars.index(v) for v in in_dst_order)
    shape_spec = tuple(
        in_dst_order.index(v) if v in src_vars else None for v in dst_vars
    )
    return perm, shape_spec


def _expand(arr, perm, shape_spec):
    """Transpose by ``perm`` then insert singleton axes per ``shape_spec``.
    Identity transposes/reshapes are elided — MUNIN's program has thousands
    of them and each traced op costs trace+compile time."""
    if perm != tuple(range(len(perm))):
        arr = jnp.transpose(arr, perm)
    shape = []
    it = iter(arr.shape)
    for spec in shape_spec:
        shape.append(next(it) if spec is not None else 1)
    shape = tuple(shape)
    if shape != arr.shape:
        arr = arr.reshape(shape)
    return arr


def _merge_cliques(cliques, edges, cards, max_table=1 << 14, budget_ratio=1.5):
    """Greedy clique agglomeration on the junction tree.

    Contracting a tree edge (c1, c2) into one clique over c1 ∪ c2
    preserves the junction-tree property (running intersection holds for
    the union node), removes two messages from the schedule, and costs
    ``|T(c1∪c2)| - |T(c1)| - |T(c2)|`` extra table elements.  On
    MUNIN-class trees ~60% of messages touch only tiny (≤4k-element)
    cliques whose per-message cost is pure XLA op overhead, not bytes —
    merging them trades a bounded byte increase for a large op-count
    decrease, which is the right trade on an overhead-dominated program.

    Greedy order: smallest union table first; stop growing a union past
    ``max_table`` elements and stop overall once total table elements
    exceed ``budget_ratio`` × the original.  Returns (cliques, edges)
    with the same tuple-of-sorted-vars node representation.
    """
    import heapq

    scopes = [frozenset(c) for c in cliques]
    sizes = [int(np.prod([cards[v] for v in c])) for c in cliques]
    total0 = sum(sizes)
    budget = int(budget_ratio * total0)
    parent = list(range(len(cliques)))  # union-find

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    adj = {i: set() for i in range(len(cliques))}
    index = {c: i for i, c in enumerate(cliques)}
    for u, v in edges:
        adj[index[u]].add(index[v])
        adj[index[v]].add(index[u])

    def union_size(a, b):
        return int(np.prod([cards[v] for v in scopes[a] | scopes[b]]))

    heap = []
    for u, v in edges:
        a, b = index[u], index[v]
        heap.append((union_size(a, b), a, b))
    heapq.heapify(heap)

    total = total0
    while heap:
        usize, a, b = heapq.heappop(heap)
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        # stale entry (scopes grew since it was pushed): re-queue at the
        # current union size and re-examine later
        cur = union_size(ra, rb)
        if cur != usize:
            if rb in adj[ra]:
                heapq.heappush(heap, (cur, ra, rb))
            continue
        if cur > max_table:
            continue
        grown = total + cur - sizes[ra] - sizes[rb]
        if grown > budget:
            continue
        # contract rb into ra
        parent[rb] = ra
        scopes[ra] = scopes[ra] | scopes[rb]
        sizes[ra] = cur
        total = grown
        adj[ra] = (adj[ra] | adj[rb]) - {ra, rb}
        for n in adj[rb]:
            adj[n].discard(rb)
            if n != ra:
                adj[n].add(ra)
        adj[rb] = set()
        for n in adj[ra]:
            heapq.heappush(heap, (union_size(ra, find(n)), ra, find(n)))

    roots = sorted({find(i) for i in range(len(cliques))})
    new_cliques = [tuple(sorted(scopes[r], key=str)) for r in roots]
    root_pos = {r: i for i, r in enumerate(roots)}
    new_edges = set()
    for u, v in edges:
        ra, rb = find(index[u]), find(index[v])
        if ra != rb:
            key = (min(root_pos[ra], root_pos[rb]), max(root_pos[ra], root_pos[rb]))
            new_edges.add(key)
    return new_cliques, [
        (new_cliques[i], new_cliques[j]) for i, j in sorted(new_edges)
    ]


class JunctionTreeProgram:
    """Host compile artifact: clique structure, factor assignment, message
    schedule — plus the jitted device executor."""

    def __init__(
        self, cliques, edges, cards, factor_scopes, assignment,
        normalize_messages=True,
    ):
        """
        cliques : list of tuples of variable names
        edges : list of (clique, clique) tree/forest edges
        cards : {var: cardinality}
        factor_scopes : list of factor variable lists (program inputs)
        assignment : list of clique indices, aligned with factor_scopes
        normalize_messages : bool — sum-normalize messages in flight.
            Required for arbitrary-scale Markov factors (f32 overflow);
            skipped for CPD-built trees, where every message is already a
            true probability marginal (sum ~= 1) and the three extra ops per
            message only cost trace+compile time.
        """
        self.normalize_messages = bool(normalize_messages)
        self.cliques = list(cliques)
        self.index = {c: i for i, c in enumerate(self.cliques)}
        self.cards = dict(cards)
        self.clique_shapes = [
            tuple(int(cards[v]) for v in c) for c in self.cliques
        ]
        self.factor_shapes = [
            tuple(int(cards[v]) for v in scope) for scope in factor_scopes
        ]

        # stage 0 specs: factor -> clique broadcast
        self.potential_specs = [[] for _ in self.cliques]
        for f_idx, (scope, c_idx) in enumerate(zip(factor_scopes, assignment)):
            perm, shape_spec = _broadcast_spec(list(scope), list(self.cliques[c_idx]))
            self.potential_specs[c_idx].append((f_idx, perm, shape_spec))

        # stage 1: two-pass schedule per connected component
        tree = nx.Graph()
        tree.add_nodes_from(self.cliques)
        tree.add_edges_from(edges)
        upward, downward, ordered_edges = [], [], []
        # roots recorded so distributed calibration (parallel/jt_mesh.py)
        # can partition around the SAME roots: with in-flight message
        # normalization the per-clique belief scale depends on the rooted
        # schedule, so root parity is required for bitwise-comparable output
        self.component_roots = []
        for component in nx.connected_components(tree):
            root = next(iter(component))
            self.component_roots.append(root)
            comp_edges = list(nx.bfs_edges(tree, root))
            ordered_edges.extend(comp_edges)
            upward.extend((child, parent) for parent, child in reversed(comp_edges))
            downward.extend((parent, child) for parent, child in comp_edges)

        self.edge_ids = {}
        for parent, child in ordered_edges:
            self.edge_ids[frozenset((parent, child))] = len(self.edge_ids)
        self.n_edges = len(self.edge_ids)

        self.messages = []
        seen_edges = set()
        for src, dst in upward + downward:
            sepset = sorted(set(src) & set(dst), key=str)
            src_vars, dst_vars = list(src), list(dst)
            reduce_axes = tuple(i for i, v in enumerate(src_vars) if v not in sepset)
            kept = [v for v in src_vars if v in sepset]
            perm_to_canon = tuple(kept.index(v) for v in sepset)
            bperm, bspec = _broadcast_spec(sepset, dst_vars)
            edge = self.edge_ids[frozenset((src, dst))]
            # `fresh` is static: the first (upward) message over an edge has
            # no previous sepset belief to divide by
            fresh = edge not in seen_edges
            seen_edges.add(edge)
            self.messages.append(
                (
                    self.index[src],
                    self.index[dst],
                    reduce_axes,
                    perm_to_canon,
                    (bperm, bspec),
                    edge,
                    fresh,
                )
            )
        # sepset shapes aligned with edge ids (for the mu running beliefs)
        self.sepset_shapes = [None] * self.n_edges
        for edge_key, edge_id in self.edge_ids.items():
            c1, c2 = tuple(edge_key)
            sepset = sorted(set(c1) & set(c2), key=str)
            self.sepset_shapes[edge_id] = tuple(int(cards[v]) for v in sepset)
        self._fns = {}

    # Clique agglomeration (``_merge_cliques``) kicks in automatically on
    # trees this large: below it the program is op-count-light and merging
    # only perturbs small-model clique structure for no gain.  The cap was
    # tuned on MUNIN (v5e, r5): caps 2^16/2^18/2^20 gave steady medians
    # 7.9/5.1/4.2 ms vs 11.2 ms unmerged; larger byte budgets
    # (budget_ratio 2.0/3.0 at this cap) gave 4.0/5.3 ms — so 2^20 at the
    # default 1.5 budget is the knee, landing on the measured HBM roofline
    # (~3.8 ms for the 3.15 GB the merged schedule moves).
    MERGE_MIN_CLIQUES = 501
    MERGE_MAX_TABLE = 1 << 20

    # -- factory ------------------------------------------------------- #
    @classmethod
    def from_factors(cls, factor_scopes, cards, heuristic="weight",
                     normalize_messages=True, merge="auto"):
        """Compile clique structure from factor scopes: moral graph ->
        greedy triangulation -> max cliques -> MST on sepset weights ->
        clique agglomeration (big trees) -> factor-to-clique assignment.

        ``merge``: "auto" agglomerates small adjacent cliques only on
        MUNIN-class trees (>= MERGE_MIN_CLIQUES cliques), where XLA
        per-op overhead on thousands of tiny messages dominates the
        calibration wall time; True/False force it."""
        graph = nx.Graph()
        for scope in factor_scopes:
            graph.add_nodes_from(scope)
            graph.add_edges_from(itertools.combinations(scope, 2))

        adj = {n: set(graph.neighbors(n)) for n in graph.nodes()}
        weights = {n: float(np.log(max(int(cards[n]), 1))) for n in graph.nodes()}
        _, fill = greedy_elimination_order(adj, weights, heuristic=heuristic)
        graph.add_edges_from(fill)

        cliques = [tuple(sorted(c, key=str)) for c in nx.find_cliques(graph)]

        # MST on sepset sizes
        cg = nx.Graph()
        cg.add_nodes_from(cliques)
        for c1, c2 in itertools.combinations(cliques, 2):
            w = len(set(c1) & set(c2))
            if w:
                cg.add_edge(c1, c2, weight=-w)
        edges = [
            (u, v) for u, v, _ in nx.minimum_spanning_edges(cg, data=True)
        ]

        if merge is True or (merge == "auto" and len(cliques) >= cls.MERGE_MIN_CLIQUES):
            cliques, edges = _merge_cliques(
                cliques, edges, cards, max_table=cls.MERGE_MAX_TABLE
            )

        # assign each factor to the first clique containing its scope
        var_to_cliques = {}
        for i, clique in enumerate(cliques):
            for v in clique:
                var_to_cliques.setdefault(v, []).append(i)
        assignment = []
        for scope in factor_scopes:
            scope_set = set(scope)
            for c_idx in var_to_cliques[scope[0]]:
                if scope_set <= set(cliques[c_idx]):
                    assignment.append(c_idx)
                    break
            else:
                raise ValueError(
                    f"Factor scope {scope} not covered by any clique"
                )
        return cls(
            cliques, edges, cards, factor_scopes, assignment,
            normalize_messages=normalize_messages,
        )

    # -- device executor ----------------------------------------------- #
    # Messages per compiled segment.  XLA compile cost is superlinear in
    # both op count and program I/O buffer count, so one monolithic program
    # over MUNIN's ~1700 messages costs ~50s.  Segmenting the schedule into
    # ~CHUNK-message programs that pass ONLY the cliques/sepsets they touch,
    # and compiling all segments concurrently (the compile service
    # parallelizes across requests), cuts the cold-start compile several-fold
    # at the price of a few extra dispatches per calibrate.
    CHUNK = 340

    # Whenever the schedule is too long for one up-front fused compile
    # (> CHUNK messages -> the executor starts with the chunked multi-
    # dispatch pipeline), a background thread ALSO compiles the whole
    # schedule as ONE program and hot-swaps it in: profiling on the v5e
    # put MUNIN's chunked steady state at ~20-24 ms (r4, unmerged; ~11 ms
    # r5 merged) but the monolithic program at 13.6-15.1 ms (r4) / 4.2 ms
    # (r5 merged) — XLA fuses across the old segment boundaries and the
    # per-dispatch overheads vanish.  The monolithic compile costs ~30 s,
    # so it must not block first use; the swap is an atomic dict write
    # picked up by the next calibrate.  (r4 used a 1000-message threshold;
    # r5's clique merge dropped MUNIN to 658 messages, so the trigger is
    # now simply "the first build wasn't already monolithic".)
    UPGRADE_THRESHOLD = CHUNK + 1

    def executor(self, operation, one_shot=False):
        """``one_shot=True`` is for callers that calibrate ONCE per program
        (the per-signature query builds): compile time dominates there, so
        stage0 and the message segments stay separate programs (they
        compile concurrently) and no background monolithic upgrade is
        scheduled."""
        if one_shot:
            key = (operation, "one_shot")
            if key not in self._fns:
                self._fns[key] = self._build(operation, self.CHUNK, fuse=False)
            return self._fns[key]
        if operation in self._fns:
            return self._fns[operation]
        calibrate = self._build(operation, self.CHUNK)
        self._fns[operation] = calibrate
        if len(self.messages) >= self.UPGRADE_THRESHOLD:
            import threading

            if not hasattr(self, "_upgrade_threads"):
                self._upgrade_threads = {}

            def upgrade():
                try:
                    mono = self._build(operation, len(self.messages))
                    self._fns[operation] = mono
                except Exception:  # never let a background compile crash
                    pass

            t = threading.Thread(target=upgrade, daemon=True)
            self._upgrade_threads[operation] = t
            t.start()
        return calibrate

    def wait_for_upgrade(self, operation="marginalize", timeout=None):
        """Block until the background monolithic program (if any) has
        swapped in — benchmarks call this so steady-state numbers measure
        the upgraded executor."""
        t = getattr(self, "_upgrade_threads", {}).get(operation)
        if t is not None:
            t.join(timeout)

    def _build(self, operation, chunk_size, fuse=True):
        messages = self.messages
        potential_specs = self.potential_specs
        clique_shapes = self.clique_shapes
        sepset_shapes = self.sepset_shapes
        normalize_messages = self.normalize_messages
        from pgmpy_tpu.config import config

        dtype = config.DTYPE

        def stage0(factor_arrays):
            # clique potentials from the assigned factor arrays
            beliefs = []
            for c_idx, specs in enumerate(potential_specs):
                if not specs:
                    pot = jnp.ones(clique_shapes[c_idx], dtype=dtype)
                else:
                    f_idx, perm, spec = specs[0]
                    pot = jnp.broadcast_to(
                        _expand(factor_arrays[f_idx], perm, spec),
                        clique_shapes[c_idx],
                    )
                    for f_idx, perm, spec in specs[1:]:
                        pot = pot * _expand(factor_arrays[f_idx], perm, spec)
                beliefs.append(pot)
            return tuple(beliefs)

        chunks = [
            messages[i : i + chunk_size]
            for i in range(0, len(messages), chunk_size)
        ]

        if fuse and len(chunks) <= 1:
            # FUSED single program: stage0 inlined with the full message
            # schedule, so calibration is ONE dispatch and XLA fuses the
            # factor products into the first messages.  This is the
            # monolithic-upgrade target and the default for small trees
            # (<= chunk_size messages).
            chunk = chunks[0] if chunks else []

            def fused(factor_arrays):
                beliefs = list(stage0(factor_arrays))
                mu = [None] * len(sepset_shapes)
                for src, dst, reduce_axes, perm, (bperm, bspec), edge, fresh in chunk:
                    if operation == "marginalize":
                        sigma = jnp.sum(beliefs[src], axis=reduce_axes)
                    else:
                        sigma = jnp.max(beliefs[src], axis=reduce_axes)
                    if perm != tuple(range(len(perm))):
                        sigma = jnp.transpose(sigma, perm)
                    if normalize_messages:
                        sigma = sigma / jnp.maximum(jnp.sum(sigma), TINY)
                    if fresh:
                        ratio = sigma
                    else:
                        ratio = sigma / jnp.maximum(mu[edge], TINY)
                    beliefs[dst] = beliefs[dst] * _expand(ratio, bperm, bspec)
                    mu[edge] = sigma
                return tuple(beliefs), tuple(mu)

            fused_jit = jax.jit(fused)
            fused_jit.lower(
                [jax.ShapeDtypeStruct(s, dtype) for s in self.factor_shapes]
            ).compile()

            def calibrate(factor_arrays):
                b, m = fused_jit(factor_arrays)
                return list(b), list(m)

            return calibrate

        def make_segment(chunk):
            # static I/O manifest: only the buffers this chunk touches
            in_cliques, out_cliques, in_edges, out_edges = [], [], [], []
            for src, dst, _, _, _, edge, fresh in chunk:
                if src not in in_cliques:
                    in_cliques.append(src)
                if dst not in in_cliques:
                    in_cliques.append(dst)
                if dst not in out_cliques:
                    out_cliques.append(dst)
                if not fresh and edge not in out_edges and edge not in in_edges:
                    in_edges.append(edge)
                if edge not in out_edges:
                    out_edges.append(edge)

            def run(belief_in, mu_in):
                local = dict(zip(in_cliques, belief_in))
                mu_local = dict(zip(in_edges, mu_in))
                for src, dst, reduce_axes, perm, (bperm, bspec), edge, fresh in chunk:
                    if operation == "marginalize":
                        sigma = jnp.sum(local[src], axis=reduce_axes)
                    else:
                        sigma = jnp.max(local[src], axis=reduce_axes)
                    if perm != tuple(range(len(perm))):
                        sigma = jnp.transpose(sigma, perm)
                    if normalize_messages:
                        # scale control for arbitrary-scale factors
                        sigma = sigma / jnp.maximum(jnp.sum(sigma), TINY)
                    if fresh:
                        ratio = sigma
                    else:
                        # mu is a normalized non-negative message: zero only
                        # where sigma is zero, so clamped division gives the
                        # 0/0=0 semantics without the NaN-filter ops
                        ratio = sigma / jnp.maximum(mu_local[edge], TINY)
                    local[dst] = local[dst] * _expand(ratio, bperm, bspec)
                    mu_local[edge] = sigma
                return (
                    tuple(local[c] for c in out_cliques),
                    tuple(mu_local[e] for e in out_edges),
                )

            return in_cliques, out_cliques, in_edges, out_edges, jax.jit(run)

        segments = [make_segment(chunk) for chunk in chunks]
        stage0_fn = jax.jit(stage0)

        # AOT-compile everything concurrently: all shapes are static
        import concurrent.futures

        factor_specs = [
            jax.ShapeDtypeStruct(shape, dtype) for shape in self.factor_shapes
        ]

        def compile_stage0():
            stage0_fn.lower(factor_specs).compile()

        def compile_segment(seg):
            in_cliques, _, in_edges, _, fn = seg
            fn.lower(
                tuple(jax.ShapeDtypeStruct(clique_shapes[c], dtype) for c in in_cliques),
                tuple(jax.ShapeDtypeStruct(sepset_shapes[e], dtype) for e in in_edges),
            ).compile()

        jobs = [compile_stage0] + [
            (lambda s=s: compile_segment(s)) for s in segments
        ]
        if len(jobs) > 1:
            with concurrent.futures.ThreadPoolExecutor(
                max_workers=min(8, len(jobs))
            ) as pool:
                list(pool.map(lambda j: j(), jobs))
        else:
            jobs[0]()

        def calibrate(factor_arrays):
            beliefs = list(stage0_fn(factor_arrays))
            mu = [None] * len(sepset_shapes)
            for in_cliques, out_cliques, in_edges, out_edges, fn in segments:
                b_out, m_out = fn(
                    tuple(beliefs[c] for c in in_cliques),
                    tuple(mu[e] for e in in_edges),
                )
                for c, arr in zip(out_cliques, b_out):
                    beliefs[c] = arr
                for e, arr in zip(out_edges, m_out):
                    mu[e] = arr
            return beliefs, mu

        return calibrate


class _CompiledBPQuery:
    """One compiled post-calibration query program per (query vars,
    evidence vars) signature — the BP analogue of ``ve._CompiledQuery``.

    Built once per signature: prune the model, calibrate the pruned
    junction tree (raw device arrays, never materialized factors), extract
    the minimal covering subtree's potentials (root belief + child/sepset
    ratios, Koller & Friedman Alg. 10.4), and close a jitted contraction
    over them that takes only the evidence state codes as input.  Repeat
    queries with the same signature are a single executable dispatch.
    Reference semantics: ``ExactInference.py:997-1319``.
    """

    def __init__(self, bp, variables, ev_vars):
        from pgmpy_tpu.config import config
        from pgmpy_tpu.inference.ve import _SMALL_QUERY_ELEMENTS, _cpu_device
        from pgmpy_tpu.ops.einsum import PRECISION, make_axis_map

        model, kept_evidence = bp._prune_bayesian_model(
            list(variables), {v: 0 for v in ev_vars}
        )
        self.query_vars = list(variables)
        self.kept = [v for v in ev_vars if v in kept_evidence]

        # merge=False: the covering-subtree contraction below vmaps over
        # evidence rows — smaller unmerged cliques mean fewer FLOPs/bytes
        # per row, and the one-shot calibrate here runs exactly once
        inner = BeliefPropagation(model, merge=False)
        inner._calibrate_junction_tree(operation="marginalize", one_shot=True)
        program = inner._program
        beliefs, mu = inner._raw_beliefs
        inner._raw_beliefs = None  # keep the big factor dicts unmaterialized

        cards = program.cards
        missing = [v for v in self.query_vars if v not in cards]
        if missing:
            raise ValueError(f"Query variables not in reduced model: {missing}")

        # minimal covering subtree per connected component over
        # query + evidence variables (bp._query semantics)
        tree = inner.junction_tree
        target_vars = set(self.query_vars) | set(self.kept)
        covering_all = {
            c for c in tree.nodes() if target_vars & set(c)
        }
        arrays, scopes = [], []
        for component in nx.connected_components(tree):
            covering = [c for c in covering_all if c in component]
            if not covering:
                continue
            subtree_nodes = set(covering)
            for i in range(len(covering) - 1):
                subtree_nodes.update(
                    nx.shortest_path(tree, covering[i], covering[i + 1])
                )
            sub = tree.subgraph(subtree_nodes)
            root = next(iter(subtree_nodes))
            arrays.append(beliefs[program.index[root]])
            scopes.append(list(root))
            parent_nodes = {root}
            traversed = set()
            while parent_nodes:
                parent = parent_nodes.pop()
                for child in set(sub.neighbors(parent)) - traversed:
                    edge_id = program.edge_ids[frozenset((parent, child))]
                    sepset = sorted(set(parent) & set(child), key=str)
                    bperm, bspec = _broadcast_spec(sepset, list(child))
                    ratio = _safe_div(
                        beliefs[program.index[child]],
                        _expand(mu[edge_id], bperm, bspec),
                    )
                    arrays.append(ratio)
                    scopes.append(list(child))
                    parent_nodes.add(child)
                traversed.add(parent)

        state_names = inner._state_names
        self.cards = [int(cards[v]) for v in self.query_vars]
        self.state_names = {
            v: list(state_names[v]) for v in self.query_vars if v in state_names
        }
        self._code_maps = [
            {s: i for i, s in enumerate(state_names[v])} for v in self.kept
        ]
        self._kept_cards = [int(cards[v]) for v in self.kept]

        var_to_int, operand_axes = make_axis_map(
            scopes + [[v] for v in self.kept]
        )
        out_axes = [var_to_int[v] for v in self.query_vars]

        out_size = int(np.prod(self.cards)) if self.cards else 1
        total = sum(int(np.asarray(a).size) for a in arrays) + out_size
        self._device = _cpu_device() if total < _SMALL_QUERY_ELEMENTS else None
        if self._device is not None:
            arrays = [jax.device_put(a, self._device) for a in arrays]

        n_f = len(arrays)
        kept_cards = self._kept_cards
        dtype = config.DTYPE

        def run(codes):
            interleaved = []
            for arr, axes in zip(arrays, operand_axes[:n_f]):
                interleaved.append(arr)
                interleaved.append(list(axes))
            for k, axes in enumerate(operand_axes[n_f:]):
                interleaved.append(
                    jax.nn.one_hot(codes[k], kept_cards[k], dtype=dtype)
                )
                interleaved.append(list(axes))
            interleaved.append(out_axes)
            values = jnp.einsum(
                *interleaved, optimize="greedy", precision=PRECISION
            )
            return values / jnp.sum(values)

        self._run = run
        self._fn = jax.jit(run)
        self._batch_fn = None

    def batch(self, evidence):
        """P(query | evidence_row) for every row: one vmapped dispatch of
        the per-signature contraction (codes gain a leading batch axis;
        the per-row normalization vmaps with it)."""
        n = len(next(iter(evidence.values())))
        codes = np.empty((n, len(self.kept)), dtype=np.int32)
        for k, var in enumerate(self.kept):
            mapping = self._code_maps[k]
            card = self._kept_cards[k]
            col = np.empty(n, dtype=np.int32)
            for i, state in enumerate(evidence[var]):
                # same validation as encode(): silent out-of-range codes
                # would one-hot to all-zeros and produce NaN rows
                if state in mapping:
                    col[i] = mapping[state]
                elif isinstance(state, (int, np.integer)) and 0 <= state < card:
                    col[i] = int(state)
                else:
                    raise ValueError(
                        f"Evidence state {state!r} not valid for {var}"
                    )
            codes[:, k] = col
        import contextlib

        if self._batch_fn is None:
            self._batch_fn = jax.jit(jax.vmap(self._run))
        ctx = (
            jax.default_device(self._device)
            if self._device is not None
            else contextlib.nullcontext()
        )
        with ctx:
            return self._batch_fn(jnp.asarray(codes))

    def encode(self, evidence):
        codes = np.empty(len(self.kept), dtype=np.int32)
        for k, var in enumerate(self.kept):
            state = evidence[var]
            mapping = self._code_maps[k]
            if state in mapping:
                codes[k] = mapping[state]
            elif isinstance(state, (int, np.integer)) and 0 <= state < self._kept_cards[k]:
                codes[k] = int(state)
            else:
                raise ValueError(f"Evidence state {state!r} not valid for {var}")
        return codes

    def __call__(self, evidence):
        codes = self.encode(evidence)
        if self._device is not None:
            on_device = jax.device_put(codes, self._device)
        else:
            on_device = jnp.asarray(codes)
        values = self._fn(on_device)
        return DiscreteFactor(
            list(self.query_vars), self.cards, values, state_names=self.state_names
        )


class BeliefPropagation(Inference):
    """Exact inference by junction-tree calibration, compiled to a static
    two-pass message program (see module docstring).

    Examples
    --------
    >>> import numpy as np
    >>> from pgmpy_tpu.factors import TabularCPD
    >>> from pgmpy_tpu.inference import BeliefPropagation
    >>> from pgmpy_tpu.models import DiscreteBayesianNetwork
    >>> model = DiscreteBayesianNetwork([("rain", "wet"), ("rain", "dark")])
    >>> model.add_cpds(
    ...     TabularCPD("rain", 2, [[0.8], [0.2]]),
    ...     TabularCPD("wet", 2, [[0.9, 0.2], [0.1, 0.8]],
    ...                evidence=["rain"], evidence_card=[2]),
    ...     TabularCPD("dark", 2, [[0.7, 0.4], [0.3, 0.6]],
    ...                evidence=["rain"], evidence_card=[2]))
    >>> bp = BeliefPropagation(model)
    >>> bp.calibrate()
    >>> sorted(len(c) for c in bp.get_cliques())
    [2, 2]
    >>> phi = bp.query(["dark"], evidence={"wet": 1})
    >>> np.asarray(phi.values, dtype=float).round(3).tolist()
    [0.5, 0.5]
    """

    def __init__(self, model, merge="auto"):
        """``merge``: clique-agglomeration policy forwarded to
        ``JunctionTreeProgram.from_factors``.  "auto" (default) merges on
        MUNIN-class trees — the right call for repeated calibrations; the
        per-signature query builds pass ``False`` because their one-shot
        covering-subtree contraction is cheaper over the smaller unmerged
        cliques."""
        super().__init__(model)
        self.clique_beliefs = {}
        self.sepset_beliefs = {}
        self._calibrated_operation = None
        self._merge = merge

        if isinstance(model, JunctionTree):
            self.junction_tree = model.copy()
            factors = self.junction_tree.factors
            self._input_factors = factors
            cards = self.junction_tree.get_cardinality()
            cliques = list(self.junction_tree.nodes())
            clique_of = {frozenset(c): i for i, c in enumerate(cliques)}
            assignment = [clique_of[frozenset(f.scope())] for f in factors]
            self._program = JunctionTreeProgram(
                cliques,
                list(self.junction_tree.edges()),
                cards,
                [list(f.variables) for f in factors],
                assignment,
            )
        else:
            if isinstance(model, DiscreteBayesianNetwork):
                factors = [cpd.to_factor() for cpd in model.get_cpds()]
            elif isinstance(model, (DiscreteMarkovNetwork, FactorGraph)):
                factors = list(model.get_factors())
            else:
                raise TypeError(f"Unsupported model type: {type(model)}")
            self._input_factors = factors
            cards = {}
            for f in factors:
                for v, c in zip(f.variables, f.cardinality):
                    cards[v] = int(c)
            self._program = JunctionTreeProgram.from_factors(
                [list(f.variables) for f in factors],
                cards,
                # CPD-built trees carry true probability marginals as
                # messages — in-flight normalization is numerically inert
                # and only inflates the compiled program
                normalize_messages=not isinstance(model, DiscreteBayesianNetwork),
                merge=merge,
            )
            # materialize the clique-tree graph (without eager potentials)
            self.junction_tree = JunctionTree()
            self.junction_tree.add_nodes_from(self._program.cliques)
            for edge_key in self._program.edge_ids:
                u, v = tuple(edge_key)
                self.junction_tree.add_edge(u, v)

        self._state_names = {}
        for f in self._input_factors:
            self._state_names.update(f.state_names)

    def _get_compiled_query(self, variables, ev_vars):
        """Per-signature compiled query cache on the model, token-checked
        and LRU-bounded (mirrors ``ve._get_compiled_query``)."""
        from pgmpy_tpu.utils.cache import LRUDict

        token = self.model._cache_token()
        cache = self.model.__dict__.get("_bp_program_cache")
        if cache is None or cache[0] != token:
            cache = (token, LRUDict(max_size=128))
            self.model.__dict__["_bp_program_cache"] = cache
        key = (tuple(variables), tuple(ev_vars))
        prog = cache[1].get(key)
        if prog is None:
            prog = _CompiledBPQuery(self, variables, ev_vars)
            cache[1][key] = prog
        return prog

    def get_cliques(self):
        return self.junction_tree.nodes()

    def get_clique_beliefs(self):
        return self.clique_beliefs

    def get_sepset_beliefs(self):
        return self.sepset_beliefs

    # Belief *arrays* come back from the device program; wrapping MUNIN's
    # ~2500 of them into DiscreteFactor objects costs more host time than
    # the calibration dispatch itself, so materialization is lazy: calibrate
    # stores the raw arrays and the factor dicts build on first access.
    @property
    def clique_beliefs(self):
        if self._raw_beliefs is not None:
            self._materialize_beliefs()
        return self._clique_beliefs

    @clique_beliefs.setter
    def clique_beliefs(self, value):
        self._clique_beliefs = value
        self._raw_beliefs = None

    @property
    def sepset_beliefs(self):
        if self._raw_beliefs is not None:
            self._materialize_beliefs()
        return self._sepset_beliefs

    @sepset_beliefs.setter
    def sepset_beliefs(self, value):
        self._sepset_beliefs = value

    def _materialize_beliefs(self):
        program = self._program
        beliefs, mu = self._raw_beliefs
        self._raw_beliefs = None
        cards = program.cards
        states = self._state_names
        self._clique_beliefs = {}
        for clique, values in zip(program.cliques, beliefs):
            self._clique_beliefs[clique] = DiscreteFactor(
                list(clique),
                [cards[v] for v in clique],
                values,
                state_names={v: states[v] for v in clique if v in states},
            )
        self._sepset_beliefs = {}
        for edge_key, edge_id in program.edge_ids.items():
            c1, c2 = tuple(edge_key)
            sepset = sorted(set(c1) & set(c2), key=str)
            self._sepset_beliefs[edge_key] = (
                DiscreteFactor(
                    sepset,
                    [cards[v] for v in sepset],
                    mu[edge_id],
                    state_names={v: states[v] for v in sepset if v in states},
                )
                if mu[edge_id] is not None
                else None
            )

    def _calibrate_junction_tree(self, operation, one_shot=False):
        program = self._program
        arrays = [f.values for f in self._input_factors]
        beliefs, mu = program.executor(operation, one_shot=one_shot)(arrays)
        self._raw_beliefs = (beliefs, mu)
        self._calibrated_operation = operation

    def calibrate(self):
        """Exact two-pass Lauritzen-Spiegelhalter calibration, fully compiled
        to one device program."""
        self._calibrate_junction_tree(operation="marginalize")

    def max_calibrate(self):
        self._calibrate_junction_tree(operation="maximize")

    def _query(self, variables, operation, evidence=None, joint=True, show_progress=False):
        if self._calibrated_operation != operation:
            self._calibrate_junction_tree(operation=operation)

        if not isinstance(variables, (list, tuple, set)):
            query_variables = [variables]
        else:
            query_variables = list(variables)
        query_variables.extend(evidence.keys() if evidence else [])

        # minimal covering subtree per connected component (pruned models can
        # yield clique forests; independent components just multiply)
        nodes_with_query_variables = set()
        for var in query_variables:
            nodes_with_query_variables.update(
                c for c in self.junction_tree.nodes() if var in c
            )
        clique_potential_list = []
        all_subtree_nodes = set()
        all_subtree_edges = []
        for component in nx.connected_components(self.junction_tree):
            covering = [c for c in nodes_with_query_variables if c in component]
            if not covering:
                continue
            subtree_nodes = set(covering)
            for i in range(len(covering) - 1):
                subtree_nodes.update(
                    nx.shortest_path(self.junction_tree, covering[i], covering[i + 1])
                )
            sub = self.junction_tree.subgraph(subtree_nodes)
            all_subtree_nodes |= subtree_nodes
            all_subtree_edges.extend(sub.edges())
            # clique potentials: root belief, then child beliefs divided by
            # their sepset beliefs (Koller & Friedman Alg. 10.4)
            root_node = next(iter(subtree_nodes))
            clique_potential_list.append(self.clique_beliefs[root_node])
            parent_nodes = {root_node}
            traversed = set()
            while parent_nodes:
                parent_node = parent_nodes.pop()
                for child_node in set(sub.neighbors(parent_node)) - traversed:
                    sepset_belief = self.sepset_beliefs[
                        frozenset((parent_node, child_node))
                    ]
                    clique_potential_list.append(
                        self.clique_beliefs[child_node] / sepset_belief
                    )
                    parent_nodes.add(child_node)
                traversed.add(parent_node)

        # a ClusterGraph tolerates clique forests (JunctionTree insists on
        # connectedness); VE only needs the factor list
        subtree = ClusterGraph()
        subtree.add_nodes_from(all_subtree_nodes)
        for u, v in all_subtree_edges:
            subtree.add_edge(u, v)
        subtree.add_factors(*clique_potential_list)

        variable_elimination = VariableElimination(subtree)
        if operation == "marginalize":
            return variable_elimination.query(
                variables=variables, evidence=evidence, joint=joint,
                show_progress=show_progress,
            )
        return variable_elimination.map_query(
            variables=variables, evidence=evidence, show_progress=show_progress
        )

    def query(
        self,
        variables,
        evidence=None,
        virtual_evidence=None,
        joint=True,
        show_progress=False,
    ):
        """Posterior P(variables | evidence) from the calibrated tree."""
        evidence = evidence if evidence is not None else dict()
        common_vars = set(evidence).intersection(set(variables))
        if common_vars:
            raise ValueError(f"Can't have the same variables in both `variables` and `evidence`. Found in both: {common_vars}")

        if isinstance(self.model, DiscreteBayesianNetwork) and virtual_evidence is not None:
            original = self.model
            try:
                self._virtual_evidence(virtual_evidence)
                virt_evidence = {"__" + str(cpd.variables[0]): 0 for cpd in virtual_evidence}
                return self.query(
                    variables=variables,
                    evidence={**evidence, **virt_evidence},
                    virtual_evidence=None,
                    joint=joint,
                    show_progress=show_progress,
                )
            finally:
                self.__init__(original)

        if isinstance(self.model, DiscreteBayesianNetwork):
            # compiled per-signature program (prune + calibrate + subtree
            # contraction happen ONCE per (query vars, evidence vars)
            # signature; repeat queries are a single dispatch with evidence
            # entering as device codes — mirrors ve._get_compiled_query)
            prog = self._get_compiled_query(
                tuple(variables), tuple(sorted(evidence.keys(), key=str))
            )
            result = prog(evidence)
            if joint:
                return result
            return {
                var: result.marginalize(
                    [v for v in variables if v != var], inplace=False
                )
                for var in variables
            }
        result = self._query(
            variables=variables, operation="marginalize", evidence=evidence,
            joint=joint, show_progress=show_progress,
        )
        if joint:
            return result.normalize(inplace=False)
        return result

    def query_batch(self, variables, evidence):
        """Posterior P(variables | evidence_row) for EVERY row of a batch
        of evidence assignments through the calibrated tree: the
        per-signature covering-subtree contraction (Koller & Friedman
        Alg. 10.4) is vmapped over a batch axis of evidence codes, so N
        rows cost one dispatch.  Mirrors ``VariableElimination.
        query_batch``'s contract (the device analogue of the reference's
        joblib per-row predict loop, ``DiscreteBayesianNetwork.py:731-911``).

        Parameters
        ----------
        variables : list of query variables
        evidence : dict {var: sequence of state names/indices}, all the
            same length n

        Returns
        -------
        (values, state_names): values has shape (n, card_q1, ...) with
        each row normalized; state_names covers the query variables.
        """
        if not evidence:
            raise ValueError("query_batch requires evidence; use query() otherwise")
        if not isinstance(self.model, DiscreteBayesianNetwork):
            raise NotImplementedError(
                "query_batch is implemented for DiscreteBayesianNetwork models"
            )
        prog = self._get_compiled_query(
            tuple(variables), tuple(sorted(evidence.keys(), key=str))
        )
        values = prog.batch(evidence)
        return values, dict(prog.state_names)

    def map_query(
        self, variables=None, evidence=None, virtual_evidence=None, show_progress=False
    ):
        """MAP assignment of ``variables`` given evidence (argmax of the
        sum-posterior joint, matching reference semantics).
        ``variables=None`` means all non-evidence variables."""
        if not variables:
            variables = sorted(
                set(self.variables) - set(evidence or {}), key=str
            )
        variables = list(variables)
        common_vars = set(evidence if evidence is not None else []) & set(variables)
        if common_vars:
            raise ValueError(f"Can't have the same variables in both `variables` and `evidence`. Found in both: {common_vars}")

        if isinstance(self.model, DiscreteBayesianNetwork) and virtual_evidence is not None:
            original = self.model
            try:
                self._virtual_evidence(virtual_evidence)
                virt_evidence = {"__" + str(cpd.variables[0]): 0 for cpd in virtual_evidence}
                return self.map_query(
                    variables=variables,
                    evidence={**(evidence or {}), **virt_evidence},
                    virtual_evidence=None,
                    show_progress=show_progress,
                )
            finally:
                self.__init__(original)

        final_distribution = self.query(
            variables=variables, evidence=evidence, joint=True,
            show_progress=show_progress,
        )
        argmax = int(np.argmax(np.asarray(final_distribution.values)))
        assignment = final_distribution.assignment([argmax])[0]
        return {var: value for var, value in assignment}
