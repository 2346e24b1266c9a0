"""Driver-side initial partitioning of the coarsest graph (SURVEY.md §2.10).

The deep-multilevel pipeline coarsens until n <= ~2*contraction_limit, then
the coarsest graph is the ONLY thing collected to the driver (the Spark
analog of the reference running initial partitioning on the coarsest graph,
partitioning_scheme/parallel_recursive_bisection.cc:73-123). Everything here
is plain numpy/heapq on CSR arrays, seeded and deterministic:

- bipartitioner portfolio: random (random_bipartitioner.h:20-29), BFS growers
  with block-selection strategies (bfs_bipartitioner.h:84-164), greedy graph
  growing (greedy_graph_growing_bipartitioner.cc:4-61)
- 2-way FM refinement with rollback to the best prefix and a fruitless-move
  stop (initial_refiner.h:162-416)
- pool: repetitions x algorithms, keep best by (feasible, cut, imbalance)
  (pool_bipartitioner.h:120-220)
- recursive bisection to k with adaptive epsilon per level (helper.cc:87-176,
  context.cc:384-393) and ceil/floor k splitting (utility/math.h:51)
"""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass

import numpy as np

from kaminpar_spark.functions.rules import adaptive_epsilon, split_integral


@dataclass
class SmallGraph:
    """CSR graph on the driver. indptr: n+1, indices/eweights: m (half-edges)."""

    indptr: np.ndarray
    indices: np.ndarray
    eweights: np.ndarray
    nweights: np.ndarray

    @property
    def n(self) -> int:
        return len(self.indptr) - 1

    @property
    def total_weight(self) -> int:
        return int(self.nweights.sum())

    @staticmethod
    def from_edges(n: int, src: np.ndarray, dst: np.ndarray, w: np.ndarray, nw: np.ndarray) -> "SmallGraph":
        order = np.argsort(src, kind="stable")
        src, dst, w = src[order], dst[order], w[order]
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(indptr, src + 1, 1)
        indptr = np.cumsum(indptr)
        return SmallGraph(indptr, dst.astype(np.int64), w.astype(np.int64), nw.astype(np.int64))

    def neighbors(self, u: int):
        s, e = self.indptr[u], self.indptr[u + 1]
        return self.indices[s:e], self.eweights[s:e]


def cut_of(g: SmallGraph, part: np.ndarray) -> int:
    src = np.repeat(np.arange(g.n), np.diff(g.indptr))
    cross = part[src] != part[g.indices]
    return int(g.eweights[cross].sum() // 2)


def _block_weights(g: SmallGraph, part: np.ndarray, k: int = 2) -> np.ndarray:
    return np.bincount(part, weights=g.nweights, minlength=k).astype(np.int64)


def bipartition_random(g: SmallGraph, caps: tuple[float, float], rng: np.random.Generator) -> np.ndarray:
    """Random block, fall back to the other on overflow (random_bipartitioner.h:20-29).
    ``caps`` are per-side max weights (supports k1:k2 ratio splits)."""
    part = np.zeros(g.n, dtype=np.int64)
    bw = [0, 0]
    for u in rng.permutation(g.n):
        b = int(rng.integers(0, 2))
        if bw[b] + g.nweights[u] > caps[b]:
            b = 1 - b
        part[u] = b
        bw[b] += g.nweights[u]
    return part


def _pseudo_peripheral(g: SmallGraph, rng: np.random.Generator) -> tuple[int, int]:
    """BFS from a random node, take the farthest; repeat once
    (graph_utils.cc:317-360)."""
    def bfs_far(s):
        dist = -np.ones(g.n, dtype=np.int64)
        dist[s] = 0
        q = [s]
        last = s
        while q:
            nq = []
            for u in q:
                for v in g.neighbors(u)[0]:
                    if dist[v] < 0:
                        dist[v] = dist[u] + 1
                        nq.append(v)
                        last = v
            q = nq
        return last

    s = int(rng.integers(0, g.n))
    a = bfs_far(s)
    b = bfs_far(a)
    return a, b


def bipartition_bfs(
    g: SmallGraph, caps: tuple[float, float], rng: np.random.Generator, strategy: str = "alternating"
) -> np.ndarray:
    """Grow two blocks by BFS from pseudo-peripheral seeds; block switching by
    strategy (bfs_bipartitioner.h:20-57: alternating | lighter | sequential |
    longer_queue | shorter_queue)."""
    a, b = _pseudo_peripheral(g, rng)
    part = -np.ones(g.n, dtype=np.int64)
    queues = [[a], [b]]
    bw = [0, 0]
    cur = 0
    assigned = 0
    bounced = np.zeros(g.n, dtype=bool)  # each node may be rerouted once only
    while assigned < g.n:
        if strategy == "alternating":
            cur = 1 - cur
        elif strategy == "lighter":
            cur = 0 if bw[0] <= bw[1] else 1
        # sequential: fill block 0 to its target weight, then block 1
        elif strategy == "sequential":
            cur = 0 if bw[0] + 1 <= caps[0] / 1.0 - 1 else 1
        # queue-length strategies (bfs_bipartitioner.h:43-57): pick the block
        # whose BFS frontier is longer (resp. shorter)
        elif strategy == "longer_queue":
            cur = 1 if len(queues[0]) < len(queues[1]) else 0
        elif strategy == "shorter_queue":
            cur = 0 if len(queues[0]) < len(queues[1]) else 1
        q = queues[cur]
        moved = False
        while q:
            u = q.pop(0)
            if part[u] >= 0:
                continue
            if (
                not bounced[u]
                and bw[cur] + g.nweights[u] > caps[cur]
                and bw[1 - cur] + g.nweights[u] <= caps[1 - cur]
            ):
                bounced[u] = True
                queues[1 - cur].append(u)
                continue
            part[u] = cur
            bw[cur] += g.nweights[u]
            assigned += 1
            q.extend(v for v in g.neighbors(u)[0] if part[v] < 0)
            moved = True
            break
        if not moved:
            # queue exhausted: seed from any unassigned node
            rest = np.nonzero(part < 0)[0]
            if len(rest) == 0:
                break
            queues[cur].append(int(rest[0]))
    part[part < 0] = 0
    return part


def bipartition_ggg(g: SmallGraph, caps: tuple[float, float], rng: np.random.Generator) -> np.ndarray:
    """Greedy graph growing: start all in V0, grow V1 from a random seed by
    max gain until V1 reaches its target weight
    (greedy_graph_growing_bipartitioner.cc:4-61)."""
    part = np.zeros(g.n, dtype=np.int64)
    target = g.total_weight - min(caps[0], g.total_weight)  # leave V0 within cap
    seed = int(rng.integers(0, g.n))
    gain = {}  # node -> gain of moving to V1
    pq = []  # (-gain, node)
    in_v1 = np.zeros(g.n, dtype=bool)

    def push(u):
        nbrs, ws = g.neighbors(u)
        gn = int(ws[in_v1[nbrs]].sum() - ws[~in_v1[nbrs]].sum())
        gain[u] = gn
        heapq.heappush(pq, (-gn, u))

    push(seed)
    w1 = 0
    while pq and w1 < target:
        ng, u = heapq.heappop(pq)
        if in_v1[u] or -ng != gain.get(u):
            continue
        in_v1[u] = True
        part[u] = 1
        w1 += g.nweights[u]
        for v in g.neighbors(u)[0]:
            if not in_v1[v]:
                push(v)
    return part


def fm_refine_2way(
    g: SmallGraph,
    part: np.ndarray,
    caps: tuple[float, float] | float,
    max_iterations: int = 5,
    fruitless_moves: int = 100,
    rng: np.random.Generator | None = None,
    stopping: str = "simple",
    alpha: float = 1.0,
) -> np.ndarray:
    """2-way FM with per-block PQs, rollback to the best accepted prefix, and
    a configurable stop (initial_refiner.h:162-416). Selection policy:
    prefer moving out of the heavier block when both PQs nonempty
    (MaxOverloadSelectionPolicy, initial_refiner.h:60-105).

    ``stopping='simple'``: stop after ``fruitless_moves`` unaccepted moves
    (SimpleStoppingPolicy). ``stopping='adaptive'``: the KaHyPar random-walk
    test (AdaptiveStoppingPolicy, initial_refiner.h:85-151): model the gain
    sequence since the last accepted cut as a random walk with running mean
    Mk and sample variance; stop once steps > sqrt(n) and (Mk == 0 or
    steps >= variance / Mk^2 * (alpha/2 - 0.25)) — i.e. when further
    improvement is statistically unlikely. alpha default 1.0
    (context.h:169)."""
    assert stopping in ("simple", "adaptive")
    if not isinstance(caps, tuple):
        caps = (caps, caps)
    beta = math.sqrt(g.n)
    factor = alpha / 2.0 - 0.25
    part = part.copy()
    for _ in range(max_iterations):
        bw = _block_weights(g, part)
        gains = np.zeros(g.n, dtype=np.int64)
        src_rep = np.repeat(np.arange(g.n), np.diff(g.indptr))
        same = part[src_rep] == part[g.indices]
        np.add.at(gains, src_rep, np.where(same, -g.eweights, g.eweights))
        pqs = [[], []]
        valid = [{}, {}]
        for u in range(g.n):
            b = part[u]
            heapq.heappush(pqs[b], (-gains[u], u))
            valid[b][u] = gains[u]
        moved_order: list[int] = []
        cum_gain = 0
        best_gain, best_prefix = 0, 0
        locked = np.zeros(g.n, dtype=bool)
        fruitless = 0
        walk = _Welford()  # gain sequence since the last accepted cut

        def should_stop() -> bool:
            if stopping == "simple":
                return fruitless >= fruitless_moves
            if walk.count <= beta:
                return False
            mk = walk.mean
            if mk == 0:
                return True
            var = walk.m2 / (walk.count - 1) if walk.count > 1 else 0.0
            return walk.count >= (var / (mk * mk)) * factor

        while (pqs[0] or pqs[1]) and not should_stop():
            b = 0 if bw[0] >= bw[1] else 1
            if not pqs[b]:
                b = 1 - b
            ng, u = heapq.heappop(pqs[b])
            if locked[u] or u not in valid[b] or -ng != valid[b][u]:
                continue
            del valid[b][u]
            if bw[1 - b] + g.nweights[u] > caps[1 - b]:
                continue
            # move u
            part[u] = 1 - b
            bw[b] -= g.nweights[u]
            bw[1 - b] += g.nweights[u]
            locked[u] = True
            moved_order.append(u)
            cum_gain += -ng
            walk.update(float(-ng))
            if cum_gain > best_gain:
                best_gain, best_prefix = cum_gain, len(moved_order)
                fruitless = 0
                walk = _Welford()  # policy reset on accepted cut
            else:
                fruitless += 1
            # update neighbor gains by +-2w(e) (initial_refiner.h:285-307)
            nbrs, ws = g.neighbors(u)
            for v, w in zip(nbrs, ws):
                if locked[v]:
                    continue
                delta = 2 * w if part[v] == part[u] else -2 * w
                # recompute from scratch is simpler and n is small:
                vn, vw = g.neighbors(v)
                gv = int(vw[part[vn] != part[v]].sum() - vw[part[vn] == part[v]].sum())
                vb = part[v]
                valid[vb][v] = gv
                heapq.heappush(pqs[vb], (-gv, v))
        # rollback to best prefix (initial_refiner.h:320)
        for u in moved_order[best_prefix:]:
            part[u] = 1 - part[u]
        if best_gain == 0:
            break
    return part


_PORTFOLIO = [
    ("random", bipartition_random),
    ("bfs_alternating", lambda g, c, rng: bipartition_bfs(g, c, rng, "alternating")),
    ("bfs_lighter", lambda g, c, rng: bipartition_bfs(g, c, rng, "lighter")),
    ("bfs_sequential", lambda g, c, rng: bipartition_bfs(g, c, rng, "sequential")),
    ("bfs_longer_queue", lambda g, c, rng: bipartition_bfs(g, c, rng, "longer_queue")),
    ("bfs_shorter_queue", lambda g, c, rng: bipartition_bfs(g, c, rng, "shorter_queue")),
    ("ggg", bipartition_ggg),
]


class _Welford:
    """Running mean/variance of feasible cuts per bipartitioner — the adaptive
    selection statistic (pool_bipartitioner.h:149-153 running_statistics)."""

    def __init__(self):
        self.count = 0
        self.mean = 0.0
        self.m2 = 0.0

    def update(self, x: float) -> None:
        self.count += 1
        d = x - self.mean
        self.mean += d / self.count
        self.m2 += d * (x - self.mean)

    def get(self) -> tuple[float, float]:
        var = self.m2 / self.count if self.count > 0 else 0.0
        return self.mean, var


def ip_num_repetitions(final_k: int, k: int, multiplier: float = 1.0,
                       min_reps: int = 10, max_reps: int = 50) -> int:
    """Adaptive repetition budget: ceil(multiplier * final_k / ceil_log2(k)),
    clamped to [min, max] (initial_partitioning_facade.h:38,
    context.cc:325-328 defaults)."""
    from kaminpar_spark.functions.rules import ceil_log2

    reps = math.ceil(multiplier * final_k / max(1, ceil_log2(max(2, k))))
    return max(min_reps, min(max_reps, reps))


def pool_bipartition(
    g: SmallGraph,
    epsilon: float,
    seed: int = 42,
    repetitions: int = 4,
    ratio: tuple[int, int] = (1, 1),
    adaptive: bool = True,
    min_non_adaptive_reps: int = 5,
) -> np.ndarray:
    """Portfolio + select best (feasible, cut) (pool_bipartitioner.h:120-220,
    helper.h:77-104). Every candidate is FM-refined before scoring. ``ratio``
    = (k1, k2) sets per-side target weights W*k1/k and W*k2/k (the reference
    bisects toward the final_k split, helper.cc:87-176).

    ``adaptive=True`` mirrors use_adaptive_bipartitioner_selection: after
    ``min_non_adaptive_reps`` runs, a bipartitioner only runs again while it
    is statistically likely to beat the best cut — variance > ((mean -
    best_cut)/2)^2 (pool_bipartitioner.h:149-153)."""
    if g.n == 0:
        return np.zeros(0, dtype=np.int64)
    k1, k2 = ratio
    slack = int(g.nweights.max(initial=1))
    caps = tuple(
        max(
            (1 + epsilon) * math.ceil(g.total_weight * ks / (k1 + k2)),
            math.ceil(g.total_weight * ks / (k1 + k2)) + slack,
        )
        for ks in (k1, k2)
    )
    rng = np.random.default_rng(seed)
    best = None  # ((infeasible, cut), part)
    stats = [_Welford() for _ in _PORTFOLIO]

    def likely_to_improve(i: int) -> bool:
        if best is None or best[0][0] > 0:  # no feasible best yet
            return True
        mean, var = stats[i].get()
        rhs = (mean - float(best[0][1])) / 2
        return var > rhs * rhs

    for rep in range(repetitions):
        for i, (name, algo) in enumerate(_PORTFOLIO):
            if adaptive and rep >= min_non_adaptive_reps and not likely_to_improve(i):
                continue
            part = algo(g, caps, rng)
            part = fm_refine_2way(g, part, caps, rng=rng)
            bw = _block_weights(g, part)
            infeasible = int(max(0, bw[0] - caps[0]) + max(0, bw[1] - caps[1]))
            if g.n >= 2 and (bw[0] == 0 or bw[1] == 0):
                infeasible += g.total_weight  # empty side = worst infeasibility
            cut = cut_of(g, part)
            if infeasible == 0:
                stats[i].update(float(cut))
            cand = (infeasible, cut)
            if best is None or cand < best[0]:
                best = (cand, part)
    return best[1]


def recursive_bisect(
    g: SmallGraph,
    k: int,
    epsilon: float,
    seed: int = 42,
    k_final: int | None = None,
    total_weight_root: int | None = None,
    final_k: int | None = None,
    multilevel: bool = True,
    replication_threads: int = 1,
) -> np.ndarray:
    """Recursive bisection to k blocks (helper.cc:87-176
    extend_partition_recursive). ``final_k`` (>= k) is how many of the FINAL
    blocks this subgraph will eventually host: the bipartition ratio and
    adaptive epsilon follow split_integral(final_k) — NOT split_integral(k) —
    exactly like the reference's InitialPartitioner(final_k)
    (initial_partitioning_facade.h:28-38, context.cc:370-393), and each
    recursion side carries (k_i, final_k_i). With final_k == k (the default)
    this reduces to plain bisection toward k.

    ``multilevel=True`` (default, the reference's behavior) runs each
    bisection through the sequential multilevel pipeline (E6/E7,
    multilevel_bipartition); False bisects the graph flat (pool only).
    ``replication_threads > 1`` instead runs each bisection through the E9
    split-and-join replica tree (replicated_bipartition) with that thread
    budget — mid-coarsening forks + best-of joins."""
    final_k = final_k or k
    k_final = k_final or final_k
    total_weight_root = total_weight_root or g.total_weight
    if k <= 1 or g.n == 0:
        return np.zeros(g.n, dtype=np.int64)
    assert final_k >= k, (k, final_k)
    eps_prime = adaptive_epsilon(
        epsilon, k_final, final_k, total_weight_root, g.total_weight
    )
    fk1, fk2 = split_integral(final_k)
    k1, k2 = split_integral(k)
    if replication_threads > 1:
        def bipartition(gg, ee, seed, ratio):
            return replicated_bipartition(
                gg, ee, seed=seed, num_threads=replication_threads, ratio=ratio
            )
    else:
        bipartition = multilevel_bipartition if multilevel else pool_bipartition
    part = bipartition(g, eps_prime, seed=seed, ratio=(fk1, fk2))
    if k1 == 1 and k2 == 1:
        return part
    out = np.zeros(g.n, dtype=np.int64)
    for side, k_side, fk_side, offset in ((0, k1, fk1, 0), (1, k2, fk2, k1)):
        members = np.nonzero(part == side)[0]
        if len(members) == 0:
            continue
        remap = -np.ones(g.n, dtype=np.int64)
        remap[members] = np.arange(len(members))
        src = np.repeat(np.arange(g.n), np.diff(g.indptr))
        mask = (remap[src] >= 0) & (remap[g.indices] >= 0)
        sub = SmallGraph.from_edges(
            len(members),
            remap[src[mask]],
            remap[g.indices[mask]],
            g.eweights[mask],
            g.nweights[members],
        )
        sub_part = recursive_bisect(
            sub, k_side, epsilon, seed=seed + offset + 1,
            k_final=k_final, total_weight_root=total_weight_root,
            final_k=fk_side, multilevel=multilevel,
        )
        out[members] = offset + sub_part
    return out


# ---- E6/E7: sequential initial coarsener + graph hierarchy --------------
#
# The reference never pool-bipartitions a large graph directly: each
# InitialPartitioner call first coarsens its subgraph SEQUENTIALLY with a
# lock-based LP clustering (initial_coarsener.cc:30-137) down to ~20 nodes,
# bipartitions the tiny coarsest graph, then pops the hierarchy
# (sequential_graph_hierarchy.cc:6-45) projecting + 2-way-FM-refining at
# every level (initial_partitioning_facade.h:47-110). Same here, in numpy —
# the graphs are already driver-sized (the coarsest distributed graph or an
# extend_partition block), so this is a per-call micro-multilevel, not a
# distributed stage.

IP_CONTRACTION_LIMIT = 20  # i_ctx.coarsening.contraction_limit (context.cc:304)
IP_CONVERGENCE_THRESHOLD = 0.05  # context.cc:305
IP_CLUSTER_WEIGHT_MULTIPLIER = 1.0 / 12.0  # BLOCK_WEIGHT x 1/12 (context.cc:306-307)


def lp_cluster_seq(
    g: SmallGraph, max_cluster_weight: int, rng: np.random.Generator
) -> tuple[np.ndarray, int]:
    """One sequential LP clustering pass (initial_coarsener.cc:92-137).
    Returns (leader, moves). Visit nodes in a shuffled order; an unlocked
    node joins the neighboring cluster with the largest incident edge weight
    that stays under ``max_cluster_weight`` (ties broken by coin flip,
    pick_cluster_from_rating_map initial_coarsener.cc:71-90), locking the
    chosen leader. Leader values are fixpoints: a stored leader is its own
    leader and locked, so chains never exceed depth one."""
    leader = np.arange(g.n, dtype=np.int64)
    cweight = g.nweights.astype(np.int64).copy()
    locked = np.zeros(g.n, dtype=bool)
    moves = 0
    for u in rng.permutation(g.n):
        if locked[u]:
            continue
        nbrs, ws = g.neighbors(u)
        if len(nbrs) == 0:
            continue
        ratings: dict[int, int] = {}
        for v, w in zip(nbrs, ws):
            c = int(leader[v])
            ratings[c] = ratings.get(c, 0) + int(w)
        uw = int(g.nweights[u])
        best, best_gain = u, 0
        for c, gain in ratings.items():
            if c == u:
                continue
            if (gain > best_gain or (gain == best_gain and best != u and rng.random() < 0.5)) \
                    and cweight[c] + uw <= max_cluster_weight:
                best, best_gain = c, gain
        if best != u:
            leader[u] = best
            locked[best] = True
            cweight[best] += uw
            moves += 1
    return leader, moves


def contract_clustering(g: SmallGraph, leader: np.ndarray) -> tuple[SmallGraph, np.ndarray]:
    """Contract a leader clustering: (coarse graph, node mapping fine->coarse)
    (initial_coarsener.cc:139-267 contract_current_clustering; coarse ids are
    dense but in sorted-leader order rather than first-appearance order — an
    id relabeling only, partition semantics unchanged)."""
    leaders, mapping = np.unique(leader, return_inverse=True)
    c_n = len(leaders)
    c_nw = np.bincount(mapping, weights=g.nweights, minlength=c_n).astype(np.int64)
    src_rep = np.repeat(np.arange(g.n), np.diff(g.indptr))
    c_src, c_dst = mapping[src_rep], mapping[g.indices]
    keep = c_src != c_dst  # drop intra-cluster edges
    key = c_src[keep] * c_n + c_dst[keep]
    uniq, inv = np.unique(key, return_inverse=True)
    w = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(w, inv, g.eweights[keep])
    return (
        SmallGraph.from_edges(c_n, uniq // c_n, uniq % c_n, w, c_nw),
        mapping,
    )


def multilevel_bipartition(
    g: SmallGraph,
    epsilon: float,
    seed: int = 42,
    repetitions: int = 4,
    ratio: tuple[int, int] = (1, 1),
) -> np.ndarray:
    """Sequential multilevel bipartitioning (E6+E7): LP-coarsen to
    ~IP_CONTRACTION_LIMIT nodes under the BLOCK_WEIGHT/12 cluster cap
    (compute_max_cluster_weight context.cc:395-416 with the bipartition
    context's k=2), pool-bipartition the coarsest graph, then pop the
    hierarchy with projection + 2-way FM per level. Falls back to the flat
    pool result if the multilevel one ends infeasible where flat is better
    (select_best ordering, helper.h:77-104)."""
    if g.n == 0:
        return np.zeros(0, dtype=np.int64)
    rng = np.random.default_rng(seed ^ 0x9E3779B9)
    max_cw = int(IP_CLUSTER_WEIGHT_MULTIPLIER * (1 + epsilon) * g.total_weight / 2)
    hierarchy: list[tuple[SmallGraph, np.ndarray]] = []
    cur = g
    while cur.n > IP_CONTRACTION_LIMIT:
        leader, moves = lp_cluster_seq(cur, max_cw, rng)
        c_n = cur.n - moves
        if (1.0 - c_n / cur.n) <= IP_CONVERGENCE_THRESHOLD:
            break  # converged: not shrinking (facade coarsen loop, :77-90)
        cg, mapping = contract_clustering(cur, leader)
        hierarchy.append((cur, mapping))
        cur = cg
    part = pool_bipartition(cur, epsilon, seed=seed, repetitions=repetitions, ratio=ratio)

    k1, k2 = ratio
    slack = int(g.nweights.max(initial=1))
    caps = tuple(
        max(
            (1 + epsilon) * math.ceil(g.total_weight * ks / (k1 + k2)),
            math.ceil(g.total_weight * ks / (k1 + k2)) + slack,
        )
        for ks in (k1, k2)
    )
    for fine, mapping in reversed(hierarchy):
        part = part[mapping]
        part = fm_refine_2way(fine, part, caps, rng=rng)

    if hierarchy:
        bw = _block_weights(g, part)
        infeasible = int(max(0, bw[0] - caps[0]) + max(0, bw[1] - caps[1]))
        if infeasible > 0:
            flat = pool_bipartition(g, epsilon, seed=seed, repetitions=repetitions, ratio=ratio)
            fbw = _block_weights(g, flat)
            f_inf = int(max(0, fbw[0] - caps[0]) + max(0, fbw[1] - caps[1]))
            if (f_inf, cut_of(g, flat)) < (infeasible, cut_of(g, part)):
                return flat
    return part


def compute_num_copies(
    n: int, converged: bool, num_threads: int, contraction_limit: int = IP_CONTRACTION_LIMIT
) -> int:
    """The reference's replica-fork rule (helper.cc:211-227
    compute_num_copies): while the graph is still large relative to the
    contraction limit C, keep ONE chain coarsening (f = 2^ceil(log2(n/C)) >
    threads); once n is within reach, split the thread budget into
    threads/f replica groups; at n <= 2C (or a converged coarsener), fan out
    fully — one replica per remaining thread.

    The float division in ``log2(n / c)`` is deliberate and matches the
    reference exactly: helper.cc:219 computes ``log2(1.0 * n / C)`` in
    floating point. Only the sibling compute_k_for_n (helper.cc:207, our
    rules.deep_k_prime) uses integer division ``n / C``."""
    c = max(1, contraction_limit)
    if converged or n <= 2 * c:
        return num_threads
    f = 1 << max(0, math.ceil(math.log2(n / c)))
    if f > num_threads:
        return 1
    return max(1, num_threads // f)


def bipartition_caps(
    g: SmallGraph, epsilon: float, ratio: tuple[int, int] = (1, 1)
) -> tuple[float, float]:
    """The 2-way block-weight caps every bipartitioner and select_best use:
    max((1+eps)*ceil(W*ks/(k1+k2)), ceil(W*ks/(k1+k2)) + max node weight)
    per block (reference PartitionContext::setup + max_block_weight slack)."""
    k1, k2 = ratio
    slack = int(g.nweights.max(initial=1))
    return tuple(
        max(
            (1 + epsilon) * math.ceil(g.total_weight * ks / (k1 + k2)),
            math.ceil(g.total_weight * ks / (k1 + k2)) + slack,
        )
        for ks in (k1, k2)
    )


def bipartition_score(
    g: SmallGraph, part: np.ndarray, caps: tuple[float, float]
) -> tuple[int, int]:
    """select_best's ordering (helper.h:77-104): (total infeasibility, cut) —
    a feasible partition beats any infeasible one regardless of cut."""
    bw = _block_weights(g, part)
    infeasible = int(max(0, bw[0] - caps[0]) + max(0, bw[1] - caps[1]))
    return (infeasible, cut_of(g, part))


def replicated_bipartition(
    g: SmallGraph,
    epsilon: float,
    seed: int = 42,
    num_threads: int = 4,
    repetitions: int = 4,
    ratio: tuple[int, int] = (1, 1),
    trace: list | None = None,
) -> np.ndarray:
    """E9: the reference's split-and-join replica TREE
    (parallel_initial_partitioner.cc:11-69 partition_recursive /
    split_and_join), not just a coarsest-graph seed portfolio. The chain
    coarsens while the graph is large (compute_num_copies returns 1); once
    within reach of the contraction limit it FORKS mid-coarsening into
    replica groups, each continuing to coarsen independently under its own
    seed AND eps flavor (_REPLICA_EPS_FLAVORS — sibling leaves bipartition
    under perturbed balance constraints, always SCORED against the true
    caps); leaf replicas (thread budget 1) run the full sequential
    multilevel bipartition (helper::bipartition base case); every join
    selects the best replica by (infeasibility, cut) (select_best,
    helper.h:77-104) and every unwind projects + 2-way-FM-refines one level
    (uncoarsen_once + refine). Driver-sized numpy — the forks cost
    leaf-count x base work, bounded by ``num_threads``.

    ``trace``, if given, records (n, num_copies) at each fork (>1 copy) so
    tests can assert forks happen MID-coarsening (n > contraction limit).

    Restructured in r5 (VERDICT item 5 wall-reclaim): the tree's replica-0
    SPINE now *is* the sequential chain — one rng stream drives its
    coarsening levels and its unwind FM, exactly as multilevel_bipartition's
    does, with sibling subtrees forked off at the copies-rule levels and
    joined by select_best as the spine unwinds (a challenger track projects
    and FM-refines the best surviving sibling under a side rng so it never
    perturbs the spine's stream). The previous structure recomputed the
    whole chain a second time as a never-worse guard (+5-30% measured wall
    for what BENCH/PARTITION_QUALITY.md showed to be cut-for-cut ties); now
    the guard is one final (infeasibility, cut) comparison between the
    challenger and the spine — never worse than the chain, at the cost of
    the sibling leaves only."""
    if g.n == 0:
        return np.zeros(0, dtype=np.int64)
    max_cw = int(IP_CLUSTER_WEIGHT_MULTIPLIER * (1 + epsilon) * g.total_weight / 2)
    caps = bipartition_caps(g, epsilon, ratio)

    def score(gr: SmallGraph, part: np.ndarray) -> tuple[int, int]:
        return bipartition_score(gr, part, caps)

    def partition_recursive(
        cur: SmallGraph, threads: int, s: int, flavor: int
    ) -> np.ndarray:
        if threads <= 1:
            # sequential base case: full multilevel bipartition (E6+E7).
            # Sibling replicas are DIVERSIFIED beyond their rng stream
            # (VERDICT r4 item 5: seed-only replicas converged to the chain's
            # local optimum cut-for-cut on every measured grid cell): each
            # non-chain flavor leaf searches under a perturbed epsilon —
            # tighter caps force structurally different growing/FM basins,
            # looser caps widen the search (the portfolio-diversity spirit of
            # pool_bipartitioner.h:253-268's seven registered strategies).
            # Every candidate is still SCORED against the TRUE caps at the
            # join, and flavor 0 (the chain-seed replica) is untouched, so
            # the never-worse guarantee is preserved.
            eps_leaf = epsilon * _REPLICA_EPS_FLAVORS[flavor % len(_REPLICA_EPS_FLAVORS)]
            return multilevel_bipartition(
                cur, eps_leaf, seed=s, repetitions=repetitions, ratio=ratio
            )
        rng = np.random.default_rng(s ^ 0x9E3779B9)
        shrunk, mapping, coarse = False, None, cur
        if cur.n > IP_CONTRACTION_LIMIT:
            leader, moves = lp_cluster_seq(cur, max_cw, rng)
            c_n = cur.n - moves
            if (1.0 - c_n / cur.n) > IP_CONVERGENCE_THRESHOLD:
                coarse, mapping = contract_clustering(cur, leader)
                shrunk = True
        part = split_and_join(coarse, threads, not shrunk, s, flavor)
        if shrunk:
            part = part[mapping]
            part = fm_refine_2way(cur, part, caps, rng=rng)
        return part

    def split_and_join(
        cur: SmallGraph, threads: int, converged: bool, s: int, flavor: int
    ) -> np.ndarray:
        copies = compute_num_copies(cur.n, converged, threads)
        if trace is not None and copies > 1:
            trace.append((int(cur.n), copies))
        tpc = max(1, threads // copies)
        best: tuple[tuple[int, int], np.ndarray] | None = None
        for c in range(copies):
            # replica 0 keeps the chain seed (and the chain flavor when it is
            # itself replica 0 of every enclosing fork); siblings get derived
            # streams and distinct leaf flavors
            p = partition_recursive(
                cur, tpc, s + 7919 * c, flavor if c == 0 else 3 * flavor + c
            )
            sc = score(cur, p)
            if best is None or sc < best[0]:
                best = (sc, p)
        return best[1]

    # ---- spine descent: the EXACT sequential chain (one rng stream, same
    # level cadence as multilevel_bipartition), forking sibling subtrees at
    # every level where the copies rule splits the thread budget. Sibling
    # partitions are recorded per fork depth and joined during the unwind.
    rng = np.random.default_rng(seed ^ 0x9E3779B9)
    hierarchy: list[tuple[SmallGraph, np.ndarray]] = []
    fork_map: dict[int, list[np.ndarray]] = {}
    cur, threads, converged = g, num_threads, False
    while True:
        copies = compute_num_copies(cur.n, converged, threads)
        if copies > 1:
            if trace is not None:
                trace.append((int(cur.n), copies))
            tpc = max(1, threads // copies)
            fork_map.setdefault(len(hierarchy), []).extend(
                partition_recursive(cur, tpc, seed + 7919 * c, c)
                for c in range(1, copies)
            )
            threads = tpc
        if converged or cur.n <= IP_CONTRACTION_LIMIT:
            break
        leader, moves = lp_cluster_seq(cur, max_cw, rng)
        c_n = cur.n - moves
        if (1.0 - c_n / cur.n) <= IP_CONVERGENCE_THRESHOLD:
            # let the copies rule see the converged graph (full fan-out of
            # the remaining thread budget) before the spine pools it
            converged = True
            continue
        cg, mapping = contract_clustering(cur, leader)
        hierarchy.append((cur, mapping))
        cur = cg

    # ---- spine unwind (chain-identical): pool the coarsest graph at the
    # chain seed, then project + FM with the chain rng per level. A
    # CHALLENGER track carries the best surviving sibling upward under a
    # side rng (so it never touches the spine's stream); at each fork depth
    # freshly joined siblings compete with it by (infeasibility, cut).
    part = pool_bipartition(
        cur, epsilon, seed=seed, repetitions=repetitions, ratio=ratio
    )
    side_rng = np.random.default_rng((seed * 0x9E3779B9 + 0x85EBCA6B) & ((1 << 63) - 1))

    def pick(gr: SmallGraph, cands: list[np.ndarray]) -> np.ndarray | None:
        out, osc = None, None
        for p in cands:
            if p is None:
                continue
            sc = score(gr, p)
            if out is None or sc < osc:
                out, osc = p, sc
        return out

    depth = len(hierarchy)
    best = pick(cur, fork_map.get(depth, []))
    for fine, mapping in reversed(hierarchy):
        depth -= 1
        part = fm_refine_2way(fine, part[mapping], caps, rng=rng)
        if best is not None:
            best = fm_refine_2way(fine, best[mapping], caps, rng=side_rng)
        cands = fork_map.get(depth, [])
        if cands:
            best = pick(fine, ([best] if best is not None else []) + cands)
    # chain-identity: mirror multilevel_bipartition's flat-pool fallback for
    # an infeasible multilevel result (same seed, same ordering)
    if hierarchy:
        sp_sc = score(g, part)
        if sp_sc[0] > 0:
            flat = pool_bipartition(
                g, epsilon, seed=seed, repetitions=repetitions, ratio=ratio
            )
            if score(g, flat) < sp_sc:
                part = flat
    # never-worse guard: the spine IS the chain (bit-identical rng stream),
    # so one final comparison suffices — no second chain computation
    if best is not None and score(g, best) < score(g, part):
        return best
    return part


# Leaf-replica epsilon multipliers (flavor index -> eps factor). Flavor 0 is
# the untouched chain replica; the others tighten/loosen the leaf's balance
# constraint to land in different refinement basins. Chosen to keep every
# perturbed epsilon within a sane IP range (0.5x..2x of the true eps).
_REPLICA_EPS_FLAVORS = (1.0, 0.5, 2.0, 0.75, 1.5, 0.6, 1.25)


def best_of_bisections(
    g: SmallGraph,
    k: int,
    epsilon: float,
    seeds: list[int],
    k_final: int | None = None,
    total_weight_root: int | None = None,
    final_k: int | None = None,
    replication_threads: int = 1,
) -> np.ndarray:
    """Deep-IP replication, driver analog (E9): the reference forks
    coarsening+IP replicas across threads and keeps the best result
    (parallel_initial_partitioner.cc:11-69, copies rule helper.cc:211-227).
    Here the coarsest graph is already driver-sized, so the portfolio is R
    independent seeded recursive bisections scored by (infeasibility, cut) —
    the same select_best ordering as helper.h:77-104. With
    ``replication_threads > 1`` each portfolio member additionally runs its
    bisections through the split-and-join replica TREE
    (replicated_bipartition) — mid-coarsening coarsener forks, the
    reference's full E9 shape."""
    final_k = final_k or k
    k_final = k_final or final_k
    from kaminpar_spark.functions.rules import fill_final_k, max_block_weight_final_k

    final_ks = fill_final_k(k, final_k)
    caps = np.array(
        [
            max_block_weight_final_k(
                total_weight_root or g.total_weight, k_final, fkb, epsilon,
                int(g.nweights.max(initial=1)),
            )
            for fkb in final_ks
        ],
        dtype=np.int64,
    )
    best = None  # ((infeasible, cut), labels)
    for s in seeds:
        labels = recursive_bisect(
            g, k, epsilon, seed=s, k_final=k_final,
            total_weight_root=total_weight_root, final_k=final_k,
            replication_threads=replication_threads,
        )
        bw = _block_weights(g, labels, k)
        infeasible = int(np.maximum(0, bw - caps).sum())
        cand = (infeasible, cut_of(g, labels))
        if best is None or cand < best[0]:
            best = (cand, labels)
    return best[1]
