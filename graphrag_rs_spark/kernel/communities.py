"""Sequential small-graph kernel for community detection.

The distributed modularity local-moving in operators/communities.py pays a
fixed per-superstep driver cost (one lineage-cut write per round) that is
independent of graph size — ~1s/round on local mode, so a 61-node fixture
costs the same ~25 supersteps as a 60M-node graph. The reference itself
runs in-memory (graph/leiden.rs:465-783), so for graphs small enough to
collect (config.community_small_graph_edges, default 100k edges) we run
the EXACT same algorithm sequentially in the driver: same supersteps, same
ΔQ formula, same deterministic xxhash64 eligibility gate, same tie-breaks,
same stop conditions. Output is byte-identical to the distributed path
(asserted by tests/test_communities.py parity tests); the distributed path
remains the scale path and is unchanged semantically.

Parity caveat: the two paths sum degrees/σ in different orders (sorted
here, partition order in Spark), so weights that are not exactly
representable in binary (0.1, …) can round ΔQ differently when two
candidate labels tie below summation-order noise — a graph crossing the
100k-edge threshold between runs could then flip such a knife-edge
assignment. Dyadic weights (confidence grids of 1/2ⁿ, incl. every fixture
here) are exact in any order; for non-dyadic data the assignments are
still deterministic WITHIN each path.

The eligibility gate mirrors Spark's ``pmod(xxhash64(src, lit(it)), 2)``:
Spark chains multi-arg xxhash64 left-to-right (seed 42), so the gate equals
``XXH64.hashInt(it, seed=xxhash64(src))``. We collect the per-id inner hash
from Spark itself (one tiny job) and implement only ``hashInt`` here —
the 64-bit xxHash finalizer for a 4-byte int, from the public xxHash spec
(same constants as Spark's catalyst XXH64).
"""

from __future__ import annotations

from collections import defaultdict

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_int(i: int, seed: int) -> int:
    """XXH64 of a single 32-bit int with the given seed (unsigned result).

    Bit-identical to Spark's ``XXH64.hashInt`` — verified against
    ``F.xxhash64(col, lit(i))`` in tests/test_communities.py.
    """
    h = (seed + _P5 + 4) & _M64
    h ^= ((i & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    return _fmix(h)


def _eligible(inner_hash: int, it: int) -> bool:
    """pmod(xxhash64(src, lit(it)), 2) == 0 — low bit of the chained hash."""
    return (xxh64_int(it, inner_hash & _M64) & 1) == 0


def _modularity(adj, labels, deg, m2: float, resolution: float) -> float:
    """Q = Σ_intra w / 2m − resolution · Σ_c (tot_c / 2m)² (adj is symmetric,
    so intra edge mass is counted in both directions, matching the
    distributed probe)."""
    intra = 0.0
    for src in sorted(adj):
        ls = labels[src]
        for dst, w in adj[src]:
            if labels[dst] == ls:
                intra += w
    tots = defaultdict(float)
    for nid in sorted(deg):
        tots[labels[nid]] += deg[nid]
    s = 0.0
    for lab in sorted(tots):
        s += (tots[lab] / m2) ** 2
    return intra / m2 - resolution * s


def local_moves(
    adj,
    labels,
    deg,
    inner_hash,
    m2: float,
    *,
    resolution: float,
    max_iterations: int,
    min_improvement: float,
    max_cluster_size: int | None,
):
    """Sequential mirror of operators.communities._local_moves.

    ``adj``: {src: [(dst, w), ...]} from the SYMMETRIC edge list, neighbor
    lists sorted by dst. ``labels``/``deg``/``inner_hash``: dicts by node id.
    Mutates and returns ``labels``.
    """
    n_nodes = len(deg)
    quiet_threshold = max(1, n_nodes // 500)
    prev_q = None
    zero_rounds = 0
    for it in range(max_iterations):
        sigma = defaultdict(float)
        for nid in sorted(deg):
            sigma[labels[nid]] += deg[nid]
        sizes = None
        if max_cluster_size is not None:
            sizes = defaultdict(int)
            for nid in labels:
                sizes[labels[nid]] += 1
        moves = {}
        for src in sorted(adj):
            if not _eligible(inner_hash[src], it):
                continue
            k = defaultdict(float)
            for dst, w in adj[src]:
                k[labels[dst]] += w
            cur = labels[src]
            k_from = k.get(cur, 0.0)
            d_i = deg[src]
            best_dq = None
            best_lab = None
            for lab in sorted(k):
                if lab == cur:
                    continue
                if sizes is not None and sizes[lab] >= max_cluster_size:
                    continue
                dq = (k[lab] - k_from) / m2 - resolution * d_i * (
                    sigma[lab] - sigma[cur] + d_i
                ) / (m2 * m2)
                if dq > 0 and (best_dq is None or dq > best_dq):
                    # labels iterated ascending → first max wins the
                    # smallest-label tie-break, matching the window order
                    # (dq desc, dst_label asc)
                    best_dq = dq
                    best_lab = lab
            if best_lab is not None:
                moves[src] = best_lab
        n_moved = len(moves)
        for src, lab in moves.items():
            labels[src] = lab
        if n_moved < quiet_threshold:
            zero_rounds += 1
            if zero_rounds >= 2:
                break
            continue
        zero_rounds = 0
        if min_improvement > 0 and it % 3 == 2:
            q = _modularity(adj, labels, deg, m2, resolution)
            if prev_q is not None and q - prev_q < min_improvement:
                break
            prev_q = q
    return labels


def merge_communities(
    adj,
    labels,
    deg,
    m2: float,
    *,
    resolution: float,
    max_cluster_size: int | None,
    max_rounds: int = 10,
):
    """Sequential mirror of operators.communities._merge_communities
    (parallel mutual-best community matching)."""
    for _ in range(max_rounds):
        ce = defaultdict(float)
        for src in sorted(adj):
            la = labels[src]
            for dst, w in adj[src]:
                lb = labels[dst]
                if la != lb:
                    ce[(la, lb)] += w
        tots = defaultdict(float)
        for nid in sorted(deg):
            tots[labels[nid]] += deg[nid]
        sizes = None
        if max_cluster_size is not None:
            sizes = defaultdict(int)
            for nid in labels:
                sizes[labels[nid]] += 1
        best = {}
        for (la, lb) in sorted(ce):
            s = ce[(la, lb)]
            dq = 2.0 * s / m2 - 2.0 * resolution * tots[la] * tots[lb] / (m2 * m2)
            if dq <= 0:
                continue
            if sizes is not None and sizes[la] + sizes[lb] > max_cluster_size:
                continue
            cur = best.get(la)
            if cur is None or dq > cur[0]:
                # ascending lb iteration → first max keeps smallest lb,
                # matching the window order (dq desc, lb asc)
                best[la] = (dq, lb)
        relabel = {}
        for la, (_, lb) in best.items():
            if la < lb and best.get(lb, (None, None))[1] == la:
                relabel[lb] = la
        if not relabel:
            break
        for nid in labels:
            lab = labels[nid]
            if lab in relabel:
                labels[nid] = relabel[lab]
    return labels


def modularity_sequential(
    edges,
    inner_hash,
    *,
    resolution: float,
    max_iterations: int,
    min_improvement: float,
    max_cluster_size: int | None,
):
    """Full sequential mirror of operators.communities.modularity_local_moving
    over a collected SYMMETRIC weighted edge list [(src, dst, w), ...].

    Returns {id: label}. Same phase order as the distributed path: local
    moves → mutual-best merges → short cleanup pass (iteration counter
    restarting at 0, so the eligibility gate sequence matches).
    """
    adj = defaultdict(list)
    for src, dst, w in edges:
        adj[src].append((dst, w))
    for src in adj:
        adj[src].sort()
    deg = {}
    for src in sorted(adj):
        deg[src] = sum(w for _, w in adj[src])
    m2 = sum(deg[src] for src in sorted(deg))
    labels = {nid: nid for nid in adj}
    if m2 <= 0.0:
        return labels
    labels = local_moves(
        adj, labels, deg, inner_hash, m2,
        resolution=resolution, max_iterations=max_iterations,
        min_improvement=min_improvement, max_cluster_size=max_cluster_size,
    )
    labels = merge_communities(
        adj, labels, deg, m2,
        resolution=resolution, max_cluster_size=max_cluster_size,
    )
    labels = local_moves(
        adj, labels, deg, inner_hash, m2,
        resolution=resolution, max_iterations=min(3, max_iterations),
        min_improvement=min_improvement, max_cluster_size=max_cluster_size,
    )
    return labels


def union_find_components(edges, vertices):
    """Connected components over a collected edge list: {id: min-id-in-
    component} — identical by definition to the distributed hashmin kernel
    (operators/cc.py), whose component label is the minimum member id
    regardless of execution order."""
    parent = {v: v for v in vertices}
    for s, d, *_ in edges:
        parent.setdefault(s, s)
        parent.setdefault(d, d)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for s, d, *_ in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            # union by min id keeps the representative the smallest member
            if rs < rd:
                parent[rd] = rs
            else:
                parent[rs] = rd
    return {v: find(v) for v in parent}
