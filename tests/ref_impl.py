"""Independent recomputation oracles for the golden-snapshot trio.

Pure-Python/NumPy sequential reimplementations of the three gate
operators whose semantics aren't SQL-expressible, written FROM THE
REFERENCE SEMANTICS (Spinner.java:259-418, Svdpp.java:368-500,
SemiClustering.java:60-360) plus the engine's *documented* determinism
conventions (xxhash64-derived uniforms, sorted message orders,
vertex-tuple tie-breaks — each cited below).  They share NO code with
`okapi_spark`: state is plain dicts, iteration is per-vertex loops
shaped like the reference's `compute()` methods, and the only
"shared" ingredient is the public XXH64 algorithm, reimplemented here
from its spec and empirically pinned against Spark's built-in in
tests/test_independent_oracles.py.

Purpose (VERDICT r3 "Next round #2"): the goldens in goldens/ were
recorded by the engine itself, so on their own they are regression
pins, not correctness oracles.  These implementations give each golden
an independent derivation — scripts/make_goldens.py refuses to record
a snapshot that disagrees with them, and the slow pytest asserts
engine ≡ this module at the gate's scale factor.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# XXH64 — canonical public algorithm (Collet), as applied by Spark's
# `xxhash64(...)` expression: fold left over the arguments with running
# seed, starting at 42; int32 -> 4-byte path, int64 -> 8-byte path,
# string -> UTF-8 byte path.  Pinned against Spark's builtin by test.
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
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


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M64, 31) * _P1) & _M64


def xxh64_bytes(data: bytes, seed: int) -> int:
    seed &= _M64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little")); i += 8
            v2 = _round(v2, int.from_bytes(data[i:i + 8], "little")); i += 8
            v3 = _round(v3, int.from_bytes(data[i:i + 8], "little")); i += 8
            v4 = _round(v4, int.from_bytes(data[i:i + 8], "little")); i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _fmix(h)


def _hash_long(v: int, seed: int) -> int:
    return xxh64_bytes((v & _M64).to_bytes(8, "little"), seed)


def _hash_int(v: int, seed: int) -> int:
    return xxh64_bytes((v & 0xFFFFFFFF).to_bytes(4, "little"), seed)


def spark_xxhash64(*args) -> int:
    """Signed-64 result of Spark's xxhash64(args...) (seed 42).

    Python ints tagged by magnitude are ambiguous, so arguments are
    (value, kind) pairs or bare values with inferred kinds:
    bare int -> 'int' if it fits int32 else 'long'; str -> utf8 bytes.
    Pass ('long', v) / ('int', v) tuples to force a width.
    """
    h = 42
    for a in args:
        if isinstance(a, tuple):
            kind, v = a
            if kind != "str":
                v = int(v)  # numpy ints reject the 64-bit mask
        elif isinstance(a, str):
            kind, v = "str", a
        elif isinstance(a, (int, np.integer)):
            v = int(a)
            kind = "int" if -(2 ** 31) <= v < 2 ** 31 else "long"
        else:
            raise TypeError(f"unsupported arg {a!r}")
        if kind == "str":
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif kind == "int":
            h = _hash_int(v, h)
        else:
            h = _hash_long(v, h)
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod(h: int, m: int) -> int:
    """Spark pmod on a signed-long hash: always in [0, m)."""
    return ((h % m) + m) % m


def hash_uniform(*args) -> float:
    """The engine's documented uniform convention:
    pmod(xxhash64(args...), 10^9) / 1e9."""
    return pmod(spark_xxhash64(*args), 10 ** 9) / 1e9


# ---------------------------------------------------------------------------
# shared input builders (pandas; mirrors __spark_entry__'s derivations
# of the co-purchase graph and ratings from the TPC-H-ish parquet)
# ---------------------------------------------------------------------------

def weighted_copurchase_edges(sf_dir: str) -> pd.DataFrame:
    """Symmetric-distinct (src, dst, weight) co-purchase graph: parts
    sharing an order, weight = number of shared orders (both edge
    directions present)."""
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    m = li.merge(li, on="l_orderkey", suffixes=("_a", "_b"))
    m = m[m["l_partkey_a"] < m["l_partkey_b"]]
    pairs = (
        m.groupby(["l_partkey_a", "l_partkey_b"]).size().reset_index(name="weight")
    )
    fwd = pairs.rename(columns={"l_partkey_a": "src", "l_partkey_b": "dst"})
    rev = pairs.rename(columns={"l_partkey_a": "dst", "l_partkey_b": "src"})
    out = pd.concat([fwd, rev], ignore_index=True)
    out["weight"] = out["weight"].astype(float)
    return out[["src", "dst", "weight"]]


def ratings_table(sf_dir: str) -> pd.DataFrame:
    """(user, item, rating): customer x part, rating = times ordered."""
    o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    r = j.groupby(["o_custkey", "l_partkey"]).size().reset_index(name="rating")
    r = r.rename(columns={"o_custkey": "user", "l_partkey": "item"})
    r["rating"] = r["rating"].astype(float)
    return r[["user", "item", "rating"]]


# ---------------------------------------------------------------------------
# Spinner — Spinner.java:259-418 (computeNewPartition / ComputeMigration)
# ---------------------------------------------------------------------------

def ref_spinner(
    edges: pd.DataFrame,
    k: int = 8,
    lam: float = 1.0,
    additional_capacity: float = 0.05,
    max_iterations: int = 290,
    threshold: float = 0.001,
    window: int = 5,
    seed: int = 42,
    repartition: int = 0,
) -> dict[int, int]:
    """Sequential Spinner over a symmetric-distinct weighted edge list.

    Per-vertex loop over ALL k labels exactly as the reference's
    computeNewPartition (:259-290): H(v,l) = lam + freq(l)/sumW -
    lam*ceil3(load(l)/C); ties prefer the current partition, then the
    smallest label (the engine's documented deterministic stand-in for
    the reference's random tie-break).  Migration damping
    remaining/demand per ComputeMigration.preSuperstep (:389-418), with
    the migration coin = hash_uniform(id, round, seed).  Convergence:
    |1 - score/max(last `window` scores)| < threshold checked before
    migrating, only once more than `window` rounds have run
    (algorithmConverged, :637-655).  ``repartition`` applies the
    Repartitioner adaptation (:467-524): label space becomes
    k+repartition, up-scale moves any vertex into a new label with
    probability repartition/(k+repartition), down-scale rehashes
    orphaned vertices uniformly over the survivors — hash conventions
    exactly as lpa.py:311-328.  Returns {vertex: partition}.
    """
    adj: dict[int, list[tuple[int, float]]] = {}
    deg: dict[int, int] = {}
    wdeg: dict[int, float] = {}
    for src, dst, w in edges.itertuples(index=False):
        src, dst, w = int(src), int(dst), float(w)
        adj.setdefault(src, []).append((dst, w))
        deg[src] = deg.get(src, 0) + 1
        wdeg[src] = wdeg.get(src, 0.0) + w
    vertices = sorted(adj)
    total_edges = int(len(edges))
    k_total = k + repartition
    capacity = total_edges * (1.0 + additional_capacity) / k_total

    def ceil3(x: float) -> float:
        return math.ceil(x * 1000.0) / 1000.0

    part = {v: pmod(spark_xxhash64(("long", v), ("int", seed)), k) for v in vertices}
    if repartition < 0:
        for v in vertices:
            if part[v] >= k_total:
                part[v] = pmod(spark_xxhash64(("long", v), "down", ("int", seed)), k_total)
    elif repartition > 0:
        for v in vertices:
            if hash_uniform(("long", v), "up", ("int", seed)) < repartition / k_total:
                part[v] = k + pmod(spark_xxhash64(("long", v), "new", ("int", seed)), repartition)
    k = k_total
    loads = [0.0] * k
    for v in vertices:
        loads[part[v]] += deg[v]

    score_window: list[float] = []
    movers_prev: set[int] | None = None  # None => round 0: everyone active

    for rnd in range(max_iterations):
        pf = [lam * ceil3(loads[p] / capacity) for p in range(k)]
        # label histogram of each vertex's neighborhood (the messages)
        hist: dict[int, dict[int, float]] = {v: {} for v in vertices}
        for src in vertices:
            lbl = part[src]
            for dst, w in adj[src]:
                h = hist[dst]
                h[lbl] = h.get(lbl, 0.0) + w
        if movers_prev is None:
            active = set(vertices)
        else:
            active = set()
            for src in movers_prev:
                for dst, _ in adj[src]:
                    active.add(dst)

        score = 0.0
        local_sum = 0.0
        want: dict[int, int] = {}
        demand = [0.0] * k
        for v in vertices:
            cur = part[v]
            freqs = hist[v]
            best_h = -float("inf")
            best_l = -1
            cur_h = None
            for l in range(k):
                h = lam + freqs.get(l, 0.0) / wdeg[v] - pf[l]
                if l == cur:
                    cur_h = h
                if h > best_h:  # strict: first (smallest) label wins ties
                    best_h, best_l = h, l
            score += cur_h
            local_sum += freqs.get(cur, 0.0)
            tgt = cur
            if best_h > cur_h and v in active:
                tgt = best_l
            want[v] = tgt
            if tgt != cur:
                demand[tgt] += deg[v]

        converged = False
        if len(score_window) >= window and rnd > window:
            best_prev = max(score_window[-window:])
            if best_prev != 0 and abs(1.0 - score / best_prev) < threshold:
                converged = True
        score_window.append(score)
        if converged:
            break

        probs = []
        for p in range(k):
            remaining = capacity - loads[p]
            d = demand[p]
            probs.append(0.0 if (d == 0 or remaining <= 0) else remaining / d)
        movers = set()
        for v in vertices:
            tgt = want[v]
            if tgt != part[v] and hash_uniform(("long", v), ("int", rnd), ("int", seed)) < probs[tgt]:
                loads[part[v]] -= deg[v]
                loads[tgt] += deg[v]
                part[v] = tgt
                movers.add(v)
        movers_prev = movers

    return part


# ---------------------------------------------------------------------------
# SVD++ — Svdpp.java:368-500, with the engine's documented deviations
# (error sign, item-sorted user loop, src-sorted item fold, hash init)
# ---------------------------------------------------------------------------

def ref_svdpp(
    ratings: pd.DataFrame,
    vector_size: int = 10,
    iterations: int = 10,
    factor_gamma: float = 0.005,
    factor_lambda: float = 0.01,
    bias_gamma: float = 0.005,
    bias_lambda: float = 0.01,
    min_rating: float = 0.0,
    max_rating: float = 5.0,
    seed: int = 42,
):
    """Returns (user_state, item_state) dicts id -> (baseline,
    factors[np], weights[np]).

    User pass (:386-440): two loops over the user's ratings sorted by
    item id — first updates baseline/factors per rating and accumulates
    the shared weight step, second recomputes errors with the final
    user state and emits per-item steps.  Item pass (:475-500): folds
    the received steps sequentially in originating-user order with
    decay v <- v + step - gamma*lambda*v.  mu = sum(r)/(2|R|)
    (reference totalNumEdges counts both directions, :366-367).
    """
    def init_state(ids, salt, with_weights):
        st = {}
        for i in ids:
            b = pmod(spark_xxhash64(("long", i), f"{salt}:b", ("int", seed)), 10 ** 9) / 1e9
            f = np.array([
                pmod(spark_xxhash64(("long", i), f"{salt}:f{d}", ("int", seed)), 10 ** 9) / 1e9 * 0.01
                for d in range(vector_size)
            ])
            if with_weights:
                w = np.array([
                    pmod(spark_xxhash64(("long", i), f"{salt}:w{d}", ("int", seed)), 10 ** 9) / 1e9 * 0.01
                    for d in range(vector_size)
                ])
            else:
                w = np.zeros(vector_size)
            st[int(i)] = (b, f, w)
        return st

    by_user: dict[int, list[tuple[int, float]]] = {}
    for u, i, r in ratings[["user", "item", "rating"]].itertuples(index=False):
        by_user.setdefault(int(u), []).append((int(i), float(r)))
    for u in by_user:
        by_user[u].sort()  # engine: messages applied in item-id order

    users = init_state(sorted(by_user), "user", with_weights=False)
    items = init_state(sorted(ratings["item"].unique()), "item", with_weights=True)
    n_ratings = len(ratings)
    mu = float(ratings["rating"].sum()) / (2 * n_ratings)

    def clip(x):
        return min(max(x, min_rating), max_rating)

    for _ in range(iterations):
        # ---- user superstep: per-user sequential fold ------------------
        new_users = {}
        steps: dict[int, list[tuple[int, float, np.ndarray, np.ndarray]]] = {}
        for u, rated in by_user.items():
            ub, p, _ = users[u]
            p = p.copy()
            n = len(rated)
            sqrt_n = math.sqrt(n)
            sum_w = np.zeros(vector_size)
            for it, _r in rated:
                sum_w += items[it][2]
            weight_step = np.zeros(vector_size)
            for it, r in rated:
                ib, q, _y = items[it]
                pred = clip(mu + ub + ib + q @ (p + sum_w / sqrt_n))
                err = r - pred
                ub = ub + bias_gamma * (err - bias_lambda * ub)
                p = p + factor_gamma * (err * q - factor_lambda * p)
                weight_step += q * err
            weight_step *= factor_gamma / sqrt_n
            for it, r in rated:
                ib, q, _y = items[it]
                pred = clip(mu + ub + ib + q @ (p + sum_w / sqrt_n))
                err = r - pred
                factor_step = factor_gamma * err * (sum_w / sqrt_n + p)
                steps.setdefault(it, []).append((u, bias_gamma * err, factor_step, weight_step))
            new_users[u] = (ub, p, np.zeros(vector_size))
        users = new_users

        # ---- item superstep: decay fold in originating-user order ------
        cb = bias_gamma * bias_lambda
        cf = factor_gamma * factor_lambda
        new_items = {}
        for it, (ib, q, y) in items.items():
            if it in steps:
                q, y = q.copy(), y.copy()
                for _u, bs, fs, ws in sorted(steps[it], key=lambda s: s[0]):
                    ib = ib + bs - cb * ib
                    q = q + fs - cf * q
                    y = y + ws - cf * y
            new_items[it] = (ib, q, y)
        items = new_items

    return users, items


# ---------------------------------------------------------------------------
# Semi-clustering — SemiClustering.java:60-360
# ---------------------------------------------------------------------------

def ref_semiclustering(
    edges: pd.DataFrame,
    iterations: int = 10,
    max_clusters: int = 2,
    cluster_capacity: int = 4,
    score_factor: float = 0.5,
) -> dict[int, list[tuple]]:
    """Returns {vertex: [clusters]} with cluster = (vs sorted tuple,
    inner, boundary, score), sorted best-first.

    Superstep 0 (:104-115): singleton cluster, boundary = weighted
    degree, score 0, sent to all neighbors; supersteps 1..iterations-1
    run the union/extend/trim kernel (:122-166).  addVertex join rule
    (:338-360): edges from the new vertex into the cluster move
    boundary -> inner, the rest add to boundary; score = (I - f*B) /
    (n(n-1)/2).  Cluster identity is its vertex set; score ties break
    by the sorted vertex tuple (the engine's deterministic stand-in
    for the reference's arbitrary TreeSet tie order, :187-198)."""
    adj: dict[int, dict[int, float]] = {}
    for src, dst, w in edges[["src", "dst", "weight"]].itertuples(index=False):
        adj.setdefault(int(src), {})[int(dst)] = float(w)

    def top(clusters):
        return sorted(clusters.values(), key=lambda c: (-c[3], c[0]))[:max_clusters]

    # superstep 0
    value: dict[int, list[tuple]] = {}
    outbox: dict[int, list[tuple]] = {}
    for v, nbrs in adj.items():
        c = ((v,), 0.0, sum(nbrs.values()), 0.0)
        value[v] = [c]
        outbox[v] = [c]

    for _ in range(iterations - 1):
        new_value, new_outbox = {}, {}
        for me, nbrs in adj.items():
            received = [c for nb in nbrs if nb in outbox for c in outbox[nb]]
            if not received:
                continue  # no messages: vertex keeps its state
            deg_w = sum(nbrs.values())
            unioned: dict[tuple, tuple] = {}
            val: dict[tuple, tuple] = {}
            for c in received:
                vs, inner, boundary, score = c
                key = tuple(sorted(vs))
                unioned.setdefault(key, c)
                if me in vs:
                    val.setdefault(key, c)
                elif len(vs) < cluster_capacity:
                    w_in = sum(nbrs.get(v, 0.0) for v in vs)
                    n_inner = inner + w_in
                    n_boundary = boundary - w_in + (deg_w - w_in)
                    n = len(vs) + 1
                    n_score = (n_inner - score_factor * n_boundary) / (n * (n - 1) / 2)
                    nc = (tuple(sorted(list(vs) + [me])), n_inner, n_boundary, n_score)
                    unioned.setdefault(nc[0], nc)
                    val.setdefault(nc[0], nc)
            new_value[me] = top(val)
            new_outbox[me] = top(unioned)
        for me in new_value:
            value[me] = new_value[me]
            outbox[me] = new_outbox[me]

    return value

# ---------------------------------------------------------------------------
# Unweighted co-purchase adjacency (parity with __spark_entry__._graph)
# ---------------------------------------------------------------------------

def copurchase_adjacency(sf_dir: str) -> dict[int, list[int]]:
    """{vertex: sorted neighbor list} of the distinct symmetric
    co-purchase graph (parts sharing an order)."""
    e = weighted_copurchase_edges(sf_dir)
    adj: dict[int, set[int]] = {}
    for src, dst, _w in e.itertuples(index=False):
        adj.setdefault(int(src), set()).add(int(dst))
    return {v: sorted(ns) for v, ns in adj.items()}


# ---------------------------------------------------------------------------
# Approximate Jaccard via MinHash — Jaccard.java:212-243 approximation
# slot (engine deviation: MinHash replaces the Bloom filter;
# similarity.py jaccard_approx docstring).  Aggregated per vertex:
# (id, n_edges, sum of 16*sim over incident undirected edges) — sims
# are k/num_hashes so the 16x sums are exact integers, giving an
# order-insensitive full-coverage checksum of every edge's sketch.
# ---------------------------------------------------------------------------

def ref_jaccard_minhash(sf_dir: str, num_hashes: int = 16) -> dict[int, tuple[int, int]]:
    adj = copurchase_adjacency(sf_dir)
    # hash each vertex id once per hash function (the graph is
    # symmetric so every vertex appears as a neighbor)...
    hv = {
        v: [spark_xxhash64(("long", v), ("int", i)) for i in range(num_hashes)]
        for v in adj
    }
    # ...then the signature is the per-function min over the neighbors
    sig: dict[int, list[int]] = {}
    for v, nbrs in adj.items():
        sig[v] = [min(hv[d][i] for d in nbrs) for i in range(num_hashes)]
    out: dict[int, list[int]] = {v: [0, 0] for v in adj}
    for u, nbrs in adj.items():
        su = sig[u]
        for v in nbrs:
            if u < v:
                sv = sig[v]
                agree = sum(1 for i in range(num_hashes) if su[i] == sv[i])
                for x in (u, v):
                    out[x][0] += 1
                    out[x][1] += agree
    return {v: (n, s) for v, (n, s) in out.items()}


# ---------------------------------------------------------------------------
# CF ranking family + SGD — shared conventions
# ---------------------------------------------------------------------------

def _init_vec(vid: int, salt: str, vector_size: int, seed: int, scale: float) -> np.ndarray:
    """ranking._init_factors convention: pmod(xxh64(id, f'{salt}:{i}',
    seed), 1e9)/1e9 * scale per dimension."""
    return np.array([
        pmod(spark_xxhash64(("long", vid), f"{salt}:{i}", ("int", seed)), 10 ** 9) / 1e9 * scale
        for i in range(vector_size)
    ])


def ref_random_ranking(ratings: pd.DataFrame, vector_size: int = 10, seed: int = 42):
    """RandomRankingComputation.java:51-62 with the engine's
    deterministic hash-uniform stand-in for the unseeded RNG:
    f_i = pmod(xxh64(id, f'{salt}:{i}', seed), 1e9)/1e9 - 0.5."""
    def mk(ids, salt):
        return {
            int(i): np.array([
                pmod(spark_xxhash64(("long", int(i)), f"{salt}:{d}", ("int", seed)), 10 ** 9) / 1e9 - 0.5
                for d in range(vector_size)
            ])
            for i in ids
        }
    return (
        mk(sorted(ratings["user"].unique()), "u"),
        mk(sorted(ratings["item"].unique()), "i"),
    )


def _rated_sets(pairs: list[tuple[int, int]]) -> dict[int, set[int]]:
    rated: dict[int, set[int]] = {}
    for u, i in pairs:
        rated.setdefault(u, set()).add(i)
    return rated


def _draw_negative(u: int, pos: int, salt: str, seed: int,
                   item_at: list[int], rated_u: set[int], probes: int = 3) -> int | None:
    """ranking._sample_negatives semantics: idx = pmod(xxh64(user, pos,
    salt, seed), n); each probe round bumps idx by 1 while the current
    item is rated; a draw still rated after ``probes`` rounds is
    dropped (None)."""
    n = len(item_at)
    idx = pmod(spark_xxhash64(("long", u), ("long", pos), salt, ("int", seed)), n)
    for _ in range(probes):
        if item_at[idx] in rated_u:
            idx = (idx + 1) % n
    neg = item_at[idx]
    return None if neg in rated_u else neg


def _sigmoid_s(x: float) -> float:
    # overflow-safe scalar logistic (logf, AbstractCFRankingComputation)
    if x >= 0:
        return 1.0 / (1.0 + math.exp(-x))
    e = math.exp(x)
    return e / (1.0 + e)


def ref_bpr(
    ratings: pd.DataFrame,
    vector_size: int = 10,
    iterations: int = 30,
    gamma: float = 0.05,
    lambda_: float = 0.01,
    seed: int = 42,
):
    """BPR (BPRRankingComputation.java:25-60; Rendle et al., UAI 2009)
    — batch-synchronous: per iteration every (user, pos) pair draws a
    hash negative, the AUC gradient deltas are ACCUMULATED across all
    triples and applied once (the reference's message-accumulated
    apply).  Returns ({user: vec}, {item: vec})."""
    pairs = sorted({(int(u), int(i)) for u, i in ratings[["user", "item"]].itertuples(index=False)})
    rated = _rated_sets(pairs)
    item_at = sorted({i for _, i in pairs})
    U = {u: _init_vec(u, "u", vector_size, seed, 0.1) for u in rated}
    V = {i: _init_vec(i, "i", vector_size, seed, 0.1) for i in item_at}
    for it in range(iterations):
        dU = {u: np.zeros(vector_size) for u in U}
        dV = {i: np.zeros(vector_size) for i in V}
        for u, pos in pairs:
            neg = _draw_negative(u, pos, f"neg{it}", seed, item_at, rated[u])
            if neg is None:
                continue
            pu, qi, qj = U[u], V[pos], V[neg]
            diff = qi - qj
            s = _sigmoid_s(-float(pu @ diff))
            dU[u] += gamma * (s * diff - lambda_ * pu)
            dV[pos] += gamma * (s * pu - lambda_ * qi)
            dV[neg] += gamma * (-s * pu - lambda_ * qj)
        for u in U:
            U[u] = U[u] + dU[u]
        for i in V:
            V[i] = V[i] + dV[i]
    return U, V


def _capped_relevants(pairs, rated, seed: int, max_buffer: int | None):
    """Per-user relevant list sorted by item id, truncated to
    ``max_buffer`` by (xxh64(user, item, seed), item) order — the
    engine's deterministic stable-sample cap."""
    rel: dict[int, list[int]] = {}
    for u, its in rated.items():
        its = sorted(its)
        if max_buffer is not None and len(its) > max_buffer:
            keyed = sorted(its, key=lambda i: (spark_xxhash64(("long", u), ("long", i), ("int", seed)), i))
            its = sorted(keyed[:max_buffer])
        rel[u] = its
    return rel


def ref_climf(
    ratings: pd.DataFrame,
    vector_size: int = 10,
    iterations: int = 30,
    gamma: float = 0.05,
    lambda_: float = 0.01,
    seed: int = 42,
    max_buffer: int | None = 1024,
):
    """CLiMF (Shi et al., RecSys 2012, eqs. 10-11 — the paper gradient
    the reference code cites; ClimfRankingComputation.java:59-133).
    Per user with relevant vectors V_j and user vector U, f_j = V_j·U:

      dU   = γ[ Σ_j σ(−f_j)V_j + Σ_j (Σ_k σ(f_k−f_j) − Σ_k σ(f_j−f_k)) V_j − λU ]
      dV_j = γ[ (σ(−f_j) + Σ_k (σ(f_k−f_j) − σ(f_j−f_k))) U − λV_j ]

    Deltas accumulated over all users per iteration, applied once."""
    pairs = sorted({(int(u), int(i)) for u, i in ratings[["user", "item"]].itertuples(index=False)})
    rated = _rated_sets(pairs)
    rel = _capped_relevants(pairs, rated, seed, max_buffer)
    items = sorted({i for _, i in pairs})
    U = {u: _init_vec(u, "u", vector_size, seed, 0.1) for u in rated}
    V = {i: _init_vec(i, "i", vector_size, seed, 0.1) for i in items}
    for _ in range(iterations):
        dU = {u: np.zeros(vector_size) for u in U}
        dV = {i: np.zeros(vector_size) for i in V}
        for u in sorted(rel):
            its = rel[u]
            uv = U[u]
            vs = [V[i] for i in its]
            f = [float(v @ uv) for v in vs]
            m = len(its)
            du = -lambda_ * uv.copy()
            for j in range(m):
                coef = sum(_sigmoid_s(f[k] - f[j]) for k in range(m)) \
                     - sum(_sigmoid_s(f[j] - f[k]) for k in range(m))
                du = du + (_sigmoid_s(-f[j]) + coef) * vs[j]
                scal = _sigmoid_s(-f[j]) + sum(
                    _sigmoid_s(f[k] - f[j]) - _sigmoid_s(f[j] - f[k]) for k in range(m)
                )
                dV[its[j]] += gamma * (scal * uv - lambda_ * vs[j])
            dU[u] += gamma * du
        for u in U:
            U[u] = U[u] + dU[u]
        for i in V:
            V[i] = V[i] + dV[i]
    return U, V


def ref_tfmap(
    ratings: pd.DataFrame,
    vector_size: int = 10,
    iterations: int = 30,
    gamma: float = 0.05,
    lambda_: float = 0.01,
    seed: int = 42,
    max_buffer: int | None = 1024,
):
    """TFMAP (Shi et al., SIGIR 2012; TFMAPRankingComputation.java:43-148,
    context omitted like the reference).  Buffer per user = relevant
    items + per-relevant-draw hash-sampled irrelevant items (distinct,
    still-rated draws dropped).  With R the relevant set, f = V·U:

      dU   = γ[ (1/|R|) Σ_{i∈R}( σ'(f_i)(Σ_{j∈R} σ(f_j−f_i)) V_i
               + σ(f_i) Σ_{j∈R} σ'(f_j−f_i)(V_j−V_i) ) − λU ]
      dV_i = γ[ (1/|R|) Σ_{j∈R}( σ'(f_i)σ(f_j−f_i) + σ(f_j)
               − σ(f_i)σ'(f_j−f_i) ) U − λV_i ]  for EVERY buffered i
    """
    def sigd(x: float) -> float:
        s = _sigmoid_s(x)
        return s * (1.0 - s)

    pairs = sorted({(int(u), int(i)) for u, i in ratings[["user", "item"]].itertuples(index=False)})
    rated = _rated_sets(pairs)
    rel = _capped_relevants(pairs, rated, seed, max_buffer)
    item_at = sorted({i for _, i in pairs})
    U = {u: _init_vec(u, "u", vector_size, seed, 0.1) for u in rated}
    V = {i: _init_vec(i, "i", vector_size, seed, 0.1) for i in item_at}
    for it in range(iterations):
        dU = {u: np.zeros(vector_size) for u in U}
        dV = {i: np.zeros(vector_size) for i in V}
        for u in sorted(rel):
            rel_items = rel[u]
            irr = set()
            for pos in rel_items:
                # rejection is against the FULL rated set (engine:
                # _sample_negatives gets `ratings`, not the cap)
                neg = _draw_negative(u, pos, f"irr{it}", seed, item_at, rated[u])
                if neg is not None:
                    irr.add(neg)
            buffered = sorted(set(rel_items) | irr)
            rel_mask = {i: (i in rated[u]) for i in buffered}
            uv = U[u]
            vget = {i: V[i] for i in buffered}
            f = {i: float(vget[i] @ uv) for i in buffered}
            R = [i for i in buffered if rel_mask[i]]
            r = len(R)
            if r == 0:
                continue
            du = np.zeros(vector_size)
            for i in R:
                term1 = sigd(f[i]) * sum(_sigmoid_s(f[j] - f[i]) for j in R) * vget[i]
                term2 = _sigmoid_s(f[i]) * sum(
                    sigd(f[j] - f[i]) * (vget[j] - vget[i]) for j in R
                )
                du = du + term1 + term2
            dU[u] += gamma * (du / r - lambda_ * uv)
            for i in buffered:
                bsum = sum(
                    sigd(f[i]) * _sigmoid_s(f[j] - f[i]) + _sigmoid_s(f[j])
                    - _sigmoid_s(f[i]) * sigd(f[j] - f[i])
                    for j in R
                )
                dV[i] += gamma * ((bsum / r) * uv - lambda_ * vget[i])
        for u in U:
            U[u] = U[u] + dU[u]
        for i in V:
            V[i] = V[i] + dV[i]
    return U, V


def ref_sgd(
    ratings: pd.DataFrame,
    vector_size: int = 3,
    lambda_: float = 0.01,
    gamma: float = 0.005,
    iterations: int = 10,
    min_rating: float = 0.0,
    max_rating: float = 5.0,
    seed: int = 42,
    max_buffer: int | None = 100_000,
):
    """SGD MF (Sgd.java:162-192): v ← v − γ(λv + err·u), err from the
    CLIPPED prediction; user pass folds each user's ratings in item-id
    order against the OLD item factors, item pass folds in user-id
    order against the NEW user factors (the engine's deterministic
    stand-in for Giraph's arrival order).  Cap cascade: per-user then
    per-item hash-ordered truncation (engine sgd max_buffer)."""
    rows = [(int(u), int(i), float(r)) for u, i, r in ratings[["user", "item", "rating"]].itertuples(index=False)]
    train = rows
    if max_buffer is not None:
        def cap(rws, gpos, opos):
            by: dict[int, list] = {}
            for t in rws:
                by.setdefault(t[gpos], []).append(t)
            out = []
            for g, ts in by.items():
                if len(ts) > max_buffer:
                    ts = sorted(ts, key=lambda t: (
                        spark_xxhash64(("long", t[gpos]), ("long", t[opos]), ("int", seed)), t[opos]
                    ))[:max_buffer]
                out.extend(ts)
            return out
        train = cap(cap(rows, 0, 1), 1, 0)

    by_user: dict[int, list[tuple[int, float]]] = {}
    by_item: dict[int, list[tuple[int, float]]] = {}
    for u, i, r in train:
        by_user.setdefault(u, []).append((i, r))
        by_item.setdefault(i, []).append((u, r))
    for u in by_user:
        by_user[u].sort()
    for i in by_item:
        by_item[i].sort()

    users = sorted({u for u, _, _ in rows})
    items = sorted({i for _, i, _ in rows})
    # cf._init_factors convention: salt 'user'/'item', scale 0.01
    U = {u: _init_vec(u, "user", vector_size, seed, 0.01) for u in users}
    V = {i: _init_vec(i, "item", vector_size, seed, 0.01) for i in items}

    def clip(x: float) -> float:
        return min(max(x, min_rating), max_rating)

    for _ in range(iterations):
        newU = {}
        for u in users:
            v = U[u].copy()
            for i, r in by_user.get(u, []):
                q = V[i]
                err = clip(float(np.dot(v, q))) - r
                v = v - gamma * (lambda_ * v + err * q)
            newU[u] = v
        U = newU
        newV = {}
        for i in items:
            v = V[i].copy()
            for u, r in by_item.get(i, []):
                p = U[u]
                err = clip(float(np.dot(v, p))) - r
                v = v - gamma * (lambda_ * v + err * p)
            newV[i] = v
        V = newV
    return U, V
