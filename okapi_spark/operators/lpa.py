"""Label propagation — classic LPA and Spinner's balanced variant.

Classic LPA (community detection): every vertex starts with its own
id as label; each synchronous round it adopts the label with the
highest total incoming edge weight, ties broken by the SMALLEST label
— fully deterministic and partitioning-independent. (The reference's
Spinner, spinner/Spinner.java:186-204, builds exactly this
neighbor-label histogram before applying its balance penalty.)

Synchronous LPA can 2-cycle on bipartite structures, so the loop
halts on no-change OR on a repeat of the previous changed-count with
``max_supersteps`` as the backstop; a fixed ``iterations`` mode exists
for oracle parity (the DuckDB oracle unrolls the same rounds).

Balanced mode (``spinner_partition``) implements Spinner's scoring
(spinner/Spinner.java:259-290): score(v, l) = freq(l in nbrhood)/deg
− λ·load(l)/capacity, with per-label loads collected driver-side each
round (the persistent-aggregator feedback loop, :586-597) and
probabilistic migration damped by remaining capacity (:341-418) made
deterministic via hash-derived per-(vertex, round) uniforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from okapi_spark.bsp import BSPResult, CheckpointStore, run_supersteps
from okapi_spark.graph.graph import Graph


def _argmax_label(msgs: DataFrame, key: str = "id") -> DataFrame:
    """(key, lbl) with max weight, tie → min label: one hash agg via
    max(struct(w, -lbl)) — no window, no second shuffle."""
    return (
        msgs.groupBy(key)
        .agg(F.max(F.struct(F.col("w"), (-F.col("lbl")).alias("neg"))).alias("m"))
        .select(key, (-F.col("m.neg")).alias("new_lbl"))
    )


def label_propagation(
    graph: Graph,
    max_supersteps: int = 50,
    iterations: int | None = None,
    weighted: bool = True,
    store: CheckpointStore | None = None,
    num_partitions: int | None = None,
    state_broadcast: bool | None = None,
    broadcast_threshold: int = 20_000_000,
) -> BSPResult:
    """Classic synchronous LPA. Returns state (id long, lbl long).

    ``iterations``: run exactly that many rounds (oracle-parity mode);
    otherwise run to no-change / oscillation / max_supersteps.

    ``state_broadcast``: LPA's label state is a full |V|-row table
    every round (unlike CC there is no shrinking frontier), so the
    zero-exchange broadcast plan is only safe when |V| fits a
    broadcast — auto-selected vs ``broadcast_threshold``; above it the
    classic two-shuffle plan runs (state shuffles into the src join,
    histogram agg combines map-side).
    """
    spark = graph.edges.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    w_col = F.col("weight") if weighted else F.lit(1.0)

    vertices = graph.vertices().repartition(num_partitions, "id").persist(StorageLevel.MEMORY_AND_DISK)
    n = vertices.count()
    if state_broadcast is None:
        state_broadcast = n <= broadcast_threshold

    if state_broadcast:
        # dst-partitioned scatter layout (see Graph.by_dst): labels are
        # broadcast into the src join; groupBy(dst, lbl) and the argmax
        # groupBy(dst) are both partition-complete ⇒ zero exchanges
        edges = graph.by_dst(num_partitions).select("src", "dst", w_col.alias("weight"))
    else:
        edges = graph.edges.select("src", "dst", w_col.alias("weight"))

    state0 = vertices.select("id", F.col("id").alias("lbl"))

    def superstep(ss: int, state: DataFrame):
        labels = (
            state.select("id", "lbl")
            .withColumnRenamed("id", "src")
            .withColumnRenamed("lbl", "slbl")
        )
        if state_broadcast:
            labels = F.broadcast(labels)
        hist = (
            edges.join(labels, "src")
            .groupBy(F.col("dst").alias("id"), F.col("slbl").alias("lbl"))
            .agg(F.sum("weight").alias("w"))
        )
        best = _argmax_label(hist)
        new_state = state.join(best, "id", "left").select(
            "id",
            F.coalesce("new_lbl", "lbl").alias("lbl"),
            (F.coalesce("new_lbl", "lbl") != F.col("lbl")).alias("changed"),
        )

        def post(materialized: DataFrame) -> dict:
            return {"changed": materialized.filter("changed").count()}

        return new_state, post

    if iterations is not None:
        halt = None
        max_ss = iterations
    else:
        prev: list[int] = []

        def halt(ss: int, m: dict) -> bool:
            c = m["changed"]
            osc = len(prev) >= 2 and c == prev[-2] and prev[-1] == prev[-2]
            prev.append(c)
            return c == 0 or osc

        max_ss = max_supersteps

    res = run_supersteps(state0, superstep, max_supersteps=max_ss, halt_fn=halt, store=store)
    res.state = res.state.select("id", "lbl")
    return res


def spinner_partition(
    graph: Graph,
    k: int = 8,
    lam: float = 1.0,
    max_iterations: int = 290,
    threshold: float = 0.001,
    window: int = 5,
    seed: int = 42,
    num_partitions: int | None = None,
) -> BSPResult:
    """Spinner balanced k-way partitioning (spinner/Spinner.java:103-736).

    state (id long, part int). Convergence: windowed relative score
    improvement < threshold (:637-655, defaults :115-124). Capacity
    C = n·(1+eps)/k with eps folded into lam's load penalty; migration
    probability = remaining_capacity/demand per target label (:341-418),
    decided by hash-derived uniforms for determinism.
    """
    spark = graph.edges.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    edges = graph.edges.select("src", "dst", "weight")
    vertices = graph.vertices().repartition(num_partitions, "id").persist(StorageLevel.MEMORY_AND_DISK)
    n = vertices.count()
    total_w = edges.agg(F.sum("weight")).collect()[0][0]
    capacity = 1.05 * total_w / k  # weighted-degree capacity per label

    # init: deterministic hash assignment (reference: random init :432-433)
    state0 = vertices.select(
        "id", F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(k)).cast("int").alias("part")
    )

    score_hist: list[float] = []

    def superstep(ss: int, state: DataFrame) -> tuple[DataFrame, dict]:
        st = state.select("id", "part")
        # per-label weighted degree loads (the aggregator feedback loop)
        deg_w = edges.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("dw"))
        loads_rows = (
            st.join(deg_w, "id", "left")
            .groupBy("part")
            .agg(F.sum(F.coalesce("dw", F.lit(0.0))).alias("load"))
            .collect()
        )
        loads = {int(r.part): float(r.load) for r in loads_rows}
        load_expr = F.create_map(
            *[x for p in range(k) for x in (F.lit(p), F.lit(loads.get(p, 0.0)))]
        )

        # neighbor-label histogram normalized by own weighted degree
        hist = (
            edges.join(st.withColumnRenamed("id", "src").withColumnRenamed("part", "spart"), "src")
            .groupBy(F.col("dst").alias("id"), F.col("spart").alias("cand"))
            .agg(F.sum("weight").alias("w"))
        )
        scored = (
            hist.join(deg_w, "id", "left")
            .withColumn(
                "score",
                F.col("w") / F.coalesce("dw", F.lit(1.0))
                - F.lit(lam) * load_expr[F.col("cand")] / F.lit(capacity),
            )
        )
        best = (
            scored.groupBy("id")
            .agg(F.max(F.struct("score", (-F.col("cand")).alias("neg"))).alias("m"))
            .select("id", (-F.col("m.neg")).cast("int").alias("new_part"), F.col("m.score").alias("best_score"))
        )
        joined = st.join(best, "id", "left").select(
            "id", "part",
            F.coalesce("new_part", "part").alias("new_part"),
            F.coalesce("best_score", F.lit(0.0)).alias("best_score"),
        )
        movers = joined.filter(F.col("new_part") != F.col("part"))
        # migration damping: per target label admit remaining/demand fraction
        demand_rows = movers.groupBy("new_part").agg(F.count("*").alias("dem")).collect()
        demand = {int(r.new_part): int(r.dem) for r in demand_rows}
        probs = {
            p: min(1.0, max(0.0, (capacity - loads.get(p, 0.0)) / max(1e-9, capacity))  # head-room fraction
                   if demand.get(p, 0) else 1.0)
            for p in range(k)
        }
        prob_expr = F.create_map(*[x for p in range(k) for x in (F.lit(p), F.lit(probs[p]))])
        u = (F.pmod(F.xxhash64("id", F.lit(ss), F.lit(seed)), F.lit(10**9)).cast("double")) / 1e9
        migrated = joined.select(
            "id",
            F.when(
                (F.col("new_part") != F.col("part")) & (u < prob_expr[F.col("new_part")]),
                F.col("new_part"),
            ).otherwise(F.col("part")).alias("part"),
            "best_score",
        ).persist(StorageLevel.MEMORY_AND_DISK)
        total_score = migrated.agg(F.sum("best_score")).collect()[0][0] or 0.0
        score_hist.append(float(total_score))
        return migrated.select("id", "part"), {"score": float(total_score), "loads": loads}

    def halt(ss: int, m: dict) -> bool:
        if len(score_hist) <= window:
            return False
        prev_w = score_hist[-window - 1]
        return abs(score_hist[-1] - prev_w) < threshold * abs(prev_w or 1.0)

    return run_supersteps(state0, superstep, max_supersteps=max_iterations, halt_fn=halt)
