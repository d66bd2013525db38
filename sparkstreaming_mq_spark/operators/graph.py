"""Iterative graph analytics over fixture-derived graphs (bonus
surface, SURVEY.md §2.11).

Connected components already exist as the dedup-cluster kernel
(operators/llm.py l8); this module adds the other canonical iterative
graph op — PageRank — over the part co-purchase graph (two parts are
neighbors when they appear in the same order). The edge build is a
bounded self-join (≤13 distinct parts per order in the fixtures, ≤7 in
real TPC-H, so the per-order pair fan-out is a small constant), and
each iteration is one co-partitioned join + one aggregate.

Everything runs in fixed-point BIGINT arithmetic (rank scaled by 1e9,
damping 0.85 applied as ``(85 * x) div 100``) so ten iterations produce
bit-identical integers on Spark and DuckDB — the oracle unrolls the
iterations as chained CTEs. No floats, no convergence tolerance, no
run-dependence.

DuckDB gotchas encoded below: bare integer literals are INT32 and
``85 * rank`` overflows at rank ~2.5e7, so every oracle-side literal in
the recurrence is CAST to BIGINT; and ``sum(BIGINT)`` widens to
HUGEINT, which fetchdf() renders as float64 (a dtype-kind hash
mismatch), so the sum is CAST back to BIGINT inside each iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreaming_mq_spark.registry import query
from sparkstreaming_mq_spark.tables import load_table

PR_SCALE = 1_000_000_000  # fixed-point 1.0
PR_ITERS = 10
# teleport = 0.15 * PR_SCALE, damping = 85/100 — both exact in BIGINT
PR_TELEPORT = 150_000_000
# Lineage-truncation cadence, measured at sf0.1 (results bit-identical
# at every setting): every round 18.9s, every 3rd 11.0s, every 5th
# 9.3s, only-at-end 10.0s — materializing the tiny rank frame each
# round costs a full job's latency, while a 5-deep lazy chain is free
# for Catalyst. The l8 trade-off, with the knee measured for this op.
PR_CKPT_EVERY = 5


def _pagerank_oracle(iters: int) -> str:
    parts = [
        """WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM pairs GROUP BY src
),
r0 AS (
  SELECT src AS node, CAST(1000000000 AS BIGINT) AS pr FROM deg
)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
r{k} AS (
  SELECT p.dst AS node,
         CAST(150000000 AS BIGINT)
           + (CAST(85 AS BIGINT) * CAST(sum(r.pr // d.outdeg) AS BIGINT))
             // CAST(100 AS BIGINT)
           AS pr
  FROM r{k - 1} r
  JOIN deg d ON r.node = d.src
  JOIN pairs p ON p.src = r.node
  GROUP BY p.dst
)"""
        )
    parts.append(f"\nSELECT node AS part_key, pr AS rank_scaled FROM r{iters}")
    return "".join(parts)


# Broadcast bound for the per-iteration rank frame (16 bytes/node): up
# to this many vertices the rank table broadcasts and each iteration
# touches the edge list with ZERO shuffle of edge rows. Past it (the
# true web-graph regime) the co-partitioned path runs: edges live in a
# src-bucketed table (one-time write), so per iteration only the
# O(nodes) rank frame shuffles into the bucket layout — edge rows
# never cross the wire after the initial bucketing.
G1_BROADCAST_MAX_NODES = 5_000_000
G1_EDGE_BUCKETS = 16


def _g1_edges(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Materialize the co-purchase edge list WITH the source's
    out-degree folded onto each edge row (src, dst, outdeg), plus the
    node frame. Folding outdeg onto the edge eliminates the
    per-iteration rank⋈degree join: the contribution pr div outdeg is
    computed per edge row in codegen (same integer per src — the sum
    is identical), so one iteration is exactly one join + one
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    # Per-order co-purchase pairs via the shared a18 numpy kernel
    # (operators/aggregates._a18_partials) — r12, after a18's 100×
    # rung falsified the collect_set + double-explode form this
    # function previously shared with it (superlinear with ZERO spill:
    # Catalyst explode row machinery, 7.0× wall on 3.3× rows). One
    # orderkey exchange, vectorized within-basket pair generation,
    # partition-local unique partials; the (a, b) fold keys ARE the
    # distinct src<dst half-edges (the item/order sentinel rows are
    # filtered out). History: r6 had already replaced the original
    # items-self-join (two corpus-sized SMJ sorts, 65 s at 30×) with
    # the collect_set form; this is the next step of the same ladder.
    from sparkstreaming_mq_spark.operators.aggregates import _a18_partials

    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # sortWithinPartitions: the r13 kernel streams sorted batches at
    # basket boundaries (input memory = one Arrow batch + largest
    # basket) — unsorted input would split baskets across segments and
    # silently lose their cross-segment pairs.
    partials = (
        li.select("l_orderkey", "l_partkey")
        .repartition(n_shuffle, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .mapInPandas(_a18_partials, schema="a long, b long, cnt long")
    )
    # The co-purchase relation is symmetric, so dedupe only the
    # src<dst half (the kernel emits a<b once per basket; the fold is
    # a pair-space-sized distinct) and mirror the surviving edges
    # afterwards, a frame already reduced to distinct-edge cardinality.
    half = (
        partials.filter(F.col("b") >= 0)
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .distinct()
    )
    # Materialize the half-edge set BEFORE it fans out: it is consumed
    # four ways (two union branches, each again by pairs and by deg's
    # rollup), none of which ends in a reusable exchange above the
    # kernel — the r14 stage profile measured the scan+kernel+distinct
    # pipeline executing TWICE (two identical 32-task stages) and the
    # lineitem scan FOUR times (4 × 220 MB input stages) under the
    # edges checkpoint. The frame is distinct-edge-sized; one eager
    # materialization replaces all re-executions (the CC/a18
    # multi-consumer lesson).
    half = half.localCheckpoint(eager=True)
    pairs = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = pairs.groupBy("src").agg(F.count("*").cast("long").alias("outdeg"))
    edges = pairs.join(deg, "src").localCheckpoint(eager=True)
    nodes = edges.select("src").distinct().localCheckpoint(eager=True)
    return edges, nodes


def _g1_bucketed_edges(spark: SparkSession, sf_dir: str, edges: DataFrame) -> DataFrame:
    """Big-graph path: persist the edge list bucketed by ``src`` (the
    o10 zero-exchange machinery) so every iteration's rank⋈edges join
    reads edge buckets in place — only the rank frame shuffles."""
    import os
    import tempfile

    from sparkstreaming_mq_spark.tables import cache_key

    name = f"sg_g1_edges_{cache_key(sf_dir, 'lineitem')}"
    base = os.path.join(tempfile.gettempdir(), "sparkgraft_buckets", name)
    # The catalog entry can outlive the external /tmp data (tmp cleanup
    # under a persistent metastore, or a crashed run that registered a
    # partial write). Trust it only when the directory's _SUCCESS
    # marker is present; otherwise drop and rewrite — silently-empty
    # edges would yield an empty rank frame, not a loud failure.
    if spark.catalog.tableExists(name) and not os.path.exists(
        os.path.join(base, "_SUCCESS")
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    if not spark.catalog.tableExists(name):
        (
            edges.write.mode("overwrite")
            .option("path", base)
            .bucketBy(G1_EDGE_BUCKETS, "src")
            .sortBy("src")
            .saveAsTable(name)
        )
    return spark.table(name)


@query("g1_pagerank", oracle=_pagerank_oracle(PR_ITERS))
def g1_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten fixed-point PageRank iterations on the part co-purchase graph.

    Scale shape (reworked r6 after the 10× smoke showed every
    iteration re-shuffling the full edge list through a sort-merge
    join — localCheckpoint does NOT preserve partitioning in this
    build, so the old "Catalyst reuses the partitioning" claim was
    wrong in practice): the edge list materializes ONCE with outdeg
    folded onto each row (``_g1_edges``), then each iteration is one
    join + one aggregate where no edge row ever shuffles —
    - ≤ G1_BROADCAST_MAX_NODES: the O(nodes) rank frame broadcasts;
      the join is map-side over the materialized edges and the only
      exchange is the post-partial-agg per-vertex rollup.
    - past the bound (rank frame too big for executor memory): edges
      persist src-bucketed (``_g1_bucketed_edges``) and the rank frame
      shuffles into the bucket layout — per-iteration network cost is
      O(nodes), never O(edges).
    Rank frames are localCheckpoint'ed every PR_CKPT_EVERY rounds to
    bound plan depth (the l8 lineage-truncation pattern; cadence knee
    measured, see constant). The symmetric edge construction
    guarantees in-degree ≥ 1 for every node, so no dangling-mass or
    left-join handling is needed on either engine.
    """
    edges, nodes = _g1_edges(spark, sf_dir)
    if nodes.count() > G1_BROADCAST_MAX_NODES:
        edges = _g1_bucketed_edges(spark, sf_dir, edges)
        rank_side = lambda r: r  # noqa: E731 — bucketed edges stay in place
    else:
        rank_side = F.broadcast
    ranks = nodes.select(
        F.col("src").alias("node"), F.lit(PR_SCALE).cast("long").alias("pr")
    )
    broadcast_regime = rank_side is F.broadcast
    for it in range(PR_ITERS):
        ranks = (
            edges.join(rank_side(ranks), edges.src == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.expr("pr div outdeg")).alias("s"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(PR_TELEPORT) + F.expr("(85 * s) div 100"))
                .cast("long")
                .alias("pr"),
            )
        )
        if (it + 1) % PR_CKPT_EVERY == 0 and it < PR_ITERS - 1:
            if broadcast_regime:
                # lineage truncation via a driver roundtrip (r15, was
                # localCheckpoint): toPandas of the O(nodes) rank frame
                # is one lightweight job vs a 20-32-task checkpoint
                # write, and the next BroadcastExchange builds from a
                # LocalTableScan — a driver-local fast path with no
                # executor job inside the broadcast thread (partial
                # de-risking of the r14 slow-host-phase broadcast-wait
                # signature). int64 round-trips exactly through Arrow.
                # The final-iteration truncation is skipped outright —
                # the caller's terminal action truncates for free.
                ranks = spark.createDataFrame(
                    ranks.toPandas(), schema="node long, pr long"
                )
            else:
                ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        F.col("node").alias("part_key"), F.col("pr").alias("rank_scaled")
    )


# --- G2: triangle counting (degree-oriented) ----------------------------------

G2_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_partkey % 10 = 0
),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT u AS n FROM edges UNION ALL SELECT v AS n FROM edges
  ) GROUP BY n
),
oriented AS (
  SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
              THEN e.u ELSE e.v END AS src,
         CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
              THEN e.v ELSE e.u END AS dst
  FROM edges e
  JOIN deg du ON du.n = e.u
  JOIN deg dv ON dv.n = e.v
),
tri AS (
  SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
  FROM oriented o1
  JOIN deg d1 ON d1.n = o1.dst
  JOIN oriented o2 ON o2.src = o1.src
  JOIN deg d2 ON d2.n = o2.dst
  JOIN oriented o3 ON o3.src = o1.dst AND o3.dst = o2.dst
  WHERE (d1.d < d2.d) OR (d1.d = d2.d AND o1.dst < o2.dst)
)
SELECT part_key, CAST(count(*) AS BIGINT) AS n_triangles FROM (
  SELECT a AS part_key FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
GROUP BY part_key
"""


@query("g2_triangle_count", oracle=G2_ORACLE)
def g2_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the part co-purchase graph, via the
    degree-oriented wedge algorithm — the shape that scales: every
    edge is oriented from its lower-(degree, id) endpoint to the
    higher, so each triangle is found EXACTLY once from its
    lowest-rank apex and wedge fan-out is bounded by out-degree ≤
    O(√E) instead of raw degree. Total work O(E^1.5) worst case —
    the classic bound — versus the naive u<v wedge join that explodes
    on hub nodes. Joins are plain equi-joins on node keys (shuffle-
    partitioned; at 100 TB the oriented edge list is the dataset and
    this is 2 self-joins + 1 verify join, all co-partitionable).
    Exact integer counts; the oracle replays the same orientation.

    Runs on the 10% node-induced subgraph (l_partkey % 10 == 0): the
    full co-purchase fixture graph is near-clique-dense (avg degree
    120 at sf0.1 — 83M wedges even degree-oriented), which stresses
    local-mode memory, not the algorithm; the induced subgraph keeps
    real triangle structure (101/464/1916 across the three SFs) while
    the plan/orientation under test is identical."""
    li = load_table(spark, sf_dir, "lineitem")
    items = (
        li.filter(F.col("l_partkey") % 10 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.alias("a")
    b = items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # dst degree is carried THROUGH the orientation so the (much
    # larger) wedge set below never re-joins the degree table — the
    # first cut of this query did, and re-shuffling O(Σ outdeg²) wedge
    # rows twice blew executor memory at sf0.1
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("dst_d"),
        )
    )
    o1 = oriented.select("src", F.col("dst").alias("b"), F.col("dst_d").alias("db"))
    o2 = oriented.select("src", F.col("dst").alias("c"), F.col("dst_d").alias("dc"))
    rank_b_lower = (F.col("db") < F.col("dc")) | (
        (F.col("db") == F.col("dc")) & (F.col("b") < F.col("c"))
    )
    wedges = (
        o1.join(o2, "src")
        .filter(rank_b_lower)
        .select(F.col("src").alias("a"), "b", "c")
    )
    closer = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    # Materialize the triangle list before the 3-way apex union: tri
    # ends in a join (no exchange for ReuseExchange to dedup), so each
    # union branch would re-execute the wedge and closing joins (the
    # r14 multi-consumer rule: g1's half-edge frame measured 2× the
    # kernel and 4× the scan under the same shape). The frame is
    # triangle-count-sized — the algorithm's output, far below the
    # wedge set it derives from.
    tri = wedges.join(closer, ["b", "c"]).localCheckpoint(eager=True)
    return (
        tri.select(F.col("a").alias("part_key"))
        .unionAll(tri.select(F.col("b").alias("part_key")))
        .unionAll(tri.select(F.col("c").alias("part_key")))
        .groupBy("part_key")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


# --- G3: bounded-hop BFS reachability -----------------------------------------

G3_SEED_MOD = 97  # seeds = parts whose key is divisible by this (deterministic)
G3_HOPS = 3
# lineage-truncation switch for intermediate hops (tests monkeypatch it
# off to inspect the full multi-join plan; results are bit-identical)
G3_CKPT_INTERMEDIATE = True


def _g3_oracle(hops: int) -> str:
    parts = [
        """WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
r0 AS (
  SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
  FROM pairs WHERE src % """
        + str(G3_SEED_MOD)
        + " = 0)"
    ]
    for k in range(1, hops + 1):
        parts.append(
            f""",
r{k} AS (
  SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
    SELECT node, dist FROM r{k - 1}
    UNION ALL
    SELECT e.dst AS node, f.dist + 1 AS dist
    FROM pairs e JOIN r{k - 1} f ON e.src = f.node
    WHERE f.dist = {k - 1}
  ) u GROUP BY node
)"""
        )
    parts.append(f"\nSELECT node, dist FROM r{hops}")
    return "".join(parts)


@query("g3_khop_reach", oracle=_g3_oracle(G3_HOPS))
def g3_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop BFS: the exact hop distance (0..3) from a
    deterministic seed set (part keys divisible by 97) to every part
    reachable within 3 hops of the co-purchase graph — the blast-radius
    / feature-propagation primitive (and the bounded form of
    single-source shortest path; distances are integers, no floats
    anywhere). The oracle unrolls the same three frontier expansions as
    chained CTEs, like g1's fixed-point recurrence.

    Scale shape (g1's lessons applied): the edge list materializes once
    via ``_g1_edges`` (outdeg unused here), and each hop is ONE
    broadcast join — the frontier (nodes at dist k-1, node-frame-sized,
    the same bound as g1's rank frame) broadcasts into the stationary
    edge list, so edges NEVER shuffle — plus one node-keyed min
    aggregate. Past the broadcast bound the ``_g1_bucketed_edges`` path
    applies unchanged: bucketed edges stay in place and only the
    frontier moves. Frontier-only expansion (``dist = k-1``) keeps each
    round's join input minimal — already-settled nodes re-enter only
    through the min-merge, not the join. Intermediate hops
    localCheckpoint the node-sized ``reached`` frame (it is referenced
    twice per hop, and an unbroken lineage doubles per hop); the last
    hop stays lazy so the returned plan is live."""
    edges, nodes = _g1_edges(spark, sf_dir)
    e = edges.select("src", "dst")
    reached = nodes.filter(F.col("src") % G3_SEED_MOD == 0).select(
        F.col("src").alias("node"), F.lit(0).cast("long").alias("dist")
    )
    for k in range(1, G3_HOPS + 1):
        frontier = reached.filter(F.col("dist") == k - 1).select(
            F.col("node").alias("fnode")
        )
        cand = e.join(F.broadcast(frontier), e.src == F.col("fnode")).select(
            F.col("dst").alias("node"), F.lit(k).cast("long").alias("dist")
        )
        reached = (
            reached.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
        )
        # truncate lineage after every INTERMEDIATE hop: `reached` is
        # referenced twice per iteration (frontier filter + min-merge
        # union), so an unbroken chain doubles per hop and hop k
        # re-executes hop 1 up to 2^k times — the measured
        # ReuseExchange lesson (CLAUDE.md) and g1's PR_CKPT_EVERY
        # rationale; the frame is node-sized, so eager materialization
        # is cheap. The LAST hop stays lazy so the returned plan shows
        # a live frontier⋈edges join (the r6 pagerank plan-test lesson:
        # never hand the test a checkpoint-truncated plan).
        if G3_CKPT_INTERMEDIATE and k < G3_HOPS:
            reached = reached.localCheckpoint(eager=True)
    return reached


# --- G4: recursive CTE hierarchy rollup (Spark 4.1 WITH RECURSIVE) ------------

G4_ORACLE = """
WITH RECURSIVE peruser AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events
  GROUP BY user_id
),
chain AS (
  SELECT user_id AS node, cnt, cents FROM peruser
  UNION ALL
  SELECT node // 2, cnt, cents FROM chain WHERE node > 1
)
SELECT node,
       CAST(sum(cnt) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS cents
FROM chain
GROUP BY node
"""


@query("g4_recursive_rollup", oracle=G4_ORACLE)
def g4_recursive_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.1 ``WITH RECURSIVE``): every user's event
    count and exact-cent value rolled up to ALL ancestors in the
    implicit binary hierarchy ``parent(u) = u div 2`` — the org-chart /
    BOM-explosion rollup pattern, executed by Spark's native recursion
    (UnionLoop) instead of a hand-unrolled join ladder (g3's k-hop) or
    a driver-side loop (g1's fixed-point iteration), completing the
    module's three iterative-execution styles.

    Scale: the recursion starts from the per-user AGGREGATE (one
    map-side-combinable shuffle over events), so each recursion level
    is a narrow projection of at most |users| rows with NO join — the
    whole walk is |users| x log2(max_key) generated rows — and the
    closing rollup is the only other shuffle. Depth is data-logarithmic
    (~14 at sf0.1, ~26 at the 30x replica's remapped keys), far under
    the recursion limit, and independent of event count.

    Exactness: integer keys, integer division (Spark ``DIV`` == DuckDB
    ``//`` on BIGINT), fixed-point cents — bit-identical rollups on
    both engines at any depth. The UNION ALL recursion guard
    ``node > 1`` makes key 1 (and a possible key 0) terminal, so the
    walk provably halts on both engines."""
    from sparkstreaming_mq_spark.tables import register_views

    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
        WITH RECURSIVE peruser AS (
          SELECT user_id,
                 CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM events
          GROUP BY user_id
        ),
        chain AS (
          SELECT user_id AS node, cnt, cents FROM peruser
          UNION ALL
          SELECT node DIV 2, cnt, cents FROM chain WHERE node > 1
        )
        SELECT node,
               CAST(sum(cnt) AS BIGINT) AS n_events,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM chain
        GROUP BY node
        """
    )
