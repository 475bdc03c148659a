"""Graph analytics over relationships implied by the star schema.

Two operators that exercise shapes the rest of the registry doesn't:

- ``pagerank_trade_graph``: a fixed-iteration ITERATIVE algorithm (the
  class connected components also belongs to) with the numerics made
  order-free so an oracle can hash-check every rank: the only
  order-sensitive operation in PageRank is the per-node SUM of neighbor
  contributions, so each contribution is quantized to 1e-12 with the
  floor-form round and summed as exact int64 — both engines fold the same
  integers, so five iterations stay bit-identical.
- ``event_path_top_trigrams``: sequence mining — the most common 3-step
  event paths. Per-user ordering is a deterministic in-row sort (never a
  bare collect_list, whose order is partition-dependent), trigrams are
  in-row array lambdas, and the global top-k is orderBy().limit().

Scale: PageRank's per-iteration cost is one edges x ranks equi-join plus
a groupBy on dst — both hash-partition on node keys and AQE handles hub
skew; iterations localCheckpoint so the plan stays shallow (same policy
as operators/dedup.connected_components). Path mining shuffles once per
user grouping, then only vocabulary-sized aggregates.
"""

from __future__ import annotations

from pyspark.sql import Window  # noqa: F401  (kept for parity with sibling modules)
from pyspark.sql import functions as F

from ..functions.numeric import oracle_round_half_up, round_half_up
from ..sources.lake import read_table
from . import register
from ..operators.checkpointing import cut_eager

_DAMPING = 0.85
_PR_ITERS = 5
_PR_SCALE = 1000000000000  # contribution quantum: 1e-12
_SUPP_OFFSET = 1000000  # supplier node ids live above customer keys


def _pagerank_oracle() -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs (aggregation over
    a recursive reference is not portable, so the loop is generated)."""
    its = []
    for k in range(1, _PR_ITERS + 1):
        its.append(f"""
it{k} AS (
  SELECT n.node,
         (1.0 - {_DAMPING}) / cast(nn.n AS double)
           + {_DAMPING} * (cast(coalesce(s.contrib, 0) AS double) / {_PR_SCALE}.0)
           AS r
  FROM nodes n
  CROSS JOIN ncount nn
  LEFT JOIN (
    SELECT e.dst AS node,
           sum(cast(floor(p.r / cast(d.deg AS double) * {_PR_SCALE}.0 + 0.5)
                    AS bigint)) AS contrib
    FROM edges e
    JOIN it{k - 1} p ON p.node = e.src
    JOIN degs d ON d.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)""")
    return f"""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT cust AS src, supp + {_SUPP_OFFSET} AS dst FROM pairs
  UNION ALL
  SELECT supp + {_SUPP_OFFSET} AS src, cust AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
ncount AS (SELECT cast(count(*) AS bigint) AS n FROM nodes),
degs AS (SELECT src AS node, cast(count(*) AS bigint) AS deg FROM edges GROUP BY src),
it0 AS (
  SELECT n.node, 1.0 / cast(nn.n AS double) AS r FROM nodes n CROSS JOIN ncount nn
),
{",".join(its)}
SELECT node,
       CASE WHEN node >= {_SUPP_OFFSET} THEN 'supplier' ELSE 'customer' END
         AS node_type,
       {oracle_round_half_up("r", 8)} AS rank
FROM it{_PR_ITERS}
"""


@register("pagerank_trade_graph", oracle=_pagerank_oracle(), tags=("graph", "iterative"))
def pagerank_trade_graph(spark, sf_dir):
    """PageRank over the undirected customer-supplier trade graph (edges =
    distinct (custkey, suppkey) pairs appearing on the same order, both
    directions). Five damped iterations from a uniform start; each
    iteration is edges-join-ranks -> quantized contribution -> int64 sum
    per destination. localCheckpoint per iteration keeps lineage flat, the
    same policy as connected components."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("supp"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst")).union(
        pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    )
    edges = edges.transform(cut_eager)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    ncount = nodes.agg(F.count(F.lit(1)).cast("long").alias("n"))
    degs = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    ranks = nodes.crossJoin(F.broadcast(ncount)).select(
        "node", (F.lit(1.0) / F.col("n").cast("double")).alias("r")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(degs.withColumnRenamed("node", "dnode"), F.col("src") == F.col("dnode"))
            .select(
                "dst",
                F.floor(
                    F.col("r") / F.col("deg").cast("double") * _PR_SCALE + 0.5
                ).cast("long").alias("q"),
            )
            .groupBy("dst")
            .agg(F.sum("q").alias("contrib"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(ncount))
            .join(contrib, F.col("node") == contrib["dst"], "left")
            .select(
                "node",
                (
                    (1.0 - _DAMPING) / F.col("n").cast("double")
                    + _DAMPING
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0)).cast("double")
                        / _PR_SCALE
                    )
                ).alias("r"),
            )
        )
        ranks = ranks.transform(cut_eager)
    return ranks.select(
        "node",
        F.when(F.col("node") >= _SUPP_OFFSET, "supplier")
        .otherwise("customer")
        .alias("node_type"),
        round_half_up(F.col("r"), 8).alias("rank"),
    )


_PATHS_TOPK = 10

_PATHS_ORACLE = f"""
WITH seqs AS (
  SELECT user_id, list(event_type ORDER BY ts, event_id) AS t
  FROM events GROUP BY user_id
),
tris AS (
  SELECT unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || '>' || t[i+1] || '>' || t[i+2])) AS path
  FROM seqs WHERE len(t) >= 3
)
SELECT path, cast(count(*) AS bigint) AS n_users_paths
FROM tris GROUP BY path
ORDER BY n_users_paths DESC, path
LIMIT {_PATHS_TOPK}
"""


@register("event_path_top_trigrams", oracle=_PATHS_ORACLE, tags=("graph", "sequence"))
def event_path_top_trigrams(spark, sf_dir):
    """Most common 3-step event paths across all users. The per-user
    sequence is sort_array over (ts, event_id, type) structs — an in-row
    sort with a total tie-break, deterministic on any cluster, where a
    bare collect_list would depend on partition arrival order. Trigrams
    are in-row lambdas; the only large shuffle is the user grouping, and
    the top-k is TakeOrderedAndProject."""
    ev = read_table(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ).alias("t")
    )
    positions = F.when(
        F.size(F.col("t")) >= 3, F.sequence(F.lit(1), F.size(F.col("t")) - 2)
    ).otherwise(F.array().cast("array<int>"))
    tri = F.transform(
        positions,
        lambda i: F.concat_ws(
            ">",
            F.element_at(F.col("t"), i),
            F.element_at(F.col("t"), i + F.lit(1)),
            F.element_at(F.col("t"), i + F.lit(2)),
        ),
    )
    return (
        seqs.select(F.explode(tri).alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users_paths"))
        .orderBy(F.desc("n_users_paths"), F.asc("path"))
        .limit(_PATHS_TOPK)
    )


# --- BFS hop distance (frontier expansion) ---------------------------------------

_BFS_ITERS = 3


def _bfs_oracle() -> str:
    """Unrolled BFS: dist_k = per-node min over (dist_{k-1} UNION ALL
    one-step relaxations) — integer-only, so no numeric care needed."""
    its = []
    for k in range(1, _BFS_ITERS + 1):
        its.append(f"""
it{k} AS (
  SELECT node, min(d) AS d FROM (
    SELECT node, d FROM it{k - 1}
    UNION ALL
    SELECT e.dst AS node, p.d + 1 AS d
    FROM edges e JOIN it{k - 1} p ON p.node = e.src
  ) GROUP BY node
)""")
    return f"""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT cust AS src, supp + {_SUPP_OFFSET} AS dst FROM pairs
  UNION ALL
  SELECT supp + {_SUPP_OFFSET} AS src, cust AS dst FROM pairs
),
it0 AS (SELECT min(cust) AS node, 0 AS d FROM pairs),
{",".join(its)}
SELECT node,
       CASE WHEN node >= {_SUPP_OFFSET} THEN 'supplier' ELSE 'customer' END
         AS node_type,
       cast(d AS bigint) AS hops
FROM it{_BFS_ITERS}
"""


@register("trade_graph_bfs_hops", oracle=_bfs_oracle(), tags=("graph", "iterative"))
def trade_graph_bfs_hops(spark, sf_dir):
    """BFS hop distance from the lowest customer key over the same
    undirected trade graph as PageRank: 3 unrolled frontier expansions,
    each one edges-join-frontier plus a min-aggregate — all integers, so
    unlike PageRank no quantization is needed at all. Nodes not reached
    within 3 hops are absent (identically in both engines).

    Scale: per iteration one equi-join on src + one groupBy on node —
    the textbook Pregel step as DataFrame ops; localCheckpoint per round
    keeps the lineage flat so iteration count can grow to graph diameter."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("supp"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst")).union(
        pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    )
    edges = edges.transform(cut_eager)
    dist = pairs.agg(F.min("cust").alias("node")).select(
        "node", F.lit(0).alias("d")
    )
    for _ in range(_BFS_ITERS):
        relaxed = (
            edges.join(dist, edges["src"] == dist["node"])
            .select(F.col("dst").alias("node"), (F.col("d") + 1).alias("d"))
        )
        dist = (
            dist.select("node", "d")
            .union(relaxed)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
        )
        dist = dist.transform(cut_eager)
    return dist.select(
        "node",
        F.when(F.col("node") >= _SUPP_OFFSET, "supplier")
        .otherwise("customer")
        .alias("node_type"),
        F.col("d").cast("long").alias("hops"),
    )


# --- hierarchy resolution via pointer doubling --------------------------------------

_HIER_ORACLE = """
WITH RECURSIVE walk AS (
  SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
  FROM customer
  UNION ALL
  SELECT node, (cur - 1) // 2 AS cur, depth + 1
  FROM walk WHERE cur > 0
)
SELECT node AS custkey,
       cast(max(depth) AS bigint) AS depth,
       cast(0 AS bigint) AS root
FROM walk GROUP BY node
"""


@register(
    "hierarchy_depths_doubling",
    oracle=_HIER_ORACLE,
    tags=("extension", "graph", "recursive", "hierarchy"),
)
def hierarchy_depths_doubling(spark, sf_dir):
    """Hierarchy resolution (the BOM-explosion / org-chart primitive):
    every customer sits in a synthetic tree with parent(k) = (k-1)//2
    (root 0); the query reports each node's depth and root. A recursive
    CTE walks one parent edge per iteration — O(depth) rounds; this
    plan POINTER-DOUBLES instead: each round joins every node's current
    jump target onto that target's own jump, doubling the distance
    covered, so a depth-d hierarchy resolves in ceil(log2 d) + 1
    self-joins. That is the difference between ~14 rounds and ~4 at a
    2^14-deep chain — and between feasible and not at 100 TB, where
    every round is a full shuffle of the frontier.

    Each round localCheckpoints (constant-size plans, same idiom as the
    CC operators) and the loop exits when every jump has reached the
    root — an isEmpty probe on the already-materialized checkpoint, a
    limit-1 scan of cached partitions. Oracle: DuckDB WITH RECURSIVE.
    """
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("node")
    )
    # (node, jump, dist): jump = ancestor dist edges up (or root, capped)
    cur = c.select(
        "node",
        F.when(F.col("node") > 0, F.floor((F.col("node") - 1) / 2).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("jump"),
        F.when(F.col("node") > 0, F.lit(1).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("dist"),
    ).transform(cut_eager)
    for _ in range(40):  # 2^40 depth bound — structurally unreachable
        if cur.where(F.col("jump") != 0).isEmpty():
            break
        nxt = cur.select(
            F.col("node").alias("jnode"),
            F.col("jump").alias("jjump"),
            F.col("dist").alias("jdist"),
        )
        cur = (
            cur.join(nxt, cur["jump"] == nxt["jnode"])
            .select(
                "node",
                F.col("jjump").alias("jump"),
                (F.col("dist") + F.col("jdist")).alias("dist"),
            )
            .transform(cut_eager)
        )
    return cur.select(
        F.col("node").alias("custkey"),
        F.col("dist").alias("depth"),
        F.lit(0).cast("long").alias("root"),
    )


# --- k-core peeling (bounded rounds, unrolled oracle) -------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 8
_KCORE_SUPP_OFFSET = 10_000_000


def _kcore_oracle() -> str:
    head = f"""
WITH p AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey + {_KCORE_SUPP_OFFSET} AS supp
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
e0 AS MATERIALIZED (
  SELECT cust AS u, supp AS v FROM p
  UNION ALL
  SELECT supp AS u, cust AS v FROM p
)"""
    rounds = []
    for r in range(1, _KCORE_ROUNDS + 1):
        rounds.append(f""",
deg{r} AS (SELECT u, cast(count(*) AS bigint) AS c FROM e{r - 1} GROUP BY u),
keep{r} AS MATERIALIZED (SELECT u FROM deg{r} WHERE c >= {_KCORE_K}),
e{r} AS MATERIALIZED (
  SELECT a.u, a.v FROM e{r - 1} a
  JOIN keep{r} ka ON a.u = ka.u
  JOIN keep{r} kb ON a.v = kb.u
)""")
    last, prev = _KCORE_ROUNDS, _KCORE_ROUNDS - 1
    tail = f"""
SELECT u AS node, cast(count(*) AS bigint) AS degree,
       (SELECT count(*) FROM e{last}) = (SELECT count(*) FROM e{prev})
         AS converged
FROM e{last} GROUP BY u
"""
    return head + "".join(rounds) + tail


@register(
    "kcore_trade_graph",
    oracle=_kcore_oracle(),
    tags=("extension", "graph", "iterative", "kcore"),
)
def kcore_trade_graph(spark, sf_dir):
    """k-core decomposition (k = {k}) of the customer-supplier trade graph
    by iterative peeling: each round drops nodes of degree < {k} and the
    edges touching them; {r} bounded rounds with a convergence flag in
    the result (edge counts are monotone decreasing, so equal counts in
    consecutive rounds == fixpoint == the true {k}-core). The dense-
    subgraph primitive behind community seeds and spam-ring detection.

    Each round is one degree aggregate + two semi-join filters on the
    node key, localCheckpointed (constant-size plans, the CC idiom);
    the oracle unrolls the same {r} rounds textually — the bounded-
    iteration contract is explicit in both engines.

    Scale: per-round cost is one shuffle of the surviving edge set,
    which only shrinks; {r} rounds bound the wall-clock (real k-cores
    of social graphs converge in few rounds; the flag says if this one
    did).""".format(k=_KCORE_K, r=_KCORE_ROUNDS)
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    p = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + _KCORE_SUPP_OFFSET).alias("supp"),
        )
        .distinct()
    )
    e = p.select(F.col("cust").alias("u"), F.col("supp").alias("v")).union(
        p.select(F.col("supp").alias("u"), F.col("cust").alias("v"))
    ).transform(cut_eager)
    counts = [e.count()]
    for _ in range(_KCORE_ROUNDS):
        keep = (
            e.groupBy("u")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= _KCORE_K)
            .select("u")
        )
        kb = keep.select(F.col("u").alias("vk"))
        e = (
            e.join(keep, "u", "left_semi")
            .join(kb, e["v"] == kb["vk"], "left_semi")
            .transform(cut_eager)
        )
        counts.append(e.count())
    converged = counts[-1] == counts[-2]
    return e.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("degree"),
        F.lit(converged).alias("converged"),
    )
