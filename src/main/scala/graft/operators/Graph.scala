package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration PageRank over an edge relation — the graph
  * centrality pass a training pipeline uses to pick canonical
  * documents inside duplicate clusters or to weight crawl sources by
  * link authority (Page et al. 1999).
  *
  * Scale shape: the edge list is hash-partitioned by `src` ONCE and
  * persisted; each iteration shuffles only the rank relation (2 cols,
  * one row per node) into that partitioning, aggregates contributions
  * per `dst` with map-side combine, and left-joins back to the node
  * set so sink-free nodes still receive teleport mass. Lineage is
  * truncated per iteration with `localCheckpoint` (the same guard
  * [[Cluster]] uses) so the plan does not grow with the iteration
  * count. Driver state: nothing but the node count.
  *
  * Iteration count is FIXED (not convergence-tested): the oracle
  * replays the identical unrolled recurrence, so both engines compute
  * the same finite prefix of the power iteration.
  */
object Graph {

  /** PageRank on `edges(src, dst)`. Every node must appear as a `src`
    * (i.e. no dangling nodes) — callers with one-directional data
    * should symmetrize first, which is also what keeps the random walk
    * irreducible on bipartite inputs. Returns `(node, rank_norm)` with
    * `rank_norm = rank × n` (mean 1.0) rounded to 6 dp.
    */
  def pageRank(spark: SparkSession, edges: DataFrame,
               iters: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = deg.select(col("src").as("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val teleport = (1.0 - damping) / n

    // disjoint column names per relation — the iteration self-joins
    // lineage-shared frames, which trips the ambiguous-column check
    // under qualified references
    val eR = e.select(col("src").as("esrc"), col("dst").as("edst"))
    val degR = deg.select(col("src").as("dsrc"), col("deg"))
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = ranks
        .join(degR, col("node") === col("dsrc"))
        .select(col("node").as("csrc"), (col("rank") / col("deg")).as("share"))
        .join(eR, col("csrc") === col("esrc"))
        .groupBy(col("edst"))
        .agg(sum(col("share")).as("contrib"))
        .select(col("edst").as("node"), col("contrib"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) * coalesce(col("contrib"), lit(0.0)))
            .as("rank"))
        .localCheckpoint()
    }
    val out = ranks.select(col("node"),
      round(col("rank") * n, 6).as("rank_norm"))
    e.unpersist(); deg.unpersist(); nodes.unpersist()
    out
  }

  /** The symmetric customer↔supplier co-purchase graph: an edge per
    * distinct (customer, supplier) pair observed in orders⋈lineitem,
    * materialized in both directions (so the bipartite walk mixes and
    * no node dangles). Node ids are prefixed ('c'/'s') because the two
    * key spaces overlap numerically.
    */
  def purchaseGraph(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val pairs = lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey").cast("string")).as("c"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("s"))
      .distinct()
    pairs.select(col("c").as("src"), col("s").as("dst"))
      .union(pairs.select(col("s").as("src"), col("c").as("dst")))
  }
}
