package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Components

/** Scaling probe for the large-star/small-star connected-components
  * operator on an adversarial edge set: many long chains (the
  * worst case for label propagation — diameter rounds — and the case
  * the O(log² n) star algorithm exists for) plus dense star clusters.
  *
  * Usage: CcScaleBench [nNodes] [hubDegree] — reads SPARK_GRAFT_CPUS
  * for the parallelism level; prints one JSON line with wall seconds
  * and edges/sec so two runs at different core counts give the
  * two-parallelism scaling evidence for this operator.
  *
  * `hubDegree` > 0 PLANTS A HUB: one extra node connected to that many
  * star members — the boilerplate mega-component case the degree-aware
  * hybrid exists for. A window-only formulation sorts the hub's whole
  * edge list (and, as the component converges, the component's) in
  * ONE task; the skew criterion is the hub run completing within ~2x
  * of the uniform run at the same size/cores.
  */
object CcScaleBench {
  def main(args: Array[String]): Unit = {
    val nNodes = args.lift(0).map(_.toLong).getOrElse(4000000L)
    val hubDegree = args.lift(1).map(_.toLong).getOrElse(0L)
    // full trailing blocks only: a remainder block holding just a chain
    // head / star hub has no edges, so it would appear in
    // expect_components but not in the CC output and the printed
    // self-validation would mismatch on a CORRECT run
    require(nNodes % 128 == 0, s"nNodes must be a multiple of 128, got $nNodes")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite)
      b.config("spark.local.dir", "/dev/shm/graft-local")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up (codegen, thread pools)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // chains of 64 over the even half of the id space; stars of 16
    // over the odd half — components of known size and count
    val chain = spark.range(nNodes / 2)
      .filter((col("id") + 1) % 64 =!= 0)
      .select((col("id") * 2).as("doc_a"), ((col("id") + 1) * 2).as("doc_b"))
    val star = spark.range(nNodes / 2)
      .filter(col("id") % 16 =!= 0)
      .select(((col("id") - col("id") % 16) * 2 + 1).as("doc_a"),
        (col("id") * 2 + 1).as("doc_b"))
    // planted hub: node 2*nNodes+1 linked to the first hubDegree odd
    // (star-half) members — merges ceil(hubDegree/16) star components
    // plus the hub into ONE mega component
    require(hubDegree <= nNodes / 2, "hubDegree exceeds the star half")
    val hubId = 2 * nNodes + 1
    val base = chain.unionByName(star)
    val edges =
      if (hubDegree == 0) base
      else base.unionByName(spark.range(hubDegree)
        .select(lit(hubId).as("doc_a"), (col("id") * 2 + 1).as("doc_b")))
    val nEdges = edges.count()

    val t0 = System.nanoTime()
    val cc = Components.connectedComponents(edges)
    // validation doubles as the timing action: every chain collapses to
    // its head, every star to its hub
    val stats = cc.agg(
      count(lit(1)).as("n"),
      countDistinct(col("component")).as("n_comp")).head()
    val wall = (System.nanoTime() - t0) / 1e9
    // hub merges ceil(hubDegree/16) stars (+ itself) into one component
    val mergedStars = (hubDegree + 15) / 16
    val expectComp = (nNodes / 2 + 63) / 64 + (nNodes / 2 + 15) / 16 -
      (if (hubDegree > 0) mergedStars - 1 else 0)
    println(
      s"""{"nodes":${stats.getLong(0)},"components":${stats.getLong(1)},""" +
      s""""expect_components":$expectComp,"edges":$nEdges,"cpus":$cpus,""" +
      s""""hub_degree":$hubDegree,"rounds":${Components.lastRounds},""" +
      f""""wall_sec":$wall%.2f,"edges_per_sec":${nEdges / wall}%.0f}""")
    spark.stop()
  }
}
