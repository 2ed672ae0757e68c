package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Components, NearDup}

/** Connected components over near-dup pairs (large-star/small-star). */
class ComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pairsDf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("doc_a", "doc_b")
  }

  private def ccMap(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(pairsDf(pairs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference union-find over the same pairs. */
  private def bruteCc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain collapses to its minimum (transitive, not just greedy)") {
    // 1-2, 2-3, 3-4: nodes 2,3,4 all map to 1 even though (1,3),(1,4)
    // were never pairs
    val m = ccMap(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("separate components keep separate minima") {
    val m = ccMap(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L)))
    assert(m(10L) == 10L && m(11L) == 10L && m(12L) == 10L)
    assert(m(20L) == 20L && m(21L) == 20L)
    assert(m(30L) == 30L && m(31L) == 30L)
  }

  test("long path converges within the O(log^2 n) round budget") {
    // a 200-node path is the adversarial case for label propagation
    // (needs 200 rounds); the star algorithm must finish in maxIter=25
    val path = (0L until 199L).map(i => (i, i + 1))
    val m = ccMap(path)
    assert(m.size == 200 && m.values.forall(_ == 0L))
  }

  test("matches brute-force union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 50 + trial * 30
      val pairs = Seq.fill(n)(
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(p => p._1 != p._2)
      assert(ccMap(pairs) == bruteCc(pairs), s"trial $trial diverged")
    }
  }

  test("hybrid star passes emit the same edge set as the window forms") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val pairs = Seq.fill(150)(
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(p => p._1 != p._2)
      val edges = pairsDf(pairs)
        .select(greatest(col("doc_a"), col("doc_b")).as("u"),
          least(col("doc_a"), col("doc_b")).as("v"))
        .distinct()
      // force EVERY key hot (threshold 0 via an explicit probe at 1)
      val hot = Components.roundHotKeys(edges, 1L)
      assert(hot.nonEmpty, "probe found no hot keys at threshold 1")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(canon(Components.smallStarHybrid(
          Components.largeStarHybrid(edges, hot), hot)) ==
        canon(Components.smallStar(Components.largeStar(edges))),
        s"trial $trial: hybrid round diverged from window round")
      // partial hot set too (only some keys routed)
      val some = hot.take(hot.size / 2)
      if (some.nonEmpty)
        assert(canon(Components.smallStarHybrid(
            Components.largeStarHybrid(edges, some), some)) ==
          canon(Components.smallStar(Components.largeStar(edges))),
          s"trial $trial: partial-hot round diverged")
    }
  }

  test("skew-routed connectedComponents matches union-find (forced threshold + planted hub)") {
    val rnd = new scala.util.Random(11)
    // random graph with every-key-hot routing
    for (trial <- 0 until 3) {
      val pairs = Seq.fill(120)(
        (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
        .filter(p => p._1 != p._2)
      val got = Components.connectedComponents(pairsDf(pairs),
          hotDegreeThreshold = 1L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == bruteCc(pairs), s"trial $trial diverged under forced hot routing")
    }
    // planted hub: one node linked to 500 others plus chain debris —
    // the hub is genuinely hot at threshold 64
    val hub = (1L to 500L).map(i => (1000000L, 1000000L + i))
    val chains = (0L until 99L).map(i => (i, i + 1))
    val all = hub ++ chains
    val got = Components.connectedComponents(pairsDf(all),
        hotDegreeThreshold = 64L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bruteCc(all), "planted-hub graph diverged")
    assert(got(1000000L + 500L) == 1000000L)
  }

  test("incremental components equal a full recompute on random splits") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 4) {
      val pairs = Seq.fill(140)(
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(p => p._1 != p._2)
      // base = pairs wholly under the split point; increment = rest
      val split = 20 + trial * 10
      val (base, inc) = pairs.partition(p => p._1 < split && p._2 < split)
      val baseAssign = Components.connectedComponents(pairsDf(base))
      val got = Components.incrementalComponents(baseAssign, pairsDf(inc))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = bruteCc(pairs)
      // every paired node is reachable from the star edges or the
      // increment, so the incremental result must equal the full
      // recompute exactly
      assert(got == want, s"trial $trial: incremental diverged from full CC")
      Components.releaseAll()
    }
  }

  test("componentsForDocs covers untouched docs as singletons") {
    import spark.implicits._
    val docs = (0L until 10L).toDF("doc_id")
    val got = Components.componentsForDocs(
        docs, "doc_id", pairsDf(Seq((2L, 5L), (5L, 7L))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L,
      5L -> 2L, 6L -> 6L, 7L -> 2L, 8L -> 8L, 9L -> 9L))
  }

  test("dedupByComponent keeps exactly the component minimum") {
    import spark.implicits._
    val docs = (1L to 4L).toDF("doc_id")
    val chain = pairsDf(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    val kept = Components.dedupByComponent(docs, "doc_id", chain)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("componentsForDocs lets callers keep a representative that greedy dedup loses") {
    import spark.implicits._
    // docs {2,3} with pairs (1,2),(2,3) — doc 1 was filtered upstream.
    // Greedy dedup drops every doc_b, losing the WHOLE cluster; the
    // component id lets callers min_by over the docs actually present.
    val present = Seq(2L, 3L).toDF("doc_id")
    val pairs = pairsDf(Seq((1L, 2L), (2L, 3L)))
    val greedyKept = NearDup.dedupKeepFirst(present, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(greedyKept.isEmpty)
    val byComp = Components.componentsForDocs(present, "doc_id", pairs)
      .groupBy(col("component")).agg(min(col("doc_id")).as("keep"))
      .collect().map(_.getLong(1)).toSet
    assert(byComp == Set(2L))
  }

  test("already-converged star input is stable after one round") {
    val m = ccMap(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }
}
