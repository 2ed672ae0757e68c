package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, NearDup, Similarity, TextOps}

/** Training-data pipeline operators: dedup family, similarity search,
  * text analysis, multimodal plumbing.
  */
class DataOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import scala.collection.JavaConverters._

  private def docsDf(rows: Seq[(Long, String)]) = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava, schema)
  }

  // deterministic word-soup corpus with planted near-duplicates
  private lazy val corpus: Seq[(Long, String)] = {
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigma", "tau", "upsilon")
    val rnd = new scala.util.Random(7)
    val base = (0L until 40L).map { i =>
      i -> Seq.fill(60)(words(rnd.nextInt(words.size))).mkString(" ")
    }
    // planted near-dups: copy of doc i with one word changed
    val dups = (0L until 8L).map { i =>
      val toks = base(i.toInt)._2.split(" ")
      toks(5) = "CHANGED"
      (100L + i) -> toks.mkString(" ")
    }
    // one exact duplicate
    base ++ dups :+ (200L -> base(3)._2)
  }

  test("minhash LSH finds planted near-duplicates with exact-jaccard precision") {
    val df = docsDf(corpus)
    val pairs = NearDup.minhashNearDups(df, "doc_id", "text",
      nShingle = 3, k = 32, bands = 8, threshold = 0.6).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    // all planted near-dups found (jaccard ~0.9)
    for (i <- 0L until 8L)
      assert(found.contains((i, 100L + i)), s"missed planted near-dup $i")
    // exact duplicate found with jaccard 1.0
    assert(pairs.exists(r => r.getLong(0) == 3L && r.getLong(1) == 200L &&
      r.getDouble(2) == 1.0))
    // precision: verify against brute-force jaccard for every reported pair
    val sh = df.select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    for (p <- pairs) {
      val j = sh(p.getLong(0)).intersect(sh(p.getLong(1))).size.toDouble /
        sh(p.getLong(0)).union(sh(p.getLong(1))).size
      assert(math.abs(j - p.getDouble(2)) < 1e-3, s"wrong jaccard for $p")
      assert(j >= 0.6)
    }
  }

  test("exact jaccard near-dup equals brute force; cap drops stop shingles") {
    val df = docsDf(corpus)
    val got = NearDup.jaccardNearDups(df, "doc_id", "text", threshold = 0.6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // brute-force ground truth over the same shingle sets
    val sh = df.select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val want = (for {
      a <- sh.keys; b <- sh.keys if a < b
      j = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
      if BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble >= 0.6
    } yield (a, b) -> j).toMap
    assert(got.keySet == want.keySet,
      s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
    for ((k, j) <- want) assert(math.abs(got(k) - j) < 1e-3, s"jaccard $k")
    // the exact path and the high-recall minhash path agree pair-for-pair
    val viaMinhash = NearDup.minhashNearDups(df, "doc_id", "text",
      k = 64, bands = 32, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaMinhash == got.keySet)
    // a tiny docfreq cap removes every common shingle -> no pairs survive
    val capped = NearDup.jaccardNearDups(df, "doc_id", "text",
      threshold = 0.6, maxDocFreq = 1)
    assert(capped.count() == 0)
  }

  test("jaccard stop-shingle cap preserves near-dup recall (cap vs uncapped)") {
    val df = docsDf(corpus)
    // the cap must actually fire for this test to mean anything
    val dfreqs = df.select(explode(TextOps.shingles(col("text"), 3)).as("s"),
        col("doc_id"))
      .distinct().groupBy("s").count().collect().map(_.getLong(1))
    val cap = 3
    assert(dfreqs.count(_ > cap) > 0,
      s"fixture has no shingle with df > $cap — cap never fires")
    val uncapped = NearDup.jaccardNearDups(df, "doc_id", "text",
      threshold = 0.6, maxDocFreq = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    NearDup.resetCapDropped() // earlier capped tests also fire the metric
    val capped = NearDup.jaccardNearDups(df, "doc_id", "text",
      threshold = 0.6, maxDocFreq = cap)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // true near-dups share mostly RARE shingles: dropping hot shingles
    // must not lose (or invent) any pair at this threshold
    assert(capped.keySet == uncapped,
      s"missing=${uncapped -- capped.keySet} extra=${capped.keySet -- uncapped}")
    // capped jaccard is the EXACT jaccard of the retained-vocabulary
    // shingle sets (sizes counted over capped postings, not a bound)
    val sh = df.select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val hot = df.select(explode(TextOps.shingles(col("text"), 3)).as("s"),
        col("doc_id")).distinct()
      .groupBy("s").count().filter(col("count") > cap)
      .collect().map(_.getLong(0)).toSet
    for (((a, b), j) <- capped) {
      val ra = sh(a) -- hot; val rb = sh(b) -- hot
      val want = ra.intersect(rb).size.toDouble / ra.union(rb).size
      assert(math.abs(j - want) < 1e-3, s"capped jaccard ($a,$b)")
    }
    // the capped run must be OBSERVABLE: the query-execution listener
    // surfaces how many hot shingles the cap actually dropped
    // (delivered async on the listener bus — spin briefly)
    val deadline = System.nanoTime() + 10_000_000_000L
    while (NearDup.lastCapDropped <= 0 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(NearDup.lastCapDropped == hot.size,
      s"observed dropped=${NearDup.lastCapDropped}, exact hot=${hot.size}")
  }

  test("incremental dedup: cross-side pairs equal the full run's cross subset") {
    val df = docsDf(corpus)
    val cut = 10L
    val base = df.filter(col("doc_id") < cut)
    val inc = df.filter(col("doc_id") >= cut)
    val got = NearDup.jaccardNearDupsAgainst(base, inc, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // oracle: the full-corpus exact run restricted to cross pairs
    val full = NearDup.jaccardNearDups(df, "doc_id", "text", threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .filter { case ((a, b), _) => a < cut && b >= cut }.toMap
    assert(got == full, s"missing=${full.keySet -- got.keySet} " +
      s"extra=${got.keySet -- full.keySet}")
    assert(got.nonEmpty, "fixture has no cross-side near-dups")
    // same-side pairs exist in the full run and are correctly absent
    // from the incremental result
    val sameSide = NearDup.jaccardNearDups(df, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filterNot { case (a, b) => a < cut && b >= cut }
    assert(sameSide.nonEmpty, "fixture has no same-side near-dups")
    assert(sameSide.forall(p => !got.contains(p)))
  }

  test("CMS hot-shingle sketch: superset of exact hot set, recall preserved") {
    val df = docsDf(corpus)
    val cap = 3
    // exact hot set (ground truth): shingles with doc frequency > cap
    val exactHot = df.select(explode(TextOps.shingles(col("text"), 3)).as("s"))
      .groupBy("s").count().filter(col("count") > cap)
      .collect().map(_.getLong(0)).toSet
    assert(exactHot.nonEmpty, "fixture has no hot shingles")
    val sketched = NearDup.hotShinglesSketch(df, "doc_id", "text",
      maxDocFreq = cap)
    // CMS never undercounts: every truly hot shingle must be detected
    assert(exactHot.subsetOf(sketched),
      s"sketch missed hot shingles: ${exactHot -- sketched}")
    // and capping with the sketch set keeps every near-dup pair the
    // exact doc-frequency cap finds
    val viaSketch = NearDup.jaccardNearDups(df, "doc_id", "text",
        threshold = 0.6, stopShingles = sketched)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaExact = NearDup.jaccardNearDups(df, "doc_id", "text",
        threshold = 0.6, maxDocFreq = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSketch == viaExact,
      s"missing=${viaExact -- viaSketch} extra=${viaSketch -- viaExact}")
  }

  test("embedding-cosine near-dup finds planted dups; agrees with brute force") {
    // long docs so a one-token change stays a HIGH-cosine near-dup in
    // shingle-feature space (3 of ~22 shingles differ -> cos ≈ 0.86)
    def soup(i: Long, last: String) =
      (0 until 23).map(j => s"w${(i * 31 + j * j) % 97}").mkString(" ") + " " + last
    val docs = docsDf((0L until 60L).map { i =>
      val text = if (i >= 40 && i < 50) soup(i - 40, "CHANGED")
      else soup(i, s"tail$i")
      (i, text)
    })
    val emb = docs.select(col("doc_id"),
      TextOps.hashEmbedding(col("text"), 64).as("vec"))
    val got = NearDup.embeddingNearDups(emb, "doc_id", "vec", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth over the same quantized cosine
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def qcos(a: Seq[Float], b: Seq[Float]): Double = {
      def qd(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).map { case (p, q) =>
          math.round(p.toDouble * 1000) * math.round(q.toDouble * 1000) }.sum
      qd(a, b).toDouble / math.sqrt((qd(a, a) * qd(b, b)).toDouble)
    }
    val want = (for {
      a <- vecs.keys; b <- vecs.keys if a < b
      if BigDecimal(qcos(vecs(a), vecs(b))).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.8
    } yield (a, b)).toSet
    assert(want.nonEmpty, "fixture must contain planted near-dup pairs")
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // planted pairs are found
    for (i <- 40L until 50L) assert(got.contains((i - 40, i)), s"pair ${i - 40}/$i")
  }

  test("dedupKeepFirst drops the larger-id member of each near-dup pair") {
    val df = docsDf(corpus)
    val pairs = NearDup.minhashNearDups(df, "doc_id", "text", threshold = 0.6)
    val kept = NearDup.dedupKeepFirst(df, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    for (i <- 0L until 8L) {
      assert(kept.contains(i)); assert(!kept.contains(100L + i))
    }
    assert(!kept.contains(200L))
  }

  test("simhash: identical -> 0 hamming; perturbed -> small hamming; banding finds them") {
    val df = docsDf(corpus)
    val sigs = df.select(col("doc_id"), NearDup.simhash64(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(3L) == sigs(200L)) // exact dup -> identical signature
    for (i <- 0L until 8L) {
      val d = java.lang.Long.bitCount(sigs(i) ^ sigs(100L + i))
      assert(d <= 6, s"perturbed doc $i drifted $d bits")
    }
    val near = NearDup.simhashNearDups(df, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.contains((3L, 200L)))
  }

  test("brute-force cosine top-k matches naive computation") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val got = Similarity.bruteTopK(emb, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    // naive ground truth
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val want = for {
      (qid, qv) <- all.filter(_._1 < 5)
      scored = all.filter(_._1 != qid)
        .map { case (id, v) => (id, BigDecimal(cos(qv, v)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (id, c) => (-c, id) }.take(5)
      ((id, _), i) <- scored.zipWithIndex
    } yield (qid, i + 1, id)
    assert(got == want.toSet)
  }

  test("LSH ANN achieves usable recall against brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(emb, queries, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // weakly-clustered synthetic embeddings: use coarse buckets (4 bits
    // -> ~1/16 corpus per bucket x 8 tables) for usable recall; real
    // corpora with cluster structure support finer signatures
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      k = 10, nBits = 4, nTables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("IVF ANN beats LSH recall at similar probe cost") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(emb, queries, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 10, nCentroids = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall too low: $recall")
  }

  test("semdedup: in-cell duplicates dropped keep-first; cap is observable") {
    import spark.implicits._
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    // identical vectors ALWAYS share a cell (nearest centroid is a
    // pure function of the vector) and every cross-group cosine is
    // below tau — so these assertions hold for ANY k-means outcome
    val rows = Seq(
      (10L, v(1, 0, 0, 0)), (11L, v(1, 0, 0, 0)), (12L, v(1, 0, 0, 0)),
      (13L, v(1, 0.5, 0, 0)), (14L, v(1, -0.5, 0, 0)),
      (20L, v(0, 0, 1, 0)), (21L, v(0, 0, 1, 0)), (22L, v(0, 0, 1, -0.7)))
    val emb = rows.toDF("doc_id", "vec")
    val cells = Similarity.semDedupCells(emb, "doc_id", "vec",
      nClusters = 2, maxFitRows = 100)
    val verdict = Similarity.semDedupVerdicts(
        cells, emb, "doc_id", "vec", tau = 0.95)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(verdict(10L) == ((false, 0L, true)))
    assert(verdict(11L) == ((false, 1L, false)))
    assert(verdict(12L) == ((false, 2L, false)))
    assert(verdict(20L) == ((false, 0L, true)))
    assert(verdict(21L) == ((false, 1L, false)))
    assert(verdict(13L)._3 && verdict(14L)._3 && verdict(22L)._3)
    // determinism: same cells + repartitioned corpus = same verdicts
    val again = Similarity.semDedupVerdicts(
        cells, emb.repartition(5), "doc_id", "vec", tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).toSet
    assert(again ==
      verdict.map { case (id, (_, n, k)) => (id, n, k) }.toSet)
    // cap: the identical trio's cell has >= 3 members, so maxCell=2
    // routes it around pairing — its docs are all kept and MARKED
    val capped = Similarity.semDedupVerdicts(
        cells, emb, "doc_id", "vec", tau = 0.95, maxCell = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getBoolean(4)))).toMap
    Seq(10L, 11L, 12L).foreach { id =>
      assert(capped(id) == ((true, true)), s"doc $id: ${capped(id)}")
    }
  }

  test("pca: deterministic fit, orthonormal rotation, variance-ordered components") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = graft.operators.Pca.fit(emb, "embedding", dim = 64, k = 8)
    // partitioning independence: the integer-moment fit must be
    // BIT-identical on a rebucketed input
    val m2 = graft.operators.Pca.fit(
      emb.repartition(7), "embedding", dim = 64, k = 8)
    assert(m.mbar.toSeq == m2.mbar.toSeq)
    assert(m.rotQ.map(_.toSeq).toSeq == m2.rotQ.map(_.toSeq).toSeq)
    // rotation rows orthonormal (within quantization tolerance)
    val r = m.rotQ.map(_.map(_.toDouble / m.wScale))
    for (a <- 0 until 8; b <- a until 8) {
      val dot = (0 until 64).map(i => r(a)(i) * r(b)(i)).sum
      if (a == b) assert(math.abs(dot - 1.0) < 1e-3, s"|r$a|² = $dot")
      else assert(math.abs(dot) < 1e-3, s"r${a}.r$b = $dot")
    }
    // eigenvalues descending, all non-negative (covariance is PSD)
    assert(m.eigvals.toSeq == m.eigvals.sorted(Ordering[Double].reverse).toSeq)
    assert(m.eigvals.forall(_ >= -1e-6))
    // projected component variances: descending, and comp 0 beats the
    // best single raw axis (PCA optimality vs the axis-aligned basis)
    val proj = emb.select(
        graft.operators.Pca.project(spark, col("embedding"), m).as("y"))
      .collect().map(_.getSeq[Long](0).toArray)
    val n = proj.length
    def variance(xs: Array[Double]): Double = {
      val mu = xs.sum / n
      xs.map(x => (x - mu) * (x - mu)).sum / n
    }
    val compVar = (0 until 8).map(c =>
      variance(proj.map(_(c).toDouble / (m.scale.toDouble * m.wScale))))
    assert(compVar.zip(compVar.tail).forall { case (a, b) => a >= b - 1e-12 },
      s"component variances not descending: $compVar")
    val rawVar = (0 until 64).map { i =>
      val xs = emb.select(col("embedding")).collect()
        .map(_.getSeq[Float](0)(i).toDouble)
      variance(xs)
    }
    assert(compVar.head >= rawVar.max - 1e-9,
      s"comp0 var ${compVar.head} < best raw axis ${rawVar.max}")
    // the native projection matches a driver-side replay exactly
    val one = emb.orderBy(col("vec_id")).limit(1)
      .select(col("embedding")).collect().head.getSeq[Float](0).toArray
    val q = one.map { f =>
      val v = f.toDouble * 1000
      if (v >= 0) math.round(v) else -math.round(-v)
    }
    val want = (0 until 8).map(c =>
      (0 until 64).map(i => (q(i) - m.mbar(i)) * m.rotQ(c)(i)).sum)
    val got = emb.orderBy(col("vec_id")).limit(1)
      .select(graft.operators.Pca.project(spark, col("embedding"), m))
      .collect().head.getSeq[Long](0)
    assert(got == want, s"native $got != replay $want")
  }

  test("quality features and langId behave on handcrafted text") {
    val df = docsDf(Seq(
      1L -> "The quick brown fox jumps over the lazy dog and it is fine",
      2L -> "der hund und die katze sind nicht mit der maus zu hause",
      3L -> "le chat est dans la maison et il est pour les amis",
      4L -> "el perro y el gato no son para la casa una vez",
      5L -> "!!! ??? ### 123 456 789 $$$ %%%"))
    val got = df.select(col("doc_id"), TextOps.langId(col("text")).as("lang"),
      TextOps.qualityScore(col("text")).as("q")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got(1L)._1 == "en"); assert(got(2L)._1 == "de")
    assert(got(3L)._1 == "fr"); assert(got(4L)._1 == "es")
    assert(got(5L)._1 == "und")
    assert(got(1L)._2 > got(5L)._2, "noise should score below clean text")
  }

  test("documentStats facade joins all text features per doc") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val stats = TextOps.documentStats(docs)
    assert(stats.count() == docs.count())
    val cols = stats.columns.toSet
    for (c <- Seq("n_tokens", "quality", "lang_pred", "fp_md5", "n_bpe_tokens"))
      assert(cols.contains(c), s"missing $c")
  }

  test("multimodal plumbing: decode, features, frame sampling") {
    val media = Multimodal.mediaTable(spark, 60)
    val meta = Multimodal.decode(media).collect()
    assert(meta.length == 60)
    // real BMP decode: generator dims are 8..31 x 8..31, single frame
    assert(meta.filter(_.kind == "image").forall(m =>
      m.width >= 8 && m.width < 32 && m.height >= 8 && m.height < 32 &&
        m.n_frames == 1))
    // real WAV decode: 8 kHz, 1-2 channels, 128..383 frames
    assert(meta.filter(_.kind == "audio").forall(m =>
      m.width == 8000 && m.height >= 1 && m.height <= 2 &&
        m.n_frames >= 128 && m.n_frames < 384))
    assert(meta.filter(_.kind == "video").forall(m =>
      m.width >= 16 && m.height >= 16 && m.n_frames >= 1))

    val feats = Multimodal.features(media)
    assert(feats.count() == 60)
    assert(feats.select(size(col("embedding"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(8))

    val frames = Multimodal.sampleFrames(media, stride = 5)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val videos = meta.filter(_.kind == "video")
    assert(byId.keySet == videos.map(_.media_id).toSet)
    for (v <- videos)
      assert(byId(v.media_id) == (v.n_frames + 4) / 5,
        s"frame count mismatch for ${v.media_id}")

    // determinism probe: same id -> same payload bytes
    assert(java.util.Arrays.equals(
      Multimodal.syntheticImage(7), Multimodal.syntheticImage(7)))
    assert(java.util.Arrays.equals(
      Multimodal.syntheticVideo(7), Multimodal.syntheticVideo(7)))
  }

  test("Gopher rules: each rule fires on its crafted violator, clean prose passes") {
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ")
    val rows = Seq(
      (0L, s"the cat sat and that dog went to bed $fifty"),  // clean: keep
      (1L, "too short to have the length"),                  // word count
      (2L, ("the of and " * 20) + ("# " * 20).trim),         // symbol ratio
      (3L, ("the of and x " * 15).trim.replace(" ", "\n- ")),// bullet lines
      (4L, ("the of and x " * 15).trim.replace(" ", "...\n")),// ellipsis lines
      (5L, ("1 2 3 4 5 6 7 8 9 0 " * 6) + "the of"),         // alpha fraction
      (6L, fifty + " " + fifty))                             // no stop hits
    val got = docsDf(rows)
      .select(col("doc_id") +:
        TextOps.gopherRules(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(0L).getAs[Boolean]("gopher_keep"), "clean doc must pass")
    for (d <- 1L to 6L)
      assert(!got(d).getAs[Boolean]("gopher_keep"), s"violator $d passed")
    // the INTENDED rule is the one that fired (not just any)
    assert(got(1L).getAs[Int]("n_words") < 50)
    assert(got(2L).getAs[Double]("symbol_ratio") > 0.1)
    assert(got(3L).getAs[Double]("bullet_frac") > 0.9)
    assert(got(4L).getAs[Double]("ellipsis_frac") > 0.3)
    assert(got(5L).getAs[Double]("alpha_frac") < 0.8)
    assert(got(6L).getAs[Int]("n_stop_hits") < 2)
  }

  test("paragraph dedup: global first arrival, in-doc repeats, order preserved") {
    val rows = Seq(
      (1L, "alpha\nSHARED FOOTER\nbeta\nbeta"),
      (2L, "SHARED FOOTER\ngamma"),
      (3L, "SHARED FOOTER"))
    val got = TextOps.dedupParagraphs(docsDf(rows), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "alpha\nSHARED FOOTER\nbeta", // first arrival keeps; in-doc repeat dropped
      2L -> "gamma",                      // footer seen at (1, pos 1)
      3L -> ""), got.toString)            // everything seen -> empty, row kept
    // determinism across partitioning (min-aggregated first arrival,
    // not an arrival-order race)
    val again = TextOps.dedupParagraphs(
        docsDf(rows).repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == got)
  }

  // per-id-seeded word soup: deterministic, pairwise dissimilar docs
  private def wordRows(ids: Seq[Long]): Seq[(Long, String)] = {
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigma", "tau", "upsilon")
    ids.map { i =>
      val rnd = new scala.util.Random(1000L + i)
      i -> Seq.fill(60)(words(rnd.nextInt(words.size))).mkString(" ")
    }
  }
  private def wordDocs(ids: Seq[Long]) = docsDf(wordRows(ids))

  test("in-doc line dedup: repeats dropped, order kept, docs independent") {
    import spark.implicits._
    val df = Seq(
      (0L, "a\nb\na\nc\nb"),
      (1L, "a\na"), // same line as doc 0 — scopes must not interact
      (2L, ""),
      (3L, "x"))
      .toDF("doc_id", "text")
    val got = TextOps.dedupLinesInDoc(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "a\nb\nc")
    assert(got(1L) == "a")
    assert(got(2L) == "")
    assert(got(3L) == "x")
    val re = TextOps.dedupLinesInDoc(df.repartition(3), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(re == got)
  }

  test("incremental crawl round-trip: dedup-against-base + incremental CC == full recompute") {
    // the production crawl shape end-to-end: a base corpus is already
    // deduped and committed; a new crawl batch is near-dup'd AGAINST
    // the base (never re-pairing base×base), its pairs fold into the
    // base component assignment incrementally, and only new canonical
    // docs append as the next snapshot. The invariant: the table
    // after the increment equals a from-scratch dedup of the full
    // corpus.
    // SCOPE of the pinned invariant: the append-only canonical recipe
    // below holds when no increment doc BRIDGES two distinct base
    // components (a bridge makes the full recompute demote one of two
    // already-committed base canonicals — that needs a snapshot
    // rewrite, not an append; the assignment from
    // incrementalComponents is still correct either way). The fixture
    // asserts it exercises real base components without a bridge.
    import graft.operators.Components
    import graft.plans.IcebergLikeTable
    val base = wordDocs(0L until 40L)
      // base-internal near-dups: the base assignment must be
      // NON-empty so the star-edge fold-in is actually exercised
      .unionByName(docsDf(wordRows(0L until 3L)
        .map { case (id, t) => (id + 50L, t + " x") }))
    // increment: genuinely new docs + near-dups of base docs + a
    // near-dup pair within the increment itself
    val fresh = wordDocs(200L until 220L)
    val dupOfBase = docsDf(wordRows(5L until 9L)
      .map { case (id, t) => (id + 300L, t + " tail") })
    val pairIn = docsDf(Seq(
      (400L, "completely novel increment text about spark shuffles"),
      (401L, "completely novel increment text about spark shuffles ok")))
    val increment = fresh.unionByName(dupOfBase).unionByName(pairIn)

    def pairs(a: org.apache.spark.sql.DataFrame) =
      NearDup.jaccardNearDups(a, "doc_id", "text", nShingle = 3, threshold = 0.5)
    def pairsAgainst(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      NearDup.jaccardNearDupsAgainst(a, b, "doc_id", "text",
        nShingle = 3, threshold = 0.5)

    // base state: assignment + canonical base table (snapshot 1)
    val basePairs = pairs(base)
    assert(basePairs.count() > 0,
      "fixture must produce base components or the fold-in is vacuous")
    val baseAssign = Components.connectedComponents(basePairs)
    val baseKeep = Components.dedupByComponent(base, "doc_id", basePairs)
    val dir = java.nio.file.Files.createTempDirectory("crawlrt").toString
    val table = new IcebergLikeTable(dir, Nil)
    table.replacePartitions(baseKeep, 1L)

    // increment: cross pairs + within-increment pairs, folded in
    val newPairs = pairsAgainst(base, increment)
      .unionByName(pairs(increment))
      .select(col("doc_a"), col("doc_b"))
    // fixture property backing the scope note above: no increment doc
    // links two distinct base components
    val bridges = pairsAgainst(base, increment)
      .join(baseAssign.select(col("node").as("doc_a_"), col("component")),
        col("doc_a") === col("doc_a_"), "left")
      .select(col("doc_b"), coalesce(col("component"), col("doc_a")).as("comp"))
      .groupBy(col("doc_b")).agg(countDistinct(col("comp")).as("n"))
      .filter(col("n") > 1).count()
    assert(bridges == 0, "fixture bridges base components — outside the recipe's scope")
    val merged = Components.incrementalComponents(baseAssign, newPairs)
    // canonical = component minimum; append increment docs that ARE
    // their component's canonical (untouched increment docs keep
    // themselves)
    val incKeep = increment.join(
      merged.filter(col("node") =!= col("component"))
        .select(col("node").as("doc_id")), Seq("doc_id"), "left_anti")
    table.replacePartitions(incKeep, 2L)

    val got = table.read(spark).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // from-scratch recompute over the full corpus
    val all = base.unionByName(increment)
    val want = Components.dedupByComponent(all, "doc_id", pairs(all))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want,
      s"incremental table diverged from full recompute:\n  only-inc ${got -- want}\n  only-full ${want -- got}")
    // sanity: the increment actually exercised all three shapes
    assert((200L until 220L).forall(got), "fresh docs missing")
    assert((305L until 309L).forall(id => !got(id)), "base near-dups kept")
    assert(got(400L) && !got(401L), "within-increment pair not resolved")
    Components.releaseAll(); NearDup.unpersistAll()
  }

  test("duplicate spans: cross-document repeat found exactly, merged maximal") {
    // a 10-token passage planted verbatim inside two otherwise-unique
    // docs: with k=4, all 7 of its k-windows collide and the
    // gaps-and-islands merge must return ONE span covering exactly the
    // planted range in each doc (paper semantics: repeats >= k exact)
    val passage = "one two three four five six seven eight nine ten"
    val rows = Seq(
      1L -> s"aa bb cc $passage dd ee",
      2L -> s"xx $passage yy zz ww",
      3L -> "qq rr ss tt uu vv")
    val got = operators.SpanDedup.duplicateSpans(docsDf(rows), "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: passage at token idx 3..13; doc 2: idx 1..11
    assert(got == Set((1L, 3L, 13L), (2L, 1L, 11L)), s"got $got")
  }

  test("duplicate spans: repeats shorter than k invisible; within-doc repeats count") {
    val rows = Seq(
      1L -> "red blue green aa bb cc dd red blue green", // 3-token repeat < k=4
      2L -> "p q r s TAIL p q r s HEAD p q r s")         // 4-token within-doc x3
    val got = operators.SpanDedup.duplicateSpans(docsDf(rows), "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1 emits nothing; doc 2's three "p q r s" occurrences (idx 0,5,10)
    // are separate islands (gap 5 > k=4)
    assert(got == Set((2L, 0L, 4L), (2L, 5L, 9L), (2L, 10L, 14L)), s"got $got")
  }

  test("duplicate span stats: one row per doc, partitioning-independent") {
    val passage = "w1 w2 w3 w4 w5 w6"
    val rows = Seq(
      1L -> s"$passage left right up down",
      2L -> s"noise $passage more noise here",
      3L -> "totally unique words only appear here once")
    val stats = operators.SpanDedup.duplicateSpanStats(
        docsDf(rows), "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(stats == Set((1L, 10L, 6L, 1L), (2L, 10L, 6L, 1L), (3L, 7L, 0L, 0L)),
      s"got $stats")
    val repart = operators.SpanDedup.duplicateSpanStats(
        docsDf(rows).repartition(7), "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(repart == stats, "stats changed under repartition")
  }

  test("native window_hashes spans == columnar transform/slice spans") {
    // same positions from both window derivations (hash VALUES are
    // engine-internal and deliberately differ; the contract is spans)
    val df = docsDf(corpus)
    val native = operators.SpanDedup.duplicateSpans(df, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val columnar = operators.SpanDedup.duplicateSpansColumnar(df, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native == columnar,
      s"only-native ${native -- columnar}, only-columnar ${columnar -- native}")
    assert(native.nonEmpty, "fixture produced no spans — parity test is vacuous")
  }

  test("span removal: duplicated range deleted, unique flanks survive, idempotent") {
    val passage = "one two three four five six seven eight nine ten"
    val rows = Seq(
      1L -> s"aa bb cc $passage dd ee",
      2L -> s"xx $passage yy zz ww",
      3L -> passage,                      // fully duplicated doc
      4L -> "qq rr ss tt uu vv")
    val got = operators.SpanDedup.removeDuplicateSpans(docsDf(rows), "doc_id", "text", k = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == (("aa bb cc dd ee", 15L, 10L)), got(1L))
    assert(got(2L) == (("xx yy zz ww", 14L, 10L)), got(2L))
    assert(got(3L) == (("", 10L, 10L)), got(3L))
    assert(got(4L) == (("qq rr ss tt uu vv", 6L, 0L)), got(4L))
    // idempotence: a second pass over the cleaned corpus removes nothing
    val clean = got.toSeq.map { case (id, (t, _, _)) => id -> t }
    val again = operators.SpanDedup.removeDuplicateSpans(
        docsDf(clean), "doc_id", "text", k = 4)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(again.forall(_._3 == 0L), s"second pass removed tokens: ${again.toSeq}")
    assert(again.map(t => t._1 -> t._2).toMap == clean.toMap,
      "second pass changed text")
  }

  test("HLL vocabulary estimate tracks the exact two-phase distinct") {
    // the q48 scale path: approx_count_distinct is one mergeable-sketch
    // pass (no second shuffle stage); it must stay within its error
    // bound of the exact aggregate the oracle checks
    val tok = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
    val exact = tok.agg(countDistinct(col("token"))).head().getLong(0)
    val approx = tok.agg(approx_count_distinct(col("token"), rsd = 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact drifted beyond 5%")
  }
}
