package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relevance, Sampling, TextOps}

/** Curation operators: deterministic sampling, relevance scoring,
  * repetition signals, PII scrubbing.
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---------------- deterministic sampling ----------------

  test("rate thresholds are the uint32 images of the rates") {
    assert(Sampling.rateThreshold(0.0) == "00000000")
    assert(Sampling.rateThreshold(0.25) == "40000000")
    assert(Sampling.rateThreshold(0.5) == "80000000")
    assert(Sampling.rateThreshold(1.0) == "g")
    // a rate that ROUNDS to 2^32 must keep-all, not format nine hex
    // digits (which would lexicographically keep nothing)
    assert(Sampling.rateThreshold(0.9999999999) == "g")
    assert(Sampling.rateThreshold(0.999999) == "ffffef39")
    assertThrows[IllegalArgumentException](Sampling.rateThreshold(1.5))
  }

  test("hash sample is deterministic, partitioning-independent, and nested") {
    import spark.implicits._
    val ids = (0L until 4000L).toDF("id")
    val k20 = Sampling.sample(ids, "id", 0.2, "s").collect().map(_.getLong(0)).toSet
    // same rows regardless of partitioning
    val k20b = Sampling.sample(ids.repartition(13), "id", 0.2, "s")
      .collect().map(_.getLong(0)).toSet
    assert(k20 == k20b)
    // a lower-rate sample with the same salt is a SUBSET (nested samples)
    val k10 = Sampling.sample(ids, "id", 0.1, "s").collect().map(_.getLong(0)).toSet
    assert(k10.subsetOf(k20))
    // rates are honored within binomial noise (4000 draws, ±4 sigma)
    assert(math.abs(k20.size - 800) < 4 * math.sqrt(4000 * 0.2 * 0.8))
    assert(math.abs(k10.size - 400) < 4 * math.sqrt(4000 * 0.1 * 0.9))
    // a different salt is an independent draw, not the same subset
    val other = Sampling.sample(ids, "id", 0.2, "t").collect().map(_.getLong(0)).toSet
    assert(other != k20)
    // boundary rates
    assert(Sampling.sample(ids, "id", 0.0, "s").count() == 0)
    assert(Sampling.sample(ids, "id", 1.0, "s").count() == 4000)
  }

  test("stratified sample applies per-stratum rates") {
    import spark.implicits._
    val df = (0L until 3000L).map(i => (i, if (i % 3 == 0) "head" else "tail"))
      .toDF("id", "stratum")
    val kept = Sampling.stratifiedSample(df, "id", "stratum",
      rates = Map("head" -> 0.1), defaultRate = 0.9, salt = "s")
    val byStratum = kept.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byStratum("head") - 100) < 4 * math.sqrt(1000 * 0.1 * 0.9))
    assert(math.abs(byStratum("tail") - 1800) < 4 * math.sqrt(2000 * 0.9 * 0.1))
    // per-row membership matches the single-rate sampler for its stratum
    val headKept = kept.filter(col("stratum") === "head")
      .collect().map(_.getLong(0)).toSet
    val expect = Sampling.sample(df.filter(col("stratum") === "head"),
      "id", 0.1, "s").collect().map(_.getLong(0)).toSet
    assert(headKept == expect)
  }

  test("exact-count stratified sample: n per stratum, partitioning-independent, nested") {
    import spark.implicits._
    val df = (0L until 3000L).map(i =>
      (i, if (i % 3 == 0) "head" else "tail")).toDF("id", "stratum")
    val got = Sampling.sampleExactPerStratum(df, "id", "stratum", n = 50, salt = "s")
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(got.count(_._1 == "head") == 50 && got.count(_._1 == "tail") == 50)
    // partitioning independence
    val again = Sampling.sampleExactPerStratum(
      df.repartition(13), "id", "stratum", n = 50, salt = "s")
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(again.toSet == got.toSet)
    // nesting: the 20-row sample is a prefix of the 50-row sample
    val smaller = Sampling.sampleExactPerStratum(df, "id", "stratum", n = 20, salt = "s")
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(smaller.subsetOf(got.toSet))
    // undersized stratum: all rows kept
    val tiny = df.filter(col("id") < 9)
    assert(Sampling.sampleExactPerStratum(tiny, "id", "stratum", 50, "s")
      .count() == 9)
  }

  // ---------------- corpus mixing ----------------

  test("mixing rates: exact quotient, over-ask clamps, no-target dropped") {
    import spark.implicits._
    // src a: 4 docs x 5 tokens = 20; src b: 2 docs x 3 tokens = 6
    val docs = ((0L until 4L).map(i => (i, "a", "t t t t t")) ++
      (4L until 6L).map(i => (i, "b", "t t t"))).toDF("id", "source", "text")
    val rates = operators.Mixing.mixingRates(docs, "source", "text",
      Map("a" -> 10L, "b" -> 100L, "ghost" -> 5L))
    assert(rates.keySet == Set("a", "b"), "ghost source must not get a rate")
    assert(rates("a")._1 == 0.5 && rates("a")._2 == 2147483648L)
    assert(rates("b")._1 == 1.0 && rates("b")._2 == 4294967296L)
  }

  test("mix to token budget: deterministic, near-target, recipe-complete") {
    import spark.implicits._
    val docs = (0L until 3000L)
      .map(i => (i, s"src${i % 3}", "w w w w w w w w w w")) // 10 tok/doc
      .toDF("id", "source", "text")
    val targets = Map("src0" -> 2000L, "src1" -> 20000L) // src2: no target
    val kept = operators.Mixing.mixToTokenBudget(
      docs, "id", "source", "text", targets, salt = "m")
    val ids = kept.collect().map(_.getLong(0)).toSet
    // partitioning-independent
    val again = operators.Mixing.mixToTokenBudget(
      docs.repartition(13), "id", "source", "text", targets, salt = "m")
      .collect().map(_.getLong(0)).toSet
    assert(again == ids)
    val bySource = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // src0: 1000 docs x 10 tokens, target 2000 => rate 0.2
    assert(math.abs(bySource("src0") - 200) < 4 * math.sqrt(1000 * 0.2 * 0.8))
    // src1 over-asks: everything kept
    assert(bySource("src1") == 1000)
    // src2 has no target: dropped entirely
    assert(!bySource.contains("src2"))
    // raising a target with the same salt only ADDS docs (nested mixes)
    val more = operators.Mixing.mixToTokenBudget(docs, "id", "source", "text",
      targets.updated("src0", 4000L), salt = "m")
      .collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(more))
  }

  test("blocklist filter: token-exact after edge strip, no substring hits") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Class assignments pass here"),     // substrings never match
      (2L, "You DARN fool, (heck) twice heck"),
      (3L, "clean text entirely")).toDF("doc_id", "text")
    val got = operators.TextOps.blocklistTable(
        docs, "doc_id", "text", Seq("darn", "heck", "ass"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == Seq((0L, true), (3L, false), (0L, true)))
  }

  test("heavy hitters: exactly the phi-heavy set, any partitioning") {
    import spark.implicits._
    val docs = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val got = operators.TextOps.heavyHitters(docs, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // N=7: only a (4*3 > 7); b 6 !> 7, c 3 !> 7
    assert(got == Set(("a", 4L)))
    // against exact ground truth on a skewed corpus, repartitioned
    val corpus = (0L until 200L).map { i =>
      (i, (0 to (i % 11).toInt).map(j => s"w${(i + j) % 13}").mkString(" "))
    }.toDF("doc_id", "text").repartition(7)
    val hh = operators.TextOps.heavyHitters(corpus, "text", k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val exact = corpus.select(explode(operators.TextOps.tokens(col("text")))
        .as("token"))
      .groupBy("token").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = exact.map(_._2).sum
    assert(hh == exact.filter { case (_, c) => c * 20 > n }.toSet)
  }

  test("html extraction + c4 line filter") {
    import spark.implicits._
    val html = "<html><!--c--><head><style>p{a:b}</style>" +
      "<script>if(a&&b){x()}</script></head><body><div>Nav | Bar</div>" +
      "<p>Hello &amp; welcome, 5 &lt; 7 &gt; 3, &quot;ok&quot; today.</p><br>" +
      "<p>Enable JavaScript to continue reading this page.</p>" +
      "</body></html>"
    val out = operators.HtmlOps.extract(
      Seq((1L, html)).toDF("doc_id", "html"), "html")
      .select("raw_lines", "kept_lines", "doc_keep", "clean_text")
      .collect().head
    // 3 visible lines: nav (no terminal punct), prose (kept),
    // javascript boilerplate (policy-dropped); script's braces are
    // gone before the doc-level curly check
    assert(out.getLong(0) == 3L)
    assert(out.getLong(1) == 1L)
    assert(out.getBoolean(2))
    assert(out.getString(3) == "Hello & welcome, 5 < 7 > 3, \"ok\" today.")
    // doc-level drops: page's own curly brace / lorem ipsum
    val docs = Seq(
      (1L, "<p>Real prose that should pass the filter today.</p>"),
      (2L, "<p>Some code follows here { not prose } sadly.</p>"),
      (3L, "<p>Lorem Ipsum dolor sit amet placeholder text.</p>"))
      .toDF("doc_id", "html")
    val keeps = operators.HtmlOps.extract(docs, "html")
      .orderBy("doc_id").select("doc_keep")
      .collect().map(_.getBoolean(0)).toSeq
    assert(keeps == Seq(true, false, false))
    // entity decode order: &amp;lt; is the LITERAL string "&lt;"
    val lit2 = operators.HtmlOps.extract(
      Seq((1L, "<p>Write &amp;lt; to show a less-than sign here.</p>"))
        .toDF("doc_id", "html"), "html")
      .select("clean_text").collect().head.getString(0)
    assert(lit2 == "Write &lt; to show a less-than sign here.")
  }

  test("url canonicalization and per-domain cap") {
    import spark.implicits._
    val cases = Seq(
      ("HTTPS://WWW.Example.COM/A/B?q=1#f", "example.com/a/b", "example.com"),
      ("http://site.org/p", "site.org/p", "site.org"),
      ("s3://bucket/key?x", "bucket/key", "bucket"),
      // no scheme: left as-is (www. only strips after a scheme)
      ("www.foo.com/a", "www.foo.com/a", "www.foo.com"),
      ("example.com", "example.com", "example.com"))
    val got = cases.map(_._1).toDF("url")
      .select(operators.UrlOps.normalizeUrl(col("url")),
        operators.UrlOps.host(col("url")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == cases.map(c => (c._2, c._3)))
    // cap: 40 docs on one host, 10 on another; 25 kept / all kept
    val docs = (0L until 50L).map(i =>
      (i, if (i < 40) "http://big.com/" + i else "http://small.com/" + i))
      .toDF("id", "url")
    val kept = operators.UrlOps.capPerDomain(docs, "id", "url", 25, "s")
    val byDomain = kept.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain == Map("big.com" -> 25L, "small.com" -> 10L))
    // deterministic under repartition
    val again = operators.UrlOps.capPerDomain(
      docs.repartition(7), "id", "url", 25, "s")
    assert(again.collect().map(_.getLong(0)).toSet ==
      kept.collect().map(_.getLong(0)).toSet)
  }

  test("shard assignment: deterministic, balanced, map-pure") {
    import spark.implicits._
    val docs = (0L until 4000L).map(i => (i, "x")).toDF("id", "text")
    val a = operators.Mixing.assignShards(docs, "id", nShards = 8, salt = "s")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // partitioning-independent membership
    val b = operators.Mixing.assignShards(docs.repartition(13), "id", 8, "s")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(a == b)
    assert(a.values.toSet.subsetOf((0 until 8).toSet))
    // balanced to multinomial noise: 500 +- 4 sigma per shard
    val sizes = a.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.values.forall(n =>
      math.abs(n - 500) < 4 * math.sqrt(4000 * (1.0 / 8) * (7.0 / 8))))
    // a different salt reshuffles membership
    val c = operators.Mixing.assignShards(docs, "id", 8, "t")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(c != a)
    // guard rails
    assertThrows[IllegalArgumentException](
      operators.Mixing.assignShards(docs, "id", 0))
    assertThrows[IllegalArgumentException](operators.Mixing.assignShards(
      operators.Mixing.assignShards(docs, "id", 2), "id", 2))
  }

  // ---------------- BPE vocabulary induction ----------------

  test("bpe: classic Sennrich corpus learns the hand-computed merges") {
    import spark.implicits._
    import operators.BpeTrain
    // low x5, lower x2, newest x6, widest x3 (arXiv 1508.07909 §3.2,
    // with our attached end-marker convention)
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val m = BpeTrain.train(docs, "text", nMerges = 5, recordStages = true)
    assert(m.merges.map(x => (x.rank, x.lhs, x.rhs, x.pair_count)) == Seq(
      (0, "e", "s", 9L),        // ties (e,s)/(s,t</w>) break lexicographic
      (1, "es", "t</w>", 9L),
      (2, "l", "o", 7L),
      (3, "e", "w", 6L),        // ties (e,w)/(n,e)/(w,est</w>)
      (4, "ew", "est</w>", 6L)))
    val segs = m.segments.map(s => s.word -> s.pieces).toMap
    assert(segs("low") == Vector("lo", "w</w>"))
    assert(segs("newest") == Vector("n", "ewest</w>"))
    assert(segs("widest") == Vector("w", "i", "d", "est</w>"))
    // stage invariant: stage r+1 = applyMerge(stage r, merge r)
    val byRank = m.stages.groupBy(_.rank)
    for (r <- 0 until 4) {
      val cur = byRank(r).map(s => s.word -> s.pieces.toVector).toMap
      val nxt = byRank(r + 1).map(s => s.word -> s.pieces.toVector).toMap
      val mr = m.merges(r)
      assert(cur.map { case (w, p) =>
        w -> BpeTrain.applyMerge(p, mr.lhs, mr.rhs) } == nxt)
    }
    // a NEW word segments with the learned merges (generalization)
    assert(BpeTrain.segmentWord("lowest", m.merges) ==
      Vector("lo", "w", "est</w>"))
    assert(m.droppedWords == 0)
  }

  test("bpe: greedy apply, empty-word marker, early stop, word cap") {
    import spark.implicits._
    import operators.BpeTrain
    // leftmost-greedy non-overlapping: a a a</w> + (a,a) -> aa, a</w>
    assert(BpeTrain.applyMerge(Vector("a", "a", "a</w>"), "a", "a") ==
      Vector("aa", "a</w>"))
    assert(BpeTrain.baseSymbols("") == Vector("</w>"))
    // every pair is a singleton -> minPairCount=2 stops before merge 0
    val uniq = Seq((0L, "ab cd")).toDF("doc_id", "text")
    val m0 = BpeTrain.train(uniq, "text", nMerges = 5, recordStages = true)
    assert(m0.merges.isEmpty && m0.stages.isEmpty)
    // stages stay empty unless requested (plain training callers
    // don't pay the nMerges x vocab snapshot)
    val docsS = Seq((0L, "aa aa")).toDF("doc_id", "text")
    val mS = BpeTrain.train(docsS, "text", nMerges = 1, minPairCount = 1L)
    assert(mS.merges.nonEmpty && mS.stages.isEmpty)
    // cap keeps the highest-count word and counts the dropped rest
    val capped = BpeTrain.train(
      Seq((0L, "zz zz yy")).toDF("doc_id", "text"),
      "text", nMerges = 1, minPairCount = 1L, maxWords = 1)
    assert(capped.droppedWords == 1L)
    assert(capped.merges == Seq(operators.BpeMerge(0, "z", "z</w>", 2L)))
  }

  test("bpe: segmentTable matches train segments in-vocab and segmentWord OOV") {
    import spark.implicits._
    import operators.BpeTrain
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val train = Seq((0L, text)).toDF("doc_id", "text")
    val m = BpeTrain.train(train, "text", nMerges = 5)
    val eval = Seq((0L, text + " lowest lowest")).toDF("doc_id", "text")
    val words = eval.select(
      explode(operators.TextOps.tokens(col("text"))).as("word"))
    val table = BpeTrain.segmentTable(words, "word", m.merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    // one row per DISTINCT word, not per occurrence
    assert(table.size == 5)
    // in-vocab words segment exactly as the trained model says
    m.segments.foreach(s => assert(table(s.word) == s.pieces.toVector))
    // the OOV word goes through base symbols + applicable merges
    assert(table("lowest") == BpeTrain.segmentWord("lowest", m.merges))
    // corpus tokenization: hand-checked counts on the eval doc
    val got = BpeTrain.bpeTokenize(eval, "doc_id", "text", m.merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 16 train words + 2x lowest = 18 words; pieces: low=2x5, lower=4x2
    // (lo,w,e,r</w>), newest=2x6, widest=4x3, lowest=3x2
    assert(got.toSeq == Seq((0L, 18L, 5 * 2 + 2 * 4 + 6 * 2 + 3 * 4 + 2 * 3)))
  }

  // ---------------- quality classifier ----------------

  test("classifier separates junk from prose with a hand-trained table") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "click here free offer click here free offer"),
      (2L, "new york is a city"),   // bigram-decided (see weights)
      (3L, "york new is a city"),   // same unigrams, broken adjacency
      (4L, "zz zz zz")              // nothing in the table -> score 0
    ).toDF("doc_id", "text")
    val weights = Seq(
      ("the", 10L), ("quick", 50L), ("brown", 50L), ("fox", 50L),
      ("click", -400L), ("free", -400L), ("offer", -400L), ("here", -100L),
      ("new york", 300L), ("is", 5L), ("a", 5L), ("city", 5L),
      ("new", -100L), ("york", -100L)
    ).toDF("feature", "weight_q")
    val got = operators.Classifier
      .scoreQuantized(docs, weights, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // doc0: the+quick+brown+fox+the = 10+50+50+50+10 = 170, 17 feats
    assert(got(0L) == ((17L, 170L, true)))
    // doc1: 2*(click+here+free+offer) = 2*(-400-100-400-400) = -2600
    assert(got(1L) == ((15L, -2600L, false)))
    // doc2 vs doc3: identical unigram sum (-185); only doc2 has the
    // "new york" adjacency (+300) — order sensitivity a bag-of-words
    // score lacks
    assert(got(2L) == ((9L, 115L, true)))
    assert(got(3L) == ((9L, -185L, false)))
    // doc4: no feature matches — left-join zero, not a dropped row
    assert(got(4L) == ((5L, 0L, false)))
  }

  test("synth weights are md5-exact, vocabulary-bounded, in [-500,500]") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta alpha")).toDF("doc_id", "text")
    val w = operators.Classifier.synthWeights(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // vocab = distinct features only: 2 unigrams + 2 bigrams
    assert(w.keySet ==
      Set("alpha", "beta", "alpha beta", "beta alpha"))
    assert(w.values.forall(v => v >= -500 && v <= 500))
    // md5("alpha") = 2c1743a3...: 0x2c1743a3 % 1001 - 500 = 239
    assert(w("alpha") == (java.lang.Long.parseLong("2c1743a3", 16) % 1001 - 500))
  }

  // ---------------- relevance scoring ----------------

  test("dsir: target-like docs outrank junk, deterministic on any partitioning") {
    import spark.implicits._
    // target distribution: prose vocabulary, repeated so its hashed
    // LM is peaked on these features
    val target = (1L to 20L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    // raw: 5 docs sharing the target vocabulary, 5 with junk
    // vocabulary the target LM has never seen
    val like = (100L to 104L)
      .map(i => (i, "the brown fox and the lazy dog jumps"))
    val junk = (200L to 204L)
      .map(i => (i, "zzq xkcd qwerty asdf zxcv plugh"))
    val raw = (like ++ junk).toDF("doc_id", "text")
    val sel = operators.Dsir.selectTopK(target, raw, "doc_id", "text",
      k = 5, buckets = 512, salt = "t")
    val ids = sel.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == (100L to 104L).toSet, s"expected the target-like docs, got $ids")
    // weight separation: every target-like logw above every junk logw
    // (the thing the Gumbel noise must not be able to flip)
    val all = operators.Dsir.selectTopK(target, raw, "doc_id", "text",
        k = 10, buckets = 512, salt = "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val minLike = (100L to 104L).map(all).min
    val maxJunk = (200L to 204L).map(all).max
    assert(minLike > maxJunk, s"like >= $minLike vs junk <= $maxJunk")
    // partitioning independence: exact counts, integer keys, doc_id
    // tiebreak — identical rows under any repartitioning
    val rows = sel.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val rows2 = operators.Dsir.selectTopK(target.repartition(7),
        raw.repartition(13), "doc_id", "text",
        k = 5, buckets = 512, salt = "t")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == rows2)
    // the one-pass split form (target/raw as slices of one parent
    // table) is row-identical to the two-corpus form
    val parent = target.withColumn("is_t", lit(true))
      .unionByName(raw.withColumn("is_t", lit(false)))
    val split = operators.Dsir.selectTopKSplit(parent, col("is_t"),
        "doc_id", "text", k = 5, buckets = 512, salt = "t")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(split == rows, s"split form drifted: $split vs $rows")
  }

  test("quantized tf-idf is exact on a hand corpus") {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple banana apple cherry"),
      (1L, "banana banana date"),
      (2L, "cherry date elderberry"),
      (3L, "fig grape")).toDF("doc_id", "text")
    val got = Relevance.tfIdfQuantized(docs, "doc_id", "text",
        terms = Seq("apple", "banana", "cherry"), scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // N=4, scale=1000: df(apple)=1 -> idf 4000; df(banana)=2 -> 2000;
    // df(cherry)=2 -> 2000
    assert(got == Map(
      0L -> (2 * 4000L + 1 * 2000L + 1 * 2000L), // 12000
      1L -> (2 * 2000L),                          // 4000
      2L -> (1 * 2000L)))                         // 2000
  }

  test("bm25 ranks matching docs sensibly") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark shuffle join " * 5),          // hits rare+common terms
      (1L, "spark " + "filler words here " * 20), // one hit, long doc
      (2L, "spark spark spark"),                 // tf-saturated short doc
      (3L, "nothing relevant at all")).toDF("doc_id", "text")
    val got = Relevance.bm25(docs, "doc_id", "text", Seq("spark", "shuffle"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!got.contains(3L))            // no query term, no row
    assert(got(0L) > got(2L))            // two terms beat tf-saturation
    assert(got(2L) > got(1L))            // length normalization penalizes 1
    assert(got.values.forall(_ > 0))
  }

  test("quantized bm25 matches the double scorer up to quantization") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark shuffle join " * 5),
      (1L, "spark " + "filler words here " * 20),
      (2L, "spark spark spark"),
      (3L, "nothing relevant at all")).toDF("doc_id", "text")
    val dbl = Relevance.bm25(docs, "doc_id", "text", Seq("spark", "shuffle"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val q = Relevance.bm25Quantized(docs, "doc_id", "text",
        Seq("spark", "shuffle"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q.keySet == dbl.keySet)
    // value agreement: score_q / (1000 * scale) ≈ bm25 within the
    // quantization steps — per term the idf floor loses up to 1e-3
    // (times tf-part ≤ k1+1 = 2.2) and the tf-part div up to 1e-6,
    // so 2 terms bound the gap by ~4.5e-3
    for ((d, s) <- dbl)
      assert(math.abs(q(d) / 1e9 - s) < 5e-3, s"doc $d: q=${q(d)} dbl=$s")
    // ranking agreement on this corpus
    assert(dbl.toSeq.sortBy(-_._2).map(_._1) == q.toSeq.sortBy(-_._2).map(_._1))
    // determinism across repartitioning: integer-exact scores
    val q2 = Relevance.bm25Quantized(docs.repartition(7), "doc_id", "text",
        Seq("spark", "shuffle"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q2 == q)
  }

  test("unigram LM score: exact on a hand corpus, fluent docs bucket head") {
    import spark.implicits._
    // 4 docs, 12 tokens total: counts a=4, b=3, c=2, d=1, e=1, f=1
    val docs = Seq(
      (0L, "a a a b"),      // most-common tokens -> lowest nll
      (1L, "a b b c"),
      (2L, "c d e"),        // rare tokens -> highest nll
      (3L, "f")).toDF("doc_id", "text")
    val got = Relevance.lmScoreQuantized(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    def nll(cnt: Int): Long = math.floor(-math.log(cnt / 12.0) * 1000).toLong
    val want = Map(
      0L -> (3 * nll(4) + nll(3)),
      1L -> (nll(4) + 2 * nll(3) + nll(2)),
      2L -> (nll(2) + nll(1) + nll(1)),
      3L -> nll(1))
    for ((d, (nTok, score, mean, _)) <- got) {
      assert(score == want(d), s"doc $d score")
      assert(mean == want(d) / nTok, s"doc $d mean")
    }
    // quartile bucketing: the fluent doc is head, the rare-token docs tail
    assert(got(0L)._4 == "head")
    assert(got(3L)._4 == "tail")
    // determinism across repartitioning (integer-exact everywhere)
    val again = Relevance.lmScoreQuantized(docs.repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(again == got)
  }

  test("bigram LM with backoff: exact hand corpus + order sensitivity unigram lacks") {
    import spark.implicits._
    // T=9; uni: the=3, cat=2, sat=2, ran=1, dog=1
    // bigrams: (the,cat)=2 (the,dog)=1 (cat,sat)=1 (cat,ran)=1 (dog,sat)=1
    val train = Seq(
      (0L, "the cat sat"),
      (1L, "the cat ran"),
      (2L, "the dog sat")).toDF("doc_id", "text")
    val ev = Seq(
      (0L, "the cat sat"), // natural order: every bigram seen
      (1L, "sat cat the"), // reversed: unseen bigrams -> backoff
      (2L, "the zebra"),   // OOV second word -> OOV backoff floor
      (3L, "zebra")).toDF("doc_id", "text") // OOV first word
    val got = Relevance.bigramLmScoreQuantized(train, ev, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    def fl(x: Double) = math.floor(x * 1000).toLong
    def nllU(c: Int) = fl(-math.log(c / 9.0))
    def nllBi(cb: Int, c1: Int) = fl(-math.log(cb.toDouble / c1))
    def nllBo(c2: Int) = fl(-math.log(0.4 * c2 / 9.0))
    val s0 = nllU(3) + nllBi(2, 3) + nllBi(1, 2)
    val s1 = nllU(2) + nllBo(2) + nllBo(3) // (sat,cat)->cat, (cat,the)->the
    val s2 = nllU(3) + fl(-math.log(0.4 * 1 / 9.0))
    val s3 = fl(math.log(9.0))
    assert(got(0L) == ((3L, s0, s0 / 3, got(0L)._4)))
    assert(got(1L)._2 == s1)
    assert(got(2L)._2 == s2)
    assert(got(3L) == ((1L, s3, s3, got(3L)._4)))
    // the separation a unigram LM cannot produce: identical token
    // multiset, natural order scores strictly better than shuffled
    assert(got(1L)._2 > got(0L)._2,
      "word-shuffled doc did not score worse than its original")
    // determinism across repartitioning (integer-exact everywhere)
    val again = Relevance.bigramLmScoreQuantized(
        train.repartition(5), ev.repartition(3), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(again == got)
  }

  // ---------------- repetition signals ----------------

  test("native ngram_rep_stats matches the declarative form") {
    import spark.implicits._
    val texts = Seq(
      "a b a b a b",            // heavy 2-gram repetition
      "all tokens distinct here today",
      "x",                      // fewer tokens than n
      "  ",                     // empty after trim
      "one two one two three one two")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (n <- Seq(2, 3)) {
      val native = df.select(col("id"),
          TextOps.ngramRepStats(col("text"), n).as("s"))
        .select(col("id"), col("s.n_grams"), col("s.n_distinct"), col("s.max_count"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      val columnar = df.select(col("id"),
          TextOps.ngramRepStatsColumnar(col("text"), n).as("s"))
        .select(col("id"), col("s.n_grams"), col("s.n_distinct"), col("s.max_count"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      assert(native.sortBy(_._1).toSeq == columnar.sortBy(_._1).toSeq, s"n=$n")
    }
    // hand check: "a b a b a b" 2-grams = [ab, ba, ab, ba, ab] ->
    // 5 grams, 2 distinct, mode count 3
    val hand = df.filter(col("id") === 0L)
      .select(TextOps.ngramRepStats(col("text"), 2).as("s"))
      .select(col("s.n_grams"), col("s.n_distinct"), col("s.max_count"))
      .head()
    assert((hand.getInt(0), hand.getInt(1), hand.getInt(2)) == ((5, 2, 3)))
  }

  test("repetition features flag templated docs") {
    import spark.implicits._
    val df = Seq(
      (0L, "buy now click here buy now click here buy now click here"),
      (1L, "the quick brown fox jumps over a lazy dog near the river"))
      .toDF("doc_id", "text")
    val feats = df.select(col("doc_id"),
        TextOps.ngramRepStats(col("text"), 2).as("rs"))
      .select(col("doc_id") +:
        TextOps.repetitionFeatures(col("rs")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(feats(0L) > 0.2 && feats(1L) < 0.2) // top_ngram_frac separates
  }

  // ---------------- chunking + packing ----------------

  test("chunkTokens covers every token with the expected overlap") {
    import spark.implicits._
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val df = Seq((0L, text), (1L, "short doc only"), (2L, "")).toDF("doc_id", "text")
    val chunks = graft.operators.Chunking.chunkTokens(df, "doc_id", "text",
        window = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val byDoc = chunks.groupBy(_._1)
    // 100 tokens, window 32, stride 24: ceil(68/24)+1 = 4 chunks
    assert(byDoc(0L).length == 4)
    // every chunk except the last is full; starts advance by stride
    val d0 = byDoc(0L).sortBy(_._2)
    assert(d0.init.forall(_._4 == 32) && d0.last._4 == 100 - 3 * 24)
    for ((c, i) <- d0.zipWithIndex)
      assert(c._3.startsWith(s"t${i * 24 + 1} "), s"chunk $i misaligned: ${c._3.take(20)}")
    // consecutive chunks overlap by window - stride tokens
    assert(d0(0)._3.split(" ").drop(24).toSeq == d0(1)._3.split(" ").take(8).toSeq)
    // short and empty docs yield exactly one (partial) chunk
    assert(byDoc(1L).length == 1 && byDoc(1L).head._4 == 3)
    assert(byDoc(2L).length == 1)
  }

  test("packBins fills budget bins sequentially and deterministically") {
    import spark.implicits._
    val df = (0L until 30L).map(i => ("s", i, 100)).toDF("lang", "doc_id", "n_tok")
    val got = graft.operators.Chunking.packBins(df, "lang", "doc_id", "n_tok", 512)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // 100-token docs into 512-token bins: bin advances every ~5 docs
    // (greedy: a doc starting below the boundary overflows its bin)
    assert(got(0L) == 0 && got(4L) == 0) // prev-cum 400 < 512
    assert(got(5L) == 0)                 // prev-cum 500 < 512: overflows bin 0
    assert(got(6L) == 1)                 // prev-cum 600
    assert(got(29L) == (29L * 100) / 512)
    // partitioning independence
    val re = graft.operators.Chunking.packBins(
        df.repartition(7), "lang", "doc_id", "n_tok", 512)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(re == got)
  }

  // ---------------- decontamination ----------------

  test("contamination flags eval overlap that exact dedup misses") {
    import spark.implicits._
    val evalText = "the quick brown fox jumps over the lazy dog near a river bend today"
    val train = Seq(
      // verbatim leak with a changed tail — not an exact duplicate
      (0L, evalText.replace("today", "tomorrow")),
      // partial leak: shares a phrase but few trigrams
      (1L, "quick brown fox spotted elsewhere in unrelated words entirely now"),
      (2L, "completely different content with no overlap at all whatsoever here"))
      .toDF("doc_id", "text")
    val evalSet = Seq((100L, evalText)).toDF("doc_id", "text")
    val flagged = graft.operators.TextOps.contamination(
        train, "doc_id", "text", evalSet, "doc_id", "text",
        n = 3, minShared = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(flagged.map(_._1).toSet == Set(0L), s"got ${flagged.toSeq}")
    // the near-verbatim doc shares all but the final trigrams
    assert(flagged.head._3 >= 10)
    // shared counts are DISTINCT shingles: a doc repeating an eval
    // phrase many times must not inflate its overlap
    val repeat = Seq((5L, ("the quick brown fox " * 10).trim)).toDF("doc_id", "text")
    val rep = graft.operators.TextOps.contamination(
        repeat, "doc_id", "text", evalSet, "doc_id", "text",
        n = 3, minShared = 1)
      .collect().map(r => r.getLong(2))
    // distinct trigrams of the repeated phrase that also occur in eval:
    // "the quick brown", "quick brown fox" (+ the wrap-around grams
    // "brown fox the" / "fox the quick" which eval does NOT contain)
    assert(rep.head == 2, s"expected 2 distinct shared trigrams, got ${rep.toSeq}")
  }

  test("curate flow: funnel monotone, planted junk removed, deterministic") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = docs.select(col("doc_id"),
      concat(lit("https://www.site"), (col("doc_id") % 7).cast("string"),
        lit(".example.com/p/"), col("doc_id").cast("string")).as("url"),
      col("source"), col("text"))
    // planted junk the pipeline must remove: a URL-variant re-crawl of
    // doc 20 and a blocklist violator
    val crawl = base
      .unionByName(base.filter(col("doc_id") === 20)
        .select(lit(9000001L).as("doc_id"),
          concat(upper(col("url")), lit("#frag")).as("url"),
          col("source"), col("text")))
      .unionByName(base.filter(col("doc_id") === 21)
        .select(lit(9000002L).as("doc_id"),
          lit("https://www.site0.example.com/p/violator").as("url"),
          col("source"), concat(col("text"), lit(" darn!")).as("text")))
    val evalSet = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"), col("text"))
    // the synthetic corpus carries no English stopwords: waive that
    // one Gopher rule, keep the others (CurateFlow scaladoc)
    val gate = "n_words >= 20 AND mean_word_len_g BETWEEN 3.0 AND 10.0 " +
        "AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8"
    val r = graft.operators.CurateFlow.run(crawl, evalSet,
      budgetTokens = 20000L, maxPerDomain = 1000, qualityKeep = gate)
    val counts = r.funnel.toMap
    // funnel monotone non-increasing in pipeline order
    val order = r.funnel.map(_._2)
    assert(order.zip(order.tail).forall { case (a, b) => a >= b },
      s"funnel not monotone: ${r.funnel}")
    // the URL re-crawl collapsed; the blocklist violator dropped
    assert(counts("url_dedup") == counts("input") - 1)
    val ids = r.released.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(!ids.contains(9000001L) && !ids.contains(9000002L))
    assert(ids.nonEmpty)
    // eval leakage gone: the eval docs themselves (doc_id < 10) would
    // trivially self-contaminate and must be absent
    assert(ids.forall(_ >= 10))
    // shard range sane
    val shards = r.released.select("shard").distinct()
      .collect().map(_.getInt(0))
    assert(shards.forall(s => s >= 0 && s < 16))
    // determinism: a repartitioned rerun releases the same ids
    val r2 = graft.operators.CurateFlow.run(crawl.repartition(7), evalSet,
      budgetTokens = 20000L, maxPerDomain = 1000, qualityKeep = gate)
    val ids2 = r2.released.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(ids2 == ids)
    assert(r2.funnel == r.funnel)
  }

  test("temperature mixing upweights small sources and clamps at 1") {
    import spark.implicits._
    // 'big' = 64 docs x 4 tokens, 'small' = 4 docs x 4 tokens
    val df = ((0 until 64).map(i => (i.toLong, "big", "a b c d")) ++
      (100 until 104).map(i => (i.toLong, "small", "a b c d")))
      .toDF("doc_id", "src", "text")
    // hand replay: toks big=256 small=16; w = floor(sqrt(n)*2^20);
    // W = w_b + w_s; rate_s = min(1, B*w/(W*n))
    val wB = math.floor(math.sqrt(256.0) * 1048576).toLong
    val wS = math.floor(math.sqrt(16.0) * 1048576).toLong
    val wSum = wB + wS
    val budget = 64L
    val rates = graft.operators.Mixing.temperatureRates(
      df, "src", "text", budget)
    val expB = math.min(1.0, (budget.toDouble * wB.toDouble) /
      (wSum.toDouble * 256.0))
    val expS = math.min(1.0, (budget.toDouble * wS.toDouble) /
      (wSum.toDouble * 16.0))
    assert(rates("big")._1 == expB && rates("small")._1 == expS)
    // alpha=1/2 upweights the small source: its sampling RATE exceeds
    // the big source's (0.8 vs 0.2 here), though never its cap
    assert(expS > expB)
    assert(expS == 0.8 && expB == 0.2, s"got $expS / $expB")
    // a budget beyond the tempered share clamps the small source at 1
    val clamped = graft.operators.Mixing.temperatureRates(
      df, "src", "text", budget = 200L)
    assert(clamped("small")._1 == 1.0 &&
      clamped("small")._2 == 4294967296L)
    assert(clamped("big")._1 < 1.0)
    // zero budget keeps nothing
    val zero = graft.operators.Mixing.mixByTemperature(
      df, "doc_id", "src", "text", budget = 0L)
    assert(zero.count() == 0)
    // partitioning independence of the kept set
    val a = graft.operators.Mixing.mixByTemperature(
      df, "doc_id", "src", "text", budget).collect()
      .map(_.getLong(0)).toSet
    val b = graft.operators.Mixing.mixByTemperature(
      df.repartition(7), "doc_id", "src", "text", budget).collect()
      .map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("bloom contamination is exactly contamination under any bloom params") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = docs.filter(col("doc_id") >= 10)
    val evalSet = docs.filter(col("doc_id") < 10)
    val exact = graft.operators.TextOps.contamination(
        train, "doc_id", "text", evalSet, "doc_id", "text",
        n = 3, minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.nonEmpty, "fixture must contain planted leakage")
    // a healthy bitmap
    val big = graft.operators.TextOps.bloomContamination(
        train, "doc_id", "text", evalSet, "doc_id", "text",
        n = 3, minShared = 5, bloomBits = 1 << 16, probes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(big == exact)
    // a SATURATED bitmap: 64 bits / 2 probes makes nearly every doc a
    // false-positive candidate — the exact verify join must still
    // produce the identical relation (FPs carry zero shared shingles)
    val tiny = graft.operators.TextOps.bloomContamination(
        train, "doc_id", "text", evalSet, "doc_id", "text",
        n = 3, minShared = 5, bloomBits = 64, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tiny == exact)
    // partitioning independence: the OR-merged fit and the probe are
    // both order-free
    val re = graft.operators.TextOps.bloomContamination(
        train.repartition(7), "doc_id", "text",
        evalSet.repartition(3), "doc_id", "text",
        n = 3, minShared = 5, bloomBits = 1 << 16, probes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(re == exact)
  }

  test("bloom prefilter has zero false negatives by construction") {
    // every key set into the bitmap must probe positive — the
    // guarantee that makes the prefilter safe to put in front of the
    // verify join
    val bm = new Array[Long](4) // 256 bits
    val keys = (0 until 500).map(i => i * 0x9E3779B97F4A7C15L + 11)
    keys.foreach(h => graft.plans.BloomHelper.set(h, bm, 4))
    assert(keys.forall(h => graft.plans.BloomHelper.contains(h, bm, 4)))
  }

  // ---------------- PII scrubbing ----------------

  test("pii redaction replaces emails, phones, urls with placeholders") {
    import spark.implicits._
    val df = Seq(
      (0L, "mail a.b+c@sub.example.org or call 555-123-4567 now"),
      (1L, "see https://a.example.com/p?q=1#f and http://b.io/x"),
      (2L, "clean text with no pii at all"),
      (3L, "edge 12-34-5678 not a phone; user@@bad not an email"))
      .toDF("id", "text")
    val got = df.select(col("id"),
        TextOps.redactPii(col("text")).as("red"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "mail <EMAIL> or call <PHONE> now")
    assert(got(1L) == "see <URL> and <URL>")
    assert(got(2L) == "clean text with no pii at all")
    assert(got(3L) == "edge 12-34-5678 not a phone; user@@bad not an email")
    // counts agree with what redaction replaced
    val counts = df.select(col("id") +:
        TextOps.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(counts(0L) == ((1, 1, 0)))
    assert(counts(1L) == ((0, 0, 2)))
    assert(counts(2L) == ((0, 0, 0)))
    // redaction is idempotent (placeholders contain no PII shapes)
    val again = df.select(col("id"),
        TextOps.redactPii(TextOps.redactPii(col("text"))).as("red"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == got)
  }
}
