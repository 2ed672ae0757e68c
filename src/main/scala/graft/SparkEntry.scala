package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Synth

/** Driver contract — flagship entry, per-operator queries, and DuckDB
  * oracle SQL (see /root/repo/SURVEY.md §7 + the builder prompt).
  *
  * Query naming: q0x = relational subset over the TPC-H-ish testdata
  * (DuckDB-oracle-checked); q2x = engine-specific operators over the
  * deterministic synthetic transcript/evidence fixtures (rows-only
  * checks — not expressible in portable SQL).
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship: full match->annotate pipeline over synthesized
    * transcripts (driver smoke-checks rows>0).
    */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.run(spark)
      .select(col("conv_id"), col("turn_idx"), col("gene_key"),
        col("data_type"), col("highest_tier"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- relational subset (oracle-checked) --------------------------
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q02_top_customers" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("total_spend"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("total_spend").desc, col("c_custkey"))
        .limit(10)
    }),
    "q03_region_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"))
    }),
    "q04_events_hourly" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 3).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),
    "q05_customer_best_order" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("best_price"))
        .orderBy(col("o_custkey"))
    }),
    "q06_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("n_copies"))
        .orderBy(col("doc_id"))
    }),
    "q07_token_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).as("n_tokens"),
          col("n_chars"))
        .orderBy(col("doc_id"))
    }),
    "q08_events_props" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1)
          .cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),
    "q09_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
            .otherwise(0))
        .withColumn("sess_id", sum(col("new_sess"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("sess_id"))
    }),
    // ----- training-data pipeline operators ---------------------------
    "q10_ann_quantized" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val c = emb.select(col("vec_id").as("item_id"), col("embedding").as("iv"))
      val scored = c.join(broadcast(q), col("item_id") =!= col("query_id"))
        .withColumn("dotq",
          operators.Similarity.quantizedDot(col("qv"), col("iv")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("dotq").desc, col("item_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("item_id"), col("dotq"))
        .orderBy(col("query_id"), col("rank"))
    }),
    "q11_doc_quality" -> ((s, dir) => {
      val f = operators.TextOps.qualityFeatures(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id") +: f.map { case (n, c) => c.as(n) }: _*)
        .orderBy(col("doc_id"))
    }),
    "q12_bpe_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          operators.TextOps.bpeTokenCount(col("text")).as("n_bpe"))
        .orderBy(col("doc_id"))
    }),
    "q13_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          operators.TextOps.fingerprintMd5(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),
    "q14_minhash_neardup" -> ((s, dir) => {
      operators.NearDup.minhashNearDups(
        t(s, dir, "documents"), "doc_id", "text", threshold = 0.5)
        .orderBy(col("doc_a"), col("doc_b"))
    }),
    "q15_simhash_neardup" -> ((s, dir) => {
      operators.NearDup.simhashNearDups(
        t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .orderBy(col("doc_a"), col("doc_b"))
    }),
    "q16_langid" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(operators.TextOps.langId(col("text")).as("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang_pred"))
    }),
    "q17_media_pipeline" -> ((s, _) => {
      val media = operators.Multimodal.mediaTable(s, 300)
      val meta = operators.Multimodal.decode(media).toDF()
      meta.groupBy(col("kind"))
        .agg(count(lit(1)).as("n"), sum(col("n_frames")).as("total_frames"),
          sum(col("n_bytes")).as("total_bytes"))
        .orderBy(col("kind"))
    }),
    "q18_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.lshTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 10, nBits = 4, nTables = 8)
        .orderBy(col("query_id"), col("rank"))
    }),
    "q26_segment_no_orders" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
      // anti join: customers with no large order, counted per segment
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_without"))
        .orderBy(col("c_mktsegment"))
    }),
    "q27_rollup_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("revenue"), col("n"))
        .orderBy(col("flag"), col("status"))
    }),
    // ----- engine operators over deterministic fixtures (rows-only) ----
    "q25_pstart_sql" -> ((s, _) => {
      // native Catalyst expression exercised through its SQL surface
      plans.GraftFunctions.register(s)
      val turns = sources.Synth.transcripts(s,
        sources.Synth.TurnGenConfig(nConvs = 100, turnsPerConv = 10,
          nGenes = Pipeline.DefaultGenes))
      turns.toDF().filter(col("role") === "user")
        .withColumn("prot", split(split(col("text"), "\\|").getItem(1), ",").getItem(0))
        .createOrReplaceTempView("snv_turns")
      s.sql("""SELECT p_start(prot) AS p_start, count(*) AS n
               FROM snv_turns WHERE p_start(prot) IS NOT NULL
               GROUP BY 1 ORDER BY 1""")
    }),
    "q29_conv_tier_pivot" -> ((s, _) => {
      // A7 cohort stats: per-conversation tier distribution via pivot
      Pipeline.run(s)
        .groupBy(col("conv_id"))
        .pivot("highest_tier",
          Seq("tier_1", "tier_1b", "tier_2", "tier_3", "tier_4"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("conv_id"))
    }),
    "q19_sql_interface" -> ((s, _) => {
      // the engine's output is a plain relation: full Spark SQL over it
      Pipeline.run(s).createOrReplaceTempView("annotations")
      s.sql("""
        SELECT conv_id,
               count(*) AS n_turns,
               sum(CASE WHEN highest_tier = 'tier_1' THEN 1 ELSE 0 END) AS n_t1,
               max(size(tier_1)) AS max_t1_matches,
               first(highest_tier) AS first_tier
        FROM (SELECT * FROM annotations
              ORDER BY conv_id, turn_idx)
        GROUP BY conv_id
        HAVING n_t1 > 0
        ORDER BY conv_id
        LIMIT 50""")
    }),
    "q30_session_rollup" -> ((s, _) => {
      import s.implicits._
      val ann = Pipeline.run(s).as[operators.Annotation]
      streaming.StreamingPipeline.sessionRollup(ann,
        streaming.StreamingPipeline.StreamConfig())
        .orderBy(col("conv_id"), col("session_start"))
    }),
    "q31_versioned_dim" -> ((s, _) => {
      import s.implicits._
      val epoch0 = 1700000000000L
      val epoch1 = epoch0 + 50L * 3600000L // v2 cuts in mid-stream
      val bc = operators.VersionedDim.build(s, Seq(
        epoch0 -> sources.Synth.evidenceDim(s, 20, Pipeline.DefaultSeed).toDF(),
        epoch1 -> sources.Synth.evidenceDim(s, Pipeline.DefaultGenes,
          Pipeline.DefaultSeed).toDF()), Pipeline.defaultCt)
      val turns = sources.Synth.transcripts(s,
        sources.Synth.TurnGenConfig(nConvs = 100, turnsPerConv = 10,
          nGenes = Pipeline.DefaultGenes, baseTs = epoch0))
      operators.VersionedDim.annotate(turns, bc).toDF()
        .withColumn("epoch", when(col("ts") < to_timestamp(lit(
          new java.sql.Timestamp(epoch1))), "v1").otherwise("v2"))
        .groupBy(col("epoch"), col("highest_tier"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("epoch"), col("highest_tier"))
    }),
    "q28_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 10, nCentroids = 16, nProbe = 4)
        .orderBy(col("query_id"), col("rank"))
    }),
    "q20_match_tier_counts" -> ((s, _) => {
      Pipeline.run(s).groupBy(col("data_type"), col("highest_tier"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("data_type"), col("highest_tier"))
    }),
    "q22_tier_select_highest" -> ((s, _) => {
      import s.implicits._
      operators.TierSelect(Pipeline.run(s).as[operators.Annotation], Left("highest"))
        .toDF()
        .groupBy(col("highest_tier")).agg(count(lit(1)).as("n"))
        .orderBy(col("highest_tier"))
    }),
    "q23_output_table" -> ((s, _) => {
      import s.implicits._
      val dim = sources.Synth.evidenceDim(s, Pipeline.DefaultGenes, Pipeline.DefaultSeed).toDF()
      val filtered = operators.EvidenceFilter(dim, Pipeline.defaultFilter)
      val renders = operators.OutputAssembly.buildRenders(s, filtered, Pipeline.defaultCt)
      operators.OutputAssembly.writeMatchTable(
        Pipeline.run(s).as[operators.Annotation], renders)
        .orderBy(col("conv_id"), col("turn_idx"), col("tier"))
    }),
    "q24_drug_targets" -> ((s, _) => {
      import s.implicits._
      val dim = sources.Synth.evidenceDim(s, Pipeline.DefaultGenes, Pipeline.DefaultSeed).toDF()
      val filtered = operators.EvidenceFilter(dim, Pipeline.defaultFilter)
      val ctSel = operators.CtClassifier.select(
        operators.CtClassifier.annotate(filtered, Pipeline.defaultCt), Left("highest"))
      val collected = ctSel
        .select(struct(filtered.columns.map(col): _*).as("_1"), col("ct").as("_2"))
        .as[(model.EvidenceRow, String)].collect()
      val pred = s.sparkContext.broadcast(operators.Reports.buildPredEntries(collected))
      val names = operators.Reports.buildNameMap(s, filtered)
      operators.Reports.drugTargets(
        Pipeline.run(s).as[operators.Annotation], pred, names)
    }),
    "q21_annotations" -> ((s, _) => {
      Pipeline.run(s)
        .select(col("conv_id"), col("turn_idx"), col("gene_key"),
          col("data_type"), col("highest_tier"),
          concat_ws(";", col("tier_1")).as("tier_1"),
          concat_ws(";", col("tier_1b")).as("tier_1b"),
          concat_ws(";", col("tier_2")).as("tier_2"),
          concat_ws(";", col("tier_3")).as("tier_3"),
          col("tier_4"),
          concat_ws(";", col("ds_tier_1")).as("ds_tier_1"))
        .orderBy(col("conv_id"), col("turn_idx"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q02_top_customers" ->
      """SELECT c_custkey,
         round(sum(o_totalprice), 2) AS total_spend,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY total_spend DESC, c_custkey LIMIT 10""",
    "q03_region_revenue" ->
      """SELECT r_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""",
    "q04_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n_events, round(sum(value), 3) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q05_customer_best_order" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS best_price
         FROM (SELECT *, row_number() OVER
               (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
               FROM orders) WHERE rn = 1 ORDER BY o_custkey""",
    "q06_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
         FROM documents GROUP BY text ORDER BY doc_id""",
    "q07_token_stats" ->
      """SELECT doc_id,
         length(string_split_regex(trim(text), '\s+')) AS n_tokens,
         n_chars FROM documents ORDER BY doc_id""",
    "q08_events_props" ->
      """SELECT event_type,
         sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS sum_k,
         count(*) AS n,
         count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1 ORDER BY 1""",
    "q26_segment_no_orders" ->
      """SELECT c_mktsegment, count(*) AS n_without
         FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
         GROUP BY 1 ORDER BY 1""",
    "q27_rollup_revenue" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
           coalesce(l_linestatus, 'ALL') AS status,
           round(sum(l_extendedprice), 2) AS revenue,
           count(*) AS n
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY 1, 2""",
    "q10_ann_quantized" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                    FROM embeddings WHERE vec_id < 20),
           c AS (SELECT vec_id AS item_id, embedding AS iv FROM embeddings),
           pairs AS (
             SELECT query_id, item_id,
               (SELECT sum(CAST(round(x.qe * 1000) AS BIGINT) *
                           CAST(round(x.ie * 1000) AS BIGINT))
                FROM (SELECT unnest(qv) AS qe, unnest(iv) AS ie) x) AS dotq
             FROM q, c WHERE item_id <> query_id)
         SELECT query_id, rank, item_id, dotq FROM (
           SELECT *, row_number() OVER
             (PARTITION BY query_id ORDER BY dotq DESC, item_id) AS rank
           FROM pairs) WHERE rank <= 5 ORDER BY query_id, rank""",
    "q11_doc_quality" ->
      """SELECT doc_id,
           length(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens,
           length(text) AS n_chars_m,
           round(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0
             / greatest(length(text), 1), 4) AS punct_ratio,
           round(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
             / greatest(length(text), 1), 4) AS digit_ratio,
           round(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             t -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this','are','was'], t))) * 1.0
             / greatest(length(string_split_regex(trim(lower(text)), '\s+')), 1), 4) AS stopword_ratio,
           round(len(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) * 1.0
             / greatest(length(string_split_regex(trim(lower(text)), '\s+')), 1), 4) AS uniq_ratio,
           round(list_sum(list_transform(string_split_regex(trim(lower(text)), '\s+'),
             t -> length(t))) * 1.0
             / greatest(length(string_split_regex(trim(lower(text)), '\s+')), 1), 4) AS mean_word_len
         FROM documents ORDER BY doc_id""",
    "q12_bpe_tokens" ->
      """SELECT doc_id,
           length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS n_bpe
         FROM documents ORDER BY doc_id""",
    "q13_fingerprint" ->
      """SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
         FROM documents ORDER BY doc_id""",
    "q09_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
             THEN 1 ELSE 0 END AS new_sess
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sessions AS (
           SELECT user_id,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS sess_id
           FROM flagged)
         SELECT user_id, sess_id, count(*) AS n_events
         FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""")
}
