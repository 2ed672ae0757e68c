package graft.tools

import java.nio.file.Files
import java.util.concurrent.atomic.LongAdder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.Pipeline
import graft.model.Turn
import graft.streaming.StreamingPipeline
import graft.streaming.StreamingPipeline.StreamConfig

/** Planted hot-conversation streaming bench: the FULL pipeline (file
  * micro-batches -> watermark -> stateful dedup -> conv_id
  * repartition -> kernel -> sink) run over (a) a uniform-key corpus
  * and (b) the same row count with ~10% of ALL rows on ONE conv_id —
  * the pathological key the north rule's salted-skew mitigation
  * exists for — with and (c) without the salted repartition
  * (`StreamConfig.salts`).
  *
  * The skew physics: the dedup STATE is keyed by the full
  * (conv_id, turn_idx) pair and stays balanced; it is the explicit
  * conv_id-hash repartition that funnels the hot conversation into
  * one post-shuffle partition, walling the kernel/sink stage at that
  * task. The acceptance bar (round-4 VERDICT item 8): hot-key
  * throughput within ~1.5x of the uniform run at the same shape.
  *
  * Usage: StreamHotBench [nTurns] [hotFrac]
  */
object StreamHotBench {

  private def writeSource(dir: String, cfg: graft.sources.Synth.TurnGenConfig): Unit = {
    val sp = ScaleBench.session(32)
    graft.sources.Synth.transcripts(sp, cfg)
      .repartitionByRange(256, org.apache.spark.sql.functions.col("ts"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(dir)
    sp.stop()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    // ascending mtimes in ts-range order (file source consumes by
    // mtime; see StreamScaleBench)
    import scala.jdk.CollectionConverters._
    val parts = Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
      .sortBy(_.getFileName.toString)
    val t0 = System.currentTimeMillis() - parts.size * 2000L
    for ((p, i) <- parts.zipWithIndex)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(t0 + i * 2000L))
  }

  def main(args: Array[String]): Unit = {
    val nTurns = args.lift(0).map(_.toLong).getOrElse(16000000L)
    val hotFrac = args.lift(1).map(_.toDouble).getOrElse(0.10)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val perConv = 25

    // uniform: every conversation the same size
    val uniCfg = graft.sources.Synth.TurnGenConfig(
      nConvs = (nTurns / perConv).toInt, turnsPerConv = perConv,
      nGenes = Pipeline.DefaultGenes)
    // hot: same total rows, ~hotFrac of them on conversation 0
    val hotTurns = (nTurns * hotFrac).toLong
    val hotCfg = graft.sources.Synth.TurnGenConfig(
      nConvs = ((nTurns - hotTurns) / perConv).toInt, turnsPerConv = perConv,
      nGenes = Pipeline.DefaultGenes,
      hotConvs = 1, hotMult = (hotTurns / perConv + 1).toInt)

    val uniDir = s"/tmp/graft_hotbench_uni_$nTurns"
    val hotDir = s"/tmp/graft_hotbench_hot_$nTurns"
    if (!Files.exists(java.nio.file.Paths.get(uniDir))) writeSource(uniDir, uniCfg)
    if (!Files.exists(java.nio.file.Paths.get(hotDir))) writeSource(hotDir, hotCfg)

    def measure(srcDir: String, salts: Int): (Double, Long) = {
      val localDir = Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "hotb").toString
      val sp = ScaleBench.session(cores, localDir = Some(localDir))
      import sp.implicits._
      sp.sparkContext.setLogLevel("ERROR")
      sp.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
      val bc = Pipeline.cachedIndex(sp)
      val ckpt = Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "hotbc").toString
      val rows = new LongAdder
      val schema = org.apache.spark.sql.Encoders.product[Turn].schema
      val turns = sp.readStream.schema(schema)
        .option("maxFilesPerTrigger", "64")
        .parquet(srcDir).as[Turn]
      val ann = StreamingPipeline.annotationsDedupFirst(turns, bc,
        StreamConfig(partitions = cores, salts = salts))
      val t0 = System.nanoTime()
      val q = ann.toDF().writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) => rows.add(df.count()); () }
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      sp.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      for (d <- Seq(localDir, ckpt)) {
        import scala.jdk.CollectionConverters._
        val root = java.nio.file.Paths.get(d)
        if (Files.exists(root))
          Files.walk(root).iterator().asScala.toSeq.reverse
            .foreach(f => try Files.deleteIfExists(f) catch { case _: Exception => })
      }
      (wall, rows.sum())
    }

    measure(uniDir, 1) // JIT warm-up
    val (uw, ur) = measure(uniDir, 1)
    val (hw, hr) = measure(hotDir, 1)
    val (sw, sr) = measure(hotDir, 32)
    println(
      f"""{"rows":$ur,"hot_frac":$hotFrac,"cpus":$cores,""" +
      f""""uniform_sec":$uw%.1f,"uniform_turns_per_sec":${ur / uw}%.0f,""" +
      f""""hot_sec":$hw%.1f,"hot_turns_per_sec":${hr / hw}%.0f,""" +
      f""""hot_salted_sec":$sw%.1f,"hot_salted_turns_per_sec":${sr / sw}%.0f,""" +
      f""""hot_vs_uniform":${hw / uw}%.2f,"hot_salted_vs_uniform":${sw / uw}%.2f}""")
  }
}
