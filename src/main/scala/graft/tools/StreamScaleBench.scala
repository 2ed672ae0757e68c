package graft.tools

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicLong, LongAdder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.Pipeline
import graft.model.Turn
import graft.streaming.StreamingPipeline
import graft.streaming.StreamingPipeline.StreamConfig

/** Streaming-path scaling evidence: the SAME streaming job (file
  * source in micro-batches -> watermark -> dedup -> broadcast
  * annotation -> foreachBatch sink) at local[8] vs local[32].
  * Reports sustained turns/sec and mean micro-batch (windowed
  * annotation) latency at both levels + scaling efficiency — the
  * BASELINE.json target metric pair.
  *
  * Trigger sizing is THE streaming-scaling lever: every micro-batch
  * carries a fixed serial cost (driver planning, offset/commit log,
  * state-commit barrier, source listing) of ~1-2 s on this box, so
  * scaling efficiency rises monotonically with rows/batch — a
  * 26 M-row run split into 9 batches measured 0.29 efficiency while
  * the same rows in 4 batches clear 0.5 (BENCH.md §R3). Production
  * deployments size triggers to multi-GB for exactly this reason;
  * `filesPerTrigger` exposes the knob.
  *
  * Usage: StreamScaleBench [nTurns] [filesPerTrigger]
  */
object StreamScaleBench {

  def main(args: Array[String]): Unit = {
    val nTurns = args.lift(0).map(_.toLong).getOrElse(8000000L)
    val filesPerTrigger = args.lift(1).map(_.toInt).getOrElse(64)
    val srcDir = s"/tmp/graft_sscale_src_$nTurns"

    if (!Files.exists(java.nio.file.Paths.get(srcDir))) {
      val sp = ScaleBench.session(32)
      val conv = (nTurns / 25L).toInt.max(1)
      val cfg = graft.sources.Synth.TurnGenConfig(
        nConvs = conv, turnsPerConv = 25, nGenes = Pipeline.DefaultGenes,
        hotConvs = conv / 100, hotMult = 5, dupRate = 0.01)
      // range-partition by event time: the file stream source consumes
      // files in (mtime, path) order, so ascending-ts part files make
      // micro-batches arrive in event-time order like a real ingest —
      // otherwise the watermark after batch 1 marks everything late
      graft.sources.Synth.transcripts(sp, cfg)
        .repartitionByRange(256, org.apache.spark.sql.functions.col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(srcDir)
      sp.stop()
      // FileStreamSource consumes files in modification-time order and
      // parallel writes produce tied mtimes: stamp ascending mtimes in
      // part-file (= ts-range) order so micro-batches follow event time
      import scala.jdk.CollectionConverters._
      val parts = Files.list(java.nio.file.Paths.get(srcDir)).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
        .sortBy(_.getFileName.toString)
      val t0 = System.currentTimeMillis() - parts.size * 2000L
      for ((p, i) <- parts.zipWithIndex)
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(t0 + i * 2000L))
    }

    // Per-trigger phase decomposition, from StreamingQueryProgress
    // .durationMs: `addBatch` is the parallel work (tasks); the rest
    // (latestOffset listing, queryPlanning, walCommit, commitOffsets)
    // is DRIVER-SERIAL framework cost that no executor count can
    // divide — the decomposition that explains the efficiency curve.
    // Harvested SYNCHRONOUSLY from q.recentProgress after termination
    // (an async listener races the bus shutdown and can drop the final
    // batch's durations).
    def measure(cores: Int): (Double, Long, Double, Int, Map[String, Long]) = {
      val localDir = Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), s"sslocal$cores").toString
      val sp = ScaleBench.session(cores, localDir = Some(localDir))
      import sp.implicits._
      sp.sparkContext.setLogLevel("ERROR")
      val bc = Pipeline.cachedIndex(sp)
      // state-store + checkpoint IO on the memory-backed fs: this
      // sandbox's /tmp disk writes at ~10-30 MB/s and serializes the
      // per-partition state commits; /dev/shm stands in for the local
      // NVMe a real executor would use
      val ckpt = Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), s"sscale$cores").toString
      // RocksDB state store for the dedup state (10^12-turn scale needs
      // state off-heap + incremental checkpoints; SURVEY.md §4.2)
      if (sys.env.get("SPARK_GRAFT_STREAM_MODE").contains("rocksdb"))
        sp.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // ad-hoc conf experiments, e.g.
      // SPARK_GRAFT_STREAM_CONF="spark.sql.streaming.stateStore.compression.codec=none"
      sys.env.get("SPARK_GRAFT_STREAM_CONF").foreach(
        _.split(";").filter(_.contains("=")).foreach { kv =>
          val Array(k, v) = kv.split("=", 2); sp.conf.set(k, v)
        })
      val rows = new LongAdder
      val batches = new AtomicLong
      val schema = implicitly[org.apache.spark.sql.Encoder[Turn]].schema
      // fewer checkpoint files retained: this run produces a handful of
      // batches, and the default 100-batch retention fsyncs needlessly
      sp.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
      val turns = sp.readStream.schema(schema)
        .option("maxFilesPerTrigger", filesPerTrigger.toString)
        .parquet(srcDir).as[Turn]
      val mode = sys.env.getOrElse("SPARK_GRAFT_STREAM_MODE", "")
      val ann =
        if (mode.contains("nodedup"))
          turns.mapPartitions { it => // isolate the stateless path
            val idx = bc.value
            it.map(t => graft.operators.MatchKernel.annotateTurn(t, idx))
          }
        else if (mode.contains("dedupfirst"))
          StreamingPipeline.annotationsDedupFirst(
            turns, bc, StreamConfig(partitions = cores))
        else StreamingPipeline.annotations(
          turns, bc, StreamConfig(partitions = cores))
      val t0 = System.nanoTime()
      val q = ann.toDF().writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) =>
          rows.add(df.count()); batches.incrementAndGet(); ()
        }
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val phases = scala.collection.mutable.Map.empty[String, Long]
      q.recentProgress.foreach { p =>
        p.durationMs.forEach { (k, v) =>
          phases.updateWith(k) { o => Some(o.getOrElse(0L) + v) }; ()
        }
        // state-store commit time: the per-partition state commit
        // inside addBatch (task-side, parallel but barrier-tailed),
        // summed across partitions
        p.stateOperators.foreach { so =>
          phases.updateWith("stateCommit") {
            o => Some(o.getOrElse(0L) + so.commitTimeMs)
          }
        }
      }
      sp.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      // reclaim the memory-backed shuffle + checkpoint dirs between levels
      for (d <- Seq(localDir, ckpt)) {
        import scala.jdk.CollectionConverters._
        val root = java.nio.file.Paths.get(d)
        if (Files.exists(root))
          Files.walk(root).iterator().asScala.toSeq.reverse
            .foreach(f => try Files.deleteIfExists(f) catch { case _: Exception => })
      }
      (wall, rows.sum(), wall / math.max(1, batches.get()), batches.get().toInt,
        phases.toMap)
    }

    def phaseJson(p: Map[String, Long], nBatches: Int): String =
      p.toSeq.sortBy(-_._2).map { case (k, v) =>
        s""""$k":${v / math.max(1, nBatches)}"""
      }.mkString("{", ",", "}")

    // warm-up JIT at 32, then measure interleaved
    measure(32)
    val (w8, r8, lat8, b8, p8) = measure(8)
    val (w32, r32, lat32, b32, p32) = measure(32)
    require(r8 == r32, s"row mismatch: $r8 vs $r32")
    val thr8 = r8 / w8; val thr32 = r32 / w32
    val eff = (thr32 / thr8) / 4.0
    println(
      f"""{"rows":$r8,"batches":$b8,"local8_sec":$w8%.2f,"local32_sec":$w32%.2f,""" +
      f""""local8_turns_per_sec":$thr8%.0f,"local32_turns_per_sec":$thr32%.0f,""" +
      f""""local8_batch_latency_sec":$lat8%.2f,"local32_batch_latency_sec":$lat32%.2f,""" +
      f""""scaling_efficiency":$eff%.3f,""" +
      s""""phase_ms_per_batch_local8":${phaseJson(p8, b8)},""" +
      s""""phase_ms_per_batch_local32":${phaseJson(p32, b32)}}""")
  }
}
