package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.model.Turn

/** Large-state RocksDB soak for the streaming dedup: state ≫ what the
  * default-heap in-memory provider survives (BENCH.md R3.2: the
  * HDFS-backed provider OOMs at ~26 M keys / 8 g), a HARD KILL of the
  * session mid-stream, resume from checkpoint, and an exactly-once
  * audit of the sink — the regime a 10^12-turn dedup actually lives
  * in, where state lives off-heap in RocksDB and executors die
  * mid-batch as a matter of course.
  *
  * Shape: file-source micro-batches -> full-span watermark ->
  * `dropDuplicatesWithinWatermark(conv_id, turn_idx)` (nothing ever
  * evicted, so the state grows to every distinct key) -> 2-column
  * parquet FILE sink (exactly-once via the sink's _spark_metadata
  * commit log). Phase 1 stops the whole SparkSession after a few
  * committed batches — the in-flight batch's files are orphaned,
  * exactly like an executor/driver loss; phase 2 builds a NEW session
  * on the same checkpoint and runs to completion. The audit reads the
  * sink through its metadata log and asserts rows == distinct keys ==
  * the generator's key count: any replayed batch would show as dupes,
  * any dropped one as loss.
  *
  * Usage: RocksSoakBench [nConvs] [turnsPerConv] [dupRate]
  * (defaults 4_000_000 x 25 = 100 M distinct keys, 2% re-emissions).
  * Run WITHOUT SPARK_DRIVER_MEM so the 8 g default heap makes the
  * state ≫ heap point.
  */
object RocksSoakBench {

  private def session(cores: Int, localDir: String): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .config("spark.sql.streaming.minBatchesToRetain", "2")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    b.getOrCreate()
  }

  def main(args: Array[String]): Unit = {
    val nConvs = args.lift(0).map(_.toInt).getOrElse(4000000)
    val turnsPerConv = args.lift(1).map(_.toInt).getOrElse(25)
    val dupRate = args.lift(2).map(_.toDouble).getOrElse(0.02)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val distinctKeys = nConvs.toLong * turnsPerConv

    val shm = java.nio.file.Paths.get("/dev/shm")
    val work = Files.createTempDirectory(shm, "rocksoak").toString
    val srcDir = s"$work/src"; val ckpt = s"$work/ckpt"
    val sink = s"$work/sink"; val localDir = s"$work/local"

    val cfg = graft.sources.Synth.TurnGenConfig(
      nConvs = nConvs, turnsPerConv = turnsPerConv,
      nGenes = graft.Pipeline.DefaultGenes, dupRate = dupRate)
    val totalRows = cfg.totalRows

    // ---- generate the source (ascending-ts part files + staggered
    // mtimes, as StreamScaleBench documents: the file source consumes
    // in mtime order, so batches follow event time like a real ingest)
    locally {
      val sp = session(cores, localDir)
      graft.sources.Synth.transcripts(sp, cfg)
        .repartitionByRange(256, col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(srcDir)
      sp.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      import scala.jdk.CollectionConverters._
      val parts = Files.list(java.nio.file.Paths.get(srcDir)).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
        .sortBy(_.getFileName.toString)
      val t0 = System.currentTimeMillis() - parts.size * 2000L
      for ((p, i) <- parts.zipWithIndex)
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(t0 + i * 2000L))
    }

    val schema = org.apache.spark.sql.Encoders.product[Turn].schema
    // the full ts span is nConvs hours; a delay beyond it means the
    // dedup state NEVER evicts — every distinct key stays live
    val watermark = s"${nConvs.toLong * 2 * 60} minutes"

    def startStream(sp: SparkSession) = {
      import sp.implicits._
      sp.readStream.schema(schema)
        .option("maxFilesPerTrigger", "48")
        .parquet(srcDir).as[Turn]
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("conv_id", "turn_idx")
        .select(col("conv_id"), col("turn_idx"))
        .writeStream
        .outputMode(OutputMode.Append)
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
    }

    // ---- phase 1: run a few batches, then KILL the session
    val t1 = System.nanoTime()
    val killedAfter = {
      val sp = session(cores, localDir)
      sp.sparkContext.setLogLevel("WARN")
      val q = startStream(sp)
      var committed = -1L
      while (committed < 2 && q.isActive) {
        Thread.sleep(500)
        committed = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
      }
      // hard kill: stop the session under the running query — the
      // in-flight batch dies uncommitted
      sp.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      committed
    }
    val wall1 = (System.nanoTime() - t1) / 1e9

    // ---- phase 2: new session, same checkpoint, run to completion
    val t2 = System.nanoTime()
    val (stateRows, batches2) = {
      val sp = session(cores, localDir)
      sp.sparkContext.setLogLevel("WARN")
      val q = startStream(sp)
      q.awaitTermination()
      val progress = q.recentProgress
      val sr = progress.reverseIterator.flatMap(_.stateOperators)
        .map(_.numRowsTotal).find(_ > 0).getOrElse(-1L)
      sp.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      (sr, progress.length)
    }
    val wall2 = (System.nanoTime() - t2) / 1e9

    // ---- audit: the sink read honors _spark_metadata, so orphaned
    // files from the killed batch are invisible — rows == distinct ==
    // generator keys is the zero-dupe/zero-loss assertion
    val sp = session(cores, localDir)
    val audit = sp.read.parquet(sink)
      .agg(count(lit(1)).as("rows"),
        count_distinct(col("conv_id"), col("turn_idx")).as("distinct"))
      .head()
    val (rows, distinct) = (audit.getLong(0), audit.getLong(1))
    val stateBytes = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(ckpt)
      if (Files.exists(root))
        Files.walk(root).iterator().asScala.filter(Files.isRegularFile(_))
          .map(Files.size).sum
      else -1L
    }
    sp.stop()
    val ok = rows == distinctKeys && distinct == distinctKeys
    println(
      s"""{"provider":"rocksdb","distinct_keys":$distinctKeys,"source_rows":$totalRows,""" +
      s""""killed_after_batches":$killedAfter,"resume_batches":$batches2,""" +
      s""""sink_rows":$rows,"sink_distinct":$distinct,"exactly_once":$ok,""" +
      s""""state_rows":$stateRows,"checkpoint_bytes":$stateBytes,""" +
      f""""phase1_sec":$wall1%.1f,"phase2_sec":$wall2%.1f,""" +
      f""""sustained_turns_per_sec":${totalRows / (wall1 + wall2)}%.0f,"cpus":$cores}""")
    require(ok, s"EXACTLY-ONCE VIOLATION: rows=$rows distinct=$distinct expected=$distinctKeys")
    // cleanup the tmpfs workdir
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(work)).iterator().asScala.toSeq.reverse
      .foreach(f => try Files.deleteIfExists(f) catch { case _: Exception => })
  }
}
