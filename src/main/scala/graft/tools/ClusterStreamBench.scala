package graft.tools

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicLong, LongAdder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.Pipeline
import graft.model.Turn
import graft.streaming.StreamingPipeline
import graft.streaming.StreamingPipeline.StreamConfig

/** The STREAMING job of the north rule run literally via spark-submit
  * on a multi-executor cluster (see ClusterBench for the batch analog
  * and BENCH.md §R2.9-R2.10 for the cluster bring-up): file source in
  * event-time-ordered micro-batches -> watermark ->
  * dropDuplicatesWithinWatermark -> broadcast annotation ->
  * foreachBatch sink. Master/executor topology comes entirely from
  * spark-submit flags; one JSON line out.
  *
  *   spark-submit --master spark://127.0.0.1:7077 \
  *     --class graft.tools.ClusterStreamBench \
  *     --executor-cores 4 --executor-memory 10g \
  *     --total-executor-cores <8|32> \
  *     --conf spark.local.dir=/dev/shm/graft_local \
  *     target/scala-2.13/civicutilsspark_2.13-0.1.0.jar 25000000 <8|32> [filesPerTrigger]
  *
  * Trigger sizing (arg 3, default 64) is the streaming-scaling lever —
  * see StreamScaleBench / BENCH.md §R3.1; spark.local.dir should point
  * at fast local storage (the sandbox /tmp disk is the bottleneck
  * otherwise — a real executor has NVMe).
  */
object ClusterStreamBench {
  def main(args: Array[String]): Unit = {
    val nTurns = args.lift(0).map(_.toLong).getOrElse(25000000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(8)
    val filesPerTrigger = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().appName("graft-cluster-stream").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.shuffle.partitions", cores.toString)
    import spark.implicits._

    // one-time source prep (same protocol + mtime stamping as
    // StreamScaleBench: event-time-ordered micro-batches)
    val srcDir = s"/tmp/graft_cstream_src_$nTurns"
    if (!Files.exists(java.nio.file.Paths.get(srcDir))) {
      val conv = (nTurns / 25L).toInt.max(1)
      val cfg = graft.sources.Synth.TurnGenConfig(
        nConvs = conv, turnsPerConv = 25, nGenes = Pipeline.DefaultGenes,
        hotConvs = conv / 100, hotMult = 5, dupRate = 0.01)
      graft.sources.Synth.transcripts(spark, cfg)
        .repartitionByRange(256, org.apache.spark.sql.functions.col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(srcDir)
      import scala.jdk.CollectionConverters._
      val parts = Files.list(java.nio.file.Paths.get(srcDir)).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
        .sortBy(_.getFileName.toString)
      val t0 = System.currentTimeMillis() - parts.size * 2000L
      for ((p, i) <- parts.zipWithIndex)
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(t0 + i * 2000L))
    }

    val bc = Pipeline.cachedIndex(spark)
    val ckpt = Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), s"cstream$cores").toString
    val rows = new LongAdder
    val batches = new AtomicLong
    val schema = implicitly[org.apache.spark.sql.Encoder[Turn]].schema
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
    val turns = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .parquet(srcDir).as[Turn]
    // dedup-first is the measured-faster order (BENCH.md R4.3); the
    // env override matches StreamRun's for old-checkpoint resumes
    val ann =
      if (sys.env.get("SPARK_GRAFT_STREAM_ORDER").contains("annotate-first"))
        StreamingPipeline.annotations(turns, bc, StreamConfig(partitions = cores))
      else
        StreamingPipeline.annotationsDedupFirst(
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
    val execs = spark.sparkContext.statusTracker.getExecutorInfos.length - 1
    println(
      f"""{"executors":$execs,"cores":$cores,"rows":${rows.sum()},"batches":${batches.get()},""" +
      f""""wall_sec":$wall%.2f,"turns_per_sec":${rows.sum() / wall}%.0f,""" +
      f""""mean_batch_latency_sec":${wall / math.max(1, batches.get())}%.2f}""")
    spark.stop()
  }
}
