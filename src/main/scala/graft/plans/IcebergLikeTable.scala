package graft.plans

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Snapshot-committing partitioned-parquet table — the sandbox stand-in
  * for the north rule's Iceberg sink (no Iceberg runtime jar ships with
  * the image; SURVEY.md §7.0).
  *
  * Semantics provided:
  *  - idempotent partition replace: a micro-batch overwrites exactly the
  *    partitions it produced (`partitionOverwriteMode=dynamic`), so
  *    foreachBatch replays after a checkpoint restart converge to the
  *    same table state (exactly-once downstream effect);
  *  - snapshot manifests: every commit writes
  *    `_manifests/snap-<batchId>.json` carrying the written partitions
  *    and per-partition row counts (the per-partition lineage + metrics
  *    of the north rule), committed via atomic rename;
  *  - replay detection: a batchId whose manifest already exists is
  *    skipped (the work is already durable).
  *
  * The API deliberately mirrors what an Iceberg `replacePartitions`
  * commit would provide, so a real catalog can drop in when the runtime
  * jar is available.
  */
final class IcebergLikeTable(val root: String, val partitionCols: Seq[String]) {

  private val manifestDir = Paths.get(root, "_manifests")

  def manifestPath(batchId: Long) = manifestDir.resolve(f"snap-$batchId%08d.json")

  def committed(batchId: Long): Boolean = Files.exists(manifestPath(batchId))

  /** Idempotently replace the partitions present in `df`. Safe to call
    * again with the same batchId (no-op) or after a partial failure
    * (dynamic overwrite re-replaces the same partitions).
    *
    * Physical partitioning is (partitionCols..., _batch_id): a dynamic
    * partition overwrite is only exactly-once when every physical
    * partition is owned by exactly one micro-batch — without the batch
    * id, a later batch touching the same (data_type, bucket) would
    * clobber earlier batches' rows. Including the batch id makes a
    * replay rewrite ONLY its own partitions (idempotent) while new
    * batches strictly add partitions, which is exactly Iceberg's
    * append-snapshot semantics.
    */
  def replacePartitions(df: DataFrame, batchId: Long): Unit = {
    if (committed(batchId)) return // replayed micro-batch: already durable
    val spark = df.sparkSession
    // per-partition row counts for the manifest (lineage/metrics)
    import org.apache.spark.sql.functions._
    val counts = df.groupBy(partitionCols.map(col): _*)
      .count().collect()
      .map { r =>
        val key = partitionCols.indices
          .map(i => s""""${partitionCols(i)}":"${r.get(i)}"""").mkString(",")
        s"""{$key,"rows":${r.getLong(partitionCols.length)}}"""
      }

    if (counts.isEmpty) return // empty micro-batch: nothing to commit

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.withColumn("_batch_id", lit(batchId))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols :+ "_batch_id": _*)
      .parquet(root)

    // snapshot commit: write manifest to a temp file, atomic rename
    Files.createDirectories(manifestDir)
    val body =
      s"""{"batch_id":$batchId,"partition_cols":[${partitionCols.map("\"" + _ + "\"").mkString(",")}],
         |"partitions":[${counts.mkString(",")}]}""".stripMargin
    val tmp = manifestDir.resolve(s".snap-$batchId.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(batchId), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** All committed snapshot batch ids, ascending. */
  def snapshots(): Seq[Long] =
    if (!Files.exists(manifestDir)) Nil
    else {
      import scala.jdk.CollectionConverters._
      Files.list(manifestDir).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("snap-") && n.endsWith(".json"))
        .map(n => n.stripPrefix("snap-").stripSuffix(".json").toLong)
        .toSeq.sorted
    }
}
