package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded registry for operator-internal persisted relations (the
  * pattern NearDup introduced, shared so every operator that
  * materializes an intermediate consumed multiple times — shingle
  * postings, LM token explodes — manages cache lifetime the same
  * way). Long-lived sessions (Bench, Verify) call `unpersistAll()`
  * between queries; as a backstop the registry self-bounds: beyond
  * `MaxTracked` entries the OLDEST relation is unpersisted
  * automatically (correctness-safe — an unpersisted relation silently
  * recomputes; only the cache win is lost).
  */
private[operators] object CacheRegistry {

  private val MaxTracked = 4
  private val persisted =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Dataset[_]]()

  def persistTracked(df: DataFrame): DataFrame = persistTrackedDs(df)

  /** Typed variant: a persisted `Dataset[T]` registers its plan in the
    * CacheManager exactly like a DataFrame, so every later reference
    * to the same plan (e.g. both sides of a self-join) reads the cache
    * instead of re-executing the upstream subtree.
    */
  def persistTrackedDs[T](ds: org.apache.spark.sql.Dataset[T]): org.apache.spark.sql.Dataset[T] = {
    val p = ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    persisted.add(p)
    while (persisted.size > MaxTracked) {
      val old = persisted.poll()
      if (old != null) old.unpersist(false)
    }
    p
  }

  def unpersistAll(): Unit = {
    var df = persisted.poll()
    while (df != null) { df.unpersist(false); df = persisted.poll() }
  }
}
