package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Bounded per-(session, dataset) store of persisted DataFrames — the
  * shared idiom for "this frame is consumed by several queries (or
  * several subtrees of one query) and re-deriving it each time would do
  * strictly more work than the reference".
  *
  * MEMORY_AND_DISK: the store spills rather than OOMs; at cluster scale
  * this would be a written table (Delta/parquet), same semantics.
  * Results are bit-identical to the unpersisted plan (same plan, same
  * partitioning) — Verify hashes prove it.
  *
  * Insertion-ordered map so eviction is true FIFO (oldest entry first);
  * all map access is guarded by the map's own monitor, but the build +
  * persist happens OUTSIDE the lock — plan construction is expensive
  * and must not serialize unrelated datasets' builds. Bounded at
  * `maxFrames` so touching many datasets in one JVM (tests,
  * multi-tenant sessions) can't pin unbounded block storage; evicted
  * frames are unpersisted (non-blocking).
  */
private[graft] final class FrameStore(maxFrames: Int) {

  private val store =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame]

  def getOrBuild(spark: SparkSession, dir: String)(
      build: => DataFrame): DataFrame = {
    val key = (spark, dir)
    val hit = store.synchronized(Option(store.get(key)))
    hit.getOrElse {
      val built = build.persist(StorageLevel.MEMORY_AND_DISK)
      store.synchronized {
        val race = store.get(key)
        if (race != null) {
          built.unpersist(blocking = false) // another thread won
          race
        } else {
          if (store.size >= maxFrames) {
            val it = store.entrySet().iterator()
            if (it.hasNext) {
              it.next().getValue.unpersist(blocking = false)
              it.remove()
            }
          }
          store.put(key, built)
          built
        }
      }
    }
  }
}
