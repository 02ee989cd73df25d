package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped staging layer: expensive shared intermediates (the parsed
  * CDC envelope, shingle sets) are computed once per (session, sfDir) and
  * persisted, mirroring how the reference materializes DWD topics in Kafka
  * instead of recomputing them in every consumer
  * (SURVEY §0 layer diagram). Consumers downstream see identical data —
  * this changes cost, never results.
  *
  * At cluster scale the same role is played by a written staging table
  * (parquet/Delta); MEMORY_AND_DISK keeps the local harness faithful to
  * that without spilling past executor memory.
  *
  * The build is EAGER (persist + count) and timed: staging cost is a
  * real, attributable line item — [[buildTimes]] reports seconds per
  * staged frame so the bench can surface it as its own entry instead of
  * letting it ride inside whichever consumer query happens to run first
  * (which made that query's cold number order-dependent).
  */
object Staging {
  private val cache = TrieMap.empty[(SparkSession, String, String), DataFrame]
  private val times = TrieMap.empty[(String, String), Double]

  // builds are serialized: TrieMap.getOrElseUpdate evaluates the thunk in
  // every racing caller, and with the build now EAGER a lost race would
  // fully materialize a second persisted copy with no handle left to
  // unpersist it (sbt runs test suites in parallel against the shared
  // session). synchronized is reentrant, so nested stage calls inside a
  // build (pr_edges → mh_pairs → grams3) still work.
  def stage(s: SparkSession, dir: String, name: String)(build: => DataFrame): DataFrame =
    // lock-free fast path for hits (TrieMap reads are safe) — a reader of
    // an already-built frame must not block behind another frame's
    // minutes-long build holding the lock
    cache.get((s, dir, name)).getOrElse(synchronized {
      cache.getOrElseUpdate((s, dir, name), {
        val t0 = System.nanoTime()
        val df = build.persist(StorageLevel.MEMORY_AND_DISK)
        df.count() // materialize the whole cache now, on the builder's clock
        times((dir, name)) = (System.nanoTime() - t0) / 1e9
        df
      })
    })

  /** Seconds spent building each staged frame, keyed by (sfDir, name).
    * One entry per build — a frame is built at most once per session+dir.
    */
  def buildTimes: Map[(String, String), Double] = times.toMap
}
