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
  *
  * Attribution is MARGINAL: a build that stages other frames inside its
  * thunk (pr_edges → mh_pairs → grams3) records only its own cost — the
  * nested builds' full elapsed time is subtracted, because they record
  * it themselves. The recorded entries are therefore ADDITIVE: their sum
  * is the real wall time spent building, and each frame answers "what
  * would this run save if the frame were free". (Round-7's version
  * billed children to every ancestor, so the entries summed to ~2.6x
  * wall time — the BENCH_r07 68.9 s vs ~26 s discrepancy.)
  */
object Staging {
  private val cache = TrieMap.empty[(SparkSession, String, String), DataFrame]
  private val times = TrieMap.empty[(SparkSession, String, String), Double]
  // seconds each in-flight build must NOT be billed for — nested staged
  // builds it launched plus time its nested calls spent blocked on the
  // monitor behind another thread's build — innermost first; guarded by
  // `synchronized` (builds are serialized)
  private var nestedCharge: List[Double] = Nil

  // builds are serialized: TrieMap.getOrElseUpdate evaluates the thunk in
  // every racing caller, and with the build now EAGER a lost race would
  // fully materialize a second persisted copy with no handle left to
  // unpersist it (sbt runs test suites in parallel against the shared
  // session). synchronized is reentrant, so nested stage calls inside a
  // build (pr_edges → mh_pairs → grams3) still work.
  def stage(s: SparkSession, dir: String, name: String)(build: => DataFrame): DataFrame = {
    // lock-free fast path for hits (TrieMap reads are safe) — a reader of
    // an already-built frame must not block behind another frame's
    // minutes-long build holding the lock. A nested HIT charges nothing
    // to the enclosing build, which is exactly marginal cost.
    cache.get((s, dir, name)).getOrElse {
      val tEnter = System.nanoTime()
      synchronized {
        // time blocked on the monitor is ANOTHER thread's build (possibly
        // another session's — sbt runs suites concurrently): charge it to
        // the enclosing build's nested accumulator so that build's
        // marginal entry excludes it, or a waiting parent would bill a
        // concurrent build's wall time into its own entry (and the other
        // build records it too — double-counted, non-additive)
        val waited = (System.nanoTime() - tEnter) / 1e9
        nestedCharge = nestedCharge match {
          case h :: t => (h + waited) :: t
          case Nil => Nil
        }
        cache.getOrElseUpdate((s, dir, name), {
          nestedCharge ::= 0.0
          val t0 = System.nanoTime()
          try {
            val df = build.persist(StorageLevel.MEMORY_AND_DISK)
            df.count() // materialize the whole cache now, on the builder's clock
            val total = (System.nanoTime() - t0) / 1e9
            times((s, dir, name)) = total - nestedCharge.head
            nestedCharge = nestedCharge.tail match {
              // bill this build's FULL elapsed (self + descendants) to the
              // enclosing build, which subtracts it — so a grandparent never
              // double-subtracts what the parent already covered
              case parent :: rest => (parent + total) :: rest
              case Nil => Nil
            }
            df
          } catch {
            case e: Throwable =>
              // the failed build records no entry for itself, but any nested
              // builds that SUCCEEDED inside it did record theirs — their
              // elapsed must still propagate to the enclosing build's charge
              // (merge head into parent), or an ancestor that survives the
              // failure would double-count them and break additivity
              nestedCharge = nestedCharge.tail match {
                case parent :: rest => (parent + nestedCharge.head) :: rest
                case Nil => Nil
              }
              throw e
          }
        })
      }
    }
  }

  /** Scratch directory for one-time LAYOUT writes (bucketed/partitioned
    * table copies): created under java.io.tmpdir and registered for
    * recursive deletion at JVM exit, so a multi-dir bench/sweep session
    * never strands per-(session, dir) copies of lineitem/orders/events
    * on disk after it ends. Deletion is at JVM exit, not earlier — the
    * layout tables must outlive every query in the session (they back
    * catalog tables), and the in-memory catalog dies with the JVM anyway.
    */
  def scratchDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      } catch { case _: Throwable => () }))
    dir.toString
  }

  /** Root directory for a PUBLISHED artifact tree (the q176 shard export,
    * the q180 ANN index). Unlike [[scratchDir]] — always driver-local tmp,
    * deleted at JVM exit, right for layout COPIES of existing tables —
    * a published artifact is the pipeline's OUTPUT and must land on the
    * cluster's shared filesystem: set `graft.artifact.root` to an
    * HDFS/ABFS URI and the stage + final trees are created there (no
    * exit-time cleanup — artifacts outlive the session by design); unset,
    * the harness default is a shutdown-cleaned local scratch dir, which
    * on local[*] IS the shared filesystem.
    */
  def artifactRoot(s: SparkSession, prefix: String): String =
    s.conf.getOption("graft.artifact.root") match {
      case Some(root) =>
        val p = new org.apache.hadoop.fs.Path(
          root, prefix + java.util.UUID.randomUUID().toString)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).mkdirs(p)
        p.toString
      case None => scratchDir(prefix)
    }

  /** The stage→final swap of a two-phase artifact publish, routed through
    * the Hadoop FileSystem of the TARGET path — on HDFS/ABFS/local this
    * is the one atomic directory rename that makes a crash mid-write
    * leave a stage tree, never a half-published artifact. Object stores
    * without atomic rename (raw S3) turn this into a non-atomic copy;
    * publishing there needs a manifest-commit layout (Delta/Iceberg) —
    * documented constraint, fail-loud here if the rename is refused.
    */
  def publishAtomic(s: SparkSession, stagePath: String,
      finalPath: String): Unit = {
    import org.apache.hadoop.fs.Path
    val stage = new Path(stagePath)
    val fs = stage.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.rename(stage, new Path(finalPath)))
      throw new IllegalStateException(
        s"two-phase publish: rename $stagePath -> $finalPath refused by " +
          s"${fs.getScheme} — the stage tree is intact; nothing was " +
          "published")
  }

  /** Marginal seconds spent building each of `s`'s staged frames, keyed by
    * (sfDir, name). One entry per build — a frame is built at most once per
    * session+dir — and entries are additive (nested builds subtracted).
    * Keyed by session like the cache: two sessions in one JVM (sbt tests)
    * never overwrite or leak timings into each other's reports.
    */
  def buildTimes(s: SparkSession): Map[(String, String), Double] =
    times.toMap.collect { case ((sess, d, n), v) if sess eq s => (d, n) -> v }

  /** Every staged frame key (sfDir, name) CACHED for session `s` —
    * whether or not this session paid its build. A cached frame with no
    * [[buildTimes]] entry was found pre-built (possible when a caller
    * shares the session across mains); the bench reports those as
    * explicit `"reused"` staging entries so amortized cost is never
    * silently invisible (round-10 VERDICT directive #3).
    */
  def stagedNames(s: SparkSession): Set[(String, String)] =
    cache.keySet.collect { case (sess, d, n) if sess eq s => (d, n) }.toSet
}
