package graft

import org.apache.spark.sql.SparkSession

/** One-call library setup for interactive / SQL-first use: registers the
  * warehouse tables as views over a scale-factor directory and installs the
  * native SQL functions. After `Graft.init(spark, dir)` a user can run
  * plain `spark.sql` against the full surface.
  */
object Graft {
  def init(spark: SparkSession, sfDir: String): Unit = {
    Tables.registerAll(spark, sfDir)
    GraftExtensions.install(spark)
  }
}
