package graft

import java.nio.file.{Files, Paths}

import scala.collection.JavaConverters._

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for registered queries to files — the
  * optimization-round evidence channel (plans/rNN/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [name1,name2,...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
  * Uses the same session shape as Bench so the captured plans are the ones
  * the bench actually executes. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // EnvConf: capture plans under a forced conf (the rank gates are
    // volume-based, so before/after pairs at fixture scale need
    // graft.merge.fileRank.{maxFiles=0, minRows=0} respectively).
    val spark = EnvConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          // Eager operators run at fn() time and return checkpoint-backed
          // frames whose own explain is just an RDD scan — capture their
          // EXECUTED internal plans through the materialize hook and append
          // them to the query's plan file.
          val hookDir = Files.createTempDirectory(s"plandump_$name")
          spark.conf.set("graft.explain.dir", hookDir.toString)
          val df = try fn(spark, sfDir)
            finally spark.conf.unset("graft.explain.dir")
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val internals = {
            val s = Files.list(hookDir)
            try s.iterator().asScala.toSeq.sortBy(_.getFileName.toString).map(p =>
              s"\n\n== Eager-materialized internal plan (${p.getFileName}, executed) ==\n" +
                Files.readString(p)).mkString
            finally s.close()
          }
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan + internals)
          println(s"[plandump] wrote $name")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
