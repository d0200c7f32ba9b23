package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.{FooterStats, StatsSkip}

/**
 * Property test: data-skipping SOUNDNESS. For randomized file contents and
 * randomized predicates, a file the skip index drops must contain ZERO rows
 * satisfying the predicate (checked by actually evaluating the predicate
 * with Spark over that file). Completeness (keeping prunable files) is a
 * performance property and intentionally not asserted.
 */
class StatsSkipPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260814L)

  private val schema = StructType(Seq(
    StructField("i", LongType), StructField("d", DoubleType),
    StructField("s", StringType), StructField("dt", DateType),
    StructField("ts", TimestampType), StructField("b", BooleanType)))

  /** One synthetic file: a contiguous-ish value region with noise + nulls. */
  private def fileDf(seed: Int): DataFrame = {
    val base = seed * 1000
    spark.range(0, 200).select(
      when(rand(seed) < 0.1, lit(null)).otherwise(col("id") + base).as("i"),
      when(rand(seed + 1) < 0.1, lit(null))
        .otherwise((col("id") + base) / 7.0).as("d"),
      when(rand(seed + 2) < 0.1, lit(null))
        .otherwise(concat(lit("k"), format_string("%06d", col("id") + base))).as("s"),
      date_add(lit(Date.valueOf("2020-01-01")), (col("id") + base).cast("int") % 3000).as("dt"),
      timestamp_seconds(lit(1577836800L) + (col("id") + base) * 3600).as("ts"),
      (col("id") % 2 === 0).as("b"))
  }

  private def predicates(seed: Int): Seq[Column] = {
    val r = new scala.util.Random(seed)
    def li = lit(r.nextInt(12000) - 1000L)
    def ld = lit((r.nextInt(12000) - 1000) / 7.0)
    def ls = lit(f"k${r.nextInt(12000)}%06d")
    def ldt = lit(Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(r.nextInt(3000)).toString))
    def lts = lit(new Timestamp((1577836800L + r.nextInt(12000) * 3600L) * 1000L))
    val atoms: Seq[Column] = Seq(
      col("i") > li, col("i") <= li, col("i") === li, col("i").isin(li, li, li),
      col("d") < ld, col("d") >= ld,
      col("s") > ls, col("s") === ls, col("s").startsWith("k00"),
      col("dt") <= ldt, col("dt") > ldt,
      col("ts") < lts, col("ts") >= lts,
      col("b") === (r.nextInt(2) == 0),
      col("i").isNull, col("s").isNotNull)
    val a = atoms(r.nextInt(atoms.size))
    val b = atoms(r.nextInt(atoms.size))
    val c = atoms(r.nextInt(atoms.size))
    Seq(a, a && b, a || b, (a && b) || c, a && (b || c))
  }

  test("a skipped file never contains a matching row (120 random cases)") {
    val conf = spark.sessionState.newHadoopConf()
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      val files = (0 until 6).map { seed =>
        val dir = tmpDir(s"prop-$seed")
        fileDf(seed).coalesce(1).write.mode("overwrite").parquet(dir)
        val p = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray
          .map(_.toString).filter(_.endsWith(".parquet")).head
        (p, FooterStats.read(p, conf))
      }
      var skips = 0
      for (seed <- 0 until 4; pred <- predicates(rnd.nextInt())) {
        val filters = StatsSkip.translate(pred)
        for ((path, (rows, stats)) <- files) {
          val keep = filters.forall(f => StatsSkip.keep(f, schema, stats, rows))
          if (!keep) {
            skips += 1
            val matching = spark.read.schema(schema).parquet(path).where(pred).count()
            assert(matching == 0,
              s"UNSOUND skip: $pred dropped $path which has $matching matching rows " +
                s"(stats: ${stats.toSeq.sortBy(_._1).mkString("; ")})")
          }
        }
      }
      // the generator must actually exercise skipping or the test is hollow
      assert(skips >= 20, s"only $skips skip decisions exercised")
    } finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
  }
}
