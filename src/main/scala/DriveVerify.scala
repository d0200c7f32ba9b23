package graftdrive
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.1"
    def time(name: String)(body: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"MARKER $name%-28s min=${times.min}%.3f s  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
      .withColumn("_g_pos", lit(0L))
      .withColumn("_g_file", input_file_name())
      .withColumn("_g_row", monotonically_increasing_id())
      .repartition(32)
    li.persist().count()

    val payload = struct(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_returnflag"))
    val recency = struct(col("_g_pos"), col("_g_file"), col("_g_row"))
    val keys = Seq(col("l_orderkey"), col("l_linenumber"))

    time("max_by_struct (current)") {
      li.groupBy(keys: _*).agg(max_by(payload, recency).as("w")).select("w.*").count()
    }
    time("window_rownum") {
      val w = Window.partitionBy(keys: _*)
        .orderBy(col("_g_pos").desc, col("_g_file").desc, col("_g_row").desc)
      li.withColumn("rn", row_number().over(w)).where(col("rn") === 1).count()
    }
    time("hash_max_packed_join") {
      // hash-agg max of a single orderable value, then join back
      val mx = li.groupBy(keys: _*).agg(max(recency).as("mr"))
      li.join(mx, li("l_orderkey") === mx("l_orderkey") &&
        li("l_linenumber") === mx("l_linenumber") &&
        recency === col("mr")).count()
    }
    println("MARKER plan_maxby=" +
      li.groupBy(keys: _*).agg(max_by(payload, recency))
        .queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Aggregate")).map(_.trim.take(60)).mkString(" || "))
    println("MARKER plan_maxstruct=" +
      li.groupBy(keys: _*).agg(max(recency))
        .queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Aggregate")).map(_.trim.take(60)).mkString(" || "))
    spark.stop()
  }
}
