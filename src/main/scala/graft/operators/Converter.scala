package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Iceberg-converter compute core: turn EQUALITY deletes into POSITION
 * deletes over a set of parquet data files — the reference
 * converter_session's central computation
 * (compute/converter/converter_session.py:46-250, steps/convert.py,
 * steps/dedupe.py), minus the pyiceberg snapshot-commit plumbing (no
 * Iceberg runtime in this environment; the emitted (file_path, pos) frame
 * is exactly what an Iceberg position-delete file contains).
 *
 * Spark-first restatement: one scan with `_metadata.file_path/row_index`
 * joined against the delete keys — the reference's per-bucket task wave and
 * hash-join batching collapse into a key-partitioned shuffle join.
 */
object Converter {

  /** Position deletes for rows of `dataFiles` whose key columns match a row
    * of `deleteKeys` (null-safe equality, composite keys). Output:
    * (file_path, pos) — Iceberg position-delete content. */
  def equalityToPositionDeletes(
      spark: SparkSession, dataFiles: Seq[String], schema: StructType,
      deleteKeys: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val scan = spark.read.schema(schema).parquet(dataFiles: _*)
      .select((keyCols.map(col) :+ col("_metadata.file_path").as("file_path")
        :+ col("_metadata.row_index").as("pos")): _*)
    val keys = deleteKeys.select(keyCols.map(c => col(c).as(s"_d_$c")): _*).distinct()
    val cond = keyCols.map(c => scan(c) <=> keys(s"_d_$c")).reduce(_ && _)
    scan.join(keys, cond, "left_semi").select("file_path", "pos")
  }

  /**
   * Primary-key uniqueness enforcement across data files — the converter's
   * dedupe step (steps/dedupe.py): among rows sharing a key, every row
   * EXCEPT the winner (highest sequence number, then file path, then
   * position) becomes a position delete.
   */
  def duplicateKeyPositionDeletes(
      spark: SparkSession, dataFiles: Seq[(String, Long)], schema: StructType,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    import spark.implicits._
    // _metadata.file_path is a file:// URI; normalize both sides to a plain
    // path before joining sequence numbers.
    def norm(c: org.apache.spark.sql.Column) = regexp_replace(c, "^file:/+", "/")
    val seq = broadcast(dataFiles.toDF("file_path", "seq_num")
      .withColumn("file_path", norm(col("file_path"))))
    val scan = spark.read.schema(schema).parquet(dataFiles.map(_._1): _*)
      .select((keyCols.map(col) :+ norm(col("_metadata.file_path")).as("file_path")
        :+ col("_metadata.row_index").as("pos")): _*)
      .join(seq, Seq("file_path"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("seq_num").desc, col("file_path").desc, col("pos").desc)
    scan.withColumn("_rn", row_number().over(w))
      .where(col("_rn") > 1)
      .select("file_path", "pos")
  }
}
