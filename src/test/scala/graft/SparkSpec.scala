package graft

import scala.collection.JavaConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSpark.spark

  private val createdTmp = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()

  def tmpDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    createdTmp.synchronized { createdTmp += p }
    p.toString
  }

  /** Suite fixtures delete on completion: a full run otherwise leaves
    * ~30 GB of temp tables behind (the million-entry manifest fixtures
    * alone are 0.4 GB each), and accumulated runs filled the disk
    * mid-round-15. Best-effort — a failing suite keeps its dirs for
    * inspection only if the JVM dies before afterAll. */
  override def afterAll(): Unit = {
    createdTmp.synchronized {
      createdTmp.foreach { d =>
        try {
          val walk = java.nio.file.Files.walk(d)
          try walk.iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
          finally walk.close()
        } catch { case _: Exception => () }
      }
      createdTmp.clear()
    }
    super.afterAll()
  }

  def sf: String = "/root/testdata/sf0.001"
}
