package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.catalog._
import graft.model._
import graft.txn.ConcurrentTxnConflict

/** MVCC under real contention: concurrent writers racing on the same table
  * must never lose an update — losers abort cleanly and succeed on retry. */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("eight concurrent writers, optimistic retry, zero lost updates") {
    val cat = new GraftCatalog(spark, tmpDir("graft-conc"))
    cat.createTable("c.t", org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("writer", org.apache.spark.sql.types.IntegerType),
      FieldMeta.field("attempt", org.apache.spark.sql.types.IntegerType))))
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val writers = 8
    try {
      val futures = (1 to writers).map { w =>
        Future {
          var attempt = 0
          var done = false
          while (!done) {
            attempt += 1
            try {
              cat.writeToTable(Seq((w, attempt)).toDF("writer", "attempt"),
                "c.t", WriteMode.Add)
              done = true
            } catch {
              case _: ConcurrentTxnConflict =>
                Thread.sleep(scala.util.Random.nextInt(30).toLong)
            }
          }
          attempt
        }
      }
      val attempts = Await.result(Future.sequence(futures), 5.minutes)
      // Every writer committed exactly once; nothing lost, nothing doubled.
      val rows = cat.readTable("c.t").collect()
        .map(r => (r.getInt(0), r.getInt(1)))
      assert(rows.length == writers, s"expected $writers rows, got ${rows.toSeq}")
      assert(rows.map(_._1).toSet == (1 to writers).toSet)
      // NOTE: no assert that a conflict actually happened — under a loaded
      // machine the 8 writers can serialize naturally and zero retries is a
      // legitimate outcome; asserting scheduling behavior made this flaky.
      // Delta log: one committed delta per writer, distinct stream positions.
      val log = cat.deltaLog("c.t")
      assert(log.size == writers)
      assert(log.map(_.streamPosition).distinct.size == writers)
    } finally pool.shutdown()
  }
}
