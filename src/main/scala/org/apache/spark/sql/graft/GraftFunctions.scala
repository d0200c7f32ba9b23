package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * SQL-surface registration of the graft kernel functions, so pure-SQL
 * sessions (`spark.sql(...)`, JDBC/Thrift users of the DSv2 catalog) can
 * call the same codegen'd expressions the Scala operators use:
 *
 *   graft_dot(a, b)          codegen'd array<double> dot product
 *   graft_fingerprint(text)  normalized content hash (exact-dedup key)
 *   graft_simhash(text)      64-bit SimHash signature
 *   graft_lang(text)         n-gram-marker language id
 *   graft_hash_bucket(id, n) deterministic md5 bucket in [0, n)
 *   graft_token_count(text)  whitespace token count
 *   graft_quality(text)      heuristic quality bucket (ok/too_short/...)
 *   graft_shard(id, seed, n) deterministic training-shard assignment
 *
 * Two registration paths: `GraftSparkExtensions` injects them at session
 * build (`spark.sql.extensions=graft.spark.GraftSparkExtensions`), and
 * [[register]] adds them to an already-running session (what
 * `graft.Graft.registerFunctions` calls). Builders are thin wrappers over
 * the Column-expression operators — one definition, both surfaces.
 */
object GraftFunctions {

  private def c(e: Expression): Column = ExpressionUtils.column(e)
  /** EAGER Column → Expression conversion. ExpressionUtils.expression wraps
    * the column in a lazy ColumnNodeExpression that the analyzer never
    * descends into (its inner UnresolvedFunctions survive to codegen and
    * throw); the converter inlines the real catalyst tree instead. */
  private def e(col: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(col.node)

  /** Package bridge: eager Column → catalyst Expression for planners outside
    * the sql package (StatsSkip rowFilter translation). */
  def expressionOf(col: Column): Expression = e(col)

  /** Package bridge: catalyst Expression → Column for operators outside the
    * sql package (the Iceberg transform kernels' StaticInvoke columns). */
  def columnOf(expr: Expression): Column = c(expr)

  /** Package bridge: catalyst predicate → data-source Filter (protected[sql]
    * in DataSourceStrategy) for the stats-pruning DSv2 scan builder. */
  def toSourceFilter(e: Expression): Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)

  /** (name, arity, builder) for every SQL function. */
  val all: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", 2, args => DotProductExpr(args(0), args(1))),
    ("graft_fingerprint", 1,
      args => e(graft.operators.TextOps.fingerprint(c(args(0))))),
    ("graft_simhash", 1,
      args => e(graft.operators.Dedup.simhash(c(args(0))))),
    ("graft_lang", 1,
      args => e(graft.operators.TextOps.langId(c(args(0))))),
    ("graft_hash_bucket", 2,
      args => e(graft.operators.TextOps.hashBucket(c(args(0)), c(args(1))))),
    ("graft_token_count", 1,
      args => e(graft.operators.TextOps.tokenCount(c(args(0))))),
    ("graft_quality", 1,
      args => e(graft.operators.TextOps.qualityBucket(c(args(0))))),
    ("graft_shard", 3,
      args => e(graft.operators.TextOps.shardOf(c(args(0)), c(args(1)), c(args(2))))))

  private def checkedBuilder(name: String, arity: Int,
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      require(args.length == arity,
        s"$name expects $arity argument(s), got ${args.length}")
      b(args)
    }

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(GraftFunctions.getClass.getCanonicalName, name)

  /** Register into a live session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    all.foreach { case (name, arity, b) =>
      registry.createOrReplaceTempFunction(name, checkedBuilder(name, arity, b), "built-in")
    }
  }

  /** Extension-injection descriptors for SparkSessionExtensions. */
  def injectable: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    all.map { case (name, arity, b) =>
      (FunctionIdentifier(name), info(name), checkedBuilder(name, arity, b))
    }

  // ------------------------------------------------- table-valued functions

  /** SQL surface for the zipper read (round-10):
    * {{{
    *   SELECT * FROM graft_read_zipped('<root>', 'ns.t')                 -- all groups
    *   SELECT * FROM graft_read_zipped('<root>', 'ns.t', 'nums,text')    -- subset
    *   SELECT * FROM graft_read_zipped('<root>', 'ns.t', '', 'k = 5')    -- pushed filter
    *   SELECT * FROM graft_read_zipped('<root>', 'ns.t', '', '', 1700000000000) -- asOf
    * }}}
    * The 4th argument is a SQL predicate string handed to
    * `ReadOptions.rowFilter`, so key-only conjuncts push into each column
    * group's plan (manifest prune + pre-join filter) — a WHERE clause
    * outside the TVF cannot reach through the zip's full-outer joins.
    * `''` means no filter (mirrors graft_read — needed to reach the asOf
    * argument). The 5th is `ReadOptions.asOf` committed-txn millis, the
    * same time-travel `readZipped` honors in the Scala API.
    * Arguments must be foldable (resolved at analysis time). */
  private def readZippedPlan(args: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(args.lengthIs >= 2 && args.lengthIs <= 5,
      s"graft_read_zipped(root, table[, groups[, where[, asOf]]]) — got ${args.length} argument(s)")
    def str(i: Int, what: String): String = strArg(args, i, "graft_read_zipped", what)
    val spark = SparkSession.active
    val root = str(0, "root")
    val table = str(1, "table")
    val groups =
      if (args.lengthIs >= 3)
        str(2, "groups").split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Nil
    val rowFilter =
      if (args.lengthIs >= 4) Some(str(3, "where")).filter(_.nonEmpty)
        .map(w => c(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          .sessionState.sqlParser.parseExpression(w)))
      else None
    val asOf =
      if (args.lengthIs >= 5) {
        val e = args(4)
        require(e.foldable && e.dataType.isInstanceOf[org.apache.spark.sql.types.IntegralType],
          "graft_read_zipped: asOf must be an integer literal (committed txn time millis, " +
            "same semantics as ReadOptions.asOf)")
        Option(e.eval()).map(_.toString.toLong)
      } else None
    new graft.catalog.GraftCatalog(spark, root)
      .readZipped(table, groups,
        graft.catalog.ReadOptions(rowFilter = rowFilter, asOf = asOf))
      .queryExecution.analyzed
  }

  /** SQL surface for the full merge-on-read read path (round-10):
    * {{{
    *   SELECT * FROM graft_read('<root>', 'ns.t')
    *   SELECT * FROM graft_read('<root>', 'ns.t', 'k = 5')        -- pushed filter
    *   SELECT * FROM graft_read('<root>', 'ns.t', '', 1700000000000) -- asOf txn millis
    * }}}
    * The DSv2 relation (`SELECT … FROM graft.ns.t`) deliberately refuses
    * tables with unresolved merge deltas / unmaterialized defaults /
    * stale renames ("compact() first") because a file-scan delegate
    * cannot express the LSM fold; this TVF routes SQL readers through
    * `GraftCatalog.readTable`, which can. The filter string reaches
    * `ReadOptions.rowFilter`, so manifest stats pruning and the merge
    * key-only prune rule apply exactly as in the Scala API. */
  private def readTablePlan(args: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(args.lengthIs >= 2 && args.lengthIs <= 4,
      s"graft_read(root, table[, where[, asOf]]) — got ${args.length} argument(s)")
    val spark = SparkSession.active
    val root = strArg(args, 0, "graft_read", "root")
    val table = strArg(args, 1, "graft_read", "table")
    val rowFilter =
      if (args.lengthIs >= 3) Some(strArg(args, 2, "graft_read", "where")).filter(_.nonEmpty)
        .map(w => c(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          .sessionState.sqlParser.parseExpression(w)))
      else None
    val asOf =
      if (args.lengthIs >= 4) {
        val e = args(3)
        require(e.foldable && e.dataType.isInstanceOf[org.apache.spark.sql.types.IntegralType],
          "graft_read: asOf must be an integer literal (committed txn time millis, " +
            "same semantics as ReadOptions.asOf / SQL TIMESTAMP AS OF)")
        Option(e.eval()).map(_.toString.toLong)
      } else None
    new graft.catalog.GraftCatalog(spark, root)
      .readTable(table, graft.catalog.ReadOptions(rowFilter = rowFilter, asOf = asOf))
      .queryExecution.analyzed
  }

  /** SQL observability surface (round-11): the catalog's metadata views,
    * reachable without Scala — completes TVF symmetry with `historyDF` /
    * `manifestTable`:
    * {{{
    *   SELECT * FROM graft_history('<root>')                    -- txn log
    *   SELECT * FROM graft_manifest('<root>', 'ns.t')           -- file layout
    *   SELECT * FROM graft_manifest('<root>', 'ns.t', 1700000000000) -- asOf
    * }}}
    * Both are metadata-sized LocalRelations (txn records / manifest
    * entries), never data scans — safe to query on any table size. */
  private def historyPlan(args: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(args.lengthIs == 1,
      s"graft_history(root) — got ${args.length} argument(s)")
    new graft.catalog.GraftCatalog(SparkSession.active,
      strArg(args, 0, "graft_history", "root"))
      .historyDF().queryExecution.analyzed
  }

  private def manifestPlan(args: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(args.lengthIs >= 2 && args.lengthIs <= 3,
      s"graft_manifest(root, table[, asOf]) — got ${args.length} argument(s)")
    val asOf =
      if (args.lengthIs >= 3) {
        val e = args(2)
        require(e.foldable && e.dataType.isInstanceOf[org.apache.spark.sql.types.IntegralType],
          "graft_manifest: asOf must be an integer literal (committed txn time millis)")
        Option(e.eval()).map(_.toString.toLong)
      } else None
    new graft.catalog.GraftCatalog(SparkSession.active,
      strArg(args, 0, "graft_manifest", "root"))
      .manifestTable(strArg(args, 1, "graft_manifest", "table"), asOf)
      .queryExecution.analyzed
  }

  /** One-row layout-health verdict for a compacted bucketed base —
    * `SELECT * FROM graft_recluster_advice('<root>', 'ns.t')` — the SQL
    * route to the advisor write-triggered auto-compaction acts on
    * (Catalog.reclusterAdviceDF). Empty when the table has no compacted
    * bucketed base. Manifest metadata only, never a data scan. */
  private def reclusterAdvicePlan(args: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(args.lengthIs == 2,
      s"graft_recluster_advice(root, table) — got ${args.length} argument(s)")
    new graft.catalog.GraftCatalog(SparkSession.active,
      strArg(args, 0, "graft_recluster_advice", "root"))
      .reclusterAdviceDF(strArg(args, 1, "graft_recluster_advice", "table"))
      .queryExecution.analyzed
  }

  private def strArg(args: Seq[Expression], i: Int, fn: String, what: String): String = {
    val e = args(i)
    require(e.foldable && e.dataType == org.apache.spark.sql.types.StringType,
      s"$fn: $what must be a string literal")
    val v = e.eval()
    require(v != null, s"$fn: $what must not be null")
    v.toString
  }

  private def tableFns
      : Seq[(String, Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] =
    Seq("graft_read_zipped" -> (readZippedPlan _),
      "graft_read" -> (readTablePlan _),
      "graft_history" -> (historyPlan _),
      "graft_manifest" -> (manifestPlan _),
      "graft_recluster_advice" -> (reclusterAdvicePlan _))

  /** Extension-injection descriptors for SparkSessionExtensions
    * (`injectTableFunction`). */
  def tableInjectable: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] =
    tableFns.map { case (name, b) => (FunctionIdentifier(name), info(name), b) }

  /** Register the TVFs into a live session. Idempotent. */
  def registerTable(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry
    tableFns.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
