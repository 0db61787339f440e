package graft.sources

import org.apache.spark.sql.{GraftSqlShim, SparkSession}

/** The `table_changes` SQL table-valued function — Delta-parity ergonomics
  * for the batch change data feed on the SQL surface:
  *
  * {{{
  *   SELECT * FROM table_changes('graft.ns.t', 3, 7)    -- catalog identifier
  *   SELECT * FROM table_changes('/path/to/table', 0, 5) -- path form
  * }}}
  *
  * Both forms serve the INCLUSIVE `[startingVersion, endingVersion]`
  * window of [[graft.io.CommitLog.changes]] with `_change_type` /
  * `_commit_version` appended — exactly what the `readChangeFeed` reader
  * option and the `.changes` metadata table serve, reached from plain SQL
  * text (reader options and metadata identifiers can't carry the window
  * in a SQL string; a TVF's arguments can).
  *
  * Registered per session ([[register]], idempotent) in the session's
  * table-function registry — the same registry Spark's own `range(...)`
  * TVF resolves from, so the call analyzes like any built-in. A
  * three-part first argument resolves through the NAMED catalog when that
  * catalog is a [[GraftCatalog]]; anything containing a path separator is
  * taken as a table directory.
  */
object TableChanges {

  /** The TVF plan builder (runs at analysis; resolves against the ACTIVE
    * session) — shared by [[register]] and the
    * `graft.plans.GraftExtensions` install path. */
  private[graft] val builder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = { args =>
      val spark = SparkSession.active
      require(args.length == 3,
        "table_changes(table, startingVersion, endingVersion) takes exactly 3 arguments")
      def lit(i: Int, what: String): Any = {
        require(args(i).foldable, s"table_changes: $what must be a literal")
        val v = args(i).eval()
        require(v != null, s"table_changes: $what must not be NULL")
        v
      }
      val target = lit(0, "table") match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case other => throw new IllegalArgumentException(
          s"table_changes: table must be a string, got $other")
      }
      def version(i: Int, what: String): Long = lit(i, what) match {
        case n: java.lang.Number => n.longValue
        case other => throw new IllegalArgumentException(
          s"table_changes: $what must be an integer version, got $other")
      }
      val startV = version(1, "startingVersion")
      val endV = version(2, "endingVersion")
      val path =
        if (target.contains("/") || target.contains(java.io.File.separator)) target
        else target.split('.') match {
          case parts if parts.length >= 3 =>
            GraftSqlShim.catalogPlugin(spark, parts.head) match {
              case g: GraftCatalog => g.resolveTableDir(parts.tail.mkString("."))
              case other => throw new IllegalArgumentException(
                s"table_changes: catalog '${parts.head}' is not a graft " +
                  s"catalog (got ${other.getClass.getName})")
            }
          case _ => throw new IllegalArgumentException(
            s"table_changes: '$target' is neither a table directory nor a " +
              "'<catalog>.<ns>.<table>' identifier")
        }
      GraftSqlShim.analyzedPlan(
        spark.read.format("graftlog")
          .option("readChangeFeed", "true")
          .option("startingVersion", startV)
          .option("endingVersion", endV)
          .load(path))
    }

  def register(spark: SparkSession): Unit =
    GraftSqlShim.registerTableFunction(spark, "table_changes")(builder)
}
