package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark DataFrame program plus (where the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB SQL oracle
  * run on the same parquet tables. Column names MUST match between the
  * two — the driver sorts columns by name before hashing values.
  *
  * @param headline included in Bench.scala's timed set
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

trait QueryModule {
  def queries: Seq[GraftQuery]
}
