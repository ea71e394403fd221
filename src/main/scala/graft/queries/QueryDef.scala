package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demo: a Spark implementation over the synthetic
  * tables plus (when SQL-expressible) an equivalent DuckDB oracle query.
  * Names key into SURVEY.md §2's operator inventory.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
