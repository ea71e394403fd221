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

/** Shared embedding-parity primitives (used by the dedup and ANN queries):
  * quantize float vectors to BIGINT (floor(x*1e6)) so dot products and
  * norms are exact integer arithmetic — bit-identical across engines and
  * order-independent at any parallelism. */
private[graft] object EmbeddingParity {
  val quantSql: String =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
  val quantExpr: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions
      .expr("transform(embedding, x -> bigint(floor(cast(x as double) * 1000000)))")
}
