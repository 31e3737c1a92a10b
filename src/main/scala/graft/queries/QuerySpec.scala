package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, driver-checkable query.
  *
  * @param name   stable registry key (drives `SparkEntry.queries`)
  * @param run    Spark-side implementation: (session, sfDir) => result
  * @param oracle equivalent DuckDB SQL over the same parquet tables;
  *               None => the driver records a weaker rows-only check
  *               (used for nondeterministic or non-SQL-expressible ops).
  *
  * Determinism contract (both sides must satisfy it, because the driver
  * hash-compares canonicalized results):
  *  - money aggregates go through DECIMAL so double summation order can
  *    never flip a round() boundary;
  *  - every windowed / top-k query carries a total tie-break order;
  *  - column names match the oracle exactly (the compare sorts columns
  *    by name before hashing).
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  /** Query expressed as Spark SQL over registered fixture views. */
  def sql(name: String, sparkSql: String, oracleSql: String): QuerySpec =
    QuerySpec(
      name,
      (spark, dir) => { graft.Fixtures.registerAll(spark, dir); spark.sql(sparkSql) },
      Some(oracleSql))

  /** Same SQL text runs on both engines (shared ANSI dialect). */
  def shared(name: String, q: String): QuerySpec = sql(name, q, q)

  /** DataFrame-API query with a DuckDB oracle. */
  def df(name: String, oracleSql: String)(
      run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, run, Some(oracleSql))

  /** Rows-only check (no oracle). */
  def unchecked(name: String)(
      run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, run, None)
}
