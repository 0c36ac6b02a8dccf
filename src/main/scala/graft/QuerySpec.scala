package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract: a named Spark
  * query over a scale-factor directory, plus (when SQL-expressible) the
  * equivalent DuckDB SQL the driver uses as a correctness oracle.
  *
  * Column names in `run` and `oracle` MUST match exactly (the driver sorts
  * columns by name before hashing values). Numeric determinism convention:
  * sums of doubles go through DECIMAL(30,6) so both engines produce
  * bit-identical results regardless of partitioning/accumulation order
  * (see [[graft.queries.Num]]).
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")
