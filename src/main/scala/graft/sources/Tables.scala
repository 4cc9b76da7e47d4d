package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic parquet tables
  * (`/root/testdata/sf*`, see TESTDATA.md).
  */
object Tables {

  /** Read one table from a scale-factor directory.
    *
    * `events.ts` is written as a parquet NANOS timestamp, which Spark's
    * vectorized reader rejects (`PARQUET_TYPE_ILLEGAL`). We read it as a
    * long (`nanosAsLong`, set once at session build in
    * [[graft.session.Sessions]] — not mutated here) and truncate to
    * microseconds — the same truncation DuckDB applies when it reads
    * NANOS into its microsecond-precision TIMESTAMP, so oracle
    * comparisons line up.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
