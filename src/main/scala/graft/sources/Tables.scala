package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampType}

/** Loaders for the driver's synthetic parquet tables
  * (`/root/testdata/sf*`, see TESTDATA.md).
  */
object Tables {

  /** Normalize `events.ts` to a plain UTC `TimestampType` column across
    * driver testdata generations:
    *
    *  - older generators wrote parquet NANOS, which Spark's vectorized
    *    reader surfaces as a nanosecond `long` (via
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, set once at session
    *    build in [[graft.session.Sessions]]) — truncate to micros, the
    *    same truncation DuckDB applies reading NANOS into its
    *    microsecond TIMESTAMP;
    *  - newer generators write MICROS with no timezone, which Spark
    *    infers as `TIMESTAMP_NTZ` — reinterpret as a UTC instant (the
    *    session timezone is pinned to UTC, so the cast is
    *    wall-clock-preserving and matches DuckDB's naive read).
    *
    * Either way downstream code and the oracle see identical values.
    */
  def normalizedTs(dt: DataType): Column = dt match {
    case LongType => timestamp_micros(expr("ts div 1000"))
    case _        => col("ts").cast(TimestampType)
  }

  /** Read one table from a scale-factor directory. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.withColumn("ts", normalizedTs(df.schema("ts").dataType))
    else df
  }
}
