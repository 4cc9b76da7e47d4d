package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.TableSpec

/** Raw-layer change-event sources.
  *
  * The reference subscribes to a Debezium Kafka topic with SASL/SCRAM
  * auth (`pipelines/raw_data_handler.py:36-47`). The same builder is
  * exposed here, plus the file/rate sources tests use in Kafka's place
  * (no broker exists in this environment — the option plumbing is what
  * is under test, as the reference's own `configs/` are deploy-time
  * artifacts absent from its tree too).
  */
object RawSource {

  /** The full Kafka option map, as a PURE function so the plumbing is
    * unit-testable without a broker: earliest offsets, no
    * fail-on-data-loss (late/duplicate handling is downstream batch
    * dedup), optional SASL/SCRAM-SHA-256 block. [[kafkaStream]] applies
    * exactly this map.
    */
  def kafkaOptions(spec: TableSpec, bootstrapServers: String,
                   saslUser: Option[String] = None,
                   saslPassword: Option[String] = None): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> spec.kafkaTopic,
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "false")
    // one-sided credentials are a misconfiguration (e.g. the password
    // env var unset) — fail fast rather than silently connecting
    // without SASL
    require(saslUser.isDefined == saslPassword.isDefined,
      "kafkaOptions: saslUser and saslPassword must be supplied together")
    val sasl = for (u <- saslUser; p <- saslPassword) yield Map(
      "kafka.security.protocol" -> "SASL_PLAINTEXT",
      "kafka.sasl.mechanism" -> "SCRAM-SHA-256",
      "kafka.sasl.jaas.config" ->
        ("org.apache.kafka.common.security.scram.ScramLoginModule required " +
          s"""username="$u" password="$p";"""))
    base ++ sasl.getOrElse(Map.empty)
  }

  /** S1 — Kafka streaming source with the reference's exact options
    * ([[kafkaOptions]]).
    */
  def kafkaStream(spark: SparkSession, spec: TableSpec,
                  bootstrapServers: String,
                  saslUser: Option[String] = None,
                  saslPassword: Option[String] = None): DataFrame =
    spark.readStream
      .format("kafka")
      .options(kafkaOptions(spec, bootstrapServers, saslUser, saslPassword))
      .load()

  /** File-based stream standing in for Kafka in tests: a directory of
    * parquet `(timestamp, value)` envelopes.
    */
  def fileStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = "timestamp TIMESTAMP, value STRING"
    spark.readStream.schema(schema).parquet(dir)
  }
}
