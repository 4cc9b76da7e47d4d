package graft.model

/** Debezium-style CDC operation codes, as routed by the reference at
  * `pipelines/daily_data_handler.py:33-35` / `history_data_handler.py:38-40`.
  */
object OpCode {
  val Create = "c"   // insert
  val Read   = "r"   // snapshot read (treated as insert)
  val Update = "u"
  val Delete = "d"
  val insertCodes: Seq[String] = Seq(Create, Read)
}

/** Per-table replication spec. Mirrors the reference's env-var-driven
  * settings dict (`daily_load.py:11-29`, `raw_data_handler.py:18-20`):
  * primary keys, lake paths, Kafka topic, and history-layer mode.
  *
  * @param mode "merge" (upsert current-state replica) or "increment"
  *             (append-only fact table), per `history_load.py:18-22`.
  */
final case class TableSpec(
    name: String,
    db: String,
    primaryKeys: Seq[String],
    dataDir: String,
    checkpointDir: String,
    kafkaTopic: String,
    mode: String = "merge",
    /** LWW ordering: first column is the event timestamp, remaining are
      * deterministic tiebreakers (e.g. Kafka offset). The reference orders
      * by timestamp only (`daily_data_handler.py:107`), which is
      * nondeterministic under ties — a documented deliberate divergence
      * (SURVEY §7.4.2).
      */
    orderColumns: Seq[String] = Seq("timestamp"),
    /** Lake file format. The reference writes ORC everywhere
      * (`raw_data_handler.py:86`, `daily_data_handler.py:134`); parquet
      * is this engine's default (the driver testdata is parquet), with
      * "orc" as the parity switch — both columnar, same write paths.
      */
    format: String = "parquet"
) {
  def dailyTable: String = s"$db.${name}_daily"
  def historyTable: String = s"$db.${name}_history"
}

/** Typed Kafka change-event envelope: what the raw layer persists after
  * the cast projection (`raw_data_handler.py:51`).
  */
final case class ChangeEvent(timestamp: java.sql.Timestamp, value: String)
