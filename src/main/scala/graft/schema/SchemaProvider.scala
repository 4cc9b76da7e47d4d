package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DataType, StructType}

import graft.ops.CdcOps

/** Payload-schema strategy for the parse stage (SURVEY §1.3, §7.4.1).
  *
  * The reference always re-infers the JSON schema per run
  * (`daily_data_handler.py:61`) — drift-tolerant but hazardous (a day of
  * all-null strings changes a column's type). It also ships a declared-
  * schema loader that is dead code (`_load_json_schema`,
  * `daily_data_handler.py:45-49`, defined in both handlers, called by
  * neither). Here both modes are live:
  *
  *  - [[Inferred]] — per-batch inference, the reference's behavior;
  *  - [[Declared]] — a fixed `StructType`, the resurrected declared
  *    mode: deterministic types, no inference job (one fewer full pass
  *    over the batch — material at 100 TB), new unknown columns ignored;
  *  - [[DeclaredWithDrift]] — declared as the base, but widened by
  *    inference so drift columns still appear (union of both).
  */
sealed trait SchemaProvider {
  def schemaFor(raw: DataFrame): StructType
}

object SchemaProvider {

  case object Inferred extends SchemaProvider {
    def schemaFor(raw: DataFrame): StructType = CdcOps.inferPayloadSchema(raw)
  }

  final case class Declared(schema: StructType) extends SchemaProvider {
    def schemaFor(raw: DataFrame): StructType = schema
  }

  final case class DeclaredWithDrift(base: StructType) extends SchemaProvider {
    def schemaFor(raw: DataFrame): StructType = {
      val inferred = CdcOps.inferPayloadSchema(raw)
      val extra = inferred.fields.filterNot(f => base.fieldNames.contains(f.name))
      StructType(base.fields ++ extra)
    }
  }

  /** Parse a schema JSON document (the `json_schemas/TEST_schema.json`
    * format — a serialized Spark StructType, exactly what the
    * reference's dead loader fed to `StructType.fromJson`).
    */
  def fromJson(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]

  /** Load a declared schema from a file path. */
  def fromFile(path: String): StructType =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
