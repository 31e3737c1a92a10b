package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** The reference's schema vocabulary is the public CommonModel field
  * type system (types named in /root/reference/patterns/node/node.py:269-283
  * `schema_hints={"field1": "Text", "field2": "Integer"}`).
  * This maps it onto Catalyst types and applies post-inference hints.
  */
object CommonModel {

  val toCatalyst: Map[String, DataType] = Map(
    "Text" -> StringType,
    "LongText" -> StringType,
    "Integer" -> LongType,
    "Float" -> DoubleType,
    "Decimal" -> DecimalType(38, 9),
    "Boolean" -> BooleanType,
    "Date" -> DateType,
    "DateTime" -> TimestampType,
    "Time" -> StringType,
    "Json" -> StringType,
    "Binary" -> BinaryType)

  def fromCatalyst(dt: DataType): String = dt match {
    case StringType => "Text"
    case ByteType | ShortType | IntegerType | LongType => "Integer"
    case FloatType | DoubleType => "Float"
    case _: DecimalType => "Decimal"
    case BooleanType => "Boolean"
    case DateType => "Date"
    case TimestampType | TimestampNTZType => "DateTime"
    case BinaryType => "Binary"
    case _ => "Json" // arrays/maps/structs round-trip as Json documents
  }

  /** Resolve a CommonModel name or a Catalyst DDL string to a type. */
  def resolve(t: String): DataType =
    toCatalyst.getOrElse(t, DataType.fromDDL(t))

  // ---- named-schema registry ------------------------------------------
  // Table.init(schema=...) accepts "a CommonModel Schema object or str
  // name" (node.py:269-283; store nodes reference schemas by name,
  // edit.py:133) — the name resolves against a registry the app/engine
  // populates at startup.
  private val named =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  def registerSchema(name: String, schema: StructType): Unit =
    named.put(name, schema)
  def registerSchema(name: String, fields: Seq[(String, String)]): Unit =
    named.put(name, structFromDict(fields))
  def namedSchema(name: String): Option[StructType] = Option(named.get(name))

  /** Resolve a registered schema name, else parse as struct DDL. */
  def resolveSchema(nameOrDdl: String): StructType =
    namedSchema(nameOrDdl).getOrElse(StructType.fromDDL(nameOrDdl))

  /** schema_hints semantics (node.py:283): override the *inferred* type
    * of individual fields by casting after the fact. Unknown fields are
    * ignored (the reference treats hints as advisory).
    */
  def applyHints(df: DataFrame, hints: Map[String, String]): DataFrame =
    hints.foldLeft(df) { case (d, (field, t)) =>
      if (d.columns.contains(field)) d.withColumn(field, col(field).cast(resolve(t)))
      else d
    }

  /** Declared-schema dict {"field": "Type"} → StructType (node.py:269-283). */
  def structFromDict(fields: Seq[(String, String)]): StructType =
    StructType(fields.map { case (n, t) => StructField(n, resolve(t)) })
}
