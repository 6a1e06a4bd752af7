package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.types._

/** Iceberg type system + schema with explicit field IDs on every nested
  * field/element/key/value — the property Spark's StructType lacks and the
  * one schema evolution correctness rests on (reference: `types.go`,
  * `schema.go`). Field IDs ride into Spark as StructField metadata under
  * `parquet.field.id`, which Spark's parquet writer embeds in files and the
  * vectorized reader can resolve by (spark.sql.parquet.fieldId.*).
  */
sealed trait IcebergType {
  def isPrimitive: Boolean = true
  /** Iceberg JSON wire name (primitives) */
  def typeName: String
  override def toString: String = typeName
}

object IcebergTypes {
  case object BooleanT extends IcebergType { val typeName = "boolean" }
  case object IntT extends IcebergType { val typeName = "int" }
  case object LongT extends IcebergType { val typeName = "long" }
  case object FloatT extends IcebergType { val typeName = "float" }
  case object DoubleT extends IcebergType { val typeName = "double" }
  case object DateT extends IcebergType { val typeName = "date" }
  case object TimeT extends IcebergType { val typeName = "time" }
  case object TimestampT extends IcebergType { val typeName = "timestamp" }
  case object TimestampTzT extends IcebergType { val typeName = "timestamptz" }
  case object TimestampNsT extends IcebergType { val typeName = "timestamp_ns" }
  case object TimestampTzNsT extends IcebergType { val typeName = "timestamptz_ns" }
  case object StringT extends IcebergType { val typeName = "string" }
  case object UuidT extends IcebergType { val typeName = "uuid" }
  case object BinaryT extends IcebergType { val typeName = "binary" }
  /** v3 semi-structured variant (`types.go:915-926`); Spark 4 VariantType. */
  case object VariantT extends IcebergType { val typeName = "variant" }
  case object UnknownT extends IcebergType { val typeName = "unknown" }
  final case class FixedT(len: Int) extends IcebergType { val typeName = s"fixed[$len]" }

  /** v3 geospatial types (`types.go:928-1067`): WKB-encoded columns with a
    * CRS parameter; geography additionally carries an edge-interpolation
    * algorithm. Values have no ordering — bounds are geo envelopes, not
    * byte-comparable min/max.
    */
  final case class GeometryT(crs: String = GeoDefaults.Crs) extends IcebergType {
    val typeName = if (crs == GeoDefaults.Crs) "geometry" else s"geometry($crs)"
  }
  final case class GeographyT(crs: String = GeoDefaults.Crs,
      algorithm: String = GeoDefaults.Algorithm) extends IcebergType {
    val typeName =
      if (crs == GeoDefaults.Crs && algorithm == GeoDefaults.Algorithm) "geography"
      else if (algorithm == GeoDefaults.Algorithm) s"geography($crs)"
      else s"geography($crs, $algorithm)"
  }
  object GeoDefaults {
    val Crs = "OGC:CRS84"
    val Algorithm = "spherical"
    /** The five spec edge-interpolation algorithms (reference
      * `types.go:981-990` toGeoArrowEdgeInterpolation).
      */
    val Algorithms: Set[String] = Set("spherical", "vincenty", "thomas", "andoyer", "karney")

    /** Trim and reject empty, as GeometryTypeOf/GeographyTypeOf do
      * (`types.go:937-947,997-1008`). The default-CRS collapse is structural
      * here: the stored string equals [[Crs]] so equality and typeName
      * already normalize.
      */
    def normCrs(crs: String): String = {
      val t = crs.trim
      if (t.isEmpty) throw new IllegalArgumentException("invalid CRS: (empty string)")
      t
    }

    /** Trim + lowercase + validate against the five spec algorithms. */
    def normAlgorithm(a: String): String = {
      val t = a.trim.toLowerCase
      if (!Algorithms.contains(t))
        throw new IllegalArgumentException(s"invalid edge interpolation algorithm: $a")
      t
    }
  }

  def isGeo(t: IcebergType): Boolean = t match {
    case _: GeometryT | _: GeographyT => true
    case _ => false
  }
  final case class DecimalT(precision: Int, scale: Int) extends IcebergType {
    val typeName = s"decimal($precision, $scale)"
  }

  final case class StructT(fields: Seq[NestedField]) extends IcebergType {
    override def isPrimitive = false
    val typeName = "struct"
    def field(id: Int): Option[NestedField] = fields.find(_.id == id)
  }
  final case class ListT(elementId: Int, element: IcebergType, elementRequired: Boolean)
      extends IcebergType {
    override def isPrimitive = false
    val typeName = "list"
  }
  final case class MapT(keyId: Int, key: IcebergType, valueId: Int, value: IcebergType,
      valueRequired: Boolean) extends IcebergType {
    override def isPrimitive = false
    val typeName = "map"
  }

  /** Primitive promotion rules (`types.go:1106-1147`). */
  def promotable(from: IcebergType, to: IcebergType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (IntT, LongT) => true
    case (FloatT, DoubleT) => true
    case (DecimalT(p1, s1), DecimalT(p2, s2)) => s1 == s2 && p2 >= p1
    case (UnknownT, _) => true
    case _ => false
  }
}

final case class NestedField(
    id: Int,
    name: String,
    fieldType: IcebergType,
    required: Boolean,
    doc: Option[String] = None,
    initialDefault: Option[Any] = None,
    writeDefault: Option[Any] = None)

/** An Iceberg schema: ordered fields + schema-id + identifier fields. */
final case class IcebergSchema(
    fields: Seq[NestedField],
    schemaId: Int = 0,
    identifierFieldIds: Seq[Int] = Nil) {

  def asStruct: IcebergTypes.StructT = IcebergTypes.StructT(fields)

  lazy val idToField: Map[Int, NestedField] = {
    val b = Map.newBuilder[Int, NestedField]
    def walk(f: NestedField): Unit = {
      b += f.id -> f
      f.fieldType match {
        case IcebergTypes.StructT(fs) => fs.foreach(walk)
        case IcebergTypes.ListT(eid, et, ereq) =>
          walk(NestedField(eid, "element", et, ereq))
        case IcebergTypes.MapT(kid, kt, vid, vt, vreq) =>
          walk(NestedField(kid, "key", kt, required = true))
          walk(NestedField(vid, "value", vt, vreq))
        case _ =>
      }
    }
    fields.foreach(walk)
    b.result()
  }

  /** Top-level AND dotted nested names (iceberg path naming: `a.b`, list
    * elements as `arr.element`, map sides as `m.key`/`m.value`) so
    * predicates and stats can address nested fields.
    */
  lazy val nameToId: Map[String, Int] = {
    val b = Map.newBuilder[String, Int]
    def walk(prefix: String, f: NestedField): Unit = {
      val full = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      b += full -> f.id
      f.fieldType match {
        case IcebergTypes.StructT(fs) => fs.foreach(walk(full, _))
        case IcebergTypes.ListT(eid, et, ereq) =>
          walk(full, NestedField(eid, "element", et, ereq))
        case IcebergTypes.MapT(kid, kt, vid, vt, vreq) =>
          walk(full, NestedField(kid, "key", kt, required = true))
          walk(full, NestedField(vid, "value", vt, vreq))
        case _ =>
      }
    }
    fields.foreach(walk("", _))
    b.result()
  }
  lazy val nameToIdLower: Map[String, Int] =
    nameToId.map { case (k, v) => k.toLowerCase -> v }

  /** Canonical (dotted-path) spelling per field id — the inverse of
    * `nameToId`, which visits each field exactly once.
    */
  lazy val idToName: Map[Int, String] = nameToId.map(_.swap)

  /** Resolve a possibly-nested, possibly-case-insensitive reference to its
    * canonical dotted spelling.
    */
  def resolveName(name: String, caseSensitive: Boolean = true): Option[String] = {
    val id = if (caseSensitive) nameToId.get(name) else nameToIdLower.get(name.toLowerCase)
    id.flatMap(idToName.get)
  }

  def findField(name: String, caseSensitive: Boolean = true): Option[NestedField] = {
    val id = if (caseSensitive) nameToId.get(name) else nameToIdLower.get(name.toLowerCase)
    id.flatMap(idToField.get)
  }

  def highestFieldId: Int = if (idToField.isEmpty) 0 else idToField.keys.max

  /** ID-set projection keeping top-level fields whose id is selected. */
  def select(ids: Set[Int]): IcebergSchema =
    copy(fields = fields.filter(f => ids.contains(f.id)))

  def toSpark: StructType = SchemaBridge.toSpark(this)
}

/** Iceberg <-> Spark schema bridge. IDs preserved via StructField metadata
  * key `parquet.field.id` (the convention Spark's parquet field-id support
  * reads/writes).
  */
object SchemaBridge {
  val FieldIdKey = "parquet.field.id"

  /** v3 reserved row-lineage columns (reference `metadata_columns.go:41-52`):
    * a lineage-preserving rewrite materializes them as real parquet columns
    * under these reserved field ids; readers prefer the explicit value and
    * synthesize `first_row_id + pos` only where it is null.
    */
  val RowIdCol = "_row_id"
  val RowIdFieldId = 2147483540
  val LastUpdatedSeqCol = "_last_updated_sequence_number"
  val LastUpdatedSeqFieldId = 2147483539
  val LineageCols: Seq[(String, Int)] =
    Seq(RowIdCol -> RowIdFieldId, LastUpdatedSeqCol -> LastUpdatedSeqFieldId)

  def toSparkType(t: IcebergType): DataType = t match {
    case IcebergTypes.BooleanT => BooleanType
    case IcebergTypes.IntT => IntegerType
    case IcebergTypes.LongT => LongType
    case IcebergTypes.FloatT => FloatType
    case IcebergTypes.DoubleT => DoubleType
    case IcebergTypes.DateT => DateType
    case IcebergTypes.TimeT => LongType // µs since midnight; Spark has no TIME
    case IcebergTypes.TimestampT => TimestampNTZType
    case IcebergTypes.TimestampTzT => TimestampType
    case IcebergTypes.TimestampNsT => LongType
    case IcebergTypes.TimestampTzNsT => LongType
    case IcebergTypes.StringT => StringType
    case IcebergTypes.UuidT => StringType
    case IcebergTypes.BinaryT => BinaryType
    case IcebergTypes.VariantT => org.apache.spark.sql.types.VariantType
    case IcebergTypes.FixedT(_) => BinaryType
    case IcebergTypes.GeometryT(_) | IcebergTypes.GeographyT(_, _) => BinaryType // WKB
    case IcebergTypes.DecimalT(p, s) => DecimalType(p, s)
    case IcebergTypes.UnknownT => NullType
    case IcebergTypes.StructT(fields) => StructType(fields.map(toSparkField))
    case IcebergTypes.ListT(_, et, ereq) => ArrayType(toSparkType(et), containsNull = !ereq)
    case IcebergTypes.MapT(_, kt, _, vt, vreq) =>
      MapType(toSparkType(kt), toSparkType(vt), valueContainsNull = !vreq)
  }

  def toSparkField(f: NestedField): StructField = {
    val mb = new MetadataBuilder().putLong(FieldIdKey, f.id.toLong)
    // Spark-typeless iceberg types ride with a tag so the reverse bridge and
    // downstream tools can recover the logical type
    f.fieldType match {
      case IcebergTypes.TimeT => mb.putString("graft.type", "time")
      case g: IcebergTypes.GeometryT => mb.putString("graft.type", g.typeName)
      case g: IcebergTypes.GeographyT => mb.putString("graft.type", g.typeName)
      case _ =>
    }
    // v3 defaults ride as Spark's default-column metadata: the analyzer
    // fills CURRENT_DEFAULT for INSERTs that omit the column, and the
    // parquet readers fill EXISTS_DEFAULT for files that predate the add
    def sqlLit(v: Any): String = v match {
      case s: String => "'" + s.replace("'", "''") + "'"
      case other => String.valueOf(other)
    }
    f.writeDefault.foreach(v => mb.putString("CURRENT_DEFAULT", sqlLit(v)))
    f.initialDefault.foreach(v => mb.putString("EXISTS_DEFAULT", sqlLit(v)))
    StructField(f.name, toSparkType(f.fieldType), nullable = !f.required,
      metadata = mb.build())
  }

  def toSpark(s: IcebergSchema): StructType = StructType(s.fields.map(toSparkField))

  /** Infer an Iceberg schema from a Spark schema, assigning fresh IDs in
    * depth-first order (the standard assignment for new tables).
    */
  def fromSpark(st: StructType): IcebergSchema = {
    var nextId = 0
    def alloc(): Int = { nextId += 1; nextId }
    // two-pass like the spec: top-level fields get the first ids
    val topIds = st.fields.map(_ => alloc())
    def convert(dt: DataType): IcebergType = dt match {
      case BooleanType => IcebergTypes.BooleanT
      case IntegerType | ShortType | ByteType => IcebergTypes.IntT
      case LongType => IcebergTypes.LongT
      case FloatType => IcebergTypes.FloatT
      case DoubleType => IcebergTypes.DoubleT
      case DateType => IcebergTypes.DateT
      case TimestampType => IcebergTypes.TimestampTzT
      case TimestampNTZType => IcebergTypes.TimestampT
      case StringType => IcebergTypes.StringT
      case BinaryType => IcebergTypes.BinaryT
      case org.apache.spark.sql.types.VariantType => IcebergTypes.VariantT
      case d: DecimalType => IcebergTypes.DecimalT(d.precision, d.scale)
      case s: StructType =>
        val ids = s.fields.map(_ => alloc())
        IcebergTypes.StructT(s.fields.zip(ids).map { case (f, id) =>
          NestedField(id, f.name, convert(f.dataType), required = !f.nullable)
        }.toSeq)
      case a: ArrayType =>
        val eid = alloc()
        IcebergTypes.ListT(eid, convert(a.elementType), elementRequired = !a.containsNull)
      case m: MapType =>
        val kid = alloc(); val vid = alloc()
        IcebergTypes.MapT(kid, convert(m.keyType), vid, convert(m.valueType),
          valueRequired = !m.valueContainsNull)
      case other => throw new IllegalArgumentException(s"cannot convert $other to iceberg")
    }
    // Spark's CREATE TABLE ships column defaults as SQL-literal metadata;
    // a table created with DEFAULT must not silently drop it. Inverse of
    // toSparkField's sqlLit rendering — literals only (the analyzer has
    // already constant-folded the DDL expression).
    def parseDefault(f: StructField, key: String): Option[Any] =
      if (!f.metadata.contains(key)) None
      else {
        val s = f.metadata.getString(key)
        if (s.startsWith("'") && s.endsWith("'") && s.length >= 2)
          Some(s.substring(1, s.length - 1).replace("''", "'"))
        else if (s == "NULL" || s == "null") None
        else if (s == "true" || s == "false") Some(s.toBoolean)
        else s.toLongOption.map(v => v: Any)
          .orElse(s.toDoubleOption.map(v => v: Any))
          .orElse {
            // typed literal spellings (DATE '…', TIMESTAMP '…'): keep the
            // quoted payload — the single-value representation
            val typed = raw"(?i)(DATE|TIMESTAMP|TIMESTAMP_NTZ)\s+'(.*)'".r
            s match {
              case typed(_, payload) => Some(payload)
              case _ =>
                // anything else is a non-literal DDL expression Spark kept
                // verbatim (current_date(), rand()…) — recording it as a
                // string default would write wrong values whenever a writer
                // omits the column; reject, mirroring the ALTER COLUMN
                // non-literal rejection in SpjCatalog.alterTable
                throw new IllegalArgumentException(
                  s"non-literal column default for ${f.name}: $s")
            }
          }
      }
    val fields = st.fields.zip(topIds).map { case (f, id) =>
      NestedField(id, f.name, convert(f.dataType), required = !f.nullable,
        initialDefault = parseDefault(f, "EXISTS_DEFAULT"),
        writeDefault = parseDefault(f, "CURRENT_DEFAULT"))
    }
    IcebergSchema(fields.toSeq, schemaId = 0)
  }
}

/** Iceberg schema/type JSON wire format (spec + `types.go` MarshalJSON). */
object SchemaJson {
  private val mapper = new ObjectMapper()

  def typeToJson(t: IcebergType, node: ObjectNode): JsonNode = t match {
    case IcebergTypes.StructT(fields) =>
      val o = node.objectNode()
      o.put("type", "struct")
      val arr = o.putArray("fields")
      fields.foreach { f =>
        val fo = arr.addObject()
        fo.put("id", f.id)
        fo.put("name", f.name)
        fo.put("required", f.required)
        fo.set[JsonNode]("type", typeToJson(f.fieldType, fo))
        f.doc.foreach(fo.put("doc", _))
        // defaults must survive serialization or every commit silently
        // strips them from evolved schemas (spec v3 default-value fields)
        f.initialDefault.foreach(v => fo.set[JsonNode]("initial-default", valueNode(fo, v)))
        f.writeDefault.foreach(v => fo.set[JsonNode]("write-default", valueNode(fo, v)))
        ()
      }
      o
    case IcebergTypes.ListT(eid, et, ereq) =>
      val o = node.objectNode()
      o.put("type", "list")
      o.put("element-id", eid)
      o.set[JsonNode]("element", typeToJson(et, o))
      o.put("element-required", ereq)
      o
    case IcebergTypes.MapT(kid, kt, vid, vt, vreq) =>
      val o = node.objectNode()
      o.put("type", "map")
      o.put("key-id", kid)
      o.set[JsonNode]("key", typeToJson(kt, o))
      o.put("value-id", vid)
      o.set[JsonNode]("value", typeToJson(vt, o))
      o.put("value-required", vreq)
      o
    case prim => node.textNode(prim.typeName)
  }

  def typeFromJson(n: JsonNode): IcebergType = {
    if (n.isTextual) return primitiveFromString(n.asText)
    n.get("type").asText match {
      case "struct" =>
        val fields = n.get("fields").elements()
        val buf = Seq.newBuilder[NestedField]
        while (fields.hasNext) {
          val f = fields.next()
          buf += NestedField(
            id = f.get("id").asInt,
            name = f.get("name").asText,
            fieldType = typeFromJson(f.get("type")),
            required = f.get("required").asBoolean,
            doc = Option(f.get("doc")).map(_.asText),
            initialDefault = Option(f.get("initial-default")).map(jsonValue),
            writeDefault = Option(f.get("write-default")).map(jsonValue))
        }
        IcebergTypes.StructT(buf.result())
      case "list" =>
        IcebergTypes.ListT(n.get("element-id").asInt, typeFromJson(n.get("element")),
          n.get("element-required").asBoolean)
      case "map" =>
        IcebergTypes.MapT(n.get("key-id").asInt, typeFromJson(n.get("key")),
          n.get("value-id").asInt, typeFromJson(n.get("value")),
          n.get("value-required").asBoolean)
      case other => throw new IllegalArgumentException(s"unknown complex type $other")
    }
  }

  /** Inverse of [[jsonValue]] for default-value serialization. */
  private def valueNode(o: ObjectNode, v: Any): JsonNode = v match {
    case null => o.nullNode()
    case b: Boolean => o.booleanNode(b)
    case i: Int => o.numberNode(i.toLong)
    case l: Long => o.numberNode(l)
    case f: Float => o.numberNode(f.toDouble)
    case d: Double => o.numberNode(d)
    case other => o.textNode(other.toString)
  }

  private def jsonValue(n: JsonNode): Any =
    if (n.isNull) null
    else if (n.isIntegralNumber) n.asLong
    else if (n.isNumber) n.asDouble
    else if (n.isBoolean) n.asBoolean
    else n.asText

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val FixedRe = """fixed\[\s*(\d+)\s*\]""".r
  private val GeometryRe = """geometry\(\s*([^)]+?)\s*\)""".r
  private val GeographyRe1 = """geography\(\s*([^,)]+?)\s*\)""".r
  private val GeographyRe2 = """geography\(\s*([^,)]+?)\s*,\s*([^)]+?)\s*\)""".r

  def primitiveFromString(s: String): IcebergType = s match {
    case "boolean" => IcebergTypes.BooleanT
    case "int" => IcebergTypes.IntT
    case "long" => IcebergTypes.LongT
    case "float" => IcebergTypes.FloatT
    case "double" => IcebergTypes.DoubleT
    case "date" => IcebergTypes.DateT
    case "time" => IcebergTypes.TimeT
    case "timestamp" => IcebergTypes.TimestampT
    case "timestamptz" => IcebergTypes.TimestampTzT
    case "timestamp_ns" => IcebergTypes.TimestampNsT
    case "timestamptz_ns" => IcebergTypes.TimestampTzNsT
    case "string" => IcebergTypes.StringT
    case "uuid" => IcebergTypes.UuidT
    case "binary" => IcebergTypes.BinaryT
    case "variant" => IcebergTypes.VariantT
    case "unknown" => IcebergTypes.UnknownT
    case DecimalRe(p, sc) => IcebergTypes.DecimalT(p.toInt, sc.toInt)
    case FixedRe(l) => IcebergTypes.FixedT(l.toInt)
    case "geometry" => IcebergTypes.GeometryT()
    case "geography" => IcebergTypes.GeographyT()
    case GeometryRe(crs) =>
      IcebergTypes.GeometryT(IcebergTypes.GeoDefaults.normCrs(crs))
    case GeographyRe2(crs, algo) =>
      IcebergTypes.GeographyT(IcebergTypes.GeoDefaults.normCrs(crs),
        IcebergTypes.GeoDefaults.normAlgorithm(algo))
    case GeographyRe1(crs) =>
      IcebergTypes.GeographyT(IcebergTypes.GeoDefaults.normCrs(crs))
    case other => throw new IllegalArgumentException(s"unknown primitive type: $other")
  }

  def schemaToJsonNode(s: IcebergSchema): ObjectNode = {
    val root = mapper.createObjectNode()
    val structJson = typeToJson(s.asStruct, root).asInstanceOf[ObjectNode]
    structJson.put("schema-id", s.schemaId)
    if (s.identifierFieldIds.nonEmpty) {
      val arr = structJson.putArray("identifier-field-ids")
      s.identifierFieldIds.foreach(arr.add)
    }
    structJson
  }

  def schemaToJson(s: IcebergSchema): String =
    mapper.writeValueAsString(schemaToJsonNode(s))

  def schemaFromJsonNode(n: JsonNode): IcebergSchema = {
    val struct = typeFromJson(n).asInstanceOf[IcebergTypes.StructT]
    val ids = Option(n.get("identifier-field-ids")).map { arr =>
      val it = arr.elements(); val b = Seq.newBuilder[Int]
      while (it.hasNext) b += it.next().asInt
      b.result()
    }.getOrElse(Nil)
    val schema = IcebergSchema(struct.fields,
      schemaId = Option(n.get("schema-id")).map(_.asInt).getOrElse(0),
      identifierFieldIds = ids)
    // duplicate field ids are corrupt metadata (reference
    // TestUnmarshalSchemaRejectsDuplicateFieldIDs): the id→field index would
    // silently pick one and every id-addressed read/prune goes wrong — fail
    // the parse instead
    val allIds = scala.collection.mutable.ArrayBuffer.empty[Int]
    def collectIds(t: IcebergType): Unit = t match {
      case IcebergTypes.StructT(fs) =>
        fs.foreach { f => allIds += f.id; collectIds(f.fieldType) }
      case IcebergTypes.ListT(eid, et, _) => allIds += eid; collectIds(et)
      case IcebergTypes.MapT(kid, kt, vid, vt, _) =>
        allIds += kid; collectIds(kt); allIds += vid; collectIds(vt)
      case _ =>
    }
    collectIds(struct)
    if (allIds.size != allIds.distinct.size) {
      val dup = allIds.groupBy(identity).collect { case (id, vs) if vs.size > 1 => id }
      throw new IllegalArgumentException(
        s"schema contains duplicate field id(s): ${dup.toSeq.sorted.mkString(", ")}")
    }
    schema
  }

  def schemaFromJson(s: String): IcebergSchema =
    schemaFromJsonNode(mapper.readTree(s))
}
