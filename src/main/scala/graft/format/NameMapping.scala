package graft.format

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** Spec name mapping (`schema.name-mapping.default` table property): assigns
  * field IDs to columns of data files written without embedded IDs, so
  * imported files resolve by name while native files keep ID resolution
  * (reference `name_mapping.go:29-510`). Nested fields carry child mappings
  * (the spec's `fields` key); the read path renames top-level columns and
  * resolves nested children by name inside the container type.
  */
final case class NameMapping(fields: Seq[NameMapping.MappedField]) {

  /** top-level field id -> first mapped name (the name to request from the
    * file).
    */
  lazy val idToName: Map[Int, String] =
    fields.flatMap(f => f.names.headOption.map(f.fieldId -> _)).toMap

  def toJson: String = {
    val mapper = new ObjectMapper()
    def emit(arr: com.fasterxml.jackson.databind.node.ArrayNode,
        fs: Seq[NameMapping.MappedField]): Unit =
      fs.foreach { f =>
        val o = arr.addObject()
        o.put("field-id", f.fieldId)
        val names = o.putArray("names")
        f.names.foreach(names.add)
        if (f.fields.nonEmpty) emit(o.putArray("fields"), f.fields)
      }
    val arr = mapper.createArrayNode()
    emit(arr, fields)
    mapper.writeValueAsString(arr)
  }
}

object NameMapping {
  final case class MappedField(fieldId: Int, names: Seq[String],
      fields: Seq[MappedField] = Nil)

  val PropertyKey = "schema.name-mapping.default"

  def fromSchema(schema: graft.core.IcebergSchema): NameMapping = {
    import graft.core.IcebergTypes._
    def mapField(f: graft.core.NestedField): MappedField =
      MappedField(f.id, Seq(f.name), children(f.fieldType))
    def children(t: graft.core.IcebergType): Seq[MappedField] = t match {
      case StructT(fs) => fs.map(mapField)
      case ListT(eid, et, _) => Seq(MappedField(eid, Seq("element"), children(et)))
      case MapT(kid, kt, vid, vt, _) => Seq(
        MappedField(kid, Seq("key"), children(kt)),
        MappedField(vid, Seq("value"), children(vt)))
      case _ => Nil
    }
    NameMapping(schema.fields.map(mapField))
  }

  def fromJson(json: String): NameMapping = {
    def parse(n: com.fasterxml.jackson.databind.JsonNode): MappedField =
      MappedField(
        n.get("field-id").asInt,
        n.get("names").elements().asScala.map(_.asText).toSeq,
        Option(n.get("fields")).map(_.elements().asScala.map(parse).toSeq).getOrElse(Nil))
    val root = new ObjectMapper().readTree(json)
    NameMapping(root.elements().asScala.map(parse).toSeq)
  }
}
