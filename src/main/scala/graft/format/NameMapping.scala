package graft.format

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** Spec name mapping (`schema.name-mapping.default` table property): assigns
  * field IDs to columns of data files written without embedded IDs, so
  * imported files resolve by name while native files keep ID resolution
  * (reference `name_mapping.go:29-510`). Flat (top-level) fields only — the
  * import path rejects nested schemas.
  */
final case class NameMapping(fields: Seq[NameMapping.MappedField]) {

  /** field id -> first mapped name (the name to request from the file). */
  lazy val idToName: Map[Int, String] =
    fields.flatMap(f => f.names.headOption.map(f.fieldId -> _)).toMap

  def toJson: String = {
    val mapper = new ObjectMapper()
    val arr = mapper.createArrayNode()
    fields.foreach { f =>
      val o = arr.addObject()
      o.put("field-id", f.fieldId)
      val names = o.putArray("names")
      f.names.foreach(names.add)
    }
    mapper.writeValueAsString(arr)
  }
}

object NameMapping {
  final case class MappedField(fieldId: Int, names: Seq[String])

  val PropertyKey = "schema.name-mapping.default"

  def fromSchema(schema: graft.core.IcebergSchema): NameMapping =
    NameMapping(schema.fields.map(f => MappedField(f.id, Seq(f.name))))

  def fromJson(json: String): NameMapping = {
    val root = new ObjectMapper().readTree(json)
    NameMapping(root.elements().asScala.map { n =>
      MappedField(n.get("field-id").asInt,
        n.get("names").elements().asScala.map(_.asText).toSeq)
    }.toSeq)
  }
}
