package graft.core

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.core.Expr._

/** REST-spec expression (de)serialization (reference `expr_json.go:121-300`):
  * `true`/`false` as bare booleans; `{"type":"and","left":…,"right":…}`;
  * predicates as `{"type":"eq","term":"col","value":v}` /
  * `{"type":"in","term":…,"values":[…]}`; transform terms as
  * `{"type":"transform","transform":"month","term":"col"}`.
  */
object ExprJson {

  private val mapper = new ObjectMapper()

  private val opName: Map[Op, String] = Map(
    Op.IsNull -> "is-null", Op.NotNull -> "not-null",
    Op.IsNan -> "is-nan", Op.NotNan -> "not-nan",
    Op.Lt -> "lt", Op.LtEq -> "lt-eq", Op.Gt -> "gt", Op.GtEq -> "gt-eq",
    Op.Eq -> "eq", Op.NotEq -> "not-eq",
    Op.StartsWith -> "starts-with", Op.NotStartsWith -> "not-starts-with",
    Op.In -> "in", Op.NotIn -> "not-in")
  private val nameOp: Map[String, Op] = opName.map(_.swap)

  def toJson(e: Expr): String = mapper.writeValueAsString(toNode(e))

  private def toNode(e: Expr): JsonNode = e match {
    case AlwaysTrue => mapper.getNodeFactory.booleanNode(true)
    case AlwaysFalse => mapper.getNodeFactory.booleanNode(false)
    case And(l, r) =>
      val o = mapper.createObjectNode()
      o.put("type", "and")
      o.set[ObjectNode]("left", toNode(l)); o.set[ObjectNode]("right", toNode(r))
      o
    case Or(l, r) =>
      val o = mapper.createObjectNode()
      o.put("type", "or")
      o.set[ObjectNode]("left", toNode(l)); o.set[ObjectNode]("right", toNode(r))
      o
    case Not(c) =>
      val o = mapper.createObjectNode()
      o.put("type", "not")
      o.set[ObjectNode]("child", toNode(c))
      o
    case Predicate(op, ref, lits) => predicateNode(op, _.put("term", ref), lits)
    case TransformPredicate(op, tr, ref, _, lits) =>
      predicateNode(op, { o =>
        val t = o.putObject("term")
        t.put("type", "transform")
        t.put("transform", tr.name)
        t.put("term", ref)
        ()
      }, lits)
    case bp: BBoxPredicate =>
      val o = mapper.createObjectNode()
      o.put("type", if (bp.intersects) "st-intersects-bbox" else "st-disjoint-bbox")
      o.put("term", bp.ref)
      val vs = o.putArray("values")
      Seq(bp.xmin, bp.ymin, bp.xmax, bp.ymax).foreach(vs.add)
      o
    case VariantPredicate(op, ref, path, vt, lits) =>
      predicateNode(op, { o =>
        val t = o.putObject("term")
        t.put("type", "variant-get")
        t.put("term", ref)
        t.put("path", path)
        t.put("value-type", vt.typeName)
        ()
      }, lits)
  }

  private def predicateNode(op: Op, setTerm: ObjectNode => Unit, lits: Seq[Any]): JsonNode = {
    val o = mapper.createObjectNode()
    o.put("type", opName(op))
    setTerm(o)
    op match {
      case Op.In | Op.NotIn =>
        val vs = o.putArray("values")
        lits.foreach(v => vs.add(litNode(v)))
      case Op.IsNull | Op.NotNull | Op.IsNan | Op.NotNan => // unary
      case _ => o.set[ObjectNode]("value", litNode(lits.head)); ()
    }
    o
  }

  private def litNode(v: Any): JsonNode = v match {
    case null => mapper.getNodeFactory.nullNode
    case i: Int => mapper.getNodeFactory.numberNode(i)
    case l: Long => mapper.getNodeFactory.numberNode(l)
    case d: Double => mapper.getNodeFactory.numberNode(d)
    case f: Float => mapper.getNodeFactory.numberNode(f)
    case b: Boolean => mapper.getNodeFactory.booleanNode(b)
    case d: java.math.BigDecimal => mapper.getNodeFactory.numberNode(d)
    case other => mapper.getNodeFactory.textNode(other.toString)
  }

  /** Parse the REST form. Transform terms resolve their Spark source type
    * against `schema` when provided.
    */
  def fromJson(json: String, schema: Option[IcebergSchema] = None): Expr =
    fromNode(mapper.readTree(json), schema)

  private def fromNode(n: JsonNode, schema: Option[IcebergSchema]): Expr = {
    if (n.isBoolean) return if (n.asBoolean) AlwaysTrue else AlwaysFalse
    n.get("type").asText match {
      case "and" => And(fromNode(n.get("left"), schema), fromNode(n.get("right"), schema))
      case "or" => Or(fromNode(n.get("left"), schema), fromNode(n.get("right"), schema))
      case "not" => Not(fromNode(n.get("child"), schema))
      case "st-intersects-bbox" | "st-disjoint-bbox" =>
        val vs = n.get("values").elements().asScala.map(_.asDouble).toSeq
        BBoxPredicate(n.get("type").asText == "st-intersects-bbox",
          n.get("term").asText, vs(0), vs(1), vs(2), vs(3))
      case opStr =>
        val op = nameOp.getOrElse(opStr,
          throw new IllegalArgumentException(s"unknown expression type $opStr"))
        val lits: Seq[Any] = op match {
          case Op.In | Op.NotIn =>
            n.get("values").elements().asScala.map(litValue).toSeq
          case Op.IsNull | Op.NotNull | Op.IsNan | Op.NotNan => Nil
          case _ => Seq(litValue(n.get("value")))
        }
        val term = n.get("term")
        if (term.isTextual) Predicate(op, term.asText, lits)
        else if (Option(term.get("type")).exists(_.asText == "variant-get"))
          VariantPredicate(op, term.get("term").asText, term.get("path").asText,
            SchemaJson.primitiveFromString(term.get("value-type").asText), lits)
        else {
          val tr = Transforms.parse(term.get("transform").asText)
          val ref = term.get("term").asText
          val srcType = schema.flatMap(_.findField(ref))
            .map(f => SchemaBridge.toSparkType(f.fieldType))
            .getOrElse(org.apache.spark.sql.types.StringType)
          TransformPredicate(op, tr, ref, srcType, lits)
        }
    }
  }

  private def litValue(n: JsonNode): Any =
    if (n.isNull) null
    else if (n.isIntegralNumber) n.asLong
    else if (n.isFloatingPointNumber) n.asDouble
    else if (n.isBoolean) n.asBoolean
    else n.asText
}
