package graft.core

import org.apache.spark.types.variant.{Variant, VariantBuilder, VariantUtil}

/** Spec "Bounds for Variant" codec (reference
  * `table/internal/variant_bounds.go:248-312`): a serialized variant object
  * — metadata bytes immediately followed by value bytes — mapping RFC-9535
  * normalized JSON paths (`$['k']`) of shredded typed_value leaves to that
  * file's lower/upper bound for the leaf. Encode/decode goes through
  * Spark's own variant codec, so the bytes are spec variant binary that any
  * engine's variant reader can parse.
  */
object VariantBounds {

  /** Normalize a dotted path (`$.a.b`) to the spec's `$['a']['b']` form
    * (reference `normalizedVariantPath`, `variant_bounds.go:275-296`).
    */
  def normalizePath(path: String): String = {
    val p = path.stripPrefix("$")
    if (p.isEmpty) "$"
    else "$" + p.split('.').filter(_.nonEmpty)
      .map(f => s"['${escape(f)}']").mkString
  }

  private def escape(name: String): String = name.flatMap {
    case '\'' => "\\'"
    case '\\' => "\\\\"
    case c => c.toString
  }

  /** Normalized path for explicit field-name segments (no dot splitting —
    * names may themselves contain dots).
    */
  def pathFor(fields: String*): String =
    "$" + fields.map(f => s"['${escape(f)}']").mkString

  /** Serialize a bounds object from (normalized path, bound value) pairs.
    * Values: Long/Int/Double/Float/String/Boolean — appended with their
    * native variant types so round trips preserve the leaf's domain.
    */
  def encode(bounds: Seq[(String, Any)]): Array[Byte] = {
    val b = new VariantBuilder(false)
    val start = b.getWritePos
    val entries = new java.util.ArrayList[VariantBuilder.FieldEntry]()
    bounds.foreach { case (k, v) =>
      entries.add(new VariantBuilder.FieldEntry(k, b.addKey(k), b.getWritePos - start))
      v match {
        case l: Long => b.appendLong(l)
        case i: Int => b.appendLong(i.toLong)
        case d: Double => b.appendDouble(d)
        case f: Float => b.appendDouble(f.toDouble)
        case s: String => b.appendString(s)
        case bo: Boolean => b.appendBoolean(bo)
        case other => b.appendString(other.toString)
      }
    }
    b.finishWritingObject(start, entries)
    val v = b.result()
    v.getMetadata ++ v.getValue
  }

  /** Split concatenated metadata ++ value: the metadata section is
    * self-delimiting (header byte carries the offset width; the last offset
    * is the dictionary byte length).
    */
  def split(bytes: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val header = bytes(0) & 0xff
    val offsetSize = ((header >> 6) & 0x3) + 1
    def readLE(pos: Int): Int = {
      var v = 0; var i = 0
      while (i < offsetSize) { v |= (bytes(pos + i) & 0xff) << (8 * i); i += 1 }
      v
    }
    val dictSize = readLE(1)
    val lastOffset = readLE(1 + offsetSize + dictSize * offsetSize)
    val metaLen = 1 + offsetSize * (dictSize + 2) + lastOffset
    (bytes.take(metaLen), bytes.drop(metaLen))
  }

  /** Look up the bound recorded for a normalized path. None when the path
    * is absent or holds a type the pruning comparator doesn't order.
    */
  def get(bytes: Array[Byte], normalizedPath: String): Option[Any] =
    try {
      val (meta, value) = split(bytes)
      val v = new Variant(value, meta)
      Option(v.getFieldByKey(normalizedPath)).flatMap { f =>
        f.getType match {
          case VariantUtil.Type.LONG => Some(f.getLong)
          case VariantUtil.Type.DOUBLE => Some(f.getDouble)
          case VariantUtil.Type.FLOAT => Some(f.getFloat.toDouble)
          case VariantUtil.Type.STRING => Some(f.getString)
          case VariantUtil.Type.BOOLEAN => Some(f.getBoolean)
          case _ => None
        }
      }
    } catch { case _: Exception => None }
}
