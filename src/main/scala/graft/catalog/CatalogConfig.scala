package graft.catalog

import java.nio.file.{Files, Paths}

/** Config-file catalog defaults (reference `config/config.go:29-120`,
  * consumed by the registry in `catalog/registry.go:33-131`): a YAML file
  * maps catalog NAMES to their connection config so CLI users say
  * `--catalog prod` instead of pasting a URI. Resolution order matches the
  * reference: explicit name → the file's `default-catalog` → `"default"`.
  *
  * The parser handles exactly the reference's config shape (top-level
  * scalars plus a two-level `catalog:` map) with no YAML dependency — this
  * build is zero-egress, and the subset below is the whole grammar the
  * reference's config uses:
  *
  * {{{
  * default-catalog: prod
  * catalog:
  *   prod:
  *     uri: sql:jdbc:derby:/cat/db|/warehouse
  *     warehouse: /warehouse
  *   scratch:
  *     uri: hadoop:/tmp/wh
  * }}}
  *
  * Every per-catalog key is kept as a property; `uri` (fallback: a
  * `type:warehouse` pair) is what feeds [[Catalogs.load]].
  */
final case class NamedCatalogConfig(name: String, props: Map[String, String]) {
  /** The registry URI for this catalog: explicit `uri`, else
    * `<type>:<warehouse>` (the reference builds the same pair from its
    * type/warehouse fields).
    */
  def uri: String = props.get("uri").orElse(
    for (t <- props.get("type"); w <- props.get("warehouse")) yield s"$t:$w"
  ).getOrElse(throw new IllegalArgumentException(
    s"catalog '$name' has neither uri nor type+warehouse in config"))

  def open(): Catalog = Catalogs.load(uri)
}

final case class CatalogConfig(
    defaultCatalog: Option[String],
    catalogs: Map[String, NamedCatalogConfig]) {

  /** Reference `config.go` ParseConfig fallback chain: explicit name →
    * `default-catalog` → "default"; None when the file doesn't define it.
    */
  def resolve(name: Option[String]): Option[NamedCatalogConfig] = {
    val n = name.orElse(defaultCatalog).getOrElse("default")
    catalogs.get(n)
  }
}

object CatalogConfig {

  val Empty: CatalogConfig = CatalogConfig(None, Map.empty)

  /** Default config path: `$GRAFT_CONFIG` else `~/.graft-spark.yaml`
    * (reference uses `~/.iceberg-go.yaml` the same way). A missing implicit
    * file is an empty config, not an error; a missing EXPLICIT path is.
    */
  def load(explicitPath: Option[String] = None): CatalogConfig = {
    val path = explicitPath
      .orElse(sys.env.get("GRAFT_CONFIG"))
      .getOrElse(sys.props.getOrElse("user.home", ".") + "/.graft-spark.yaml")
    val p = Paths.get(path)
    if (!Files.exists(p)) {
      if (explicitPath.isDefined)
        throw new IllegalArgumentException(s"config file not found: $path")
      Empty
    } else parse(Files.readString(p))
  }

  /** Parse the two-level YAML subset. Unknown top-level sections are
    * ignored; malformed indentation fails loudly (a silently half-read
    * config would point commands at the wrong warehouse).
    */
  def parse(text: String): CatalogConfig = {
    // strip comments and blank lines, keep indentation
    val lines = text.linesIterator.map { l =>
      val cut = l.indexOf('#')
      if (cut >= 0) l.substring(0, cut) else l
    }.zipWithIndex.filter(_._1.trim.nonEmpty).toSeq

    def indentOf(l: String): Int = l.takeWhile(_ == ' ').length
    def keyVal(l: String, ln: Int): (String, String) = {
      val t = l.trim
      val i = t.indexOf(':')
      if (i < 0) throw new IllegalArgumentException(
        s"config line ${ln + 1}: expected 'key: value', got '$t'")
      (t.substring(0, i).trim, unquote(t.substring(i + 1).trim))
    }

    var defaultCat: Option[String] = None
    val cats = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, String]]
    var inCatalog = false       // inside the `catalog:` section
    var catIndent = -1          // indentation of catalog names
    var current: String = null  // catalog whose props we are reading

    lines.foreach { case (l, ln) =>
      val ind = indentOf(l)
      val (k, v) = keyVal(l, ln)
      if (ind == 0) {
        inCatalog = k == "catalog" || k == "catalogs"
        current = null; catIndent = -1
        if (!inCatalog && v.nonEmpty) {
          if (k == "default-catalog") defaultCat = Some(v)
          // other top-level scalars (max-workers, …) are accepted and ignored
        }
      } else if (inCatalog) {
        if (catIndent < 0) catIndent = ind
        if (ind == catIndent) {
          if (v.nonEmpty) throw new IllegalArgumentException(
            s"config line ${ln + 1}: catalog name '$k' must start a block, not carry a value")
          current = k
          cats(current) = Map.empty
        } else if (ind > catIndent) {
          if (current == null) throw new IllegalArgumentException(
            s"config line ${ln + 1}: property outside a catalog block")
          cats(current) = cats(current) + (k -> v)
        } else throw new IllegalArgumentException(
          s"config line ${ln + 1}: inconsistent indentation")
      }
      // indented lines outside known sections are ignored (reference
      // yaml.Unmarshal does the same for unknown structures)
    }
    CatalogConfig(defaultCat,
      cats.map { case (n, p) => n -> NamedCatalogConfig(n, p) }.toMap)
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}
