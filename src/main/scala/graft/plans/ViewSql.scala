package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{CTESubstitution, CurrentNamespace, GetViewColumnByNameAndOrdinal, NoSuchViewException, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView, UnresolvedView, ViewAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, UpCast}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.StringUtils
import org.apache.spark.sql.connector.catalog.{Identifier, View => V2View, ViewCatalog, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{StructField, StructType}

/** SQL view surface over any V2 [[ViewCatalog]] (in practice
  * [[graft.sources.GraftSpjCatalog]]).
  *
  * Spark 4.1 parses `CREATE/DROP/ALTER VIEW` and `SHOW VIEWS` but only
  * plans them for the v1 session catalog — `ResolveSessionCatalog` throws
  * `MISSING_CATALOG_ABILITY.VIEWS` the moment the identifier resolves into
  * any other catalog, and it runs BEFORE injected resolution rules, so an
  * analyzer rule alone can never claim these commands. [[GraftViewSqlParser]]
  * therefore rewrites them at parse time (the same interception point
  * Apache Iceberg's Spark extensions use), while read-side substitution —
  * which Spark leaves unresolved rather than failing eagerly — lives in the
  * [[ResolveGraftViews]] analyzer rule. Both are injected by
  * [[graft.GraftExtensions]].
  *
  * Reference behavior: `view/view.go:35-57`, `view/metadata.go` — views are
  * versioned SQL text re-resolved at read time, never materialized.
  */
object GraftViewSql {

  /** Multipart name → (view catalog, identifier, fully-qualified parts),
    * when the name lands in a V2 ViewCatalog. Single-part names defer to
    * temp views (Spark's precedence) and use the current catalog; the
    * default session catalog is never claimed — its views are Spark's job.
    */
  def viewCatalogFor(session: SparkSession, parts: Seq[String])
      : Option[(ViewCatalog, Identifier, Seq[String])] = {
    val cm = session.sessionState.catalogManager
    parts match {
      case Seq(single) => cm.currentCatalog match {
        case vc: ViewCatalog if !session.sessionState.catalog.isTempView(parts) =>
          val ns = cm.currentNamespace
          Some((vc, Identifier.of(ns, single), vc.name() +: (ns.toSeq :+ single)))
        case _ => None
      }
      case head +: rest if cm.isCatalogRegistered(head) =>
        cm.catalog(head) match {
          case vc: ViewCatalog =>
            Some((vc, Identifier.of(rest.init.toArray, rest.last), parts))
          case _ => None
        }
      case _ => None
    }
  }
}

/** Parse-time rewrite of view DDL aimed at a V2 ViewCatalog. Everything
  * else — including `CREATE TEMPORARY VIEW` (which parses straight to the
  * v1 command) and names that don't land in a ViewCatalog — passes through
  * untouched.
  */
class GraftViewSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private def vcFor(parts: Seq[String]) =
    GraftViewSql.viewCatalogFor(session, parts)

  /** Multipart name → (backing graft catalog, flat table name) when it
    * lands on an existing table of a GraftSpjCatalog.
    */
  private def tableCatalogFor(parts: Seq[String])
      : Option[(graft.catalog.Catalog, String)] = {
    val cm = session.sessionState.catalogManager
    def resolve(plugin: org.apache.spark.sql.connector.catalog.CatalogPlugin,
        rest: Seq[String]): Option[(graft.catalog.Catalog, String)] =
      plugin match {
        case g: graft.sources.GraftSpjCatalog =>
          val flat = rest match {
            case Seq(n) => Some(n)
            case Seq("default", n) => Some(n)
            case _ => None
          }
          flat.filter(g.backing.tableExists).map(n => (g.backing, n))
        case _ => None
      }
    parts match {
      case head +: rest if rest.nonEmpty && cm.isCatalogRegistered(head) =>
        resolve(cm.catalog(head), rest)
      case Seq(_) => resolve(cm.currentCatalog, parts)
      case _ => None
    }
  }

  // Iceberg SQL-extension statements Spark's grammar cannot parse at all —
  // intercepted on RAW TEXT before delegation (the same parse-time-claim
  // necessity as view DDL, see the class doc). Only fires when the name
  // resolves to a graft table; otherwise the delegate raises its normal
  // parse error.
  private val WriteClause =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+WRITE\s+(.+?)\s*;?\s*$""".r
  private val SetIdFields =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+SET\s+IDENTIFIER\s+FIELDS\s+(.+?)\s*;?\s*$""".r
  private val DropIdFields =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+IDENTIFIER\s+FIELDS\s+(.+?)\s*;?\s*$""".r
  private val OrderedBy = """(?is)^(?:LOCALLY\s+)?ORDERED\s+BY\s+(.+)$""".r
  private val CreateRef =
    ("""(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+(CREATE(?:\s+OR\s+REPLACE)?|REPLACE)\s+""" +
      """(BRANCH|TAG)\s+(?:(IF\s+NOT\s+EXISTS)\s+)?([\w`]+)\s*(.*?)\s*;?\s*$""").r
  private val DropRef =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+(BRANCH|TAG)\s+(?:(IF\s+EXISTS)\s+)?([\w`]+)\s*;?\s*$""".r
  private val RefAsOf = """(?i)AS\s+OF\s+VERSION\s+(\d+)""".r
  private val RefRetain = """(?i)RETAIN\s+(\d+)\s+(DAYS|HOURS|MINUTES)""".r
  private val RefSnapRetention =
    """(?i)WITH\s+SNAPSHOT\s+RETENTION\s+(?:(\d+)\s+SNAPSHOTS\s*)?(?:(\d+)\s+DAYS)?""".r

  private def retainMs(n: Long, unit: String): Long = unit.toUpperCase match {
    case "DAYS" => n * 86400000L
    case "HOURS" => n * 3600000L
    case _ => n * 60000L
  }

  private def nameParts(raw: String): Seq[String] =
    raw.split('.').map(_.stripPrefix("`").stripSuffix("`")).toSeq

  private def stripParens(s: String): String = {
    val t = s.trim
    if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1)
    else t
  }

  private def extensionPlan(sqlText: String): Option[LogicalPlan] = sqlText match {
    case WriteClause(rawName, clause) =>
      tableCatalogFor(nameParts(rawName)).flatMap { case (cat, name) =>
        val c = clause.trim
        val up = c.toUpperCase(java.util.Locale.ROOT)
        val distPrefix = "DISTRIBUTED BY PARTITION"
        if (up == "UNORDERED")
          Some(AlterGraftWriteOrderCommand(cat, name,
            order = None, clearOrder = true, distributed = false))
        else if (up == distPrefix)
          Some(AlterGraftWriteOrderCommand(cat, name,
            order = None, clearOrder = false, distributed = true))
        else {
          val (dist, rest) =
            if (up.startsWith(distPrefix))
              (true, c.substring(distPrefix.length).trim)
            else (false, c)
          rest match {
            case OrderedBy(orderText) =>
              Some(AlterGraftWriteOrderCommand(cat, name,
                order = Some(stripParens(orderText)), clearOrder = false,
                distributed = dist))
            case _ => None
          }
        }
      }
    case SetIdFields(rawName, fields) =>
      tableCatalogFor(nameParts(rawName)).map { case (cat, name) =>
        AlterGraftIdentifierFieldsCommand(cat, name,
          fields.split(',').map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty).toSeq, drop = false)
      }
    case DropIdFields(rawName, fields) =>
      tableCatalogFor(nameParts(rawName)).map { case (cat, name) =>
        AlterGraftIdentifierFieldsCommand(cat, name,
          fields.split(',').map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty).toSeq, drop = true)
      }
    case CreateRef(rawName, verb, kind, ifNotExists, refName, tail) =>
      tableCatalogFor(nameParts(rawName)).flatMap { case (cat, name) =>
        // consume each recognized option; anything left over is not ours —
        // fall through so the delegate raises its normal parse error
        var rest = tail
        def take(r: scala.util.matching.Regex): Option[scala.util.matching.Regex.Match] = {
          val m = r.findFirstMatchIn(rest)
          m.foreach(mm => rest = (rest.substring(0, mm.start) + rest.substring(mm.end)).trim)
          m
        }
        val asOf = take(RefAsOf).map(_.group(1).toLong)
        val refAge = take(RefRetain).map(m => retainMs(m.group(1).toLong, m.group(2)))
        val snapRet = take(RefSnapRetention).filter(m =>
          m.group(1) != null || m.group(2) != null)
        val minKeep = snapRet.flatMap(m => Option(m.group(1)).map(_.toInt))
        val snapAge = snapRet.flatMap(m => Option(m.group(2)).map(_.toLong * 86400000L))
        if (rest.nonEmpty) None
        else {
          val up = verb.toUpperCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
          Some(AlterGraftRefCommand(cat, name,
            refName.stripPrefix("`").stripSuffix("`"),
            refType = kind.toLowerCase(java.util.Locale.ROOT),
            allowExisting = up != "CREATE", requireExisting = up == "REPLACE",
            ifNotExists = ifNotExists != null,
            asOfVersion = asOf, maxRefAgeMs = refAge,
            minSnapshotsToKeep = minKeep, maxSnapshotAgeMs = snapAge))
        }
      }
    case DropRef(rawName, kind, ifExists, refName) =>
      tableCatalogFor(nameParts(rawName)).map { case (cat, name) =>
        DropGraftRefCommand(cat, name,
          refName.stripPrefix("`").stripSuffix("`"),
          refType = kind.toLowerCase(java.util.Locale.ROOT),
          ifExists = ifExists != null)
      }
    case _ => None
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    extensionPlan(sqlText).getOrElse(delegate.parsePlan(sqlText) match {
      case c @ CreateView(UnresolvedIdentifier(parts, _), cols, comment, _,
          props, originalText, _, allowExisting, replace, _) =>
        vcFor(parts) match {
          case Some((vc, ident, _)) =>
            val sql = originalText.getOrElse(throw new IllegalStateException(
              "CREATE VIEW without original SQL text"))
            CreateGraftViewCommand(vc, ident, sql, cols, comment, props,
              allowExisting, replace)
          case None => c
        }

      case a @ AlterViewAs(UnresolvedView(parts, _, _, _), originalText, _) =>
        vcFor(parts) match {
          case Some((vc, ident, _)) =>
            CreateGraftViewCommand(vc, ident, originalText, Nil, None,
              Map.empty, allowExisting = false, replace = true,
              requireExists = true)
          case None => a
        }

      case d @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
        vcFor(parts) match {
          case Some((vc, ident, _)) => DropGraftViewCommand(vc, ident, ifExists)
          case None => d
        }

      case s @ SetViewProperties(UnresolvedView(parts, _, _, _), props) =>
        vcFor(parts) match {
          case Some((vc, ident, _)) =>
            AlterGraftViewPropsCommand(vc, ident, props, Nil)
          case None => s
        }

      case un @ UnsetViewProperties(UnresolvedView(parts, _, _, _), keys, _) =>
        vcFor(parts) match {
          case Some((vc, ident, _)) =>
            AlterGraftViewPropsCommand(vc, ident, Map.empty, keys)
          case None => un
        }

      case r @ RenameTable(UnresolvedTableOrView(parts, _, _), newParts, true) =>
        vcFor(parts) match {
          case Some((vc, ident, _)) if vc.viewExists(ident) =>
            val to = vcFor(newParts).collect {
              case (vc2, id2, _) if vc2 eq vc => id2
            }.getOrElse(throw new IllegalArgumentException(
              s"cannot rename view ${parts.mkString(".")} across catalogs " +
                s"to ${newParts.mkString(".")}"))
            RenameGraftViewCommand(vc, ident, to)
          case _ => r
        }

      // ANALYZE TABLE: Spark only supports the session catalog; route the
      // statistics computation to graft's NDV/Puffin stats instead of
      // failing. FOR COLUMNS limits the set; NOSCAN is metadata-only
      // anyway (manifests already carry counts), so it degrades to a no-op
      // statistics refresh of zero columns.
      case at @ AnalyzeTable(UnresolvedTableOrView(parts, _, _), partSpec, noScan) =>
        tableCatalogFor(parts) match {
          case Some((cat, name)) if partSpec.isEmpty =>
            AnalyzeGraftTableCommand(cat, name, columns = None, noScan = noScan)
          case _ => at
        }
      case ac @ AnalyzeColumn(UnresolvedTableOrView(parts, _, _), cols, allCols) =>
        tableCatalogFor(parts) match {
          case Some((cat, name)) =>
            AnalyzeGraftTableCommand(cat, name,
              columns = if (allCols) None else cols, noScan = false)
          case _ => ac
        }

      case d @ DescribeRelation(UnresolvedTableOrView(parts, _, _), partSpec,
          isExtended, out) if partSpec.isEmpty =>
        vcFor(parts) match {
          case Some((vc, ident, _)) if vc.viewExists(ident) =>
            DescribeGraftViewCommand(vc, ident, isExtended, out)
          case _ => d
        }

      case sv @ ShowViews(UnresolvedNamespace(parts, _), pattern, out)
          if parts.nonEmpty =>
        val cm = session.sessionState.catalogManager
        if (cm.isCatalogRegistered(parts.head)) cm.catalog(parts.head) match {
          case vc: ViewCatalog => ShowGraftViewsCommand(vc, pattern, out)
          case _ => sv
        } else sv
      case sv @ ShowViews(CurrentNamespace, pattern, out) =>
        session.sessionState.catalogManager.currentCatalog match {
          case vc: ViewCatalog => ShowGraftViewsCommand(vc, pattern, out)
          case _ => sv
        }

      case other => other
    })

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Read-time substitution: an unresolved relation naming a stored view
  * expands into its parsed SQL, exactly how Spark treats session-catalog
  * views. Runs as an extended resolution rule — Spark leaves unknown
  * relations unresolved (no eager failure), so running after the built-in
  * rules is safe, and temp views have already been substituted by the time
  * this rule sees a name.
  */
case class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u @ UnresolvedRelation(parts, _, false) =>
        GraftViewSql.viewCatalogFor(spark, parts) match {
          case Some((vc, ident, full)) if vc.viewExists(ident) =>
            GraftViewSubstitution.expand(spark, vc, ident, full, Set.empty)
          case _ => u
        }
    }
}

object GraftViewSubstitution {

  /** Parses a stored view and rebuilds the plan Spark would have analyzed
    * at definition time: CTE names substituted first (so they are not
    * mistaken for catalog tables), remaining relations qualified into the
    * view's default catalog/namespace, nested views expanded recursively
    * with cycle detection, and the output projected through the recorded
    * query-column → alias mapping with an UpCast to the recorded type (so
    * later `CREATE OR REPLACE` of an inner view cannot silently change
    * this view's schema).
    */
  def expand(spark: SparkSession, vc: ViewCatalog, ident: Identifier,
      nameParts: Seq[String], seen: Set[String]): LogicalPlan = {
    val fullName = nameParts.mkString(".")
    if (seen.contains(fullName))
      throw new IllegalStateException(
        s"recursive view reference: ${(seen + fullName).mkString(" -> ")}")
    val v = vc.loadView(ident)
    val parsed = spark.sessionState.sqlParser.parsePlan(v.query)
    // CTE substitution first: `WITH x AS (...) SELECT ... FROM x` must bind
    // x to the CTE, never to catalog table <default-ns>.x
    val substituted = CTESubstitution(parsed)
    val qualified = substituted.transformDown {
      case UnresolvedRelation(parts, opts, false) =>
        val full = qualify(spark, parts, v)
        viewCatalogForParts(spark, full) match {
          case Some((vc2, id2)) if vc2.viewExists(id2) =>
            expand(spark, vc2, id2, full, seen + fullName)
          case _ => UnresolvedRelation(full, opts, isStreaming = false)
        }
    }
    SubqueryAlias(nameParts, aliasProjection(v, fullName, qualified))
  }

  /** Single-part names resolve in the view's default catalog+namespace;
    * multi-part names starting with a registered catalog are already
    * absolute; anything else gets the default catalog prefixed.
    */
  private def qualify(spark: SparkSession, parts: Seq[String],
      v: V2View): Seq[String] = {
    val defCat = Option(v.currentCatalog)
    parts match {
      case Seq(single) =>
        defCat.map(c => c +: (v.currentNamespace.toSeq :+ single)).getOrElse(parts)
      case head +: _
          if spark.sessionState.catalogManager.isCatalogRegistered(head) =>
        parts
      case _ => defCat.map(_ +: parts).getOrElse(parts)
    }
  }

  private def viewCatalogForParts(spark: SparkSession, parts: Seq[String])
      : Option[(ViewCatalog, Identifier)] =
    parts match {
      case head +: rest if rest.nonEmpty &&
          spark.sessionState.catalogManager.isCatalogRegistered(head) =>
        spark.sessionState.catalogManager.catalog(head) match {
          case vc: ViewCatalog =>
            Some((vc, Identifier.of(rest.init.toArray, rest.last)))
          case _ => None
        }
      case _ => None
    }

  private def aliasProjection(v: V2View, fullName: String,
      body: LogicalPlan): LogicalPlan = {
    val colNames = v.queryColumnNames
    if (colNames == null || colNames.isEmpty) body // legacy view: raw schema
    else {
      val fields = v.schema.fields
      val aliases =
        if (v.columnAliases != null && v.columnAliases.nonEmpty) v.columnAliases
        else colNames
      val projList = colNames.toSeq.zipWithIndex.map { case (qn, i) =>
        val ordinal = colNames.take(i).count(_ == qn)
        val expected = colNames.count(_ == qn)
        val base: Expression =
          GetViewColumnByNameAndOrdinal(fullName, qn, ordinal, expected, None)
        val typed: Expression =
          if (i < fields.length) UpCast(base, fields(i).dataType) else base
        Alias(typed, aliases(i))()
      }
      Project(projList, body)
    }
  }
}

/** CREATE [OR REPLACE] VIEW / ALTER VIEW AS on a V2 ViewCatalog. The query
  * text is re-analyzed here to record the output schema and query column
  * names the read-side projection pins.
  */
case class CreateGraftViewCommand(vc: ViewCatalog, ident: Identifier,
    sql: String, userColumns: Seq[(String, Option[String])],
    comment: Option[String], properties: Map[String, String],
    allowExisting: Boolean, replace: Boolean,
    requireExists: Boolean = false) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val exists = vc.viewExists(ident)
    if (exists && !replace) {
      if (allowExisting) return Nil
      throw new ViewAlreadyExistsException(ident)
    }
    if (requireExists && !exists) throw new NoSuchViewException(ident)
    val analyzed = session.sql(sql).queryExecution.analyzed
    val queryCols = analyzed.output.map(_.name)
    require(userColumns.isEmpty || userColumns.length == queryCols.length,
      s"view column list has ${userColumns.length} names but query produces " +
        s"${queryCols.length} columns")
    val aliases =
      if (userColumns.nonEmpty) userColumns.map(_._1) else queryCols
    val comments =
      if (userColumns.nonEmpty) userColumns.map(_._2.getOrElse(""))
      else queryCols.map(_ => "")
    val schema = StructType(analyzed.output.zip(aliases).map {
      case (attr: Attribute, alias) =>
        StructField(alias, attr.dataType, attr.nullable)
    })
    val cm = session.sessionState.catalogManager
    val props = properties ++ comment.map(ViewCatalog.PROP_COMMENT -> _)
    val info = new ViewInfo(ident, sql, cm.currentCatalog.name(),
      cm.currentNamespace, schema, queryCols.toArray, aliases.toArray,
      comments.map(c => if (c.isEmpty) null else c).toArray,
      scala.jdk.CollectionConverters.MapHasAsJava(props).asJava)
    if (exists) vc.replaceView(info, false) else vc.createView(info)
    Nil
  }
}

case class DropGraftViewCommand(vc: ViewCatalog, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (!vc.dropView(ident) && !ifExists) throw new NoSuchViewException(ident)
    Nil
  }
}

case class AlterGraftViewPropsCommand(vc: ViewCatalog, ident: Identifier,
    set: Map[String, String], unset: Seq[String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val changes: Seq[ViewChange] =
      set.toSeq.map { case (k, vv) => ViewChange.setProperty(k, vv) } ++
        unset.map(ViewChange.removeProperty)
    vc.alterView(ident, changes: _*)
    Nil
  }
}

case class RenameGraftViewCommand(vc: ViewCatalog, from: Identifier,
    to: Identifier) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    vc.renameView(from, to)
    Nil
  }
}

/** `ANALYZE TABLE [FOR COLUMNS ...]` on a graft table: computes NDV theta
  * sketches and publishes a Puffin statistics file on the current snapshot
  * (the same machinery as `CALL system.compute_table_stats`). NOSCAN is a
  * no-op — manifest metadata already carries row/size counts.
  */
/** `ALTER TABLE t WRITE [DISTRIBUTED BY PARTITION] [LOCALLY] ORDERED BY
  * ... | UNORDERED` (Iceberg SQL extension): replaces the table's default
  * sort order (every subsequent append/rewrite applies it — the write
  * funnel reads `defaultSortOrderId`) and records hash distribution
  * intent as the `write.distribution-mode` property (the DSv2 writes
  * already cluster by partition transforms).
  */
case class AlterGraftWriteOrderCommand(cat: graft.catalog.Catalog, name: String,
    order: Option[String], clearOrder: Boolean, distributed: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    var t = cat.loadTable(name)
    order match {
      case Some(text) =>
        t = graft.table.Evolve.replaceSortOrder(t,
          graft.sources.GraftProcedures.parseSortOrder(t, text))
      case None if clearOrder =>
        t = graft.table.Evolve.replaceSortOrder(t, Nil)
      case None => ()
    }
    if (distributed)
      graft.table.Evolve.setProperties(t, Map("write.distribution-mode" -> "hash"))
    Nil
  }
}

/** `ALTER TABLE t SET|DROP IDENTIFIER FIELDS a, b` (Iceberg SQL
  * extension): the natural-key columns equality deletes and upserts key
  * on. DROP removes the listed columns from the current identifier set.
  */
case class AlterGraftIdentifierFieldsCommand(cat: graft.catalog.Catalog,
    name: String, fields: Seq[String], drop: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = cat.loadTable(name)
    val target =
      if (!drop) fields
      else {
        val dropIds = fields.map(n => t.schema.findField(n).getOrElse(
          throw new IllegalArgumentException(s"no such column $n")).id).toSet
        t.schema.identifierFieldIds.filterNot(dropIds)
          .map(id => t.schema.idToField(id).name)
      }
    graft.table.Evolve.setIdentifierFields(t, target)
    Nil
  }
}

/** `ALTER TABLE t CREATE [OR REPLACE] BRANCH|TAG [IF NOT EXISTS] name
  * [AS OF VERSION n] [RETAIN n DAYS|HOURS|MINUTES]
  * [WITH SNAPSHOT RETENTION n SNAPSHOTS [n DAYS] | n DAYS]` and
  * `ALTER TABLE t REPLACE BRANCH|TAG ...` (Iceberg SQL extensions):
  * create or move a named ref with its retention policy — the same
  * `Evolve.setRef` the `create_branch`/`create_tag` procedures call,
  * plus retention, which only this DDL surface can express.
  */
case class AlterGraftRefCommand(cat: graft.catalog.Catalog, name: String,
    refName: String, refType: String, allowExisting: Boolean,
    requireExisting: Boolean, ifNotExists: Boolean, asOfVersion: Option[Long],
    maxRefAgeMs: Option[Long], minSnapshotsToKeep: Option[Int],
    maxSnapshotAgeMs: Option[Long]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = cat.loadTable(name)
    t.metadata.refs.get(refName) match {
      case Some(_) if !allowExisting && ifNotExists => return Nil
      case Some(_) if !allowExisting =>
        throw new IllegalArgumentException(
          s"ref '$refName' already exists on $name (use CREATE OR REPLACE)")
      case Some(r) if r.refType != refType =>
        throw new IllegalArgumentException(
          s"ref '$refName' on $name is a ${r.refType}, not a $refType")
      case None if requireExisting =>
        throw new IllegalArgumentException(
          s"cannot REPLACE $refType '$refName' on $name: no such ref")
      case _ => ()
    }
    val snap = asOfVersion.orElse(t.metadata.currentSnapshotId).getOrElse(
      throw new IllegalArgumentException(s"$name has no snapshot to reference"))
    graft.table.Evolve.setRef(t, refName, snap, refType,
      minSnapshotsToKeep, maxSnapshotAgeMs, maxRefAgeMs)
    Nil
  }
}

/** `ALTER TABLE t DROP BRANCH|TAG [IF EXISTS] name` — refuses a
  * type-mismatched drop (DROP TAG on a branch) and dropping `main`.
  */
case class DropGraftRefCommand(cat: graft.catalog.Catalog, name: String,
    refName: String, refType: String, ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    require(!(refType == "branch" && refName == "main"),
      "cannot drop the main branch")
    val t = cat.loadTable(name)
    t.metadata.refs.get(refName) match {
      case None if ifExists => ()
      case None => throw new IllegalArgumentException(
        s"no such $refType '$refName' on $name")
      case Some(r) if r.refType != refType =>
        throw new IllegalArgumentException(
          s"ref '$refName' on $name is a ${r.refType}, not a $refType")
      case Some(_) => graft.table.Evolve.removeRef(t, refName)
    }
    Nil
  }
}

case class AnalyzeGraftTableCommand(cat: graft.catalog.Catalog, name: String,
    columns: Option[Seq[String]], noScan: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (noScan) return Nil
    val t = cat.loadTable(name)
    import graft.core.IcebergTypes.{ListT, MapT, StructT, VariantT}
    val cols = columns.getOrElse(
      t.schema.fields.filterNot(_.fieldType match {
        case _: StructT | _: ListT | _: MapT | VariantT => true
        case _ => false
      }).map(_.name).toSeq)
    graft.table.Analyze.computeNdv(session, t, cols)
    Nil
  }
}

case class DescribeGraftViewCommand(vc: ViewCatalog, ident: Identifier,
    isExtended: Boolean, override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val v = vc.loadView(ident)
    val comments = Option(v.columnComments).getOrElse(Array.empty[String])
    val cols = v.schema.fields.zipWithIndex.map { case (f, i) =>
      Row(f.name, f.dataType.simpleString,
        if (i < comments.length) comments(i) else null)
    }.toSeq
    if (!isExtended) cols
    else cols ++ Seq(
      Row("", "", ""),
      Row("# Detailed View Information", "", ""),
      Row("Name", v.name(), ""),
      Row("Default Catalog", Option(v.currentCatalog).getOrElse(""), ""),
      Row("Default Namespace", v.currentNamespace.mkString("."), ""),
      Row("View Text", v.query, ""),
      Row("Properties",
        v.properties.asScala.map { case (k, vv) => s"$k=$vv" }
          .toSeq.sorted.mkString(", "), ""))
  }
}

case class ShowGraftViewsCommand(vc: ViewCatalog, pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val names = vc.listViews().map(_.name()).toSeq
    val filtered = pattern.map(p => StringUtils.filterPattern(names, p))
      .getOrElse(names)
    filtered.sorted.map(n => Row("", n, false))
  }
}
