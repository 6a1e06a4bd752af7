package graft

import org.apache.spark.sql.SparkSession

import graft.catalog.{CatalogConfig, Catalogs}
import graft.table.{Evolve, Inspect, Maintenance}

/** Table CLI (reference `cmd/iceberg/main.go:225-960`): catalog listing and
  * inspection plus the maintenance verbs — branch/tag, expire, compact,
  * rollback, upgrade, rename, register, drop[--purge].
  *
  * The first argument selects the catalog: either a registry URI
  * (`hadoop:/wh`, `sql:jdbc:…|/wh`, `rest:http://…`) or `--catalog <name>`
  * resolved through the config file (`$GRAFT_CONFIG`, else
  * `~/.graft-spark.yaml`, else `--config <path>`), mirroring the
  * reference's named-catalog flow (`config/config.go`,
  * `catalog/registry.go`).
  */
object Cli {

  private val usage =
    """usage: Cli (<warehouse-uri> | --catalog <name> [--config <path>]) [--output json] <command> ...
      |  list
      |  describe|snapshots|files|partitions|refs|info <table>
      |  schema <table> [--show-defaults]
      |  spec|uuid|location <table>
      |  properties get <table> [key]
      |  properties set <table> <key> <value>
      |  properties remove <table> <key>
      |  create namespace <ns>
      |  create table <name> --infer-schema <parquet-file> [--partition-spec f1,f2]
      |  rewrite-manifests <table> [target-count]
      |  partition-stats <table>
      |  clean-orphan-files <table> <older-than-ms>
      |  read <table> [n]
      |  changelog <table> <from-snapshot-id> <to-snapshot-id> [n]
      |  branch|tag <table> <ref-name> [snapshot-id]   (default: current snapshot)
      |  rollback <table> <snapshot-id>
      |  upgrade <table> <format-version>
      |  expire <table> <older-than-ms> [retain-last]
      |  compact <table>
      |  rename <from> <to>
      |  register <table> <metadata-location>
      |  drop <table> [--purge]""".stripMargin

  def main(args: Array[String]): Unit = {
    // ---- catalog selection -------------------------------------------------
    var rest = args.toList
    val cat = rest match {
      case "--catalog" :: name :: tail =>
        val (cfgPath, tail2) = tail match {
          case "--config" :: p :: t => (Some(p), t)
          case t                    => (None, t)
        }
        rest = tail2
        CatalogConfig.load(cfgPath).resolve(Some(name)) match {
          case Some(nc) => nc.open()
          case None =>
            System.err.println(s"catalog '$name' not found in config")
            sys.exit(2)
        }
      case uri :: tail =>
        rest = tail
        Catalogs.load(uri)
      case Nil =>
        System.err.println(usage)
        sys.exit(2)
    }
    // --output json: machine-readable output with the reference CLI's JSON
    // field names (cmd/iceberg/output.go jsonOutput) so scripts written
    // against the reference parse ours unchanged; default stays text
    val outputJson = {
      val i = rest.indexOf("--output")
      if (i >= 0 && rest.length > i + 1) {
        val mode = rest(i + 1)
        rest = rest.patch(i, Nil, 2)
        mode == "json"
      } else false
    }
    if (rest.isEmpty) { System.err.println(usage); sys.exit(2) }
    val command :: cargs = rest: @unchecked

    lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def metaNode(t: graft.table.Table): com.fasterxml.jackson.databind.JsonNode =
      mapper.readTree(graft.format.TableMetadata.toJson(t.metadata))
    def findById(arr: com.fasterxml.jackson.databind.JsonNode, idField: String,
        id: Long): com.fasterxml.jackson.databind.JsonNode = {
      val it = arr.elements()
      while (it.hasNext) { val n = it.next(); if (n.get(idField).asLong() == id) return n }
      mapper.nullNode()
    }

    lazy val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

    command match {
      case "list" if outputJson =>
        // reference jsonOutput.Identifiers: {"identifiers":[["ns","tbl"],…]}
        val root = mapper.createObjectNode()
        val ids = root.putArray("identifiers")
        cat.listTables().foreach { n =>
          val id = ids.addArray(); n.split('.').foreach(id.add); ()
        }
        println(mapper.writeValueAsString(root))
      case "list" =>
        cat.listTables().foreach(println)
      case "describe" if outputJson =>
        // reference jsonOutput.DescribeTable field names
        val t = cat.loadTable(cargs(0))
        val m = metaNode(t)
        val root = mapper.createObjectNode()
        root.set[com.fasterxml.jackson.databind.JsonNode]("metadata", m)
        root.put("metadata-location", t.metadataPath)
        root.set[com.fasterxml.jackson.databind.JsonNode]("sort-order",
          findById(m.get("sort-orders"), "order-id", m.get("default-sort-order-id").asLong()))
        root.set[com.fasterxml.jackson.databind.JsonNode]("current-snapshot",
          t.metadata.currentSnapshotId.map(id =>
            findById(m.get("snapshots"), "snapshot-id", id)).getOrElse(mapper.nullNode()))
        root.set[com.fasterxml.jackson.databind.JsonNode]("spec",
          findById(m.get("partition-specs"), "spec-id", m.get("default-spec-id").asLong()))
        root.set[com.fasterxml.jackson.databind.JsonNode]("schema",
          findById(m.get("schemas"), "schema-id", m.get("current-schema-id").asLong()))
        println(mapper.writeValueAsString(root))
      case "describe" =>
        val t = cat.loadTable(cargs(0))
        println(s"table: ${t.name}")
        println(s"location: ${t.location}")
        println(s"format-version: ${t.metadata.formatVersion}")
        println(s"current-snapshot: ${t.metadata.currentSnapshotId.getOrElse("-")}")
        println("schema:")
        t.schema.fields.foreach(f =>
          println(s"  ${f.id}: ${f.name}: ${if (f.required) "required" else "optional"} ${f.fieldType}"))
        println(s"partition-spec: ${t.spec.fields.map(f => s"${f.name}=${f.transform.name}").mkString(", ")}")
        println(s"refs: ${t.metadata.refs.map { case (n, r) => s"$n=${r.snapshotId}(${r.refType})" }.mkString(", ")}")
        println(s"properties: ${t.metadata.properties}")
      case "schema" if outputJson =>
        // reference jsonOutput.Schema: the raw schema JSON object
        val t = cat.loadTable(cargs(0))
        val m = metaNode(t)
        println(mapper.writeValueAsString(
          findById(m.get("schemas"), "schema-id", m.get("current-schema-id").asLong())))
      case "schema" =>
        // reference SchemaCmd [--show-defaults] (cmd/iceberg/schema_defaults.go)
        val showDefaults = cargs.contains("--show-defaults")
        val t = cat.loadTable(cargs(0))
        t.schema.fields.foreach { f =>
          val base = s"  ${f.id}: ${f.name}: " +
            s"${if (f.required) "required" else "optional"} ${f.fieldType}"
          val defaults = if (!showDefaults) "" else {
            val parts = f.initialDefault.map(v => s"initial-default=$v").toSeq ++
              f.writeDefault.map(v => s"write-default=$v")
            if (parts.isEmpty) "" else parts.mkString(" (", ", ", ")")
          }
          println(base + defaults)
        }
      case "spec" if outputJson =>
        // reference jsonOutput.Spec: the raw partition-spec JSON object
        val t = cat.loadTable(cargs(0))
        val m = metaNode(t)
        println(mapper.writeValueAsString(
          findById(m.get("partition-specs"), "spec-id", m.get("default-spec-id").asLong())))
      case "spec" =>
        cat.loadTable(cargs(0)).spec.fields.foreach(f =>
          println(s"  ${f.fieldId}: ${f.name}: ${f.transform.name}(${f.sourceId})"))
      case "uuid" if outputJson =>
        // reference jsonOutput.Uuid: {"uuid":"…"}
        val root = mapper.createObjectNode()
        root.put("uuid", cat.loadTable(cargs(0)).metadata.tableUuid)
        println(mapper.writeValueAsString(root))
      case "uuid" =>
        println(cat.loadTable(cargs(0)).metadata.tableUuid)
      case "location" =>
        println(cat.loadTable(cargs(0)).location)
      case "refs" =>
        Inspect.refs(spark, cat.loadTable(cargs(0))).show(100, truncate = false)
      case "info" =>
        // single-screen summary (reference cmd/iceberg/info.go)
        val t = cat.loadTable(cargs(0))
        val snaps = t.metadata.snapshots
        val files = t.newScan.planFiles()
        println(s"table: ${t.name}  uuid: ${t.metadata.tableUuid}")
        println(s"location: ${t.location}")
        println(s"format-version: ${t.metadata.formatVersion}  " +
          s"snapshots: ${snaps.size}  refs: ${t.metadata.refs.size}")
        println(s"current-snapshot: ${t.metadata.currentSnapshotId.getOrElse("-")}")
        println(s"live data files: ${files.size}  " +
          s"rows: ${files.map(_.file.recordCount).sum}  " +
          s"bytes: ${files.map(_.file.fileSize).sum}")
        println(s"delete files attached: " +
          s"${files.map(t => t.posDeletes.size + t.eqDeletes.size).sum}")
      case "properties" =>
        val t = cat.loadTable(cargs(1))
        cargs(0) match {
          case "get" if outputJson =>
            if (cargs.length > 2) {
              // reference jsonOutput.Text: {"data":"…"}
              val root = mapper.createObjectNode()
              root.put("data", t.metadata.properties.getOrElse(cargs(2), ""))
              println(mapper.writeValueAsString(root))
            } else {
              // reference jsonOutput.DescribeProperties: the raw props map
              val root = mapper.createObjectNode()
              t.metadata.properties.toSeq.sortBy(_._1)
                .foreach { case (k, v) => root.put(k, v) }
              println(mapper.writeValueAsString(root))
            }
          case "get" =>
            if (cargs.length > 2)
              println(t.metadata.properties.getOrElse(cargs(2), ""))
            else t.metadata.properties.toSeq.sortBy(_._1)
              .foreach { case (k, v) => println(s"$k=$v") }
          case "set" =>
            Evolve.setProperties(t, Map(cargs(2) -> cargs(3)))
            println(s"set ${cargs(2)}=${cargs(3)}")
          case "remove" =>
            Evolve.removeProperties(t, Seq(cargs(2)))
            println(s"removed ${cargs(2)}")
          case other =>
            System.err.println(s"unknown properties verb: $other"); sys.exit(2)
        }
      case "create" =>
        cargs(0) match {
          case "namespace" =>
            cat match {
              case sc: graft.catalog.SqlCatalog => sc.createNamespace(cargs(1))
              case hc: graft.catalog.HiveCatalog => hc.createNamespace(cargs(1))
              case _ =>
                System.err.println("this catalog has no namespace surface"); sys.exit(2)
            }
            println(s"created namespace ${cargs(1)}")
          case "table" =>
            // --infer-schema mirrors the reference CreateTableCmd: derive the
            // iceberg schema from a parquet file's own schema
            val name = cargs(1)
            val idx = cargs.indexOf("--infer-schema")
            require(idx >= 0 && cargs.length > idx + 1,
              "create table requires --infer-schema <parquet-file>")
            val sample = spark.read.parquet(cargs(idx + 1))
            val schema = graft.core.SchemaBridge.fromSpark(sample.schema)
            val specIdx = cargs.indexOf("--partition-spec")
            val spec =
              if (specIdx < 0) graft.format.PartitionSpec.Unpartitioned
              else cargs(specIdx + 1).split(",").foldLeft(
                graft.format.PartitionSpec.builder(schema)) {
                  (b, f) => b.add(f.trim, graft.core.Transforms.Identity)
                }.build()
            cat.createTable(name, schema, spec)
            println(s"created table $name")
          case other =>
            System.err.println(s"unknown create verb: $other"); sys.exit(2)
        }
      case "rewrite-manifests" =>
        val target = if (cargs.length > 1) cargs(1).toInt else 1
        val t = Maintenance.rewriteManifests(cat.loadTable(cargs(0)), target)
        println(s"rewrote manifests for ${t.name}")
      case "partition-stats" =>
        val t = graft.table.Analyze.computePartitionStats(spark, cat.loadTable(cargs(0)))
        t.metadata.partitionStatistics.foreach(p =>
          println(s"snapshot ${p.snapshotId}: ${p.path}"))
      case "clean-orphan-files" =>
        val removed = Maintenance.removeOrphanFiles(
          cat.loadTable(cargs(0)), olderThanMs = cargs(1).toLong)
        println(s"removed ${removed.size} orphan files")
      case "snapshots" =>
        Inspect.snapshots(spark, cat.loadTable(cargs(0))).show(100, truncate = false)
      case "files" if outputJson =>
        // reference jsonOutput.Files: {"snapshot":{…}} for the current
        // snapshot, {"snapshots":[…]} with --history
        val t = cat.loadTable(cargs(0))
        val m = metaNode(t)
        val root = mapper.createObjectNode()
        if (cargs.contains("--history"))
          root.set[com.fasterxml.jackson.databind.JsonNode]("snapshots", m.get("snapshots"))
        else
          root.set[com.fasterxml.jackson.databind.JsonNode]("snapshot",
            t.metadata.currentSnapshotId.map(id =>
              findById(m.get("snapshots"), "snapshot-id", id)).getOrElse(mapper.nullNode()))
        println(mapper.writeValueAsString(root))
      case "files" =>
        Inspect.files(spark, cat.loadTable(cargs(0))).show(100, truncate = false)
      case "partitions" =>
        Inspect.partitions(spark, cat.loadTable(cargs(0))).show(100, truncate = false)
      case "read" =>
        val n = if (cargs.length > 1) cargs(1).toInt else 20
        graft.table.SparkRead.read(spark, cat.loadTable(cargs(0)).newScan).show(n, truncate = false)
      case "changelog" =>
        // row-level CDC between two snapshots on the same lineage; reads
        // only the files whose signature changed (changedTasksBetween)
        val n = if (cargs.length > 3) cargs(3).toInt else 20
        graft.table.Incremental.changelogBetween(spark, cat.loadTable(cargs(0)),
          cargs(1).toLong, cargs(2).toLong).show(n, truncate = false)

      // ---- refs ------------------------------------------------------------
      case "branch" | "tag" =>
        val t = cat.loadTable(cargs(0))
        val snap = if (cargs.length > 2) cargs(2).toLong
          else t.metadata.currentSnapshotId.getOrElse {
            System.err.println(s"${t.name} has no current snapshot"); sys.exit(2)
          }
        Evolve.setRef(t, cargs(1), snap, refType = command)
        println(s"$command ${cargs(1)} -> $snap")

      // ---- history surgery -------------------------------------------------
      case "rollback" =>
        val t = Evolve.rollbackTo(cat.loadTable(cargs(0)), cargs(1).toLong)
        println(s"rolled back ${t.name} to snapshot ${cargs(1)}")
      case "upgrade" =>
        val t = Evolve.upgradeFormatVersion(cat.loadTable(cargs(0)), cargs(1).toInt)
        println(s"${t.name} format-version: ${t.metadata.formatVersion}")

      // ---- maintenance -----------------------------------------------------
      case "expire" =>
        val retain = if (cargs.length > 2) cargs(2).toInt else 1
        val res = Maintenance.expireSnapshots(cat.loadTable(cargs(0)),
          olderThanMs = cargs(1).toLong, retainLast = retain)
        println(s"expired ${res.expiredSnapshots.size} snapshots, " +
          s"deleted ${res.deletedFiles.size} files")
      case "compact" =>
        val res = Maintenance.rewriteDataFiles(spark, cat.loadTable(cargs(0)))
        println(s"compacted ${res.rewrittenDataFiles} data files into " +
          s"${res.addedDataFiles}, removed ${res.removedDeleteFiles} delete files")

      // ---- catalog identity ------------------------------------------------
      case "rename" =>
        cat match {
          case sc: graft.catalog.SqlCatalog => sc.renameTable(cargs(0), cargs(1))
          case rc: graft.rest.RestCatalog   => rc.renameTable(cargs(0), cargs(1))
          case _ =>
            System.err.println("this catalog does not support rename (path-identity storage)")
            sys.exit(2)
        }
        println(s"renamed ${cargs(0)} -> ${cargs(1)}")
      case "register" =>
        cat match {
          case sc: graft.catalog.SqlCatalog => sc.registerTable(cargs(0), cargs(1))
          case rc: graft.rest.RestCatalog   => rc.registerTable(cargs(0), cargs(1))
          case _ =>
            System.err.println("this catalog does not support register")
            sys.exit(2)
        }
        println(s"registered ${cargs(0)} at ${cargs(1)}")

      case "drop" =>
        // --purge physically deletes the table's files first (reference
        // PurgeFiles semantics, gc.enabled respected). On a path-identity
        // catalog the directory IS the identity, so purge routes through
        // purgeTable, which keeps the data dir when gc.enabled=false;
        // row-identity catalogs just drop their pointer afterwards.
        val name = cargs(0)
        val purge = cargs.length > 1 && cargs(1) == "--purge"
        (purge, cat) match {
          case (true, hc: graft.catalog.HadoopCatalog) =>
            println(s"purged ${hc.purgeTable(name).size} files")
          case (true, _) =>
            println(s"purged ${Maintenance.purgeFiles(cat.loadTable(name)).size} files")
            cat.dropTable(name)
          case (false, _) =>
            cat.dropTable(name)
        }
        println(s"dropped $name")
      case other =>
        System.err.println(s"unknown command: $other\n$usage")
        sys.exit(2)
    }
  }
}
