package graft

import org.apache.spark.sql.SparkSession

import graft.catalog.Catalogs
import graft.table.Inspect

/** Minimal table CLI (reference `cmd/iceberg`): list / describe / snapshots /
  * files / partitions / read against a warehouse path.
  *
  * Usage: graft.Cli <warehouse> <command> [table] [n]
  */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: Cli <warehouse> list | (describe|snapshots|files|partitions|read) <table> [n] | drop <table> [--purge]")
      sys.exit(2)
    }
    val warehouse = args(0)
    val command = args(1)
    val cat = Catalogs.load(warehouse)

    lazy val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

    command match {
      case "list" =>
        cat.listTables().foreach(println)
      case "describe" =>
        val t = cat.loadTable(args(2))
        println(s"table: ${t.name}")
        println(s"location: ${t.location}")
        println(s"format-version: ${t.metadata.formatVersion}")
        println(s"current-snapshot: ${t.metadata.currentSnapshotId.getOrElse("-")}")
        println("schema:")
        t.schema.fields.foreach(f =>
          println(s"  ${f.id}: ${f.name}: ${if (f.required) "required" else "optional"} ${f.fieldType}"))
        println(s"partition-spec: ${t.spec.fields.map(f => s"${f.name}=${f.transform.name}").mkString(", ")}")
        println(s"properties: ${t.metadata.properties}")
      case "snapshots" =>
        Inspect.snapshots(spark, cat.loadTable(args(2))).show(100, truncate = false)
      case "files" =>
        Inspect.files(spark, cat.loadTable(args(2))).show(100, truncate = false)
      case "partitions" =>
        Inspect.partitions(spark, cat.loadTable(args(2))).show(100, truncate = false)
      case "read" =>
        val n = if (args.length > 3) args(3).toInt else 20
        graft.table.SparkRead.read(spark, cat.loadTable(args(2)).newScan).show(n, truncate = false)
      case "drop" =>
        // --purge physically deletes the table's files first (reference
        // PurgeFiles semantics, gc.enabled respected); plain drop only
        // unregisters from the catalog
        val name = args(2)
        if (args.length > 3 && args(3) == "--purge") {
          val purged = graft.table.Maintenance.purgeFiles(cat.loadTable(name))
          println(s"purged ${purged.size} files")
        }
        cat.dropTable(name)
        println(s"dropped $name")
      case other =>
        System.err.println(s"unknown command: $other")
        sys.exit(2)
    }
  }
}
