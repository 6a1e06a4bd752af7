package graft.tools

import java.util.UUID

import org.apache.spark.sql.SparkSession

/** Measures the v3 lineage-carry cost on GROUP-BASED rewrites at data
  * scale: the same whole-table UPDATE (untranslatable predicate → group
  * ReplaceData rewrite) on a v2 table (no metadata projection, no widened
  * write schema) vs a v3 table (full `_row_id`/`_last_updated_sequence_
  * number` carry). The delta is exactly what the carry costs per row —
  * the number that says whether it survives a 100 TB rewrite.
  *
  * `sbt "runMain graft.tools.LineageScale"` — prints one line per
  * (sf, mode) and the overhead ratios.
  */
object LineageScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = s"/root/repo/target/graft-wh/lscale_${UUID.randomUUID().toString.take(8)}"
    val ctl = "lsc"
    spark.conf.set(s"spark.sql.catalog.$ctl",
      classOf[graft.sources.GraftSpjCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$ctl.uri", wh)
    val cat = new graft.catalog.HadoopCatalog(wh)

    def run(sf: String, v3: Boolean): (Long, Double, Double) = {
      val name = s"t_${sf.replace('.', '_')}_v${if (v3) 3 else 2}"
      val src = spark.read.parquet(s"/root/testdata/$sf/lineitem.parquet")
        .selectExpr("l_orderkey AS k", "l_partkey AS p",
          "CAST(l_quantity AS DOUBLE) AS q", "l_returnflag AS c")
      spark.sql(s"CREATE TABLE $ctl.$name (k BIGINT, p BIGINT, q DOUBLE, c STRING)")
      if (v3) graft.table.Evolve.upgradeFormatVersion(cat.loadTable(name), 3)
      src.createOrReplaceTempView(s"src_$name")
      spark.sql(s"INSERT INTO $ctl.$name SELECT * FROM src_$name")
      val rows = spark.table(s"$ctl.$name").count()
      def upd(tag: Int): Double = {
        val t0 = System.nanoTime()
        // untranslatable predicate → group-based rewrite of every file
        spark.sql(s"UPDATE $ctl.$name SET q = q + 1 WHERE k % 97 = $tag")
        (System.nanoTime() - t0) / 1e9
      }
      upd(1) // warm (codegen + JIT on this shape)
      val best = Seq(upd(2), upd(3)).min
      (rows, best, rows / best)
    }

    val out = for (sf <- Seq("sf0.01", "sf0.1"); v3 <- Seq(false, true)) yield {
      val (rows, sec, thr) = run(sf, v3)
      println(f"[lscale] $sf v${if (v3) 3 else 2}: $rows%8d rows, " +
        f"group UPDATE $sec%7.3f s (${thr / 1000}%8.1f krows/s)")
      ((sf, v3), (rows, sec))
    }
    val m = out.toMap
    Seq("sf0.01", "sf0.1").foreach { sf =>
      val o = m((sf, true))._2 / m((sf, false))._2
      println(f"[lscale] $sf lineage-carry overhead: ${(o - 1) * 100}%5.1f%%")
    }
    spark.stop()
  }
}
