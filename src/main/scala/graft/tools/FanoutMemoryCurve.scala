package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fanout write memory vs input size — the reference's
  * `table/fanout_memory_bench_test.go:75-203` benchmark shape: peak write
  * memory must stay BOUNDED as the row volume grows, because the fanout
  * design holds one open row-group buffer per task (rows arrive clustered
  * by partition; close-on-change) rather than one buffer per partition.
  * An unbounded curve here is the classic fanout-writer OOM at 100 TB:
  * peak memory ∝ partitions × row-group size × tasks.
  *
  * Measures Spark's per-task peakExecutionMemory plus the JVM heap delta
  * across partitioned appends of 1×/2×/4× the base row count into a
  * bucket[16]-partitioned table. Flat-ish peaks = bounded; growing with
  * input = a buffer leak.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=… runMain graft.tools.FanoutMemoryCurve`.
  */
object FanoutMemoryCurve {

  private final class PeakListener extends SparkListener {
    val peakExecMem = new AtomicLong(0)
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) peakExecMem.getAndUpdate(x => math.max(x, m.peakExecutionMemory))
      ()
    }
    def reset(): Unit = peakExecMem.set(0)
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new PeakListener
    spark.sparkContext.addSparkListener(listener)
    import graft.catalog.HadoopCatalog
    import graft.core.{SchemaBridge, Transforms}
    import graft.format.PartitionSpec
    import graft.table.Writer

    val base0 = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
    def replicated(times: Int) = (0 until times).map(k =>
      base0.withColumn("doc_id", col("doc_id") + lit(k * 10000000L)))
      .reduce(_ unionByName _).repartition(32)

    val docs = replicated(80).persist()
    val rows = docs.count()

    def measure(nParts: Int): (Long, Long, Double) = {
      val wh = s"/root/repo/target/graft-wh/fmem_${java.util.UUID.randomUUID().toString.take(8)}"
      val cat = new HadoopCatalog(wh)
      val schema = SchemaBridge.fromSpark(docs.schema)
      val t0 = cat.createTable("d", schema,
        PartitionSpec.builder(schema).add("doc_id", Transforms.Bucket(nParts)).build())
      System.gc()
      Thread.sleep(200)
      listener.reset()
      val start = System.nanoTime()
      Writer.append(spark, t0, docs)
      val sec = (System.nanoTime() - start) / 1e9
      Thread.sleep(500) // listener-bus drain
      graft.io.FileIO.deleteTree(wh)
      (rows, listener.peakExecMem.get, sec)
    }

    measure(4) // warm
    val points = Seq(4, 16, 64).map { nParts =>
      val (_, peak, sec) = measure(nParts)
      System.err.println(
        f"[fmem] partitions=$nParts%-3d rows=$rows%8d peak-task-exec-mem=${peak / 1024 / 1024}%5d MB $sec%6.2fs")
      (nParts, peak, sec)
    }
    docs.unpersist()
    val basePeak = math.max(1L, points.head._2)
    val json = points.map { case (nParts, peak, sec) =>
      f""""p$nParts":{"peak_task_exec_mem_bytes":$peak,"vs_p4":${peak.toDouble / basePeak}%.2f,"sec":$sec%.3f}"""
    }.mkString(
      "{\"metric\":\"fanout_memory_curve\",\"sf\":\"" + src + "\",\"rows\":" + rows + ",",
      ",", "}")
    println(json)
    spark.stop()
  }
}
