package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Scratch per-job profiler for one gate (not gate surface): runs a query
  * via the bench methodology (noop sink, warm rep first) and prints every
  * Spark job's wall time, stage count and task count so the expensive jobs
  * of a multi-action gate are attributable. Run via
  * `sbt "runMain graft.tools.ProfileGate <query> [reps]"`.
  */
object ProfileGate {

  private final class JobLog extends SparkListener {
    case class Job(id: Int, t0: Long, var t1: Long = 0L, var stages: Int = 0,
        var tasks: Int = 0, var desc: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new ConcurrentLinkedQueue[Int]()
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val j = Job(e.jobId, e.time)
      j.stages = e.stageInfos.size
      j.tasks = e.stageInfos.map(_.numTasks).sum
      j.desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      jobs.put(e.jobId, j)
      order.add(e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      val j = jobs.get(e.jobId)
      if (j != null) j.t1 = e.time
    }
    def clear(): Unit = { jobs.clear(); order.clear() }
    def dump(): Unit = {
      import scala.jdk.CollectionConverters._
      var total = 0.0
      order.asScala.foreach { id =>
        val j = jobs.get(id)
        val dt = (j.t1 - j.t0) / 1e3
        total += dt
        println(f"[job] ${j.id}%4d ${dt}%7.3fs stages=${j.stages}%3d tasks=${j.tasks}%5d ${j.desc.take(80)}")
      }
      println(f"[job] total job wall (sum, overlaps possible): $total%.3fs over ${order.size} jobs")
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val log = new JobLog
    spark.sparkContext.addSparkListener(log)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warm-up
    val qd = graft.SparkEntry.all.find(_.name == name)
      .getOrElse(sys.error(s"no such query: $name"))
    (1 to reps).foreach { i =>
      val run: () => org.apache.spark.sql.DataFrame = qd.stagedFn match {
        case Some(prep) => prep(spark, sfDir)
        case None       => () => qd.fn(spark, sfDir)
      }
      log.clear()
      val t0 = System.nanoTime()
      run().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      println(f"===== $name rep $i: $dt%.2f s =====")
      log.dump()
    }
    spark.stop()
  }
}
