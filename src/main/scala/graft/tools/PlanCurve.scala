package graft.tools

import java.util.UUID

import graft.core._
import graft.core.IcebergTypes._
import graft.format._
import graft.table.{Scan, Table}

/** Scan-PLANNING latency vs table file count — the metadata scale axis the
  * operator curves (ScaleCurve) don't touch. At 100 TB with the reference's
  * 128 MiB target file size a table holds ~800k data files across 10²–10³
  * manifests, and `planFiles` runs on the DRIVER (reference
  * `table/scanner.go:640-950` plans on one node the same way), so planning
  * latency must stay sub-linear in practice: manifest-list → manifest
  * pruning via partition FieldSummaries → parallel per-manifest entry
  * pruning. This tool authors SYNTHETIC manifests (planning never opens a
  * data file, so the paths are fake), scales N ∈ {1k, 10k, 100k, 300k}
  * files at 1000 entries/manifest, and times three plans at each scale:
  *
  *  - full:  no filter (every manifest read, every entry kept)
  *  - part:  `part = 7` over 256 identity partitions, manifests
  *           partition-band-clustered — FieldSummary pruning must cut the
  *           manifests READ to ~1/256 and hold latency near-flat
  *  - point: `id` bounds hitting ONE file — manifests still read (id bounds
  *           don't ride the partition summaries) but entry pruning drops
  *           all but one task
  *
  * It also contrasts manifest LAYOUT at the top scale (250 vs 1000 vs 4000
  * entries/manifest) — the knob `commit.manifest.target-size-bytes`
  * actually turns — because per-manifest open overhead vs per-entry decode
  * is the planning trade a 100 TB operator tunes.
  *
  * Usage: `sbt "runMain graft.tools.PlanCurve"`; one JSON line on stdout,
  * human summary on stderr. No SparkSession: planning is pure driver code.
  */
object PlanCurve {

  private val P = 256 // identity partitions

  private val schema = IcebergSchema(Seq(
    NestedField(1, "id", LongT, required = true),
    NestedField(2, "part", IntT, required = true)))
  private val spec = PartitionSpec(0,
    Seq(PartitionField(2, 1000, "part", Transforms.Identity)))

  /** Author a snapshot with n synthetic data files + nDeletes delete files
    * (half file-referenced positional, half global equality — the CDC
    * backlog shape), entriesPerManifest per manifest,
    * partition-band-clustered; returns a plannable Table.
    */
  private def buildTable(wh: String, n: Int, entriesPerManifest: Int,
      nDeletes: Int = 0): (Table, Double) = {
    val dir = s"$wh/metadata"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val partType = spec.partitionType(schema)
    val snapshotId = 1L
    val t0 = System.nanoTime()
    val manifests = (0 until n).grouped(entriesPerManifest).zipWithIndex.map {
      case (idxs, mi) =>
        val entries = idxs.map { i =>
          val part = (i.toLong * P / n).toInt
          ManifestEntry(ManifestEntryStatus.Added, Some(snapshotId),
            Some(1L), Some(1L),
            DataFile(DataFileContent.Data, s"$wh/data/f$i.parquet", "PARQUET",
              partition = Seq(Int.box(part)),
              recordCount = 1000L, fileSize = 128L * 1024 * 1024,
              valueCounts = Map(1 -> 1000L, 2 -> 1000L),
              nullCounts = Map(1 -> 0L, 2 -> 0L),
              lowerBounds = Map(1 -> Literals.encode(LongT, i * 1000L),
                2 -> Literals.encode(IntT, Int.box(part))),
              upperBounds = Map(1 -> Literals.encode(LongT, i * 1000L + 999L),
                2 -> Literals.encode(IntT, Int.box(part)))))
        }
        val p = s"$dir/m$mi-$n-$entriesPerManifest.avro"
        val len = Manifests.writeManifest(p, entries, schema, spec, snapshotId)
        ManifestFile(p, len, 0, ManifestContent.Data, 1L, 1L, snapshotId,
          entries.size, 0, 0, entries.map(_.file.recordCount).sum, 0L, 0L,
          graft.table.Writer.partitionSummaries(entries.map(_.file), partType))
    }.toSeq
    val deleteManifests = if (nDeletes == 0) Nil else {
      (0 until nDeletes).grouped(entriesPerManifest).zipWithIndex.map {
        case (idxs, mi) =>
          val entries = idxs.map { i =>
            val part = (i.toLong * P / nDeletes).toInt
            val pos = i % 2 == 0
            ManifestEntry(ManifestEntryStatus.Added, Some(snapshotId),
              Some(2L), Some(2L),
              DataFile(
                if (pos) DataFileContent.PositionDeletes
                else DataFileContent.EqualityDeletes,
                s"$wh/data/d$i.parquet", "PARQUET",
                // pos deletes reference a data file; eq deletes scope to
                // their partition (the CDC fanout-writer shape)
                partition = Seq(Int.box(part)),
                recordCount = 10L, fileSize = 4096L,
                equalityIds = if (pos) Nil else Seq(1),
                referencedDataFile =
                  if (pos) Some(s"$wh/data/f${i % n}.parquet") else None))
          }
          val p = s"$dir/dm$mi-$n-$nDeletes.avro"
          val len = Manifests.writeManifest(p, entries, schema, spec, snapshotId,
            content = ManifestContent.Deletes)
          ManifestFile(p, len, 0, ManifestContent.Deletes, 2L, 2L, snapshotId,
            entries.size, 0, 0, entries.map(_.file.recordCount).sum, 0L, 0L,
            graft.table.Writer.partitionSummaries(entries.map(_.file), partType))
      }.toSeq
    }
    val listPath = s"$dir/snap-$n-$entriesPerManifest-$nDeletes.avro"
    Manifests.writeManifestList(listPath, manifests ++ deleteManifests,
      snapshotId, None, 2L)
    val authorSec = (System.nanoTime() - t0) / 1e9
    val meta = TableMetadata.empty(wh, schema, spec).copy(
      currentSnapshotId = Some(snapshotId),
      snapshots = Seq(Snapshot(snapshotId, None, 1L, System.currentTimeMillis(),
        listPath, Map("operation" -> "append"), Some(0))),
      lastSequenceNumber = 1L)
    (new Table("plan_curve", meta, s"$dir/v1.metadata.json",
      new graft.catalog.HadoopCatalog(wh)), authorSec)
  }

  /** Register a built synthetic table in its HadoopCatalog layout so the
    * REST server's `backing.loadTable` finds it: write the v1 metadata JSON
    * plus the advisory version hint (the sniff fallback would also resolve
    * it, but the hint keeps loads one IO).
    */
  private def persistForCatalog(t: Table): Unit = {
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(t.metadataPath),
      TableMetadata.toJson(t.metadata))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(t.metadataPath).getParent.resolve("version-hint.text"),
      "1")
  }

  private def usedHeapMb(): Double = {
    val rt = Runtime.getRuntime
    System.gc(); Thread.sleep(100); System.gc(); Thread.sleep(50)
    (rt.totalMemory - rt.freeMemory) / 1e6
  }

  /** REST distributed-plan route (the documented exit past the driver-side
    * planning range): drive the synthetic table through RestCatalogServer's
    * async submit/poll/shard wire and time each leg — submit (the server
    * plans the FULL table and parks the shards inside this call), poll to
    * completed, inline-envelope decode (= time-to-first-tasks: a consumer
    * can dispatch work after this), then per-shard fetch+decode. Client
    * memory is reported as retained-heap deltas: a STREAMING consumer
    * (decode a shard, hand it off, drop it) holds one shard; a collect-all
    * client and the local planner hold the whole task list.
    */
  private def restPlan(t: Table, name: String, backingWh: String,
      shardSize: Int): Map[String, Double] = {
    import com.fasterxml.jackson.databind.ObjectMapper
    persistForCatalog(t)
    val backing = new graft.catalog.HadoopCatalog(backingWh)
    val server = new graft.rest.RestCatalogServer(backing,
      asyncPlanThreshold = 1, planTaskShardSize = shardSize).start()
    try {
      val mapper = new ObjectMapper()
      val http = java.net.http.HttpClient.newHttpClient()
      def req(method: String, path: String, body: Option[String]) = {
        val b = java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(s"${server.uri}/v1/$path"))
          .header("Content-Type", "application/json")
        val r = (method match {
          case "POST" => b.POST(java.net.http.HttpRequest.BodyPublishers.ofString(body.getOrElse("{}")))
          case "GET" => b.GET()
        }).build()
        http.send(r, java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      val specById: Int => Option[PartitionSpec] = t.metadata.specById _
      val schema = t.schema
      // shard handles are ONE-SHOT (serving evicts, bounding server state),
      // so each consumption mode drives its own plan submit
      final case class Drained(tSubmit: Double, tPoll: Double, polls: Int,
        tInlineDecode: Double, firstShardSec: Double, shardSecSum: Double,
        shards: Int, maxShardBodyMb: Double, totalSec: Double, count: Long,
        retained: scala.collection.mutable.ArrayBuffer[graft.table.FileScanTask])
      def drain(retain: Boolean): Drained = {
        val t0 = System.nanoTime()
        val sub = req("POST", s"namespaces/default/tables/$name/plan", Some("{}"))
        val tSubmit = (System.nanoTime() - t0) / 1e9
        require(sub.statusCode == 200, s"submit: ${sub.statusCode} ${sub.body.take(200)}")
        val subNode = mapper.readTree(sub.body)
        require(subNode.path("status").asText == "submitted", "expected async submit")
        val planId = subNode.path("plan-id").asText
        // poll until completed (the server returns ≥1 "submitted" first)
        var body: com.fasterxml.jackson.databind.JsonNode = null
        val tPoll0 = System.nanoTime()
        var polls = 0
        while (body == null) {
          val r = req("GET", s"namespaces/default/tables/$name/plan/$planId", None)
          require(r.statusCode == 200, s"poll: ${r.statusCode}")
          val n = mapper.readTree(r.body)
          polls += 1
          if (n.path("status").asText == "completed") body = n
        }
        val tPoll = (System.nanoTime() - tPoll0) / 1e9
        val tDec0 = System.nanoTime()
        val inline = graft.rest.ScanTaskJson.readTasks(body, specById, schema)
        val tInlineDecode = (System.nanoTime() - tDec0) / 1e9
        val handles = {
          val h = body.path("plan-tasks")
          if (h.isMissingNode) Nil
          else { import scala.jdk.CollectionConverters._
            h.elements().asScala.map(_.asText).toList }
        }
        val retained = scala.collection.mutable.ArrayBuffer.empty[graft.table.FileScanTask]
        if (retain) retained ++= inline
        var count = inline.size.toLong
        var firstShardSec = 0.0
        var shardSecSum = 0.0
        var maxShardBodyMb = 0.0
        handles.zipWithIndex.foreach { case (h, i) =>
          val s0 = System.nanoTime()
          val r = req("POST", s"namespaces/default/tables/$name/tasks",
            Some(s"""{"plan-task":"$h"}"""))
          require(r.statusCode == 200, s"shard: ${r.statusCode}")
          val tasks = graft.rest.ScanTaskJson.readTasks(mapper.readTree(r.body), specById, schema)
          val dt = (System.nanoTime() - s0) / 1e9
          if (i == 0) firstShardSec = dt
          shardSecSum += dt
          maxShardBodyMb = math.max(maxShardBodyMb, r.body.length / 1e6)
          count += tasks.size
          if (retain) retained ++= tasks
        }
        Drained(tSubmit, tPoll, polls, tInlineDecode, firstShardSec,
          shardSecSum, handles.size, maxShardBodyMb,
          (System.nanoTime() - t0) / 1e9, count, retained)
      }
      // CONCURRENT fleet consumer: one submit, then the shard fetches fan
      // out across `par` client threads (the shape a 1000-executor driver
      // actually runs — r15's curve extrapolated this from the sequential
      // client; this measures it, server contention included).
      def drainConcurrent(par: Int): (Double, Double, Long, Int) = {
        val t0 = System.nanoTime()
        val sub = req("POST", s"namespaces/default/tables/$name/plan", Some("{}"))
        require(sub.statusCode == 200, s"submit: ${sub.statusCode}")
        val planId = mapper.readTree(sub.body).path("plan-id").asText
        var body: com.fasterxml.jackson.databind.JsonNode = null
        while (body == null) {
          val r = req("GET", s"namespaces/default/tables/$name/plan/$planId", None)
          require(r.statusCode == 200, s"poll: ${r.statusCode}")
          val n = mapper.readTree(r.body)
          if (n.path("status").asText == "completed") body = n
        }
        val inline = graft.rest.ScanTaskJson.readTasks(body, specById, schema)
        val handles = {
          val h = body.path("plan-tasks")
          if (h.isMissingNode) Nil
          else { import scala.jdk.CollectionConverters._
            h.elements().asScala.map(_.asText).toList }
        }
        val queue = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        handles.foreach(queue.add)
        val count = new java.util.concurrent.atomic.AtomicLong(inline.size.toLong)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
        val f0 = System.nanoTime()
        // non-daemon pool threads: shut down even when a worker fails, or
        // the tool JVM hangs after the exception instead of exiting
        try {
          val futures = (0 until par).map { _ =>
            pool.submit(new Runnable { def run(): Unit = {
              var h = queue.poll()
              while (h != null) {
                val r = req("POST", s"namespaces/default/tables/$name/tasks",
                  Some(s"""{"plan-task":"$h"}"""))
                require(r.statusCode == 200, s"shard: ${r.statusCode}")
                val tasks = graft.rest.ScanTaskJson.readTasks(
                  mapper.readTree(r.body), specById, schema)
                count.addAndGet(tasks.size.toLong)
                h = queue.poll()
              }
            }})
          }
          futures.foreach(_.get)
        } finally pool.shutdownNow()
        val fanoutSec = (System.nanoTime() - f0) / 1e9
        ((System.nanoTime() - t0) / 1e9, fanoutSec, count.get, handles.size)
      }
      // streaming consumer: decode a shard, hand it off, drop it
      val h0 = usedHeapMb()
      val s = drain(retain = false)
      val hStream = usedHeapMb() - h0
      // collect-all client: every decoded task retained at once
      val h1 = usedHeapMb()
      val c = drain(retain = true)
      val hCollect = usedHeapMb() - h1
      require(c.count == s.count,
        s"rest plan task count unstable across submits: ${s.count} vs ${c.count}")
      c.retained.clear()
      val fanPar = 8 // matches the server's handler pool — contention included
      val (fanTotal, fanFetch, fanCount, fanShards) = drainConcurrent(fanPar)
      require(fanCount == s.count,
        s"concurrent drain diverges: $fanCount vs ${s.count}")
      // the local planner holds the same full task list on the driver —
      // the baseline the shard wire's streaming consumer beats
      val hBase2 = usedHeapMb()
      val local = t.newScan.planFiles()
      val hLocal = usedHeapMb() - hBase2
      require(local.size.toLong == s.count,
        s"rest plan diverges from local: rest=${s.count} local=${local.size}")
      Map(
        "submit_sec" -> s.tSubmit, "poll_sec" -> s.tPoll, "polls" -> s.polls.toDouble,
        "inline_decode_sec" -> s.tInlineDecode,
        "to_first_tasks_sec" -> (s.tSubmit + s.tPoll + s.tInlineDecode),
        "first_shard_sec" -> s.firstShardSec,
        "shards" -> s.shards.toDouble,
        "shard_fetch_decode_avg_sec" ->
          (if (s.shards == 0) 0.0 else s.shardSecSum / s.shards),
        "max_shard_body_mb" -> s.maxShardBodyMb,
        "total_sec" -> s.totalSec,
        "fanout_par" -> fanPar.toDouble,
        "fanout_fetch_sec" -> fanFetch,
        "fanout_total_sec" -> fanTotal,
        "fanout_speedup" ->
          (if (fanFetch > 0 && fanShards > 0) s.shardSecSum / fanFetch else 1.0),
        "stream_residual_heap_mb" -> hStream,
        "collect_all_heap_mb" -> hCollect,
        "local_plan_heap_mb" -> hLocal,
        "tasks" -> s.count.toDouble)
    } finally server.stop()
  }

  private def timePlan(scan: Scan, reps: Int = 3): (Double, graft.table.ScanMetrics) = {
    var best = Double.MaxValue
    var m: graft.table.ScanMetrics = null
    scan.planFilesWithMetrics() // warm (JIT + page cache)
    (0 until reps).foreach { _ =>
      val t0 = System.nanoTime()
      val (_, mm) = scan.planFilesWithMetrics()
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
      m = mm
    }
    (best, m)
  }

  def main(args: Array[String]): Unit = {
    val wh = s"/root/repo/target/graft-wh/pcurve_${UUID.randomUUID().toString.take(8)}"
    val scales = Seq(1000, 10000, 100000, 300000)
    val rows = scales.map { n =>
      val (t, authorSec) = buildTable(s"$wh/n$n", n, 1000)
      val (full, mFull) = timePlan(t.newScan)
      val (part, mPart) = timePlan(t.newScan.withFilter(Expr.eq("part", 7)))
      val mid = n / 2
      val (point, mPoint) = timePlan(t.newScan.withFilter(Expr.and(
        Expr.gtEq("id", mid * 1000L), Expr.ltEq("id", mid * 1000L + 500L))))
      System.err.println(
        f"[pcurve] n=$n%7d author=$authorSec%6.2fs full=$full%7.3fs (${mFull.resultDataFiles}%7d tasks) " +
        f"part=$part%7.3fs (read ${mPart.totalManifests - mPart.skippedManifests}%4d/${mPart.totalManifests}%4d manifests, ${mPart.resultDataFiles}%6d tasks) " +
        f"point=$point%7.3fs (${mPoint.resultDataFiles}%3d tasks)")
      (n, authorSec, full, mFull, part, mPart, point, mPoint)
    }

    // delete-index dimension: planning cost vs delete-file count at a fixed
    // 100k data files (the CDC-backlog shape: half file-referenced pos
    // deletes, half partition-scoped eq deletes). DeleteIndex.build plus
    // per-task matching is the added term — O(files·log(deletes)) by design
    val deletePoints = Seq(0, 1000, 10000).map { nd =>
      val (t, _) = buildTable(s"$wh/del$nd", 100000, 1000, nDeletes = nd)
      val (full, m) = timePlan(t.newScan)
      System.err.println(f"[pcurve] deletes=$nd%6d full=$full%7.3fs " +
        f"(pos=${m.posDeleteFiles}%7d eq=${m.eqDeleteFiles}%7d attached)")
      (nd, full, m)
    }

    // manifest-layout contrast at the top scale
    val nTop = scales.last
    // epm=1000 repeats the top scale's layout in a warmer JVM: its delta vs
    // the scales row above is warm-up/GC skew, not layout
    val layouts = Seq(250, 1000, 4000).map { epm =>
      val (t, _) = buildTable(s"$wh/layout$epm", nTop, epm)
      val (full, _) = timePlan(t.newScan)
      val (part, mPart) = timePlan(t.newScan.withFilter(Expr.eq("part", 7)))
      System.err.println(f"[pcurve] layout epm=$epm%5d full=$full%7.3fs part=$part%7.3fs " +
        f"(read ${mPart.totalManifests - mPart.skippedManifests}%4d/${mPart.totalManifests}%4d manifests)")
      (epm, full, part)
    }

    // REST distributed-plan exit — the >800k-file path PLAN_CURVE_r14 named
    // as designed (gated i107/i113) but never MEASURED at plan scale
    val restRows = Seq(100000, 300000).map { n =>
      val (t, _) = buildTable(s"$wh/rest$n", n, 1000)
      val m = restPlan(t, s"rest$n", wh, shardSize = 10000)
      System.err.println(
        f"[pcurve] rest n=$n%7d submit=${m("submit_sec")}%6.3fs poll=${m("poll_sec")}%6.3fs " +
        f"firstTasks=${m("to_first_tasks_sec")}%6.3fs shards=${m("shards")}%3.0f " +
        f"avgShard=${m("shard_fetch_decode_avg_sec")}%6.3fs total=${m("total_sec")}%7.3fs " +
        f"fanout${m("fanout_par")}%.0f fetch=${m("fanout_fetch_sec")}%6.3fs " +
        f"(${m("fanout_speedup")}%4.1fx) total=${m("fanout_total_sec")}%7.3fs " +
        f"heap stream=${m("stream_residual_heap_mb")}%6.1fMB collect=${m("collect_all_heap_mb")}%7.1fMB " +
        f"local=${m("local_plan_heap_mb")}%7.1fMB")
      (n, m)
    }

    val rowJson = rows.map { case (n, a, f, mf, p, mp, pt, mpt) =>
      f""""n$n":{"author_sec":$a%.3f,"full_sec":$f%.4f,"full_tasks":${mf.resultDataFiles},""" +
      f""""part_sec":$p%.4f,"part_manifests_read":${mp.totalManifests - mp.skippedManifests},""" +
      f""""part_manifests_total":${mp.totalManifests},"part_tasks":${mp.resultDataFiles},""" +
      f""""point_sec":$pt%.4f,"point_tasks":${mpt.resultDataFiles}}"""
    }.mkString(",")
    val layoutJson = layouts.map { case (epm, f, p) =>
      f""""epm$epm":{"full_sec":$f%.4f,"part_sec":$p%.4f}"""
    }.mkString(",")
    val deleteJson = deletePoints.map { case (nd, f, m) =>
      f""""d$nd":{"full_sec":$f%.4f,"pos_attached":${m.posDeleteFiles},"eq_attached":${m.eqDeleteFiles}}"""
    }.mkString(",")
    val restJson = restRows.map { case (n, m) =>
      s""""n$n":{""" + m.toSeq.sortBy(_._1).map { case (k, v) =>
        f""""$k":$v%.4f""" }.mkString(",") + "}"
    }.mkString(",")
    println(s"""{"metric":"plan_curve","unit":"sec","scales":{$rowJson},"layouts_at_n$nTop":{$layoutJson},"deletes_at_n100000":{$deleteJson},"rest":{$restJson}}""")

    // leave no debris for the bench reap to pay for
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm)
      p.delete()
    }
    rm(new java.io.File(wh))
  }
}
