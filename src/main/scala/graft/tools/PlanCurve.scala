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
    println(s"""{"metric":"plan_curve","unit":"sec","scales":{$rowJson},"layouts_at_n$nTop":{$layoutJson},"deletes_at_n100000":{$deleteJson}}""")

    // leave no debris for the bench reap to pay for
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm)
      p.delete()
    }
    rm(new java.io.File(wh))
  }
}
