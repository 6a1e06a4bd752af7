package graft

import java.nio.file.Files

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.core.Expr.{And, Not, Op, Or, Predicate}
import graft.core.IcebergTypes._
import graft.format._

/** Seeded-random round-trip fuzz over the two wires every peer engine
  * touches: the manifest Avro (writeManifest/readManifest with randomized
  * stats maps, v3 lineage/DV/encryption fields, all entry statuses, all
  * three content kinds) and the REST expression JSON (semantic round-trip:
  * the decoded expression must evaluate identically to the original on
  * random rows — JSON numbers carry no int/long width, so structural
  * equality would over-constrain the wire). The golden specs pin the
  * reference schemas on fixed vectors; this adds payload breadth.
  */
class WireFuzzSpec extends AnyFunSuite {

  private val schema = IcebergSchema(Seq(
    NestedField(1, "id", LongT, required = true),
    NestedField(2, "s", StringT, required = false),
    NestedField(3, "d", DoubleT, required = false),
    NestedField(4, "n", IntT, required = false)))
  private val spec = PartitionSpec(0,
    Seq(PartitionField(4, 1000, "n", Transforms.Identity)))

  private def bytes(r: Random, max: Int = 16): Array[Byte] = {
    val b = new Array[Byte](1 + r.nextInt(max))
    r.nextBytes(b)
    b
  }

  private def statMap[T](r: Random, v: Random => T): Map[Int, T] =
    Seq(1, 2, 3, 4).filter(_ => r.nextBoolean()).map(id => id -> v(r)).toMap

  private def genDataFile(r: Random, content: Int, tag: Int): DataFile = {
    val puffinDv = content == DataFileContent.PositionDeletes && r.nextBoolean()
    DataFile(
      content = content,
      path = s"/w/data/f$tag-${r.nextInt(1000)}.parquet",
      format = if (puffinDv) "PUFFIN" else "PARQUET",
      partition = Seq(if (r.nextInt(4) == 0) null else Int.box(r.nextInt(100) - 50)),
      recordCount = r.nextInt(100000).toLong,
      fileSize = 1L + r.nextInt(1 << 30),
      columnSizes = statMap(r, _.nextInt(1 << 20).toLong),
      valueCounts = statMap(r, _.nextInt(100000).toLong),
      nullCounts = statMap(r, _.nextInt(1000).toLong),
      nanCounts = if (r.nextBoolean()) Map(3 -> r.nextInt(10).toLong) else Map.empty,
      lowerBounds = statMap(r, bytes(_)),
      upperBounds = statMap(r, bytes(_)),
      splitOffsets = Seq.fill(r.nextInt(4))(r.nextInt(1 << 30).toLong).sorted,
      equalityIds = if (content == DataFileContent.EqualityDeletes)
        Seq(1, 4).take(1 + r.nextInt(2)) else Nil,
      sortOrderId = if (r.nextBoolean()) Some(r.nextInt(3)) else None,
      referencedDataFile = if (puffinDv) Some(s"/w/data/ref$tag.parquet") else None,
      contentOffset = if (puffinDv) Some(r.nextInt(10000).toLong) else None,
      contentSize = if (puffinDv) Some(1L + r.nextInt(10000)) else None,
      firstRowId = if (content == DataFileContent.Data && r.nextBoolean())
        Some(r.nextInt(1 << 30).toLong) else None,
      keyMetadata = if (r.nextInt(4) == 0) Some(bytes(r)) else None)
  }

  /** Array fields break case-class equality; compare a normalized view. */
  private def norm(f: DataFile): Any = (
    f.content, f.path, f.format, f.partition, f.recordCount, f.fileSize,
    f.columnSizes, f.valueCounts, f.nullCounts, f.nanCounts,
    f.lowerBounds.view.mapValues(_.toSeq).toMap,
    f.upperBounds.view.mapValues(_.toSeq).toMap,
    f.splitOffsets, f.equalityIds, f.sortOrderId,
    f.referencedDataFile, f.contentOffset, f.contentSize,
    f.firstRowId, f.keyMetadata.map(_.toSeq))

  private def normEntry(e: ManifestEntry): Any =
    (e.status, e.snapshotId, e.dataSequence, e.fileSequence, norm(e.file))

  test("manifest avro round-trips randomized payloads bit-equal (v2 and v3)") {
    val dir = Files.createTempDirectory("graft-wirefuzz").toString
    val r = new Random(41414L)
    (0 until 60).foreach { iter =>
      val fv = if (iter % 2 == 0) 2 else 3
      val content = iter % 3 match {
        case 0 => DataFileContent.Data
        case 1 => DataFileContent.PositionDeletes
        case 2 => DataFileContent.EqualityDeletes
      }
      val mContent =
        if (content == DataFileContent.Data) ManifestContent.Data
        else ManifestContent.Deletes
      val entries = (0 until 1 + r.nextInt(8)).map { i =>
        val status = r.nextInt(3) // existing / added / deleted
        ManifestEntry(status,
          snapshotId = if (r.nextBoolean()) Some(r.nextInt(1 << 30).toLong) else None,
          // explicit sequences (the inherit path has its own unit pins)
          dataSequence = Some(1L + r.nextInt(100)),
          fileSequence = Some(1L + r.nextInt(100)),
          file = genDataFile(r, content, iter * 100 + i))
      }
      val p = s"$dir/m$iter.avro"
      val codec = Seq("uncompressed", "deflate", "zstd", "gzip")(r.nextInt(4))
      Manifests.writeManifest(p, entries, schema, spec, snapshotId = 7L,
        content = mContent, codec = codec, formatVersion = fv)
      val (back, specId) = Manifests.readManifest(p)
      assert(specId === 0)
      assert(back.map(normEntry) === entries.map(normEntry),
        s"iter=$iter fv=$fv codec=$codec content=$content")
    }
  }

  test("manifest-list avro round-trips randomized summaries (v2 and v3)") {
    val dir = Files.createTempDirectory("graft-wirefuzz-list").toString
    val r = new Random(51515L)
    (0 until 40).foreach { iter =>
      val fv = if (iter % 2 == 0) 2 else 3
      val manifests = (0 until 1 + r.nextInt(6)).map { i =>
        ManifestFile(
          path = s"/w/metadata/m$iter-$i.avro",
          length = 1L + r.nextInt(1 << 20),
          specId = 0,
          content = if (r.nextBoolean()) ManifestContent.Data else ManifestContent.Deletes,
          sequenceNumber = 1L + r.nextInt(100),
          minSequenceNumber = 1L + r.nextInt(100),
          addedSnapshotId = r.nextInt(1 << 30).toLong,
          addedFilesCount = r.nextInt(100), existingFilesCount = r.nextInt(100),
          deletedFilesCount = r.nextInt(100),
          addedRowsCount = r.nextInt(100000).toLong,
          existingRowsCount = r.nextInt(100000).toLong,
          deletedRowsCount = r.nextInt(100000).toLong,
          partitions = if (r.nextInt(4) == 0) Nil else Seq(FieldSummary(
            containsNull = r.nextBoolean(),
            containsNan = if (r.nextBoolean()) Some(r.nextBoolean()) else None,
            lowerBound = if (r.nextBoolean()) Some(bytes(r, 4)) else None,
            upperBound = if (r.nextBoolean()) Some(bytes(r, 4)) else None)),
          firstRowId = if (fv >= 3 && r.nextBoolean())
            Some(r.nextInt(1 << 30).toLong) else None)
      }
      val p = s"$dir/snap$iter.avro"
      Manifests.writeManifestList(p, manifests, snapshotId = 9L,
        parentSnapshotId = if (r.nextBoolean()) Some(5L) else None,
        sequenceNumber = 3L, formatVersion = fv)
      val back = Manifests.readManifestList(p)
      def normMf(m: ManifestFile): Any = (
        m.path, m.length, m.specId, m.content, m.sequenceNumber,
        m.minSequenceNumber, m.addedSnapshotId, m.addedFilesCount,
        m.existingFilesCount, m.deletedFilesCount, m.addedRowsCount,
        m.existingRowsCount, m.deletedRowsCount,
        m.partitions.map(fs => (fs.containsNull, fs.containsNan,
          fs.lowerBound.map(_.toSeq), fs.upperBound.map(_.toSeq))),
        m.firstRowId)
      assert(back.map(normMf) === manifests.map(normMf), s"iter=$iter fv=$fv")
    }
  }

  // ---- puffin DV wire: randomized position sets

  test("puffin DV bitmaps round-trip randomized position sets") {
    val dir = Files.createTempDirectory("graft-puffinfuzz").toString
    val r = new Random(81818L)
    (0 until 40).foreach { iter =>
      val bm = new PositionBitmap
      val positions = scala.collection.mutable.Set.empty[Long]
      // sparse singles, dense runs, multi-bucket (>2^32) highs, edges
      (0 until r.nextInt(200)).foreach { _ =>
        val p = r.nextLong(1L << 40)
        positions += p
      }
      val runStart = r.nextLong(1L << 20)
      (runStart until runStart + r.nextInt(500)).foreach(positions += _)
      if (r.nextBoolean()) positions += 0L
      if (r.nextBoolean()) positions += (1L << 32) - 1
      if (r.nextBoolean()) positions += (1L << 32)
      positions.foreach(bm.set)
      assert(bm.cardinality === positions.size.toLong)

      // serialized-form round trip
      val back = PositionBitmap.deserialize(bm.serialize())
      assert(back.cardinality === positions.size.toLong, s"iter=$iter cardinality")
      assert(back.positionsIterator.toSeq.sorted === positions.toSeq.sorted,
        s"iter=$iter positions drifted through serialize/deserialize")
      positions.take(20).foreach(p => assert(back.contains(p)))

      // full puffin container round trip (DV blob rules: ids −1)
      val p = s"$dir/dv$iter.puffin"
      val props = Map("referenced-data-file" -> s"/w/data/f$iter.parquet",
        "cardinality" -> positions.size.toString)
      Puffin.writeBlobs(p, Seq(Puffin.BlobSpec(
        "deletion-vector-v1", DeletionVector.serialize(bm), props)))
      val metas = Puffin.readFooter(p)
      assert(metas.size === 1)
      assert(metas.head.snapshotId === -1L && metas.head.sequenceNumber === -1L)
      assert(metas.head.properties === props)
      val dv = Puffin.readDv(p, metas.head)
      assert(dv.positionsIterator.toSeq.sorted === positions.toSeq.sorted,
        s"iter=$iter positions drifted through the puffin container")
    }
  }

  // ---- spec FileScanTask JSON: randomized envelope round-trip

  test("spec scan-task JSON round-trips randomized tasks across partition types") {
    import graft.table.FileScanTask
    val schema2 = IcebergSchema(Seq(
      NestedField(1, "id", LongT, required = true),
      NestedField(2, "s", StringT, required = false),
      NestedField(3, "dec", DecimalT(10, 2), required = false),
      NestedField(4, "n", IntT, required = false),
      NestedField(5, "dt", DateT, required = false),
      NestedField(6, "ts", TimestampT, required = false)))
    val spec2 = PartitionSpec(7, Seq(
      PartitionField(4, 1000, "n", Transforms.Identity),
      PartitionField(5, 1001, "dt", Transforms.Identity),
      PartitionField(6, 1002, "ts", Transforms.Identity),
      PartitionField(2, 1003, "s", Transforms.Identity),
      PartitionField(3, 1004, "dec", Transforms.Identity)))
    val specById: Int => Option[PartitionSpec] =
      id => if (id == 7) Some(spec2) else None
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val r = new Random(71717L)

    def tuple(): Seq[Any] = Seq(
      if (r.nextInt(5) == 0) null else Int.box(r.nextInt(100) - 50),
      if (r.nextInt(5) == 0) null else Int.box(r.nextInt(40000) - 20000),
      // micros straddling 1970 with sub-second parts — the ISO-8601 wire arm
      if (r.nextInt(5) == 0) null
      else Long.box(r.nextLong() % 4102444800000000L),
      if (r.nextInt(5) == 0) null else Seq("a", "b c", "é😀", "")(r.nextInt(4)),
      if (r.nextInt(5) == 0) null
      else new java.math.BigDecimal(
        java.math.BigInteger.valueOf(r.nextInt(100000) - 50000L), 2))

    def file(content: Int, tag: Int): DataFile = {
      val puffinDv = content == DataFileContent.PositionDeletes && r.nextBoolean()
      DataFile(content, s"/w/data/t$tag.parquet",
        if (puffinDv) "PUFFIN" else "PARQUET",
        partition = tuple(),
        recordCount = r.nextInt(100000).toLong, fileSize = 1L + r.nextInt(1 << 30),
        columnSizes = if (content == DataFileContent.Data) statMap(r, _.nextInt(1 << 20).toLong) else Map.empty,
        valueCounts = if (content == DataFileContent.Data) statMap(r, _.nextInt(100000).toLong) else Map.empty,
        nullCounts = if (content == DataFileContent.Data) statMap(r, _.nextInt(1000).toLong) else Map.empty,
        nanCounts = if (content == DataFileContent.Data && r.nextBoolean()) Map(3 -> 2L) else Map.empty,
        lowerBounds = if (content == DataFileContent.Data) statMap(r, bytes(_)) else Map.empty,
        upperBounds = if (content == DataFileContent.Data) statMap(r, bytes(_)) else Map.empty,
        splitOffsets = Seq.fill(r.nextInt(3))(r.nextInt(1 << 30).toLong).sorted,
        equalityIds = if (content == DataFileContent.EqualityDeletes) Seq(1, 4).take(1 + r.nextInt(2)) else Nil,
        sortOrderId = if (content == DataFileContent.Data && r.nextBoolean()) Some(r.nextInt(3)) else None,
        referencedDataFile = if (puffinDv) Some(s"/w/data/ref$tag.parquet") else None,
        contentOffset = if (puffinDv) Some(r.nextInt(10000).toLong) else None,
        contentSize = if (puffinDv) Some(1L + r.nextInt(10000)) else None,
        firstRowId = if (content == DataFileContent.Data && r.nextBoolean()) Some(r.nextInt(1 << 30).toLong) else None,
        keyMetadata = if (r.nextInt(4) == 0) Some(bytes(r)) else None,
        specId = Some(7))
    }

    def normDec(v: Any): Any = v match {
      case bd: java.math.BigDecimal => bd.stripTrailingZeros
      case other => other
    }
    def normP(f: DataFile): Any =
      (norm(f), f.partition.map(normDec), f.specId)

    (0 until 250).foreach { iter =>
      // shared delete pool: some deletes apply to several tasks (dedup arm)
      val pool = Seq.fill(r.nextInt(3))(
        file(if (r.nextBoolean()) DataFileContent.PositionDeletes
             else DataFileContent.EqualityDeletes, iter * 100 + 90 + r.nextInt(5)))
      val tasks = (0 until 1 + r.nextInt(4)).map { i =>
        val mine = pool.filter(_ => r.nextBoolean()) ++
          Seq.fill(r.nextInt(2))(file(
            if (r.nextBoolean()) DataFileContent.PositionDeletes
            else DataFileContent.EqualityDeletes, iter * 100 + 10 * i))
        val (eq, pos) = mine.partition(_.content == DataFileContent.EqualityDeletes)
        FileScanTask(file(DataFileContent.Data, iter * 100 + i),
          dataSequence = 0L, posDeletes = pos.distinct,
          eqDeletes = eq.distinct.map(f => (f, 1L)), specId = 7)
      }
      val env = mapper.createObjectNode()
      graft.rest.ScanTaskJson.writeTasks(mapper, env, tasks, specById,
        schema2, Expr.AlwaysTrue)
      val back = graft.rest.ScanTaskJson.readTasks(env, specById, schema2)
      assert(back.size === tasks.size, s"iter=$iter task count")
      tasks.zip(back).foreach { case (t, b) =>
        assert(normP(b.file) === normP(t.file), s"iter=$iter data file drifted")
        assert(b.specId === 7)
        assert(b.posDeletes.map(normP) === t.posDeletes.map(normP),
          s"iter=$iter pos deletes drifted")
        assert(b.eqDeletes.map(e => normP(e._1)) === t.eqDeletes.map(e => normP(e._1)),
          s"iter=$iter eq deletes drifted")
      }
    }
  }

  // ---- expression JSON: semantic round-trip

  private val typeOf: String => IcebergType =
    schema.fields.map(f => f.name -> f.fieldType).toMap

  private def lit(r: Random, field: String): Any = field match {
    case "id" => Long.box(r.nextInt(50).toLong)
    case "s" => Seq("a", "ab", "abc", "z", "", "é😀")(r.nextInt(6))
    case "d" => Double.box((r.nextInt(9) - 4) * 0.75)
    case "n" => Int.box(r.nextInt(21) - 10)
  }

  private def leaf(r: Random): Expr = {
    val f = Seq("id", "s", "d", "n")(r.nextInt(4))
    r.nextInt(12) match {
      case 0 => Predicate(Op.IsNull, f)
      case 1 => Predicate(Op.NotNull, f)
      case 2 => Predicate(Op.Lt, f, Seq(lit(r, f)))
      case 3 => Predicate(Op.LtEq, f, Seq(lit(r, f)))
      case 4 => Predicate(Op.Gt, f, Seq(lit(r, f)))
      case 5 => Predicate(Op.GtEq, f, Seq(lit(r, f)))
      case 6 => Predicate(Op.Eq, f, Seq(lit(r, f)))
      case 7 => Predicate(Op.NotEq, f, Seq(lit(r, f)))
      case 8 => Predicate(Op.In, f, Seq.fill(1 + r.nextInt(3))(lit(r, f)))
      case 9 => Predicate(Op.NotIn, f, Seq.fill(1 + r.nextInt(3))(lit(r, f)))
      case 10 if f == "d" => Predicate(
        if (r.nextBoolean()) Op.IsNan else Op.NotNan, f)
      case 11 if f == "s" => Predicate(
        if (r.nextBoolean()) Op.StartsWith else Op.NotStartsWith, f,
        Seq(Seq("a", "ab", "z")(r.nextInt(3))))
      case _ => Predicate(Op.Eq, f, Seq(lit(r, f)))
    }
  }

  private def genExpr(r: Random, depth: Int): Expr =
    if (depth == 0) leaf(r)
    else r.nextInt(6) match {
      case 0 => And(genExpr(r, depth - 1), genExpr(r, depth - 1))
      case 1 => Or(genExpr(r, depth - 1), genExpr(r, depth - 1))
      case 2 => Not(genExpr(r, depth - 1))
      case _ => leaf(r)
    }

  private def genRow(r: Random): Map[String, Any] = Map(
    "id" -> Long.box(r.nextInt(50).toLong),
    "s" -> (if (r.nextInt(4) == 0) null else Seq("a", "ab", "abc", "z", "é😀")(r.nextInt(5))),
    "d" -> (r.nextInt(6) match {
      case 0 => null
      case 1 => Double.box(Double.NaN)
      case k => Double.box((k - 3) * 0.75)
    }),
    "n" -> (if (r.nextInt(4) == 0) null else Int.box(r.nextInt(21) - 10)))

  test("transform and bbox predicates round-trip the expression JSON structurally") {
    // TransformPredicate/BBoxPredicate evaluate inclusively in evalRow, so
    // semantic comparison is vacuous for them — pin the STRUCTURE instead
    // (the schema resolves the transform's Spark source type on decode)
    val r = new Random(92929L)
    val sparkT = org.apache.spark.sql.types.LongType
    (0 until 500).foreach { iter =>
      val tr = r.nextInt(5) match {
        case 0 => Transforms.Bucket(1 + r.nextInt(64))
        case 1 => Transforms.Truncate(1 + r.nextInt(16))
        case 2 => Transforms.Years
        case 3 => Transforms.Months
        case 4 => Transforms.Days
      }
      val op = Seq(Op.Eq, Op.NotEq, Op.Lt, Op.LtEq, Op.Gt, Op.GtEq,
        Op.In, Op.IsNull)(r.nextInt(8))
      val lits: Seq[Any] = op match {
        case Op.IsNull => Nil
        case Op.In => Seq.fill(1 + r.nextInt(3))(Int.box(r.nextInt(100)))
        case _ => Seq(Int.box(r.nextInt(100)))
      }
      val e = Expr.TransformPredicate(op, tr, "id", sparkT, lits)
      val back = ExprJson.fromJson(ExprJson.toJson(e), Some(schema))
      assert(back === e, s"iter=$iter transform predicate drifted: $back vs $e")

      val bb = Expr.BBoxPredicate(r.nextBoolean(), "s",
        r.nextDouble() * -10, r.nextDouble() * -10,
        r.nextDouble() * 10, r.nextDouble() * 10)
      val bbBack = ExprJson.fromJson(ExprJson.toJson(bb), Some(schema))
      assert(bbBack === bb, s"iter=$iter bbox drifted: $bbBack vs $bb")
    }
  }

  test("expression JSON round-trips semantically over random rows") {
    val r = new Random(61616L)
    (0 until 3000).foreach { iter =>
      val e = genExpr(r, 2)
      val back = ExprJson.fromJson(ExprJson.toJson(e), Some(schema))
      val eRw = Expr.rewriteNot(e)
      val bRw = Expr.rewriteNot(back)
      (0 until 8).foreach { _ =>
        val row = genRow(r)
        val a = Expr.evalRow(eRw, typeOf, row(_))
        val b = Expr.evalRow(bRw, typeOf, row(_))
        assert(a === b,
          s"iter=$iter wire changed semantics\nexpr=$e\nback=$back\nrow=$row")
      }
    }
  }
}
