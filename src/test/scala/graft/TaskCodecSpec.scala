package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.TaskCodec
import graft.core._
import graft.core.IcebergTypes._
import graft.format.{DataFile, DataFileContent, PartitionField, PartitionSpec}
import graft.table.FileScanTask

/** FileScanTask transport codec (reference `codec/file_scan_task.go`):
  * round-trip fidelity, triple (spec, schema, version) verification, and the
  * reference's validation matrix (scan range vs manifest size, spec-id
  * mismatch, version bounds).
  */
class TaskCodecSpec extends AnyFunSuite {

  private val schema = IcebergSchema(Seq(
    NestedField(1, "id", LongT, required = true),
    NestedField(2, "cat", StringT, required = false),
    NestedField(3, "ts", TimestampT, required = false)))

  private val spec = PartitionSpec(2, Seq(
    PartitionField(1, 1000, "id", Transforms.Identity),
    PartitionField(3, 1001, "ts_month", Transforms.Months)))

  private def dataFile(path: String = "/wh/data/f1.parquet") = DataFile(
    content = DataFileContent.Data,
    path = path,
    format = "PARQUET",
    partition = Seq(42L, 673),
    recordCount = 100L,
    fileSize = 4096L,
    columnSizes = Map(1 -> 800L, 2 -> 1200L),
    valueCounts = Map(1 -> 100L, 2 -> 100L),
    nullCounts = Map(2 -> 3L),
    nanCounts = Map.empty,
    lowerBounds = Map(1 -> Literals.encode(LongT, 1L), 2 -> Literals.encode(StringT, "aa")),
    upperBounds = Map(1 -> Literals.encode(LongT, 99L), 2 -> Literals.encode(StringT, "zz")),
    splitOffsets = Seq(4L, 2048L),
    sortOrderId = Some(1),
    firstRowId = Some(500L))

  private val dv = DataFile(DataFileContent.PositionDeletes, "/wh/data/dv.puffin",
    "PUFFIN", Seq(42L, 673), 7L, 333L,
    referencedDataFile = Some("/wh/data/f1.parquet"),
    contentOffset = Some(4L), contentSize = Some(57L))

  private val posDel = DataFile(DataFileContent.PositionDeletes, "/wh/data/pd.parquet",
    "PARQUET", Seq(42L, 673), 5L, 900L)

  private val eqDel = DataFile(DataFileContent.EqualityDeletes, "/wh/data/eq.parquet",
    "PARQUET", Seq(42L, 673), 2L, 700L, equalityIds = Seq(2))

  private val task = FileScanTask(dataFile(), dataSequence = 7L,
    posDeletes = Seq(posDel, dv), eqDeletes = Seq((eqDel, 9L)), specId = 2)

  test("round trip preserves the task, byte-for-byte re-encode") {
    val residual = Expr.and(Expr.gt("id", 10L), Expr.eq("cat", "news"))
    val bytes = TaskCodec.encode(task, spec, schema, version = 3, residual)
    val (back, resBack, (start, len)) = TaskCodec.decode(bytes, spec, schema, version = 3)

    assert(back.file.path === task.file.path)
    assert(back.file.partition === Seq(42L, 673))
    assert(back.file.firstRowId === Some(500L))
    assert(back.file.splitOffsets === Seq(4L, 2048L))
    assert(back.dataSequence === 7L)
    assert(back.specId === 2)
    assert(back.posDeletes.map(_.path).toSet === Set(posDel.path, dv.path))
    assert(back.posDeletes.find(_.format == "PUFFIN").get.contentOffset === Some(4L))
    assert(back.eqDeletes.map { case (f, s) => (f.path, s, f.equalityIds) } ===
      Seq(("/wh/data/eq.parquet", 9L, Seq(2))))
    assert((start, len) === (0L, 4096L))
    // bounds maps hold Array[Byte]; equality via a second encode pass
    assert(TaskCodec.encode(back, spec, schema, 3, resBack)
      .sameElements(bytes))
  }

  test("residual is optional and defaults to AlwaysTrue") {
    val bytes = TaskCodec.encode(task, spec, schema, version = 2)
    val (_, res, _) = TaskCodec.decode(bytes, spec, schema, version = 2)
    assert(res === Expr.AlwaysTrue)
    assert(!new String(bytes, "UTF-8").contains("residual"))
  }

  test("version bounds and triple mismatch are rejected") {
    intercept[IllegalArgumentException](TaskCodec.encode(task, spec, schema, 0))
    intercept[IllegalArgumentException](TaskCodec.encode(task, spec, schema, 4))
    val bytes = TaskCodec.encode(task, spec, schema, 3)
    intercept[IllegalArgumentException](TaskCodec.decode(bytes, spec, schema, 2))
    intercept[IllegalArgumentException](
      TaskCodec.decode(bytes, spec.copy(specId = 0), schema, 3))
  }

  test("task spec id must match codec spec (per-spec grouping contract)") {
    intercept[IllegalArgumentException](
      TaskCodec.encode(task.copy(specId = 0), spec, schema, 3))
    // same arity check applies to carried delete files
    val badEq = eqDel.copy(partition = Seq(1L))
    intercept[IllegalArgumentException](
      TaskCodec.encode(task.copy(eqDeletes = Seq((badEq, 9L))), spec, schema, 3))
    // a carried file TAGGED with a different spec id is rejected even when
    // the partition arity happens to match (reference per-file SpecID check,
    // file_scan_task.go:274-287) — its literals would decode under the
    // wrong transforms silently
    val wrongSpec = eqDel.copy(specId = Some(7))
    intercept[IllegalArgumentException](
      TaskCodec.encode(task.copy(eqDeletes = Seq((wrongSpec, 9L))), spec, schema, 3))
    // an unpartitioned global delete from another spec has no literals to
    // mis-decode and must pass
    val globalFromOtherSpec = eqDel.copy(partition = Nil, specId = Some(0))
    TaskCodec.encode(task.copy(eqDeletes = Seq((globalFromOtherSpec, 9L))), spec, schema, 3)
  }

  test("scan range validated against manifest-recorded file size on encode") {
    intercept[IllegalArgumentException](
      TaskCodec.encode(task, spec, schema, 3, start = 5000L))
    intercept[IllegalArgumentException](
      TaskCodec.encode(task, spec, schema, 3, start = 4000L, lengthOpt = Some(200L)))
    intercept[IllegalArgumentException](
      TaskCodec.encode(task, spec, schema, 3, start = -1L))
    // a valid sub-range travels
    val bytes = TaskCodec.encode(task, spec, schema, 3, start = 1024L, lengthOpt = Some(512L))
    val (_, _, range) = TaskCodec.decode(bytes, spec, schema, 3)
    assert(range === (1024L, 512L))
  }

  test("null partition values and global (unpartitioned) deletes round-trip") {
    val f = dataFile().copy(partition = Seq(null, 673))
    val globalEq = eqDel.copy(partition = Nil)
    val t = task.copy(file = f, eqDeletes = Seq((globalEq, 11L)))
    val bytes = TaskCodec.encode(t, spec, schema, 3)
    val (back, _, _) = TaskCodec.decode(bytes, spec, schema, 3)
    assert(back.file.partition === Seq(null, 673))
    assert(back.eqDeletes.head._1.partition === Nil)
  }
}
