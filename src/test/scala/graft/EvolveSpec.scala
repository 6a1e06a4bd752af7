package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core._
import graft.core.IcebergTypes._
import graft.format.{PartitionSpec, SortField}
import graft.table.{ColumnPosition, Evolve, SparkRead, Writer}

/** Schema/spec/sort-order evolution beyond the round-1 basics: move,
  * union-by-name, identifier fields, spec field removal, sort orders.
  */
class EvolveSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val catalog = new HadoopCatalog(Files.createTempDirectory("graft-ev").toString)

  override def afterAll(): Unit = spark.stop()

  private def freshNation(name: String) = {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    Writer.append(spark, catalog.createTable(name, schema, PartitionSpec.Unpartitioned), nation)
  }

  test("move column reorders without changing ids; reads still resolve") {
    val t1 = freshNation("ev_move")
    val t2 = Evolve.moveColumn(t1, "n_regionkey", ColumnPosition.First)
    assert(t2.schema.fields.head.name === "n_regionkey")
    val t3 = Evolve.moveColumn(t2, "n_regionkey", ColumnPosition.After("n_nationkey"))
    assert(t3.schema.fields.map(_.name).take(2) === Seq("n_nationkey", "n_regionkey"))
    // ids unchanged -> old files read fine in the new column order
    val back = SparkRead.read(spark, t3.newScan)
    assert(back.columns.take(2).toSeq === Seq("n_nationkey", "n_regionkey"))
    assert(back.count() === 25)
  }

  test("union by name adds new columns and promotes compatible ones") {
    val t1 = freshNation("ev_union")
    val incoming = IcebergSchema(Seq(
      NestedField(1, "n_nationkey", LongT, required = false), // int -> long promote
      NestedField(2, "n_comment", StringT, required = false))) // new column
    val t2 = Evolve.unionByName(t1, incoming)
    assert(t2.schema.findField("n_comment").isDefined)
    assert(t2.schema.findField("n_nationkey").get.fieldType === LongT)
    // nothing dropped
    assert(t2.schema.findField("n_name").isDefined)
    intercept[IllegalArgumentException] {
      Evolve.unionByName(t2, IcebergSchema(Seq(
        NestedField(1, "n_name", LongT, required = false)))) // string -/-> long
    }
  }

  // the reference's UnionByName matrix (`table/update_schema_test.go`
  // TestUnionByName*): recursive merge with nested adds, element/value
  // promotion, narrowing ignored, docs updated-never-cleared, no-op
  // identity, map-key guard — all in ONE schema version
  test("union by name: recursive merge semantics") {
    val nested = IcebergSchema(Seq(
      NestedField(1, "id", IntT, required = true),
      NestedField(2, "info", StructT(Seq(
        NestedField(3, "a", IntT, required = true,
          doc = Some("original doc")))), required = false),
      NestedField(4, "tags", ListT(5, FloatT, elementRequired = false),
        required = false),
      NestedField(6, "attrs", MapT(7, StringT, 8, IntT, valueRequired = false),
        required = false)))
    val t0 = catalog.createTable("ev_union_rec", nested, PartitionSpec.Unpartitioned)
    val lastId0 = t0.metadata.lastColumnId

    // identical schema: NO-OP, no new schema version
    val noop = Evolve.unionByName(t0, nested)
    assert(noop.metadata.schemas.size === t0.metadata.schemas.size)

    val incoming = IcebergSchema(Seq(
      NestedField(1, "id", LongT, required = false), // promote + relax
      NestedField(2, "info", StructT(Seq(
        NestedField(3, "a", IntT, required = true, doc = Some("new doc")),
        NestedField(9, "b", StringT, required = true))), // nested ADD
        required = false),
      NestedField(4, "tags", ListT(5, DoubleT, elementRequired = false),
        required = false), // element promote
      NestedField(6, "attrs", MapT(7, StringT, 8, LongT, valueRequired = false),
        required = false), // value promote
      NestedField(10, "extra", StructT(Seq(
        NestedField(11, "x", IntT, required = true))), required = true)))
    val t1 = Evolve.unionByName(t0, incoming)
    val s = t1.schema
    // one new schema version carries everything
    assert(t1.metadata.schemas.size === t0.metadata.schemas.size + 1)
    assert(s.findField("id").get.fieldType === LongT)
    assert(!s.findField("id").get.required, "optional incoming relaxes required")
    val info = s.findField("info").get.fieldType.asInstanceOf[StructT]
    assert(info.fields.map(_.name) === Seq("a", "b"), "nested field added")
    assert(info.fields.head.doc === Some("new doc"), "doc updated")
    assert(info.fields(1).id > lastId0, "nested add gets a fresh field id")
    assert(s.findField("tags").get.fieldType.asInstanceOf[ListT].element === DoubleT)
    assert(s.findField("attrs").get.fieldType.asInstanceOf[MapT].value === LongT)
    val extra = s.findField("extra").get
    assert(!extra.required, "top-level adds are always optional")
    assert(extra.fieldType.asInstanceOf[StructT].fields.head.id > lastId0)

    // narrowing incoming types are IGNORED, not errors; absent docs don't
    // clear; a required incoming field never tightens an optional one
    val narrower = IcebergSchema(Seq(
      NestedField(1, "id", IntT, required = true),
      NestedField(4, "tags", ListT(5, FloatT, elementRequired = false),
        required = false)))
    val t2 = Evolve.unionByName(t1, narrower)
    assert(t2.schema.findField("id").get.fieldType === LongT)
    assert(!t2.schema.findField("id").get.required)
    assert(t2.schema.findField("tags").get.fieldType
      .asInstanceOf[ListT].element === DoubleT)
    assert(t2.schema.findField("info").get.fieldType.asInstanceOf[StructT]
      .fields.head.doc === Some("new doc"))

    // map KEY widening rejects; a narrowing key is ignored
    intercept[IllegalArgumentException](Evolve.unionByName(t2, IcebergSchema(Seq(
      NestedField(6, "attrs", MapT(7, IntT, 8, LongT, valueRequired = false),
        required = false)))))
    // cross-kind change rejects
    intercept[IllegalArgumentException](Evolve.unionByName(t2, IcebergSchema(Seq(
      NestedField(2, "info", StringT, required = false)))))
  }

  // reference TestTimeTravelUnknownSnapshotSchemaIDErrors: a snapshot whose
  // recorded schema-id resolves to nothing is corrupt metadata — planning
  // with the current schema instead would decode bounds wrong and mis-prune
  test("scan fails closed on a snapshot with an unknown schema-id") {
    val t1 = freshNation("ev_badschema")
    val snapId = t1.metadata.currentSnapshotId.get
    val doctored = t1.metadata.copy(snapshots = t1.metadata.snapshots.map(s =>
      if (s.snapshotId == snapId) s.copy(schemaId = Some(999)) else s))
    val bad = new graft.table.Table("ev_badschema", doctored, t1.metadataPath, catalog)
    val e = intercept[IllegalArgumentException](bad.newScan.planFiles())
    assert(e.getMessage.contains("unknown schema-id"))
  }

  test("identifier fields set and persist through metadata round-trip") {
    val t1 = freshNation("ev_ident")
    val t2 = Evolve.setIdentifierFields(t1, Seq("n_nationkey"))
    val reloaded = catalog.loadTable("ev_ident")
    assert(reloaded.schema.identifierFieldIds ===
      Seq(t2.schema.findField("n_nationkey").get.id))
  }

  test("remove partition spec field produces a new default spec; old files scan") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val spec = PartitionSpec.builder(schema).add("n_regionkey", Transforms.Identity).build()
    val t1 = Writer.append(spark, catalog.createTable("ev_spec", schema, spec), nation)
    val t2 = Evolve.removeSpecFields(t1, Seq(t1.spec.fields.head.name))
    assert(t2.spec.isUnpartitioned)
    // unpartitioned append lands in the new spec; both specs scan together
    val t3 = Writer.append(spark, t2,
      nation.withColumn("n_nationkey", col("n_nationkey") + lit(100)))
    assert(SparkRead.read(spark, t3.newScan).count() === 50)
  }

  test("delete after spec evolution keeps old-spec partition tuples intact") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val spec = PartitionSpec.builder(schema).add("n_regionkey", Transforms.Identity).build()
    val t1 = Writer.append(spark, catalog.createTable("ev_cf", schema, spec), nation)
    val t2 = Evolve.removeSpecFields(t1, Seq(t1.spec.fields.head.name))
    val t3 = Writer.append(spark, t2,
      nation.withColumn("n_nationkey", col("n_nationkey") + lit(100)))
    // partial CoW delete removes rows from OLD-spec files -> carry-forward
    // rewrite of the old manifest must keep its spec id + partition values
    val t4 = Writer.deleteWhere(spark, t3, Expr.in("n_nationkey", Seq(1, 101)))
    assert(SparkRead.read(spark, t4.newScan).count() === 48)
    val tasks = t4.newScan.planFiles()
    val oldSpecTasks = tasks.filter(_.specId == t1.spec.specId)
    assert(oldSpecTasks.nonEmpty)
    assert(oldSpecTasks.forall(_.file.partition.size === 1)) // tuple intact
    // partition pruning on the old spec still works after the rewrite
    val pruned = t4.newScan.withFilter(Expr.eq("n_regionkey", 0)).planFiles()
    assert(pruned.size < tasks.size)
  }

  test("replace sort order becomes the write-side clustering") {
    val t1 = freshNation("ev_sort")
    val keyId = t1.schema.findField("n_name").get.id
    val t2 = Evolve.replaceSortOrder(t1,
      Seq(SortField(keyId, Transforms.Identity, ascending = true, nullsFirst = true)))
    assert(t2.metadata.defaultSortOrderId === t2.metadata.sortOrders.last.orderId)
    // subsequent writes succeed with the order in place
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val t3 = Writer.append(spark, t2, nation.limit(5))
    assert(SparkRead.read(spark, t3.newScan).count() === 30)
  }

  test("rollbackTo moves main to an ancestor and retains rolled-past snapshots") {
    val t1 = freshNation("ev_rollback")
    val snapA = t1.metadata.currentSnapshotId.get
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val t2 = Writer.append(spark, t1, nation.limit(5))
    val snapB = t2.metadata.currentSnapshotId.get

    // non-ancestor target rejected (reference transaction.go:343-346)
    val err = intercept[IllegalArgumentException](Evolve.rollbackTo(t2, snapB + 1))
    assert(err.getMessage.contains("not an ancestor"))

    val t3 = Evolve.rollbackTo(t2, snapA)
    assert(t3.metadata.currentSnapshotId === Some(snapA))
    assert(t3.metadata.refs("main").snapshotId === snapA)
    assert(SparkRead.read(spark, t3.newScan).count() === 25)
    // snapB stays addressable by id until expired
    assert(t3.metadata.snapshotById(snapB).isDefined)
    assert(SparkRead.read(spark, t3.newScan.useSnapshot(snapB)).count() === 30)
    // rollback appends to the snapshot log rather than rewriting history
    assert(t3.metadata.snapshotLog.last.snapshotId === snapA)
    // same-target rollback is a no-op (no new metadata version)
    val v = t3.currentVersion
    assert(Evolve.rollbackTo(t3, snapA).currentVersion === v)
  }

  test("upgradeFormatVersion bumps 2->3, rejects downgrade and >max") {
    val t1 = freshNation("ev_upgrade")
    assert(t1.metadata.formatVersion === 2)
    val t2 = Evolve.upgradeFormatVersion(t1, 3)
    assert(t2.metadata.formatVersion === 3)
    // no-op on same version: metadata version unchanged
    assert(Evolve.upgradeFormatVersion(t2, 3).currentVersion === t2.currentVersion)
    assert(intercept[IllegalArgumentException](
      Evolve.upgradeFormatVersion(t2, 2)).getMessage.contains("downgrading"))
    assert(intercept[IllegalArgumentException](
      Evolve.upgradeFormatVersion(t2, 4)).getMessage.contains("unsupported"))
    // the upgraded table still reads and accepts writes
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val t3 = Writer.append(spark, t2, nation.limit(3))
    assert(SparkRead.read(spark, t3.newScan).count() === 28)
  }

  test("removeUnusedSpecs drops never-written specs, keeps referenced + default") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val schema = SchemaBridge.fromSpark(nation.schema)
    val t0 = catalog.createTable("ev_specrm", schema, PartitionSpec.Unpartitioned)
    // evolve BEFORE any write: spec 0 is never referenced by a manifest
    val t1 = Evolve.updateSpec(t0, _.add("n_regionkey", Transforms.Identity))
    val t2 = Writer.append(spark, t1, nation)
    assert(t2.metadata.partitionSpecs.map(_.specId).sorted === Seq(0, 1))
    val t3 = Evolve.removeUnusedSpecs(t2)
    assert(t3.metadata.partitionSpecs.map(_.specId) === Seq(1))
    assert(SparkRead.read(spark, t3.newScan).count() === 25)
    // all remaining specs in use -> no-op, no new metadata version
    assert(Evolve.removeUnusedSpecs(t3).currentVersion === t3.currentVersion)
  }

  test("removeUnusedSchemas keeps snapshot write schemas and current") {
    val t1 = freshNation("ev_schrm") // snapshot written under schema 0
    val t2 = Evolve.addColumn(t1, "note", IcebergTypes.StringT)
    assert(t2.metadata.schemas.map(_.schemaId).sorted === Seq(0, 1))
    // schema 0 is still the first snapshot's write schema -> kept
    assert(Evolve.removeUnusedSchemas(t2).metadata.schemas.size === 2)
    // append under schema 1, then expire nothing: snapshot 1 still pins 0
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val t3 = Writer.append(spark, t2, nation.limit(2).withColumn("note", lit("x")))
    assert(Evolve.removeUnusedSchemas(t3).metadata.schemas.size === 2)
  }

  test("encryption keys: v3 only, add/replace/remove, json round-trip") {
    import graft.format.EncryptionKey
    val t1 = freshNation("ev_enckey")
    assert(intercept[IllegalArgumentException](
      Evolve.addEncryptionKey(t1, EncryptionKey("k1", "bWV0YQ==")))
      .getMessage.contains("v3"))
    val t2 = Evolve.upgradeFormatVersion(t1, 3)
    val t3 = Evolve.addEncryptionKey(t2,
      EncryptionKey("k1", "bWV0YQ==", Some("kms-master"), Map("alg" -> "AES_GCM")))
    // refresh re-parses metadata.json from disk: the round-trip is real
    assert(t3.metadata.encryptionKeys ===
      Seq(EncryptionKey("k1", "bWV0YQ==", Some("kms-master"), Map("alg" -> "AES_GCM"))))
    val t4 = Evolve.addEncryptionKey(t3, EncryptionKey("k1", "bmV3"))
    assert(t4.metadata.encryptionKeys === Seq(EncryptionKey("k1", "bmV3")))
    val t5 = Evolve.removeEncryptionKey(t4, "k1")
    assert(t5.metadata.encryptionKeys.isEmpty)
  }

  test("remove-spec/schema/encryption-key updates ride the wire and apply") {
    import graft.rest.{MetadataUpdate, UpdateJson}
    import graft.format.EncryptionKey
    import MetadataUpdate._
    val ups: Seq[MetadataUpdate] = Seq(
      RemovePartitionSpecs(Seq(0, 2)), RemoveSchemas(Seq(1)),
      AddEncryptionKey(EncryptionKey("k9", "Zm9v", None, Map("a" -> "b"))),
      RemoveEncryptionKey("k9"))
    ups.foreach { u =>
      assert(UpdateJson.updateFromNode(UpdateJson.updateToNode(u)) === u)
    }
    // apply guards: default spec / current schema are irremovable
    val t = freshNation("ev_wire").metadata
    assert(intercept[IllegalArgumentException](
      MetadataUpdate.apply(t, RemovePartitionSpecs(Seq(t.defaultSpecId))))
      .getMessage.contains("default"))
    assert(intercept[IllegalArgumentException](
      MetadataUpdate.apply(t, RemoveSchemas(Seq(t.currentSchemaId))))
      .getMessage.contains("current"))
  }

  test("REST upgrade-format-version backfills table-uuid for legacy v1 metadata") {
    import graft.rest.MetadataUpdate
    val base = freshNation("ev_uuid").metadata.copy(tableUuid = "", formatVersion = 1)
    // the v2+ write guard fails loudly on a missing uuid...
    assert(intercept[IllegalArgumentException](
      graft.format.TableMetadata.toJson(base.copy(formatVersion = 2)))
      .getMessage.contains("table-uuid"))
    // ...so the REST upgrade action must assign one (parity with
    // Evolve.upgradeFormatVersion) or a legacy uuid-less table could
    // never be upgraded over the wire — every commit retry would crash
    // at serialization
    val up = MetadataUpdate.apply(base, MetadataUpdate.UpgradeFormatVersion(2))
    assert(up.tableUuid.nonEmpty, "upgrade must backfill the uuid")
    graft.format.TableMetadata.toJson(up) // must serialize
    // an explicit uuid is never clobbered
    val kept = MetadataUpdate.apply(base.copy(tableUuid = "u-1"),
      MetadataUpdate.UpgradeFormatVersion(2))
    assert(kept.tableUuid === "u-1")
  }
}
