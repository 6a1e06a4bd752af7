package graft.table

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

import graft.core._
import graft.format.DataFileContent

/** Executes a planned scan as a Spark DataFrame (reference read dataflow
  * `table/arrow_scanner.go` §2.3, re-expressed declaratively):
  *
  *  - files are read with the table read-schema carrying `parquet.field.id`
  *    metadata and `spark.sql.parquet.fieldId.read.enabled`, so per-file
  *    ID-based column resolution (rename/add/drop between file and table
  *    schema) happens inside Spark's vectorized reader;
  *  - positional deletes / DVs become a broadcast left-anti join on
  *    (file, _metadata.row_index);
  *  - equality deletes become left-anti joins on the equality-id columns,
  *    scoped by sequence number (strictly greater) — real shuffling joins,
  *    never in-memory hash sets, per the 100 TB contract;
  *  - the residual filter lowers to a Catalyst Column and is pushed into the
  *    parquet scan (row-group stats + bloom + dictionary pruning for free).
  */
object SparkRead {

  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    // a requested field id absent from a file reads NULL — the Iceberg
    // absent-column semantic (defaults fill afterwards). Also what lets the
    // lineage read request the reserved _row_id id against files that never
    // materialized it.
    spark.conf.set("spark.sql.parquet.fieldId.read.ignoreMissing", "true")
    // shredded-layout variant interop: files written with the spec's
    // typed_value shredding (by us or another engine) must reconstruct into
    // VariantType transparently (default true; pinned for robustness)
    spark.conf.set("spark.sql.variant.allowReadingShredded", "true")
    // KMS reachability for encrypted tables (no-op when none configured)
    graft.encryption.ParquetEncryption.configureSession(spark)
  }

  def read(spark: SparkSession, scan: Scan): DataFrame = {
    configure(spark)
    // vended table credentials (REST catalogs): resolved fresh here, then
    // threaded to every distributed read as per-scan options
    val ioOptions = scan.table.refreshIoCredentials()
    val tasks = scan.planFiles()
    val meta = scan.table.metadata
    // current-snapshot scans use the CURRENT table schema (metadata-only
    // evolution has no snapshot to re-pin it); only explicit time travel
    // (snapshot id / as-of / ref) pins the snapshot's schema
    val timeTravel =
      scan.snapshotId.isDefined || scan.asOfTimestampMs.isDefined || scan.ref.isDefined
    val snapSchemaId =
      if (timeTravel) scan.snapshot.flatMap(_.schemaId).getOrElse(meta.currentSchemaId)
      else meta.currentSchemaId
    val schema = meta.schemaById(snapSchemaId).getOrElse(meta.schema)
    val readSchema: StructType = SchemaBridge.toSpark(schema)

    if (tasks.isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], readSchema)
      return project(applyResidual(empty, scan), scan, schema)
    }

    project(applyResidual(
      readTasks(spark, tasks, schema, scan.table.nameMapping, scan.rowLineage,
        scan.table.metadata.specById, ioOptions),
      scan), scan, schema)
  }

  /** Read a specific set of scan tasks with their MoR deletes applied — the
    * shared dataflow behind full scans, CoW rewrites, and compaction (which
    * must never read raw parquet directly, or already-deleted rows would
    * resurrect in the rewritten files).
    *
    * When the table carries a name mapping (add_files import), each group is
    * split into ID-resolved and name-mapped subgroups: Spark's fieldId
    * reader hard-fails on ID-less files, so those are read with an
    * ID-metadata-free schema using the mapping's names, then renamed to the
    * canonical schema. Tables never imported skip the footer probe entirely.
    */
  /** `ioOptions` are per-scan storage options (typically REST-vended plan
    * credentials resolved through [[graft.io.PlanScopedCredentials]]): they
    * ride as Spark read options, which file sources fold into the scan's
    * Hadoop configuration, so credentials reach the executor-side readers
    * without mutating session state — two concurrent scans with different
    * vended credentials never collide. Puffin DV blobs are opened through
    * [[graft.io.FileIO]], which applies the same credentials via its
    * prefix-scoped overlay registry.
    */
  def readTasks(spark: SparkSession, tasks: Seq[FileScanTask],
      schema: IcebergSchema,
      nameMapping: Option[graft.format.NameMapping] = None,
      rowLineage: Boolean = false,
      specById: Int => Option[graft.format.PartitionSpec] = _ => None,
      ioOptions: Map[String, String] = Map.empty,
      residual: graft.core.Expr = graft.core.Expr.AlwaysTrue,
      // keep the internal __file/__pos columns in the output (callers
      // serving `_file`/`_pos` metadata columns through this V1 pipeline —
      // e.g. name-mapped imported tables, whose renamed columns the stock
      // DSv2 reader cannot resolve)
      keepFilePos: Boolean = false): DataFrame = {
    configure(spark)
    // v3 `unknown`-typed columns are never stored in data files (spec:
    // always-null forward-compat placeholder, reference types.go:903) —
    // strip them from the physical read schema and synthesize null columns
    // after the union
    val unknownFields = schema.fields.filter(_.fieldType == graft.core.IcebergTypes.UnknownT)
    val storedSchema =
      if (unknownFields.isEmpty) schema
      else schema.copy(fields =
        schema.fields.filterNot(_.fieldType == graft.core.IcebergTypes.UnknownT))
    val readSchema: StructType = SchemaBridge.toSpark(storedSchema)

    // group tasks by identical (parquet pos-delete set, eq-delete set). DVs
    // are deliberately NOT part of the key: v3 gives each data file its own
    // DV blob, so keying on DV identity would degenerate to one scan per
    // data file (plan size O(files)). Instead DVs apply inside the group via
    // a broadcast per-file metadata map (reference arrow_scanner.go:533-618
    // applies DVs per-file inside one pipeline, never per-plan).
    // ... plus file FORMAT: ORC and parquet files can't share one scan node
    val groups: Seq[Seq[FileScanTask]] =
      tasks.groupBy(t => (
        t.posDeletes.filter(_.format != "PUFFIN").map(d => (d.path, d.contentOffset)).toSet,
        t.eqDeletes.map(_._1.path).toSet,
        t.file.format.toUpperCase)).values.toSeq

    // ID-presence for name-mapped tables resolves ONCE for the whole task
    // set (cache hits + one distributed probe job for misses) — never a
    // serial per-file footer read on the driver (parquet only; ORC files
    // read by name against the table schema)
    val parquetPaths = tasks
      .filter(_.file.format.equalsIgnoreCase("PARQUET")).map(_.file.path).distinct
    val presence: Map[String, Boolean] = nameMapping match {
      case None => Map.empty
      case Some(_) if parquetPaths.isEmpty => Map.empty
      case Some(_) => fieldIdPresence(spark, parquetPaths)
    }

    val parts = groups.flatMap { groupTasks =>
      val subGroups: Seq[(Seq[FileScanTask], Boolean)] = nameMapping match {
        case None => Seq((groupTasks, true))
        case Some(_) if !groupTasks.head.file.format.equalsIgnoreCase("PARQUET") =>
          Seq((groupTasks, true)) // ORC resolves by name below either way
        case Some(_) =>
          val (withIds, without) = groupTasks.partition(t => presence(t.file.path))
          Seq((withIds, true), (without, false)).filter(_._1.nonEmpty)
      }
      subGroups.map { case (sub, idsPresent) => readSubGroup(spark, sub, idsPresent,
        storedSchema, readSchema, nameMapping, rowLineage, specById, ioOptions,
        keepFilePos) }
    }

    val stored = parts.reduce(_ unionByName _)
    val full = unknownFields.foldLeft(stored)((d, f) => d.withColumn(f.name, lit(null)))
    // residual ROW filter (spec fileScanTask residual-filter semantics):
    // planning pruned FILES; matching files still carry non-matching rows.
    // Lowered to a Catalyst Column so it pushes into the parquet scan.
    if (residual == graft.core.Expr.AlwaysTrue) full
    else full.filter(graft.core.Expr.toColumn(residual))
  }

  private def readSubGroup(spark: SparkSession, groupTasks: Seq[FileScanTask],
      idsPresent: Boolean, schema: IcebergSchema, readSchema: StructType,
      nameMapping: Option[graft.format.NameMapping],
      rowLineage: Boolean = false,
      specById: Int => Option[graft.format.PartitionSpec] = _ => None,
      ioOptions: Map[String, String] = Map.empty,
      keepFilePos: Boolean = false): DataFrame = {
    {
      // lineage-preserving rewrites materialize _row_id /
      // _last_updated_sequence_number as REAL parquet columns under the
      // reserved field ids; request them so explicit values win over
      // synthesis (files without the columns read null — the synth path)
      val lineageScanSchema =
        if (!rowLineage) readSchema
        else StructType(readSchema.fields ++ SchemaBridge.LineageCols.map {
          case (n, id) => StructField(n, org.apache.spark.sql.types.LongType,
            nullable = true, new org.apache.spark.sql.types.MetadataBuilder()
              .putLong(SchemaBridge.FieldIdKey, id.toLong).build())
        })
      // ORC data files (written by engines whose ORC path we interop with;
      // the reference's own scanner is parquet-only — `arrow_scanner.go:1008`
      // dispatches no other format): read by NAME against the table schema.
      // Value-based features work unchanged (residuals, eq-delete
      // anti-joins); POSITION-based features need Spark's `_metadata
      // .row_index`, which the ORC source does not provide — reject loudly
      // rather than fabricate positions.
      val isOrc = groupTasks.head.file.format.equalsIgnoreCase("ORC")
      if (isOrc) {
        val posish = groupTasks.exists(_.posDeletes.nonEmpty)
        require(!posish && !rowLineage && !keepFilePos,
          "position-based features (positional deletes, deletion vectors, " +
            "row lineage, _file/_pos metadata columns) are not supported " +
            "over ORC data files")
      }
      // parquet reads go through MetadataRead: file statuses come from the
      // manifests' (path, file_size_in_bytes), so no per-scan listing job
      // re-stats the planned files (an O(files) pass per query otherwise)
      val groupFiles = groupTasks.map(t => (t.file.path, t.file.fileSize))
      var df =
        if (isOrc) spark.read.options(ioOptions).schema(readSchema)
          .orc(groupTasks.map(_.file.path): _*)
        else if (idsPresent)
          MetadataRead.parquet(spark, groupFiles, lineageScanSchema, ioOptions)
        else {
          val nm = nameMapping.get
          val mappedSchema = StructType(schema.fields.map(f =>
            StructField(nm.idToName.getOrElse(f.id, f.name),
              SchemaBridge.toSparkType(f.fieldType), nullable = true)))
          var raw = MetadataRead.parquet(spark, groupFiles, mappedSchema, ioOptions)
          // hive-imported files omit identity partition source columns (the
          // value lives in the directory name): fill from the path segment,
          // distributed, O(1) plan size (iceberg constants-map semantics;
          // reference arrow scanner injects partition constants per file).
          // nullif guards the hive null sentinel; coalesce keeps real values
          // for files that do carry the column.
          val identSources: Seq[(String, org.apache.spark.sql.types.DataType)] =
            groupTasks.map(_.specId).distinct.flatMap(specById(_).toSeq)
              .flatMap(_.fields.filter(_.transform == graft.core.Transforms.Identity))
              .flatMap(pf => schema.idToField.get(pf.sourceId)).distinct
              .map(f => (nm.idToName.getOrElse(f.id, f.name),
                SchemaBridge.toSparkType(f.fieldType)))
          raw = identSources.foldLeft(raw) { case (d, (mappedName, st)) =>
            // Column APIs, not string SQL: regex-quote the name (it may carry
            // metacharacters) and nullif the no-match '' before decoding so a
            // genuinely absent segment yields NULL, not ''.
            val seg = regexp_extract(col("_metadata.file_path"),
              "/" + java.util.regex.Pattern.quote(mappedName) + "=([^/]+)", 1)
            // Hive's escapePathName only %XX-encodes (literal '+' is legal);
            // protect '+' before url_decode so it survives rather than
            // becoming a space (URLDecoder form semantics)
            val decoded = nullif(
              url_decode(regexp_replace(nullif(seg, lit("")), "\\+", "%2B")),
              lit("__HIVE_DEFAULT_PARTITION__"))
            d.withColumn(mappedName, coalesce(d.col(s"`$mappedName`"), decoded.try_cast(st)))
          }
          raw.select(schema.fields.map(f =>
            col(nm.idToName.getOrElse(f.id, f.name)).as(f.name)): _*)
        }

      // DVs span the whole group (one blob per data file); parquet
      // pos-deletes are identical across the group by construction of the key
      val dvDeletes = groupTasks.flatMap(_.posDeletes.filter(_.format == "PUFFIN"))
        .distinctBy(d => (d.path, d.contentOffset))
      val posDeletes = groupTasks.head.posDeletes.filter(_.format != "PUFFIN")
      val eqDeletes = groupTasks.head.eqDeletes
      // eq-deletes anti-join on VALUE columns — they don't need positions,
      // which also keeps them working over ORC files (no row_index there)
      val needsPos =
        dvDeletes.nonEmpty || posDeletes.nonEmpty || rowLineage || keepFilePos
      if (needsPos) {
        df = df.withColumn("__file", normalizePath(col("_metadata.file_path")))
          .withColumn("__pos", col("_metadata.row_index"))
      }

      if (posDeletes.nonEmpty) {
        // no broadcast hint: delete sets are unbounded, so let AQE pick the
        // join strategy from the delete side's actual size at runtime.
        // Null file_path/pos rows mean the delete file is corrupt — an
        // anti-join would silently NO-OP them and resurrect the rows they
        // should delete, so fail closed (reference
        // TestReadDeletesRejectsNullPos / RejectsMissingFilePath).
        // the guard rides INSIDE the projected join key: a bare filter
        // below the join gets outflanked by the inferred IsNotNull
        // constraints on the equi-join keys, which push to the parquet scan
        // and drop the corrupt row before any check sees it
        val guardedPos = when(col("pos").isNull || col("file_path").isNull,
          raise_error(lit("corrupt positional delete file: null file_path or pos"))
            .cast("long"))
          .otherwise(col("pos"))
        // explicit spec schema (file_path, pos): skips the inference footer
        // read; missing columns surface as nulls and trip the corrupt-file
        // guard exactly like inference-era analysis failures did
        val delDf = MetadataRead.parquet(spark,
          posDeletes.map(d => (d.path, d.fileSize)), PosDeleteSchema, ioOptions)
          .select(normalizePath(col("file_path")).as("__file"),
            guardedPos.as("__pos"))
        df = df.join(delDf, Seq("__file", "__pos"), "left_anti")
      }

      if (dvDeletes.nonEmpty) {
        // deletion vectors: broadcast only blob METADATA (file -> puffin
        // path/offset/length); each executor reads and caches the bitmaps
        // for the files it scans (reference arrow_scanner.go:533-618 reads
        // DVs in the per-task pipeline). Driver never holds bitmap bytes.
        val dvMeta: Map[String, (String, Long, Long)] = dvDeletes.map(d =>
          graft.io.FileIO.canonical(d.referencedDataFile.get) ->
            ((d.path, d.contentOffset.get, d.contentSize.get))).toMap
        val bc = spark.sparkContext.broadcast(dvMeta)
        val opts = ioOptions // serialized with the closure: executors need
        // the vended credentials to open puffin blobs, not just data files
        val keep = udf((file: String, pos: Long) =>
          bc.value.get(file).forall { case (p, off, len) =>
            !DvCache.get(p, off, len, opts).contains(pos)
          })
        df = df.filter(keep(col("__file"), col("__pos")))
      }

      // equality deletes: anti-join per distinct equality-id set, scoped by
      // sequence number (data rows in this group all share applicability
      // because grouping is by delete-set). Join keys use null-safe equality:
      // Iceberg eq-deletes match null = null (reference canonical key
      // encoding, table/equality_delete_reader.go:352-527), which a plain
      // equi-join would silently drop.
      eqDeletes.groupBy(_._1.equalityIds).foreach { case (eqIds, dels) =>
        val keyCols = eqIds.map(id => schema.idToField(id).name)
        val delDf = spark.read.options(ioOptions).parquet(dels.map(_._1.path): _*)
          .select(keyCols.map(k => col(k).as(s"__del_$k")): _*)
        val cond = keyCols.map(k => col(k) <=> col(s"__del_$k")).reduce(_ && _)
        df = df.join(delDf, cond, "left_anti")
      }

      if (rowLineage) {
        // v3 lineage synthesis (reference table/arrow_scanner.go:896-984):
        // an EXPLICIT _row_id / _last_updated_sequence_number value read
        // from the file (a lineage-preserving rewrite materialized it) WINS;
        // where it is null, synthesize first_row_id + position / data
        // sequence. A broadcast JOIN against the per-file lineage frame
        // (bounded: one row per scanned file) instead of a Scala UDF keeps
        // the stage inside whole-stage codegen; evaluated after deletes so
        // surviving rows keep their original positions.
        import spark.implicits._
        if (!df.columns.contains(SchemaBridge.RowIdCol))
          df = df.withColumn(SchemaBridge.RowIdCol, lit(null).cast("long"))
            .withColumn(SchemaBridge.LastUpdatedSeqCol, lit(null).cast("long"))
        val lm = groupTasks.flatMap(t =>
          t.file.firstRowId.map(fr => (t.file.path, fr, t.dataSequence)))
        val lmDf = broadcast(lm.toDF("__lineage_file", "__first_row_id", "__lineage_seq"))
        df = df.join(lmDf, col("__file") === col("__lineage_file"), "left")
          .withColumn(SchemaBridge.RowIdCol,
            coalesce(col(SchemaBridge.RowIdCol), col("__first_row_id") + col("__pos")))
          .withColumn(SchemaBridge.LastUpdatedSeqCol,
            coalesce(col(SchemaBridge.LastUpdatedSeqCol), col("__lineage_seq")))
          .drop("__lineage_file", "__first_row_id", "__lineage_seq")
      }

      if (needsPos && !keepFilePos) df = df.drop("__file", "__pos")
      df
    }
  }

  /** Positional-delete scan mode (reference `table/arrow_scanner.go:
    * 1214-1287`): scan the DELETE artifacts themselves as rows of
    * (file_path, pos, delete_file_path). Parquet pos-deletes read
    * distributed; DV bitmaps expand on executors via the blob cache.
    */
  def readPositionDeletes(spark: SparkSession, scan: Scan): DataFrame = {
    configure(spark)
    val tasks = scan.planFiles()
    val all = tasks.flatMap(_.posDeletes).distinctBy(d => (d.path, d.contentOffset))
    val (dvs, parquets) = all.partition(_.format == "PUFFIN")

    import spark.implicits._
    // a data file with a DV has its parquet pos-deletes superseded — rows a
    // shared parquet delete file holds for DV'd files must not double-count
    val dvSuperseded = tasks
      .filter(_.posDeletes.exists(_.format == "PUFFIN"))
      .map(t => graft.io.FileIO.canonical(t.file.path)).distinct
    val parquetDf =
      if (parquets.isEmpty) None
      else {
        var df = MetadataRead.parquet(spark,
          parquets.map(d => (d.path, d.fileSize)).distinctBy(_._1), PosDeleteSchema)
          .select(normalizePath(col("file_path")).as("file_path"), col("pos"),
            normalizePath(col("_metadata.file_path")).as("delete_file_path"))
        if (dvSuperseded.nonEmpty)
          df = df.join(dvSuperseded.toDF("file_path"), Seq("file_path"), "left_anti")
        Some(df)
      }
    val dvDf =
      if (dvs.isEmpty) None
      else Some(dvs.map(d => (d.referencedDataFile.get, d.path,
          d.contentOffset.get, d.contentSize.get)).toDF("ref", "puffin", "off", "len")
        .repartition(col("puffin"), col("off"))
        .as[(String, String, Long, Long)]
        .flatMap { case (ref, puffin, off, len) =>
          DvCache.get(puffin, off, len).positionsIterator.map(p => (ref, p, puffin))
        }.toDF("file_path", "pos", "delete_file_path"))
    (parquetDf ++ dvDf).reduceOption(_ unionByName _).getOrElse(
      Seq.empty[(String, Long, String)].toDF("file_path", "pos", "delete_file_path"))
  }

  /** Does the parquet footer embed field IDs? Per-JVM cache, seeded at
    * `addFiles` time (the import harvest reads every footer anyway) and
    * back-filled by a DISTRIBUTED probe job for paths a fresh driver has
    * never seen — the first scan of a 100k-file imported table must not do
    * 100k serial footer reads on the driver.
    */
  private val fieldIdProbe =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Footer opens executed on the driver during scan planning (gate i35
    * asserts this stays 0); executor-side probe opens don't count.
    */
  private[graft] val driverFooterProbes = new java.util.concurrent.atomic.AtomicLong(0)

  private[graft] def seedFieldIdPresence(path: String, hasIds: Boolean): Unit = {
    fieldIdProbe.put(path, java.lang.Boolean.valueOf(hasIds)); ()
  }

  private[graft] def clearFieldIdCache(): Unit = fieldIdProbe.clear()

  private[table] def probeFooterHasIds(path: String): Boolean = {
    if (org.apache.spark.TaskContext.get() == null) driverFooterProbes.incrementAndGet()
    val reader = graft.encryption.ParquetEncryption.openFooterReader(path)
    try {
      val fields = reader.getFooter.getFileMetaData.getSchema.getFields
      !fields.isEmpty && fields.get(0).getId != null
    } finally reader.close()
  }

  private def fieldIdPresence(spark: SparkSession,
      paths: Seq[String]): Map[String, Boolean] = {
    val canon = paths.map(p => p -> graft.io.FileIO.canonical(p)).toMap
    val misses = paths.filterNot(p => fieldIdProbe.containsKey(canon(p)))
    if (misses.nonEmpty) {
      spark.sparkContext
        .parallelize(misses, math.max(1, math.min(misses.size, 64)))
        .map(p => (p, probeFooterHasIds(p)))
        .collect()
        .foreach { case (p, b) => seedFieldIdPresence(canon(p), b) }
    }
    paths.map(p => p -> fieldIdProbe.get(canon(p)).booleanValue).toMap
  }

  private def applyResidual(df: DataFrame, scan: Scan): DataFrame = {
    val filtered = scan.filter match {
      case Expr.AlwaysTrue => df
      case e => df.filter(Expr.toColumn(e))
    }
    scan.limit.map(n => filtered.limit(n.toInt)).getOrElse(filtered)
  }

  private def project(df: DataFrame, scan: Scan, schema: IcebergSchema): DataFrame = {
    // initial-default fill happens PER FILE in the parquet reader (the
    // read schema carries EXISTS_DEFAULT metadata, so only files that
    // predate the column get the default) — a frame-level coalesce here
    // would also rewrite EXPLICIT nulls written after the add, which the
    // spec forbids (caught by DefaultValueSpec)
    if (scan.selected.isEmpty) df
    else df.select(scan.selected.map(col): _*)
  }

  /** `_metadata.file_path` is a URI (file:///...); manifests store plain
    * absolute paths — normalize to compare. Empty-authority URIs of other
    * schemes fold to the single-slash form, the column twin of
    * [[graft.io.FileIO.canonical]].
    */
  /** Listing-free parquet read over manifest-known (path, size) pairs —
    * see [[MetadataRead.parquet]].
    */
  private[table] def metadataParquet(spark: SparkSession,
      files: Seq[(String, Long)], schema: StructType,
      options: Map[String, String] = Map.empty): DataFrame =
    MetadataRead.parquet(spark, files, schema, options)

  /** Spec-fixed positional-delete file schema (by-name resolution; the
    * optional `row` payload column prunes away untouched).
    */
  private[table] val PosDeleteSchema: StructType = StructType(Seq(
    StructField("file_path", org.apache.spark.sql.types.StringType, nullable = true),
    StructField("pos", org.apache.spark.sql.types.LongType, nullable = true)))

  private def normalizePath(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "^file:/*", "/"),
      "^([A-Za-z][A-Za-z0-9+.-]*):///+", "$1:/")

  /** Per-JVM (executor-local) cache of deserialized DV bitmaps keyed by
    * (puffin path, blob offset). Each executor reads only the blobs for the
    * files its tasks scan, so memory is bounded by the executor's working
    * set of DVs — never the table's full DV set, which lives nowhere whole.
    */
  private[graft] object DvCache {
    // access-ordered LRU, size-bounded: a long compaction over a DV-heavy
    // table evicts only the coldest bitmaps instead of thrashing the whole
    // cache (entries are immutable — eviction is re-read cost, never wrong)
    private val MaxEntries = 1024
    private val cache = java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Long), graft.format.PositionBitmap](
          64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Long), graft.format.PositionBitmap]): Boolean =
          size() > MaxEntries
      })

    def get(path: String, offset: Long, length: Long,
        credentials: Map[String, String] = Map.empty): graft.format.PositionBitmap = {
      val key = (path, offset)
      val hit = cache.get(key)
      if (hit != null) return hit
      // cold path only: register vended credentials for this blob's prefix
      // so FileIO's FileSystem build sees them (executor JVMs have no other
      // channel to plan-scoped credentials)
      if (credentials.nonEmpty)
        graft.io.FileIO.registerCredentials(
          path.substring(0, path.lastIndexOf('/') + 1), credentials)
      // deserialization runs outside the lock; a racing double-read of the
      // same immutable blob is harmless
      val blob = graft.format.Puffin.readBlob(path,
        graft.format.Puffin.BlobMetadata(graft.format.DeletionVector.BlobType,
          Nil, -1, -1, offset, length, Map.empty))
      val bm = graft.format.DeletionVector.deserialize(blob)
      cache.put(key, bm)
      bm
    }
  }
}
