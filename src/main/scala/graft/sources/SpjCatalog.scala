package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, Table => V2Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog.{Catalog => GraftCatalog, Catalogs}
import graft.core.{SchemaBridge, Transforms}

/** V2 catalog plugin exposing graft tables for storage-partitioned joins —
  * including on BUCKET transforms, which the bare `TableProvider` path
  * cannot reach: Spark resolves a `bucket(n, col)` partition transform
  * through the table's owning FunctionCatalog, and proves two scans
  * co-partitioned only when both sides bind to the same canonical
  * function. Register and read with:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.spjcat", "graft.sources.GraftSpjCatalog")
  * spark.conf.set("spark.sql.catalog.spjcat.uri", "<catalog uri>")
  * spark.table("spjcat.orders_bucketed")    // SPJ-capable scan
  * }}}
  *
  * With both tables bucket[N]-partitioned on their join keys, the join
  * plans with zero shuffles — the 100 TB fact-fact join layout (identity
  * partitioning caps out at the key's cardinality; bucketing gives a
  * bounded partition count at any cardinality). The catalog is a read
  * facade: writes go through [[graft.table.Writer]], which owns the
  * commit protocol.
  */
final class GraftSpjCatalog extends TableCatalog with FunctionCatalog {

  private var catName: String = _
  private var cat: GraftCatalog = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    cat = Catalogs.load(Option(options.get("uri")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name requires option 'uri' (graft catalog URI)")))
  }

  override def name(): String = catName

  private def flat(ident: Identifier): String = {
    if (ident.namespace.nonEmpty && !(ident.namespace sameElements Array("default")))
      throw new NoSuchTableException(ident)
    ident.name
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    cat.listTables().map(n => Identifier.of(Array.empty[String], n)).toArray

  override def loadTable(ident: Identifier): V2Table = {
    val name = flat(ident)
    if (!cat.tableExists(name)) throw new NoSuchTableException(ident)
    val t = cat.loadTable(name)
    new SpjTable(t, SchemaBridge.toSpark(t.schema), allowBucket = true)
  }

  private def readOnly: Nothing = throw new UnsupportedOperationException(
    s"$catName is a read (SPJ) facade; write through graft.table.Writer")

  override def alterTable(ident: Identifier, changes: TableChange*): V2Table = readOnly
  override def dropTable(ident: Identifier): Boolean = readOnly
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = readOnly

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty[String], "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name == "bucket") GraftBucketUnbound
    else throw new NoSuchFunctionException(ident)
}

/** The Iceberg bucket transform as a V2 function: murmur3_x86_32(seed 0)
  * over the spec single-value serialization — identical arithmetic to the
  * write-side [[graft.core.Transforms.Bucket]], so the function's claim
  * about data layout is exactly what the fanout writer produced. The
  * canonical name keys SPJ compatibility: two scans are co-partitioned iff
  * both bind bucket to the same canonical function with the same bucket
  * count.
  */
object GraftBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "graft iceberg bucket transform: murmur3(seed 0) over spec value encoding"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, value), got ${inputType.catalogString}")
    inputType.fields(1).dataType match {
      case IntegerType | LongType | DateType => GraftBucketLong
      case StringType => GraftBucketString
      case other => throw new UnsupportedOperationException(
        s"graft bucket over ${other.catalogString} not supported for SPJ")
    }
  }
}

object GraftBucketLong extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket(long)"
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): Integer =
    if (input.isNullAt(1)) null
    else Int.box(Transforms.bucketLong(input.getLong(1), input.getInt(0)))
}

object GraftBucketString extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket(string)"
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): Integer =
    if (input.isNullAt(1)) null
    else Int.box(Transforms.bucketBytes(
      input.get(1, StringType).asInstanceOf[UTF8String].getBytes, input.getInt(0)))
}
