package graft

import java.nio.file.Files
import java.util.Base64

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.core._
import graft.encryption._
import graft.format.PartitionSpec
import graft.table.{SparkRead, Writer}

/** Encryption: KMS wrap/unwrap (reference `encryption/kms.go`), registry
  * (`kms_registry.go`), fail-closed plaintext manager + envelope manager
  * (`encryption.go`), and the Spark-native path — parquet modular
  * encryption for table data files keyed by `encryption.key-id`.
  */
class EncryptionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val kek = Array.tabulate[Byte](16)(_.toByte)
  private val kekB64 = Base64.getEncoder.encodeToString(kek)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config(KmsRegistry.KmsTypeProp, "memory")
    .config(KmsRegistry.MemoryKeysProp, s"k1:$kekB64")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("in-memory KMS wraps and unwraps DEKs; tampering fails authentication") {
    val kms = new InMemoryKms().addKey("k1", kek)
    val dek = Array.tabulate[Byte](16)(i => (i * 7).toByte)
    val wrapped = kms.wrapKey("k1", dek)
    assert(!wrapped.sameElements(dek))
    assert(kms.unwrapKey("k1", wrapped).toSeq === dek.toSeq)
    // nonce is random: wrapping twice never repeats ciphertext
    assert(!kms.wrapKey("k1", dek).sameElements(wrapped))
    val tampered = wrapped.clone(); tampered(wrapped.length - 1) = (tampered(wrapped.length - 1) ^ 1).toByte
    intercept[AuthenticationFailed](kms.unwrapKey("k1", tampered))
    intercept[AuthenticationFailed](kms.unwrapKey("k1", wrapped.take(11)))
    intercept[UnknownKeyId](kms.wrapKey("nope", dek))
    intercept[IllegalArgumentException](new InMemoryKms().addKey("bad", new Array[Byte](13)))
  }

  test("KMS registry resolves by type and fails loudly otherwise") {
    val kms = KmsRegistry.load(Map(
      KmsRegistry.KmsTypeProp -> "memory",
      KmsRegistry.MemoryKeysProp -> s"k1:$kekB64"))
    val (dek, wrapped) = kms.generateKey("k1", 32)
    assert(dek.length === 32)
    assert(kms.unwrapKey("k1", wrapped).toSeq === dek.toSeq)
    intercept[IllegalArgumentException](KmsRegistry.load(Map.empty))
    intercept[IllegalArgumentException](
      KmsRegistry.load(Map(KmsRegistry.KmsTypeProp -> "vault")))
  }

  test("plaintext manager fails closed; envelope manager round-trips") {
    val (pt, meta) = PlaintextEncryptionManager.encrypt("", "hello".getBytes)
    assert(meta.isEmpty && pt.toSeq === "hello".getBytes.toSeq)
    intercept[IllegalArgumentException](
      PlaintextEncryptionManager.encrypt("k1", "hello".getBytes))
    intercept[IllegalArgumentException](
      PlaintextEncryptionManager.decrypt("meta".getBytes, "x".getBytes))

    val mgr = new StandardEncryptionManager(new InMemoryKms().addKey("k1", kek))
    val (ct, km) = mgr.encrypt("k1", "secret payload".getBytes)
    assert(!ct.sameElements("secret payload".getBytes))
    assert(new String(mgr.decrypt(km, ct)) === "secret payload")
    val bad = ct.clone(); bad(0) = (bad(0) ^ 1).toByte
    intercept[AuthenticationFailed](mgr.decrypt(km, bad))
  }

  test("encrypted table round-trips through append/scan; files are opaque without keys") {
    import spark.implicits._
    val catalog = new HadoopCatalog(Files.createTempDirectory("graft-enc").toString)
    val df = (1L to 100L).map(i => (i, s"row$i")).toDF("id", "payload")
    val t = catalog.createTable("enc_t", SchemaBridge.fromSpark(df.schema),
      PartitionSpec.Unpartitioned,
      properties = Map(ParquetEncryption.KeyIdProp -> "k1"))
    val t1 = Writer.append(spark, t, df)

    // read through the engine: decrypts transparently, stats/pruning intact
    val back = SparkRead.read(spark, t1.newScan)
    assert(back.count() === 100)
    assert(back.filter($"id" === 42L).select("payload").as[String].head() === "row42")

    // the parquet footer must be unreadable without KMS access
    val dataFile = t1.newScan.planFiles().head.file.path
    val bare = new org.apache.hadoop.conf.Configuration()
    val ex = intercept[Exception] {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(dataFile), bare))
      try r.getFooter finally r.close()
    }
    assert(ex.getMessage != null)

    // MoR delete writes (pos-delete parquet) are encrypted too and readable
    val t2 = Writer.deleteWhereMoR(spark, t1, Expr.eq("id", 7L))
    assert(SparkRead.read(spark, t2.newScan).count() === 99)
  }

  test("table demanding encryption without a session KMS fails closed") {
    val bareSession = spark.newSession()
    // a fresh session without graft.encryption.* conf
    bareSession.conf.unset(KmsRegistry.KmsTypeProp)
    bareSession.conf.unset(KmsRegistry.MemoryKeysProp)
    val catalog = new HadoopCatalog(Files.createTempDirectory("graft-enc2").toString)
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "payload")
    val t = catalog.createTable("enc_u", SchemaBridge.fromSpark(df.schema),
      PartitionSpec.Unpartitioned,
      properties = Map(ParquetEncryption.KeyIdProp -> "k1"))
    intercept[IllegalArgumentException](Writer.append(bareSession, t, df))
  }
}
