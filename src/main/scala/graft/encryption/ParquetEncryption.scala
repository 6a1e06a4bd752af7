package graft.encryption

import java.util.Base64

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Format-native data-file encryption (the reference's
  * `NativeEncryption{Input,Output}File` extension point,
  * `encryption/encryption.go:85-112`, realized Spark-first): data files use
  * PARQUET MODULAR ENCRYPTION — footer and all columns encrypted under
  * per-file DEKs enveloped by the table's master key — so Spark's
  * vectorized reader, row-group pruning, and filter pushdown keep working
  * on encrypted files, executor-side and with zero custom read code.
  *
  * Configuration model:
  *  - table property `encryption.key-id` — the master key for this table's
  *    data files (reference keyID in `EncryptionManager`); absence = table
  *    not encrypted.
  *  - session/catalog properties `graft.encryption.kms-type` (+ KMS
  *    specifics such as `graft.encryption.keys` for the test KMS) — how any
  *    JVM, driver or executor, reaches the KMS. These travel inside the
  *    per-relation hadoop conf via DataFrame reader/writer options, so a
  *    1000-executor cluster needs no shared mutable state.
  */
object ParquetEncryption {

  /** Table property naming the master (KEK) key id. Tables carrying this
    * property also write their manifests WITHOUT value bounds
    * (`Writer.harvestStats(omitBounds)`): modular encryption protects data
    * files only, and plaintext min/max in manifests would leak every
    * column's value range at rest.
    */
  val KeyIdProp = "encryption.key-id"

  private val FactoryClassProp = "parquet.crypto.factory.class"
  private val FactoryClass =
    "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory"
  private val KmsClientClassProp = "parquet.encryption.kms.client.class"
  private val UniformKeyProp = "parquet.encryption.uniform.key"

  /** KMS reachability props present in the session conf (set via
    * `spark.graft.encryption.*` or directly).
    */
  private def kmsProps(spark: SparkSession): Map[String, String] =
    Seq(KmsRegistry.KmsTypeProp, KmsRegistry.MemoryKeysProp)
      .flatMap(k => spark.conf.getOption(k).map(k -> _)).toMap

  /** Reader/writer-options that let any parquet task DECRYPT table files
    * (key ids ride in each file's key material). Empty when the session has
    * no KMS configured.
    */
  def readOptions(spark: SparkSession): Map[String, String] = {
    val kms = kmsProps(spark)
    if (kms.isEmpty) Map.empty
    else kms ++ Map(FactoryClassProp -> FactoryClass,
      KmsClientClassProp -> classOf[GraftKmsClient].getName)
  }

  /** Writer-options that ENCRYPT a write for a table carrying
    * `encryption.key-id`; empty (plaintext write) otherwise. Fails loudly
    * when the table demands encryption but the session has no KMS — writing
    * plaintext instead would fail open.
    */
  def writeOptions(spark: SparkSession, tableProps: Map[String, String]): Map[String, String] =
    tableProps.get(KeyIdProp) match {
      case None => Map.empty
      case Some(keyId) =>
        val kms = kmsProps(spark)
        require(kms.contains(KmsRegistry.KmsTypeProp),
          s"table requires encryption under key '$keyId' but " +
            s"${KmsRegistry.KmsTypeProp} is not configured in the session")
        kms ++ Map(FactoryClassProp -> FactoryClass,
          KmsClientClassProp -> classOf[GraftKmsClient].getName,
          UniformKeyProp -> keyId)
    }

  /** Propagate KMS reachability into the session's hadoop conf so
    * driver-side footer reads (stats harvest, field-id probes) and metadata
    * paths can decrypt; no-op without a configured KMS.
    */
  def configureSession(spark: SparkSession): Unit = {
    val opts = readOptions(spark)
    if (opts.nonEmpty) {
      val hc = spark.sparkContext.hadoopConfiguration
      opts.foreach { case (k, v) => hc.set(k, v) }
      driverConf.set(Some(opts))
    }
  }

  /** Undo [[configureSession]]: drop KMS reachability from the shared
    * hadoop conf and the driver-side conf snapshot. Gates/tests that enable
    * encryption session-wide must call this when done — leaked crypto state
    * in a long-lived JVM can mask or manufacture failures in later queries.
    */
  def restoreSession(spark: SparkSession): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    Seq(KmsRegistry.KmsTypeProp, KmsRegistry.MemoryKeysProp,
      FactoryClassProp, KmsClientClassProp).foreach(hc.unset)
    driverConf.set(None)
  }

  /** Last-seen KMS conf for driver-side bare `Configuration` builders
    * (footer harvest). Driver-only convenience — executors always get conf
    * through per-relation options.
    */
  private val driverConf =
    new java.util.concurrent.atomic.AtomicReference[Option[Map[String, String]]](None)

  def newHadoopConf(): Configuration = newHadoopConf("")

  /** Path-aware variant: starts from [[graft.io.FileIO.confFor]] so footer
    * reads over credential-gated storage see the same vended-credential
    * overlay FileIO's own ops do.
    */
  def newHadoopConf(path: String): Configuration = {
    val conf = new Configuration(graft.io.FileIO.confFor(path))
    driverConf.get().foreach(_.foreach { case (k, v) => conf.set(k, v) })
    conf
  }

  /** Open a parquet footer reader that can decrypt encrypted footers.
    * `ParquetFileReader.open(InputFile)` builds bare `ParquetReadOptions`
    * and never consults the decryption-factory conf — footer reads must go
    * through `HadoopReadOptions` to engage it.
    */
  def openFooterReader(path: String): org.apache.parquet.hadoop.ParquetFileReader = {
    val conf = newHadoopConf(path)
    val p = new org.apache.hadoop.fs.Path(path)
    org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf),
      org.apache.parquet.HadoopReadOptions.builder(conf, p).build())
  }
}

/** Bridge from parquet's keytools KMS SPI to [[KmsRegistry]] clients.
  * Instantiated reflectively by `PropertiesDrivenCryptoFactory` on every
  * JVM that reads or writes an encrypted file; all state comes from the
  * hadoop `Configuration`, so it works identically on executors.
  */
final class GraftKmsClient extends org.apache.parquet.crypto.keytools.KmsClient {
  private var kms: KeyManagementClient = _

  override def initialize(conf: Configuration, kmsInstanceID: String,
      kmsInstanceURL: String, accessToken: String): Unit = {
    val props = Seq(KmsRegistry.KmsTypeProp, KmsRegistry.MemoryKeysProp)
      .flatMap(k => Option(conf.get(k)).map(k -> _)).toMap
    kms = KmsRegistry.load(props)
  }

  override def wrapKey(keyBytes: Array[Byte], masterKeyIdentifier: String): String =
    Base64.getEncoder.encodeToString(kms.wrapKey(masterKeyIdentifier, keyBytes))

  override def unwrapKey(wrappedKey: String, masterKeyIdentifier: String): Array[Byte] =
    kms.unwrapKey(masterKeyIdentifier, Base64.getDecoder.decode(wrappedKey))
}
