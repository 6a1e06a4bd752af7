package graft.encryption

import java.security.SecureRandom

import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

import scala.collection.concurrent.TrieMap

/** AES-GCM primitives shared by the KMS and the envelope manager. Ciphertext
  * layout matches the reference (`encryption/kms.go:185-225`):
  * 12-byte random nonce || ciphertext || 16-byte GCM tag.
  */
object AesGcm {
  val NonceLen = 12
  val TagBits = 128

  private val rng = new SecureRandom()

  def validKeyLength(len: Int): Boolean = len == 16 || len == 24 || len == 32

  def seal(key: Array[Byte], plaintext: Array[Byte]): Array[Byte] = {
    require(validKeyLength(key.length),
      s"invalid AES key length ${key.length} (want 16/24/32)")
    val nonce = new Array[Byte](NonceLen)
    rng.nextBytes(nonce)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(TagBits, nonce))
    nonce ++ cipher.doFinal(plaintext)
  }

  /** Throws [[AuthenticationFailed]] on tamper / wrong key / truncation. */
  def open(key: Array[Byte], ciphertext: Array[Byte]): Array[Byte] = {
    require(validKeyLength(key.length),
      s"invalid AES key length ${key.length} (want 16/24/32)")
    if (ciphertext.length < NonceLen + TagBits / 8)
      throw new AuthenticationFailed(
        s"ciphertext too short (${ciphertext.length} bytes)")
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(TagBits, ciphertext.take(NonceLen)))
    try cipher.doFinal(ciphertext.drop(NonceLen))
    catch {
      case e: javax.crypto.AEADBadTagException =>
        throw new AuthenticationFailed(s"authentication failed: ${e.getMessage}")
    }
  }
}

final class AuthenticationFailed(msg: String) extends RuntimeException(msg)
final class UnknownKeyId(keyId: String)
  extends IllegalArgumentException(s"unknown key ID: $keyId")

/** KMS abstraction for envelope encryption (reference
  * `encryption/kms.go:53-82`): wrap/unwrap per-file data encryption keys
  * (DEKs) under a master key-encryption key (KEK) the KMS holds.
  */
trait KeyManagementClient {
  def wrapKey(keyId: String, plaintextKey: Array[Byte]): Array[Byte]
  def unwrapKey(keyId: String, wrappedKey: Array[Byte]): Array[Byte]
  def supportsKeyGeneration: Boolean
  /** (plaintext DEK, wrapped DEK); only valid when
    * `supportsKeyGeneration`.
    */
  def generateKey(keyId: String, length: Int): (Array[Byte], Array[Byte])
}

/** In-memory KMS for tests (reference `encryption/kms.go:84-180`): KEKs held
  * in a map, AES-GCM wrapping. Never use in production — no persistence,
  * access control, or audit.
  */
final class InMemoryKms extends KeyManagementClient {
  private val keys = TrieMap.empty[String, Array[Byte]]

  def addKey(keyId: String, masterKey: Array[Byte]): this.type = {
    require(AesGcm.validKeyLength(masterKey.length),
      s"master key for '$keyId' must be 16/24/32 bytes, got ${masterKey.length}")
    keys.put(keyId, masterKey.clone())
    this
  }

  private def kek(keyId: String): Array[Byte] =
    keys.getOrElse(keyId, throw new UnknownKeyId(keyId))

  override def wrapKey(keyId: String, plaintextKey: Array[Byte]): Array[Byte] =
    AesGcm.seal(kek(keyId), plaintextKey)

  override def unwrapKey(keyId: String, wrappedKey: Array[Byte]): Array[Byte] =
    AesGcm.open(kek(keyId), wrappedKey)

  override def supportsKeyGeneration: Boolean = true

  override def generateKey(keyId: String, length: Int): (Array[Byte], Array[Byte]) = {
    require(length > 0, s"key length must be positive, got $length")
    val dek = new Array[Byte](length)
    new SecureRandom().nextBytes(dek)
    (dek, wrapKey(keyId, dek))
  }
}

/** Named KMS factory registry (reference `encryption/kms_registry.go`):
  * implementations register under a short name selected by the
  * `graft.encryption.kms-type` property; factories read whatever further
  * properties they need (key material, endpoints, credentials).
  */
object KmsRegistry {
  /** Selects the KMS implementation (reference `KMSTypeKey`, prefixed for
    * hadoop-conf safety).
    */
  val KmsTypeProp = "graft.encryption.kms-type"

  /** Master-key material for the in-memory KMS:
    * `keyId:base64kek[,keyId:base64kek...]`. Test-only, like the KEK map it
    * feeds.
    */
  val MemoryKeysProp = "graft.encryption.keys"

  private val factories =
    TrieMap.empty[String, Map[String, String] => KeyManagementClient]

  def register(name: String,
      factory: Map[String, String] => KeyManagementClient): Unit = {
    factories.put(name, factory)
    ()
  }

  def registeredNames: Seq[String] = factories.keys.toSeq.sorted

  /** Resolve a client from properties; fails loudly when the type is unset
    * or unregistered (a silent plaintext fallback would fail open).
    */
  def load(props: Map[String, String]): KeyManagementClient = {
    val name = props.getOrElse(KmsTypeProp,
      throw new IllegalArgumentException(s"$KmsTypeProp is not set"))
    factories.getOrElse(name, throw new IllegalArgumentException(
      s"no KMS registered for type '$name' (have: ${registeredNames.mkString(", ")})"))
      .apply(props)
  }

  register("memory", props => {
    val kms = new InMemoryKms
    props.get(MemoryKeysProp).toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      .foreach { entry =>
        entry.split(":", 2) match {
          case Array(id, b64) =>
            kms.addKey(id, java.util.Base64.getDecoder.decode(b64))
          case _ => throw new IllegalArgumentException(
            s"bad $MemoryKeysProp entry '$entry' (want keyId:base64)")
        }
      }
    kms
  })
}
