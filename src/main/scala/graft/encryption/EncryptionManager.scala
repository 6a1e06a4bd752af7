package graft.encryption

import java.nio.charset.StandardCharsets
import java.util.Base64

/** Envelope encryption coordination (reference
  * `encryption/encryption.go:58-180`): per-file DEKs sealed by a KMS-held
  * KEK, with the wrapped DEK carried as opaque key metadata next to the
  * file (manifest `key_metadata` in the spec).
  */
trait EncryptionManager {
  /** Encrypt `plaintext` under a fresh DEK wrapped by `keyId`; returns
    * (ciphertext, keyMetadata). Empty `keyId` means "no encryption
    * requested" and managers that cannot honor a non-empty one must fail
    * closed, never silently write plaintext.
    */
  def encrypt(keyId: String, plaintext: Array[Byte]): (Array[Byte], Array[Byte])

  /** Decrypt with the DEK recovered from `keyMetadata`. Empty metadata means
    * the bytes are plaintext; managers that cannot honor non-empty metadata
    * must fail closed, never hand ciphertext back as data.
    */
  def decrypt(keyMetadata: Array[Byte], ciphertext: Array[Byte]): Array[Byte]
}

/** No-op manager for unencrypted tables; FAILS CLOSED on any sign of
  * intended encryption (reference `encryption.go:126-160`: accepting a
  * keyID but writing plaintext, or returning ciphertext as data, would mask
  * a misconfigured setup).
  */
object PlaintextEncryptionManager extends EncryptionManager {
  override def encrypt(keyId: String, plaintext: Array[Byte]): (Array[Byte], Array[Byte]) = {
    require(keyId.isEmpty,
      "PlaintextEncryptionManager does not support a non-empty keyID; " +
        "configure a real EncryptionManager")
    (plaintext, Array.emptyByteArray)
  }

  override def decrypt(keyMetadata: Array[Byte], ciphertext: Array[Byte]): Array[Byte] = {
    require(keyMetadata.isEmpty,
      "PlaintextEncryptionManager does not support non-empty key metadata; " +
        "configure a real EncryptionManager")
    ciphertext
  }
}

/** Standard envelope manager: fresh AES-GCM DEK per file, wrapped by the
  * KMS; key metadata is a small JSON envelope `{"key-id":...,
  * "wrapped-dek":base64}` so any holder of KMS access can re-derive the
  * DEK (the spec leaves the key-metadata encoding manager-defined).
  */
final class StandardEncryptionManager(
    kms: KeyManagementClient,
    dekLength: Int = 16) extends EncryptionManager {

  require(AesGcm.validKeyLength(dekLength), s"bad DEK length $dekLength")

  // The envelope is built and parsed with a real JSON mapper: string
  // interpolation + regex would write metadata for a keyId containing a
  // quote/backslash that decrypt() could never parse back — the encrypted
  // data would be permanently unreadable.
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  override def encrypt(keyId: String, plaintext: Array[Byte]): (Array[Byte], Array[Byte]) = {
    require(keyId.nonEmpty, "StandardEncryptionManager requires a key ID")
    val (dek, wrapped) =
      if (kms.supportsKeyGeneration) kms.generateKey(keyId, dekLength)
      else {
        val d = new Array[Byte](dekLength)
        new java.security.SecureRandom().nextBytes(d)
        (d, kms.wrapKey(keyId, d))
      }
    val node = mapper.createObjectNode()
    node.put("key-id", keyId)
    node.put("wrapped-dek", Base64.getEncoder.encodeToString(wrapped))
    (AesGcm.seal(dek, plaintext),
      mapper.writeValueAsString(node).getBytes(StandardCharsets.UTF_8))
  }

  override def decrypt(keyMetadata: Array[Byte], ciphertext: Array[Byte]): Array[Byte] = {
    val node =
      try mapper.readTree(new String(keyMetadata, StandardCharsets.UTF_8))
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"malformed key metadata", e)
      }
    val keyId = Option(node.get("key-id")).map(_.asText()).getOrElse(
      throw new IllegalArgumentException("key metadata missing key-id"))
    val wrappedB64 = Option(node.get("wrapped-dek")).map(_.asText()).getOrElse(
      throw new IllegalArgumentException("key metadata missing wrapped-dek"))
    val dek = kms.unwrapKey(keyId, Base64.getDecoder.decode(wrappedB64))
    AesGcm.open(dek, ciphertext)
  }
}
