package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{FileIO, GatedFileSystem, PlanScopedCredentials, StorageCredential, TableCredentials}

/** Vended storage credentials (reference `catalog/rest/vended_creds.go`,
  * `scan_planning.go:305-345`): longest-prefix resolution, expiry keys,
  * plan-scoped expiry is fatal (no renewal endpoint), table-scoped expiry
  * re-fetches, and the gated:// filesystem actually enforces.
  */
class CredentialsSpec extends AnyFunSuite {

  test("longest-prefix match picks the most specific credential") {
    val creds = Seq(
      StorageCredential("s3://bucket/", Map("k" -> "broad")),
      StorageCredential("s3://bucket/warehouse/", Map("k" -> "narrow")),
      StorageCredential("gs://other/", Map("k" -> "wrong-store")))
    assert(StorageCredential.resolve(creds, "s3://bucket/warehouse/t/data/f.parquet")
      === Map("k" -> "narrow"))
    assert(StorageCredential.resolve(creds, "s3://bucket/elsewhere/f.parquet")
      === Map("k" -> "broad"))
    // no match -> empty config, caller falls back to ambient identity
    assert(StorageCredential.resolve(creds, "abfs://nowhere/f") === Map.empty)
  }

  test("expiry parses from any spec key; absent means never expires") {
    assert(StorageCredential.expiryOf(Map("expiration-time" -> "123")) === Some(123L))
    assert(StorageCredential.expiryOf(
      Map("s3.session-token-expires-at-ms" -> "456")) === Some(456L))
    assert(StorageCredential.expiryOf(Map("s3.access-key-id" -> "x")) === None)
    assert(StorageCredential.expiryOf(Map("expiration-time" -> "junk")) === None)
  }

  test("plan-scoped credentials: expiry is a loud error, not a storage 403") {
    var now = 1000L
    val creds = Seq(StorageCredential("s3://b/",
      Map("tok" -> "t1", "expiration-time" -> "2000")))
    val plan = new PlanScopedCredentials(creds, "s3://b/t", nowMs = () => now)
    assert(plan.ioOptions()("tok") === "t1")
    now = 3000L
    val ex = intercept[IllegalStateException](plan.ioOptions())
    assert(ex.getMessage.contains("expired"))
  }

  test("table-scoped credentials: expiry triggers a re-fetch") {
    var now = 1000L
    var fetches = 0
    val tc = new TableCredentials(
      Seq(StorageCredential("s3://b/", Map("tok" -> "t1", "expiration-time" -> "2000"))),
      "s3://b/t",
      fetch = () => {
        fetches += 1
        Seq(StorageCredential("s3://b/", Map("tok" -> "t2", "expiration-time" -> "9000")))
      },
      nowMs = () => now)
    assert(tc.ioOptions()("tok") === "t1")
    assert(fetches === 0)
    now = 2500L
    assert(tc.ioOptions()("tok") === "t2") // re-fetched, not an error
    assert(fetches === 1)
    assert(tc.ioOptions()("tok") === "t2") // fresh set cached
    assert(fetches === 1)
  }

  test("gated filesystem denies reads without a live token and allows with") {
    val dir = java.nio.file.Files.createTempDirectory("gated").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/x.txt"), "hello")
    val gatedPath = s"gated://$dir/x.txt"
    try {
      // no credentials registered: denied
      FileIO.registerCredentials("gated://", GatedFileSystem.implOptions)
      val denied = intercept[Exception](FileIO.readString(gatedPath))
      assert(denied.getMessage.contains("denied"))

      val tok = GatedFileSystem.issueToken(ttlMs = 60 * 1000L)
      FileIO.registerCredentials("gated://",
        GatedFileSystem.implOptions + (GatedFileSystem.TokenKey -> tok))
      assert(FileIO.readString(gatedPath) === "hello")

      // revocation takes effect for new FileSystem builds AND live ones
      GatedFileSystem.revoke(tok)
      intercept[Exception](FileIO.readString(gatedPath))
    } finally FileIO.unregisterCredentials("gated://")
  }
}
