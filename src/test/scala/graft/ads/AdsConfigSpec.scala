package graft.ads

import org.scalatest.funsuite.AnyFunSuite

class AdsConfigSpec extends AnyFunSuite {

  test("file config round-trips and updates keys") {
    val path = "/root/repo/target/test-work/cfg/secrets.properties"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val cfg = new FileConfig(path)
    assert(cfg.get("fb_access_token").isEmpty)
    TokenState.persist(cfg, TokenState("tok1", 1000L))
    assert(TokenState.from(cfg).contains(TokenState("tok1", 1000L)))
    TokenState.persist(cfg, TokenState("tok2", 2000L)) // write-back on refresh
    assert(TokenState.from(cfg).contains(TokenState("tok2", 2000L)))
  }

  test("refresh threshold mirrors the reference's 7-day rule") {
    val st = TokenState("t", expiresAtEpochSec = 100 * 86400L)
    assert(!st.needsRefresh(nowEpochSec = 90 * 86400L))  // 10 days out
    assert(st.needsRefresh(nowEpochSec = 94 * 86400L))   // 6 days out
  }

  test("env config is read-only") {
    val cfg = new EnvConfig()
    assertThrows[UnsupportedOperationException](cfg.set("k", "v"))
  }
}
