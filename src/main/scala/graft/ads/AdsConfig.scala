package graft.ads

import java.nio.file.{Files, Path, Paths}

/** Control plane (SURVEY §2.10): configuration/credential access behind one
  * interface, replacing the reference's Secret Manager round-trips
  * (`get_secret`/`set_secret`, `main.py:71-90`) and token metadata
  * (`main.py:130-255`) with pluggable zero-egress implementations.
  *
  * Token *validation/refresh* against the remote identity provider is out of
  * engine scope by design — the source takes whatever credential the
  * provider yields; [[TokenState]] models the metadata the reference
  * persists (expiry, refresh threshold) so a real provider can slot in.
  */
trait ConfigProvider {
  def get(key: String): Option[String]
  def set(key: String, value: String): Unit
}

/** Environment-backed, read-only (the backfill path: token from env only,
  * `backfill.py:36`).
  */
final class EnvConfig(prefix: String = "") extends ConfigProvider {
  override def get(key: String): Option[String] = sys.env.get(prefix + key)
  override def set(key: String, value: String): Unit =
    throw new UnsupportedOperationException("env config is read-only")
}

/** File-backed key=value store with write-back (the daily path: refreshed
  * tokens are persisted, `main.py:226-235`).
  */
final class FileConfig(path: String) extends ConfigProvider {
  private def file: Path = Paths.get(path)

  private def load(): Map[String, String] =
    if (!Files.exists(file)) Map.empty
    else Files.readAllLines(file).toArray(Array.empty[String])
      .filter(_.contains('='))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap

  override def get(key: String): Option[String] = load().get(key)

  override def set(key: String, value: String): Unit = {
    val updated = load() + (key -> value)
    Files.createDirectories(file.getParent)
    Files.write(file, updated.map { case (k, v) => s"$k=$v" }
      .mkString("\n").getBytes("UTF-8"))
  }
}

/** Token lifecycle metadata (reference persists `expires_at` and refreshes
  * within 7 days of expiry, `main.py:130-155`).
  */
final case class TokenState(token: String, expiresAtEpochSec: Long) {
  def needsRefresh(nowEpochSec: Long, thresholdDays: Int = 7): Boolean =
    expiresAtEpochSec - nowEpochSec < thresholdDays * 86400L
}

object TokenState {
  def from(cfg: ConfigProvider): Option[TokenState] =
    for {
      t <- cfg.get("fb_access_token")
      e <- cfg.get("fb_token_expires_at")
    } yield TokenState(t, e.toLong)

  def persist(cfg: ConfigProvider, st: TokenState): Unit = {
    cfg.set("fb_access_token", st.token)
    cfg.set("fb_token_expires_at", st.expiresAtEpochSec.toString)
  }
}

/** What the identity provider reports about a token (reference
  * `debug_token`, `main.py:93-128`): validity and expiry
  * (0 = never expires — a system-user token).
  */
final case class TokenInfo(
    isValid: Boolean, expiresAtEpochSec: Long, error: Option[String] = None)

/** The two identity-provider calls the refresh flow needs. The HTTP form
  * hits `debug_token` / `oauth/access_token?grant_type=fb_exchange_token`
  * (reference `main.py:93-155`); tests drive the state machine with a
  * scripted fake.
  */
trait TokenEndpoint {
  def debugToken(token: String, appId: String, appSecret: String): TokenInfo
  /** Exchange for a fresh long-lived token; throws on provider failure. */
  def exchangeToken(token: String, appId: String, appSecret: String): TokenState
}

/** Outcome of [[TokenManager.getValidToken]]; `action` names the branch
  * taken so callers/ops can log the lifecycle event.
  */
final case class TokenDecision(token: String, action: String)

/** The reference's token control flow (`get_valid_token`,
  * `main.py:159-255`), verbatim as a state machine:
  *
  *  1. env override wins unconditionally;
  *  2. current token must exist and debug as valid — else fatal;
  *  3. `expires_at == 0` = system-user token, never refreshed;
  *  4. within `thresholdDays` (7) of expiry: exchange → VERIFY the new
  *     token → persist token + refresh metadata — a refresh that fails
  *     (exchange error or invalid result) falls back to the current token
  *     while it still has ≥1 day of life, and is fatal once expired.
  */
object TokenManager {

  def getValidToken(
      cfg: ConfigProvider, endpoint: TokenEndpoint, nowEpochSec: Long,
      envToken: Option[String] = None, thresholdDays: Int = 7): TokenDecision = {
    envToken match {
      case Some(t) => return TokenDecision(t, "env_override")
      case None    => ()
    }
    val appId = cfg.get("fb_app_id").getOrElse(
      throw new IllegalStateException("missing credential: fb_app_id"))
    val appSecret = cfg.get("fb_app_secret").getOrElse(
      throw new IllegalStateException("missing credential: fb_app_secret"))
    val current = cfg.get("fb_access_token").getOrElse(
      throw new IllegalStateException("missing credential: fb_access_token"))

    val info = endpoint.debugToken(current, appId, appSecret)
    if (!info.isValid)
      throw new IllegalStateException(
        s"token is invalid: ${info.error.getOrElse("Unknown error")}; " +
          "generate a new token and update the secret store")
    if (info.expiresAtEpochSec == 0L)
      return TokenDecision(current, "never_expires")

    val daysLeft = (info.expiresAtEpochSec - nowEpochSec) / 86400L
    if (daysLeft > thresholdDays)
      return TokenDecision(current, "current")

    try {
      val fresh = endpoint.exchangeToken(current, appId, appSecret)
      val verify = endpoint.debugToken(fresh.token, appId, appSecret)
      if (!verify.isValid)
        throw new IllegalStateException("refreshed token is not valid")
      TokenState.persist(cfg, fresh)
      cfg.set("fb_token_metadata",
        s"""{"refreshed_at": $nowEpochSec, "expires_at": ${fresh.expiresAtEpochSec}}""")
      TokenDecision(fresh.token, "refreshed")
    } catch {
      case e: Exception if daysLeft > 0 =>
        // refresh failed but the current token still has life — use it
        TokenDecision(current, s"refresh_failed_still_valid: ${e.getMessage}")
      case e: Exception =>
        throw new IllegalStateException(
          s"token refresh failed and current token is expired: ${e.getMessage}", e)
    }
  }
}
