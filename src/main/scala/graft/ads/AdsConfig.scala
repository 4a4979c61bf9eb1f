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
