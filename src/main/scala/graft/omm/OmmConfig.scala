package graft.omm

import graft.omm.{CancellationPipeline => P}

/** Service configuration surface (≙ environment.conf + Main.java:28–51):
  * defaults mirror the reference's HOCON, each overridable by the same
  * environment variables the reference reads.
  *
  * | key | default | env override | cite |
  * |---|---|---|---|
  * | omm.interval (s) | 30 | POLLER_INTERVAL_SECS | environment.conf:21–22 |
  * | omm.timezone | Europe/Helsinki | OMM_TIMEZONE | environment.conf:19–20 |
  * | omm.cancellationsFromTime | NOW | CANCELLATIONS_FROM_TIME | Main.java:30–44; CancellationSourceType.java:15–21 |
  * | connection string | — | TRANSITDATA_PUBTRANS_CONN_STRING | Main.java:46, 84–97 |
  */
case class OmmConfig(
    intervalSeconds: Int = 30,
    timezone: String = "Europe/Helsinki",
    mode: P.Mode = P.FromNow,
    connectionString: Option[String] = None) {
  /** PAST-mode lookback = poll interval (OmmConnector.java:76). */
  def lookbackSeconds: Long = intervalSeconds.toLong
}

object OmmConfig {

  /** Mode parsing ≙ CancellationSourceType.fromString: unknown value is a
    * startup failure, not a silent default (Type:15–21). */
  def parseMode(s: String): P.Mode = s.trim.toUpperCase match {
    case "NOW" | "FROM_NOW" => P.FromNow
    case "PAST" | "FROM_PAST" => P.FromPast
    case other =>
      throw new IllegalArgumentException(
        s"unknown cancellationsFromTime: '$other' (expected NOW or PAST)")
  }

  def fromEnv(env: Map[String, String] = sys.env): OmmConfig = OmmConfig(
    intervalSeconds = env.get("POLLER_INTERVAL_SECS").map(_.toInt).getOrElse(30),
    timezone = env.getOrElse("OMM_TIMEZONE", "Europe/Helsinki"),
    mode = env.get("CANCELLATIONS_FROM_TIME").map(parseMode).getOrElse(P.FromNow),
    connectionString = env.get("TRANSITDATA_PUBTRANS_CONN_STRING"))
}
