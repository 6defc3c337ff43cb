package graft.streaming

import java.nio.file.{Files, Paths}

/** S5 startup-mode resolution (`MySQLStreamer.java:164-198,216-255`):
  * `initial` / `earliest` / `latest` / `offset` / `timestamp`, with
  * the reference's override rules — a stored offset or a configured
  * timestamp silently overrides the configured mode, and
  * snapshot-only forces `initial`.
  */
sealed trait StartupMode
object StartupMode {
  case object Initial extends StartupMode
  case object Earliest extends StartupMode
  case object Latest extends StartupMode
  final case class Offset(value: String) extends StartupMode
  final case class Timestamp(epochMillis: Long) extends StartupMode

  def resolve(
      configured: Option[String],
      storedOffset: Option[String],
      timestampMillis: Option[Long],
      snapshotOnly: Boolean): StartupMode = {
    if (snapshotOnly) Initial // `MongoDBStreamer.java:133-137`
    else storedOffset match {
      case Some(off) => Offset(off) // stored offset wins (S6 restore)
      case None => timestampMillis match {
        case Some(ts) => Timestamp(ts)
        case None => configured.map(_.trim.toLowerCase) match {
          case Some("earliest") => Earliest
          case Some("latest") => Latest
          case Some("initial") | None => Initial
          case Some(other) =>
            throw new IllegalArgumentException(s"UNKNOWN STARTUP MODE: $other")
        }
      }
    }
  }
}

/** S7 config loading (`FlinkCDCMulti.java:474-522`): a flat JSON
  * object of string keys; `source.id`, `source.type` and `sink.path`
  * are required. Parsing is deliberately dependency-free (the config
  * grammar is flat key/value).
  */
object JobConfig {

  def parse(json: String): Map[String, String] = {
    // flat {"key": value} object; values are strings/numbers/booleans,
    // or one level of nested object (name maps written as natural JSON
    // rather than an escaped string) — matched WHOLE, so its inner
    // pairs are consumed and cannot pollute the top-level config
    val entry = (""""((?:[^"\\]|\\.)*)"\s*:\s*""" +
      """("(?:[^"\\]|\\.)*"|\{(?:[^{}"]|"(?:[^"\\]|\\.)*")*\}|""" +
      """[-0-9.eE+]+|true|false|null)""").r
    entry.findAllMatchIn(json).map { m =>
      val k = unescape(m.group(1))
      val v = m.group(2) match {
        case s if s.startsWith("\"") =>
          unescape(s.substring(1, s.length - 1))
        case o => o // number/bool/null, or raw object (nameMap parses)
      }
      k -> v
    }.toMap
  }

  /** Single left-to-right pass so each escape is handled exactly once
    * — sequential replace()s would turn `\\n` (literal backslash + n,
    * e.g. a Windows path "C:\\network") into a newline.
    */
  private[graft] def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'u' if i + 6 <= s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append(other); i += 2 // \" \\ \/ and friends
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def load(path: String): Map[String, String] = {
    val cfg = parse(new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))
    val missing = Seq("source.id", "source.type", "sink.path")
      .filterNot(cfg.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"MISSING REQUIRED CONFIG: ${missing.mkString(", ")}")
    // `${secret:NAME}` references → resolved values (the reference's
    // credentials-manager roadmap, `README.md:64` — see Secrets)
    Secrets.resolveDefault(cfg)
  }

  /** Name maps are JSON objects embedded as config values
    * (`table.name.map` / `database.name.map`,
    * `MySQLStreamer.java:385-404`).
    */
  def nameMap(cfg: Map[String, String], key: String): Map[String, String] =
    cfg.get(key).map(parse).getOrElse(Map.empty)
}
