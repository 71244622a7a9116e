package graft.cli

import scala.collection.mutable

/** Minimal HOCON-subset loader for the reference's config-file surface
  * (reference `core/src/main/scala/io/aiven/guardian/kafka/Config.scala:12-13`
  * loads HOCON via PureConfig; `core-backup/src/main/resources/reference.conf:37-49`
  * and `core-restore/.../reference.conf:11-14` define the key shapes this
  * parser must understand). The sandbox classpath has no typesafe-config
  * jar, so this is a from-scratch parser of exactly the subset those
  * files use:
  *
  *   - nested objects: `key { ... }` / `key = { ... }` / dotted paths
  *   - assignments: `key = value` or `key : value`; later wins
  *   - optional env substitution: `key = ${?ENV_NAME}` keeps the prior
  *     value when ENV_NAME is unset (HOCON's "optional override" idiom —
  *     how the reference layers env vars over file defaults)
  *   - single-line lists `[a, "b", c]` (flattened to a,b,c), quoted or
  *     bare strings, numbers, durations kept verbatim
  *   - `#` and `//` comments
  *
  * Output is a flat dotted-key map (`backup.time-configuration.chrono-unit`
  * -> `hours`); nested maps like `restore.override-topics { old = new }`
  * appear as `restore.override-topics.old -> new` and are regrouped by
  * [[subKeys]].
  */
object HoconConfig {

  def parseFile(path: String, env: Map[String, String] = sys.env): Map[String, String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.mkString, env)
    finally src.close()
  }

  def parse(text: String, env: Map[String, String] = sys.env): Map[String, String] = {
    val out = mutable.LinkedHashMap.empty[String, String]
    val stack = mutable.Stack.empty[String]
    val prepared = normalize(text.linesIterator.map(stripComment).mkString("\n"))
    prepared.linesIterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
      if (line == "}") {
        if (stack.isEmpty) fail("unbalanced '}'")
        stack.pop()
      } else if (line.endsWith("{")) {
        // `key {` or `key = {` opens a nested object
        val key = line.dropRight(1).trim.stripSuffix("=").stripSuffix(":").trim
        if (key.isEmpty) fail(s"object with no key: '$line'")
        stack.push(unquote(key))
      } else {
        val (key, raw) = splitAssign(line)
        val path = (stack.toSeq.reverse :+ unquote(key)).mkString(".")
        substitute(raw, env).foreach(v => out(path) = v)
      }
    }
    if (stack.nonEmpty) fail(s"unclosed object '${stack.top}'")
    out.toMap
  }

  /** Keys nested under `prefix.`, with the prefix stripped — e.g. the
    * entries of a `restore.override-topics { old = new }` block. */
  def subKeys(cfg: Map[String, String], prefix: String): Map[String, String] = {
    val p = prefix + "."
    cfg.collect { case (k, v) if k.startsWith(p) => k.drop(p.length) -> v }
  }

  /** HOCON duration (`10 seconds`, `1 hour`, `500 millis`) or bare
    * millisecond count, to milliseconds. */
  def durationMs(s: String): Option[Long] = {
    val t = s.trim
    t.toLongOption.orElse {
      val m = raw"(\d+)\s*([a-zA-Z]+)".r
      t match {
        case m(n, unit) =>
          val factor = unit.toLowerCase match {
            case "ms" | "milli" | "millis" | "millisecond" | "milliseconds" => Some(1L)
            case "s" | "second" | "seconds" => Some(1000L)
            case "m" | "minute" | "minutes" => Some(60000L)
            case "h" | "hour" | "hours" => Some(3600000L)
            case "d" | "day" | "days" => Some(86400000L)
            case _ => None
          }
          factor.map(_ * n.toLong)
        case _ => None
      }
    }
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"config parse error: $msg")

  /** Put every `{`, `}`, and object-level `,` on its own line so inline
    * objects (`compression { type = gzip, level = 6 }`) parse the same
    * as the multi-line form. Quoted strings, list bodies, and `${...}`
    * substitutions pass through untouched.
    */
  private def normalize(text: String): String = {
    val sb = new StringBuilder(text.length + 16)
    var inQ = false; var inSub = false; var listDepth = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '"') { inQ = !inQ; sb += c }
      else if (inQ) sb += c
      else if (inSub) { if (c == '}') inSub = false; sb += c }
      else if (c == '$' && i + 1 < text.length && text.charAt(i + 1) == '{') {
        inSub = true; sb += c
      }
      else if (c == '[') { listDepth += 1; sb += c }
      else if (c == ']') { listDepth = math.max(0, listDepth - 1); sb += c }
      else if (listDepth > 0) sb += c
      else if (c == '{') sb ++= "{\n"
      else if (c == '}') sb ++= "\n}\n"
      else if (c == ',') sb += '\n'
      else sb += c
      i += 1
    }
    sb.result()
  }

  private def splitAssign(line: String): (String, String) = {
    // first unquoted '=' or ':' splits key from value
    var i = 0; var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') inQ = !inQ
      else if (!inQ && (c == '=' || c == ':'))
        return (line.substring(0, i).trim, line.substring(i + 1).trim)
      i += 1
    }
    fail(s"expected 'key = value', got '$line'")
  }

  /** `${?ENV}` -> Some(env value) when set, None (keep previous) when
    * not; `${ENV}` (mandatory) fails when unset; everything else parses
    * as a literal. */
  private def substitute(raw: String, env: Map[String, String]): Option[String] = {
    val opt = raw"\$$\{\?([A-Za-z0-9_]+)\}".r
    val req = raw"\$$\{([A-Za-z0-9_]+)\}".r
    raw match {
      case opt(name) => env.get(name)
      case req(name) =>
        Some(env.getOrElse(name, fail(s"required substitution $${$name} is unset")))
      case _ => Some(literal(raw))
    }
  }

  private def literal(raw: String): String =
    if (raw.startsWith("[") && raw.endsWith("]")) {
      val body = raw.substring(1, raw.length - 1).trim
      if (body.isEmpty) ""
      else {
        val elems = splitTopLevel(body).map(s => unquote(s.trim))
        // lists flatten to a comma-joined string that consumers
        // (topicsOf) re-split on ',' — a quoted element containing a
        // comma (["a,b"]) would silently become two elements there, so
        // reject it at parse time instead of corrupting it later
        elems.find(_.contains(",")).foreach(e =>
          fail(s"list element '$e' contains ',' — comma-separated values inside " +
            "a quoted list element are not representable; use separate elements"))
        elems.mkString(",")
      }
    } else unquote(raw)

  private def splitTopLevel(s: String): Seq[String] = {
    val parts = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    s.foreach { c =>
      if (c == '"') { inQ = !inQ; cur += c }
      else if (c == ',' && !inQ) { parts += cur.result(); cur.clear() }
      else cur += c
    }
    parts += cur.result()
    parts.result()
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && s.startsWith("\"") && s.endsWith("\""))
      s.substring(1, s.length - 1)
    else s

  private def stripComment(line: String): String = {
    var i = 0; var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') inQ = !inQ
      else if (!inQ && (c == '#' || (c == '/' && i + 1 < line.length && line.charAt(i + 1) == '/')))
        return line.substring(0, i)
      i += 1
    }
    line
  }
}
