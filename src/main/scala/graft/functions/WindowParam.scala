package graft.functions

/** The read API's window-string parameter (`?window=1m|5m|15m|1h|1d`) —
  * reference `read-api/main.py:166-175` (SURVEY §2.7 F5): the five
  * accepted strings map to window lengths in seconds; anything else is
  * rejected, exactly like the API's 400 response.
  */
object WindowParam {

  /** Accepted window strings → length in seconds. */
  val Seconds: Map[String, Long] = Map(
    "1m" -> 60L,
    "5m" -> 300L,
    "15m" -> 900L,
    "1h" -> 3600L,
    "1d" -> 86400L
  )

  def seconds(w: String): Long =
    Seconds.getOrElse(
      w,
      throw new IllegalArgumentException(
        s"invalid window '$w' (expected one of ${Seconds.keys.toSeq.sorted.mkString(", ")})"))

  /** The same parameter as a Spark `window()` / INTERVAL duration string. */
  def duration(w: String): String = s"${seconds(w)} seconds"
}
