package graft.sources

import org.apache.spark.sql.connector.read.streaming.Offset

/** Streaming offset = last processed block height (SURVEY's framing insight:
  * height is a perfect dense monotone offset, so Spark's offset log replaces
  * the reference's `combinedFlow`/`Checkpoint`/`lastSeen` machinery —
  * `MultiplexFlow.kt:61`, `Checkpoint.kt:6`).
  */
case class HeightOffset(height: Long) extends Offset {
  override def json: String = s"""{"height":$height}"""
}

object HeightOffset {
  private val R = """\{\s*"height"\s*:\s*(-?\d+)\s*\}""".r
  def fromJson(s: String): HeightOffset = s.trim match {
    case R(h) => HeightOffset(h.toLong)
    case _ => throw new IllegalArgumentException(s"bad HeightOffset json: $s")
  }
}
