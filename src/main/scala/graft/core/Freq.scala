package graft.core

/** Tick-frequency parsing.
  *
  * Semantics follow the reference's `Chunker.__init__`
  * (`/root/reference/src/ong_tsdb/chunker.py:32-59`): a frequency string
  * is `<number><unit>` (number optional, defaults to 1); units map to
  * seconds with s=1, m/min/T=60, h=3600 and d/D/c/b=86400 (the
  * deprecated pandas-style aliases `T`, `c`, `b` are kept for input
  * compatibility). Anything else raises `IllegalArgumentException`.
  */
object Freq {
  private val Pattern = """^\s*(\d*)\s*([a-zA-Z]+)\s*$""".r

  /** Multiplier table (chunker.py:41-56). */
  private val UnitSeconds: Map[String, Long] = Map(
    "s" -> 1L, "sec" -> 1L,
    "m" -> 60L, "min" -> 60L, "t" -> 60L,
    "h" -> 3600L,
    "d" -> 86400L, "c" -> 86400L, "b" -> 86400L,
  )

  /** `"15m"` → 900, `"1h"` → 3600, `"1D"` → 86400, `"s"` → 1. */
  def seconds(freq: String): Long = freq match {
    case Pattern(num, unit) =>
      val n = if (num.isEmpty) 1L else num.toLong
      val mult = UnitSeconds.getOrElse(
        unit.toLowerCase,
        throw new IllegalArgumentException(s"Unknown frequency unit '$unit' in '$freq'"))
      require(n > 0, s"Non-positive frequency '$freq'")
      n * mult
    case _ =>
      throw new IllegalArgumentException(s"Cannot parse frequency '$freq'")
  }

  /** Chunk duration: CHUNK_ROWS ticks per chunk (reference
    * `chunker.py:97-104`, CHUNK_ROWS=2^14 at `__init__.py:29`). Our
    * storage partitions by time instead of fixed row counts, but the
    * helper is kept for grid arithmetic parity.
    */
  val ChunkRows: Long = 1L << 14

  def chunkSeconds(freq: String): Long = seconds(freq) * ChunkRows
}
