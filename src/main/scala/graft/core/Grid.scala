package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Fixed-grid timestamp arithmetic.
  *
  * The reference stores no per-row timestamps: a write at time `ts` lands
  * in row `getpos(ts) = int((ts - chunk_start)/tick)` of the chunk whose
  * start is `floor(ts/chunk_dur)*chunk_dur`
  * (`/root/reference/src/ong_tsdb/chunker.py:74-95`), i.e. every
  * timestamp is snapped DOWN to the tick grid; reads reconstruct
  * `ts = (pos-1)*tick + chunk_start` (`database.py:754-755`).
  *
  * Spark-side we keep an explicit timestamp column and express the snap
  * as a pure integer Column expression (`ts - ts % tick`) so it stays
  * inside whole-stage codegen and — being deterministic and foldable —
  * cooperates with partition pruning on derived chunk columns.
  */
object Grid {

  /** Epoch seconds of a timestamp column (works for TIMESTAMP and
    * TIMESTAMP_NTZ inputs; NTZ is interpreted in the session time zone,
    * which this engine pins to UTC). Truncates toward negative infinity
    * (Spark's timestamp→long cast), matching `floor(epoch(ts))`.
    */
  def tsSeconds(c: Column): Column = c.cast(TimestampType).cast(LongType)

  /** Snap an epoch-seconds column down to a `tick`-second grid. */
  def snapSeconds(sec: Column, tick: Long): Column =
    (sec - pmod(sec, lit(tick))).cast(LongType)

  /** Snap a timestamp column to the grid, returning epoch seconds. */
  def snap(ts: Column, tick: Long): Column = snapSeconds(tsSeconds(ts), tick)

  /** Chunk start for a snapped-seconds column (chunker.py:74-76). */
  def chunkStart(sec: Column, chunkDur: Long): Column = snapSeconds(sec, chunkDur)

  /** Row index inside a chunk: `getpos` (chunker.py:88-95). */
  def posInChunk(sec: Column, chunkDur: Long, tick: Long): Column =
    ((sec - chunkStart(sec, chunkDur)) / lit(tick)).cast(LongType)
}
