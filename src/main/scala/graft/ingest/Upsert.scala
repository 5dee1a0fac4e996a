package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cell-level merge of a new wide batch into existing wide data
  * (reference A-5, `database.py:425-488`).
  *
  * The reference's write is a read-modify-write of the whole chunk where
  * ONLY non-NaN incoming cells overwrite (`mask = ~isnan(np_values);
  * value_write[pos][mask] = np_values[mask]`, `database.py:480-483`) —
  * a per-cell upsert on the tick grid. On Spark that is a full-outer
  * join on the grid key with per-column `coalesce(new, old)`; incoming
  * NaN is additionally masked to behave like "absent" (the float32 world
  * of the reference has no null, only NaN).
  *
  * Scale note: both sides shuffle on the grid key once; with the target
  * layout (storage bucketed by sensor, partitioned by chunk date) the
  * existing side is partition-pruned to only the chunks the batch
  * touches, so the join is proportional to the batch, not the table.
  */
object Upsert {

  /** NaN → null so that coalesce treats NaN as "no write". */
  private def denan(c: org.apache.spark.sql.Column) =
    when(isnan(c), lit(null)).otherwise(c)

  def merge(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
            metrics: Seq[String]): DataFrame = {
    // prefix-rename both sides' metric columns so the full-outer join is
    // unambiguous even when the two frames share lineage (self-merge)
    import graft.core.Cols.q
    val e = existing.select(
      keys.map(col) ++ metrics.map(m => q(m).as(s"__old_$m")): _*)
    val n = incoming.select(
      keys.map(col) ++ metrics.map(m => q(m).as(s"__new_$m")): _*)
    val joined = e.join(n, keys, "full_outer")
    val merged = metrics.map { m =>
      coalesce(denan(q(s"__new_$m")), q(s"__old_$m")).as(m)
    }
    joined.select(keys.map(col) ++ merged: _*)
  }
}
