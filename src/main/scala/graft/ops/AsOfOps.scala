package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for every left row, the payload of the LATEST right
  * row with `rightTime <= leftTime` within the same key — the
  * canonical quant-store operator (latest fundamental / quote known
  * at event time). Spark has no native as-of join; the scalable
  * composition is the union-window idiom:
  *
  *   unionByName(left, right) → one hash shuffle on the key →
  *   per-key sort by (time, side) → `last(payload, ignoreNulls)`
  *   running window → keep left rows.
  *
  * ONE exchange total, no range-join row explosion, no per-key
  * driver loops — the same plan at 100 TB (both inputs shuffle
  * exactly once, on the key). Ties (`rightTime == leftTime`) resolve
  * to the right row being visible, matching DuckDB/pandas
  * `ASOF JOIN ... ON l.t >= r.t` semantics. Left rows with no
  * earlier right row keep null payloads (LEFT OUTER semantics).
  */
object AsOfOps {

  /** @param keys      equality key columns present on both sides
    * @param leftTime  left ordering column
    * @param rightTime right ordering column (same type as leftTime)
    * @param payload   right-side columns to carry; must not collide
    *                  with left column names (rename beforehand)
    *
    * The payload travels as ONE struct so `last(ignoreNulls)` picks a
    * whole right ROW — per-column fills would mix values from
    * different right rows whenever the latest row has a null in one
    * payload column, deviating from DuckDB/pandas row-level ASOF
    * semantics. Duplicate right timestamps within a key are
    * disambiguated deterministically: the struct itself is the final
    * sort key, so the field-wise-largest same-time row wins. */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val l = left.withColumn("_t", col(leftTime)).withColumn("_side", lit(1))
    val r = right.select((keys.map(col) :+ col(rightTime).as("_t")) :+
        struct(payload.map(col): _*).as("_p"): _*)
      .withColumn("_side", lit(0))
    // the left side has no `_p` column → unionByName fills it with a
    // null struct, which last(ignoreNulls) skips
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right (side 0) sorts before left (side 1) at equal times, so a
    // same-time right row is visible to the left row; `_p` breaks
    // ties among same-time right rows
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
    filled.filter(col("_side") === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col("_p").getField(p).as(p)): _*)
  }
}
