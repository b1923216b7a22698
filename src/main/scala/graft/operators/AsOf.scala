package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row with
  * `rightTime <= leftTime` for the same key — the temporal-lookup
  * primitive (sensor reading in effect at workout start, price as of
  * trade time) that Spark has no built-in operator for.
  *
  * Implementation is the union-and-carry technique, per the brief's
  * preference order (compose existing ops before custom plans): tag right
  * rows 0 and left rows 1, union, sort within each key partition by
  * (time, tag) — a right row sorts before a left row at the same instant,
  * making the join boundary inclusive — then forward-carry the right
  * payload with last(ignoreNulls) and keep the left rows.
  *
  * Scale: ONE shuffle on the key (the union is shuffle-free), one
  * per-partition sort, no range-explosion: each row is touched once,
  * versus the naive time-window join whose candidate set is
  * |left| × |matching interval|. State per partition is the running
  * payload only.
  */
object AsOf {

  /** @param left      probe side; all its columns survive
    * @param right     lookup side; `payload` columns are carried onto left
    * @param key       equality key present in both
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param payload   right columns to attach (must not clash with left)
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.struct
    val leftCols = left.columns.toSeq
    // the payload travels as ONE struct that is non-null exactly for
    // right rows: last(ignoreNulls) then means "latest right ROW", so a
    // right row whose payload values are legitimately NULL still wins
    // (carrying bare columns would skip it and resurface a stale value)
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(1))
      .select(Seq(col(key), col("_t"), col("_tag")) ++
        leftCols.filterNot(_ == key).map(col) :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          payload.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType)))).as("_pay"): _*)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_tag", lit(0))
      .select(Seq(col(key), col("_t"), col("_tag")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("_pay"): _*)
    // _pay as the final sort key makes ties among equal-timestamp right
    // rows deterministic (struct ordering is total)
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_tag"), col("_pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("_carried", last(col("_pay"), ignoreNulls = true).over(w))
    payload.foldLeft(carried) { (df, c) =>
        df.withColumn(c, col(s"_carried.$c"))
      }
      .filter(col("_tag") === 1)
      .drop("_t", "_tag", "_pay", "_carried")
  }
}
