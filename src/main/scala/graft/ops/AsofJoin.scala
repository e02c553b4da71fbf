package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join: for each left row, attach the right row whose ordering key is
  * nearest (direction = backward | forward | nearest), optionally within a
  * tolerance, matching on equi partition keys.
  *
  * Capability of the reference's `pd.merge_asof(..., direction='nearest')`
  * (physioview.py:288-303) and the ±tolerance variant
  * (physioview.py:1748-1758) — re-expressed Spark-first: both sides are
  * union-tagged into one stream, a single `(keys, t)` sort-window pass
  * carries the last-right-at-or-before and first-right-at-or-after payloads
  * to every left row, and the nearer one wins. One shuffle on the partition
  * keys, no range-join explosion, linear in n; the window's exchange is
  * reusable by surrounding per-key operators.
  *
  * Tie-break on equal distance: the BACKWARD (earlier) right row wins.
  * Exact matches are allowed (backward includes t_right == t_left).
  *
  * At 100 TB: both inputs shuffle once by `keys`; within a key the window
  * runs sorted and streaming. Skewed keys can be range-bucketed upstream by
  * time with a halo equal to the tolerance.
  */
object AsofJoin {

  /** @param left      probe side
    * @param right     quote side
    * @param keys      equi partition keys present on both sides
    * @param leftT     ordering column on left (numeric, e.g. epoch micros)
    * @param rightT    ordering column on right
    * @param rightCols right columns to carry, as (rightName, outputAlias)
    * @param tolerance max |t_left - t_right| to accept (None = unbounded)
    * @param direction "nearest" | "backward" | "forward"
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftT: String,
      rightT: String,
      rightCols: Seq[(String, String)],
      tolerance: Option[Long] = None,
      direction: String = "nearest"): DataFrame = {
    val (withBoth, leftCols) = bothDirections(left, right, keys, leftT, rightT, rightCols)

    val bd = abs(col("__t") - col("__bt"))
    val fd = abs(col("__ft") - col("__t"))
    val inTolB = tolerance.map(t => bd <= t).getOrElse(lit(true)) && col("__bt").isNotNull
    val inTolF = tolerance.map(t => fd <= t).getOrElse(lit(true)) && col("__ft").isNotNull

    val (chosenT, chosenV) = direction match {
      case "backward" => (when(inTolB, col("__bt")), when(inTolB, col("__bv")))
      case "forward"  => (when(inTolF, col("__ft")), when(inTolF, col("__fv")))
      case _ => // nearest; ties -> backward
        val pickBack = inTolB && (!inTolF || bd <= fd)
        val pickFwd = inTolF && !pickBack
        (when(pickBack, col("__bt")).when(pickFwd, col("__ft")),
          when(pickBack, col("__bv")).when(pickFwd, col("__fv")))
    }

    val out = withBoth.withColumn("__mt", chosenT).withColumn("__mv", chosenV)
    val projected = leftCols.map(col) ++
      Seq(col("__mt").as(s"${rightT}_matched")) ++
      rightCols.map { case (c, alias) => col(s"__mv.$c").as(alias) }
    out.select(projected: _*)
  }

  /** BOTH directions in the same single union+window pass: each left row
    * gets the last right row at-or-before (`<rightT>_backward`, `backCols`
    * aliases) and the first at-or-after (`<rightT>_forward`, `fwdCols`).
    * Interpolation-style consumers need both brackets — two directed
    * as-of calls would sort the keyed stream twice for no reason. */
  def joinBoth(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftT: String,
      rightT: String,
      backCols: Seq[(String, String)],
      fwdCols: Seq[(String, String)]): DataFrame = {
    val rightCols = (backCols.map(_._1) ++ fwdCols.map(_._1)).distinct.map(c => c -> c)
    val (withBoth, leftCols) = bothDirections(left, right, keys, leftT, rightT, rightCols)
    val projected = leftCols.map(col) ++
      Seq(col("__bt").as(s"${rightT}_backward")) ++
      backCols.map { case (c, alias) => col(s"__bv.$c").as(alias) } ++
      Seq(col("__ft").as(s"${rightT}_forward")) ++
      fwdCols.map { case (c, alias) => col(s"__fv.$c").as(alias) }
    withBoth.select(projected: _*)
  }

  /** Union-tagged single-pass core: returns the left rows with backward
    * (`__bt`/`__bv`) and forward (`__ft`/`__fv`) matches attached. */
  private def bothDirections(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftT: String,
      rightT: String,
      rightCols: Seq[(String, String)]): (DataFrame, Seq[String]) = {

    val leftCols = left.columns.toSeq
    val payloadType = StructType(rightCols.map { case (c, _) =>
      StructField(c, right.schema(c).dataType, nullable = true)
    })

    val taggedLeft = left
      .withColumn("__t", col(leftT).cast("long"))
      .withColumn("__side", lit(1))
      .withColumn("__rt", lit(null).cast("long"))
      .withColumn("__rv", lit(null).cast(payloadType))
      .select((keys.map(col) ++ Seq(col("__t"), col("__side"), col("__rt"), col("__rv")) ++
        leftCols.filterNot(keys.contains).map(col)): _*)

    val taggedRight = right
      .withColumn("__t", col(rightT).cast("long"))
      .withColumn("__side", lit(0))
      .withColumn("__rt", col("__t"))
      .withColumn("__rv", struct(rightCols.map { case (c, _) => col(c).as(c) }: _*))
      .select((keys.map(col) ++ Seq(col("__t"), col("__side"), col("__rt"), col("__rv")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val unioned = taggedLeft.unionByName(taggedRight)

    // Exact matches must be visible in BOTH directions, so the two frames
    // use opposite side-orderings: backward sorts right rows (__side=0)
    // before left rows at equal __t (the right row lands inside
    // unboundedPreceding..current), forward sorts them after (inside
    // current..unboundedFollowing).
    // __rv as final tie-break: among right rows sharing a timestamp, both
    // directions deterministically surface the MAX payload struct (without
    // it, last()/first() depend on physical row order — nondeterministic
    // run-to-run on duplicate-timestamp quote data).
    val wBack = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side").desc, col("__rv").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val withBoth = unioned
      .withColumn("__bt", last(col("__rt"), ignoreNulls = true).over(wBack))
      .withColumn("__bv", last(col("__rv"), ignoreNulls = true).over(wBack))
      .withColumn("__ft", first(col("__rt"), ignoreNulls = true).over(wFwd))
      .withColumn("__fv", first(col("__rv"), ignoreNulls = true).over(wFwd))
      .filter(col("__side") === 1)

    (withBoth, leftCols)
  }
}
