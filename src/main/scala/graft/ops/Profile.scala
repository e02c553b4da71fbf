package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiler — the schema-quality panel (null rates, exact
  * cardinalities, ranges, means) a pipeline runs before trusting a new
  * drop of data, à la the published data-unit-test frameworks (Deequ,
  * TFDV). One row out per input column.
  *
  * Shape: ONE aggregation over the table computes every column's stats
  * simultaneously (the scan is the cost that matters at 100 TB — never
  * one pass per column); the per-column rows then come from exploding a
  * literal struct array over the single 1-row aggregate, so the unpivot
  * is free. The exact COUNT(DISTINCT) set compiles to one Expand —
  * input rows fan out ×(#distinct-agg columns) before map-side partial
  * aggregation collapses them; that fan-out is the documented price of
  * exactness, and `approx_count_distinct` is the drop-in lever when a
  * 100 TB profile can tolerate ±2%.
  *
  * Determinism contract: means route through exact decimal sums
  * ([[graft.core.Det]]); integral min/max surface as double (exact below
  * 2^53 — fine for every key domain here); timestamps format to a fixed
  * pattern so both engines compare strings, not epoch printers.
  */
object Profile {

  private def kind(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType => "int"
    case DoubleType | FloatType                        => "double"
    case StringType                                    => "string"
    case TimestampType | TimestampNTZType              => "timestamp"
    case DateType                                      => "date"
    case _                                             => "other"
  }

  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggExprs: Seq[Column] = count(lit(1)).as("__n") +: fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        count_distinct(c).as(s"${f.name}__nd"))
      val typed = kind(f.dataType) match {
        case "int" => Seq(
          min(c).cast("double").as(s"${f.name}__min"),
          max(c).cast("double").as(s"${f.name}__max"),
          round(sum(c.cast(DecimalType(24, 0))).cast("double") / count(c), 6)
            .as(s"${f.name}__mean"))
        case "double" => Seq(
          min(c).as(s"${f.name}__min"),
          max(c).as(s"${f.name}__max"),
          round(graft.core.Det.avgDet(c, 4), 6).as(s"${f.name}__mean"))
        case "string" => Seq(
          min(c).as(s"${f.name}__smin"),
          max(c).as(s"${f.name}__smax"))
        case "timestamp" | "date" => Seq(
          date_format(min(c), "yyyy-MM-dd HH:mm:ss").as(s"${f.name}__smin"),
          date_format(max(c), "yyyy-MM-dd HH:mm:ss").as(s"${f.name}__smax"))
        case _ => Seq.empty
      }
      base ++ typed
    }
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)

    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val rows = fields.map { f =>
      val k = kind(f.dataType)
      val numeric = k == "int" || k == "double"
      val stringy = k == "string" || k == "timestamp" || k == "date"
      struct(
        lit(f.name).as("col_name"),
        lit(k).as("dtype"),
        col("__n").as("n_rows"),
        col(s"${f.name}__nulls").as("n_nulls"),
        col(s"${f.name}__nd").as("n_distinct"),
        (if (numeric) col(s"${f.name}__min") else nullD).as("min_num"),
        (if (numeric) col(s"${f.name}__max") else nullD).as("max_num"),
        (if (numeric) col(s"${f.name}__mean") else nullD).as("mean"),
        (if (stringy) col(s"${f.name}__smin") else nullS).as("min_str"),
        (if (stringy) col(s"${f.name}__smax") else nullS).as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
