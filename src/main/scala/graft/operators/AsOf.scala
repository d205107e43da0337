package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark's DataFrame API lacks.
  *
  * Implemented by composition (preference (a) of the custom-operator
  * ladder): tag both sides, union, and carry the latest right-side values
  * forward with last_value(ignoreNulls) over a (keys, time) window. One
  * sort-shuffle on (keys, time) total — no per-row range probe, no
  * broadcast of either side, no row explosion — the scalable formulation
  * for 100 TB (contrast a range-condition join, which Spark plans as
  * broadcast-nested-loop).
  *
  * Semantics: each left row is matched with the right row having the
  * greatest `rightTime` ≤ `leftTime` within the same keys (inclusive; at
  * equal timestamps the right row applies). Left rows with no prior right
  * row keep nulls — drop or default downstream. Key equality is SQL
  * equality: a NULL in any key column never matches (null-key left rows
  * emit with null values; null-key right rows are ignored) — the same
  * contract as DuckDB ASOF LEFT JOIN.
  */
object AsOf {

  /** @param left        the probe side (events)
    * @param right       the state side (snapshots); its columns other than
    *                    keys/time are carried onto matching left rows
    * @param keys        equality keys
    * @param leftTime    event-time column on `left`
    * @param rightTime   snapshot-time column on `right`
    * @param valueCols   right-side columns to attach
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // SQL-equality null contract: drop null-key snapshots up front; a
    // null-key EVENT then falls in a window partition containing no
    // snapshot rows, so its values fill as null — exactly the unmatched
    // case — without special-casing the left side.
    val rightKeysNonNull = keys.map(col(_).isNotNull)
      .foldLeft(lit(true))(_ && _)
    // snapshots sort BEFORE events at the same instant → inclusive match
    val taggedRight = right.filter(rightKeysNonNull).select(
      (keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__tag")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__tag")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)

    val unioned = taggedRight
      .select((taggedRight.columns.map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).as(s"__l_$c"))): _*)
      .unionByName(taggedLeft.select(
        (taggedLeft.columns.map(col) ++
          valueCols.map(c => lit(null).as(s"__v_$c"))): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__v_$c",
        last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }

    filled.filter(col("__tag") === 1)
      .select(
        (keys.map(col) :+ col("__t").as(leftTime)) ++
          leftCols.filterNot(c => keys.contains(c) || c == leftTime)
            .map(c => col(s"__l_$c").as(c)) ++
          valueCols.map(c => col(s"__v_$c").as(c)): _*)
  }

  /** The same as-of semantics through the dedicated physical operator
    * (graft.plans.AsOfJoinExec — preference (c) of the custom-operator
    * ladder): each side sorts once at its own width and a single forward
    * merge streams the match, instead of union-padding both inputs to the
    * combined width and window-scanning |L|+|R| rows. Output columns:
    * left columns (in order), then `valueCols` (nulls where no snapshot
    * precedes the event).
    *
    * The planner strategy is attached idempotently to the session's
    * experimental strategies, so this works on any SparkSession — no
    * session-build-time extension wiring required.
    */
  def asofJoinExec(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graftops.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy

    val lPlan = ColumnBridge.analyzed(left)
    // Re-alias every right column: both sides may derive from the same
    // source (events → snapshots-of-events), and a binary node must not
    // carry duplicate attribute ids across children.
    val rAnalyzed = ColumnBridge.analyzed(right)
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)
    val rOut = rAliases.map(_.toAttribute)

    def pick(out: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
             name: String) =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))

    val node = graft.plans.AsOfJoin(
      lPlan, rPlan,
      leftKeys = keys.map(pick(lPlan.output, _)),
      rightKeys = keys.map(pick(rOut, _)),
      leftTime = pick(lPlan.output, leftTime),
      rightTime = pick(rOut, rightTime),
      rightValues = valueCols.map(pick(rOut, _)))
    ColumnBridge.ofRows(spark, node)
  }

  /** As-of join with a TOLERANCE (pandas merge_asof semantics): the
    * matched snapshot must be no older than `tolerance` behind the
    * left time — a stale match nulls out, exactly like no match. Pure
    * composition over [[asofJoinExec]]: the merge already emits the
    * matched right time, so staleness is one map-side null-out pass —
    * no second join, no change to the custom exec. `valueCols` must
    * include `rightTime` (the staleness evidence). `tolerance` is a
    * SQL interval body, e.g. "12 HOURS". */
  def asofJoinTolerant(left: DataFrame, right: DataFrame,
                       keys: Seq[String], leftTime: String,
                       rightTime: String, valueCols: Seq[String],
                       tolerance: String): DataFrame = {
    require(valueCols.contains(rightTime),
      s"valueCols must include the right time column '$rightTime' " +
        "so staleness is decidable on the joined row")
    val joined = asofJoinExec(left, right, keys, leftTime, rightTime,
      valueCols)
    // materialize the staleness flag BEFORE nulling anything: the
    // right-time column is itself one of the value columns being
    // cleared, so testing it inside the fold would read the already-
    // nulled value for every column after it
    val flagged = joined.withColumn("_stale",
      col(rightTime) < col(leftTime) - expr(s"INTERVAL $tolerance"))
    valueCols.foldLeft(flagged) { (df, c) =>
      df.withColumn(c, when(col("_stale"), lit(null)).otherwise(col(c)))
    }.drop("_stale")
  }
}
