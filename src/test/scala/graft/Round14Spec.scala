package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sketches
import graft.operators.RangeJoin
import graft.plans.{BloomContains, BloomOps}

/** Round-14 pins: the integral-input contract on the long-keyed sketch
  * kernels (loud analysis-time rejection of double/string instead of
  * ImplicitCastInputTypes' silent truncation; int32 widened in BOTH
  * execution modes — the r13/r14 advice failure class), and the q103
  * day-grain prefix-sum decomposition's exact equivalence to the
  * pair-materializing range join it replaced.
  */
class Round14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  // --- integral-input contract -------------------------------------------

  test("BloomContains: int32 probe key works in INTERPRETED eval " +
    "(pre-fix this crashed — codegen only passed via Java int→long " +
    "coercion, making behavior execution-mode-dependent)") {
    val bits = new Array[Long](1024 / 64)
    BloomOps.set(bits, 42L, 5, 1024)
    val bitsLit = Literal.create(new GenericArrayData(bits),
      ArrayType(LongType, containsNull = false))
    val hit = BloomContains(bitsLit, Literal(42, IntegerType), 5, 1024)
    val miss = BloomContains(bitsLit, Literal(7, IntegerType), 5, 1024)
    assert(hit.eval(null) == true)
    // probe geometry must see 42 (int) as the same key as 42L (long)
    assert(miss.eval(null) == false)
  }

  test("sketch kernels reject non-integral inputs at ANALYSIS time " +
    "instead of silently truncating through an implicit double→long " +
    "cast") {
    val spark2 = spark
    import spark2.implicits._
    val doubles = Seq(1.5, 2.5).toDF("v")
    val e1 = intercept[AnalysisException] {
      doubles.agg(Sketches.minK(col("v"), 4)).collect()
    }
    assert(e1.getMessage.contains("integral"))
    val e2 = intercept[AnalysisException] {
      doubles.agg(Sketches.kllSketch(col("v"), 16)).collect()
    }
    assert(e2.getMessage.contains("integral"))
    val strings = Seq("7", "x").toDF("v")
    val e3 = intercept[AnalysisException] {
      strings.agg(Sketches.minK(col("v"), 4)).collect()
    }
    assert(e3.getMessage.contains("integral"))
  }

  test("sketch kernels widen int32 input end-to-end (the r13 sf1 " +
    "failure class): minK and kllSketch over an int column equal the " +
    "same over the long cast") {
    val spark2 = spark
    import spark2.implicits._
    val ints = (1 to 100).map(i => (i % 7, i * 3)).toDF("g", "v")
    val viaInt = ints.groupBy("g")
      .agg(Sketches.minK(col("v"), 5).as("mk"),
        Sketches.kllSketch(col("v"), 16).as("kll"))
      .orderBy("g").collect()
    val viaLong = ints.select(col("g"), col("v").cast("long").as("v"))
      .groupBy("g")
      .agg(Sketches.minK(col("v"), 5).as("mk"),
        Sketches.kllSketch(col("v"), 16).as("kll"))
      .orderBy("g").collect()
    assert(viaInt.toSeq == viaLong.toSeq)
  }

  // --- q103 decomposition ≡ pair-materializing range join -----------------

  test("q103 day-grain prefix-sum + inclusion-exclusion equals the " +
    "pair-materializing RangeJoin aggregate exactly (sf0.001)") {
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 48)
      .select(col("l_orderkey"), col("l_shipdate"), col("l_quantity"))
    val ords = graft.sources.Tables.load(spark, dir, "orders")
      .filter(year(col("o_orderdate")) === 1997)
      .select(col("o_orderkey"), col("o_orderdate"),
        date_add(col("o_orderdate"), 13).as("o_window_end"))
    val pairwise = RangeJoin.pointInInterval(li, "l_shipdate",
        ords, "o_orderdate", "o_window_end", binDays = 14)
      .filter(col("l_orderkey") =!= col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy("month")
      .collect()
    val decomposed = SparkEntry.queries("q103_range_join")(spark, dir)
      .collect()
    assert(decomposed.toSeq == pairwise.toSeq)
    assert(decomposed.nonEmpty)
  }
}
