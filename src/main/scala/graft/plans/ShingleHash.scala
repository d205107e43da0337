package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle→hash kernels. The composable formulation
  * (split → transform(sequence…slice…concat_ws) → array_distinct →
  * transform(md5…conv)) is correct but every higher-order function is
  * interpreted (no whole-stage codegen for lambda functions), costing
  * ~1 ms/doc. These expressions do the whole pipeline in one tight loop
  * per document — same values bit-for-bit (md5 of the space-joined word
  * n-gram, first 15 hex chars as a long), so the DuckDB oracles are
  * unchanged.
  */
object ShingleHashKernel {

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** md5(s) → first 15 hex chars as unsigned long (= conv(substr(md5,1,15),
    * 16,10): 7 full bytes + the high nibble of byte 8). */
  def md5Prefix60(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** Distinct md5-prefix hashes of all word n-gram shingles of `text`
    * (whitespace tokenization; empty when fewer than n tokens). */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val tokens = text.trim.split("\\s+")
    if (tokens.length < n || (tokens.length == 1 && tokens(0).isEmpty))
      return Array.emptyLongArray
    val seen = new java.util.LinkedHashSet[Long]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    val last = tokens.length - n
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      seen.add(md5Prefix60(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    // Sorted output: set semantics are unchanged (downstream consumers use
    // counts/minima), and sortedness lets pair-verification intersect two
    // docs with one O(n+m) merge scan instead of a per-pair hash set.
    java.util.Arrays.sort(out)
    out
  }

  /** All adjacent word n-grams of lower(trim(text)), space-joined, IN
    * ORDER and WITH duplicates (the multiset the LM/PMI counters need —
    * contrast shingleHashes' distinct set). Mirrors the composable
    * filter(split(lower(trim(s)),'\s+')) → zip-with-tail formulation
    * value-for-value; one tight loop instead of four interpreted HOFs. */
  def wordNgrams(text: UTF8String, n: Int): Array[UTF8String] = {
    val s = text.trim().toLowerCase.toString
    // UTF8String.trim strips only 0x20, so text leading with \t/\n yields
    // a leading "" from split — drop empties to match the HOF/oracle
    // formulation filter(split(lower(trim(s)), '\s+'), len > 0)
    val tokens = s.split("\\s+").filter(_.nonEmpty)
    if (tokens.length < n) return Array.empty[UTF8String]
    val out = new Array[UTF8String](tokens.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    out
  }

  /** |a ∩ b| of two ascending-sorted long arrays via a single merge scan. */
  def sortedIntersectCount(
      a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  /** Full text→signature kernel (codegen entry point). */
  def minhashForText(text: String, n: Int, k: Int): Array[Long] = {
    val hashes = shingleHashes(text, n)
    if (hashes.isEmpty) Array.emptyLongArray else minhash(hashes, k)
  }

  /** MinHash signature over the base hashes: element s = min over hashes
    * of (h xor s·2654435769). */
  def minhash(hashes: Array[Long], numHashes: Int): Array[Long] = {
    val sig = new Array[Long](numHashes)
    var s = 0
    while (s < numHashes) {
      val mix = s.toLong * 2654435769L
      var m = Long.MaxValue
      var i = 0
      while (i < hashes.length) {
        val v = hashes(i) ^ mix
        if (v < m) m = v
        i += 1
      }
      sig(s) = m
      s += 1
    }
    sig
  }
}

/** long: the portable 60-bit md5-prefix hash of a string — the native
  * form of conv(substring(md5(s),1,15),16,10). One thread-local digest,
  * no hex-string round trip: the composable Column formulation allocates
  * a MessageDigest per row inside Spark's Md5, renders 32 hex chars, and
  * re-parses 15 of them in conv; this goes bytes → 60-bit long directly.
  * Same values bit-for-bit, so every DuckDB oracle using the
  * ('0x'||substr(md5(s),1,15))::BIGINT family is unchanged. */
case class Md5Prefix60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"
  override def nullSafeEval(input: Any): Any =
    ShingleHashKernel.md5Prefix60(
      input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShingleHashKernel.md5Prefix60($c.getBytes());")
  override protected def withNewChildInternal(c: Expression): Md5Prefix60 =
    copy(child = c)
}

/** array<string>: ordered, duplicate-preserving adjacent word n-grams of
  * lower(trim(text)) — the explode feed for bigram counting (LM score,
  * PMI). */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHashKernel.wordNgrams(
      input.asInstanceOf[UTF8String], n)
      .asInstanceOf[Array[Any]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.plans.ShingleHashKernel.wordNgrams($c, $n));
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): WordNgrams =
    copy(child = c)
}

/** array<long>: distinct md5-prefix hashes of the word n-gram shingles.
  * Codegen emits a static call into the kernel — the expression lives
  * inside whole-stage codegen with no interpreted-eval boundary. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHashKernel.shingleHashes(
      input.asInstanceOf[UTF8String].toString, n))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.ShingleHashKernel.shingleHashes($c.toString(), $n));
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

/** int: |a ∩ b| of two ascending-sorted array<long> columns (as produced
  * by ShingleHashes) — one merge scan per pair, no per-pair hash set. The
  * workhorse of pair-verification joins, where array_intersect's
  * build-a-set-per-call cost dominates. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    // analysis-time type enforcement: non-array arguments are an analysis
    // error, not a runtime ClassCastException; ascending-sortedness of the
    // inputs remains a documented contract (ShingleHashes guarantees it)
    with org.apache.spark.sql.graftops.LongArrayPairInputTypes {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_intersect_count"
  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleHashKernel.sortedIntersectCount(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.ShingleHashKernel.sortedIntersectCount($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** array<long>: k-element MinHash signature of the n-gram shingle set;
  * docs with fewer than n tokens yield an empty signature array. */
case class ShingleMinHash(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_minhash"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHashKernel.minhashForText(
      input.asInstanceOf[UTF8String].toString, n, k))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.ShingleHashKernel.minhashForText($c.toString(), $n, $k));
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): ShingleMinHash =
    copy(child = c)
}
