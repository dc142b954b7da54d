package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * SQL registration of the native graft expressions, so plain-SQL users
 * (spark.sql, thrift, notebooks) reach the codegen'd hot-path kernels
 * without the Scala Column API:
 *
 *   - `graft_dot(array<double>, array<double>)` → double — the ANN
 *     scoring kernel (see [[DotProduct]]);
 *   - `graft_minhash(array<long>, k)` → array<long> — the one-pass
 *     k-function MinHash signature (see [[AffineMinHash]]); `k` must be
 *     a literal, constants derive from the shared seeded family so SQL
 *     and Column-API signatures are identical bit-for-bit;
 *   - `graft_marker_hits(array<string>, array('the','a'), ...)` →
 *     array<int> — per-set marker-occurrence counts in one pass (see
 *     [[MarkerHits]]); marker sets must be literal string arrays;
 *   - `graft_miss_count(string, 'A..Za..z0..9 ')` → int — code points
 *     outside a literal allowed ASCII set (see [[CodePointMissCount]]);
 *   - `graft_shingles(array<string>, n)` → array<string> — distinct
 *     word n-grams in one pass (see [[WordNGrams]]; the shingle form:
 *     distinct, short docs collapse to one gram).
 *
 * Two installation faces, same registrations:
 *   - config-time: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
 *     (the standard extension hook — how a cluster deployment installs it);
 *   - runtime: `GraftExtensions.register(spark)` on a live session
 *     (tests, notebooks).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def literalInt(e: Expression, what: String): Int = {
    require(e.foldable && e.dataType == IntegerType,
      s"$what must be an INT literal, got: $e")
    val v = e.eval()
    require(v != null, s"$what must be a non-NULL INT literal")
    v.asInstanceOf[Int]
  }

  private def literalString(e: Expression, what: String): String = {
    require(e.foldable && e.dataType == StringType,
      s"$what must be a STRING literal, got: $e")
    val v = e.eval()
    require(v != null, s"$what must be a non-NULL STRING literal")
    v.asInstanceOf[UTF8String].toString
  }

  /** A literal array-of-strings argument (e.g. array('the','a')). */
  private def literalStringSeq(e: Expression, what: String): Seq[String] = e match {
    case CreateArray(children, _) => children.map(literalString(_, what))
    case lit: Literal if lit.foldable =>
      val v = lit.eval()
      require(v != null, s"$what must be a non-NULL literal array of strings")
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toArray[UTF8String](StringType).map(_.toString).toSeq
    case other => throw new IllegalArgumentException(
      s"$what must be a literal array of strings, got: $other")
  }

  /** The shared seeded affine-coefficient family — the single source of
   * truth used by the Column API, the SQL function, and the DuckDB
   * oracle constants (graft.ops.Dedup delegates here). */
  def affineConstants(numHashes: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(numHashes)((1L + r.nextInt(Int.MaxValue - 1).toLong, r.nextInt(Int.MaxValue).toLong))
  }

  /** MinHash modulus (2^31 − 1, prime) — mirrored by graft.ops.Dedup. */
  val MinhashP = 2147483647L

  private type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_dot takes 2 arguments, got ${children.size}")
        DotProduct(children.head, children(1))
      }),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[AffineMinHash].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_minhash takes 2 arguments, got ${children.size}")
        val k = literalInt(children(1), "graft_minhash numHashes")
        val consts = affineConstants(k)
        AffineMinHash(children.head,
          consts.map(_._1).toArray, consts.map(_._2).toArray, MinhashP)
      }),
    (FunctionIdentifier("graft_marker_hits"),
      new ExpressionInfo(classOf[MarkerHits].getName, "graft_marker_hits"),
      (children: Seq[Expression]) => {
        require(children.size >= 2,
          s"graft_marker_hits takes a words array plus 1+ literal marker arrays")
        MarkerHits(children.head,
          children.tail.map(literalStringSeq(_, "graft_marker_hits marker set")))
      }),
    (FunctionIdentifier("graft_miss_count"),
      new ExpressionInfo(classOf[CodePointMissCount].getName, "graft_miss_count"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_miss_count takes 2 arguments, got ${children.size}")
        CodePointMissCount(children.head,
          literalString(children(1), "graft_miss_count allowed set"))
      }),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordNGrams].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_shingles takes 2 arguments, got ${children.size}")
        WordNGrams(children.head, literalInt(children(1), "graft_shingles n"))
      }))

  /** Install the functions on a live session (the runtime face of the
   * config-time `spark.sql.extensions` hook). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
