package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native marker-hit counter for the text-analysis hot path: given a
 * words array and k marker sets, returns the k per-set occurrence
 * counts in ONE pass over the words.
 *
 * The higher-order formulation — k × `size(filter(words, w =>
 * array_contains(markers, w)))` — is interpreted per element (HOFs
 * don't participate in whole-stage codegen) and rebuilds the marker
 * array per lambda call: measured ~20× slower on the 100k-doc ingest
 * probe. This expression codegens to a tight loop with per-set
 * HashSet membership.
 *
 * Null contract: null words array → null; null elements are skipped
 * (split() never produces them).
 */
case class MarkerHits(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_marker_hits"

  @transient private lazy val lookup: Array[java.util.HashSet[UTF8String]] =
    MarkerHits.buildLookup(sets)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = lookup.length
    val counts = new Array[Int](k)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          if (lookup(j).contains(w)) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("markerSets", lookup, "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val counts = ctx.freshName("counts"); val w = ctx.freshName("w")
      s"""
         |int $n = $c.numElements();
         |int $k = $setsRef.length;
         |int[] $counts = new int[$k];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    UTF8String $w = $c.getUTF8String($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      if ($setsRef[$j].contains($w)) $counts[$j]++;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerHits =
    copy(child = newChild)
}

object MarkerHits {
  private[functions] def buildLookup(sets: Seq[Seq[String]]): Array[java.util.HashSet[UTF8String]] =
    sets.map { s =>
      val hs = new java.util.HashSet[UTF8String](s.size * 2)
      s.foreach(m => hs.add(UTF8String.fromString(m)))
      hs
    }.toArray
}

/**
 * Count of code points NOT in an allowed ASCII character set — the
 * native twin of `size(regexp_extract_all(text, "[^<allowed>]", 0))`
 * for single-character classes: every regex match is one code point,
 * so the counts are identical, but the byte loop removes the regex
 * engine + per-match allocation (measured 4.5s → ~0.1s counting
 * punctuation over 100k docs). Any non-ASCII code point counts as a
 * miss (it cannot be in an ASCII allowed set); UTF-8 lead bytes are
 * counted, continuation bytes skipped, so multi-byte characters count
 * once — the same per-code-point semantics as the regex in both Spark
 * and DuckDB.
 */
case class CodePointMissCount(child: Expression, allowed: String)
    extends UnaryExpression with ExpectsInputTypes {

  require(allowed.forall(_ < 128), "allowed set must be ASCII")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_miss_count"

  @transient private lazy val table: Array[Boolean] = CodePointMissCount.buildTable(allowed)

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var count = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0) { if (!table(b)) count += 1 }
      else if ((b & 0xC0) != 0x80) count += 1 // lead byte of a multi-byte char
      i += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("allowedTable", table, "boolean[]")
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes"); val i = ctx.freshName("i")
      val b = ctx.freshName("b"); val count = ctx.freshName("count")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $count = 0;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  byte $b = $bytes[$i];
         |  if ($b >= 0) { if (!$tableRef[$b]) $count++; }
         |  else if (($b & 0xC0) != 0x80) $count++;
         |}
         |${ev.value} = $count;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CodePointMissCount =
    copy(child = newChild)
}

object CodePointMissCount {
  private[functions] def buildTable(allowed: String): Array[Boolean] = {
    val t = new Array[Boolean](128)
    allowed.foreach(c => t(c) = true)
    t
  }
}

/**
 * Word n-grams in one native pass — the twin of the interpreted
 * higher-order chain `transform(sequence(1, cnt), i =>
 * array_join(slice(w, i, n), " "))` (optionally wrapped in
 * `array_distinct`), which evaluates three HOFs per row and dominated
 * the gram-based pipelines (~2.3s per 260k postings).
 *
 * Two semantic knobs mirror the two HOF formulations in use:
 *   - `distinct` — dedup preserving first-occurrence order
 *     (= array_distinct; the shingle form) vs all positional grams
 *     (the bigram/winnow form);
 *   - `padShort` — documents shorter than n words collapse to ONE
 *     gram of all their words (= the greatest(size−n+1, 1) bound) vs
 *     emit NO grams (= the `when(size >= n, ...)` guard).
 */
case class WordNGrams(child: Expression, n: Int,
    distinct: Boolean = true, padShort: Boolean = true)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"n must be >= 1, got $n")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    new GenericArrayData(WordNGrams.build(arr, n, distinct, padShort))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WordNGrams.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.build($c, $n, $distinct, $padShort));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and the generated code: the per-row
   * loop is identical either way, only the call boundary differs.
   * Null elements are skipped within a gram — the same semantics as
   * the array_join(slice(...)) formulation this replaces (split()
   * output has none, but the SQL face accepts arbitrary arrays, and
   * reading a null slot of an UnsafeArrayData is undefined). */
  def build(arr: ArrayData, n: Int, distinct: Boolean, padShort: Boolean): Array[AnyRef] = {
    val m = arr.numElements()
    val cnt = if (padShort) math.max(m - n + 1, 1) else math.max(m - n + 1, 0)
    val out: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String](cnt * 2)
      else new java.util.ArrayList[UTF8String](cnt)
    var i = 0
    while (i < cnt) {
      val end = math.min(i + n, m)
      val parts = new Array[UTF8String](end - i)
      var k = 0
      var j = i
      while (j < end) {
        if (!arr.isNullAt(j)) { parts(k) = arr.getUTF8String(j); k += 1 }
        j += 1
      }
      val trimmed = if (k == parts.length) parts else java.util.Arrays.copyOf(parts, k)
      out.add(UTF8String.concatWs(Space, trimmed: _*))
      i += 1
    }
    out.toArray.asInstanceOf[Array[AnyRef]]
  }
}

/**
 * Winnowing fingerprints in one native map-side pass (r21, guide
 * §2.4: remove shuffles outright): per position i over the POSITIONAL
 * gram array, the min of the last `w` gram hashes, deduped preserving
 * first occurrence. Replaces the posexplode → mdhash →
 * min-over-window(partitionBy doc_id) → distinct pipeline, whose
 * per-document window shuffle and global distinct shuffle carried the
 * corpus-sized gram table twice; the fingerprint set is a per-row
 * function of the gram array, so neither shuffle is fundamental.
 *
 * The hash is EXACTLY [[graft.ops.Dedup.mdhash]] —
 * `conv(substring(md5(g),1,15),16,10)` = the top 60 bits of the MD5
 * digest as a non-negative BIGINT — so the fingerprints (and the
 * DuckDB oracle replay) are bit-identical to the windowed form.
 *
 * Null contract: null gram array → null row (posexplode also emitted
 * nothing). Null gram ELEMENTS are skipped (never produced by
 * [[WordNGrams]], but the SQL face admits them — see build()).
 */
case class WinnowFingerprints(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(w >= 1, s"window must be >= 1, got $w")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(WinnowFingerprints.build(input.asInstanceOf[ArrayData], w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WinnowFingerprints.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.build($c, $w));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(s) as a non-negative long — bit-identical to
   * `conv(substring(md5(s),1,15),16,10) :: long` (15 hex chars = the
   * first 7.5 digest bytes; the big-endian first 8 bytes >>> 4). */
  def hash60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Shared by interpreted eval and generated code. Null gram
   * elements are SKIPPED (treated as absent positions) rather than
   * hashed: [[WordNGrams]] output never contains them, but the SQL
   * face admits any array<string> (containsNull defaults true) and an
   * NPE here would be an opaque executor crash (r22, ADVICE). */
  def build(arr: ArrayData, w: Int): Array[AnyRef] = {
    val m = arr.numElements()
    val h = new Array[Long](m)
    var n = 0
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) { h(n) = hash60(arr.getUTF8String(i)); n += 1 }
      i += 1
    }
    val out = new java.util.LinkedHashSet[AnyRef](n * 2)
    i = 0
    while (i < n) {
      var mn = Long.MaxValue
      var j = math.max(0, i - w + 1)
      while (j <= i) { if (h(j) < mn) mn = h(j); j += 1 }
      out.add(java.lang.Long.valueOf(mn))
      i += 1
    }
    out.toArray.asInstanceOf[Array[AnyRef]]
  }
}

/**
 * Adjacent character pairs of a string in one native pass (r22) — the
 * codegen twin of the interpreted HOF chain
 * `transform(sequence(1, length(w)-1), i -> struct(substring(w, i, 1),
 * substring(w, i+1, 1)))`, which evaluates two interpreted substring
 * lambdas per position and dominated q_x21's map time. Returns
 * array<struct<pa:string, pb:string>> of the n−1 adjacent code-point
 * pairs; strings with fewer than 2 code points yield the EMPTY array
 * (the SQL formulation is only ever applied behind a length >= 2
 * filter, where the two agree).
 *
 * Code points are delimited exactly as Spark's own `substring`
 * ([[UTF8String.numBytesForFirstByte]] boundaries), so the pairs are
 * byte-identical to the HOF form on any input, valid UTF-8 or not.
 *
 * Null contract: null string → null (same as the HOF chain).
 */
case class AdjacentCharPairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pa", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("pb", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_char_pairs"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(AdjacentCharPairs.build(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AdjacentCharPairs.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.build($c));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AdjacentCharPairs =
    copy(child = newChild)
}

object AdjacentCharPairs {
  /** Shared by interpreted eval and generated code: split the byte
   * buffer at code-point boundaries (numBytesForFirstByte — the same
   * walk Spark's substring uses), then emit one 2-field row per
   * adjacent boundary pair. */
  def build(s: UTF8String): Array[AnyRef] = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // boundaries[i] = byte offset of code point i; boundaries[n] = end
    val boundaries = new Array[Int](nBytes + 1)
    var n = 0
    var off = 0
    while (off < nBytes) {
      boundaries(n) = off
      n += 1
      off += UTF8String.numBytesForFirstByte(bytes(off))
    }
    boundaries(n) = nBytes
    if (n < 2) return new Array[AnyRef](0)
    def cp(i: Int): UTF8String =
      UTF8String.fromBytes(bytes, boundaries(i),
        math.min(boundaries(i + 1), nBytes) - boundaries(i))
    val out = new Array[AnyRef](n - 1)
    var i = 0
    var prev = cp(0)
    while (i < n - 1) {
      val next = cp(i + 1)
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](prev, next))
      prev = next
      i += 1
    }
    out
  }
}

/**
 * Sentinel-framed BPE word encoding in one native pass (r22): each
 * code point of the input becomes ` cp ` — the twin of
 * the interpreted HOF `concat_ws("", transform(sequence(1,
 * length(w)), i -> concat(s1, substring(w, i, 1), s2)))` applied once
 * per distinct corpus word by bpeBase. Code points are delimited
 * exactly as Spark's substring (numBytesForFirstByte), so the output
 * is byte-identical to the HOF on any input.
 *
 * Null contract: null → null (same as the HOF chain).
 */
case class SentinelEncode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_sentinel_encode"

  override protected def nullSafeEval(input: Any): Any =
    SentinelEncode.build(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SentinelEncode.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.build($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SentinelEncode =
    copy(child = newChild)
}

object SentinelEncode {
  def build(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    var n = 0
    var off = 0
    while (off < nBytes) { n += 1; off += UTF8String.numBytesForFirstByte(bytes(off)) }
    val out = new Array[Byte](nBytes + 2 * n)
    var o = 0
    off = 0
    while (off < nBytes) {
      val len = math.min(UTF8String.numBytesForFirstByte(bytes(off)), nBytes - off)
      out(o) = 0x01; o += 1
      System.arraycopy(bytes, off, out, o, len); o += len
      out(o) = 0x02; o += 1
      off += len
    }
    // a trailing truncated code point can claim fewer bytes than
    // numBytesForFirstByte promised; the copy above clamps, so out
    // may be over-allocated — trim to what was written
    if (o == out.length) UTF8String.fromBytes(out)
    else UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }
}

/**
 * Adjacent SYMBOL pairs of a sentinel-framed BPE word in one native
 * pass (r22): parses the ` sym ` frames directly and
 * emits array<struct<a:string, b:string>> of adjacent symbol pairs —
 * the twin of the interpreted chain `split(substr(w, 2, len-2),
 * quote(""))` + `transform(sequence(1, size-1), i ->
 * struct(element_at(s, i), element_at(s, i+1)))`, whose regex split
 * and per-position lambdas were the BPE loop's remaining map cost.
 * Words with fewer than 2 symbols yield the EMPTY array (the SQL
 * formulation sat behind a size >= 2 filter; explode drops the row
 * either way).
 *
 * Contract: input must be well-formed sentinel framing — symbols
 * never contain the sentinel bytes (bpeBase filters such words out of
 * training). Produced and consumed only inside the BPE operators.
 *
 * Null contract: null → null.
 */
case class AdjacentSymbolPairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("b", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_symbol_pairs"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(AdjacentSymbolPairs.build(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AdjacentSymbolPairs.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.build($c));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AdjacentSymbolPairs =
    copy(child = newChild)
}

object AdjacentSymbolPairs {
  /** Symbols are the byte runs between a 0x01 opener and its 0x02
   * closer; adjacent pairs are emitted as 2-field rows. */
  def build(s: UTF8String): Array[AnyRef] = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // first pass: count symbols (= number of 0x01 openers)
    var n = 0
    var i = 0
    while (i < nBytes) { if (bytes(i) == 0x01) n += 1; i += 1 }
    if (n < 2) return new Array[AnyRef](0)
    val syms = new Array[UTF8String](n)
    var k = 0
    i = 0
    while (i < nBytes && k < n) {
      if (bytes(i) == 0x01) {
        val start = i + 1
        var end = start
        while (end < nBytes && bytes(end) != 0x02) end += 1
        syms(k) = UTF8String.fromBytes(bytes, start, end - start)
        k += 1
        i = end + 1
      } else i += 1
    }
    val out = new Array[AnyRef](n - 1)
    i = 0
    while (i < n - 1) {
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](syms(i), syms(i + 1)))
      i += 1
    }
    out
  }
}

/** Column-API surface for the native text expressions. */
object Texts {
  /** One-pass per-set marker-occurrence counts over a words array;
   * returns array<int> of length sets.size. */
  def markerHits(words: Column, sets: Seq[Seq[String]]): Column =
    ColumnBridge.column(MarkerHits(ColumnBridge.expression(words), sets))

  /** Count of code points outside the allowed ASCII set — the regex
   * `[^<allowed>]` match count without the regex engine. */
  def missCount(text: Column, allowed: String): Column =
    ColumnBridge.column(CodePointMissCount(ColumnBridge.expression(text), allowed))

  /** Word n-grams of a words array in one native pass; see
   * [[WordNGrams]] for the distinct/padShort semantics. */
  def wordNGrams(words: Column, n: Int,
      distinct: Boolean = true, padShort: Boolean = true): Column =
    ColumnBridge.column(WordNGrams(ColumnBridge.expression(words), n, distinct, padShort))

  /** Winnowing fingerprints of a positional gram array — distinct
   * sliding-window(w) minima of the 60-bit md5 gram hashes, one
   * map-side pass; see [[WinnowFingerprints]]. */
  def winnowFingerprints(grams: Column, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(grams), w))

  /** Adjacent code-point pairs of a string as array<struct<pa, pb>>
   * in one native pass; see [[AdjacentCharPairs]]. */
  def charPairs(text: Column): Column =
    ColumnBridge.column(AdjacentCharPairs(ColumnBridge.expression(text)))

  /** Sentinel-framed BPE encoding of a word (U+0001 cp U+0002 per
   * code point) in one native pass; see [[SentinelEncode]]. */
  def sentinelEncode(text: Column): Column =
    ColumnBridge.column(SentinelEncode(ColumnBridge.expression(text)))

  /** Adjacent symbol pairs of a sentinel-framed BPE word as
   * array<struct<a, b>> in one native pass; see
   * [[AdjacentSymbolPairs]]. */
  def symbolPairs(encoded: Column): Column =
    ColumnBridge.column(AdjacentSymbolPairs(ColumnBridge.expression(encoded)))
}
