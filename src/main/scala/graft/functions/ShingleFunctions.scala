package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document shingle/sketch kernels as native codegen'd expressions.
  *
  * The relational shingle pipeline (posexplode tokens -> window `lead`
  * per id -> hash -> groupBy(id) collect_set / signature aggregate) pays
  * two full token-level exchanges before the first join: every token
  * occurrence is shuffled and sorted for the lead window, and every
  * distinct shingle is shuffled again for the per-doc set/signature
  * aggregation. At corpus scale those exchanges carry ~the corpus.
  *
  * These expressions compute the same values per ROW inside whole-stage
  * codegen — shingle keys, MinHash signatures, and SimHash are all
  * functions of one document's token array, so no exchange is needed at
  * all: the scan stage emits finished sketches. Hash identities are
  * bit-exact with the relational formulation (`ShingleParitySpec` pins
  * both families against the legacy window pipeline):
  *
  *  - default family: `th = xxhash64(token)`, `key = xxhash64(th_0..th_{n-1})`
  *    (Spark's XXH64 with seed 42, chained over children);
  *  - portable family: `th = conv(substring(md5(token),1,15),16,10)`,
  *    `key` likewise over the comma-joined decimal token hashes — the
  *    cross-engine contract [[graft.operators.Dedup.portableTokenHash]]
  *    documents.
  *
  * Null token elements cannot occur (`TextFunctions.tokens` is
  * `split(text, " ")`, which never emits null elements); defensively,
  * the default family hashes a null element exactly as SQL `xxhash64`
  * would (null-skip: the token hash is the seed), and the portable
  * family hashes it as the empty string (SQL `md5(NULL)` is null, which
  * `concat_ws` would drop — a convention no engine should rely on).
  */
object ShingleHashKernel {

  private val Seed = 42L

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of the digest as a long — exactly
    * `conv(substring(hex, 1, 15), 16, 10)` for a lowercase md5 string:
    * 60 bits, always non-negative.
    */
  private def head60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  def portableTokenHash(t: UTF8String): Long =
    head60(md5Local.get().digest(if (t == null) Array.emptyByteArray else t.getBytes))

  /** Null mirrors the SQL hash convention (`xxhash64(NULL)` null-skips,
    * leaving the running hash at the seed), so keys over explicit
    * null-bearing arrays agree with [[xx64KeysFromHashes]] fed by
    * `xxhash64(token)` columns. Unreachable from `TextFunctions.tokens`
    * (split never emits null elements).
    */
  def xx64TokenHash(t: UTF8String): Long =
    if (t == null) Seed else XXH64.hashUTF8String(t, Seed)

  /** All n-gram shingle keys of a token array in document order —
    * the default (xxhash64) family. Empty output when fewer than n
    * tokens.
    */
  def xx64Keys(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val th = new Array[Long](len)
    var i = 0
    while (i < len) { th(i) = xx64TokenHash(tokens.getUTF8String(i)); i += 1 }
    val out = new Array[Long](len - n + 1)
    i = 0
    while (i <= len - n) {
      var h = Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** [[xx64Keys]] starting from PRE-HASHED tokens (the
    * `Decontamination.tokenHashes` contract): the same n-long chain, so
    * keys are identical to hashing the raw tokens first. Null elements
    * mirror the SQL `xxhash64` null-skip (running hash unchanged).
    */
  def xx64KeysFromHashes(th: ArrayData, n: Int): ArrayData = {
    val len = th.numElements()
    if (len < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i <= len - n) {
      var h = Seed
      var j = 0
      while (j < n) {
        if (!th.isNullAt(i + j)) h = XXH64.hashLong(th.getLong(i + j), h)
        j += 1
      }
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** The portable (md5-derived) family of [[xx64Keys]]. */
  def portableKeys(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val md = md5Local.get()
    val th = new Array[Long](len)
    var i = 0
    while (i < len) { th(i) = portableTokenHash(tokens.getUTF8String(i)); i += 1 }
    val out = new Array[Long](len - n + 1)
    val sb = new java.lang.StringBuilder(n * 20)
    i = 0
    while (i <= len - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(',')
        sb.append(th(i + j))
        j += 1
      }
      out(i) = head60(md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** k-permutation MinHash signature of a shingle-key array: for each i,
    * min over keys of `pmod(pmod(key, p) * a_i + b_i, p)`. Identical to
    * the k-`min`-aggregates formulation (min is insensitive to duplicate
    * keys). `as`/`bs` must satisfy (p-1)*max(a)+max(b) < 2^63 so the
    * product can't overflow — [[minhashSig]]'s builder asserts it for
    * the two published coefficient families.
    */
  def minhashSignature(
      keys: ArrayData, as: Array[Long], bs: Array[Long], p: Long): ArrayData = {
    val k = as.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val m = keys.numElements()
    var e = 0
    while (e < m) {
      val h = {
        val r = keys.getLong(e) % p
        if (r < 0) r + p else r
      }
      var i = 0
      while (i < k) {
        val v = (h * as(i) + bs(i)) % p // h*a < 2^63 by the builder's bound
        if (v < out(i)) out(i) = v
        i += 1
      }
      e += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Content-defined chunk hashes of one token array in a single pass —
    * the per-row kernel behind [[graft.operators.Dedup.cdcChunkPairs]].
    * A chunk is a maximal run of non-empty tokens ending at a boundary
    * token (`portableTokenHash(tok) % boundaryMod == 0` — the boundary
    * falls AFTER that token) or at end-of-document; chunks shorter than
    * `minChunkTokens` drop at birth. The chunk hash is the portable
    * md5-head60 of the space-joined body — bit-identical to
    * `conv(substring(md5(array_join(toks, ' ')), 1, 15), 16, 10)`, so
    * the DuckDB twin and the relational formulation agree. Output may
    * contain within-document duplicates (a repeated chunk); the caller
    * dedups after the explode. Null/empty token elements are skipped
    * (the relational form filters `tok != ''` before chunking).
    *
    * The relational formulation (posexplode -> per-id running-sum
    * window -> groupBy(id, chunk) collect_list) shuffles and sorts
    * every token occurrence TWICE before the first chunk hash exists;
    * this kernel emits finished chunk hashes from the scan stage.
    */
  def cdcChunkKeys(
      tokens: ArrayData, boundaryMod: Int, minChunkTokens: Int): ArrayData = {
    val len = tokens.numElements()
    val md = md5Local.get()
    var out = new Array[Long](16)
    var nOut = 0
    // token byte slices of the open chunk, digested only at close:
    // portableTokenHash shares the ThreadLocal digest, and digest()
    // resets it — an incremental update would be wiped by the
    // boundary test.
    val chunk = new scala.collection.mutable.ArrayBuffer[Array[Byte]](32)
    def close(): Unit = {
      if (chunk.length >= minChunkTokens) {
        var j = 0
        while (j < chunk.length) {
          if (j > 0) md.update(0x20.toByte)
          md.update(chunk(j))
          j += 1
        }
        if (nOut == out.length) out = java.util.Arrays.copyOf(out, nOut * 2)
        out(nOut) = head60(md.digest())
        nOut += 1
      }
      chunk.clear()
    }
    var i = 0
    while (i < len) {
      val t = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      if (t != null && t.numBytes() > 0) {
        chunk += t.getBytes
        if (portableTokenHash(t) % boundaryMod == 0) close()
      }
      i += 1
    }
    close()
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, nOut))
  }

  /** 64-bit SimHash over a token array: per-bit sign sums of the token
    * hashes (weighted by occurrence count, which iterating occurrences
    * does implicitly), reassembled into a long. Bit-identical to the
    * explode + two-aggregate relational form.
    */
  def simhash64(tokens: ArrayData, portable: Boolean): Long = {
    val len = tokens.numElements()
    val sums = new Array[Int](64)
    var i = 0
    while (i < len) {
      val t = tokens.getUTF8String(i)
      val h = if (portable) portableTokenHash(t) else xx64TokenHash(t)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < 64) { if (sums(j) > 0) sh |= (1L << j); j += 1 }
    sh
  }
}

/** Gopher-repetition counters of one token array in a single pass:
  * (top-bigram count, bigram total, duplicated-trigram instance count,
  * trigram total). Gram identity is a 64-bit hash chain over the token
  * hashes — only within-document equality matters, so the hash family
  * is internal. Input must have >= 3 tokens (the operator filters).
  */
object GramRepetitionKernel {
  def counts(tokens: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val len = tokens.numElements()
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      th(i) = ShingleHashKernel.xx64TokenHash(tokens.getUTF8String(i)); i += 1
    }
    def tally(k: Int): (Long, Long, Long) = {
      // multiplicity map for this gram order; (max, total, dup-instances)
      val m = new scala.collection.mutable.LongMap[Int](math.max(8, len))
      var j = 0
      while (j <= len - k) {
        var h = XXH64.hashLong(k.toLong, 42L)
        var q = 0
        while (q < k) { h = XXH64.hashLong(th(j + q), h); q += 1 }
        m.update(h, m.getOrElse(h, 0) + 1)
        j += 1
      }
      var top = 0L; var tot = 0L; var dup = 0L
      m.foreachValue { c =>
        if (c > top) top = c
        tot += c
        if (c > 1) dup += c
      }
      (top, tot, dup)
    }
    val (top2, n2, _) = tally(2)
    val (_, n3, dup3) = tally(3)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](top2, n2, dup3, n3))
  }
}

/** Per-row Gopher repetition counters; see [[GramRepetitionKernel]]. */
case class GramRepetitionExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("top_bigram", LongType, nullable = false),
    StructField("n_bigram", LongType, nullable = false),
    StructField("dup_trigram", LongType, nullable = false),
    StructField("n_trigram", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_repetition"

  override def nullSafeEval(input: Any): Any =
    GramRepetitionKernel.counts(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.GramRepetitionKernel.counts($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<long>` of all n-gram shingle keys of a token array — one fused
  * per-row loop in whole-stage codegen; see [[ShingleHashKernel]].
  */
case class ShingleKeysExpr(child: Expression, n: Int, portable: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_keys"

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    if (portable) ShingleHashKernel.portableKeys(tokens, n)
    else ShingleHashKernel.xx64Keys(tokens, n)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (portable) "portableKeys" else "xx64Keys"
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.ShingleHashKernel.$fn($t, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<long>` of all n-gram shingle keys from an array of PRE-HASHED
  * tokens (`array<long>`, the [[graft.operators.Decontamination.tokenHashes]]
  * contract) — the default xx64 family's chain over n longs, identical
  * keys to [[ShingleKeysExpr]] given the same token hashes. Used by the
  * streaming contamination gate, whose input is the bound token-hash
  * column rather than raw tokens.
  */
case class ShingleKeysFromHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_keys_from_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashKernel.xx64KeysFromHashes(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.ShingleHashKernel.xx64KeysFromHashes($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<long>` MinHash signature (k permutation minima) of a
  * shingle-key array; see [[ShingleHashKernel.minhashSignature]].
  */
case class MinHashSigExpr(
    child: Expression, as: Array[Long], bs: Array[Long], p: Long)
    extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty, "need k >= 1 coefficients")
  require(as.forall(_ >= 1) && bs.forall(_ >= 0),
    "permutation coefficients must have a >= 1, b >= 0")
  // Overflow-freedom is verified per INSTANTIATED family, not assumed:
  // a seed whose draw includes a near-2^31 `a` against the 2^32-sized
  // default prime would wrap h*a+b — the SQL formulation would raise
  // ARITHMETIC_OVERFLOW under ANSI mode at runtime; this fails at
  // construction with a labeled error instead (~2e-7 of seeds).
  require(as.forall(a => (p - 1) <= (Long.MaxValue - bs.max) / a),
    s"permutation family overflows: (p-1)*a+b must stay below 2^63 (p=$p) " +
      "— pick another seed or the portable family")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    ShingleHashKernel.minhashSignature(input.asInstanceOf[ArrayData], as, bs, p)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, keys =>
      s"${ev.value} = graft.functions.ShingleHashKernel.minhashSignature(" +
        s"$keys, $asRef, $bsRef, ${p}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<long>` of content-defined chunk hashes of a token array — one
  * fused per-row loop in whole-stage codegen; see
  * [[ShingleHashKernel.cdcChunkKeys]].
  */
case class CdcChunkKeysExpr(
    child: Expression, boundaryMod: Int, minChunkTokens: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunk_keys"

  override def nullSafeEval(input: Any): Any =
    ShingleHashKernel.cdcChunkKeys(
      input.asInstanceOf[ArrayData], boundaryMod, minChunkTokens)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.ShingleHashKernel.cdcChunkKeys(" +
        s"$t, $boundaryMod, $minChunkTokens);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array; see [[ShingleHashKernel.simhash64]]. */
case class SimHash64Expr(child: Expression, portable: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    ShingleHashKernel.simhash64(input.asInstanceOf[ArrayData], portable)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.ShingleHashKernel.simhash64($t, $portable);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleFunctions {

  /** All n-gram shingle keys of a token array (document order, may
    * contain duplicates — `array_distinct` for the set).
    */
  def shingleKeys(tokens: Column, n: Int, portable: Boolean = false): Column =
    ColumnBridge.column(
      ShingleKeysExpr(ColumnBridge.expression(tokens), n, portable))

  /** MinHash signature of a shingle-key array under the given
    * permutation family.
    */
  def minhashSig(keys: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    ColumnBridge.column(
      MinHashSigExpr(ColumnBridge.expression(keys), as.toArray, bs.toArray, p))

  /** 64-bit SimHash of a token array. */
  def simhash64(tokens: Column, portable: Boolean = false): Column =
    ColumnBridge.column(
      SimHash64Expr(ColumnBridge.expression(tokens), portable))

  /** Gopher repetition counters (top-bigram / bigram-total /
    * dup-trigram-instances / trigram-total) of a token array.
    */
  def gramRepetition(tokens: Column): Column =
    ColumnBridge.column(GramRepetitionExpr(ColumnBridge.expression(tokens)))

  /** Content-defined chunk hashes of a token array (portable family). */
  def cdcChunkKeys(
      tokens: Column, boundaryMod: Int, minChunkTokens: Int): Column =
    ColumnBridge.column(CdcChunkKeysExpr(
      ColumnBridge.expression(tokens), boundaryMod, minChunkTokens))

  /** Shingle keys from a pre-hashed token array (default xx64 family). */
  def shingleKeysFromHashes(tokenHashes: Column, n: Int): Column =
    ColumnBridge.column(
      ShingleKeysFromHashesExpr(ColumnBridge.expression(tokenHashes), n))
}
