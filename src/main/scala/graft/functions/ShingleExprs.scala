package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle/posting kernels for the n-gram dedup tier.
  *
  * The composed form (`filter(split(...))` → nested `zip_with` → `transform`
  * + per-shingle `md5` → `array_distinct` → `sort_array`) is semantically
  * right but every lambda runs interpreted with string/array intermediates —
  * it dominated the qd_ngram_jaccard / qd_minhash_lsh map stage. The kernel
  * below produces the identical sorted-distinct 60-bit hash array in one
  * tight loop (one digest per distinct shingle, no hex strings, no
  * intermediate arrays), callable from generated code so the projection
  * stays inside whole-stage codegen.
  *
  * Hash contract (shared with [[graft.analytics.Nlp.h60]] and its DuckDB
  * twin): `conv(substring(md5(s), 1, 15), 16, 10)` = first 8 digest bytes
  * big-endian, logically right-shifted 4 — a 60-bit non-negative BIGINT
  * both engines compute identically.
  */
object ShingleKernel {
  private val Ws = java.util.regex.Pattern.compile("\\s+")
  private val Md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5-prefix hash of a UTF-8 byte string. */
  def h60(bytes: Array[Byte]): Long = {
    val md = Md.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
    h >>> 4
  }

  /** Tokens of `text` (split on `\s+`, empties dropped) — shared by the
    * shingle and span kernels.
    */
  def tokens(text: UTF8String): Array[String] = {
    val raw = Ws.split(text.toString, -1)
    var nToks = 0
    var i = 0
    while (i < raw.length) { if (!raw(i).isEmpty) nToks += 1; i += 1 }
    val toks = new Array[String](nToks)
    var j = 0
    i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) { toks(j) = raw(i); j += 1 }
      i += 1
    }
    toks
  }

  /** Sorted distinct h60 hashes of the word n-gram shingles of `text`.
    * Tokenization mirrors `filter(split(text, '\\s+'), x -> x != '')`
    * (same Java regex class Spark's `split` compiles); docs with fewer
    * than n tokens hash the single empty-string shingle, mirroring the
    * composed form's `CASE WHEN size(toks) >= n ... ELSE array('') END`.
    */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val toks = tokens(text)
    val nToks = toks.length
    if (nToks < n) {
      return new GenericArrayData(Array(h60(Array.emptyByteArray)))
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= nToks - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(h60(sb.toString.getBytes(StandardCharsets.UTF_8)))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out) // all values < 2^60, plain long order
    new GenericArrayData(out)
  }
}

/** `graft_shingle_hashes(text, n)` → ARRAY<BIGINT>: sorted distinct 60-bit
  * hashes of the word n-gram shingles — the signature-table kernel for
  * [[graft.analytics.DedupOps.ngramJaccard]] (hash arrays are both the
  * prefix-filter input and the verification sets) and
  * [[graft.analytics.DedupOps.minhashLsh]] (MinHash is invariant under the
  * dedup+sort since min ignores multiplicity and order).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.ShingleKernel.shingleHashes($c, $n);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_prefix_explode(hs, t)` — native Catalyst Generator (the UDTF
  * surface): emits one row per PREFIX-FILTER posting of a sorted-distinct
  * hash array, i.e. the first `size − ⌊t·size⌋ + 1` elements (capped at
  * size), as a single BIGINT column `ph`. Replaces
  * `explode(slice(hs, 1, size(hs) - cast(floor(t * size(hs)) as int) + 1))`
  * in the AllPairs inverted-index build — same rows, one native generator
  * node instead of an interpreted slice+explode pair.
  */
/** `graft_span_hashes(text, w, stride)` — native Generator emitting one row
  * per w-token span of `text` at the given stride: `(pos, h)` where `pos`
  * is the 0-based token offset and `h` the 60-bit hash of the
  * space-joined span. The map stage of exact substring-level dedup
  * ("duplicate 50-token spans across documents"): spans become join keys,
  * so duplicated passages are found with one hash aggregation instead of
  * any pairwise text comparison. Docs shorter than w tokens emit nothing
  * (no sentinel — a short doc has no w-token span).
  */
case class SpanHashGen(child: Expression, w: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(w >= 1, "span width must be >= 1")
  require(stride >= 1, "stride must be >= 1")

  override def elementSchema: StructType =
    new StructType().add("pos", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("h", LongType, nullable = false)
  override def prettyName: String = "graft_span_hashes"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val toks = ShingleKernel.tokens(v.asInstanceOf[UTF8String])
      val n = toks.length
      if (n < w) Iterator.empty
      else new Iterator[InternalRow] {
        private var i = 0
        private val sb = new java.lang.StringBuilder()
        override def hasNext: Boolean = i <= n - w
        override def next(): InternalRow = {
          sb.setLength(0)
          var k = 0
          while (k < w) {
            if (k > 0) sb.append(' ')
            sb.append(toks(i + k))
            k += 1
          }
          val r = InternalRow(i,
            ShingleKernel.h60(sb.toString.getBytes(StandardCharsets.UTF_8)))
          i += stride
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ShinglePrefixGen(child: Expression, threshold: Double)
    extends UnaryExpression with Generator with CodegenFallback {
  require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")

  override def elementSchema: StructType = new StructType().add("ph", LongType, nullable = false)
  override def prettyName: String = "graft_prefix_explode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_prefix_explode requires ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val hs = v.asInstanceOf[ArrayData]
      val sz = hs.numElements()
      val plen = math.min(sz, sz - math.floor(threshold * sz).toInt + 1)
      new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i < plen
        override def next(): InternalRow = {
          val r = InternalRow(hs.getLong(i))
          i += 1
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
