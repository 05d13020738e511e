package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership kernels: the scale path for decontamination
  * when the reference set outgrows a broadcast hash set. A Bloom filter
  * of m items at 1% false-positive rate is ~1.2 bytes/item — 100M
  * benchmark grams ride in ~120 MB where the exact gram set (strings +
  * hash-set overhead) would be tens of GB and force the corpus-side
  * shuffle of a sort-merge join. Bloom errs one-sided: NO false
  * negatives, so a contaminated document is never missed; a clean one
  * is flagged with probability fpp and the broadcast-exact path
  * ([[graft.northstar.Dedup.benchmarkOverlap]]) re-checks survivors
  * when exactness matters (sketch screen → exact verify, the same
  * two-phase shape as minhashPairs' estimate screen).
  *
  * Key encoding is pinned to UTF-8 gram bytes on BOTH the build
  * ([[graft.northstar.Dedup.benchmarkBloom]], putBinary) and probe
  * ([[BloomOps.gramHits]], mightContainBinary) sides — never the
  * engine-version-dependent putString path.
  */
object BloomOps {

  /** Number of the text's word n-gram shingles (the
    * [[TextOps.shingles]] kernel, same construction as minhash/decontam)
    * that hit the filter. One tokenization pass per row; no per-row
    * deserialization — the filter is a plan-reference object.
    */
  def gramHits(s: UTF8String, bloom: BloomFilter, n: Int): Int = {
    val grams = TextOps.shingles(s, n)
    var hits = 0
    var i = 0
    val m = grams.numElements()
    while (i < m) {
      if (bloom.mightContainBinary(grams.getUTF8String(i).getBytes)) hits += 1
      i += 1
    }
    hits
  }

  def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}

/** bloom_gram_hits(text) → int: count of the text's word n-gram shingles
  * present (maybe — one-sided fpp) in the frozen Bloom filter. The
  * deserialized filter rides into generated code as a reference object
  * (one instance per plan, serialized once to each executor), so the hot
  * path is hash-probe-only and stays inside whole-stage codegen.
  */
case class BloomGramHits(child: Expression, filterBytes: Array[Byte],
                         n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.KernelInputTypes {
  // declared, not a comment: a non-string child (doc_id by mistake)
  // used to pass analysis and die as a ClassCastException deep in an
  // executor — the r13 KernelInputTypes class, re-exposed here
  // (code-review r14)
  override def kernelInputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.StringType)
  @transient private lazy val bloom: BloomFilter =
    BloomOps.deserialize(filterBytes)

  // Array[Byte] equality is reference-based, which would make two
  // semantically identical probe expressions never compare equal —
  // defeating canonicalization / common-subexpression elimination and
  // plan-cache hits. Compare the filter CONTENT instead. The byte-array
  // hash is computed ONCE: at the advertised 100M-gram scale the filter
  // is ~120 MB, and the optimizer probes expression sets/plan caches
  // repeatedly per batch — an uncached Arrays.hashCode was an O(120MB)
  // scan per probe (code-review r14). equals short-circuits on the
  // cached hash before paying the full array compare.
  @transient private lazy val filterHash: Int =
    java.util.Arrays.hashCode(filterBytes)
  override def equals(other: Any): Boolean = other match {
    case o @ BloomGramHits(c, fb, m) =>
      c == child && m == n && o.filterHash == filterHash &&
        java.util.Arrays.equals(fb, filterBytes)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Int.box(n), Int.box(filterHash))

  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    BloomOps.gramHits(v.asInstanceOf[UTF8String], bloom, n)
  /** The lazily-deserialized filter, for generated code — public so the
    * codegen reference below can reach it.
    */
  def bloomForCodegen(): BloomFilter = bloom
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS EXPRESSION, not the deserialized filter
    // (code-review r18): referencing `bloom` forced the driver to
    // deserialize a second ~120 MB copy at codegen time AND shipped it
    // alongside the plan tree's filterBytes — ~240 MB per task binary
    // at the advertised 100M-gram scale. The expression reference
    // shares the byte payload the plan already carries; each executor
    // deserializes once through the transient lazy val.
    val ref = ctx.addReferenceObj("gramBloomExpr", this,
      classOf[BloomGramHits].getName)
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.BloomOps.gramHits($v, $ref.bloomForCodegen(), $n)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomGramHits =
    copy(child = newChild)
}

object bloomops {
  def bloom_gram_hits(text: Column, filterBytes: Array[Byte],
                      n: Int = 3): Column =
    Bridge.column(BloomGramHits(Bridge.expression(text), filterBytes, n))
}
