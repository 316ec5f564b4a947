package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-word BPE token count against a stored merge table — the
  * kernel behind [[graft.operators.TextAnalysis.bpeApply]] and the
  * streaming twin's per-row accounting.
  *
  * The r16 implementation applied the merge table as one `replace`
  * expression PER MERGE over a sentinel-framed symbol string
  * (localCheckpoint every 32 to bound projection depth): correct, but a
  * production 64k-merge tokenizer becomes ~2,000 checkpointed projection
  * stages over the word-type table, and the streaming twin — where no
  * checkpoint boundary exists — folds the whole table into one
  * expression tree that breaks Catalyst codegen at scale. This kernel is
  * ONE expression whose cost is flat in |merges|: per word it touches
  * only the merges whose pairs actually occur.
  *
  * Semantics are EXACTLY the sequential replace chain (spec-pinned
  * against it, including OOV and merge-output collisions): apply merges
  * in ascending rank order; each applied rank is one left-to-right
  * non-overlapping pass over the current symbols. The efficient
  * schedule: seed a min-heap with the ranks of the word's adjacent
  * character pairs, pop the smallest, run its pass, and for each NEWLY
  * formed adjacency offer only ranks STRICTLY ABOVE the popped one —
  * a pair (re)formed after its own rank has passed is exactly what the
  * sequential chain would never revisit (including the subtle case
  * where a later merge's output string collides with an earlier merge's
  * input symbol). Each pass is O(word chars); passes ≤ applied merges +
  * stale pops, both bounded by the word's length — never by |merges|.
  *
  * Characters are Unicode code points ([[UTF8String]] `length`/`substr`
  * semantics, so char-init matches the chain's `substr(i, 1)` framing).
  * NULL word → NULL; the empty word counts 0 (callers filter it, as the
  * batch operator does). The chain stays in the codebase as the
  * spec-pinned reference twin ([[WinnowMinima]] discipline).
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  @transient private lazy val prepared = BpeTokenCount.prepare(merges)

  override def nullSafeEval(w: Any): Any =
    BpeTokenCount.count(w.asInstanceOf[UTF8String], prepared)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the prepared merge structure rides as a plan reference object —
    // built once on the driver, shipped with the serialized plan, shared
    // by every row the generated code touches
    val ref = ctx.addReferenceObj("bpeMerges", prepared,
      classOf[BpeTokenCount.Prepared].getName)
    nullSafeCodeGen(ctx, ev,
      w => s"${ev.value} = graft.plans.BpeTokenCount.count($w, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.Bridge

  /** Column wrapper: token count of `word` under `merges` in rank order. */
  def count(word: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(word), merges))

  /** Rank-indexed pair tables + a TWO-LEVEL left→right→sorted-ranks
    * lookup: probing an adjacent pair allocates nothing (the flat
    * single-map alternative built a key string per probe, and probes —
    * one per adjacent symbol pair — are the kernel's hottest op). */
  final class Prepared(
      val left: Array[String], val right: Array[String],
      val ranks: java.util.HashMap[String, java.util.HashMap[String, Array[Int]]])
    extends Serializable

  def prepare(merges: Seq[(String, String)]): Prepared = {
    val left = merges.map(_._1).toArray
    val right = merges.map(_._2).toArray
    val ranks =
      new java.util.HashMap[String, java.util.HashMap[String, Array[Int]]]()
    var i = 0
    while (i < left.length) {
      var inner = ranks.get(left(i))
      if (inner == null) {
        inner = new java.util.HashMap[String, Array[Int]]()
        ranks.put(left(i), inner)
      }
      val prev = inner.get(right(i))
      inner.put(right(i), if (prev == null) Array(i) else prev :+ i)
      i += 1 // insertion order is rank order, so each array stays sorted
    }
    new Prepared(left, right, ranks)
  }

  /** Shared by interpreted eval and generated code. */
  def count(word: UTF8String, p: Prepared): Long = {
    val s = word.toString
    val syms = new java.util.ArrayList[String]()
    var ci = 0
    while (ci < s.length) {
      val cc = Character.charCount(s.codePointAt(ci))
      syms.add(s.substring(ci, ci + cc))
      ci += cc
    }
    if (syms.size <= 1 || p.ranks.isEmpty) return syms.size.toLong
    // lazily allocated: most words (OOV, no-merge) never offer a rank
    var heap: java.util.PriorityQueue[Integer] = null
    var offered: java.util.HashSet[Integer] = null
    def offer(l: String, r: String, minRankExclusive: Int): Unit = {
      val inner = p.ranks.get(l)
      if (inner == null) return
      val arr = inner.get(r)
      if (arr != null) {
        var j = 0
        while (j < arr.length) {
          if (arr(j) > minRankExclusive) {
            if (heap == null) {
              heap = new java.util.PriorityQueue[Integer]()
              offered = new java.util.HashSet[Integer]()
            }
            val boxed = Integer.valueOf(arr(j))
            if (offered.add(boxed)) heap.offer(boxed)
            return
          }
          j += 1
        }
      }
    }
    var k = 0
    while (k + 1 < syms.size) { offer(syms.get(k), syms.get(k + 1), -1); k += 1 }
    while (heap != null && !heap.isEmpty) {
      val rank = heap.poll().intValue()
      val l = p.left(rank)
      val r = p.right(rank)
      // one left-to-right non-overlapping pass, compacting in place
      var read = 0
      var write = 0
      var mergedAny = false
      val mergedAt = new java.util.ArrayList[Integer]()
      while (read < syms.size) {
        if (read + 1 < syms.size &&
            syms.get(read) == l && syms.get(read + 1) == r) {
          syms.set(write, l + r)
          mergedAt.add(write)
          mergedAny = true
          read += 2
        } else {
          if (write != read) syms.set(write, syms.get(read))
          read += 1
        }
        write += 1
      }
      if (mergedAny) {
        while (syms.size > write) syms.remove(syms.size - 1)
        var mi = 0
        while (mi < mergedAt.size) {
          val w = mergedAt.get(mi).intValue()
          if (w > 0) offer(syms.get(w - 1), syms.get(w), rank)
          if (w + 1 < syms.size) offer(syms.get(w), syms.get(w + 1), rank)
          mi += 1
        }
      }
    }
    syms.size.toLong
  }
}
