package org.apache.spark.sql.graftshims

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-pattern matcher: ONE Aho-Corasick pass over each document
  * counts every dictionary term simultaneously, emitting a SPARSE array of
  * (idx, olap, disj) structs — one entry per term that matched at least
  * once, ascending by term index. `olap` is the classic end-position count
  * (overlapping occurrences); `disj` the greedy leftmost non-overlapping
  * count (exactly what a left-to-right `replace(text, term, '')` consumes,
  * per term independently).
  *
  * This is the blocklist/taxonomy-tagging primitive of a training-data
  * pipeline (C4's bad-word filter, Dolma-style taggers; the reference's
  * analog is its rule-driven compare/migrate filtering, e.g.
  * `database/processor/data_compare_rule.go`): the naive plan is |dict|
  * LIKE/regexp passes over the corpus — O(|dict| · corpus) — while the
  * automaton is O(corpus + matches) independent of dictionary size. The
  * frozen automaton rides the plan as one reference object (serialized
  * once per stage with the task binary, like any literal), so the scan
  * stays a pure projection inside whole-stage codegen. The sparse output
  * is what makes a 10k-term dictionary workable: a dense per-term array
  * would be |dict| elements per ROW before any filter.
  *
  * Per-row work allocates O(matches), not O(|dict|): the per-term
  * counters live in a thread-local scratch that each call wipes for
  * exactly the indices it touched.
  *
  * Matching is over UTF-8 BYTES: byte-level equality on UTF-8 is exactly
  * codepoint-level substring equality (the encoding is self-synchronizing
  * — no term byte sequence can match starting mid-codepoint), so counts
  * agree with character-based oracles for any input. Terms must be
  * non-empty and distinct; matching is case-sensitive (callers lowercase
  * text and terms together).
  */
case class AhoCorasickCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(terms.nonEmpty, "ac_counts: empty dictionary")
  require(terms.forall(_.nonEmpty), "ac_counts: empty term")
  require(terms.distinct.length == terms.length, "ac_counts: duplicate terms")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("olap", IntegerType, nullable = false),
    StructField("disj", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "ac_counts"

  @transient private lazy val ac = AcAutomaton.build(terms.toArray)

  override def nullSafeEval(input: Any): Any =
    AhoCorasickImpl.compute(input.asInstanceOf[UTF8String], ac)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac, classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = org.apache.spark.sql.graftshims.AhoCorasickImpl.compute($x, $acRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native blocklist scrub: ONE Aho-Corasick pass collects every match,
  * then the LEFTMOST-LONGEST non-overlapping policy (FlashText's rule:
  * scan left to right, at equal starts the longest term wins, a selected
  * span excludes overlapping later starts) picks the spans to remove,
  * and the cleaned text is the byte-splice of the survivors. Returns
  * struct(cleaned string, spans array<struct(start int, len int,
  * idx int)>) — spans are 0-based BYTE offsets into the input (equal to
  * character offsets on ASCII text), ascending, non-overlapping.
  *
  * The policy is deterministic and engine-independent, so a SQL oracle
  * can replay it (greedy selection over the candidate-match relation);
  * distinct terms can never tie at the same (start, length).
  */
case class AhoCorasickScrub(child: Expression, terms: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(terms.nonEmpty, "ac_scrub: empty dictionary")
  require(terms.forall(_.nonEmpty), "ac_scrub: empty term")
  require(terms.distinct.length == terms.length, "ac_scrub: duplicate terms")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("cleaned", StringType, nullable = false),
    StructField("spans", ArrayType(StructType(Seq(
      StructField("start", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false),
      StructField("idx", IntegerType, nullable = false))), containsNull = false),
      nullable = false)))
  override def prettyName: String = "ac_scrub"

  @transient private lazy val ac = AcAutomaton.build(terms.toArray)

  override def nullSafeEval(input: Any): Any =
    AhoCorasickImpl.scrub(input.asInstanceOf[UTF8String], ac)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac, classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = org.apache.spark.sql.graftshims.AhoCorasickImpl.scrub($x, $acRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Frozen byte-level Aho-Corasick automaton. Transitions are CSR-packed
  * (per-node byte-sorted edge ranges, binary-searched) so the whole
  * structure is a handful of primitive arrays — compactly Serializable
  * and allocation-free to match against.
  */
final class AcAutomaton(
    val nodeOff: Array[Int],   // CSR offsets, length nNodes+1
    val edgeByte: Array[Byte], // per-node sorted edge labels
    val edgeTo: Array[Int],
    val fail: Array[Int],
    val termEnd: Array[Int],   // term idx ending exactly at node, else -1
    val outLink: Array[Int],   // nearest proper-suffix node with a term end, else -1
    val termLen: Array[Int],   // term byte lengths
    val nTerms: Int) extends Serializable {

  /** goto with fail fallback from `node` on byte `b`; root misses stay at root. */
  def step(node: Int, b: Byte): Int = {
    var v = node
    while (true) {
      var lo = nodeOff(v); var hi = nodeOff(v + 1) - 1
      var found = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = java.lang.Byte.compare(edgeByte(mid), b)
        if (c == 0) { found = edgeTo(mid); lo = hi + 1 }
        else if (c < 0) lo = mid + 1
        else hi = mid - 1
      }
      if (found >= 0) return found
      if (v == 0) return 0
      v = fail(v)
    }
    0 // unreachable
  }
}

object AcAutomaton {
  def build(terms: Array[String]): AcAutomaton = {
    val bytes = terms.map(t => t.getBytes("UTF-8"))
    // mutable trie
    val children = mutable.ArrayBuffer(mutable.TreeMap.empty[Byte, Int])
    val termEndB = mutable.ArrayBuffer(-1)
    bytes.zipWithIndex.foreach { case (bs, ti) =>
      var v = 0
      bs.foreach { b =>
        v = children(v).getOrElseUpdate(b, {
          children += mutable.TreeMap.empty[Byte, Int]
          termEndB += -1
          children.length - 1
        })
      }
      termEndB(v) = ti
    }
    val n = children.length
    val fail = new Array[Int](n)
    val outLink = Array.fill(n)(-1)
    // BFS fail links over the mutable maps
    val queue = mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      outLink(v) = if (termEndB(fail(v)) >= 0) fail(v) else outLink(fail(v))
      children(v).foreach { case (b, c) =>
        // walk fail chain of v for byte b
        var f = fail(v)
        var nxt = -1
        while (nxt < 0) {
          children(f).get(b) match {
            case Some(u) => nxt = u
            case None => if (f == 0) nxt = 0 else f = fail(f)
          }
        }
        fail(c) = nxt
        queue += c
      }
    }
    // freeze CSR
    val nodeOff = new Array[Int](n + 1)
    var tot = 0
    var i = 0
    while (i < n) { nodeOff(i) = tot; tot += children(i).size; i += 1 }
    nodeOff(n) = tot
    val edgeByte = new Array[Byte](tot)
    val edgeTo = new Array[Int](tot)
    i = 0
    var e = 0
    while (i < n) {
      children(i).foreach { case (b, c) => edgeByte(e) = b; edgeTo(e) = c; e += 1 }
      i += 1
    }
    new AcAutomaton(nodeOff, edgeByte, edgeTo, fail, termEndB.toArray, outLink,
      bytes.map(_.length), terms.length)
  }
}

object AhoCorasickImpl {

  /** Per-thread counter scratch, wiped per call for exactly the touched
    * indices — per-row allocation stays O(matches) even with a 10k-term
    * dictionary. All counters are zero between calls BY INVARIANT (each
    * compute zeroes what it touched before returning).
    */
  private final class Scratch(var cap: Int) {
    var olap = new Array[Int](cap)
    var disj = new Array[Int](cap)
    var nextOk = new Array[Int](cap)
    var touched = new Array[Int](cap)
    def ensure(k: Int): Unit = if (k > cap) {
      cap = k
      olap = new Array[Int](k); disj = new Array[Int](k)
      nextOk = new Array[Int](k); touched = new Array[Int](k)
    }
  }
  private val scratchTL = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch(64)
  }

  /** Java-callable from generated code: one pass, both count semantics,
    * sparse (idx, olap, disj) output ascending by idx.
    */
  def compute(text: UTF8String, ac: AcAutomaton): GenericArrayData = {
    val sc = scratchTL.get()
    sc.ensure(ac.nTerms)
    val olap = sc.olap; val disj = sc.disj; val nextOk = sc.nextOk
    val touched = sc.touched
    var nTouched = 0
    val bs = text.getBytes
    var v = 0
    var pos = 0
    while (pos < bs.length) {
      v = ac.step(v, bs(pos))
      var u = if (ac.termEnd(v) >= 0) v else ac.outLink(v)
      while (u >= 0) {
        val t = ac.termEnd(u)
        if (olap(t) == 0) { touched(nTouched) = t; nTouched += 1 }
        olap(t) += 1
        val start = pos - ac.termLen(t) + 1
        // nextOk(t) is 0 on this term's first match of the row (invariant)
        if (start >= nextOk(t)) { disj(t) += 1; nextOk(t) = pos + 1 }
        u = ac.outLink(u)
      }
      pos += 1
    }
    // touched is in first-match order; sort ascending for deterministic output
    java.util.Arrays.sort(touched, 0, nTouched)
    val out = new Array[Any](nTouched)
    var i = 0
    while (i < nTouched) {
      val t = touched(i)
      out(i) = InternalRow(t, olap(t), disj(t))
      olap(t) = 0; disj(t) = 0; nextOk(t) = 0 // restore the invariant
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One pass collects every match as (start, len, idx); greedy
    * leftmost-longest non-overlapping selection; cleaned text is the
    * byte-splice of the unselected regions.
    */
  def scrub(text: UTF8String, ac: AcAutomaton): InternalRow = {
    val bs = text.getBytes
    // collect all matches packed as (start << 32 | (IntMax - len)) so one
    // ascending key sort gives (start asc, len desc); idx rides parallel
    var starts = new Array[Long](16)
    var idxs = new Array[Int](16)
    var nm = 0
    var v = 0
    var pos = 0
    while (pos < bs.length) {
      v = ac.step(v, bs(pos))
      var u = if (ac.termEnd(v) >= 0) v else ac.outLink(v)
      while (u >= 0) {
        val t = ac.termEnd(u)
        if (nm == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nm * 2)
          idxs = java.util.Arrays.copyOf(idxs, nm * 2)
        }
        val len = ac.termLen(t)
        starts(nm) = (pos - len + 1).toLong << 32 | (Int.MaxValue - len).toLong
        idxs(nm) = t
        nm += 1
        u = ac.outLink(u)
      }
      pos += 1
    }
    // sort keys; idxs recoverable from the key's term length + start via
    // a stable re-pairing: sort an index permutation instead
    val perm = (0 until nm).sortBy(starts(_)).toArray
    val selStart = new Array[Int](nm)
    val selLen = new Array[Int](nm)
    val selIdx = new Array[Int](nm)
    var nSel = 0
    var lastEnd = -1 // last selected byte (inclusive)
    var k = 0
    while (k < nm) {
      val p = perm(k)
      val st = (starts(p) >>> 32).toInt
      val ln = Int.MaxValue - (starts(p) & 0xFFFFFFFFL).toInt
      if (st > lastEnd) {
        selStart(nSel) = st; selLen(nSel) = ln; selIdx(nSel) = idxs(p)
        nSel += 1
        lastEnd = st + ln - 1
      }
      k += 1
    }
    // splice
    var removed = 0
    var s = 0
    while (s < nSel) { removed += selLen(s); s += 1 }
    val outB = new Array[Byte](bs.length - removed)
    var src = 0
    var dst = 0
    s = 0
    while (s < nSel) {
      val st = selStart(s)
      System.arraycopy(bs, src, outB, dst, st - src)
      dst += st - src
      src = st + selLen(s)
      s += 1
    }
    System.arraycopy(bs, src, outB, dst, bs.length - src)
    val spans = new Array[Any](nSel)
    s = 0
    while (s < nSel) { spans(s) = InternalRow(selStart(s), selLen(s), selIdx(s)); s += 1 }
    InternalRow(UTF8String.fromBytes(outB), new GenericArrayData(spans))
  }
}
