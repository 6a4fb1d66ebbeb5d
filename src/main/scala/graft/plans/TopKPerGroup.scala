package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.SparkSessionExtensions

/** Whole-operator extension (brief option (c)): per-group top-k as a
  * custom LogicalPlan + Strategy + physical operator, instead of the
  * window `row_number ≤ k` pattern.
  *
  * Why it wins at scale: the window plan sorts EVERY row of every
  * group after a full shuffle. This operator keeps a bounded k-heap
  * per group: a PARTIAL pass runs map-side before the exchange (like
  * partial aggregation, shrinking each partition to ≤k rows per
  * group), then a FINAL pass after a ClusteredDistribution exchange
  * picks the true top-k. Shuffle volume drops from O(rows) to
  * O(groups·k·partitions); nothing is globally sorted.
  *
  * Ordering: `orderValue` descending, `tieBreak` ascending (must be
  * unique within a group for deterministic output).
  */
case class TopKPerGroup(k: Int, groupExprs: Seq[Expression],
    orderValue: Expression, tieBreak: Expression,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
    orderValue: Expression, tieBreak: Expression,
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val groupeExprs = groupExprs
    val ordExpr = orderValue
    val tieExpr = tieBreak
    val childOutput = child.output
    child.execute().mapPartitions({ rows =>
      val groupProj = UnsafeProjection.create(groupeExprs, childOutput)
      val ordBound = BindReferences.bindReference(ordExpr, childOutput)
      val tieBound = BindReferences.bindReference(tieExpr, childOutput)
      // native-type interpreted orderings — no lossy Double/Long
      // coercion (a BIGINT beyond 2^53 keeps full precision; decimal,
      // string, date order/tie columns compare by their own semantics)
      val valueOrd = TypeUtils.getInterpretedOrdering(ordExpr.dataType)
      val tieOrd = TypeUtils.getInterpretedOrdering(tieExpr.dataType)
      // null orderValue sorts worst (NULLS LAST under DESC);
      // null tie sorts worst (NULLS LAST under ASC)
      def cmpValue(a: Any, b: Any): Int =
        if (a == null) { if (b == null) 0 else -1 }
        else if (b == null) 1
        else valueOrd.compare(a, b)
      def cmpTie(a: Any, b: Any): Int =
        if (a == null) { if (b == null) 0 else 1 }
        else if (b == null) -1
        else tieOrd.compare(a, b)
      // eval results may point into the reused input row buffer —
      // copy the non-primitive ones before they outlive the iteration
      def owned(v: Any): Any = v match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
        case r: InternalRow => r.copy()
        case other => other
      }
      // not every child emits UnsafeRow — convert defensively
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      // per group: a heap of (value, tie, row) keeping the k best
      // (highest value, lowest tie) — the heap ROOT is the WORST kept,
      // so `compare` puts the worst (lowest value, highest tie) first.
      val heapOrd = new Ordering[(Any, Any, UnsafeRow)] {
        override def compare(x: (Any, Any, UnsafeRow), y: (Any, Any, UnsafeRow)): Int = {
          val c = cmpValue(y._1, x._1)
          if (c != 0) c else cmpTie(x._2, y._2)
        }
      }
      val heaps = new scala.collection.mutable.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[(Any, Any, UnsafeRow)]]()
      rows.foreach { row =>
        val key = groupProj(row)
        var heap = heaps.getOrElse(key, null)
        if (heap == null) {
          heap = new scala.collection.mutable.PriorityQueue[(Any, Any, UnsafeRow)]()(heapOrd)
          heaps.put(key.copy(), heap) // copy only when the key is new
        }
        val v = ordBound.eval(row)
        val t = tieBound.eval(row)
        if (heap.size < kk) {
          heap.enqueue((owned(v), owned(t), toUnsafe(row).copy()))
        } else {
          val worst = heap.head
          val cv = cmpValue(v, worst._1)
          if (cv > 0 || (cv == 0 && cmpTie(t, worst._2) < 0)) {
            heap.dequeue()
            heap.enqueue((owned(v), owned(t), toUnsafe(row).copy()))
          }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._3))
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Plans TopKPerGroup as partial → exchange(cluster) → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, g, o, t, child) =>
      TopKPerGroupExec(k, g, o, t, partial = false,
        TopKPerGroupExec(k, g, o, t, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` registration:
  * the planner strategy for TopKPerGroup plus the native scalar
  * functions in the SQL FunctionRegistry, so `SELECT cosine_sim(a, b)`
  * / `simhash64(tokens)` work from plain SQL exactly like built-ins
  * (ExpressionInfo included — DESCRIBE FUNCTION documents them).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectOptimizerRule(_ => TopKRewriteRule)
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      e.injectFunction((ident, info, builder))
    }
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two array<double> (fused codegen loop)"),
      (args: Seq[Expression]) => {
        require(args.size == 2, s"cosine_sim takes 2 arguments, got ${args.size}")
        graft.functions.CosineSim(args.head, args(1))
      }),
    (FunctionIdentifier("simhash64"),
      info("simhash64",
        "simhash64(tokens) - 60-bit SimHash of an array<string> (native expression)"),
      (args: Seq[Expression]) => {
        require(args.size == 1, s"simhash64 takes 1 argument, got ${args.size}")
        graft.functions.SimHash64(args.head)
      }),
    (FunctionIdentifier("subword_split"),
      info("subword_split",
        "subword_split(word) - greedy longest-match subword pieces (native expression)"),
      (args: Seq[Expression]) => {
        require(args.size == 1, s"subword_split takes 1 argument, got ${args.size}")
        graft.functions.SubwordSplit(args.head)
      }),
    (FunctionIdentifier("zorder64"),
      info("zorder64",
        "zorder64(a, b) - 62-bit Morton interleave of two bigints (Z-order clustering key)"),
      (args: Seq[Expression]) => {
        require(args.size == 2, s"zorder64 takes 2 arguments, got ${args.size}")
        graft.functions.ZOrder64(args.head, args(1))
      }),
    (FunctionIdentifier("dot_product"),
      info("dot_product",
        "dot_product(a, b) - dot product of two array<double> (fused codegen loop)"),
      (args: Seq[Expression]) => {
        require(args.size == 2, s"dot_product takes 2 arguments, got ${args.size}")
        graft.functions.DotProduct(args.head, args(1))
      }),
    (FunctionIdentifier("sq_dist"),
      info("sq_dist",
        "sq_dist(a, b) - squared L2 distance of two array<double> (fused codegen loop)"),
      (args: Seq[Expression]) => {
        require(args.size == 2, s"sq_dist takes 2 arguments, got ${args.size}")
        graft.functions.SqDist(args.head, args(1))
      }),
    (FunctionIdentifier("chunk_fold"),
      info("chunk_fold",
        "chunk_fold(text, len) - greedy word-budget chunking in one pass (native expression)"),
      (args: Seq[Expression]) => {
        require(args.size == 2, s"chunk_fold takes 2 arguments, got ${args.size}")
        graft.functions.ChunkFold(args.head, intLit(args(1), "chunk_fold len"))
      }),
    (FunctionIdentifier("word_shingles"),
      info("word_shingles",
        "word_shingles(words, n) - distinct word n-gram shingle strings (native expression)"),
      (args: Seq[Expression]) => {
        require(args.size == 2, s"word_shingles takes 2 arguments, got ${args.size}")
        graft.functions.WordShingles(args.head, intLit(args(1), "word_shingles n"))
      }),
    (FunctionIdentifier("word_ngrams"),
      info("word_ngrams",
        "word_ngrams(words, n) - word n-gram strings, one per position (native expression)"),
      (args: Seq[Expression]) => {
        require(args.size == 2, s"word_ngrams takes 2 arguments, got ${args.size}")
        graft.functions.WordNgrams(args.head, intLit(args(1), "word_ngrams n"))
      }),
    (FunctionIdentifier("distinct_gram_md5"),
      info("distinct_gram_md5",
        "distinct_gram_md5(words, n) - distinct md5 hashes of word n-grams (native expression)"),
      (args: Seq[Expression]) => {
        require(args.size == 2, s"distinct_gram_md5 takes 2 arguments, got ${args.size}")
        graft.functions.DistinctGramMd5(args.head, intLit(args(1), "distinct_gram_md5 n"))
      }),
    (FunctionIdentifier("winnow_fps"),
      info("winnow_fps",
        "winnow_fps(words, k, w) - winnowing fingerprints: distinct w-window mins of k-gram md5-prefix hashes (native expression)"),
      (args: Seq[Expression]) => {
        require(args.size == 3, s"winnow_fps takes 3 arguments, got ${args.size}")
        graft.functions.WinnowFps(args.head,
          intLit(args(1), "winnow_fps k"), intLit(args(2), "winnow_fps w"))
      }),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(shingles, k) - k-slot MinHash signature of shingle strings (native expression)"),
      (args: Seq[Expression]) => {
        require(args.size == 2, s"minhash_sig takes 2 arguments, got ${args.size}")
        graft.functions.MinHashSig(args.head, intLit(args(1), "minhash_sig k"))
      }),
    (FunctionIdentifier("sorted_field"),
      info("sorted_field",
        "sorted_field(arr, idx) - struct field idx projected in array-sorted order (native expression)"),
      (args: Seq[Expression]) => {
        require(args.size == 2, s"sorted_field takes 2 arguments, got ${args.size}")
        graft.functions.SortedField(args.head, intLit(args(1), "sorted_field idx"))
      }))

  /** Extract a foldable integer argument (the SQL-literal parameters
    * of the parameterized native expressions).
    */
  private def intLit(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval(null) match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long => l.intValue
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  /** Ensure the functions exist on an already-built session
    * (idempotent) — the extensions path covers sessions constructed
    * with spark.sql.extensions=graft.plans.GraftExtensions.
    */
  def installFunctions(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      val registry = spark.sessionState.functionRegistry
      if (!registry.functionExists(ident))
        registry.registerFunction(ident, inf, builder)
    }
}

object TopKPerGroup {

  /** Ensure the strategy + rewrite rule are installed on this session
    * (idempotent — works even when the session was built without
    * extensions).
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKStrategy))
      spark.experimental.extraStrategies = cur :+ TopKStrategy
    val curOpt = spark.experimental.extraOptimizations
    if (!curOpt.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations = curOpt :+ TopKRewriteRule
  }

  /** Public API: top-k rows per group, `orderCol` desc / `tieCol` asc.
    * Order/tie columns may be any orderable type (compared with their
    * native interpreted ordering — no Double coercion); non-orderable
    * types (map, binary of nested unorderables…) are rejected HERE,
    * at plan build, not mid-task at runtime.
    */
  def topK(df: DataFrame, k: Int, groupCols: Seq[String],
      orderCol: String, tieCol: String): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val child = shims.analyzed(df)
    val byName = child.output.map(a => a.name -> a).toMap
    def attr(n: String) = byName.getOrElse(n,
      throw new IllegalArgumentException(s"no column $n in ${byName.keys}"))
    for (c <- Seq(orderCol, tieCol)) {
      val dt = attr(c).dataType
      if (!org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt))
        throw new IllegalArgumentException(
          s"topK order/tie column $c has non-orderable type ${dt.simpleString}")
    }
    shims.ofRows(spark,
      TopKPerGroup(k, groupCols.map(attr), attr(orderCol), attr(tieCol), child))
  }
}
