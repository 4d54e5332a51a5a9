package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for the similarity/dedup hot paths.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`, `transform`)
  * always run interpreted — per-element lambda dispatch plus boxing — and a
  * 64-term unrolled arithmetic alternative produces kilobytes of generated
  * code per expression that janino compiles slowly and sometimes falls out
  * of whole-stage codegen. A purpose-built `Expression` with `doGenCode`
  * gets both: a tight primitive loop in generated code (no boxing, no
  * allocation) and a tiny codegen footprint. This is the
  * expression > UDF > driver-loop preference order for extending Spark.
  *
  * Registered in the session `FunctionRegistry` (usable from
  * `call_function` / SQL); `GraftExtensions` injects them via
  * `SparkSessionExtensions` for externally built sessions.
  */
/** Shared per-thread MD5 instance for the digest-slice hash family
  * (the gram hashers, MinHash signatures, Count-Min) — ONE definition
  * of the ThreadLocal idiom instead of a copy per file. `digest()`
  * leaves the engine reset, so no explicit reset() between uses.
  */
private[functions] object Md5Local {
  private val tl =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  def get(): java.security.MessageDigest = tl.get()
}

object GraftFunctions {

  /** dot product over two array<double> columns (lengths zipped). */
  val DotName = "graft_dot"

  /** |a ∩ b| for two ASC-SORTED array<long> columns (merge count). */
  val IntersectName = "graft_sorted_intersect_count"

  /** bottom-k distinct-value sketch aggregate over a long column. */
  val BottomKName = "graft_bottom_k"

  /** Rabin-Karp rolling-hash window array over a string column. */
  val RollingHashName = "graft_rolling_hash"

  /** sorted distinct md5 bigram-shingle hashes of a space-separated string. */
  val BigramName = "graft_bigram_hashes"

  /** sorted distinct md5 word n-gram hashes of a space-separated string. */
  val NgramName = "graft_ngram_hashes"

  /** positional (unsorted) 60-bit md5 word n-gram hashes, one per window. */
  val PosNgramName = "graft_ngram_pos_hashes"

  /** struct(n_tokens, n_stop) of a space-separated string, one byte pass. */
  val TokenStatsName = "graft_token_stats"

  /** k-wide minhash signature array of a space-separated string. */
  val MinhashName = "graft_minhash_sigs"

  /** fused minhash→LSH band-signature array (k, bandSize, gram). */
  val BandSigsName = "graft_minhash_band_sigs"

  /** # positions where two equal-length long arrays agree. */
  val AgreeName = "graft_positional_agree_count"

  /** Misra–Gries heavy-hitters sketch aggregate over a long column. */
  val MisraGriesName = "graft_misra_gries"

  /** Count-Min frequency sketch aggregate over a string column. */
  val CountMinName = "graft_count_min"

  /** all character n-grams of a string, in order. */
  val CharNgramsName = "graft_char_ngrams"

  /** bloom-membership probe of a long column (serialized filter literal). */
  val BloomName = "graft_bloom_might_contain"

  /** bloom-filter-building aggregate over a long column (write-side twin
    * of [[BloomName]]; serialized spark-sketch filter out). */
  val BloomAggName = "graft_bloom_agg"

  /** per-code-point Shannon entropy (log2) of a string, one pass. */
  val CharEntropyName = "graft_char_entropy"

  /** NFC + casefold + control-strip + whitespace-collapse, one pass. */
  val NormalizeTextName = "graft_normalize_text"

  /** Jaro-Winkler similarity of two strings (DuckDB-compatible). */
  val JaroWinklerName = "graft_jaro_winkler"

  /** Thresholded Levenshtein, result-identical to levenshtein(a, b, k). */
  val LevenshteinKName = "graft_levenshtein_k"

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(getClass.getName, null, name, usage, "")

  /** Extract a literal array<string> argument (typedlit / SQL array()). */
  private def stringArrayLiteral(e: Expression): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(data: ArrayData, _) =>
      data.toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString).toSeq
    case other =>
      throw new IllegalArgumentException(s"stopwords must be a literal array, got $other")
  }

  /** Idempotently register the functions in this session's registry
    * (per-function guards: a session built with GraftExtensions may
    * already have a subset).
    */
  def register(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    def ensure(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.registerFunction(FunctionIdentifier(name), info(name, usage), builder)
    ensure(DotName, "_FUNC_(a, b) - dot product of two double arrays")(
      children => DotProductDouble(children(0), children(1)))
    ensure(IntersectName, "_FUNC_(a, b) - intersection size of two sorted long arrays")(
      children => SortedLongIntersectCount(children(0), children(1)))
    ensure(RollingHashName, "_FUNC_(text, k, b, m) - Rabin-Karp window hashes")(
      children => {
        def litInt(e: Expression): Long = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toLong
          case other => throw new IllegalArgumentException(s"literal required, got $other")
        }
        RollingHashWindows(children(0), litInt(children(1)).toInt,
          litInt(children(2)), litInt(children(3)))
      })
    ensure(BigramName, "_FUNC_(text) - sorted distinct md5 bigram-shingle hashes")(
      children => BigramMd5Hashes(children(0)))
    ensure(NgramName, "_FUNC_(text, n) - sorted distinct md5 word n-gram hashes")(
      children => {
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
          case other => throw new IllegalArgumentException(s"n must be a literal, got $other")
        }
        NgramMd5Hashes(children(0), n)
      })
    ensure(PosNgramName, "_FUNC_(text, n) - positional 60-bit md5 word n-gram hashes")(
      children => {
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
          case other => throw new IllegalArgumentException(s"n must be a literal, got $other")
        }
        PositionalNgramMd5Hashes(children(0), n)
      })
    ensure(TokenStatsName,
      "_FUNC_(text, stopwords) - struct(n_tokens, n_stop) in one byte pass")(
      children => TokenStats(children(0), stringArrayLiteral(children(1))))
    ensure(AgreeName, "_FUNC_(a, b) - positions where two long arrays agree")(
      children => PositionalAgreeCount(children(0), children(1)))
    ensure(MinhashName, "_FUNC_(text, k) - k-wide minhash signature array")(
      children => {
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
          case other => throw new IllegalArgumentException(s"k must be a literal, got $other")
        }
        MinhashSigs(children(0), k)
      })
    ensure(BandSigsName,
      "_FUNC_(text, k, bandSize, gram) - fused minhash LSH band signatures")(
      children => {
        def litInt(e: Expression): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
          case other => throw new IllegalArgumentException(s"literal required, got $other")
        }
        MinhashBandSigs(children(0), litInt(children(1)), litInt(children(2)),
          litInt(children(3)))
      })
    ensure(BottomKName, "_FUNC_(col, k) - k smallest distinct longs (KMV sketch)")(
      children => {
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
          case other => throw new IllegalArgumentException(s"k must be a literal, got $other")
        }
        // bare AggregateFunction: the analyzer wraps it in an
        // AggregateExpression during UnresolvedFunction resolution
        BottomKLongs(children(0), k)
      })
    ensure(MisraGriesName, "_FUNC_(col, m) - Misra-Gries heavy-hitter sketch")(
      children => {
        val m = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
          case other => throw new IllegalArgumentException(s"m must be a literal, got $other")
        }
        MisraGriesLongs(children(0), m)
      })
    ensure(CountMinName, "_FUNC_(col, d, w) - Count-Min frequency sketch (d x w longs)")(
      children => {
        def litInt(e: Expression): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
          case other => throw new IllegalArgumentException(s"literal required, got $other")
        }
        CountMinLongs(children(0), litInt(children(1)), litInt(children(2)))
      })
    ensure(CharNgramsName, "_FUNC_(s, n) - all character n-grams of s")(
      children => {
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
          case other => throw new IllegalArgumentException(s"n must be a literal, got $other")
        }
        CharNgrams(children(0), n)
      })
    ensure(BloomName, "_FUNC_(col, bloomBytes) - serialized-bloom membership probe")(
      children => {
        val bytes = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Array[Byte], _) => v
          case other =>
            throw new IllegalArgumentException(s"bloom bytes must be a binary literal, got $other")
        }
        BloomMightContainLong(children(0), bytes)
      })
    ensure(BloomAggName,
      "_FUNC_(col, expectedItems, fpp) - build a serialized bloom filter")(
      children => {
        def litNum(e: Expression): String = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString
          case other => throw new IllegalArgumentException(s"literal required, got $other")
        }
        BloomAggLong(children(0), litNum(children(1)).toLong,
          litNum(children(2)).toDouble)
      })
    ensure(CharEntropyName, "_FUNC_(s) - per-code-point Shannon entropy (log2)")(
      children => CharEntropy(children(0)))
    ensure(NormalizeTextName,
      "_FUNC_(s) - NFC + lowercase + control-strip + whitespace-collapse")(
      children => NormalizeText(children(0)))
    ensure(JaroWinklerName, "_FUNC_(a, b) - Jaro-Winkler similarity")(
      children => JaroWinklerSimilarity(children(0), children(1)))
    ensure(LevenshteinKName,
      "_FUNC_(a, b, k) - Levenshtein distance when <= k, else -1")(
      children => BandedLevenshtein(children(0), children(1),
        children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other =>
            throw new IllegalArgumentException(s"threshold must be an int literal, got $other")
        }))
  }
}

/** Σ a(i)*b(i) over array<double>; null if either side is null. */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<double>; callers in graft.operators guarantee it
  override def dataType: DataType = DoubleType
  override def prettyName: String = GraftFunctions.DotName

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** # positions i where a(i) == b(i) over two long arrays (zipped to the
  * shorter length) — the MinHash signature-agreement counter (dd8). The
  * zip_with + aggregate higher-order form runs interpreted at
  * ~1µs/element, which dominates the estimator's cost at millions of
  * candidate pairs; this is the same primitive loop inside whole-stage
  * codegen.
  */
case class PositionalAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<long>; callers in graft.operators guarantee it
  override def dataType: DataType = IntegerType
  override def prettyName: String = GraftFunctions.AgreeName

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var cnt = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) cnt += 1
      i += 1
    }
    cnt
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Merge-count of common elements of two ascending-sorted long arrays.
  * With distinct sorted inputs this is the set-intersection size — the
  * exact-Jaccard building block, O(|a|+|b|) with zero allocation.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be ASC-sorted array<long>; callers guarantee it
  override def dataType: DataType = IntegerType
  override def prettyName: String = GraftFunctions.IntersectName

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n1, n2) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var cnt = 0
    while (i < n1 && j < n2) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { cnt += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    cnt
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val cnt = ctx.freshName("cnt")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $n1 && $j < $n2) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $cnt++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
