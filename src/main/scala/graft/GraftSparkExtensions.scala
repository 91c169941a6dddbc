package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{SimHash64Expr, VectorKernel, WordShingleHashesExpr}

/** SparkSessionExtensions entry point: registers the engine's codegen'd
  * expressions as SQL functions, so `spark.sql` users (and downstream BI
  * tools) get them without touching the Scala API:
  *
  * {{{
  * spark.sql("SELECT vec_cosine(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * Activate with `.config("spark.sql.extensions", "graft.GraftSparkExtensions")`
  * (GraftSession does) or `--conf` on spark-submit — the standard extension
  * mechanism, nothing bespoke.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // ORDER BY vec_cosine(vector, <lit>) DESC LIMIT k over a vector-store
    // relation → native search pushed into the scan
    ext.injectOptimizerRule(_ => graft.plans.PushVectorSearch)
    // metadata predicates (map access — untranslatable by Spark's pushdown
    // APIs) → rendered to the backend dialect, applied at the store
    ext.injectOptimizerRule(_ => graft.plans.PushMetadataFilters)

    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "")

    // wrong arity must surface as an ANALYSIS error naming the function,
    // not an IndexOutOfBounds from the builder indexing args
    def arity(name: String, n: Int)(build: Seq[Expression] => Expression)
        (args: Seq[Expression]): Expression = {
      if (args.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> n.toString,
            "actualNum" -> args.length.toString, "docroot" -> ""))
      build(args)
    }

    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays"),
      arity("vec_dot", 2)(args => VectorKernel(args(0), args(1), VectorKernel.Dot)) _))

    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity (0 when a norm is 0)"),
      arity("vec_cosine", 2)(args => VectorKernel(args(0), args(1), VectorKernel.Cosine)) _))

    ext.injectFunction((FunctionIdentifier("vec_l2"),
      info("vec_l2", "vec_l2(a, b) - Euclidean distance"),
      arity("vec_l2", 2)(args => VectorKernel(args(0), args(1), VectorKernel.L2)) _))

    ext.injectFunction((FunctionIdentifier("vec_sum"),
      info("vec_sum", "vec_sum(v) - element-wise sum aggregate over vector columns"),
      arity("vec_sum", 1)(args =>
        graft.functions.VectorSumAgg(args.head).toAggregateExpression()) _))

    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<bigint>) - 64-bit SimHash of pre-hashed tokens"),
      arity("simhash64", 1)(args => SimHash64Expr(args(0))) _))

    ext.injectFunction((FunctionIdentifier("word_shingle_hashes"),
      info("word_shingle_hashes", "word_shingle_hashes(text, n) - distinct hashed word n-grams"),
      arity("word_shingle_hashes", 2)(args => WordShingleHashesExpr(args(0),
        args(1).eval().asInstanceOf[Int])) _))

    ext.injectFunction((FunctionIdentifier("hashed_bow_embed"),
      info("hashed_bow_embed",
        "hashed_bow_embed(text, dim) - L2-normalized feature-hashing text embedding"),
      arity("hashed_bow_embed", 2)(args => graft.functions.HashedBowEmbedExpr(args(0),
        args(1).eval().asInstanceOf[Int])) _))

    ext.injectFunction((FunctionIdentifier("space_saving_topk"),
      info("space_saving_topk",
        "space_saving_topk(item, k) - heavy-hitters sketch aggregate: " +
          "array<struct<item,count,err>> in O(k) memory"),
      arity("space_saving_topk", 2)(args => graft.functions.SpaceSavingAgg(args(0),
        args(1).eval().asInstanceOf[Int]).toAggregateExpression()) _))

    ext.injectFunction((FunctionIdentifier("url_canonicalize"),
      info("url_canonicalize",
        "url_canonicalize(url) - crawl-dedup canonical form: fragment/case/" +
          "default-port/tracking-param/param-order normalization (single-pass kernel)"),
      arity("url_canonicalize", 1)(args => graft.functions.UrlCanonicalizeExpr(args(0))) _))
  }
}
