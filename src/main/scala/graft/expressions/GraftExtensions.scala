package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import PipelineExpressions._

/** SparkSessionExtensions entry point: registers the pipeline expressions
  * as SQL functions so `spark.sql("SELECT minhash_sig(...)")` works in any
  * session configured with
  * `spark.sql.extensions=graft.expressions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`). This is the supported
  * extension-injection path for third-party Catalyst expressions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[PipelineExpressions.type].getName, name),
        builder))

    register("shingle_hashes", es => ShingleHashes(es(0), intArg(es(1), "k")))
    register("minhash_sig", es => MinHashSig(es(0), intArg(es(1), "perms")))
    register("jaccard_sets", es => JaccardSets(es(0), es(1)))
    register("simhash_chunks", es => SimHashChunks(es(0)))
    register("dot_exact", es => DotExact(es(0), es(1)))
    register("norm_exact", es => NormExact(es(0)))
    register("lang_id", es => LangId(es(0),
      graft.ops.TextAnalysis.markers.toSeq))
  }
}
