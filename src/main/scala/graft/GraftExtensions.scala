package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{ConvertError, CosineSimilarity, DotProduct, StrictToJson, WinnowFingerprints}

/** Session extension wiring: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`) registers the engine's
  * custom Catalyst expressions as SQL functions in every session the
  * extension builds — the injection path Spark intends for libraries, so
  * no imperative registerAll call is needed per session. Also injects
  * [[graft.plans.RangeJoinRewrite]]: with `spark.graft.rangeJoin.binWidth`
  * set, naive point-in-interval theta joins plan as binned equi-joins
  * automatically (declare the range join; the library picks the physical
  * shape — the whole-operator Rule/Strategy extension path).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    e.injectFunction((FunctionIdentifier("strict_to_json"),
      info("strict_to_json", "strict schema-driven struct->json conversion"),
      (es: Seq[Expression]) => StrictToJson(es.head)))
    e.injectFunction((FunctionIdentifier("convert_error"),
      info("convert_error", "conversion error message or NULL when clean"),
      (es: Seq[Expression]) => ConvertError(es.head)))
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "codegen'd dot product over array<double>"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "codegen'd cosine similarity over array<double>"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "winnowing rolling-hash fingerprints: winnow_fingerprints(text, k, w)"),
      (es: Seq[Expression]) => {
        def intLit(e: Expression, name: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"winnow_fingerprints: $name must be an integer literal, got $other")
        }
        WinnowFingerprints(es(0), intLit(es(1), "k"), intLit(es(2), "w"))
      }))
  }
}
