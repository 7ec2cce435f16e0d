package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Session-extensions entry point — the idiomatic packaging for the
  * engine's custom Catalyst surface. Install with
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions())`):
  * every custom expression becomes a first-class SQL function on the
  * session (no per-call temp registration), and the
  * [[graft.plans.RewriteHofCosine]] optimizer rule upgrades declarative
  * HOF cosine trees to the codegen'd kernel.
  *
  * [[GraftExtensions.registerAll]] is the imperative equivalent for an
  * already-built session (used by the Column APIs and tests).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functionBuilders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofCosine)
    ext.injectOptimizerRule(_ => graft.plans.RewriteAnnTopK)
  }
}

object GraftExtensions {

  import ExprArgs.literalInt

  /** Name → builder for every custom expression in the engine. */
  val functionBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    CosineSimilarity.functionName ->
      (e => CosineSimilarity(e(0), e(1))),
    LshBuckets.functionName ->
      (e => LshBuckets(e(0), literalInt(e(1), "lsh_buckets tables"),
        literalInt(e(2), "lsh_buckets bits"))),
    MinHashSignature.functionName ->
      (e => MinHashSignature(e(0), literalInt(e(1), "minhash numHashes"))),
    SimHashFingerprint.functionName ->
      (e => SimHashFingerprint(e(0))),
    SimHashMd5Fingerprint.functionName ->
      (e => SimHashMd5Fingerprint(e(0))),
    RepetitionStats.functionName ->
      (e => RepetitionStats(e(0))),
    JaroSimilarity.functionName ->
      (e => JaroSimilarity(e(0), e(1))),
    DeletionNeighborhood.functionName ->
      (e => DeletionNeighborhood(e(0), literalInt(e(1),
        "deletion_neighborhood k"))),
    NormalizeNfc.functionName ->
      (e => NormalizeNfc(e(0))))

  /** Register every function on an existing session (temp-function
    * registry — what the Column APIs do lazily per call).
    */
  def registerAll(spark: SparkSession): Unit =
    functionBuilders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
