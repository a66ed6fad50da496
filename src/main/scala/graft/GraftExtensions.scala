package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.functions.{CosineSimilarity, H60, H60Array, IntSqDist, MinGramHash, MinHashSig, MinHashSigLongs, SimHash64, WordShingles60}

/** Engine extension point: registers graft's native functions with a
  * session. Either install at build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions` — or call
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(CosineSimilarity.descriptor)
    e.injectFunction(IntSqDist.descriptor)
    e.injectFunction(SimHash64.descriptor)
    e.injectFunction(MinGramHash.descriptor)
    e.injectFunction(MinHashSig.descriptor)
    e.injectFunction(H60.descriptor)
    e.injectFunction(H60Array.descriptor)
    e.injectFunction(WordShingles60.descriptor)
    e.injectFunction(MinHashSigLongs.descriptor)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.AsOfJoinFilterPushdown)
  }
}

object GraftExtensions {
  /** Idempotent post-hoc registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    Seq(CosineSimilarity.descriptor, IntSqDist.descriptor, SimHash64.descriptor,
      MinGramHash.descriptor, MinHashSig.descriptor, H60.descriptor,
      H60Array.descriptor, WordShingles60.descriptor,
      MinHashSigLongs.descriptor).foreach {
      case (ident, _, builder) =>
        spark.sessionState.functionRegistry
          .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
    // the planner/optimizer views include BOTH injection routes
    // (builder extensions and experimental methods) — checking only
    // spark.experimental would re-add and double plan/optimize work on
    // sessions already built withExtensions
    if (!spark.sessionState.planner.strategies
        .contains(graft.plans.AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        graft.plans.AsOfJoinStrategy +: spark.experimental.extraStrategies
    }
    if (!spark.sessionState.optimizer.batches
        .exists(_.rules.contains(graft.plans.AsOfJoinFilterPushdown))) {
      spark.experimental.extraOptimizations =
        graft.plans.AsOfJoinFilterPushdown +: spark.experimental.extraOptimizations
    }
  }
}
