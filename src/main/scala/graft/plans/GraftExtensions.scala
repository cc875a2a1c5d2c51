package graft.plans

import graft.functions.{CharEntropy, CosineSimilarity, JaroWinkler, SubTokenCount}
import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: launch with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` to make the
  * engine's native expressions available to pure-SQL users on every session
  * of the cluster (the harness registers them at runtime instead — see
  * [[CosineSimilarity.register]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((CosineSimilarity.ident, CosineSimilarity.info,
      CosineSimilarity.builder))
    ext.injectFunction((CharEntropy.ident, CharEntropy.info,
      CharEntropy.builder))
    ext.injectFunction((SubTokenCount.ident, SubTokenCount.info,
      SubTokenCount.builder))
    ext.injectFunction((JaroWinkler.ident, JaroWinkler.info,
      JaroWinkler.builder))
    ext.injectOptimizerRule(_ => LevenshteinGuard)
    // the per-group top-k physical operator: sessions built with the
    // extensions plan TopKPerGroupPlan without needing the runtime
    // experimental-strategies registration in TopKPerGroup.apply
    ext.injectPlannerStrategy(_ => TopKPerGroup.Strategy)
  }
}
