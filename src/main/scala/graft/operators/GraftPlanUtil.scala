package graft.operators

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sample}

/** Shared plan predicates for the canonicalized-plan memo/registry
  * guards (Dedup's persist registry, Cluster's CC memo).
  */
private[graft] object GraftPlanUtil {

  /** True when re-materializing the plan may produce different rows —
    * in which case canonicalized-plan equality must NOT be used as a
    * cache key. Covers both expression-level nondeterminism (rand(),
    * uuid(), monotonically_increasing_id …) and plan-NODE
    * nondeterminism: `Sample` keeps its seed in constructor fields,
    * not expressions, and even a seeded sample is partition-layout-
    * dependent (a changed file listing or AQE split re-deals the
    * rows), so it gets the same treatment.
    */
  def nondeterministic(plan: LogicalPlan): Boolean =
    plan.exists {
      case _: Sample => true
      case p => p.expressions.exists(e => e.exists(!_.deterministic))
    }
}
