package graft.tools

import graft.SparkSpec

/** In-suite plan gate: the two plan properties that must hold for EVERY
  * batch query are asserted on each query's initial physical plan, so a
  * regression fails `sbt test` instead of waiting for the next manual
  * PlanAudit diff. Initial (pre-execution) plans suffice here: join
  * STRATEGY selection is static — AQE upgrades sort-merge to broadcast
  * at runtime but never introduces a CartesianProduct or a
  * BroadcastNestedLoopJoin that the initial plan lacked — and not
  * executing keeps the gate to planning cost (~seconds for the whole
  * surface at sf0.001; the adaptive operators' bounded estimator probes
  * are the only jobs run).
  *
  * Nested-loop joins are allowlisted per query: every entry is the
  * documented one-row-stats-relation broadcast (a scalar threshold /
  * global aggregate crossJoined back onto the data — bounded build side
  * by construction). A NEW query acquiring a BNLJ, or an allowlisted
  * one acquiring MORE of them, fails until the allowlist is consciously
  * updated. CartesianProduct has no allowlist: nothing in the surface
  * may ever plan one.
  */
class PlanGateSpec extends SparkSpec {

  // query -> max BroadcastNestedLoopJoin count (one-row stats joins)
  private val bnljAllowed: Map[String, Int] = Map(
    "q11_important_parts" -> 1, "q22_idle_customers" -> 1,
    "q_auc" -> 4, "q_auc_model" -> 4, "q_bm25" -> 1,
    // 3 in the INITIAL plan; AQE converts one at runtime (PLANS.json
    // records 2 in the final plan) — all three are one-row stat joins
    "q_corpus_clusters" -> 3, "q_corpus_clusters_fixed" -> 3,
    "q_curriculum_order" -> 2, "q_domain_keyness" -> 1,
    "q_dsir_weights" -> 1, "q_embed_covariance" -> 1,
    "q_histogram" -> 1, "q_lm_bigram" -> 1, "q_lm_score" -> 1,
    "q_sim_ivf" -> 1, "q_sim_pq" -> 1, "q_sim_topk" -> 1,
    "q_sim_topk_auto" -> 1, "q_simhash_exact" -> 1,
    "q_tfidf_keywords" -> 1, "q_theta_overlap" -> 1,
    "q_vocab_coverage" -> 1)

  test("no batch query plans a CartesianProduct; BNLJ only as allowlisted") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach {
      case (name, _) if name.startsWith("q_stream") => // streaming: covered
      case (name, fn) =>
        val plan = fn(spark.newSession(), sf0001)
          .queryExecution.executedPlan.toString
        val c = PlanAudit.countsOf(plan)
        if (c.cartesianProducts > 0)
          offenders += s"$name: ${c.cartesianProducts} CartesianProduct"
        if (c.nestedLoopJoins > bnljAllowed.getOrElse(name, 0))
          offenders += s"$name: ${c.nestedLoopJoins} BNLJ " +
            s"(allowed ${bnljAllowed.getOrElse(name, 0)})"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("the allowlist names only real queries (no stale entries)") {
    val unknown = bnljAllowed.keySet -- graft.SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"stale allowlist entries: $unknown")
  }
}
