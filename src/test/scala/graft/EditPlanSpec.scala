package graft

import org.apache.spark.sql.execution.SparkPlan

/** Plan-shape guard for d_edit_distance: the banded Levenshtein DP must be
  * evaluated ONCE per blocked pair — as a post-join projection — never
  * inside the join condition (where the optimizer loves to push the ≤120
  * filter by alias substitution, re-running the DP per surviving pair). */
class EditPlanSpec extends SparkSpec {

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val more = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        nodes(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => nodes(s.plan)
      case _ => Nil
    }
    p +: (p.children.flatMap(nodes) ++ more)
  }

  test("the DP runs once, in a projection above the join — not in the join condition") {
    val df = graft.SparkEntry.queries("d_edit_distance")(spark, sf)
    df.collect() // finalize AQE
    val ns = nodes(df.queryExecution.executedPlan)

    val joinConds = ns.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        j.condition.map(_.toString).getOrElse("")
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.condition.map(_.toString).getOrElse("")
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        j.condition.map(_.toString).getOrElse("")
    }
    assert(joinConds.nonEmpty, "expected a blocked-pair join in the plan")
    assert(!joinConds.exists(_.contains("levenshtein")),
      s"the DP leaked into a join condition:\n${joinConds.mkString("\n")}")

    val dpProjections = ns.count {
      case p: org.apache.spark.sql.execution.ProjectExec =>
        p.projectList.exists(_.toString.contains("levenshtein"))
      case _ => false
    }
    assert(dpProjections == 1,
      s"expected exactly one DP projection, got $dpProjections")

    // and no FILTER recomputes it (the ≤120 test must reference the
    // projected attribute, not the expression)
    val dpFilters = ns.count {
      case f: org.apache.spark.sql.execution.FilterExec =>
        f.condition.toString.contains("levenshtein")
      case _ => false
    }
    assert(dpFilters == 0, "the threshold filter must test the projected column")
  }
}
