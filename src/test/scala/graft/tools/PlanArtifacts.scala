package graft.tools

/** Reader for the committed plan-audit artifacts (PLANS*.json,
  * STREAM_PLANS.json) — the flat two-level integer JSON our own audit
  * mains write, parsed with a regex so the test scope needs no JSON
  * dependency. Shared by the in-suite gates (PlanWidthSpec,
  * StreamPlanGateSpec).
  */
object PlanArtifacts {

  /** query -> field -> value; rows with an "error"/"skipped" marker
    * come back without integer fields and are naturally excluded by
    * field lookups.
    */
  def read(path: String): Map[String, Map[String, Long]] = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val row = """"(\w+)":\s*\{([^}]*)\}""".r
    val field = """"(\w+)":\s*(-?\d+)""".r
    row.findAllMatchIn(txt).map { m =>
      m.group(1) -> field.findAllMatchIn(m.group(2))
        .map(f => f.group(1) -> f.group(2).toLong).toMap
    }.toMap
  }
}
