package org.apache.spark.ml

/** Minimal bridge into spark.ml's package-private PipelineModel
  * constructor, needed for the reference's "serving surgery" (rebuilding
  * a pipeline minus the label indexer, train.py:349-351). Public Spark
  * API offers no other way to construct a PipelineModel from existing
  * fitted stages.
  */
object GraftMlBridge {
  def pipelineModel(uid: String, stages: Array[Transformer]): PipelineModel =
    new PipelineModel(uid, stages)
}
