package graft.ml

import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.ml.PipelineModel

/** Local model registry replacing the reference's MLflow server
  * (U7/U10/U13 — /root/reference/udf/src/main/java/com/getindata/ksql/
  * MlflowModelResolver.java:115-117: lookup of the latest version in
  * stage "Production").
  *
  * Layout: <root>/<name>/<version>/ {model/ (Spark-native PipelineModel
  * save), metadata.json (signature), STAGE (promotion marker)}.
  */
class Registry(val rootDir: String) {

  private def nameDir(name: String): Path = Paths.get(rootDir, name)

  /** Save a model as the next version of `name`, promoted to `stage`.
    * Writes the signature (input column names/types + output column) the
    * way the reference logs the MLmodel signature (train.py:352-362).
    */
  def save(
      name: String,
      model: PipelineModel,
      inputCols: Seq[(String, String)],
      outputCol: String,
      stage: String = "Production"): Int = {
    val version = latestVersion(name).getOrElse(0) + 1
    val vdir = nameDir(name).resolve(version.toString)
    Files.createDirectories(vdir)
    model.write.overwrite().save(vdir.resolve("model").toString)
    val inputsJson = inputCols
      .map { case (n, t) => s"""{"name": "$n", "type": "$t"}""" }
      .mkString("[", ", ", "]")
    Files.writeString(vdir.resolve("metadata.json"),
      s"""{"inputs": $inputsJson, "output": "$outputCol"}""")
    Files.writeString(vdir.resolve("STAGE"), stage)
    version
  }

  /** Numeric version subdirs of a model, with the directory stream
    * closed (Files.list leaks an fd per call otherwise).
    */
  private def versions(name: String): Seq[Int] = {
    val d = nameDir(name)
    if (!Files.isDirectory(d)) Nil
    else {
      val stream = Files.list(d)
      try stream.iterator().asScala
        .flatMap(p => scala.util.Try(p.getFileName.toString.toInt).toOption)
        .toSeq
      finally stream.close()
    }
  }

  private def latestVersion(name: String): Option[Int] = versions(name).maxOption

  /** U7 — latest version in stage "Production" (or requested stage). */
  def latestProduction(name: String, stage: String = "Production"): Option[Int] =
    versions(name).filter { v =>
      val marker = nameDir(name).resolve(v.toString).resolve("STAGE")
      Files.exists(marker) && Files.readString(marker).trim == stage
    }.maxOption

  /** U10 analog — load the production model + its signature.
    * Throws if no production version exists (caller turns this into
    * null-on-error per U6).
    */
  def load(name: String): LoadedModel = {
    val v = latestProduction(name).getOrElse(
      throw new IllegalArgumentException(s"no Production version of model '$name'"))
    val vdir = nameDir(name).resolve(v.toString)
    val meta = Files.readString(vdir.resolve("metadata.json"))
    LoadedModel(
      PipelineModel.load(vdir.resolve("model").toString),
      Signature.parse(meta),
      name, v)
  }
}

/** U11 — model holder (reference MLModel.java:6-36). */
case class LoadedModel(
    model: PipelineModel,
    signature: Signature,
    name: String,
    version: Int)

/** Model I/O signature (reference MlflowModelResolver.java:62-94: inputs
  * parsed from MLmodel YAML; string/integer/long accepted, anything else
  * rejected — we preserve the strict unknown-type error, U9).
  */
case class Signature(inputs: Seq[(String, String)], output: String) {
  def validate(): Unit = inputs.foreach { case (n, t) =>
    if (!Signature.SupportedTypes.contains(t))
      throw new IllegalArgumentException(
        s"unsupported signature type '$t' for input '$n'")
  }
}

object Signature {
  val SupportedTypes = Set("string", "integer", "long")

  /** Minimal parser for the metadata.json this registry writes. */
  def parse(json: String): Signature = {
    val inputRe = """\{"name": "([^"]+)", "type": "([^"]+)"\}""".r
    val outputRe = """"output": "([^"]+)"""".r
    val inputs = inputRe.findAllMatchIn(json)
      .map(m => (m.group(1), m.group(2))).toSeq
    val output = outputRe.findFirstMatchIn(json)
      .map(_.group(1))
      .getOrElse(throw new IllegalArgumentException("metadata.json missing output"))
    val sig = Signature(inputs, output)
    sig.validate()
    sig
  }
}
