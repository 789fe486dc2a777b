package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memos of SERVING-ARTIFACT state the query entries
  * re-loaded on every execution (r20, guide §1/§5: the b13-b15 and
  * n27/n28 steady states ran 40-53 Spark JOBS each, the largest block
  * of them artifact re-loads — `IvfPq.loadModel` is two sorted
  * collects, `loadKnobs` one, `TokenEmbeddingTable.load` a validation
  * aggregate — all over artifacts that are IMMUTABLE once their fill
  * completes).
  *
  * Scope and safety: keys are (applicationId, artifact dir). Every dir
  * cached here is a per-session temp artifact built exactly once by a
  * `CacheFills`-timed fill (the sqDirCache discipline) and never
  * mutated afterwards — retrain/append lifecycle faces (which DO swap
  * artifact state in place) run inside the fill or in their own specs
  * and must keep calling the uncached loaders. This is the
  * model-resident serving shape: a serving tier loads its model once
  * per process, not once per query (the kmCache/nlCache discipline
  * extended to the load side).
  */
private[queries] object ServingCache {

  private val models = new ConcurrentHashMap[
    (String, String), (Seq[Array[Long]], Seq[Seq[Array[Long]]])]()

  def ivfPqModel(s: SparkSession, dir: String):
      (Seq[Array[Long]], Seq[Seq[Array[Long]]]) =
    models.computeIfAbsent((s.sparkContext.applicationId, dir),
      _ => graft.operators.IvfPq.loadModel(s, dir))

  private val knobs = new ConcurrentHashMap[
    (String, String), Option[graft.operators.IvfPq.Knobs]]()

  def ivfPqKnobs(s: SparkSession, dir: String):
      Option[graft.operators.IvfPq.Knobs] =
    knobs.computeIfAbsent((s.sparkContext.applicationId, dir),
      _ => graft.operators.IvfPq.loadKnobs(s, dir))

  private val tokenTables = new ConcurrentHashMap[(String, String), DataFrame]()

  def tokenTable(s: SparkSession, dir: String): DataFrame =
    tokenTables.computeIfAbsent((s.sparkContext.applicationId, dir),
      _ => graft.operators.TokenEmbeddingTable.load(s, dir))
}
