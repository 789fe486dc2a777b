package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, If, Literal}
import org.apache.spark.sql.types.StringType

/** SQL-dialect surface: registers graft's custom expressions plus thin
  * Snowflake-dialect aliases in a session's FunctionRegistry.
  *
  * Two entry points:
  *   - `GraftExtensions` for `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (the SparkSessionExtensions route — cluster-wide, set at session build);
  *   - `GraftFunctions.register(spark)` for sessions we are handed and
  *     cannot configure (idempotent; used by the query packs).
  *
  * Registered functions:
  *   - `graft_cosine(a, b)`   — native codegen cosine (CosineSimilarity)
  *   - `iff(c, a, b)`         — Snowflake's IFF (dp_setup.sql:46) as `If`
  *   - `current_account()`    — session-identity builtin (dp_demo.sql:224):
  *     reads conf `graft.current_account` at plan time; foldable, so it
  *     constant-folds into the plan exactly like Snowflake's per-session
  *     constant (SURVEY §4 "constant folding of session constants").
  */
object GraftFunctions {

  /** Session conf key carrying the current account identity. */
  val AccountConfKey = "graft.current_account"

  /** Leaf that folds to the session's account at optimization time. */
  case class CurrentAccount() extends org.apache.spark.sql.catalyst.expressions.LeafExpression {
    override def dataType: StringType.type = StringType
    override def nullable: Boolean = false
    override def foldable: Boolean = true
    override def prettyName: String = "current_account"
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      org.apache.spark.unsafe.types.UTF8String.fromString(
        org.apache.spark.sql.internal.SQLConf.get
          .getConfString(AccountConfKey, "UNKNOWN"))
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      // foldable ⇒ ConstantFolding normally replaces this before codegen;
      // fall back to embedding the folded literal if it survives.
      val lit = Literal(eval(null), StringType)
      lit.genCode(ctx)
    }
  }

  /** Conf-key prefix `system$pipe_status` reads through (one key per
    * pipe name; the pipeline publishes its JSON there).
    */
  val PipeStatusConfPrefix = "graft.pipe_status."

  /** `system$pipe_status('<pipe>')` (dp_demo.sql:52,132) as a foldable
    * leaf over session conf, mirroring `CurrentAccount`: the pipeline
    * publishes its status JSON to conf `graft.pipe_status.<pipe>` and
    * the SQL surface reads it as a per-session constant. The dialect
    * rewriter maps the `system$...` spelling to this name (a `$` inside
    * a function identifier doesn't survive parsing).
    */
  case class PipeStatus(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: StringType.type = StringType
    override def nullable: Boolean = false
    override def foldable: Boolean = child.foldable
    override def prettyName: String = "graft_pipe_status"
    override protected def nullSafeEval(pipe: Any): Any =
      org.apache.spark.unsafe.types.UTF8String.fromString(
        org.apache.spark.sql.internal.SQLConf.get.getConfString(
          PipeStatusConfPrefix + pipe.toString,
          """{"executionState":"STOPPED","pendingFileCount":0}"""))
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val lit = Literal(nullSafeEval(child.eval(null)), StringType)
      lit.genCode(ctx)
    }
    override protected def withNewChildInternal(newChild: Expression): PipeStatus =
      copy(child = newChild)
  }

  private[functions] val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine", "cosine similarity of two float vectors",
      es => CosineSimilarity(es(0), es(1))),
    ("iff", "Snowflake IFF(cond, a, b)",
      es => If(es(0), es(1), es(2))),
    ("current_account", "session account from conf graft.current_account",
      _ => CurrentAccount()),
    ("graft_pipe_status", "system$pipe_status from conf graft.pipe_status.<pipe>",
      es => PipeStatus(es(0))))

  /** Idempotently register all functions in the given session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    fns.foreach { case (name, usage, builder) =>
      reg.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", null, name, usage, ""),
        builder)
    }
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.fns.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", null, name, usage, ""),
        builder))
    }
  }
}
