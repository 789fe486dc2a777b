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

  private[functions] val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine", "cosine similarity of two float vectors",
      es => CosineSimilarity(es(0), es(1))),
    ("iff", "Snowflake IFF(cond, a, b)",
      es => If(es(0), es(1), es(2))),
    ("current_account", "session account from conf graft.current_account",
      _ => CurrentAccount()))

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
