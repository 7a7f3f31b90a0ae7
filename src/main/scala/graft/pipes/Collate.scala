package graft.pipes

import graft.core.{Condition, Pipe, SchemaCondition}
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Collation / batch-assembly pipes.
  * Reference: warp_pipes/pipes/collate.py (L1-L7 in SURVEY §2.5).
  *
  * A DataFrame IS column-major, so the reference's rows→columns transpose
  * (`Collate`, collate.py:58-63) is the identity at the engine level; what
  * survives as real operators are batch assembly (rows → array groups),
  * de-collation (explode) and padding.
  */

/** L1 `Collate` as a dataset op: assemble fixed-size batches of `batchSize`
  * rows into one array-typed row per batch (rows→columns transpose made
  * explicit). Requires a total order (`orderCol`) like every reshape.
  */
case class CollatePipe(batchSize: Int, keys: Seq[String], orderCol: String) extends Pipe {
  override def params = Map("batchSize" -> batchSize.toString,
    "keys" -> keys.sorted.mkString(","), "orderCol" -> orderCol)
  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame =
    NestPipe(batchSize, keys, orderCol)(df.select(keys.map(qcol): _*))
}

/** L2 `DeCollate` (collate.py:70-86): columns→rows; all array columns must
  * have equal per-row lengths (the reference asserts; arrays_zip pads with
  * null instead — we keep the assert via a runtime check expression).
  */
case class DeCollatePipe(keys: Seq[String]) extends Pipe {
  override def params = Map("keys" -> keys.sorted.mkString(","))
  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame =
    NestingOps.flattenOnce(df, keys).drop(NestingOps.Pos)
}

/** L3 `FirstEg` (collate.py:89-99). */
case class FirstEg() extends Pipe {
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = df.limit(1)
}

/** L4 `ApplyToEachExample` (collate.py:102-115): map a pipe over single
  * examples. In Spark a row-preserving pipe already applies per row; this
  * wrapper exists for parity and ENFORCES the per-example contract: the
  * inner pipe must keep row count (checked lazily via a guard column when
  * `checked`).
  */
case class ApplyToEachExample(pipe: Pipe, checked: Boolean = false) extends Pipe {
  override def children = Seq(pipe)
  override def params = Map("checked" -> checked.toString)
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    val out = pipe(df)
    if (!checked) out
    else {
      // Lazy contract check (no job at plan-build, keeping the pipe
      // algebra lazy): a one-row guard frame carries both counts; its
      // filter raises at EXECUTION time when they differ, and the
      // cross join with one guaranteed row is row-preserving. Opt-in
      // cost unchanged from the eager version: one extra pass over df
      // and the inner output for the two count aggregates.
      val guard = df.agg(count(lit(1)).as("__aee_in__"))
        .crossJoin(out.agg(count(lit(1)).as("__aee_out__")))
        .filter(when(col("__aee_in__") === col("__aee_out__"), lit(true))
          .otherwise(raise_error(concat(
            lit(s"ApplyToEachExample: inner pipe ${pipe.name} changed row count "),
            col("__aee_in__"), lit(" -> "), col("__aee_out__"))).cast("boolean")))
        .select(lit(1).as("__aee_ok__"))
      out.crossJoin(guard).drop("__aee_ok__")
    }
  }
}

/** L5 `to_tensor_op` (collate.py:118-134): lists → tensors. In Spark the
  * single columnar representation makes this a typed cast of array
  * columns (SURVEY L5) — e.g. int lists to float tensors for a model
  * input.
  */
case class ToTensorPipe(keys: Seq[String], elementType: String = "double")
    extends Pipe {
  override def update: Boolean = true
  override def params = Map("keys" -> keys.sorted.mkString(","),
    "elementType" -> elementType)
  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame =
    finish(df, keys.map(k => k -> qcol(k).cast(s"array<$elementType>")))
}

/** Padding scope for [[PaddingPipe]]: what population the "max length"
  * aggregate ranges over.
  */
sealed trait PadScope { def tag: String }
object PadScope {
  /** Corpus-global max (one 1-row aggregate broadcast back). Simple and
    * gate-stable, but on a 100 TB corpus ONE pathological document
    * inflates EVERY row's arrays to its length — use [[PerGroup]] there.
    */
  case object Global extends PadScope { val tag = "global" }

  /** The reference's actual semantics (collate.py:137-178 pads to the max
    * of the ~100-row collate BATCH, never the corpus): pad within
    * `floor(global_rank / batchSize)` groups of `orderCol` order. One
    * outlier then inflates only its own batch — write amplification is
    * bounded by batchSize, not corpus size.
    */
  final case class PerGroup(batchSize: Int, orderCol: String) extends PadScope {
    require(batchSize > 0, "batchSize must be positive")
    def tag = s"perGroup($batchSize,$orderCol)"
  }
}

/** L6 `Padding` (collate.py:137-178): right-pad each matched array column to
  * the scope's max length. Fill values: `padTokenId` for `*input_ids`, 0 for
  * `*attention_mask`/masks, overridable per key via `specialPaddingTokens`
  * (mirrors `special_padding_tokens`).
  *
  * Scale notes: in [[PadScope.Global]] mode the max is a 1-row aggregate
  * broadcast back via crossJoin — no window over a single partition, no
  * skew. In [[PadScope.PerGroup]] mode the rank comes from the scale-safe
  * single-lineage [[NestingOps.withGlobalRank]] and the per-batch max is a
  * window partitioned by batch id — one hash shuffle on `__grp__`, each
  * partition-group exactly batchSize rows (no skew by construction).
  *
  * RECOMMENDED DEFAULT AT SCALE: `PadScope.PerGroup` — it is both the
  * reference's actual per-batch semantics AND the bounded-amplification
  * choice (one pathological document inflates batchSize rows, not the
  * corpus). `Global` stays the constructor default only because its
  * output is order-independent, which external oracles can replay; a
  * 100 TB pipeline should pass an explicit PerGroup scope.
  */
case class PaddingPipe(
    keys: Seq[String],
    padTokenId: Int = 0,
    specialPaddingTokens: Map[String, Int] = Map.empty,
    scope: PadScope = PadScope.Global) extends Pipe {
  override def params = Map(
    "keys" -> keys.sorted.mkString(","),
    "padTokenId" -> padTokenId.toString,
    "special" -> specialPaddingTokens.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(","),
    "scope" -> scope.tag)
  override def update: Boolean = true

  private def fillFor(key: String): Int =
    specialPaddingTokens.getOrElse(key,
      if (key.endsWith("attention_mask") || key.endsWith("mask")) 0 else padTokenId)

  private def padTo(df: DataFrame, maxLen: Column): DataFrame = {
    val outs = keys.map { k =>
      val fill = lit(fillFor(k))
      val elemType = df.schema(k).dataType.asInstanceOf[ArrayType].elementType
      k -> concat(qcol(k),
        array_repeat(fill.cast(elemType), (maxLen - size(qcol(k))).cast("int")))
    }
    finish(df, outs)
  }

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val lens = keys.map(k => coalesce(max(size(qcol(k))), lit(0)))
    scope match {
      case PadScope.Global =>
        val maxes = df.agg(
          (if (lens.size == 1) lens.head else greatest(lens: _*)).as("__maxlen__"))
        padTo(df.crossJoin(broadcast(maxes)), col("__maxlen__"))
          .drop("__maxlen__")
      case PadScope.PerGroup(batchSize, orderCol) =>
        val ranked = NestingOps.withGlobalRank(df, orderCol, "__rank__")
          .withColumn("__grp__", (col("__rank__") / batchSize).cast("long"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("__grp__")
        val grpLens = keys.map(k => coalesce(max(size(qcol(k))).over(w), lit(0)))
        val withMax = ranked.withColumn("__maxlen__",
          if (grpLens.size == 1) grpLens.head else greatest(grpLens: _*))
        padTo(withMax, col("__maxlen__"))
          .drop("__rank__", "__grp__", "__maxlen__")
    }
  }
}

/** L7 `CollateField` (collate.py:181-268): composite — gate on the presence
  * of `field.*` columns, pad the token keys of that field, leave the rest.
  * The reference's collate/prefix dance disappears (columns stay columnar);
  * padding + optional include/exclude projection is what remains.
  */
case class CollateFieldPipe(
    field: String,
    padTokenId: Int = 0,
    exclude: Seq[String] = Nil,
    includeOnly: Seq[String] = Nil) extends Pipe {
  override def params = Map("field" -> field, "padTokenId" -> padTokenId.toString,
    "exclude" -> exclude.sorted.mkString(","), "includeOnly" -> includeOnly.sorted.mkString(","))
  override def update: Boolean = true
  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    if (!SchemaCondition.HasKeyWithPrefix(s"$field.")(df.schema)) return df
    val fieldKeys = df.columns.toSeq.filter(_.startsWith(s"$field."))
      .filterNot(k => exclude.contains(k.stripPrefix(s"$field.")))
      .filter(k => includeOnly.isEmpty || includeOnly.contains(k.stripPrefix(s"$field.")))
    val padKeys = fieldKeys.filter { k =>
      val short = k.stripPrefix(s"$field.")
      (short == "input_ids" || short == "attention_mask") &&
        df.schema(k).dataType.isInstanceOf[ArrayType]
    }
    if (padKeys.isEmpty) df else PaddingPipe(padKeys, padTokenId)(df)
  }
}
