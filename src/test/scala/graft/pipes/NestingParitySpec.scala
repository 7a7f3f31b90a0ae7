package graft.pipes

import graft.SparkSpec
import graft.core.Condition.HasPrefix
import org.apache.spark.sql.functions._

/** Literal replays of the reference's own nesting test cases
  * (tests/pipes/test_nesting.py) — same inputs, same expected outputs.
  */
class NestingParitySpec extends SparkSpec {
  import spark.implicits._

  // The reference's nested batch is a dict of LISTS, so its inner Lambda
  // sorts/filters lists; the Spark twin's nested batch is ROWS of the
  // flattened frame — an inner ROW filter mirrors drop_values, and
  // sort-within-group is idiomatically the array-level op (the values ARE
  // the array). Both replays assert the reference's exact expected data.

  test("Nested drop_values levels 1+2 (test_nesting.py:36-54)") {
    val drop = LambdaPipe(_.filter(col("a") < 3 && col("b") < 3), "drop_ge3")
    val df1 = Seq((Seq(1, 2, 3), Seq(1, 2, 3)), (Seq(1, 2, 3), Seq(1, 2, 3)))
      .toDF("a", "b")
    val out1 = NestedPipe(drop, level = 1)(df1)
      .select("a", "b").as[(Seq[Int], Seq[Int])].collect().toSeq
    assert(out1 == Seq((Seq(1, 2), Seq(1, 2)), (Seq(1, 2), Seq(1, 2))))
    val row = Seq(Seq(1, 2, 3), Seq(1, 2, 3))
    val df2 = Seq.fill(3)((row, row)).toDF("a", "b")
    val out2 = NestedPipe(drop, level = 2)(df2)
      .select("a", "b").as[(Seq[Seq[Int]], Seq[Seq[Int]])].collect().toSeq
    val exp = Seq(Seq(1, 2), Seq(1, 2))
    assert(out2 == Seq.fill(3)((exp, exp)))
  }

  test("Nested sort_values levels 1+2 (test_nesting.py:56-71)") {
    val df1 = Seq((Seq(1, 2, 3), Seq(1, 2, 3)), (Seq(1, 2, 3), Seq(1, 2, 3)))
      .toDF("a", "b")
    val out1 = ApplyToCols(c => reverse(array_sort(c)), "rsort",
      Seq("a", "b"))(df1)
      .select("a", "b").as[(Seq[Int], Seq[Int])].collect().toSeq
    assert(out1 == Seq((Seq(3, 2, 1), Seq(3, 2, 1)), (Seq(3, 2, 1), Seq(3, 2, 1))))
    // level 2: the sort applies one depth down (per inner array)
    val row = Seq(Seq(1, 2, 3), Seq(1, 2, 3))
    val df2 = Seq.fill(3)((row, row)).toDF("a", "b")
    val out2 = ApplyToCols(c => transform(c, x => reverse(array_sort(x))),
      "rsort_inner", Seq("a", "b"))(df2)
      .select("a", "b").as[(Seq[Seq[Int]], Seq[Seq[Int]])].collect().toSeq
    val exp = Seq(Seq(3, 2, 1), Seq(3, 2, 1))
    assert(out2 == Seq.fill(3)((exp, exp)))
  }

  test("Expand shapes (test_nesting.py:74-88)") {
    val df = Seq(Tuple1(Seq(1, 2, 3))).toDF("v")
    // axis -1 == innermost == depth 1 for a 1-d column: (3,) -> (3, n)
    val inner2 = ExpandPipe(1, 2, Seq("v"))(df)
      .select("v").as[Seq[Seq[Int]]].head()
    assert(inner2 == Seq(Seq(1, 1), Seq(2, 2), Seq(3, 3)))
    assert(inner2.size == 3 && inner2.forall(_.size == 2))
    // axis 0 wraps the whole value: (3,) -> (n, 3)
    val outer5 = ExpandPipe(0, 5, Seq("v"))(df)
      .select("v").as[Seq[Seq[Int]]].head()
    assert(outer5.size == 5 && outer5.forall(_ == Seq(1, 2, 3)))
  }

  test("flatten_nested levels 1+2 (support/test_nesting.py:12-24)") {
    val df1 = Seq(Seq(1, 2, 3), Seq(4, 5, 6)).toDF("v")
    val f1 = FlattenPipe()(df1).select("v").as[Int].collect().sorted.toSeq
    assert(f1 == Seq(1, 2, 3, 4, 5, 6))
    val df2 = Seq(Seq(Seq(1, 2), Seq(3, 4)), Seq(Seq(5, 6), Seq(7, 8)))
      .toDF("v")
    val f2a = FlattenPipe()(df2).select("v").as[Seq[Int]].collect().toSeq
    assert(f2a.sortBy(_.head) == Seq(Seq(1, 2), Seq(3, 4), Seq(5, 6), Seq(7, 8)))
    val f2b = FlattenPipe(level = 2)(df2).select("v").as[Int]
      .collect().sorted.toSeq
    assert(f2b == (1 to 8))
  }

  test("update x input_filter contract table (test_pipe.py:41-92)") {
    import graft.core.{Condition, Pipe}
    // twin of the reference DummyPipe: emits dummy = <sorted visible keys>
    // + "-" + row tag, so the output proves WHICH columns the kernel saw
    case class DummyPipe(override val update: Boolean,
        override val inputFilter: Option[Condition]) extends Pipe {
      protected def transform(df: org.apache.spark.sql.DataFrame,
          ks: Seq[String]) =
        finish(df, Seq("dummy" ->
          concat(lit(ks.sorted.mkString("")), lit("-"), col("a"))))
    }
    val df = Seq((1, 4), (2, 5), (3, 6)).toDF("a", "b")
    // update=false, no filter -> ONLY the pipe output
    val c1 = DummyPipe(update = false, None)(df)
    assert(c1.columns.toSeq == Seq("dummy") &&
      c1.as[String].collect().sorted.toSeq == Seq("ab-1", "ab-2", "ab-3"))
    // update=true, no filter -> inputs + output
    val c2 = DummyPipe(update = true, None)(df)
    assert(c2.columns.toSeq == Seq("a", "b", "dummy"))
    // update=false, filter In(a) -> kernel saw only 'a'; b NOT restored
    val c3 = DummyPipe(update = false, Some(Condition.In(Seq("a"))))(df)
    assert(c3.columns.toSeq == Seq("dummy") &&
      c3.as[String].collect().sorted.toSeq == Seq("a-1", "a-2", "a-3"))
    // update=true, filter In(a) -> filtered-out 'b' IS restored
    val c4 = DummyPipe(update = true, Some(Condition.In(Seq("a"))))(df)
    assert(c4.columns.toSeq == Seq("a", "b", "dummy") &&
      c4.select("dummy").as[String].collect().sorted.toSeq ==
        Seq("a-1", "a-2", "a-3"))
  }

  test("Gate branch table (test_pipelines.py:6-21)") {
    import graft.core.SchemaCondition
    val df = Seq((1, 4), (2, 5), (3, 6)).toDF("a", "b")
    // (True, Identity, no alt) -> input unchanged
    val t = Gate(SchemaCondition.Static(true), IdentityPipe())(df)
    assert(t.columns.toSeq == Seq("a", "b") && t.count() == 3)
    // (False, Identity, no alt) -> EMPTY batch
    val f = Gate(SchemaCondition.Static(false), IdentityPipe())(df)
    assert(f.columns.isEmpty && f.count() == 0)
    // (False, Identity, alt=Lambda{z}) -> alt output
    val alt = LambdaPipe(d => d.sparkSession.range(3).select(col("id").as("z")),
      "mk_z")
    val a = Gate(SchemaCondition.Static(false), IdentityPipe(), Some(alt))(df)
    assert(a.columns.toSeq == Seq("z") && a.count() == 3)
    // schema-dependent condition, true and false
    val ct = Gate(SchemaCondition.HasKeys(Seq("a")), IdentityPipe())(df)
    assert(ct.columns.toSeq == Seq("a", "b"))
    val cf = Gate(SchemaCondition.HasKeys(Seq("missing")), IdentityPipe())(df)
    assert(cf.columns.isEmpty && cf.count() == 0)
  }

  test("ApplyAsFlatten(Identity) is identity on nested fields (test_nesting.py:15-33)") {
    val df = Seq(
      (Seq("a", "b", "c"), 1), (Seq("d", "e", "f"), 2))
      .toDF("document.text", "question")
    val out = ApplyAsFlatten(IdentityPipe(),
      inputFilter = Some(HasPrefix("document.")))(df)
    val got = out.select(graft.core.Pipe.qcol("document.text"), col("question"))
      .as[(Seq[String], Int)].collect().toSeq.sortBy(_._2)
    assert(got == Seq((Seq("a", "b", "c"), 1), (Seq("d", "e", "f"), 2)))
  }
}
