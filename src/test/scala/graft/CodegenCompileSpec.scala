package graft

/** Codegen-compilation gate for every native graft expression (VERDICT r8
  * directive 2).
  *
  * Round 8 shipped a predicate whose generated Java referenced
  * `BloomFns.MODULE$` — Janino rejected it and Spark SILENTLY fell back to
  * interpreted `eval` on every fact row, i.e. the plan the docs claimed
  * ("codegen'd scan-side probe") was not the plan that ran. Fallback is a
  * WARN, not a failure, so nothing caught it.
  *
  * This spec makes that class of defect a hard test failure: it disables
  * BOTH fallback paths —
  *   - `spark.sql.codegen.fallback=false`  (whole-stage codegen: compile
  *     errors rethrow instead of silently re-executing the child plan)
  *   - `spark.sql.codegen.factoryMode=CODEGEN_ONLY`  (expression-level
  *     projections/predicates: `CodeGeneratorWithInterpretedFallback`
  *     throws instead of interpreting)
  * — then evaluates every SQL-registered graft expression over NON-FOLDABLE
  * inputs (every argument chain roots in a column, so constant folding
  * cannot evaluate the expression at optimize time and skip codegen).
  */
class CodegenCompileSpec extends SparkSpecBase {

  /** One invocation per scalar graft expression, over columns `t` (text)
    * and `tok` (short token) so nothing is foldable. Aggregates
    * (graft_minhash/kmv/cms/bloom) are TypedImperativeAggregate — no
    * doGenCode to gate; their scalar kernels are all covered below. */
  private val invocations: Seq[(String, String)] = Seq(
    // NOTE: inputs deliberately avoid higher-order functions (transform/
    // filter lambdas are CodegenFallback and would evict the whole
    // projection from the codegen span, making this gate vacuous).
    "graft_cosine" ->
      "graft_cosine(cast(split(nums, ' ') as array<float>), cast(split(nums, ' ') as array<float>))",
    "graft_shingles" -> "graft_shingles(t, 2)",
    "graft_minhash_arr" -> "graft_minhash_arr(graft_shingles(t, 2), 8)",
    "graft_bands" -> "graft_bands(graft_minhash_arr(graft_shingles(t, 2), 8), 4, 2)",
    "graft_cms_bucket" -> "graft_cms_bucket(tok, 1, 64)",
    "graft_bloom_might_contain" ->
      "graft_bloom_might_contain(unhex(substring(concat('0f0f0f0f0f0f0f0f', tok), 1, 16)), tok, 3)",
    "graft_simhash" -> "graft_simhash(t)",
    "graft_chunkstats" -> "graft_chunkstats(t, 8)",
    "graft_chunks" -> "graft_chunks(t, 8)",
    "graft_winnow" -> "graft_winnow(t, 8, 4)",
    "graft_winnowstats" -> "graft_winnowstats(t, 8, 4)",
    "graft_hash_embed" -> "graft_hash_embed(t, 16)",
    "graft_hash64" -> "graft_hash64(t)",
    "graft_nfc" -> "graft_nfc(t)")

  private def withNoFallback[A](body: => A): A = {
    val conf = spark.conf
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try body
    finally {
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(v =>
        conf.set("spark.sql.codegen.fallback", v))
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(v =>
        conf.set("spark.sql.codegen.factoryMode", v))
    }
  }

  test("every graft expression compiles under codegen (no interpreter fallback possible)") {
    withNoFallback {
      invocations.foreach { case (name, sql) =>
        val df = spark.range(2).selectExpr(
            "concat('one two three four five six seven eight nine ten ', id) as t",
            "concat('tok', id) as tok",
            "concat(id, ' ', id + 1, ' ', id + 2) as nums")
          .selectExpr(s"$sql as out")
        // The graft call must actually sit inside a whole-stage codegen span —
        // otherwise this gate would assert nothing about generated code.
        val inSpan = df.queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec
            if w.toString.contains("graft_") => w
        }
        assert(inSpan.nonEmpty,
          s"$name: graft call not inside a WholeStageCodegen span; gate is vacuous\n" +
            df.queryExecution.executedPlan.toString)
        val rows = df.collect()   // throws on any Janino compile failure
        assert(rows.length === 2, s"$name: expected 2 rows")
      }
    }
  }

  test("codegen'd graft expressions agree with interpreted eval row-for-row") {
    // Belt and braces: the same invocations evaluated CODEGEN_ONLY vs
    // NO_CODEGEN must match exactly — a doGenCode that compiles but
    // diverges from eval would corrupt results silently.
    val base = () => spark.range(8).selectExpr(
      "concat('one two three four five six seven eight nine ten word', id, ' tail') as t",
      "concat('tok', id) as tok",
      "concat(id, ' ', id + 1, ' ', id + 2) as nums")
    invocations.foreach { case (name, sql) =>
      val codegen = withNoFallback {
        base().selectExpr(s"cast($sql as string) as out").collect().map(_.getString(0)).toSeq
      }
      val conf = spark.conf
      val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
      val prevWhole = conf.getOption("spark.sql.codegen.wholeStage")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      conf.set("spark.sql.codegen.wholeStage", "false")
      val interpreted =
        try base().selectExpr(s"cast($sql as string) as out").collect().map(_.getString(0)).toSeq
        finally {
          prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(v =>
            conf.set("spark.sql.codegen.factoryMode", v))
          prevWhole.fold(conf.unset("spark.sql.codegen.wholeStage"))(v =>
            conf.set("spark.sql.codegen.wholeStage", v))
        }
      assert(codegen === interpreted, s"$name: codegen vs interpreted divergence")
    }
  }
}
