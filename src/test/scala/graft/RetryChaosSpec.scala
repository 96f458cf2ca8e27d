package graft

import org.apache.spark.sql.functions._

/** Smoke for the retry-chaos seam (the real gate is the
  * [[RetryChaos]] main in its own retry-enabled JVM —
  * tools/retry_chaos.sh → RETRYCHAOS_rNN.json): the injected fault
  * actually fires and names itself, and the wrapper is a pure
  * pass-through for rows it does not kill. */
class RetryChaosSpec extends SparkSpec {
  import spark.implicits._

  test("FaultInject.wrap kills first attempts loudly; the shared no-retry session surfaces the named fault") {
    val df = (1 to 100).map(i => (i, s"v$i")).toDF("x", "s").repartition(4)
    val before = RetryChaos.FaultInject.fired.get()
    val e = intercept[Exception] {
      RetryChaos.FaultInject.wrap(df, everyNth = 1).count()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null && m.contains("FaultInject")),
      chain(e).mkString(" | "))
    assert(RetryChaos.FaultInject.fired.get() > before, "fault never fired")
  }

  test("wrap preserves schema and column order (the chaos cases hash the wrapped lineage)") {
    val df = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("a", "b")
    val w = RetryChaos.FaultInject.wrap(df, everyNth = 1)
    assert(w.schema === df.schema)
  }
}
