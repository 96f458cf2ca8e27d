package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Task-retry determinism chaos gate (VERDICT r15 item 5).
  *
  * CONCURRENCY_r15 proved the PROCESS seams (multi-JVM append/probe,
  * kill -9); nothing yet proved query OUTPUT determinism under executor
  * task retries — the property every oracle implicitly assumes and the
  * hash-repartition comment in CurationQueries claims. This main runs a
  * representative operator set TWICE in a retry-enabled context
  * (`local[8,3]` — three task attempts): once clean, once with
  * [[FaultInject.wrap]] in the input lineage throwing on the FIRST
  * attempt of every third partition. Retried tasks recompute their
  * partition from the (deterministic) lineage; if any operator's output
  * depended on attempt-specific state — partition-order accumulation,
  * non-stable sorts, time- or random-seeded keys — the canonical table
  * hash would differ.
  *
  * Prints ONE JSON line; `tools/retry_chaos.sh` runs it and commits the
  * artifact (RETRYCHAOS_rNN.json).
  *
  * Scope note: a single-process `local[n,f]` master retries TASKS but
  * cannot lose shuffle blocks or executors, so upstream-stage
  * recomputation (FetchFailed) is out of reach here — that failure
  * class needs a real cluster and is documented, not silently skipped.
  */
object RetryChaos {

  /** Deterministic one-shot task fault: throws on the FIRST attempt of
    * every `everyNth`-th partition, passes rows through untouched
    * otherwise. Sits in the plan as a typed mapPartitions, so the
    * wrapped scan's task must re-run wholesale on retry. The fired
    * counter is a plain JVM static — accumulator updates from FAILED
    * tasks are discarded by design, and local mode shares one JVM. */
  object FaultInject {
    val fired = new java.util.concurrent.atomic.AtomicLong(0L)

    def wrap(df: DataFrame, everyNth: Int = 3): DataFrame = {
      val enc = org.apache.spark.sql.Encoders.row(df.schema)
      df.mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null && tc.attemptNumber() == 0 &&
            tc.partitionId() % everyNth == 0) {
          fired.incrementAndGet()
          throw new RuntimeException(
            s"FaultInject: first-attempt fault in partition ${tc.partitionId()}")
        }
        it
      }(enc).toDF(df.columns: _*)
    }
  }

  /** Order-insensitive canonical hash of a frame: per-row xxhash64 of
    * the name-sorted JSON rendering, folded by count + bit_xor (the
    * driver oracle's sorted-rows hash, associatively restated). */
  private def tableHash(df: DataFrame): (Long, Long) = {
    val cols = df.columns.sorted.map(col)
    val r = df.select(xxhash64(to_json(struct(cols: _*))).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // local[8,3]: 8 task threads, maxFailures=3 — an injected
    // first-attempt failure is retried, not fatal
    val spark = GraftSession.builder(appName = "graft-retrychaos",
        master = "local[8,3]", shufflePartitions = 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String) = schema.Tables.load(spark, sfDir, name)

    // each case: inputs built through `mk(wrapped)` where `wrapped`
    // decides whether FaultInject sits in the lineage. The operator set
    // spans the determinism-sensitive shapes: hash aggregation, window
    // ranking, post-shuffle maps, LSH banding, iterative label
    // propagation with checkpoints, NN-descent, hash-derived sampling,
    // and the privacy group chain.
    val cases: Seq[(String, Boolean => DataFrame)] = Seq(
      "group_agg" -> { w =>
        val li = if (w) FaultInject.wrap(t("lineitem")) else t("lineitem")
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity").cast("decimal(38,2)")).as("sum_qty"),
            count(lit(1)).as("n"))
      },
      "first_seen_window" -> { w =>
        val li = if (w) FaultInject.wrap(t("lineitem")) else t("lineitem")
        import org.apache.spark.sql.expressions.Window
        li.withColumn("rn", row_number().over(Window
            .partitionBy(col("l_orderkey"))
            .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))))
          .filter(col("rn") === 1)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      },
      "post_shuffle_fault" -> { w =>
        val o = t("orders").repartition(8, col("o_custkey"))
        val oo = if (w) FaultInject.wrap(o) else o
        oo.groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      },
      "minhash_lsh_pairs" -> { w =>
        val d = t("documents").select(col("doc_id"), col("text"))
        ops.Dedup.minhashLshPairs(if (w) FaultInject.wrap(d) else d,
          "doc_id", "text")
      },
      "connected_components" -> { w =>
        val d = t("documents").select(col("doc_id"), col("text"))
        val pairs = ops.Dedup.minhashLshPairs(
          if (w) FaultInject.wrap(d) else d, "doc_id", "text")
        ops.Dedup.connectedComponents(pairs)
      },
      "knn_graph" -> { w =>
        val e = t("embeddings")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        ops.Ann.knnGraph(if (w) FaultInject.wrap(e) else e, k = 5, rounds = 1)
      },
      "epoch_shuffle" -> { w =>
        val d = t("documents").select(col("doc_id"), col("lang"))
        ops.Sampling.epochShuffle(if (w) FaultInject.wrap(d) else d,
          "doc_id", epoch = 1, nShards = 8)
      },
      "privacy_chain" -> { w =>
        val d0 = t("documents").select(col("doc_id"), col("lang"),
          col("source"), (col("n_chars") / 200).cast("long").as("len_bucket"))
        val d = if (w) FaultInject.wrap(d0) else d0
        val quasi = Seq("source", "len_bucket")
        val ka = ops.Curation.kAnonymize(d, quasi, k = 5)
          .withColumnRenamed("group_size", "k_size")
        ops.Curation.lDiversify(ka, quasi, "lang", l = 3)
      })

    val results = cases.map { case (name, mk) =>
      val clean = tableHash(mk(false))
      val f0 = FaultInject.fired.get()
      val faulted = tableHash(mk(true))
      val faults = FaultInject.fired.get() - f0
      (name, clean._1, clean == faulted, faults)
    }
    // a case passes only when the hashes match AND faults actually
    // fired — zero injections would prove nothing
    val pass = results.forall { case (_, _, eq, faults) => eq && faults > 0 }
    val casesJson = results.map { case (n, rows, eq, faults) =>
      s""""$n":{"rows":$rows,"hash_equal":$eq,"faults_injected":$faults}"""
    }.mkString("{", ",", "}")
    println(s"""{"pass":$pass,"sf":"$sfDir","master":"local[8,3]",""" +
      s""""cases":$casesJson,"total_faults":${FaultInject.fired.get()}}""")
    System.out.flush()
    spark.stop()
    if (!pass) sys.exit(1)
  }
}
