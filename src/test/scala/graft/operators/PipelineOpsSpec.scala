package graft.operators

import graft.{SparkSpec, TestSpark}

/** Behavioral checks for the pipeline-hygiene operators (tx8 PII
  * redaction, tx9 length histogram) and the wide-relational additions
  * (pv1 pivot, wq1 percentiles) beyond the oracle hash-compare.
  */
class PipelineOpsSpec extends SparkSpec {

  private val dir = TestSpark.Sf0001

  test("tx8: every rendered profile is fully redacted, counts match") {
    val rows = graft.SparkEntry.queries("tx8_pii_redact")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(r.getAs[Int]("n_emails") === 1)
      assert(r.getAs[Int]("n_phones") === 1)
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>"))
      assert(!red.matches(".*[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}.*"))
      assert(!red.contains("@example.com"))
    }
  }

  test("tx9: buckets partition the corpus") {
    val rows = graft.SparkEntry.queries("tx9_length_histogram")(spark, dir).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val docs = graft.Tables(spark, dir, "documents").count()
    assert(total === docs)
    rows.foreach { r =>
      val (b, lo, mn, mx) = (r.getAs[Long]("bucket"), r.getAs[Long]("bucket_lo"),
        r.getAs[Int]("min_tokens"), r.getAs[Int]("max_tokens"))
      assert(lo === b * 10)
      assert(mn <= mx)
      if (b < 19) assert(mn >= lo && mx < lo + 10)
      else assert(mn >= 190) // top bucket is open-ended
    }
  }

  test("pv1: pivot cells total the un-pivoted sum") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("pv1_pivot_status_priority")(spark, dir)
    val priorities =
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    assert(out.columns.toSeq === ("o_orderstatus" +: priorities))
    val cellTotal = out.collect()
      .flatMap(r => priorities.map(p => Option(r.getAs[java.lang.Long](p)).map(_.toLong).getOrElse(0L)))
      .sum
    val direct = graft.Tables(spark, dir, "orders")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")))
      .head().getLong(0)
    assert(cellTotal === direct)
  }

  test("em3: one centroid row per (label, dim), n = label population") {
    val rows = graft.SparkEntry.queries("em3_label_centroids")(spark, dir).collect()
    val emb = graft.Tables(spark, dir, "embeddings")
    val byLabel = emb.groupBy("label").count().collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Long]("count")).toMap
    assert(rows.length === byLabel.size * 64)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") === byLabel(r.getAs[Int]("label")))
      val c = r.getAs[Double]("centroid")
      assert(c > -10 && c < 10) // sane magnitude for unit-ish embeddings
    }
  }

  test("wf1: running total reaches the lifetime total at the last order") {
    val rows = graft.SparkEntry.queries("wf1_running_customer_spend")(spark, dir)
      .collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    byCust.foreach { case (_, orders) =>
      val sorted = orders.sortBy(_.getAs[Long]("order_seq"))
      assert(sorted.map(_.getAs[Long]("order_seq")).toSeq ===
        (1L to sorted.length.toLong))
      assert(sorted.last.getAs[Long]("running_cents") ===
        sorted.last.getAs[Long]("lifetime_cents"))
      assert(sorted.map(_.getAs[Long]("running_cents")).toSeq ===
        sorted.map(_.getAs[Long]("running_cents")).toSeq.sorted)
    }
  }

  test("a10: cube covers all grouping combinations with correct flags") {
    val rows = graft.SparkEntry.queries("a10_cube_priority_status")(spark, dir)
      .collect()
    val grand = rows.filter(r => r.getAs[Int]("g_priority") == 1 &&
      r.getAs[Int]("g_status") == 1)
    assert(grand.length === 1)
    val total = graft.Tables(spark, dir, "orders").count()
    assert(grand.head.getAs[Long]("n") === total)
    rows.foreach { r =>
      assert((r.getAs[String]("o_orderpriority") == null) ===
        (r.getAs[Int]("g_priority") == 1))
      assert((r.getAs[String]("o_orderstatus") == null) ===
        (r.getAs[Int]("g_status") == 1))
    }
    // detail rows sum to the grand total
    val detail = rows.filter(r => r.getAs[Int]("g_priority") == 0 &&
      r.getAs[Int]("g_status") == 0)
    assert(detail.map(_.getAs[Long]("n")).sum === total)
  }

  test("wq1: percentiles are ordered and inside the value range") {
    val rows = graft.SparkEntry.queries("wq1_quantity_percentiles")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p25, p50, p75) = (r.getAs[Double]("p25"), r.getAs[Double]("p50"),
        r.getAs[Double]("p75"))
      assert(p25 <= p50 && p50 <= p75)
      assert(p25 >= 1.0 && p75 <= 50.0)
    }
  }

  test("ev6: conversions are at-or-after the first view; flags consistent") {
    val rows = graft.SparkEntry.queries("ev6_funnel")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val converted = r.getAs[Boolean]("converted")
      assert(converted === !r.isNullAt(r.fieldIndex("conv_us")))
      if (converted) {
        assert(r.getAs[Long]("conv_us") >= r.getAs[Long]("first_view_us"))
        assert(r.getAs[Long]("secs_to_convert") >= 0L)
      } else {
        assert(r.isNullAt(r.fieldIndex("secs_to_convert")))
      }
    }
    assert(rows.exists(_.getAs[Boolean]("converted")))
  }
}
