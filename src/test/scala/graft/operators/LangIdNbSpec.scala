package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LangIdNbSpec extends SparkSpec {
  import spark.implicits._

  // separable by construction: disjoint alphabets
  private lazy val labeled = Seq(
    ("aa", "abc cab bca abc"), ("aa", "cba bac acb"),
    ("zz", "xyz zyx yxz xyz"), ("zz", "zxy yzx xzy"))
    .toDF("lang", "text")

  test("fit + predict recovers disjoint-alphabet languages exactly") {
    val m = LangIdNb.fit(labeled, "lang", "text", buckets = 64)
    assert(m.langs == Vector("aa", "zz"))
    val out = LangIdNb.predict(
      labeled.withColumnRenamed("lang", "truth"), "text", m)
    assert(out.filter(col("truth") === col("pred_lang")).count() == 4L)
    // the score columns carry the compared log-posteriors
    assert(out.columns.contains("score_aa") && out.columns.contains("score_zz"))
  }

  test("empty text scores the priors; ties break to the smallest lang") {
    val m = LangIdNb.fit(labeled, "lang", "text", buckets = 64)
    // equal doc counts -> equal priors -> tie -> lexicographically first
    val r = Seq((1L, "")).toDF("id", "text")
    val row = LangIdNb.predict(r, "text", m).collect()(0)
    assert(row.getAs[String]("pred_lang") == "aa")
    assert(row.getAs[Double]("score_aa") == row.getAs[Double]("score_zz"))
  }

  test("null text predicts null") {
    val m = LangIdNb.fit(labeled, "lang", "text", buckets = 64)
    val row = LangIdNb.predict(
      Seq((1L, null: String)).toDF("id", "text"), "text", m).collect()(0)
    assert(row.getAs[String]("pred_lang") == null)
  }

  test("unbalanced priors shift the empty-text prediction") {
    val skew = labeled.union(Seq(("zz", "more zz text here")).toDF("lang", "text"))
    val m = LangIdNb.fit(skew, "lang", "text", buckets = 64)
    val row = LangIdNb.predict(
      Seq((1L, "")).toDF("id", "text"), "text", m).collect()(0)
    assert(row.getAs[String]("pred_lang") == "zz") // 3/5 prior wins
  }

  test("predict plan is map-only: zero exchanges") {
    val m = LangIdNb.fit(labeled, "lang", "text", buckets = 64)
    val out = LangIdNb.predict(Seq((1L, "abc")).toDF("id", "text"), "text", m)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"predict not map-only:\n$plan")
  }

  test("native kernels == the HOF contract spelling (incl. non-BMP codepoints)") {
    import graft.functions.GraftFunctions
    val texts = Seq("abc cab", "x", "", "caf\u00E9 \uD83D\uDE00ok", "abab")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val hof = d.select(col("id"),
      transform(LangIdNb.charBigrams(col("text")),
        g => LangIdNb.bucketOf(g, 64)).as("b")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val native = d.select(col("id"),
      GraftFunctions.char_bigram_buckets(col("text"), 64).as("b")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // BMP rows must agree exactly; the surrogate-pair row is where the
    // kernel is MORE correct (codepoint stepping vs substr's
    // UTF-16-unit arithmetic), so compare it against a hand-computed
    // codepoint fold instead
    Seq(0L, 1L, 2L, 4L).foreach(i => assert(hof(i) == native(i), s"row $i"))
    val cps = "caf\u00E9 \uD83D\uDE00ok".codePoints().toArray
    val expected = cps.sliding(2).map(p =>
      ((p(0).toLong * 997L + p(1)) % 64).toInt).toSeq
    assert(native(3L) == expected)
    val m = LangIdNb.fit(labeled, "lang", "text", buckets = 64)
    val k = new graft.functions.NbKernel(
      m.logPrior.toArray, m.logProb.toArray, m.buckets)
    val ks = d.select(GraftFunctions.nb_lang_scores(col("text"), k).as("s"))
      .collect().map(_.getSeq[Double](0))
    // kernel scores == prior + sum of logProb over the kernel buckets
    texts.zipWithIndex.foreach { case (t, i) =>
      val bs = native(i.toLong)
      m.langs.indices.foreach { l =>
        val exp = m.logPrior(l) + bs.map(b => m.logProb(l)(b)).sum
        assert(math.abs(ks(i)(l) - exp) < 1e-9, s"row $i lang $l")
      }
    }
  }

  test("loud guards: knobs, columns, empty fit") {
    intercept[IllegalArgumentException] {
      LangIdNb.fit(labeled, "lang", "text", buckets = 1)
    }
    intercept[IllegalArgumentException] {
      LangIdNb.fit(labeled, "nope", "text")
    }
    intercept[IllegalArgumentException] {
      LangIdNb.fit(labeled.filter(lit(false)), "lang", "text")
    }
    // a high-cardinality label column is refused before the big pull
    val highCard = (1 to 10).map(i => (s"label$i", "some text"))
      .toDF("lang", "text")
    intercept[IllegalArgumentException] {
      LangIdNb.fit(highCard, "lang", "text", maxLangs = 5)
    }
    val m = LangIdNb.fit(labeled, "lang", "text", buckets = 64)
    intercept[IllegalArgumentException] {
      LangIdNb.predict(
        Seq((1L, "x", "occupied")).toDF("id", "text", "pred_lang"), "text", m)
    }
  }
}
