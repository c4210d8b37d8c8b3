package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusPrep, Relational}

/** Semantics of the corpus-preparation operators on hand-computed
  * fixtures (the oracle gate covers the full-table runs; these pin the
  * arithmetic: exact ppm values, bin boundaries, median middle-rows).
  */
class CorpusPrepSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  test("repetition profile: hand-computed ppm values") {
    // "a a a b": 4 tokens, top token a×3; bigrams [a a, a a, a b] top 2/3;
    // distinct {a,b} 2/4
    val out = CorpusPrep.repetitionProfileFor(docs((1L, "a a a b", "s")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((1L, 4L, 750000L, 666666L, 500000L)))
  }

  test("repetition profile: single-token docs drop out") {
    val out = CorpusPrep.repetitionProfileFor(
      docs((1L, "only", "s"), (2L, "a b", "s")))
    assert(out.select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("tfidf: rare terms outrank common ones, ties break alphabetically") {
    // "rare" df=1, "common" df=3 → doc 1's top term is rare (tf=1, 1e6/1)
    val out = CorpusPrep.tfidfTopTermsFor(docs(
      (1L, "common rare", "s"),
      (2L, "common zebra", "s"),
      (3L, "common apple", "s")), k = 1)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    assert(out == Set(
      (1L, "rare", 1000000L), (2L, "zebra", 1000000L), (3L, "apple", 1000000L)))
  }

  test("sequence packing: bin spans and offsets at the 512 boundary") {
    val many = ("w " * 500).trim   // 500 tokens
    val twenty = ("x " * 20).trim  // 20 tokens
    val sixHundred = ("y " * 600).trim
    val out = CorpusPrep.sequencePackingFor(docs(
      (1L, many, "s"), (2L, twenty, "s"), (3L, sixHundred, "s")))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 500L, 0L, 0L, 0L),    // [0, 500) inside seq 0
      (2L, 20L, 0L, 1L, 500L),   // [500, 520) straddles the 512 cut
      (3L, 600L, 1L, 2L, 8L)))   // [520, 1120) spans seqs 1-2
  }

  test("sequence packing never crosses sources") {
    val out = CorpusPrep.sequencePackingFor(docs(
      (1L, ("a " * 600).trim, "s1"), (2L, "b b", "s2")))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    // doc 2 starts a fresh packing in its own source despite doc 1's spill
    assert(out.toSeq == Seq((1L, 0L, 1L, 0L), (2L, 0L, 0L, 0L)))
  }

  test("doc chunks: stride-96 windows of 128 with a short tail") {
    // 200 distinct tokens t0..t199
    val text = (0 until 200).map(i => s"t$i").mkString(" ")
    val out = CorpusPrep.docChunksFor(docs((1L, text, "s")))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out.map(c => (c._1, c._2)).toSeq ==
      Seq((0L, 128L), (1L, 104L), (2L, 8L))) // starts 0, 96, 192
    // overlap region: chunk 0's tokens 96..127 == chunk 1's first 32 —
    // verified via the digests of the expected slices
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md5.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(0)._3 == h((0 until 128).map(i => s"t$i").mkString(" ")))
    assert(out(1)._3 == h((96 until 200).map(i => s"t$i").mkString(" ")))
    assert(out(2)._3 == h((192 until 200).map(i => s"t$i").mkString(" ")))
  }

  test("doc chunks: a single-token doc yields one one-token chunk") {
    val out = CorpusPrep.docChunksFor(docs((1L, "only", "s")))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 1L)))
  }

  test("exact median: odd and even group sizes") {
    val orders = Seq(
      // odd group: 3 values, median 20.00 → x2 = 4000 cents
      (1L, "P1", 10.0), (2L, "P1", 20.0), (3L, "P1", 70.0),
      // even group: middles 20.00 and 30.00 → x2 = 5000 cents
      (4L, "P2", 10.0), (5L, "P2", 20.0), (6L, "P2", 30.0), (7L, "P2", 99.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    import org.apache.spark.sql.functions._
    import graft.operators.Determinism.cents
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_orderpriority"))
    val out = orders
      .select(col("o_orderpriority"), cents(col("o_totalprice")).as("price_c"))
      .withColumn("rn", row_number().over(w.orderBy(col("price_c"))))
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("lo", expr("(cnt + 1) DIV 2"))
      .withColumn("hi", expr("(cnt + 2) DIV 2"))
      .groupBy(col("o_orderpriority"))
      .agg((sum(when(col("rn") === col("lo"), col("price_c")).otherwise(0L)) +
        sum(when(col("rn") === col("hi"), col("price_c")).otherwise(0L)))
        .as("median_x2_c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("P1" -> 4000L, "P2" -> 5000L))
  }

  test("exact deciles: hand-computed positions on 1..11") {
    val orders = (1L to 11L).map(i => (i, "P", i.toDouble))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    orders.write.mode("overwrite").parquet("/tmp/graft-deciles/orders.parquet")
    val out = Relational.exactDecilesByPriority(spark, "/tmp/graft-deciles")
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    // position(d) = (11-1)*d/10 + 1 = d+1 → value (d+1)*100 cents
    assert(out.toSeq == (1L to 9L).map(d => (d, (d + 1) * 100L)))
  }

  test("exact deciles broadcast the positions side") {
    val p = Relational.exactDecilesByPriority(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"positions must broadcast:\n${p.take(2000)}")
  }

  test("exact median over the orders table matches percentile_cont") {
    val dir = "/root/testdata/sf0.001"
    val got = Relational.exactMedianByPriority(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    import org.apache.spark.sql.functions._
    import graft.operators.Determinism.cents
    val expect = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderpriority"), cents(col("o_totalprice")).as("price_c"))
      .groupBy("o_orderpriority")
      .agg(expr("percentile(price_c, 0.5) * 2").as("m2"))
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1)))).toMap
    assert(got == expect)
  }

  test("q166 collocations replay the two-step integer lift on a hand corpus") {
    import graft.operators.CorpusPrep
    // "new york" is a strong collocation (always adjacent); "the" is
    // frequent but promiscuous; min-support prunes the rare pair
    val texts = Seq.fill(6)("the city of new york") ++
      Seq.fill(5)("the new budget for the york office") ++
      Seq.fill(2)("rare pair only twice")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "web", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusPrep.collocationsFor(docs)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // brute force with the identical arithmetic
    val toks = texts.map(_.split("\\s+").toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val total = toks.map(_.size).sum.toLong
    val bi = toks.flatMap(ts => ts.zip(ts.tail)).groupBy(identity)
      .collect { case (p, xs) if xs.size >= CorpusPrep.CollocMinSupport =>
        p -> xs.size.toLong }
    assert(bi.nonEmpty && got.keySet === bi.keySet)
    bi.foreach { case ((a, b), nAb) =>
      val lift = (nAb * 1000000L / uni(a)) * total / uni(b)
      assert(got((a, b)) === ((nAb, uni(a), uni(b), lift)), s"($a,$b)")
    }
    // the dedicated pair must out-lift the promiscuous one
    assert(got(("new", "york"))._4 > got(("the", "new"))._4)
  }

  private def langDocs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "lang", "text")

  test("q188 fertility: hand-replayed one-merge tokenizer per language") {
    // merge round 1 fuses (a,a): "aaaa" → [aa,aa], "ab" stays [a,b]
    val out = CorpusPrep.bpeFertilityFor(
      langDocs((1L, "x", "aaaa aaaa"), (2L, "y", "ab")), steps = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out("x") == ((2L, 4L, 8L, 2000000L, 2000000L)))
    assert(out("y") == ((1L, 2L, 2L, 2000000L, 1000000L)))
  }

  test("q188 fertility exposes the underserved language") {
    // the corpus-dominant pair (a,a) wins the merge; lang y's "zz"
    // never merges, so y pays higher fertility for equal word lengths
    val out = CorpusPrep.bpeFertilityFor(
      langDocs((1L, "x", "aa aa aa"), (2L, "y", "zz")), steps = 1)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out("x") == 1000000L && out("y") == 2000000L)
  }

  test("q223 textrank: hub outranks leaves; self-loops and rare pairs drop") {
    val out = CorpusPrep.textrankKeywordsFor(docs(
      (1L, "x hub y hub z hub x hub y hub z hub", "s"),
      (2L, "x hub y hub z hub x hub y hub z hub", "s"),
      (3L, "solo solo solo solo", "s"),    // self-loop adjacencies only
      (4L, "once twice", "s")))            // support-1 pair
      .collect()
    val toks = out.map(_.getString(0)).toSet
    assert(toks == Set("hub", "x", "y", "z"))
    val rank = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Seq("x", "y", "z").forall(rank("hub") > rank(_)))
    // kw_rank is the dense 1..n positional contract
    assert(out.sortBy(r => (-r.getLong(1), r.getString(0)))
      .map(_.getInt(2)).toSeq == (1 to out.length))
  }

  test("q223 textrank: symmetric two-node walk splits rank equally") {
    val out = CorpusPrep.textrankKeywordsFor(docs((1L, "p q p q p q", "s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq("p", "q"))
    assert(out(0)._2 == out(1)._2)
  }

  test("q223 textrank: case-folds before graphing") {
    // "HUB hub" adjacency is a self-loop after lower() → no edge
    val out = CorpusPrep.textrankKeywordsFor(docs(
      (1L, "HUB hub HUB hub", "s"), (2L, "a b a b a b", "s")))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("a", "b"))
  }
}
