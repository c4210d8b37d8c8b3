package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.operators.Similarity
import graft.sources.Tables

/** Contracts of the two-level (coarse→fine) assignment family:
  * [[graft.functions.QuantizedHierArgmaxDot]] semantics (exact
  * quantized dots, lowest-index ties at both levels, null/empty
  * guards), the driver-side model build, the q252/q253 results against
  * an independent driver-side replication, and the plan-shape claim
  * the whole section exists for — q252 never evaluates the flat
  * √N-wide argmax.
  */
class HierAssignSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  private val sf = "/root/testdata/sf0.001"

  private def qdot(a: Seq[Float], b: Seq[Float]): Long = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(a(i).toDouble * b(i).toDouble * 1.0e12).toLong
      i += 1
    }
    acc
  }

  private def hierDf(vec: Option[Seq[Float]], coarse: Seq[Seq[Float]],
      fine: Seq[Seq[Seq[Float]]]) = {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    Seq(Tuple1(vec)).toDF("emb")
      .select(call_function(GraftFunctions.HierArgmaxName,
        col("emb"), typedLit(coarse), typedLit(fine)).as("h"))
      .select(col("h.cell"), col("h.idx"), col("h.dot"))
  }

  test("hier argmax routes coarse then fine with lowest-index ties") {
    // coarse row0 and row2 tie on the dot (duplicates) → cell 0 wins;
    // within cell 0, fine entries 0 and 1 tie → idx 0 wins
    val v = Some(Seq(1.0f, 0.0f))
    val coarse = Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Seq(1.0f, 0.0f))
    val fine = Seq(
      Seq(Seq(0.5f, 0.0f), Seq(0.5f, 0.0f), Seq(0.1f, 0.0f)), // cell 0
      Seq(Seq(0.0f, 1.0f)), // cell 1
      Seq(Seq(9.9f, 0.0f))) // cell 2 — must NOT be consulted
    val r = hierDf(v, coarse, fine).head()
    assert(r.getLong(0) == 0L, "tied coarse rows must break to index 0")
    assert(r.getLong(1) == 0L, "tied fine rows must break to index 0")
    assert(r.getLong(2) == qdot(v.get, fine.head.head))
  }

  test("hier argmax only consults the winning cell's sublist") {
    // the global best fine vector sits in cell 1, but the row routes to
    // cell 0 — hierarchical assignment must pick cell 0's best, which
    // is exactly the approximation q253 measures
    val v = Some(Seq(1.0f, 0.1f))
    val coarse = Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))
    val fine = Seq(
      Seq(Seq(0.2f, 0.0f)),
      Seq(Seq(1.0f, 0.1f))) // global argmax, wrong cell
    val r = hierDf(v, coarse, fine).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
    assert(r.getLong(2) == qdot(v.get, Seq(0.2f, 0.0f)))
  }

  test("null vector → null; empty coarse → cell −1; empty cell → idx −1") {
    val coarse = Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))
    val fine = Seq(Seq.empty[Seq[Float]], Seq(Seq(0.0f, 1.0f)))
    val nullRow = hierDf(None, coarse, fine).head()
    assert(nullRow.isNullAt(0) && nullRow.isNullAt(1) && nullRow.isNullAt(2))
    val emptyCoarse =
      hierDf(Some(Seq(1.0f, 0.0f)), Seq.empty, Seq.empty).head()
    assert(emptyCoarse.getLong(0) == -1L && emptyCoarse.getLong(1) == -1L
      && emptyCoarse.getLong(2) == 0L)
    val emptyCell = hierDf(Some(Seq(1.0f, 0.0f)), coarse, fine).head()
    assert(emptyCell.getLong(0) == 0L, "routes to cell 0")
    assert(emptyCell.getLong(1) == -1L && emptyCell.getLong(2) == 0L,
      "an empty cell yields idx −1, dot 0")
  }

  test("hier model groups every fine centroid into its argmax cell, id-ordered") {
    val m = Similarity.hierModel(spark, sf)
    val fine = m.cells.flatten
    assert(m.cells.size == m.coarse.size)
    assert(fine.map(_._1).toSet.size == fine.size, "no fine id duplicated")
    m.cells.zipWithIndex.foreach { case (cell, ci) =>
      assert(cell.map(_._1) == cell.map(_._1).sorted,
        "within-cell order must be fine-id ascending (the tie-break law)")
      cell.foreach { case (fid, fEmb) =>
        val dots = m.coarse.map(c => qdot(fEmb, c._2))
        val best = dots.zipWithIndex.maxBy { case (d, i) => (d, -i) }._2
        assert(best == ci, s"fine $fid routed to cell $ci but argmax is $best")
      }
    }
  }

  /** Independent driver-side replication of the full two-level routing
    * over the corpus — (vec_id → (cell, bucket)).
    */
  private def bruteHier(): Map[Long, (Long, Long)] = {
    val m = Similarity.hierModel(spark, sf)
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map { r =>
        val vid = r.getLong(0)
        val emb = r.getSeq[Float](1)
        val ci = m.coarse.map(c => qdot(emb, c._2)).zipWithIndex
          .maxBy { case (d, i) => (d, -i) }._2
        val cell = m.cells(ci)
        val bucket =
          if (cell.isEmpty) -1L
          else cell.map(f => qdot(emb, f._2)).zipWithIndex
            .maxBy { case (d, i) => (d, -i) } match {
              case (_, fi) => cell(fi)._1
            }
        vid -> (m.coarse(ci)._1, bucket)
      }.toMap
  }

  test("q252 histogram matches the driver-side routing replication") {
    val brute = bruteHier()
    val expected = brute.toSeq
      .groupBy { case (_, cb) => cb }
      .map { case ((cell, bucket), rows) =>
        (cell, bucket, rows.size.toLong,
          rows.map(_._1).min, rows.map(_._1).max)
      }.toSet
    val got = Similarity.hierAssignedHistogram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === expected)
  }

  test("q253 agreement panel matches a flat-vs-hier replication") {
    val brute = bruteHier()
    val fine = Similarity.hierModel(spark, sf).cells.flatten.sortBy(_._1)
    val flat = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map { r =>
        val emb = r.getSeq[Float](1)
        val fi = fine.map(f => qdot(emb, f._2)).zipWithIndex
          .maxBy { case (d, i) => (d, -i) }._2
        r.getLong(0) -> fine(fi)._1
      }.toMap
    val got = Similarity.hierFlatAgreement(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val n = brute.size.toLong
    assert(got.values.map(_._1).sum == n && got.values.map(_._2).sum == n,
      "hier and flat memberships must both partition the corpus")
    val buckets = (brute.values.map(_._2) ++ flat.values).toSet
    assert(got.keySet === buckets)
    buckets.foreach { b =>
      val nHier = brute.values.count(_._2 == b).toLong
      val nFlat = flat.values.count(_ == b).toLong
      val nAgree = brute.count { case (vid, (_, hb)) =>
        hb == b && flat(vid) == b }.toLong
      val ppm = if (nHier > 0) nAgree * 1000000L / nHier else 0L
      assert(got(b) === ((nHier, nFlat, nAgree, ppm)), s"bucket $b panel")
    }
  }

  /** Exact cos_ppm replication (the house integer-cosine formula). */
  private def cosPpm(dot: Long, nQ: Long, nE: Long): Long =
    math.floor(dot.toDouble * 1000000.0 /
      (math.sqrt(nQ.toDouble) * math.sqrt(nE.toDouble))).toLong

  /** Driver-side replication of the q254 search: probe the top-cprobe
    * coarse cells, keep perCell fine buckets per probed cell, restrict
    * to rows whose TWO-LEVEL bucket is probed, exact cosine re-rank,
    * top-5.
    */
  private def bruteHierSearch(): Map[Long, Seq[Long]] = {
    val m = Similarity.hierModel(spark, sf)
    val cprobe = Similarity.cprobeFor(m.coarse.size)
    val rows = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    val perCell = math.max(1,
      Similarity.nprobeFor(Similarity.nlistFor(rows.length.toLong)) / cprobe)
    val bucketOf = bruteHier()
    rows.filter(_._1 % 100 == 0).map { case (qid, qEmb) =>
      val nQ = qdot(qEmb, qEmb)
      val probedCells = m.coarse.indices
        .map(ci => (-qdot(qEmb, m.coarse(ci)._2), ci)).sorted
        .take(cprobe).map(_._2)
      val probedBuckets = probedCells.flatMap { ci =>
        m.cells(ci).map(f => (-qdot(qEmb, f._2), f._1)).sorted
          .take(perCell).map(_._2)
      }.toSet
      val top = rows
        .filter { case (vid, _) =>
          vid != qid && probedBuckets(bucketOf(vid)._2) }
        .map { case (vid, emb) =>
          (cosPpm(qdot(qEmb, emb), nQ, qdot(emb, emb)), vid)
        }
        .sortBy { case (cos, vid) => (-cos, vid) }
        .take(5).map(_._2).toSeq
      qid -> top
    }.toMap
  }

  test("q254 hier search matches the driver-side probe+re-rank replication") {
    val expected = bruteHierSearch()
    val got = Similarity.hierIvfSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(1)))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }
    assert(got === expected)
  }

  test("q255 recall panel is the exact intersection arithmetic") {
    val rows = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    val bruteTop = rows.filter(_._1 % 100 == 0).map { case (qid, qEmb) =>
      val nQ = qdot(qEmb, qEmb)
      qid -> rows.filter(_._1 != qid)
        .map { case (vid, emb) =>
          (cosPpm(qdot(qEmb, emb), nQ, qdot(emb, emb)), vid)
        }
        .sortBy { case (cos, vid) => (-cos, vid) }
        .take(5).map(_._2).toSet
    }.toMap
    val hier = bruteHierSearch().map { case (q, t) => q -> t.toSet }
    val flat = Similarity.ivfKnnAuto(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val got = Similarity.hierRecallAudit(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet === bruteTop.keySet)
    got.foreach { case (q, (nTrue, nHier, nFlat, hPpm, fPpm)) =>
      val truth = bruteTop(q)
      assert(nTrue == truth.size.toLong)
      assert(nHier == truth.intersect(hier(q)).size.toLong, s"q$q hier hits")
      assert(nFlat == truth.intersect(flat(q)).size.toLong, s"q$q flat hits")
      assert(hPpm == nHier * 1000000L / nTrue)
      assert(fPpm == nFlat * 1000000L / nTrue)
    }
  }

  test("q258 layout skew panel is the exact distribution arithmetic") {
    val fine = Similarity.hierModel(spark, sf).cells.flatten.sortBy(_._1)
    val rows = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    val flatMass = rows.groupBy { case (_, emb) =>
      val fi = fine.map(f => qdot(emb, f._2)).zipWithIndex
        .maxBy { case (d, i) => (d, -i) }._2
      fine(fi)._1
    }.view.mapValues(_.length.toLong).toMap
    val hierMass = bruteHier().values.groupBy(_._2)
      .view.mapValues(_.size.toLong).toMap
    val got = Similarity.layoutSkewAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    Seq("flat" -> flatMass, "hier" -> hierMass).foreach { case (layout, m) =>
      val masses = m.values
      val n = masses.sum
      assert(got(layout) === ((m.size.toLong, n, masses.min, masses.max,
        n / m.size, masses.max * 1000000L / n)), s"$layout panel")
    }
  }

  test("q259 rebalance panel matches the driver-side Lloyd replication") {
    val m = Similarity.hierModel(spark, sf)
    val rows = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    val oldOf = bruteHier() // vec_id -> (cell_id, bucket)
    // exact integer-mean centroids per old bucket, float-reconverted
    val means: Map[Long, Array[Float]] = rows
      .filter { case (vid, _) => oldOf(vid)._2 >= 0 }
      .groupBy { case (vid, _) => oldOf(vid)._2 }
      .map { case (b, members) =>
        val dims = members.head._2.length
        b -> Array.tabulate(dims) { i =>
          val s = members.map { case (_, e) =>
            math.floor(e(i).toDouble * 1e6).toLong }.sum
          (Math.floorDiv(s, members.length.toLong).toDouble / 1e6).toFloat
        }
      }
    val updCells = m.cells.map(_.map { case (fid, old) =>
      fid -> means.getOrElse(fid, old) })
    val re = rows.map { case (vid, emb) =>
      val ci = m.coarse.map(c => qdot(emb, c._2)).zipWithIndex
        .maxBy { case (d, i) => (d, -i) }._2
      val cell = updCells(ci)
      val bNew =
        if (cell.isEmpty) -1L
        else {
          val fi = cell.map(f => qdot(emb, f._2)).zipWithIndex
            .maxBy { case (d, i) => (d, -i) }._2
          cell(fi)._1
        }
      (vid, oldOf(vid)._2, bNew)
    }
    val masses = re.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toLong
    val nMoved = re.count { case (_, o, nw) => o != nw }.toLong
    val got = Similarity.hierLloydRebalance(spark, sf).collect().head
    assert(got.getLong(0) == masses.size.toLong, "n_buckets")
    assert(got.getLong(1) == n, "n_rows")
    assert(got.getLong(2) == masses.values.min, "min_mass")
    assert(got.getLong(3) == masses.values.max, "max_mass")
    assert(got.getLong(4) == nMoved.toLong, "n_moved")
    assert(got.getLong(5) == n / masses.size, "mean_mass")
    assert(got.getLong(6) == masses.values.max * 1000000L / n, "max_share_ppm")
    assert(got.getLong(7) == nMoved * 1000000L / n, "moved_ppm")
  }

  test("q252's plan is the point: two-level argmax, never the flat √N matrix") {
    val plan = Similarity.hierAssignedHistogram(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("quantizedhierargmaxdot"),
      s"assignment must run through the two-level router:\n${plan.take(2000)}")
    assert(!plan.toLowerCase.contains("quantizedargmaxdot"),
      s"the flat full-width argmax must not appear:\n${plan.take(2000)}")
    assert(!plan.contains("Join"),
      s"assignment is a map-only projection, no join:\n${plan.take(2000)}")
  }

  test("the q265/q266 twins route two-level: flat argmax absent from both plans") {
    // the twins exist to RETIRE the flat N^1.5 assignment — a regression
    // that reintroduces the flat matrix silently defeats their purpose
    Seq(Similarity.centroidOutliersHier(spark, sf),
      Similarity.knnCalibrationHier(spark, sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("quantizedhierargmaxdot"),
        s"twin must route two-level:\n${plan.take(2000)}")
      assert(!plan.contains("quantizedargmaxdot"),
        s"twin must not flat-assign:\n${plan.take(2000)}")
    }
  }
}
