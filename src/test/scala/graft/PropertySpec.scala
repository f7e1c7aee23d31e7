package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._

import graft.operators.{Cleaning, Dedup, Restructure, SchemaBootstrap}
import graft.functions.AsciiBackslash

/** Property tests (SURVEY.md §5.4): algebraic invariants of the
  * cleaning/restructuring kernels that golden tests cannot sweep —
  * idempotence, row-count laws, round-trips — checked over generated
  * inputs (scalacheck Gen, fixed seed, sampled directly — the
  * scalatest bridge artifact is not on the offline classpath). Scalar
  * properties run against the Catalyst expressions via one batched
  * DataFrame evaluation per property (not one job per sample). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic sampling: n draws from the generator. */
  private def forAll[A](gen: Gen[A], n: Int = 8)(f: A => Unit): Unit = {
    var s = org.scalacheck.rng.Seed(42L)
    (0 until n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, s))
      s = s.next
    }
  }

  /** One deterministic draw. */
  private def draw[A](gen: Gen[A], seed: Long = 7L): A =
    gen.pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed))

  private val texts: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)), Gen.const("12%"), Gen.const(""),
    Gen.const("a\nb"), Gen.const("café"), Gen.const("Ÿ水"),
    Gen.const(" x  y "))).map(_.mkString(" ")).map(_.take(200))

  /** Evaluate a Column fn over many strings in ONE Spark job. */
  private def evalBatch(inputs: Seq[String],
                        f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Seq[String] = {
    import spark.implicits._
    inputs.toDF("s").select(f(col("s")).as("r")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  test("ascii escape is idempotent: escape(escape(x)) == escape(x)") {
    val samples = draw(Gen.listOfN(200, texts))
    val once = evalBatch(samples, AsciiBackslash.asciiBackslash)
    val twice = evalBatch(once, AsciiBackslash.asciiBackslash)
    assert(twice == once)
    // and always pure ASCII
    assert(once.forall(_.forall(_ < 0x80)))
  }

  test("number sanitize is idempotent and kills every [a-zA-Z%]") {
    val samples = draw(Gen.listOfN(200, texts))
    val once = evalBatch(samples, Cleaning.sanitizeNumber)
    val twice = evalBatch(once, Cleaning.sanitizeNumber)
    assert(twice == once)
    assert(once.forall(s => !s.exists(c => c.isLetter && c < 0x80) &&
      !s.contains('%')))
  }

  test("removeNewLines: idempotent, length-preserving minus newlines") {
    import spark.implicits._
    val samples = draw(Gen.listOfN(200, texts))
    val df = samples.toDF("s")
    val once = Cleaning.removeNewLines(df).as[String].collect().toSeq
    val twice = Cleaning.removeNewLines(once.toDF("s"))
      .as[String].collect().toSeq
    assert(twice == once)
    samples.zip(once).foreach { case (in, out) =>
      assert(out.length == in.length - in.count(_ == '\n'))
    }
  }

  test("explode row-count law: rows == Σ max(1, arrayLen)") {
    import spark.implicits._
    val gen = Gen.listOfN(60,
      Gen.listOf(Gen.zip(Gen.choose(0L, 9L), Gen.alphaStr.map(_.take(4)))))
    forAll(gen) { arrays =>
      val df = arrays.zipWithIndex
        .map { case (a, i) => (i.toLong, a) }
        .toDF("id", "arr")
        .select(col("id"), col("arr").cast("array<struct<k:bigint,v:string>>"))
      val exploded = Restructure.explodeStructArray(df, "arr")
      val want = arrays.map(a => math.max(1, a.size).toLong).sum
      assert(exploded.count() == want)
    }
  }

  test("serialize struct-array: struct count == pipe-segments") {
    import spark.implicits._
    val gen = Gen.listOfN(40,
      Gen.listOf(Gen.zip(Gen.choose(0L, 9L), Gen.alphaStr.map(_.take(4)))))
    forAll(gen) { arrays =>
      val df = arrays.zipWithIndex
        .map { case (a, i) => (i.toLong, a) }
        .toDF("id", "arr")
        .select(col("id"), col("arr").cast("array<struct<k:bigint,v:string>>"))
      val out = Restructure.serializeStructArray(df, "arr")
        .orderBy("id").collect()
      out.zip(arrays).foreach { case (r, a) =>
        val s = r.getAs[String]("arr")
        val segs = if (s.isEmpty) 0 else s.split("\\|", -1).length
        assert(segs == a.size)
        // each segment carries both field names
        if (a.nonEmpty) assert(s.split("\\|", -1)
          .forall(seg => seg.startsWith("k:") && seg.contains(",v:")))
      }
    }
  }

  test("shingles: count law |max(0, words-2)| distinct-bounded") {
    import spark.implicits._
    forAll(Gen.listOfN(50, Gen.choose(0, 30))) { sizes =>
      val docs = sizes.zipWithIndex.map { case (n, i) =>
        (i.toLong, (0 until n).map(k => s"w${k % 7}").mkString(" "))
      }
      val df = docs.toDF("id", "text")
        .select(col("id"), size(Dedup.shingles(col("text"))).as("n"),
          size(Dedup.shingles(col("text"), distinct = false)).as("nAll"))
      df.collect().foreach { r =>
        val id = r.getAs[Long]("id")
        val words = sizes(id.toInt)
        val full = math.max(0, words - 2)
        assert(r.getAs[Int]("nAll") == full)
        assert(r.getAs[Int]("n") <= full)
      }
    }
  }

  test("toSinkName: idempotent and parquet-safe (no dots, lower)") {
    forAll(Gen.listOfN(100, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(10)),
      Gen.const("loan.highestBalance"), Gen.const("filerName"),
      Gen.const("ABCDef"), Gen.const("a.b.c")))) { names =>
      names.filter(_.nonEmpty).foreach { n =>
        val s = Restructure.toSinkName(n)
        assert(Restructure.toSinkName(s) == s)
        assert(!s.contains('.') && s == s.toLowerCase)
      }
    }
  }

  test("titleize is stable on its own output's fieldName form") {
    forAll(Gen.listOfN(50, Gen.alphaNumStr.map(_.take(12)))) { names =>
      names.filter(_.nonEmpty).foreach { n =>
        val t = SchemaBootstrap.titleize(n)
        // titleizing a Title Case string must be a no-op
        assert(SchemaBootstrap.titleize(t.replace(" ", "_")) == t)
      }
    }
  }

  test("asofJoin == per-row brute-force reference on random data") {
    import spark.implicits._
    // Few keys + a tight time range force collisions, equal-timestamp
    // boundaries, and unmatched lefts.
    val rowGen = Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 30L))
    forAll(Gen.zip(Gen.listOfN(40, rowGen), Gen.listOfN(25, rowGen)),
        n = 4) { case (ls, rsRaw) =>
      // right side must be unique per (key, time) — the precondition
      val rs = rsRaw.distinct.zipWithIndex
        .map { case ((k, t), i) => (k, t, 1000L + i) }
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid")
      val right = rs.toDF("k", "t", "v")
      def collect(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
        .sortBy(_._1).toSeq
      val got = collect(
        graft.operators.Joins.asofJoin(left, right, "k", "t", Seq("v")))
      // bucket width 7 over times 0..30 → every draw crosses several
      // bucket boundaries, exercising the level-2 repair
      val got2 = collect(graft.operators.Joins.asofJoin2Level(
        left, right, "k", "t", Seq("v"), bucketWidth = 7L))
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val m = rs.filter(r => r._1 == k && r._2 <= t)
        (i.toLong, if (m.isEmpty) -1L else m.maxBy(_._2)._3)
      }.sortBy(_._1)
      assert(got == want)
      assert(got2 == want, "2-level form diverged from the reference")
      // FORWARD direction: earliest right at-or-after, same boundaries
      val gotF = collect(graft.operators.Joins.asofJoinForward(
        left, right, "k", "t", Seq("v")))
      val wantF = ls.zipWithIndex.map { case ((k, t), i) =>
        val m = rs.filter(r => r._1 == k && r._2 >= t)
        (i.toLong, if (m.isEmpty) -1L else m.minBy(_._2)._3)
      }.sortBy(_._1)
      assert(gotF == wantF, "forward form diverged from the reference")
      val gotF2 = collect(graft.operators.Joins.asofJoinForward2Level(
        left, right, "k", "t", Seq("v"), bucketWidth = 7L))
      assert(gotF2 == wantF,
        "forward 2-level form diverged from the reference")
      // NEAREST direction: closest right in either direction, distance
      // tie → backward (the stitch join reorders columns — read by
      // name)
      val gotN = graft.operators.Joins.asofJoinNearest(
          left, right, "k", "t", "lid", Seq("v"))
        .select("lid", "v").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1)))
        .sortBy(_._1).toSeq
      val wantN = ls.zipWithIndex.map { case ((k, t), i) =>
        val m = rs.filter(_._1 == k)
        if (m.isEmpty) (i.toLong, -1L)
        else {
          val best = m.minBy(r =>
            (math.abs(r._2 - t), if (r._2 <= t) 0 else 1))
          (i.toLong, best._3)
        }
      }.sortBy(_._1)
      assert(gotN == wantN, "nearest form diverged from the reference")
      val gotN2 = graft.operators.Joins.asofJoinNearest(
          left, right, "k", "t", "lid", Seq("v"),
          bucketWidth = Some(7L))
        .select("lid", "v").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1)))
        .sortBy(_._1).toSeq
      assert(gotN2 == wantN,
        "nearest 2-level form diverged from the reference")
      // TOLERANCE bound: a backward match older than 5 ticks is a
      // non-match
      val gotT = collect(graft.operators.Joins.asofJoinTolerance(
        left, right, "k", "t", Seq("v"), toleranceUs = 5L))
      val wantT = ls.zipWithIndex.map { case ((k, t), i) =>
        val m = rs.filter(r => r._1 == k && r._2 <= t && t - r._2 <= 5L)
        (i.toLong, if (m.isEmpty) -1L else m.maxBy(_._2)._3)
      }.sortBy(_._1)
      assert(gotT == wantT, "tolerance form diverged from the reference")
    }
  }

  test("bitmapDistinct == countDistinct on random (key, id) multisets") {
    import spark.implicits._
    val rowGen = Gen.zip(Gen.choose(0, 3),
      Gen.oneOf(Gen.choose(-5000L, 5000L),    // straddles page 0
        Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))) // far pages
    forAll(Gen.listOfN(300, rowGen), n = 4) { rows =>
      val df = rows.map { case (k, id) => (s"k$k", id) }.toDF("k", "id")
      val got = graft.operators.Events.bitmapDistinct(df, "k", "id")
        .as[(String, Long)].collect().toMap
      val want = df.groupBy("k").agg(countDistinct($"id").as("n"))
        .as[(String, Long)].collect().toMap
      assert(got == want, s"bitmap distinct diverged on $rows")
    }
  }

  test("scd2 interval laws on random event streams: contiguous versions, " +
       "abutting intervals, event conservation, alternating states") {
    import spark.implicits._
    val evGen = Gen.zip(Gen.choose(1L, 4L),          // user
      Gen.choose(0L, 50L),                           // seconds offset
      Gen.oneOf("view", "click", "purchase"))
    forAll(Gen.listOfN(60, evGen), n = 4) { rows =>
      val df = rows.zipWithIndex.map { case ((u, sec, typ), i) =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + sec * 1000L),
          u, typ)
      }.toDF("event_id", "ts", "user_id", "event_type")
      val out = graft.operators.Events.scd2(df)
        .select("user_id", "version", "state", "valid_from_us",
          "n_events", "valid_to_us")
        .as[(Long, Long, String, Long, Long, Long)].collect()
      // every event lands in exactly one interval
      assert(out.map(_._5).sum == rows.size)
      out.groupBy(_._1).foreach { case (_, iv) =>
        val o = iv.sortBy(_._2)
        // versions are 1..n with no gaps
        assert(o.map(_._2).toSeq == (1L to o.size).toSeq)
        // consecutive runs never share a state (else they'd be one run)
        o.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._3 != b._3)
            // intervals abut exactly: prior valid_to == next valid_from
            assert(a._6 == b._4)
            assert(a._4 <= a._6)
          case _ => ()
        }
        // only the last interval is open
        assert(o.last._6 == Long.MaxValue)
        assert(o.init.forall(_._6 != Long.MaxValue))
      }
    }
  }

  test("sessionPaths conservation: path-weighted event count == events; " +
       "path count == session count") {
    import spark.implicits._
    val evGen = Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 7200L),
      Gen.oneOf("view", "click"))
    forAll(Gen.listOfN(80, evGen), n = 4) { rows =>
      val df = rows.zipWithIndex.map { case ((u, sec, typ), i) =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + sec * 1000L),
          u, typ)
      }.toDF("event_id", "ts", "user_id", "event_type")
      val gap = 600L
      val paths = graft.operators.Events.sessionPaths(df, gap, 1000)
        .as[(String, Long)].collect()
      val sessions = graft.operators.Events.sessionize(df, gap)
        .select("n_events").as[Long].collect()
      // unlimited top-k ⇒ every session contributes exactly one path
      assert(paths.map(_._2).sum == sessions.length)
      // events are conserved through the path strings
      val eventsViaPaths =
        paths.map { case (p, n) => (p.count(_ == '>') + 1) * n }.sum
      assert(eventsViaPaths == sessions.sum)
    }
  }

  test("tokenBudget laws: selected set is a score-prefix; budget bounds " +
       "pre-overrun mass; verdict partition is exhaustive") {
    import spark.implicits._
    val docGen = Gen.zip(Gen.choose(0, 2), Gen.choose(1, 20),
      Gen.choose(0L, 9L))
    forAll(Gen.listOfN(40, docGen), n = 4) { rows =>
      val df = rows.zipWithIndex.map { case ((src, words, score), i) =>
        (i.toLong, s"s$src", score, Seq.fill(words)("w").mkString(" "))
      }.toDF("doc_id", "source", "score", "text")
      val budget = 50L
      val out = graft.operators.TrainPrep
        .tokenBudget(df, "doc_id", "text", "source", "score", budget)
        .select("doc_id", "source", "score", "n_tokens", "tokens_before",
          "selected")
        .as[(Long, String, Long, Long, Long, Boolean)].collect()
      assert(out.length == rows.size)
      out.groupBy(_._2).foreach { case (_, docs) =>
        val order = docs.sortBy(d => (-d._3, d._1)) // score desc, id asc
        // selected docs form a PREFIX of the quality order
        val sel = order.map(_._6)
        assert(!sel.dropWhile(identity).contains(true))
        // tokens before the last selected doc stay under budget
        order.filter(_._6).foreach(d => assert(d._5 < budget))
        // and every rejected doc would have started at/over budget
        order.filterNot(_._6).foreach(d => assert(d._5 >= budget))
      }
    }
  }

  test("chunkWindows coverage law: chunks tile the words; overlap = " +
       "window - stride; concat of stride-sized prefixes rebuilds the doc") {
    import spark.implicits._
    val gen = Gen.zip(Gen.choose(1, 40), Gen.choose(1, 6), Gen.choose(1, 6))
    forAll(gen, n = 6) { case (nWords, window, stride0) =>
      val stride = math.min(stride0, window) // stride ≤ window: overlapping
      val words = (1 to nWords).map(i => s"w$i")
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val chunks = graft.operators.TrainPrep
        .chunkWindows(df, "doc_id", "text", window, stride)
        .orderBy("chunk_id")
        .as[(Long, Long, String, Long)].collect().toSeq
      // chunk j starts at word j·stride; n_words clamps at the tail
      chunks.foreach { case (_, j, text, n) =>
        val expect = words.slice((j * stride).toInt,
          (j * stride).toInt + window)
        assert(text == expect.mkString(" ") && n == expect.length)
      }
      // stride-sized prefixes of each chunk concatenate back to the doc
      val rebuilt = chunks.flatMap { case (_, _, text, _) =>
        text.split(" ").take(stride)
      }
      assert(rebuilt == words, s"tiling broke at $nWords/$window/$stride")
    }
  }

  test("kMeans trainer quality law: the Lloyd's objective (total " +
       "within-cluster squared distance) is non-increasing per round") {
    import graft.operators.Similarity
    // structured random data (8 separated centers + noise) so rounds
    // have real work to do, unlike the near-orthogonal fixture
    val rows = (0L until 200L).map { i =>
      val c = (i % 8).toInt
      (i, Seq.tabulate(16)(j =>
        (if (j % 8 == c) 10f else 0f) +
          (((i * 31 + j * 17) % 13).toFloat - 6f) / 10f))
    }
    import spark.implicits._
    val v = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
    val books = Similarity.kMeansCodebooksQ(v, 8, 4, 16)
    assert(books.length == 5) // init + 4 rounds
    val inertia = books.map(Similarity.kMeansInertia(v, _))
    info(s"inertia per round: ${inertia.mkString(" -> ")}")
    inertia.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"objective rose: $inertia")
    }
    // and the rounds actually did something on this data
    assert(inertia.last < inertia.head)
  }

  test("farthest-point init law: seeds spread one-per-cluster where " +
       "first-C strands clusters; init inertia strictly better") {
    import graft.operators.Similarity
    // 8 well-separated blocks of 25 vectors each, ORDERED so the first
    // 8 vectors all sit in block 0 — first-C init starts every seed in
    // one cluster; maxmin must land one seed in each block
    val rows = (0L until 200L).map { i =>
      val c = (i / 25).toInt
      (i, Seq.tabulate(16)(j =>
        (if (j % 8 == c) 10f else 0f) +
          (((i * 31 + j * 17) % 13).toFloat - 6f) / 100f))
    }
    import spark.implicits._
    val v = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
    val far = Similarity.kMeansInitFarthest(v, 8)
    assert(far.map(_._1) == (0L until 8L)) // cids are pick order
    // one seed per block: the dominant dimension (argmax component)
    // identifies the block each seed landed in
    val blocks = far.map(_._2.zipWithIndex.maxBy(_._1)._2 % 8).toSet
    assert(blocks.size == 8, s"maxmin seeds covered blocks $blocks")
    val firstC = v.where(col("vec_id") < 8)
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val iFar = Similarity.kMeansInertia(v, far)
    val iFirst = Similarity.kMeansInertia(v, firstC)
    info(s"init inertia: maxmin $iFar vs first-C $iFirst")
    assert(iFar < iFirst)
  }

  test("k-means-parallel init law: batched oversampling + weighted " +
       "reduce seeds one-per-cluster, like sequential maxmin, in " +
       "O(rounds) corpus scans") {
    import graft.operators.Similarity
    // same 8-block corpus as the farthest-point law above; first 8
    // vectors all in block 0 so first-C strands 7 clusters
    val rows = (0L until 200L).map { i =>
      val c = (i / 25).toInt
      (i, Seq.tabulate(16)(j =>
        (if (j % 8 == c) 10f else 0f) +
          (((i * 31 + j * 17) % 13).toFloat - 6f) / 100f))
    }
    import spark.implicits._
    val v = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
    // rounds=7 guarantees coverage on this geometry: while any block is
    // uncovered, its points' min-distance (inter-block scale) dominates
    // every covered block's jitter-scale distances, so each round's
    // top-batch comes entirely from uncovered blocks — ≥ 1 new block
    // per round, 7 rounds ≥ the 7 non-seed blocks.
    val par = Similarity.kMeansInitParallel(v, 8, rounds = 7, batch = 8)
    assert(par.map(_._1) == (0L until 8L)) // cids are reduce pick order
    val blocks = par.map(_._2.zipWithIndex.maxBy(_._1)._2 % 8).toSet
    assert(blocks.size == 8, s"k-means-parallel seeds covered blocks $blocks")
    // init quality: at least as good as first-C, same league as maxmin
    val firstC = v.where(col("vec_id") < 8)
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val iPar = Similarity.kMeansInertia(v, par)
    val iFirst = Similarity.kMeansInertia(v, firstC)
    info(s"init inertia: kmeans-par $iPar vs first-C $iFirst")
    assert(iPar < iFirst)
    // and the REGISTERED geometry (3 rounds × 8 + seed = 25 candidates,
    // k=16) must stay a valid oversampling for the registry query: 16
    // seeds in pick order, still covering every cluster (the corpus
    // contains exact-duplicate vectors by construction — i and i+13
    // share a jitter phase — so seed-VECTOR distinctness is not a law)
    val reg = Similarity.kMeansInitParallel(v, 16, rounds = 3, batch = 8)
    assert(reg.map(_._1) == (0L until 16L))
    val regBlocks = reg.map(_._2.zipWithIndex.maxBy(_._1)._2 % 8).toSet
    assert(regBlocks.size == 8, s"k=16 seeds covered blocks $regBlocks")
  }

  test("rangeJoin == naive theta-join reference on random intervals") {
    import spark.implicits._
    val ivGen = Gen.zip(Gen.choose(0L, 100L), Gen.choose(0L, 40L))
      .map { case (s, len) => (s, s + len) }
    forAll(Gen.zip(Gen.listOfN(20, ivGen), Gen.listOfN(60, Gen.choose(0L, 140L))),
        n = 4) { case (ivs, pts) =>
      val intervals = ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("iv", "s", "e")
      val points = pts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("pid", "t")
      // bucket width deliberately unaligned with the value range
      val got = graft.operators.Joins.rangeJoin(points, "t", intervals, "s", "e", 7L)
        .select("pid", "iv").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = (for {
        (t, pi) <- pts.zipWithIndex
        ((s, e), ii) <- ivs.zipWithIndex
        if t >= s && t <= e
      } yield (pi.toLong, ii.toLong)).sorted
      assert(got == want)
    }
  }

  test("triangle-count law: degree-ordered orientation == brute-force " +
      "triple enumeration on random graphs") {
    import spark.implicits._
    val graphs: Gen[Set[(Long, Long)]] = for {
      n <- Gen.choose(3, 10)
      edges <- Gen.listOf(for {
        a <- Gen.choose(1, n); b <- Gen.choose(1, n) if a != b
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
    } yield edges.toSet
    forAll(graphs, n = 6) { es =>
      if (es.nonEmpty) {
        val got = graft.operators.Graph
          .triangleCounts(es.toSeq.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        // Brute force: every unordered node triple with all three edges
        // credits each member once.
        val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
        val has = (a: Long, b: Long) =>
          es.contains((math.min(a, b), math.max(a, b)))
        val want = nodes.map { v =>
          v -> (for {
            i <- nodes if i != v
            j <- nodes if j > i && j != v
            if has(v, i) && has(v, j) && has(i, j)
          } yield 1).size.toLong
        }.toMap
        assert(got == want, s"edges $es")
      }
    }
  }
}
