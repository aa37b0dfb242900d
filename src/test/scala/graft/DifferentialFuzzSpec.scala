package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.structure._
import graft.reducers._

/** Property-based differential tests: every structure/reducer operator must
  * agree with a plain-Scala reference implementation on arbitrary ragged
  * inputs (the reference repo's strategy of differential-testing against
  * eager awkward, with ScalaCheck generating the corpus; sampled directly
  * — the scalatest/scalacheck bridge isn't a dependency). */
class DifferentialFuzzSpec extends SparkSuite {
  import spark.implicits._

  private val ragged: Gen[List[List[Double]]] =
    Gen.listOfN(8, Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-50, 50).map(_.toDouble))))

  private def forAllSamples(n: Int = 12)(f: List[List[Double]] => Unit): Unit = {
    val seed = org.scalacheck.rng.Seed(42L)
    var s = seed
    var done = 0
    while (done < n) {
      ragged.apply(Gen.Parameters.default, s).foreach { rows => f(rows); done += 1 }
      s = s.next
    }
  }

  private def run[T: org.apache.spark.sql.Encoder](
      rows: List[List[Double]], c: org.apache.spark.sql.Column): Seq[T] =
    rows.toDF("xs").select(c).as[T].collect().toSeq

  test("sort/argsort/firsts/num agree with Scala on random ragged rows") {
    forAllSamples() { rows =>
      assert(run[Seq[Double]](rows, sortList($"xs")) == rows.map(_.sorted))
      assert(run[Seq[Int]](rows, argsortList($"xs")) ==
        rows.map(r => r.zipWithIndex.sortBy { case (v, i) => (v, i) }.map(_._2)))
      assert(run[Option[Double]](rows, firsts($"xs")) == rows.map(_.headOption))
      assert(run[Int](rows, num($"xs")) == rows.map(_.size))
    }
  }

  test("reducers agree with Scala folds") {
    forAllSamples() { rows =>
      assert(run[Double](rows, sumList($"xs")) == rows.map(_.sum))
      assert(run[Option[Double]](rows, minList($"xs")) ==
        rows.map(r => if (r.isEmpty) None else Some(r.min)))
      assert(run[Option[Double]](rows, maxList($"xs")) ==
        rows.map(r => if (r.isEmpty) None else Some(r.max)))
      assert(run[Int](rows, countList($"xs")) == rows.map(_.size))
      assert(run[Option[Long]](rows, argminList($"xs")) ==
        rows.map(r => if (r.isEmpty) None else Some(r.indexOf(r.min).toLong)))
    }
  }

  test("pad/fill/slice agree with Scala") {
    forAllSamples() { rows =>
      assert(run[Seq[Option[Double]]](rows, padNone($"xs", 4)) ==
        rows.map(r => r.map(Some(_)) ++ Seq.fill(math.max(0, 4 - r.size))(None)))
      assert(run[Seq[Double]](rows, fillNone(padNone($"xs", 4), lit(-1.0))) ==
        rows.map(r => r ++ Seq.fill(math.max(0, 4 - r.size))(-1.0)))
      assert(run[Seq[Double]](rows, sliceList($"xs", 1, 3)) ==
        rows.map(_.slice(1, 3)))
    }
  }

  test("combinationsN matches Scala combinations enumeration") {
    forAllSamples() { rows =>
      val got = run[Seq[Seq[Double]]](rows, combinationsN($"xs", 2))
      val want = rows.map(r =>
        r.indices.flatMap(i => (i + 1 until r.size).map(j => Seq(r(i), r(j)))))
      assert(got == want)
    }
  }

  test("ngramJaccardPairs matches brute-force set arithmetic on random corpora") {
    val vocab = Vector("red", "blue", "fox", "jumps", "lazy", "dog", "river")
    val doc: Gen[String] =
      Gen.choose(2, 10).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
        .map(_.mkString(" "))
    val corpus: Gen[List[String]] = Gen.listOfN(12, doc)
    var s = org.scalacheck.rng.Seed(7L)
    var done = 0
    while (done < 8) {
      corpus.apply(Gen.Parameters.default, s).foreach { docs =>
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val got = graft.dedup.ngramJaccardPairs(df, "doc_id", "text", 2, 50)
          .select($"id1", $"id2", $"inter", $"uni")
          .as[(Long, Long, Long, Long)].collect().toSet
        def grams(t: String): Set[String] =
          t.trim.toLowerCase.split("\\s+").sliding(2).filter(_.length == 2)
            .map(_.mkString(" ")).toSet
        val want = (for {
          i <- docs.indices; j <- docs.indices if i < j
          gi = grams(docs(i)); gj = grams(docs(j))
          inter = gi.intersect(gj).size; uni = gi.union(gj).size
          if inter * 100 >= uni * 50 && inter > 0
        } yield (i.toLong, j.toLong, inter.toLong, uni.toLong)).toSet
        assert(got == want, s"corpus=$docs")
        done += 1
      }
      s = s.next
    }
  }

  test("dedupSpans matches a brute-force span-removal model on random corpora") {
    // tiny vocabulary + short docs => dense window collisions, incl.
    // within-doc repeats, full coverage, and docs shorter than the window
    val rnd = new scala.util.Random(17)
    for (round <- 0 until 3) {
      val w = 2 + round // windows of 2, 3, 4 tokens
      val docs = (0 until 40).map { id =>
        val n = rnd.nextInt(10)
        (id.toLong, (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar.toString)
          .mkString(" "))
      }
      val expected = {
        val toks = docs.map { case (id, t) =>
          id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
        val occ = scala.collection.mutable.Map.empty[Seq[String], Int]
        for ((_, ts) <- toks; g <- ts.sliding(w) if g.length == w)
          occ(g) = occ.getOrElse(g, 0) + 1
        toks.map { case (id, ts) =>
          val covered = ts.indices.filter { p =>
            (math.max(0, p - w + 1) to math.min(p, ts.length - w))
              .exists(s => occ.getOrElse(ts.slice(s, s + w), 0) >= 2)
          }.toSet
          val kept = ts.indices.filterNot(covered).map(ts)
          id -> ((ts.length.toLong, kept.length.toLong, kept.mkString(" ")))
        }
      }
      // empty text tokenizes to [""] in both engines — model that quirk
      val expectedAdj = expected.map { case (id, v) =>
        if (docs(id.toInt)._2.isEmpty) id -> ((1L, 1L, "")) else id -> v }
      val got = graft.text.dedupSpans(
          docs.toDF("doc_id", "text"), "doc_id", "text", w)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == expectedAdj, s"w=$w")
    }
  }

  test("contamination flag never misses a truly-shared doc on random corpora") {
    val rnd = new scala.util.Random(43)
    val vocab = ('a' to 'h').map(_.toString)
    def doc(): String =
      (0 until 4 + rnd.nextInt(6)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (_ <- 0 until 3) {
      val train = (0 until 60).map(i => (i.toLong, doc()))
      val eval = (0 until 15).map(i => (1000L + i, doc()))
      def shingles(t: String): Set[String] =
        t.split(" ").toSeq.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSet
      val evalSh = eval.flatMap(e => shingles(e._2)).toSet
      val truly = train.filter { case (_, t) =>
        (shingles(t) & evalSh).size >= 2 }.map(_._1).toSet
      val flagged = graft.streaming.Streaming.streamingContaminationFlag(
          train.toDF("doc_id", "text"), eval.toDF("doc_id", "text"),
          "doc_id", "text", minShared = 2)
        .filter($"flagged").select($"doc_id").as[Long].collect().toSet
      assert(truly.subsetOf(flagged), s"missed: ${truly -- flagged}")
    }
  }

  test("dedupSentences matches a keep-first brute-force model") {
    val rnd = new scala.util.Random(31)
    val pool = Seq("buy now", "hello there", "alpha beta", "gamma", "delta five")
    val docs = (0 until 50).map { id =>
      val n = rnd.nextInt(5)
      (id.toLong, (0 until n).map(_ => pool(rnd.nextInt(pool.size)))
        .mkString(". ") + (if (n > 0) "." else ""))
    }
    val model = {
      def sents(t: String): Seq[String] =
        t.split("[.!?]+").map(_.trim).filter(_.nonEmpty).toSeq
      val all = docs.flatMap { case (id, t) =>
        sents(t).zipWithIndex.map { case (s, i) => (id, i + 1, s) } }
      val occ = all.groupBy(_._3).map { case (s, xs) =>
        s -> ((xs.size, xs.map(x => (x._1, x._2)).min)) }
      docs.map { case (id, t) =>
        val ss = sents(t)
        val kept = ss.zipWithIndex.collect {
          case (s, i) if occ(s)._1 < 2 || occ(s)._2 == ((id, i + 1)) => s }
        id -> ((ss.size.toLong, kept.size.toLong, kept))
      }.toMap
    }
    val got = graft.text.dedupSentences(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == model)
  }

  test("asofJoinLast matches brute-force latest-at-or-before on random inputs") {
    val rows: Gen[(List[(Long, Long)], List[(Long, Long, Double)])] = for {
      l <- Gen.listOfN(20, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 50L)))
      r <- Gen.listOfN(10, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 50L)))
    } yield (l, r.map { case (k, t) => (k, t, (k * 100 + t).toDouble) }
      .distinctBy(x => (x._1, x._2))) // unique (key, ts) per contract
    var s = org.scalacheck.rng.Seed(11L)
    var done = 0
    while (done < 8) {
      rows.apply(Gen.Parameters.default, s).foreach { case (l, r) =>
        val left = l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
          .toDF("row_id", "k", "ts")
        val right = r.toDF("k", "ts", "v")
        // all five implementations (union+window, native planner exec,
        // broadcast binary search, salted two-phase, scalar lookup
        // expression) against the brute-force model; tiny buckets so the
        // salted form's carry chain crosses bucket boundaries constantly
        for (impl <- Seq("window", "native", "broadcast", "salted", "lookup")) {
          val joined = impl match {
            case "window" => graft.operators.AsofJoin
              .asofJoinLast(left, right, "k", "ts", Seq("v"))
            case "native" => graft.operators.AsofJoin
              .asofJoinNative(left, right, "k", "ts", Seq("v"))
            case "salted" => graft.operators.AsofJoin
              .asofJoinSalted(left, right, "k", "ts", Seq("v"), buckets = 4)
            case "lookup" => left.withColumn("asof_v",
              graft.functions.AsofLookup.asofLookup(right, "k", "ts", "v")(
                $"k", $"ts"))
            case _ => graft.operators.AsofJoin
              .asofJoinBroadcast(left, right, "k", "ts", Seq("v"))
          }
          val got = joined
            .select($"row_id", $"asof_v").as[(Long, Option[Double])]
            .collect().toMap
          l.zipWithIndex.foreach { case ((k, t), i) =>
            val want = r.filter(x => x._1 == k && x._2 <= t)
              .sortBy(_._2).lastOption.map(_._3)
            assert(got(i.toLong) == want,
              s"[$impl] row $i key=$k ts=$t l=$l r=$r")
          }
        }
        done += 1
      }
      s = s.next
    }
  }

  test("asof: null payloads resolve to null in every impl; extreme-span salted buckets stay exact") {
    // advisor findings, round 6. (a) AsofLookup's table mapped a matched
    // null payload to NaN — diverging from the join forms' null and
    // poisoning downstream sums; all five impls must now agree on null.
    val left = Seq((0L, 1L, 10L), (1L, 1L, 25L), (2L, 2L, 10L))
      .toDF("row_id", "k", "ts")
    val right = Seq((1L, 5L, Some(1.5)), (1L, 20L, None), (2L, 50L, Some(9.9)))
      .toDF("k", "ts", "v")
    // row 0: matches (1,5)=1.5; row 1: matches (1,20)=NULL payload —
    // the later null row SHADOWS the earlier 1.5; row 2: no match
    val want = Map(0L -> Some(1.5), 1L -> None, 2L -> None)
    for (impl <- Seq("window", "native", "broadcast", "salted", "lookup")) {
      val joined = impl match {
        case "window" => graft.operators.AsofJoin
          .asofJoinLast(left, right, "k", "ts", Seq("v"))
        case "native" => graft.operators.AsofJoin
          .asofJoinNative(left, right, "k", "ts", Seq("v"))
        case "salted" => graft.operators.AsofJoin
          .asofJoinSalted(left, right, "k", "ts", Seq("v"), buckets = 4)
        case "lookup" => left.withColumn("asof_v",
          graft.functions.AsofLookup.asofLookup(right, "k", "ts", "v")(
            $"k", $"ts"))
        case _ => graft.operators.AsofJoin
          .asofJoinBroadcast(left, right, "k", "ts", Seq("v"))
      }
      val got = joined.select($"row_id", $"asof_v")
        .as[(Long, Option[Double])].collect().toMap
      assert(got == want, s"[$impl] got $got")
      assert(!got.values.flatten.exists(_.isNaN), s"[$impl] NaN leaked")
    }
    // (b) asofJoinSalted's span math: for mixed-sign extreme long ts,
    // mx - mn used to wrap negative, collapsing width to 1 and sending
    // real rows to negative bucket ids that collide with the -1 null-ts
    // sentinel. The BigInt span + decimal bucketing path must match the
    // window form exactly.
    val xl = Seq((0L, 1L, Long.MinValue / 2), (1L, 1L, -10L),
      (2L, 1L, 10L), (3L, 1L, Long.MaxValue / 2), (4L, 2L, Long.MaxValue - 5))
      .toDF("row_id", "k", "ts")
    val xr = Seq((1L, Long.MinValue / 2 - 100L, 1.0), (1L, -50L, 2.0),
      (1L, 5L, 3.0), (1L, Long.MaxValue / 2 - 7L, 4.0),
      (2L, Long.MaxValue - 9L, 5.0)).toDF("k", "ts", "v")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val wantX = graft.operators.AsofJoin
        .asofJoin(xl, xr, "k", "ts", Seq("v"), dir)
        .select($"row_id", $"asof_v").as[(Long, Option[Double])]
        .collect().toMap
      val gotX = graft.operators.AsofJoin
        .asofJoinSalted(xl, xr, "k", "ts", Seq("v"), dir, buckets = 8)
        .select($"row_id", $"asof_v").as[(Long, Option[Double])]
        .collect().toMap
      assert(gotX == wantX, s"[$dir] salted=$gotX window=$wantX")
    }
  }

  test("asof nearest: extreme-span distances compared exactly in every impl") {
    // the nearest distance compare `t - b <= f - t` wraps in Long when the
    // back-to-fwd span exceeds Long range, picking the FAR match. All
    // impls used the same wrapping arithmetic, so an impl-vs-impl
    // differential could never catch it — this model computes distances
    // in BigInt, independently of any engine path.
    val lt = Long.MaxValue / 2
    val left = Seq((0L, 1L, lt)).toDF("row_id", "k", "ts")
    // backward match ~9.2e18 away, forward match 10 away: nearest = fwd
    val right = Seq((1L, Long.MinValue / 2 - 100L, 1.0), (1L, lt + 10L, 2.0))
      .toDF("k", "ts", "v")
    val wantB = BigInt(lt) - (BigInt(Long.MinValue / 2) - 100)
    val wantF = BigInt(lt + 10L) - BigInt(lt)
    assert(wantF < wantB) // the model itself: forward is nearer
    for (impl <- Seq("window", "salted", "broadcast")) {
      val joined = impl match {
        case "window" => graft.operators.AsofJoin
          .asofJoin(left, right, "k", "ts", Seq("v"), "nearest")
        case "salted" => graft.operators.AsofJoin
          .asofJoinSalted(left, right, "k", "ts", Seq("v"), "nearest", buckets = 4)
        case _ => graft.operators.AsofJoin
          .asofJoinBroadcast(left, right, "k", "ts", Seq("v"), "nearest")
      }
      val got = joined.select($"asof_v").as[Option[Double]].collect().head
      assert(got.contains(2.0),
        s"[$impl] picked the far match across a wrapped span: $got")
    }
  }

  test("asofJoin forward/nearest match brute-force on random inputs") {
    val rows: Gen[(List[(Long, Long)], List[(Long, Long, Double)])] = for {
      l <- Gen.listOfN(20, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 50L)))
      r <- Gen.listOfN(10, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 50L)))
    } yield (l, r.map { case (k, t) => (k, t, (k * 100 + t).toDouble) }
      .distinctBy(x => (x._1, x._2)))
    var s = org.scalacheck.rng.Seed(23L)
    var done = 0
    while (done < 6) {
      rows.apply(Gen.Parameters.default, s).foreach { case (l, r) =>
        val left = l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
          .toDF("row_id", "k", "ts")
        val right = r.toDF("k", "ts", "v")
        def run(dir: String, salted: Boolean) = (if (salted)
            graft.operators.AsofJoin
              .asofJoinSalted(left, right, "k", "ts", Seq("v"), dir, buckets = 4)
          else graft.operators.AsofJoin
            .asofJoin(left, right, "k", "ts", Seq("v"), dir))
          .select($"row_id", $"asof_v").as[(Long, Option[Double])]
          .collect().toMap
        for (salted <- Seq(false, true)) {
          val tag = if (salted) "salted-" else ""
          val (gotF, gotN) = (run("forward", salted), run("nearest", salted))
          l.zipWithIndex.foreach { case ((k, t), i) =>
            val back = r.filter(x => x._1 == k && x._2 <= t).sortBy(_._2).lastOption
            val fwd = r.filter(x => x._1 == k && x._2 >= t).sortBy(_._2).headOption
            val near = (back, fwd) match {
              case (Some(b), Some(f)) =>
                if (t - b._2 <= f._2 - t) Some(b) else Some(f) // tie -> backward
              case (b, f) => b.orElse(f)
            }
            assert(gotF(i.toLong) == fwd.map(_._3),
              s"[${tag}forward] row $i key=$k ts=$t l=$l r=$r")
            assert(gotN(i.toLong) == near.map(_._3),
              s"[${tag}nearest] row $i key=$k ts=$t l=$l r=$r")
          }
        }
        done += 1
      }
      s = s.next
    }
  }

  test("bloomAntiJoin matches left_anti on random key sets") {
    val sets: Gen[(List[Long], List[Long], Double)] = for {
      l <- Gen.listOfN(60, Gen.choose(0L, 40L))
      r <- Gen.listOfN(30, Gen.choose(0L, 40L))
      fpp <- Gen.oneOf(0.01, 0.2, 0.5) // include near-degenerate filters
    } yield (l, r, fpp)
    var s = org.scalacheck.rng.Seed(23L)
    var done = 0
    while (done < 6) {
      sets.apply(Gen.Parameters.default, s).foreach { case (l, r, fpp) =>
        val left = l.zipWithIndex.map { case (k, i) => (i.toLong, k) }
          .toDF("row_id", "k")
        val right = r.toDF("rk")
        val want = left.join(right, $"k" === $"rk", "left_anti")
          .select($"row_id").as[Long].collect().toSet
        val got = graft.operators.BloomAntiJoin
          .bloomAntiJoin(left, right, "k", "rk",
            expectedItems = 16, fpp = fpp)
          .select($"row_id").as[Long].collect().toSet
        assert(got == want, s"fpp=$fpp l=$l r=$r")
        done += 1
      }
      s = s.next
    }
  }

  test("connectedComponents matches union-find on random graphs") {
    val graphs: Gen[List[(Long, Long)]] =
      Gen.listOfN(40, Gen.zip(Gen.choose(0L, 24L), Gen.choose(0L, 24L)))
        .map(_.filter(e => e._1 != e._2))
    var s = org.scalacheck.rng.Seed(7L)
    var done = 0
    while (done < 6) {
      graphs.apply(Gen.Parameters.default, s).foreach { edges =>
        if (edges.nonEmpty) {
          // reference model: union-find, components labeled by their min id
          val parent = scala.collection.mutable.Map[Long, Long]()
          def find(x: Long): Long = {
            val p = parent.getOrElseUpdate(x, x)
            if (p == x) x else { val r = find(p); parent(x) = r; r }
          }
          def union(a: Long, b: Long): Unit = {
            val (ra, rb) = (find(a), find(b))
            if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
          }
          edges.foreach { case (a, b) => union(a, b) }
          val want = parent.keys.map(v => v -> find(v)).toMap
          val got = graft.dedup.connectedComponents(
              edges.toDF("a", "b"), "a", "b")
            .as[(Long, Long)].collect().toMap
          assert(got == want, s"edges=$edges")
        }
        done += 1
      }
      s = s.next
    }
  }

  test("range joins match brute force on random (incl. negative) intervals") {
    // random points and intervals over a signed domain: exercises negative
    // bucket indices (floor-toward-minus-infinity), zero-width intervals,
    // degenerate start>end intervals (no points can fall inside; overlap
    // follows the raw predicate), and pairs sharing many buckets (the
    // overlap dedup)
    val pointGen = Gen.listOfN(40, Gen.choose(-500L, 500L))
    val ivGen = Gen.listOfN(25, for {
      a <- Gen.choose(-500L, 500L)
      // negative span => degenerate interval; the rare extreme span models a
      // hi=-1 sentinel against an epoch-second lo — unclamped, that would
      // explode a billion-element descending bucket sequence
      span <- Gen.frequency(
        (8, Gen.choose(-40L, 120L)),
        (1, Gen.const(-1000000000L)))
    } yield (a, a + span))
    val seed = org.scalacheck.rng.Seed(4242L)
    var s = seed
    var done = 0
    while (done < 8) {
      val sample = for { ps <- pointGen; is <- ivGen } yield (ps, is)
      sample.apply(Gen.Parameters.default, s).foreach { case (ps, is) =>
        val pts = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
          .toDF("lid", "pt")
        val ivs = is.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
          .toDF("rid", "lo", "hi")
        val wantPt = (for {
          (p, i) <- ps.zipWithIndex
          ((a, b), j) <- is.zipWithIndex
          if p >= a && p <= b
        } yield (i.toLong, j.toLong)).toSet
        for (w <- Seq(7L, 100L)) {
          val got = graft.operators.RangeJoin
            .pointInInterval(pts, ivs, "pt", "lo", "hi", w)
            .select($"lid", $"rid").as[(Long, Long)].collect()
          assert(got.length == got.toSet.size, s"dup pairs w=$w")
          assert(got.toSet == wantPt, s"point-in-interval mismatch w=$w")
        }
        val ivs2 = is.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
          .toDF("rid2", "lo2", "hi2")
        // degenerate (start>end) intervals follow the raw predicate, same
        // as the SQL form `lstart <= rend AND rstart <= lend`
        val wantOv = (for {
          ((a, b), i) <- is.zipWithIndex
          ((c, d), j) <- is.zipWithIndex
          if a <= d && c <= b
        } yield (i.toLong, j.toLong)).toSet
        for (w <- Seq(7L, 100L)) {
          val got = graft.operators.RangeJoin
            .intervalOverlap(ivs, ivs2, "lo", "hi", "lo2", "hi2", w)
            .select($"rid", $"rid2").as[(Long, Long)].collect()
          assert(got.length == got.toSet.size, s"dup overlap pairs w=$w")
          assert(got.toSet == wantOv, s"interval-overlap mismatch w=$w")
        }
        // the optimizer rule must make the NAIVE spelling of the same join
        // agree too (plan rewritten under the hood) — for every rewritable
        // join type
        val key = graft.plans.RangeJoinRewrite.WidthKey
        try {
          spark.conf.set(key, "7")
          val got = pts.join(ivs, $"pt" >= $"lo" && $"pt" <= $"hi")
            .select($"lid", $"rid").as[(Long, Long)].collect()
          assert(got.length == got.toSet.size, "rule produced duplicates")
          assert(got.toSet == wantPt, "rule-rewritten join mismatch")
          val matchedL = wantPt.map(_._1)
          val lo = pts.join(ivs, $"pt" >= $"lo" && $"pt" <= $"hi", "left")
            .select($"lid", $"rid").as[(Long, Option[Long])].collect()
          val wantLo = wantPt.toSeq.map { case (l, r) => (l, Some(r): Option[Long]) } ++
            ps.indices.filterNot(i => matchedL(i.toLong)).map(i => (i.toLong, None))
          assert(lo.sorted.toSeq == wantLo.sorted, "left-outer mismatch")
          val semi = pts.join(ivs, $"pt" >= $"lo" && $"pt" <= $"hi", "left_semi")
            .select($"lid").as[Long].collect()
          assert(semi.length == semi.toSet.size && semi.toSet == matchedL,
            "left-semi mismatch")
          val anti = pts.join(ivs, $"pt" >= $"lo" && $"pt" <= $"hi", "left_anti")
            .select($"lid").as[Long].collect().toSet
          assert(anti == ps.indices.map(_.toLong).toSet -- matchedL,
            "left-anti mismatch")
        } finally spark.conf.unset(key)
        done += 1
      }
      s = s.next
    }
  }

  test("frequentItems invariants hold on random streams and capacities") {
    // MG guarantees regardless of data: (1) counts never overestimate,
    // (2) undercount bounded by N/(cap+1), (3) anything above the
    // threshold survives, (4) exact when the vocabulary fits
    val streamGen = for {
      nKinds <- Gen.choose(2, 30)
      n <- Gen.choose(50, 400)
      items <- Gen.listOfN(n, Gen.choose(0, nKinds - 1))
      cap <- Gen.choose(2, 40)
    } yield (items.map(i => s"k$i"), cap)
    val seed = org.scalacheck.rng.Seed(777L)
    var s = seed
    var done = 0
    while (done < 10) {
      streamGen.apply(Gen.Parameters.default, s).foreach { case (items, cap) =>
        val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val n = items.size
        val got = graft.sketches.FrequentItems
          .frequentItems(items.toDF("x"), "x", cap)
          .as[(String, Long)].collect().toMap
        val bound = n / (cap + 1)
        got.foreach { case (k, c) =>
          assert(c <= truth(k), s"$k overcounted: $c > ${truth(k)} (cap=$cap)")
          assert(c >= truth(k) - bound, s"$k undercut the bound (cap=$cap)")
        }
        truth.foreach { case (k, c) =>
          if (c > bound) assert(got.contains(k), s"heavy $k lost (cap=$cap n=$n)")
        }
        if (truth.size <= cap) assert(got == truth, s"exact mode violated (cap=$cap)")
        done += 1
      }
      s = s.next
    }
  }

  test("bm25TopK full output matches a brute model on random corpora") {
    // every row — qid pairing, ranks, ids, 4dp scores — against a plain-
    // Scala BM25 with the identical double expression tree (association
    // matters) and Spark's HALF_UP shortest-decimal rounding
    val rnd = new scala.util.Random(4242L)
    val rich = Vector("ab", "cd", "ef", "wolf", "raven", "heron", "otter",
      "lynx", "marten", "badger", "stoat", "vole", "shrew", "x")
    // degenerate vocabularies: fewer qualifying (len>=4) terms than 2*nq
    // (odd counts give a trailing one-term query), or none at all
    val sparse = Vector("ab", "cd", "ef", "gh", "wolf", "raven", "heron")
    val barren = Vector("ab", "cd", "ef", "gh", "x")
    for (trial <- 0 until 9) {
      val vocab = Seq(rich, sparse, barren)(trial % 3)
      val nq = 1 + rnd.nextInt(3)
      val k = 1 + rnd.nextInt(5)
      val (k1, b) = (0.5 + rnd.nextDouble(), rnd.nextDouble())
      val docs = (0L until (5 + rnd.nextInt(25)).toLong).map { id =>
        val n = rnd.nextInt(30)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = graft.text.bm25TopK(docs.toDF("doc_id", "text"),
          "doc_id", "text", nq = nq, k = k, k1 = k1, b = b)
        .select($"qid", $"rank", $"doc_id", $"score")
        .as[(Int, Int, Long, Double)].collect().toSet
      // brute model
      val toks = docs.map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+").toSeq }.toMap
      val n = docs.length
      val avgdl = toks.valuesIterator.map(_.size.toLong).sum.toDouble / n
      val tf = toks.view.mapValues(
        _.groupBy(identity).view.mapValues(_.size.toLong).toMap).toMap
      val dfreq = tf.values.flatMap(_.keys).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val ctf = toks.values.flatten.groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val terms = ctf.toSeq.filter(_._1.length >= 4)
        .sortBy { case (t, c) => (-c, t) }.take(2 * nq)
      def rnd4(x: Double): Double = java.math.BigDecimal.valueOf(x)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
      val exp = terms.indices.by(2).flatMap { i =>
        val qid = i / 2
        val qts = terms.slice(i, i + 2)
        val scored = toks.keys.toSeq.flatMap { id =>
          val s = qts.map { case (t, _) =>
            tf(id).get(t).fold(0.0) { f =>
              val d = dfreq(t)
              math.log(1.0 + ((n.toDouble - d.toDouble) + 0.5) / (d.toDouble + 0.5)) *
                ((f.toDouble * (k1 + 1.0)) /
                  (f.toDouble + k1 * ((1.0 - b) + (b * toks(id).size.toDouble) / avgdl)))
            }
          }.sum
          if (s > 0.0) Seq((id, rnd4(s))) else Nil
        }
        scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
          .map { case ((id, s), r) => (qid, r + 1, id, s) }
      }.toSet
      assert(got == exp,
        s"trial $trial (nq=$nq k=$k k1=$k1 b=$b): " +
          s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
    }
  }

  test("runLengths matches a linear Scala pass") {
    forAllSamples() { rows =>
      def rl(r: List[Double]): Seq[Int] = {
        if (r.isEmpty) return Seq.empty
        val out = scala.collection.mutable.ArrayBuffer[Int]()
        var cur = 1
        for (i <- 1 until r.size) {
          if (r(i) == r(i - 1)) cur += 1
          else { out += cur; cur = 1 }
        }
        out += cur
        out.toSeq
      }
      assert(run[Seq[Int]](rows, runLengths($"xs")) == rows.map(rl))
    }
  }

  test("bpeTrainMerges matches a string-replace reference on random corpora") {
    // the driver merge loop is imperative array code; this pins it against
    // an INDEPENDENT model built on the oracle's exact mechanism —
    // delimited |c1||c2| strings + literal java String.replace (left-to-
    // right non-overlapping, same as Spark/DuckDB replace). Alphabet of 3
    // and short words force dense pair-count ties, exercising the
    // (weight desc, a, b) tie-break on both sides.
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val alpha = "abc"
      val words = (0 until 40).map { _ =>
        (0 until 1 + rnd.nextInt(6))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = graft.text.bpeTrainMerges(df, "text",
          vocabCap = 30, nMerges = 6)
        .orderBy($"merge_rank")
        .as[(Int, String, String, String, Long)].collect().toSeq
      var vocab: Seq[(String, Long)] = words.groupBy(identity).view
        .mapValues(_.size.toLong).toSeq
        .sortBy { case (w, c) => (-c, w) }.take(30)
        .map { case (w, c) =>
          ("|" + w.split("").filter(_.nonEmpty).mkString("||") + "|", c) }
      val want = scala.collection.mutable.Buffer[(Int, String, String, String, Long)]()
      var r = 1
      var stop = false
      while (r <= 6 && !stop) {
        val pairs = scala.collection.mutable.Map[(String, String), Long]()
        vocab.foreach { case (repr, c) =>
          val syms = repr.stripPrefix("|").stripSuffix("|").split("\\|\\|")
          syms.sliding(2).filter(_.length == 2).foreach { p =>
            pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + c
          }
        }
        if (pairs.isEmpty) stop = true
        else {
          val ((a, b), w) = pairs.toSeq
            .minBy { case ((pa, pb), pw) => (-pw, pa, pb) }
          want += ((r, a, b, a + b, w))
          vocab = vocab.map { case (repr, c) =>
            (repr.replace(s"|$a||$b|", s"|$a$b|"), c) }
          r += 1
        }
      }
      assert(got == want.toSeq, s"trial $trial: got $got, want $want")
    }
  }

  test("funnel and sessionize agree with driver-side reference models") {
    // random event streams: few users, tiny alphabet, clustered
    // timestamps with deliberate ties — the regime where ordering and
    // window edge cases live
    val eventGen = Gen.listOfN(60, for {
      u <- Gen.choose(1, 5)
      t <- Gen.choose(0, 50)
      ty <- Gen.oneOf("view", "click", "purchase", "error")
    } yield (u.toLong, t.toLong * 1000L, ty))
    val stages = Seq("view", "click", "purchase")
    val windowUs = 8000L
    val gapUs = 5000L
    var s = org.scalacheck.rng.Seed(2024L)
    for (trial <- 0 until 10) {
      val evs0 = eventGen.apply(Gen.Parameters.default, s).get
      s = s.next
      // unique tiebreak ids; ties only in ts
      val evs = evs0.zipWithIndex.map { case ((u, t, ty), i) =>
        (u, t, i.toLong, ty)
      }
      val df = evs.toDF("user_id", "us", "event_id", "event_type")
        .select($"user_id", timestamp_micros($"us").as("ts"),
          $"event_id", $"event_type")
      val byUser = evs.groupBy(_._1).map { case (u, rows) =>
        u -> rows.sortBy(r => (r._2, r._3))
      }
      // reference greedy windowed fold
      val wantDepth = byUser.map { case (u, rows) =>
        var d = 0; var mts = 0L
        rows.foreach { case (_, ts, _, ty) =>
          if (d < stages.size && stages(d) == ty &&
              (d == 0 || ts <= mts + windowUs)) { d += 1; mts = ts }
        }
        u -> d
      }
      val gotDepth = graft.operators.Funnel.funnelDepthWindowed(
          df, "user_id", "ts", "event_id", "event_type", stages, windowUs)
        .as[(Long, Int)].collect().toMap
      assert(gotDepth == wantDepth, s"trial $trial funnel: " +
        s"got $gotDepth want $wantDepth")
      // reference sessionizer
      val wantSess = byUser.flatMap { case (u, rows) =>
        var sid = 0L; var prev = Long.MinValue
        rows.map { case (_, ts, eid, _) =>
          if (prev == Long.MinValue || ts - prev > gapUs) sid += 1
          prev = ts
          (u, eid) -> sid
        }
      }.toMap
      val gotSess = graft.operators.Retention.sessionize(
          df, "user_id", "ts", "event_id", gapUs)
        .select($"user_id", $"event_id", $"session_id")
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(gotSess == wantSess, s"trial $trial sessionize")
    }
  }

  test("exactQuantiles (global + grouped) match sorted references on random data") {
    import graft.operators.ExactQuantiles
    val rnd = new scala.util.Random(23L)
    for (trial <- 1 to 6) {
      val n = 50 + rnd.nextInt(400)
      // mixed regimes per trial: dense ties, wide magnitudes, negatives
      val gen: () => Double = trial % 3 match {
        case 0 => () => (rnd.nextInt(7) - 3).toDouble          // tie-heavy
        case 1 => () => math.pow(10, rnd.nextInt(12) - 6) *
          (if (rnd.nextBoolean()) 1 else -1) * rnd.nextDouble() // wide
        case 2 => () => rnd.nextGaussian()
      }
      val rows = Seq.fill(n)((s"g${rnd.nextInt(3)}", gen()))
      val probs = Seq(0.0, rnd.nextDouble(), 0.5, 1.0)
      val df = rows.toDF("g", "v").repartition(1 + rnd.nextInt(8))
      def disc(vs: Seq[Double], p: Double): Double = {
        val k = math.max(1L, math.ceil(p * vs.length).toLong).toInt
        vs.sorted.apply(k - 1)
      }
      val all = rows.map(_._2)
      val gotG = ExactQuantiles.exactQuantiles(df, "v", probs)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      probs.foreach(p => assert(gotG(p) == disc(all, p), s"trial $trial p=$p"))
      val gotGrp = ExactQuantiles.exactQuantilesByGroup(df, "g", "v", probs)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
        .toMap
      for ((g, vs) <- rows.groupBy(_._1); p <- probs)
        assert(gotGrp((g, p)) == disc(vs.map(_._2), p),
          s"trial $trial g=$g p=$p")
    }
  }

  test("kCore matches the brute-force peel on random graphs") {
    import graft.operators.KCore
    val rnd = new scala.util.Random(29L)
    for (trial <- 1 to 5) {
      val nodes = 8 + rnd.nextInt(25)
      val edges = Seq.fill(30 + rnd.nextInt(120))(
        (rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong))
      val df = edges.toDF("src", "dst")
      val undirected = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e, e.swap)).distinct
      def brute(k: Int): Map[Long, Long] = {
        var adj = undirected.groupBy(_._1).map { case (a, es) =>
          a -> es.map(_._2).toSet }
        var changed = true
        while (changed) {
          val dead = adj.collect { case (a, ns) if ns.size < k => a }.toSet
          changed = dead.nonEmpty
          adj = adj.collect { case (a, ns) if !dead(a) => a -> (ns -- dead) }
        }
        adj.map { case (a, ns) => a -> ns.size.toLong }
      }
      for (k <- Seq(1, 2, 3, 5)) {
        val got = KCore.kCore(df, k).as[(Long, Long)].collect().toMap
        assert(got == brute(k), s"trial $trial k=$k")
      }
    }
  }
}
