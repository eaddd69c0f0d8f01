package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Algebraic-law property tests (SURVEY.md §5.2 #3), driven by ScalaCheck
  * generators sampled under fixed seeds (deterministic, no scalatestplus
  * bridge needed offline). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def forSamples[T](gen: Gen[T], n: Int = 10)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(body)
    }

  private val smallInts = Gen.listOfN(30, Gen.chooseNum(-50, 50))

  test("union-all count additivity") {
    forSamples(Gen.zip(smallInts, smallInts)) { case (a, b) =>
      assert(a.toDF("x").unionAll(b.toDF("x")).count() === a.size + b.size)
    }
  }

  test("filter split partitions rows: |P| + |not P| = n") {
    forSamples(smallInts) { a =>
      val df = a.toDF("x")
      val p = col("x") > 0
      assert(df.where(p).count() + df.where(!p).count() === a.size.toLong)
    }
  }

  test("manual predicate placement is plan-invariant (pushdown equivalence)") {
    forSamples(smallInts) { a =>
      val df = a.zipWithIndex.toDF("x", "id")
      val viaProject = df.select(col("id"), (col("x") * 2).as("y")).where(col("y") > 10)
      val viaFilter = df.where(col("x") * 2 > 10).select(col("id"), (col("x") * 2).as("y"))
      assert(viaProject.orderBy("id").collect().toSeq === viaFilter.orderBy("id").collect().toSeq)
    }
  }

  test("sort is total under unique key ordering") {
    forSamples(smallInts) { a =>
      val sorted = a.zipWithIndex.toDF("x", "id").orderBy(col("x"), col("id"))
        .as[(Int, Int)].collect().toSeq
      assert(sorted === a.zipWithIndex.sortBy(t => (t._1, t._2)))
    }
  }

  test("xxhash64 is deterministic across evaluations") {
    forSamples(Gen.listOfN(10, Gen.alphaNumStr)) { ss =>
      val df = ss.toDF("s")
      val h1 = df.select(xxhash64(col("s"))).as[Long].collect().toSeq
      val h2 = df.select(xxhash64(col("s"))).as[Long].collect().toSeq
      assert(h1 === h2)
    }
  }

  test("as-of join output is contained in the range-join relation, one row per left match") {
    import graft.operators.AsOfJoin
    val tsGen = Gen.listOfN(8, Gen.chooseNum(0L, 100L))
    forSamples(Gen.zip(tsGen, tsGen), n = 5) { case (lts, rts) =>
      val l = lts.zipWithIndex.map { case (t, i) => (1L, new java.sql.Timestamp(t * 1000), i.toLong) }
        .toDF("k", "ts", "lid")
      val r = rts.zipWithIndex.map { case (t, i) => (1L, new java.sql.Timestamp(t * 1000), i.toLong) }
        .toDF("k", "rts", "rid")
      val asof = AsOfJoin.asof(l, r, Seq("k"), "ts", "rts", Seq("rid"), Seq("rid"))
        .select("lid", "rid").as[(Long, Long)].collect()
      val range = l.join(r, Seq("k")).where(col("rts") <= col("ts"))
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(asof.toSet.subsetOf(range))
      assert(asof.map(_._1).distinct.length === asof.length)
    }
  }

  test("connected components equal a reference union-find on random edge sets") {
    import graft.operators.Dedup
    val edgeGen = Gen.listOfN(12, Gen.zip(Gen.chooseNum(0L, 14L), Gen.chooseNum(0L, 14L)))
    forSamples(edgeGen, n = 5) { edges0 =>
      val edges = edges0.filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // driver-side union-find as the oracle
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = parent.keys.map(x => x -> find(x)).toMap
        val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        assert(got === expected)
      }
    }
  }

  test("bloom probe never yields a false negative on random key sets") {
    import graft.operators.BloomOps
    val keysGen = Gen.listOfN(40, Gen.chooseNum(-1000000L, 1000000L))
    forSamples(keysGen, n = 5) { keys =>
      val dim = keys.toDF("k")
      val bf = dim.agg(BloomOps.bloomAgg(xxhash64(col("k")), 1000L, 65536L).as("bf"))
      val hits = dim.select(BloomOps.mightContain(bf, xxhash64(col("k"))))
        .as[Boolean].collect()
      assert(hits.forall(identity))
    }
  }

  test("repetition fractions are proper fractions; token count is exact") {
    import graft.operators.TextStats
    val word = Gen.oneOf("a", "b", "c", "dd", "eee")
    val doc = Gen.chooseNum(1, 25).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))
    forSamples(Gen.listOfN(6, doc), n = 5) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      val stats = TextStats.repetitionStats(df, "id", "text")
        .as[(Int, Long, Double, Double, Double)].collect()
      stats.foreach { case (id, n, topTok, topBi, dupTri) =>
        assert(n === docs(id).split(" ").length.toLong)
        assert(topTok > 0.0 && topTok <= 1.0)
        assert(topBi >= 0.0 && topBi <= 1.0)
        assert(dupTri >= 0.0 && dupTri <= 1.0)
        // a doc of k tokens has max token multiplicity ≥ ceil(k / #distinct)
        val toks = docs(id).split(" ")
        assert(topTok >= 1.0 / toks.distinct.length)
      }
    }
  }

  test("sliding chunks: exact cover, count law, reconstruction at stride=window") {
    val words = Gen.listOfN(40, Gen.oneOf("a", "bb", "ccc", "dd", "e"))
    val params = Gen.zip(words, Gen.chooseNum(1, 8), Gen.chooseNum(1, 8))
      .map { case (w, a, b) => (w, math.max(a, b), math.min(a, b)) } // window >= stride
    forSamples(params, n = 15) { case (ws, window, stride) =>
      val text = ws.mkString(" ")
      val chunks = Seq(Tuple1(text)).toDF("text")
        .select(functions.TextFunctions.slidingTokenChunks(col("text"), window, stride).as("c"))
        .as[Seq[String]].head()
      val n = ws.size
      // count law: 1 + ceil(max(n - window, 0) / stride)
      val expected = 1 + math.max(0, math.ceil((n - window).toDouble / stride).toInt)
      assert(chunks.size === expected, s"n=$n w=$window s=$stride")
      // every chunk except possibly the last is exactly `window` tokens,
      // and chunk i starts at token i*stride
      chunks.zipWithIndex.foreach { case (c, i) =>
        val toks = c.split(" ", -1).toSeq
        val start = i * stride
        assert(toks === ws.slice(start, math.min(start + window, n)),
          s"chunk $i, n=$n w=$window s=$stride")
      }
      // exact cover: concatenating stride-prefixes + last chunk rebuilds the doc
      if (stride == window)
        assert(chunks.mkString(" ").split(" ", -1).toSeq === ws)
    }
  }

  test("PSI is zero on identical slices and non-negative always") {
    val vals = Gen.listOfN(60, Gen.chooseNum(0, 99).map(_.toDouble))
    forSamples(Gen.zip(vals, vals), n = 8) { case (a, b) =>
      val df = (a.map((_, true)) ++ b.map((_, false))).toDF("v", "ref")
      val rows = operators.Profile.psi(df, col("v"), col("ref"), 0.0, 100.0, 5)
        .select(col("psi_micro")).as[Long].collect()
      // each per-bucket contribution (p-q)ln(p/q) is non-negative
      assert(rows.forall(_ >= 0L))
      val same = (a.map((_, true)) ++ a.map((_, false))).toDF("v", "ref")
      val zero = operators.Profile.psi(same, col("v"), col("ref"), 0.0, 100.0, 5)
        .select(col("psi_micro")).as[Long].collect()
      assert(zero.forall(_ === 0L))
    }
  }

  test("shared spans never exceed either document's token count") {
    import graft.operators.Contamination
    val word = Gen.oneOf("x", "y", "z", "w")
    val doc = Gen.chooseNum(5, 20).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))
    forSamples(Gen.listOfN(5, doc), n = 5) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      val lens = docs.map(_.split(" ").length)
      val spans = Contamination.sharedSpans(df, "id", "text", n = 2, minSpanTokens = 2)
        .as[(Int, Int, Long)].collect()
      spans.foreach { case (a, b, span) =>
        assert(span <= math.min(lens(a), lens(b)).toLong, s"span $span for docs $a,$b")
        assert(a < b)
      }
      // and the span really exists: re-check one pair by brute force
      spans.sortBy(-_._3).headOption.foreach { case (a, b, span) =>
        val (ta, tb) = (docs(a).split(" ").toSeq, docs(b).split(" ").toSeq)
        val runs = for {
          i <- ta.indices; j <- tb.indices
          len = Iterator.from(0)
            .takeWhile(k => i + k < ta.size && j + k < tb.size && ta(i + k) == tb(j + k))
            .size
        } yield len
        assert(runs.max.toLong === span, s"brute-force max run vs sharedSpans for $a,$b")
      }
    }
  }

  test("contamination shared-gram counts are bounded by each side's distinct grams") {
    import graft.operators.Contamination
    val word = Gen.oneOf("p", "q", "r")
    val doc = Gen.chooseNum(3, 15).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))
    forSamples(Gen.zip(Gen.listOfN(3, doc), Gen.listOfN(3, doc)), n = 5) { case (te, tr) =>
      val test = te.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      val train = tr.zipWithIndex.map { case (t, i) => (i + 100, t) }.toDF("id", "text")
      def grams(s: String, n: Int) = s.split(" ").sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSet
      Contamination.report(test, train, "id", "text", n = 2)
        .as[(Int, Int, Long)].collect().foreach { case (tid, rid, shared) =>
          val bound = math.min(grams(te(tid), 2).size, grams(tr(rid - 100), 2).size)
          assert(shared <= bound.toLong && shared >= 1L)
          assert((grams(te(tid), 2) intersect grams(tr(rid - 100), 2)).size.toLong === shared)
        }
    }
  }

  test("z-value stays within bit budget and respects per-dimension dominance") {
    import graft.operators.Layout
    val rows = Gen.listOfN(20, Gen.zip(Gen.chooseNum(0L, 1000L), Gen.chooseNum(0L, 1000L)))
    forSamples(rows, n = 5) { data =>
      val df = data.toDF("x", "y")
      val z = Layout.zvalue(Seq(col("x"), col("y")),
        Seq(lit(0L), lit(0L)), Seq(lit(1000L), lit(1000L)), bits = 8)
      val zs = df.select(z).as[Long].collect()
      assert(zs.forall(v => v >= 0 && v < (1L << 16)))
      // corners map to extremes: (0,0) -> 0, (max,max) -> all ones
      val corners = Seq((0L, 0L), (1000L, 1000L)).toDF("x", "y")
        .select(Layout.zvalue(Seq(col("x"), col("y")),
          Seq(lit(0L), lit(0L)), Seq(lit(1000L), lit(1000L)), bits = 8))
        .as[Long].collect().toSeq
      assert(corners === Seq(0L, (1L << 16) - 1))
    }
  }

  test("line dedup: kept-line conservation and idempotence on random corpora") {
    import graft.operators.Dedup
    val line = Gen.oneOf("aa bb", "cc dd", "ee ff", "gg hh", "ii jj", "kk ll")
    val doc = Gen.chooseNum(1, 5).flatMap(k => Gen.listOfN(k, line)).map(_.mkString("\n"))
    forSamples(Gen.listOfN(6, doc), n = 5) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = Dedup.dropDuplicateLines(df, "doc_id", split(col("text"), "\n"),
        minOccurrences = 2, sep = "\n")
      val kept = once.as[(Long, Long, String)].collect().sortBy(_._1).toSeq
      // conservation: kept lines == lines whose content occurs exactly once
      val allLines = docs.flatMap(_.split("\n"))
      val singletonCount = allLines.groupBy(identity).count(_._2.length == 1)
      assert(kept.map(_._2).sum === singletonCount.toLong)
      // exhaustive over ids
      assert(kept.map(_._1) === docs.indices.map(_.toLong))
      // idempotence: surviving lines are globally unique, a second pass is a no-op
      val again = Dedup.dropDuplicateLines(once, "doc_id", split(col("text"), "\n"),
        minOccurrences = 2, sep = "\n")
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
      // (docs emptied by pass 1 split to [""]; two such docs make "" a dup
      // line again, so the claim covers the non-empty survivors)
      val againMap = again.map(k => (k._1, k._3)).toMap
      kept.filter(_._3.nonEmpty).foreach { case (id, _, text) =>
        assert(againMap(id) === text)
      }
    }
  }

  test("heavy hitters equal exact groupBy+HAVING on random skewed multisets") {
    import graft.operators.FreqSketch
    val gen = Gen.listOfN(400, Gen.frequency(
      (8, Gen.oneOf("hot1", "hot2")),        // heavy mass
      (3, Gen.oneOf("warm1", "warm2", "warm3")),
      (5, Gen.chooseNum(0, 200).map(i => s"cold$i"))))
    forSamples(gen, n = 5) { items =>
      val df = spark.createDataset(items).repartition(7).toDF("item")
      val k = 12
      val exact = df.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
        .where(col("cnt") > lit(items.size.toDouble / k))
        .orderBy(col("cnt").desc, col("item"))
        .as[(String, Long)].collect().toSeq
      val got = FreqSketch.heavyHitters(df, "item", k).as[(String, Long)].collect().toSeq
      assert(got === exact)
    }
  }

  test("winnowing selects a subset of k-gram hashes; shared long runs always overlap") {
    import graft.functions.TextFunctions
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val gen = Gen.zip(Gen.listOfN(20, word), Gen.listOfN(20, word), Gen.listOfN(8, word))
    forSamples(gen, n = 8) { case (pre, post, shared) =>
      // shared is 8 tokens = w + k - 1 for (k=5, w=4) → guaranteed overlap
      val a = (pre ++ shared).mkString(" ")
      val b = (shared ++ post).mkString(" ")
      val rows = Seq(a, b).toDF("text").select(
        TextFunctions.rollingKgramHashes(col("text"), 5).as("kg"),
        TextFunctions.winnowedFingerprints(
          TextFunctions.rollingKgramHashes(col("text"), 5), 4).as("fp"))
        .as[(Seq[Long], Seq[Long])].collect()
      rows.foreach { case (kg, fp) =>
        assert(fp.toSet.subsetOf(kg.toSet))                  // selection, never invention
        assert(fp.nonEmpty && fp.size <= kg.size)
      }
      assert(rows(0)._2.toSet.intersect(rows(1)._2.toSet).nonEmpty)
    }
  }

  test("BMP codec round-trips dims and channel sum for arbitrary images") {
    import graft.multimodal.Containers
    val gen = for {
      w <- Gen.chooseNum(1, 13) // widths 1..13 sweep every 4-byte padding case
      h <- Gen.chooseNum(1, 9)
      seed <- Gen.chooseNum(0, 1000000)
    } yield (w, h, seed)
    forSamples(gen, n = 25) { case (w, h, seed) =>
      def px(x: Int, y: Int) =
        ((seed + x * 7 + y * 13) % 256, (seed * 3 + x + y * 5) % 256, (seed * 5 + x * 11 + y) % 256)
      val bmp = Containers.buildBmp24(w, h, px)
      val (pw, ph, sum) = Containers.parseBmp(bmp)
      assert((pw, ph) === (w, h))
      val expect = (for { y <- 0 until h; x <- 0 until w; v = px(x, y) }
        yield (v._1 + v._2 + v._3).toLong).sum
      assert(sum === expect, s"${w}x$h seed=$seed")
      // resize never exceeds the bound and stays parseable
      val resized = graft.multimodal.Multimodal.resizeBmp(bmp, 4)
      val (rw, rh, _) = Containers.parseBmp(resized)
      assert(math.max(rw, rh) <= math.max(4, math.max(w, h).min(4)))
    }
  }

  test("WAV codec round-trips arbitrary sample runs incl. extremes") {
    import graft.multimodal.Containers
    val gen = Gen.listOfN(40, Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt))
    forSamples(gen, n = 25) { xs =>
      val samples = (Short.MinValue.toInt +: Short.MaxValue.toInt +: xs).map(_.toShort).toArray
      val wav = Containers.buildWavPcm16(22050, samples)
      val (rate, n, sum) = Containers.parseWav(wav)
      assert(rate === 22050 && n === samples.length.toLong)
      assert(sum === samples.map(_.toLong).sum)
    }
  }

  test("PPM codec round-trips arbitrary frames") {
    import graft.multimodal.Containers
    val gen = Gen.zip(Gen.chooseNum(1, 11), Gen.chooseNum(1, 7), Gen.chooseNum(0, 999))
    forSamples(gen, n = 25) { case (w, h, seed) =>
      def px(x: Int, y: Int) = ((seed + x) % 256, (seed + y) % 256, (x + y) % 256)
      val ppm = Containers.buildPpmP6(w, h, px)
      val (pw, ph, sum) = Containers.parsePpm(ppm)
      assert((pw, ph) === (w, h))
      val expect = (for { y <- 0 until h; x <- 0 until w; v = px(x, y) }
        yield (v._1 + v._2 + v._3).toLong).sum
      assert(sum === expect)
    }
  }

  test("roaring portable serialization round-trips arbitrary position sets") {
    import graft.sources.RoaringBitmapArray
    // spans array containers, bitmap containers (dense low range), and
    // multiple 32-bit buckets (values past 2^32)
    val positions = Gen.oneOf(
      Gen.listOf(Gen.chooseNum(0L, 1L << 40)),
      Gen.listOfN(5000, Gen.chooseNum(0L, 8192L)),          // dense → bitmap
      Gen.listOfN(100, Gen.chooseNum((1L << 33) - 50, (1L << 33) + 50)))
    forSamples(positions) { vs =>
      val sorted = vs.distinct.sorted.toArray
      val back = RoaringBitmapArray.deserialize(RoaringBitmapArray.serialize(sorted))
      assert(back.toSeq === sorted.toSeq)
    }
  }

  test("Z85 round-trips arbitrary byte arrays at every length mod 4") {
    import graft.sources.Z85
    forSamples(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)), n = 20) { bs =>
      val arr = bs.toArray
      assert(Z85.decode(Z85.encode(arr), arr.length).toSeq === arr.toSeq)
    }
  }

  test("DV blob round-trips and survives the file layout for random sets") {
    import graft.sources.DeletionVectors
    forSamples(Gen.listOfN(200, Gen.chooseNum(0L, 1L << 35)), n = 5) { vs =>
      val sorted = vs.distinct.sorted.toArray
      val blob = DeletionVectors.toBlob(sorted)
      assert(DeletionVectors.fromBlob(blob).toSeq === sorted.toSeq)
      val f = java.nio.file.Files.createTempDirectory("graft_dv_prop")
        .resolve("deletion_vector_p.bin")
      val off = DeletionVectors.appendToFile(f, blob)
      assert(DeletionVectors.fromBlob(
        DeletionVectors.readFromFile(f, off, blob.length)).toSeq === sorted.toSeq)
    }
  }

  test("Lake.sql UPDATE round-trips keyword-laden literals: the scanner never mis-splits") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prop_dml").toString + "/tbl"
    graft.sources.DeltaWrite.append(spark,
      (1L to 12L).map(i => (i, "init")).toDF("id", "note"), dir)
    // literals built from the scanner's own keywords + unbalanced parens —
    // exactly the inputs a bare-keyword regex split mangles
    val tokens = Gen.oneOf("WHERE", "SET", "ON", "SELECT", "FROM", "VALUES",
      "(", ")", ",", "AND", "zz")
    val litGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, tokens))
      .map(_.mkString(" "))
    var id = 0L
    forSamples(litGen, n = 10) { lit =>
      id += 1
      graft.sources.Lake.sql(spark, s"UPDATE '$dir' SET note = '$lit' WHERE id = $id")
      val got = graft.sources.Lake.read(spark, dir).where(col("id") === id)
        .select("note").as[String].head()
      assert(got === lit, s"literal mangled: '$lit' -> '$got'")
      // only the targeted row changed
      assert(graft.sources.Lake.read(spark, dir)
        .where(col("id") =!= id && col("note") =!= "init").count() === id - 1)
    }
  }

  test("BPE encoding is lossless and token count never exceeds char count") {
    import graft.functions.Bpe
    val texts = Gen.listOf(Gen.oneOf("a", "b", "c", "ab", " ")).map(_.mkString)
    val ranks = Map(("a", "b") -> 0, ("ab", "c") -> 1, ("b", "c") -> 2)
    forSamples(texts, n = 20) { t =>
      val tokens = Bpe.encodeText(t, ranks)
      assert(tokens.mkString === t)
      assert(tokens.length <= t.length)
    }
  }
}
