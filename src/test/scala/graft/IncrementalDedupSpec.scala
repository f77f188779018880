package graft

import graft.queries.IncrementalDedup
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {

  test("persisted gram index: load == inline; probe reads the artifact") {
    // r11 (VERDICT r10 missing #1): the incremental near-dup must probe
    // a publish-once postings index, never recompute the base corpus.
    // Claims, each observable (the PqSpec C110 pattern):
    //  1. with the index published, the query returns exactly the
    //     inline-built result (bit-identical rows);
    //  2. both index tables are manifest-carrying generations;
    //  3. query time READS the artifact: planting an index with one
    //     base doc removed deletes exactly that doc's pairs — impossible
    //     if the query rebuilt the index from the corpus;
    //  4. a torn generation (manifest stripped) fails loudly.
    val inline = q("q_dedup_incremental_near").collect().toSeq
    assert(inline.nonEmpty, "fixture must produce incremental pairs")
    // the fixture has both pair classes — batch x base and batch x batch
    def isBatch(id: Long) = id % 10 == 0
    assert(inline.exists(r => isBatch(r.getLong(0)) != isBatch(r.getLong(1))),
      "need a batch x base pair")
    assert(inline.exists(r => isBatch(r.getLong(0)) && isBatch(r.getLong(1))),
      "need a batch x batch pair")

    val dir = java.nio.file.Files.createTempDirectory("graft-gramidx")
    try {
      spark.conf.set(IncrementalDedup.IndexDirConf, dir.toString)
      val first = q("q_dedup_incremental_near").collect().toSeq
      assert(first == inline, "publish-first invocation changed results")
      for (t <- Seq("ngram_docs", "ngram_postings"))
        assert(java.nio.file.Files.exists(
          dir.resolve(t).resolve("gen_base").resolve("_graft_manifest.json")),
          s"$t/gen_base must be a manifest-carrying generation")
      // second invocation loads (no rebuild) and is identical
      assert(q("q_dedup_incremental_near").collect().toSeq == inline)

      // 3: plant an index missing one base doc that has a pair — its
      // pairs must vanish from the output
      val crossPair = inline.find(r =>
        isBatch(r.getLong(0)) != isBatch(r.getLong(1))).get
      val victim =
        if (isBatch(crossPair.getLong(0))) crossPair.getLong(1)
        else crossPair.getLong(0)
      val (docs, postings) = IncrementalDedup.buildIndex(spark, sf)
      val dir2 = java.nio.file.Files.createTempDirectory("graft-gramidx2")
      try {
        graft.engine.Snapshot.publishAtomic(spark,
          docs.where(col("doc_id") =!= victim), s"$dir2/ngram_docs/gen_base")
        graft.engine.Snapshot.publishAtomic(spark,
          postings.where(col("doc_id") =!= victim),
          s"$dir2/ngram_postings/gen_base")
        spark.conf.set(IncrementalDedup.IndexDirConf, dir2.toString)
        val planted = q("q_dedup_incremental_near").collect().toSeq
        assert(planted.forall(r =>
          r.getLong(0) != victim && r.getLong(1) != victim),
          s"doc $victim was removed from the index but still pairs — " +
            "the query rebuilt from the corpus instead of reading")
        assert(planted ==
          inline.filterNot(r =>
            r.getLong(0) == victim || r.getLong(1) == victim),
          "only the victim's pairs may differ")
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(dir2.toFile)
      }

      // 4: torn generation — manifest stripped — must fail loudly
      val dir3 = java.nio.file.Files.createTempDirectory("graft-gramidx3")
      try {
        graft.engine.Snapshot.publishAtomic(spark, docs,
          s"$dir3/ngram_docs/gen_base")
        graft.engine.Snapshot.publishAtomic(spark, postings,
          s"$dir3/ngram_postings/gen_base")
        java.nio.file.Files.delete(java.nio.file.Paths.get(
          s"$dir3/ngram_docs/gen_base/_graft_manifest.json"))
        spark.conf.set(IncrementalDedup.IndexDirConf, dir3.toString)
        val e = intercept[IllegalArgumentException] {
          q("q_dedup_incremental_near").collect()
        }
        assert(e.getMessage.contains("manifest"))
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(dir3.toFile)
      }
    } finally {
      spark.conf.unset(IncrementalDedup.IndexDirConf)
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("advanceIndex folds a batch as a delta generation, exactly once") {
    // the daily maintenance step: probe today, fold tonight — the fold
    // publishes ONLY the batch's rows (a new gen_<label> dir), and the
    // reader unions generations, so tomorrow's index covers base+today
    // without rewriting yesterday's postings
    val dir = java.nio.file.Files.createTempDirectory("graft-gramidx-adv")
    try {
      spark.conf.set(IncrementalDedup.IndexDirConf, dir.toString)
      // first use publishes gen_base (base corpus only)
      q("q_dedup_incremental_near").collect()
      // today's batch gram view — same shape buildIndex emits
      val batch = engine.Tables.documents(spark, sf)
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          graft.functions.GramHashes(spark, col("text"), 5).as("bg"))
        .where(size(col("bg")) > 0)
        .select(col("doc_id"), size(col("bg")).cast("long").as("n"), col("bg"))
      IncrementalDedup.advanceIndex(spark, dir.toString, "day1", batch)
      // the same label folds exactly once (retry-safe no-op)
      IncrementalDedup.advanceIndex(spark, dir.toString, "day1", batch)
      assert(java.nio.file.Files.exists(
        dir.resolve("ngram_docs").resolve("gen_day1")
          .resolve("_graft_manifest.json")))
      // the unioned index now equals a from-scratch index over the
      // WHOLE corpus: every doc exactly once
      val (idxDocs, idxPost) = IncrementalDedup.indexFor(spark, sf)
      val expectDocs = engine.Tables.documents(spark, sf)
        .select(col("doc_id"),
          graft.functions.GramHashes(spark, col("text"), 5).as("bg"))
        .where(size(col("bg")) > 0)
      assert(idxDocs.count() == expectDocs.count(), "every doc exactly once")
      assert(idxDocs.select("doc_id").distinct().count() == idxDocs.count(),
        "no doc folded twice")
      assert(idxPost.count() ==
        expectDocs.select(explode(col("bg"))).count())
      // reserved/unsafe labels refuse loudly
      intercept[IllegalArgumentException] {
        IncrementalDedup.advanceIndex(spark, dir.toString, "base", batch)
      }
      intercept[IllegalArgumentException] {
        IncrementalDedup.advanceIndex(spark, dir.toString, "../evil", batch)
      }
    } finally {
      spark.conf.unset(IncrementalDedup.IndexDirConf)
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("compaction folds live generations without changing any reader result") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gramidx-cmp")
    try {
      spark.conf.set(IncrementalDedup.IndexDirConf, dir.toString)
      val baseline = q("q_dedup_incremental_near").collect().toSeq // gen_base
      // two delta folds: half of the batch docs each, disjoint
      val batch = engine.Tables.documents(spark, sf)
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          graft.functions.GramHashes(spark, col("text"), 5).as("bg"))
        .where(size(col("bg")) > 0)
        .select(col("doc_id"), size(col("bg")).cast("long").as("n"), col("bg"))
      IncrementalDedup.advanceIndex(spark, dir.toString, "day1",
        batch.where(col("doc_id") % 20 === 0))
      IncrementalDedup.advanceIndex(spark, dir.toString, "day2",
        batch.where(col("doc_id") % 20 =!= 0))
      val (d3, p3) = IncrementalDedup.indexFor(spark, sf)
      val (docsBefore, postsBefore) = (d3.count(), p3.count())
      val advanced = q("q_dedup_incremental_near").collect().toSeq

      IncrementalDedup.compactIndex(spark, dir.toString)
      // one live compacted gen replaces the three inputs; dirs remain
      // until pruned, and the reader subtracts them
      val (d4, p4) = IncrementalDedup.indexFor(spark, sf)
      assert(d4.count() == docsBefore && p4.count() == postsBefore,
        "compaction changed index content")
      assert(q("q_dedup_incremental_near").collect().toSeq == advanced,
        "compaction changed query results")
      // compaction is retry-safe: same live set → publish-once no-op
      IncrementalDedup.compactIndex(spark, dir.toString)
      assert(IncrementalDedup.indexFor(spark, sf)._1.count() == docsBefore)

      // prune deletes the superseded dirs; results still identical
      IncrementalDedup.pruneIndex(spark, dir.toString)
      assert(!java.nio.file.Files.exists(
        dir.resolve("ngram_docs").resolve("gen_base")),
        "prune must delete superseded generations")
      assert(q("q_dedup_incremental_near").collect().toSeq == advanced,
        "prune changed query results")
      // folding the PROBED batch into the index must not change the
      // probe at all: the query treats the batch as authoritative for
      // its doc_ids and excludes their index copies — without that, a
      // post-fold run double-joins every batch doc and emits
      // duplicated pair rows (r11 review finding)
      assert(advanced == baseline,
        "post-fold probe diverged from pre-fold (duplicate join paths?)")
      val ids = advanced.map(r => (r.getLong(0), r.getLong(1)))
      assert(ids.distinct.size == ids.size, "duplicated pair rows")
    } finally {
      spark.conf.unset(IncrementalDedup.IndexDirConf)
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("a crash between the fold's two publishes leaves NO torn state: " +
      "readers see neither table's generation or both, never one") {
    // r11 verdict wrong #1: advanceIndex publishes ngram_docs and
    // ngram_postings as two separate atomic renames. A crash between
    // them used to leave the docs generation VISIBLE with no matching
    // postings — a probe in that window silently missed pairs
    // (candidates come from postings). The fix: a generation is
    // invisible until the per-label commit marker (written only after
    // BOTH publishes) exists. This test simulates the crash by doing
    // exactly what a torn advanceIndex left behind: the first publish
    // without the second, no marker.
    val dir = java.nio.file.Files.createTempDirectory("graft-gramidx-tear")
    try {
      spark.conf.set(IncrementalDedup.IndexDirConf, dir.toString)
      val baseline = q("q_dedup_incremental_near").collect().toSeq // base
      val (docsRoot, postRoot) =
        (s"$dir/ngram_docs", s"$dir/ngram_postings")
      val (baseDocs, basePosts) = (
        IncrementalDedup.liveGens(spark, docsRoot).size,
        IncrementalDedup.liveGens(spark, postRoot).size)
      assert(baseDocs == 1 && basePosts == 1)
      val (d0, p0) = IncrementalDedup.indexFor(spark, sf)
      val (docsCount0, postsCount0) = (d0.count(), p0.count())

      val batch = engine.Tables.documents(spark, sf)
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          graft.functions.GramHashes(spark, col("text"), 5).as("bg"))
        .where(size(col("bg")) > 0)
        .select(col("doc_id"), size(col("bg")).cast("long").as("n"), col("bg"))

      // CRASH SIMULATION: the fold's first rename landed, the second
      // (and the marker) never ran
      graft.engine.Snapshot.publishAtomic(spark, batch,
        s"$docsRoot/gen_day1")
      assert(java.nio.file.Files.exists(
        dir.resolve("ngram_docs").resolve("gen_day1")),
        "precondition: the torn directory is physically present")

      // the torn generation must be INVISIBLE to every reader path —
      // not "docs grew, postings didn't"
      assert(IncrementalDedup.liveGens(spark, docsRoot).size == baseDocs,
        "torn docs generation leaked into the live listing")
      val (d1, p1) = IncrementalDedup.indexFor(spark, sf)
      assert(d1.count() == docsCount0 && p1.count() == postsCount0,
        "torn fold changed what indexFor serves")
      assert(q("q_dedup_incremental_near").collect().toSeq == baseline,
        "torn fold changed probe results")

      // the label's RETRY self-heals: the docs publish no-ops on the
      // surviving directory, the postings publish lands, the marker
      // commits — now BOTH are visible, atomically grown
      IncrementalDedup.advanceIndex(spark, dir.toString, "day1", batch)
      assert(java.nio.file.Files.exists(
        dir.resolve("_commits").resolve("day1")),
        "retry must commit the label")
      assert(
        IncrementalDedup.liveGens(spark, docsRoot).size == baseDocs + 1 &&
          IncrementalDedup.liveGens(spark, postRoot).size == basePosts + 1,
        "committed fold must be visible in BOTH tables")
      val (d2, p2) = IncrementalDedup.indexFor(spark, sf)
      assert(d2.count() == docsCount0 + batch.count(),
        "docs generation content must be the batch's rows")
      assert(p2.count() ==
        postsCount0 + batch.select(explode(col("bg"))).count(),
        "postings generation content must be the batch's exploded grams")
      // post-fold probe is pinned unchanged by the compaction test's
      // batch-authority rule; re-assert here for the committed state
      assert(q("q_dedup_incremental_near").collect().toSeq == baseline)
    } finally {
      spark.conf.unset(IncrementalDedup.IndexDirConf)
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("legacy pre-marker layouts grandfather: folded generations stay " +
      "visible, torn legacy halves stay invisible") {
    // ADVICE r14 medium: committed-only listing with no grandfathering
    // silently dropped every pre-marker day-generation (liveGens came
    // back empty → rebuild branch committed only 'base'). An unmarked
    // generation whose manifest is present in BOTH tables encodes the
    // same neither-or-both fact the marker would have asserted, so it
    // is stamped committed on sight; an unmarked single-table half is
    // a genuine legacy tear and stays invisible.
    val dir = java.nio.file.Files.createTempDirectory("graft-gramidx-leg")
    try {
      spark.conf.set(IncrementalDedup.IndexDirConf, dir.toString)
      q("q_dedup_incremental_near").collect() // publishes gen_base
      val batch = engine.Tables.documents(spark, sf)
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          graft.functions.GramHashes(spark, col("text"), 5).as("bg"))
        .where(size(col("bg")) > 0)
        .select(col("doc_id"), size(col("bg")).cast("long").as("n"), col("bg"))
      IncrementalDedup.advanceIndex(spark, dir.toString, "day1", batch)
      val (d0, p0) = IncrementalDedup.indexFor(spark, sf)
      val (docs0, posts0) = (d0.count(), p0.count())

      // make the layout "legacy": wipe the marker directory wholesale
      org.apache.commons.io.FileUtils.deleteDirectory(
        dir.resolve("_commits").toFile)
      assert(!java.nio.file.Files.exists(dir.resolve("_commits")))

      // every complete generation — base AND the folded day1 — must
      // still be served, not just a re-committed base
      val (d1, p1) = IncrementalDedup.indexFor(spark, sf)
      assert(d1.count() == docs0 && p1.count() == posts0,
        "grandfathering must restore ALL complete generations, " +
          "not only gen_base")
      // and the markers are re-stamped so the healed state is durable
      assert(java.nio.file.Files.exists(dir.resolve("_commits")
        .resolve("day1")), "grandfathering must re-stamp the marker")

      // a legacy TEAR (docs half only, no marker) must stay invisible
      graft.engine.Snapshot.publishAtomic(spark,
        batch.limit(3), s"$dir/ngram_docs/gen_legacytear")
      org.apache.commons.io.FileUtils.deleteQuietly(
        dir.resolve("_commits").resolve("legacytear").toFile)
      val (d2, _) = IncrementalDedup.indexFor(spark, sf)
      assert(d2.count() == docs0,
        "a single-table legacy half must NOT grandfather")
    } finally {
      spark.conf.unset(IncrementalDedup.IndexDirConf)
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("prune removes spent commit markers; a pruned label refuses reuse") {
    // ADVICE r14 low: markers outliving their generation dirs
    // accumulate unboundedly AND make a reused label visible from its
    // first per-table rename — re-opening the torn window. pruneIndex
    // now deletes a marker once BOTH tables' dirs are gone, and
    // advanceIndex rejects a label whose marker exists without dirs.
    val dir = java.nio.file.Files.createTempDirectory("graft-gramidx-prn")
    try {
      spark.conf.set(IncrementalDedup.IndexDirConf, dir.toString)
      q("q_dedup_incremental_near").collect()
      val batch = engine.Tables.documents(spark, sf)
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          graft.functions.GramHashes(spark, col("text"), 5).as("bg"))
        .where(size(col("bg")) > 0)
        .select(col("doc_id"), size(col("bg")).cast("long").as("n"), col("bg"))
      IncrementalDedup.advanceIndex(spark, dir.toString, "day1", batch)
      IncrementalDedup.compactIndex(spark, dir.toString)
      IncrementalDedup.pruneIndex(spark, dir.toString)
      // base and day1 dirs are pruned; their markers must be gone too
      for (l <- Seq("base", "day1"))
        assert(!java.nio.file.Files.exists(dir.resolve("_commits")
          .resolve(l)), s"spent marker '$l' must be deleted by prune")
      // the live compacted gen keeps its marker
      val live = IncrementalDedup.liveGens(spark, s"$dir/ngram_docs")
      assert(live.size == 1 && live.head.contains("zcompact-"))

      // reuse guard: a marker without dirs (partial-prune shape) must
      // refuse the fold instead of publishing a torn mix
      java.nio.file.Files.createDirectories(dir.resolve("_commits"))
      java.nio.file.Files.createFile(dir.resolve("_commits")
        .resolve("spent"))
      val e = intercept[IllegalStateException] {
        IncrementalDedup.advanceIndex(spark, dir.toString, "spent", batch)
      }
      assert(e.getMessage.contains("pruned"))
      // and the refused fold published NOTHING
      assert(!java.nio.file.Files.exists(
        dir.resolve("ngram_docs").resolve("gen_spent")))
    } finally {
      spark.conf.unset(IncrementalDedup.IndexDirConf)
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("auto-compaction: a fold crossing the threshold compacts exactly " +
      "once, including under retry") {
    // VERDICT r13 next #6: the r13 curve shows first-pass planning cost
    // growing with generation count; the policy trigger was manual.
    // Conf-gated: advanceIndex compacts when the live-gen count reaches
    // the threshold; the digest-named publish-once target plus the
    // post-compact count of 1 make retries no-ops.
    val dir = java.nio.file.Files.createTempDirectory("graft-gramidx-ac")
    try {
      spark.conf.set(IncrementalDedup.IndexDirConf, dir.toString)
      spark.conf.set(IncrementalDedup.AutoCompactConf, "3")
      val baseline = q("q_dedup_incremental_near").collect().toSeq
      val batch = engine.Tables.documents(spark, sf)
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          graft.functions.GramHashes(spark, col("text"), 5).as("bg"))
        .where(size(col("bg")) > 0)
        .select(col("doc_id"), size(col("bg")).cast("long").as("n"), col("bg"))
      IncrementalDedup.advanceIndex(spark, dir.toString, "day1",
        batch.where(col("doc_id") % 20 === 0)) // 2 gens < 3: no compact
      assert(IncrementalDedup.liveGens(spark, s"$dir/ngram_docs").size == 2,
        "below threshold must not compact")
      IncrementalDedup.advanceIndex(spark, dir.toString, "day2",
        batch.where(col("doc_id") % 20 =!= 0)) // 3 gens = threshold
      val live = IncrementalDedup.liveGens(spark, s"$dir/ngram_docs")
      assert(live.size == 1 && live.head.contains("zcompact-"),
        "crossing the threshold must compact to one live generation")
      def zcompactDirs() =
        dir.resolve("ngram_docs").toFile.list()
          .count(_.startsWith("gen_zcompact-"))
      assert(zcompactDirs() == 1)
      // retry of the same fold: publishes no-op, no second compaction
      IncrementalDedup.advanceIndex(spark, dir.toString, "day2",
        batch.where(col("doc_id") % 20 =!= 0))
      assert(zcompactDirs() == 1, "retry must not re-compact")
      assert(IncrementalDedup.liveGens(spark, s"$dir/ngram_docs").size == 1)
      // the probe result is unchanged through the whole lifecycle
      assert(q("q_dedup_incremental_near").collect().toSeq == baseline)
    } finally {
      spark.conf.unset(IncrementalDedup.IndexDirConf)
      spark.conf.unset(IncrementalDedup.AutoCompactConf)
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("bucketed postings co-locate the candidate join: bit-identical results, " +
      "zero-exchange index side under the no-broadcast regime") {
    // SCALE.md r11 claimed "a cluster deployment buckets the postings
    // by g so the candidate join co-locates without re-sharding the
    // index"; this proves it locally (r11 verdict task #5). The
    // regime that matters is a batch too big to broadcast (the 100 TB
    // default): broadcast thresholds off, key semi-filter off — the
    // plain probe then shuffles the corpus-scale postings on g, while
    // the bucketed copy's scan already satisfies the join's
    // distribution and only the batch side exchanges.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case other => other.children
    }
    def collectAll[T](p: SparkPlan)(f: PartialFunction[SparkPlan, T]): Seq[T] =
      (if (f.isDefinedAt(p)) Seq(f(p)) else Nil) ++
        unwrap(p).flatMap(collectAll(_)(f))
    def withConf[A](kvs: (String, String)*)(body: => A): A = {
      val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-gramidx-bkt")
    val bktRoot = java.nio.file.Files.createTempDirectory("graft-bkt-post")
    try {
      withConf(
        IncrementalDedup.IndexDirConf -> dir.toString,
        graft.engine.Bucketed.DirConf -> bktRoot.toString) {
        val plain = q("q_dedup_incremental_near").collect().toSeq
        val bucketed = withConf(
          IncrementalDedup.BucketPostingsConf -> "true") {
          q("q_dedup_incremental_near").collect().toSeq
        }
        assert(bucketed == plain,
          "bucketed-postings probe diverged from the plain probe")
        // plan pin under the no-broadcast regime
        withConf(
          IncrementalDedup.BucketPostingsConf -> "true",
          IncrementalDedup.ProbeKeyBroadcastConf -> "false",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
          val df = q("q_dedup_incremental_near")
          df.collect()
          val plan = df.queryExecution.executedPlan
          val joins = collectAll(plan) {
            case j: SortMergeJoinExec => (j: SparkPlan)
            case j: ShuffledHashJoinExec => (j: SparkPlan)
          }
          // the candidate join whose one side reads the bucketed copy
          // DIRECTLY (higher joins contain the bucketed scan
          // transitively, along with the probe's own exchanges — only
          // the lowest join is the co-location claim)
          val idxJoins = joins.filter(j => unwrap(j).exists(side =>
            collectAll(side) { case f: FileSourceScanExec => f }
              .exists(_.bucketedScan) &&
              collectAll(side) {
                case x: SortMergeJoinExec => (x: SparkPlan)
                case x: ShuffledHashJoinExec => (x: SparkPlan)
              }.isEmpty))
          assert(idxJoins.nonEmpty,
            s"no shuffle-family join reads the bucketed postings:\n$plan")
          idxJoins.foreach { j =>
            val sides = unwrap(j)
            val (idxSide, batchSide) = sides.partition(side =>
              collectAll(side) { case f: FileSourceScanExec => f }
                .exists(_.bucketedScan))
            assert(idxSide.forall(side =>
              collectAll(side) { case e: ShuffleExchangeExec => e }.isEmpty),
              s"index side of the candidate join still shuffles:\n$j")
            assert(batchSide.exists(side =>
              collectAll(side) { case e: ShuffleExchangeExec => e }.nonEmpty),
              s"expected the batch side to exchange to the bucket count:\n$j")
          }
        }
      }
    } finally {
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_bkt_"))
        .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
      org.apache.commons.io.FileUtils.deleteDirectory(bktRoot.toFile)
    }
  }

  test("a recorded index input mutated in place fails loudly, never serves stale") {
    // r12 verdict wrong #2, applied with this artifact's lifecycle: the
    // gram index is MAINTAINED (advanceIndex folds batches), so source
    // changes are expected as NEW files — but a recorded input mutated
    // in place means already-indexed grams no longer describe the
    // corpus. That must be an error, not a silent stale serve (and not
    // an auto-rebuild, which would discard folded generations).
    val srcRoot = java.nio.file.Files.createTempDirectory("graft-docsrc")
    val dir = java.nio.file.Files.createTempDirectory("graft-gramidx-src")
    try {
      // the sf0.001 fixture table is a single parquet file
      org.apache.commons.io.FileUtils.copyFile(
        new java.io.File(s"$sf/documents.parquet"),
        new java.io.File(s"$srcRoot/documents.parquet"))
      spark.conf.set(IncrementalDedup.IndexDirConf, dir.toString)
      // first use publishes base and records the source inputs
      IncrementalDedup.indexFor(spark, srcRoot.toString)._1.count()
      assert(java.nio.file.Files.exists(dir.resolve("_source.json")),
        "base publish must record its source inputs")
      // untouched source: loads fine
      IncrementalDedup.indexFor(spark, srcRoot.toString)._1.count()
      // mutate the recorded input IN PLACE (append a byte: same path,
      // new length/mtime)
      val part = srcRoot.resolve("documents.parquet")
      java.nio.file.Files.write(part, Array[Byte](0),
        java.nio.file.StandardOpenOption.APPEND)
      val e = intercept[IllegalStateException] {
        IncrementalDedup.indexFor(spark, srcRoot.toString)
      }
      assert(e.getMessage.contains("mutated in place"), e.getMessage)
      // deleting a recorded input is the same staleness class
      java.nio.file.Files.delete(part)
      val e2 = intercept[IllegalStateException] {
        IncrementalDedup.indexFor(spark, srcRoot.toString)
      }
      assert(e2.getMessage.contains("deleted"), e2.getMessage)
    } finally {
      spark.conf.unset(IncrementalDedup.IndexDirConf)
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
      org.apache.commons.io.FileUtils.deleteDirectory(srcRoot.toFile)
    }
  }

  test("batch prefix probe is exact: pairs match a brute-force batch check") {
    // independent truth: brute-force jaccard over (batch x all) pairs
    // via the same gram kernel, no prefix filter, no index machinery
    val grams = engine.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.GramHashes(spark, col("text"), 5).as("bg"))
      .where(size(col("bg")) > 0)
    val a = grams.select(col("doc_id").as("a_id"), col("bg").as("a_bg"))
    val b = grams.select(col("doc_id").as("b_id"), col("bg").as("b_bg"))
    val brute = a.crossJoin(b)
      .where(col("a_id") < col("b_id") &&
        (col("a_id") % 10 === 0 || col("b_id") % 10 === 0))
      .select(col("a_id"), col("b_id"),
        graft.functions.SortedIntersectCount(
          spark, col("a_bg"), col("b_bg")).as("c"),
        size(col("a_bg")).cast("long").as("na"),
        size(col("b_bg")).cast("long").as("nb"))
      .withColumn("j",
        col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .where(col("j") >= 0.8)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = q("q_dedup_incremental_near")
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
  }
}
