package graft.operators

import graft.functions.{TextFunctions => T, VectorFunctions => V}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators that return KEEP decisions (the row set after
  * dedup), not just signatures — the shape a training-data pipeline
  * consumes.
  *
  * Survivor rule: within a duplicate group/pair, the lowest id wins
  * ("min-id" greedy). It is deterministic and needs no iterative
  * connected-components pass — at 100 TB that one extra join beats a
  * multi-round graph algorithm, at the cost of occasionally dropping both
  * ends of a chain A~B~C (A kept, B dropped, C dropped even if C~A is not
  * a near-dup). Standard trade-off, documented here on purpose.
  */
object Dedup {

  /** Exact dedup: keep the lowest id per content hash. One groupBy on the
    * 32-byte digest + one broadcast-able semi-join back. */
  def exactKeep(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepIds = df
      .groupBy(md5(col(textCol)).as("__h"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(keepIds, Seq(idCol), "left_semi")
  }

  /** MinHash-LSH near-dup dedup: band signatures → candidate pairs from
    * shared buckets → exact Jaccard verify ≥ `threshold` → drop the higher
    * id of each verified pair. All-pairs work never happens: candidates
    * come from a hash join on band keys.
    *
    * Default (bands=8, bandSize=3): the LSH S-curve midpoint is
    * (1/b)^(1/r) = 0.5 — tuned to the dedup threshold. Small bands
    * (r=2) put the midpoint at 0.71 AND collapse under a small token
    * vocabulary: at sf0.1 a 2-hash bucket held 62% of the corpus
    * (quadratic candidate blow-up); 3-hash buckets break that up.
    * Kirsch–Mitzenmacher double hashing keeps this at ONE md5 per token
    * (oracle-replicable in DuckDB). */
  def minhashLshKeep(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 8, bandSize: Int = 3, threshold: Double = 0.5,
      denseBucketCap: Int = Int.MaxValue, denseWindow: Int = 16): DataFrame =
    lshKeep(df, idCol, textCol, bands, threshold,
      T.md5HashPairs(col("__toks")),
      b => T.dhBandKey(col("__hp"), b, bandSize),
      denseBucketCap, denseWindow)

  /** [[minhashLshKeep]] with the xxhash64 double-hashing family: same
    * banding/verify pipeline, no MD5 at all. The preferred production
    * path; the MD5 variant exists for oracle replication. */
  def fastMinhashLshKeep(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 8, bandSize: Int = 3, threshold: Double = 0.5,
      denseBucketCap: Int = Int.MaxValue, denseWindow: Int = 16): DataFrame =
    lshKeep(df, idCol, textCol, bands, threshold,
      T.xxHashPairs(col("__toks")),
      b => xxhash64((0 until bandSize).map(i =>
        T.dhMinhash(col("__hp"), b * bandSize + i)): _*),
      denseBucketCap, denseWindow)

  /** Candidate pairs from LSH band agreement: `sig` must carry `idCol`,
    * any `blockCols`, and band-key columns `__b0..__b{bands-1}`. Pairs
    * agree on (band, bucket) AND every block column; only ids (+ block
    * keys) travel through the join + distinct — payload columns never
    * shuffle; callers re-attach them to the (few) candidates. This is THE
    * candidate generator: every near-dup/similarity query routes through
    * it, so no quadratic coarse-key self-join exists anywhere. */
  def bandedCandidates(sig: DataFrame, idCol: String, bands: Int,
      blockCols: Seq[String] = Nil, broadcastLanes: Boolean = true): DataFrame = {
    val lanes = bandLanes(sig, idCol, bands, blockCols)
    val right = lanes.select(col(idCol).as("__b_id") +:
      blockCols.map(c => col(c).as(s"__r_$c")) :+
      col("__band").as("__band_b") :+ col("__bucket").as("__bucket_b"): _*)
    val cond = blockCols
      .map(c => col(c) === col(s"__r_$c"))
      .foldLeft(col("__band") === col("__band_b") &&
        col("__bucket") === col("__bucket_b") && col(idCol) < col("__b_id"))(_ && _)
    // A shuffle join keys on (band, bucket): one hot bucket = one straggler
    // task emitting the whole bucket's k²/2 pairs. Broadcasting the
    // (id, band, bucket)-only lane table instead spreads pair GENERATION
    // across the left side's partitions — hot buckets parallelize. At a
    // scale where lanes outgrow broadcast, disable and pre-split hot
    // buckets (SkewJoin.saltedJoin pattern) instead.
    val r = if (broadcastLanes) broadcast(right) else right
    // spread the probe side round-robin first: a small cached input often
    // sits in one partition, which would serialize all pair emission
    val probes = lanes.repartition(
      lanes.sparkSession.sessionState.conf.numShufflePartitions)
    probes.join(r, cond)
      .select(col(idCol).as("__a_id"), col("__b_id"))
      .distinct()
  }

  /** Bounded near-neighbor candidates: within each (band, bucket), order
    * members by id and pair each with its `window` id-successors — the
    * sorted-neighborhood blocking rule (Hernández & Stolfo) applied
    * inside LSH buckets. Candidate count is EXACTLY linear (≤ bands ×
    * window per doc) no matter how dense a bucket is, where
    * [[bandedCandidates]] is quadratic in bucket size — dup-heavy
    * corpora form clique buckets that would otherwise emit millions of
    * pairs. One window pass, no join at all; the cost is approximate
    * recall: a true pair is missed only if >window ids sit between the
    * two in EVERY band they co-bucket in. Output (__a_id, __b_id),
    * a < b, distinct. */
  def sortedNeighborCandidates(sig: DataFrame, idCol: String, bands: Int,
      window: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__band", "__bucket").orderBy(col(idCol))
    bandLanes(sig, idCol, bands)
      // window exprs and the generator need separate projections — fused
      // into one select, the planner rejects the filter over both
      .withColumn("__next",
        array((1 to window).map(i => lead(col(idCol), i).over(w)): _*))
      .select(col(idCol).as("__a_id"), explode(col("__next")).as("__b_id"))
      .where(col("__b_id").isNotNull)
      .distinct()
  }

  /** (id [, blockCols], band, bucket) lanes of a signature frame — ONE
    * posexplode pass over an inline array; a lane-per-band union would
    * scan the signature table `bands` times (bands × partitions tasks
    * per downstream stage). The single lanes projection every banded
    * path (batch, incremental, candidate generator) shares. */
  private def bandLanes(sig: DataFrame, idCol: String, bands: Int,
      blockCols: Seq[String] = Nil): DataFrame =
    sig.select(col(idCol) +: blockCols.map(col) :+
      posexplode(array((0 until bands).map(b => col(s"__b$b")): _*))
        .as(Seq("__band", "__bucket")): _*)

  /** Verified drop ids from candidate `pairs` (`__a_id`, `__b_id`): fetch
    * both sides' token sets, keep pairs with exact Jaccard ≥ `threshold`,
    * emit the losing `__b_id`s. The ONE Jaccard-verify rule of every
    * dedup path. Broadcast flags are per side and must be claimed only
    * for a GENUINELY BOUNDED frame (an incremental batch): a broadcast
    * hint on a full-corpus signature would pull whole-corpus token
    * arrays onto the driver. Unhinted sides join through AQE, which
    * broadcasts the (few) candidate pairs at runtime instead. */
  private def jaccardDrops(pairs: DataFrame, aSig: DataFrame, bSig: DataFrame,
      idCol: String, threshold: Double,
      broadcastA: Boolean, broadcastB: Boolean): DataFrame = {
    val inter = call_function("graft_intersect_size", col("__a_toks"), col("__b_toks"))
    val a = aSig.select(col(idCol).as("__a_id"), col("__toks").as("__a_toks"))
    val b = bSig.select(col(idCol).as("__b_id"), col("__toks").as("__b_toks"))
    pairs.join(if (broadcastA) broadcast(a) else a, "__a_id")
      .join(if (broadcastB) broadcast(b) else b, "__b_id")
      .where(inter.cast("double") /
        (size(col("__a_toks")) + size(col("__b_toks")) - inter) >= threshold)
      .select(col("__b_id").as(idCol)).distinct()
  }

  /** Persistable minhash dedup index over a corpus: (id, sorted distinct
    * tokens, band keys `__b0..`). This is the artifact an INCREMENTAL
    * pipeline keeps between crawls — at 100 TB you write it partitioned
    * (or bucketed) by band key so a new batch's probe reads only matched
    * buckets. After each batch, append the index rows of EVERY batch doc
    * (admitted or dropped): the survivor rule lets an already-dropped doc
    * veto later near-dups of itself, and indexing raw batches is exactly
    * what makes batched ingest reproduce the monolithic survivor set
    * (proven in IncrementalDedupSpec); a survivors-only index silently
    * diverges from it. */
  def minhashIndex(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 8, bandSize: Int = 3): DataFrame =
    minhashIndexWithCache(df, idCol, textCol, bands, bandSize)._1

  /** [[minhashIndex]] plus its internal cache handle, for scoped callers
    * that must release EVERY persisted frame they caused
    * ([[incrementalMinhashKeepBucketedScoped]]). */
  private[graft] def minhashIndexWithCache(df: DataFrame, idCol: String,
      textCol: String, bands: Int = 8, bandSize: Int = 3)
      : (DataFrame, DataFrame) = {
    val spread = df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
    // cache boundary before the 8-way band-key fan-out, as in lshKeep:
    // CollapseProject would otherwise re-inline tokenize+md5 into every
    // band key (8× the hash work). Production callers persist the index
    // to parquet anyway; this covers the build→probe-in-one-job path.
    val toks = spread.select(col(idCol),
        sort_array(T.distinctTokens(col(textCol))).as("__toks"))
      .withColumn("__hp", T.md5HashPairs(col("__toks")))
      .cache()
    (toks.select(col(idCol) +: col("__toks") +:
      (0 until bands).map(b =>
        T.dhBandKey(col("__hp"), b, bandSize).as(s"__b$b")): _*), toks)
  }

  /** Incremental near-dup dedup: admit the subset of `incoming` that is
    * neither a near-dup of any doc in `existingIndex` (a [[minhashIndex]]
    * over the already-ingested corpus) nor of a lower-id incoming doc.
    * The rule mirrors [[minhashLshKeep]] with every existing doc ranked
    * below (winning against) every incoming one — so ingesting a corpus
    * in batches converges to the same survivor set shape as one big
    * dedup, WITHOUT re-scanning history: per batch, history is touched
    * only through the (band, bucket)-keyed index probe, and the small
    * batch side is what broadcasts. */
  def incrementalMinhashKeep(existingIndex: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String, bands: Int = 8, bandSize: Int = 3,
      threshold: Double = 0.5,
      incomingIndex: Option[DataFrame] = None): DataFrame = {
    // callers that already indexed the batch (e.g. one index build sliced
    // into existing/incoming halves) pass it in and skip the re-hash; the
    // batch side is bounded, so pinning it is always cheap and saves the
    // ~5 rescans below (lanes ×2, candidate probe, verify fetch, union)
    val incSig = incomingIndex
      .getOrElse(minhashIndex(incoming, idCol, textCol, bands, bandSize))
      .cache()
    // history is NOT cached here: it may be arbitrarily large, and it is
    // scanned exactly twice (lanes probe + verify token fetch) — callers
    // with a hot index persist/cache it themselves
    val exSig = existingIndex

    // ONE band join covers BOTH candidate paths: the a-side unions the
    // history lanes (every existing doc outranks every incoming one, so
    // no id guard) with the batch's own lanes (min-id rule ⇒ a < b),
    // and probes the broadcast batch lanes once. Folding the paths
    // halves the candidate machinery — one join, one broadcast, one
    // distinct — and the history side stays a pure scan (never
    // broadcast, never shuffled by id): band keys prune its buckets.
    val incLanes = bandLanes(incSig, idCol, bands)
    val pairs = bandLanes(exSig, idCol, bands).withColumn("__new", lit(false))
      .unionByName(incLanes.withColumn("__new", lit(true)))
      .join(broadcast(incLanes
          .select(col(idCol).as("__b_id"), col("__band"), col("__bucket"))),
        Seq("__band", "__bucket"))
      .where(!col("__new") || col(idCol) < col("__b_id"))
      .select(col(idCol).as("__a_id"), col("__b_id"))
      .distinct()

    // ONE verify round over the combined candidate set: the a-side token
    // fetch unions history and batch signatures (ids must be globally
    // unique across the two, as any real ingest guarantees), so each side
    // is scanned once — half the join/distinct stages of verifying the
    // two candidate paths separately, with an identical drop set
    val allSig = exSig.select(col(idCol), col("__toks"))
      .unionByName(incSig.select(col(idCol), col("__toks")))
    val drops = jaccardDrops(pairs, allSig, incSig, idCol, threshold,
      broadcastA = false, broadcastB = true)

    incoming.join(drops, Seq(idCol), "left_anti")
  }

  /** Shared band→candidate→verify→survivor pipeline; the hash family is
    * the only degree of freedom.
    *
    * `denseBucketCap` is the DEGENERATE-DENSITY escape hatch: the exact
    * drop rule is inherently Ω(Σ bucket²) when buckets are huge (a tiny
    * token vocabulary collapses the whole corpus into a handful of band
    * keys — measured 93M pass-2 pairs on a 50k-doc template corpus with
    * 165 distinct buckets). Buckets at or under the cap keep the exact
    * survivor×bucket completion; buckets OVER it switch to
    * sorted-neighborhood pairing ordered by the doc's full SIGNATURE
    * string (near-dups share most minhashes, so they sort adjacent
    * regardless of id distance) — linear in bucket size, approximate
    * only inside oversized buckets. Default = no cap (bit-exact rule
    * everywhere); at 100 TB set a cap (e.g. 4096) unless the corpus
    * vocabulary is known to keep buckets sparse. */
  private def lshKeep(df: DataFrame, idCol: String, textCol: String,
      bands: Int, threshold: Double, hashPairs: Column,
      bandKeyFor: Int => Column,
      denseBucketCap: Int = Int.MaxValue, denseWindow: Int = 16): DataFrame = {
    // Tokenize + digest ONCE (the cache boundary stops CollapseProject
    // re-expanding the split/md5 into every derived hash), then band-key
    // ONCE and cache the signatures: the subtrees would otherwise
    // recompute for each band lane and each side of the self-join. The
    // harness clears per-query caches (spark.catalog.clearCache) after
    // each query; long-lived callers should do the same.
    // spread FIRST: a single-file input is one partition, which would
    // serialize all tokenize/digest work into one task (locally measured
    // 2.5s of the cache fill); one cheap row shuffle parallelizes it
    val spread = df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
    val toks = spread.select(col(idCol),
        sort_array(T.distinctTokens(col(textCol))).as("__toks"))
      .withColumn("__hp", hashPairs)
      .cache()
    val sig = toks.select(
      col(idCol) +: col("__toks") +:
        (0 until bands).map(b => bandKeyFor(b).as(s"__b$b")): _*)
      .cache()

    // Drop rule: b is dropped iff SOME a<b sharing a bucket verifies
    // J(a,b) ≥ threshold. Materializing every in-bucket pair is quadratic
    // in bucket size — a dense corpus (or one hot bucket) turns that into
    // tens of millions of pairs. Two EXACT passes avoid it:
    //   pass 1: verify each member only against its bucket MINIMUM —
    //           O(Σ bucket size) pairs; every drop is sound (min < b);
    //           on dup-heavy data this catches almost everything.
    //   pass 2: only pass-1 SURVIVORS pair against their full buckets —
    //           completes the rule exactly (any a<b, dropped or not, can
    //           still veto b); survivor count is small, so the pair count
    //           is Σ (survivors-per-bucket × bucket size), not quadratic.
    // both verify sides are the FULL-CORPUS signature: neither may claim
    // a broadcast hint (driver would hold every token array); AQE
    // broadcasts the small pairs frame at runtime instead
    def verifiedDrops(pairs: DataFrame): DataFrame =
      jaccardDrops(pairs, sig, sig, idCol, threshold,
        broadcastA = false, broadcastB = false)

    val lanes = bandLanes(sig, idCol, bands)

    val bucketMin = lanes.groupBy("__band", "__bucket")
      .agg(min(col(idCol)).as("__a_id"))
    val pass1Pairs = lanes
      .join(broadcast(bucketMin), Seq("__band", "__bucket"))
      .where(col(idCol) > col("__a_id"))
      .select(col("__a_id"), col(idCol).as("__b_id")).distinct()
    val drops1 = verifiedDrops(pass1Pairs).cache()

    // pass 2 joins by (band, bucket) WITHOUT broadcast: survivors pair
    // against their full buckets — exact completion of the drop rule —
    // but ONLY for buckets within denseBucketCap; oversized buckets take
    // the signature-sorted window path below
    lazy val sized = lanes.join(
      broadcast(lanes.groupBy("__band", "__bucket")
        .agg(count(lit(1)).as("__bsz"))),
      Seq("__band", "__bucket"))
    val sparseLanes =
      if (denseBucketCap == Int.MaxValue) lanes
      else sized.where(col("__bsz") <= denseBucketCap)
        .select(col(idCol), col("__band"), col("__bucket"))
    val survivorLanes = sparseLanes
      .join(broadcast(drops1), Seq(idCol), "left_anti")
      .select(col(idCol).as("__b_id"), col("__band"), col("__bucket"))
    val sparsePairs = sparseLanes
      .join(survivorLanes, Seq("__band", "__bucket"))
      .where(col(idCol) < col("__b_id"))
      .select(col(idCol).as("__a_id"), col("__b_id"))
    // dense buckets, two linear candidate families per lane:
    //  (a) identical-SIGNATURE groups pair every member with the group
    //      min — sig-identical cliques (the bulk of a dup-heavy bucket)
    //      collapse exactly, whatever their size;
    //  (b) each member pairs with its `denseWindow` successors under
    //      (signature-string, id) order — near-identical docs share most
    //      band keys and sort adjacent, linking across sig variants.
    val pass2Pairs = (if (denseBucketCap == Int.MaxValue) sparsePairs else {
      val sigKey = sig.select(col(idCol),
        concat_ws("|", (0 until bands).map(b => col(s"__b$b")): _*).as("__sk"))
      val denseLanes = sized.where(col("__bsz") > denseBucketCap)
        .select(col(idCol), col("__band"), col("__bucket"))
        .join(sigKey, Seq(idCol))
      val W = org.apache.spark.sql.expressions.Window
      val wOrd = W.partitionBy("__band", "__bucket").orderBy(col("__sk"), col(idCol))
      val wGrp = W.partitionBy("__band", "__bucket", "__sk")
      val densePairs = denseLanes
        .withColumn("__next",
          array((1 to denseWindow).map(i => lead(col(idCol), i).over(wOrd)): _*))
        .withColumn("__gmin", min(col(idCol)).over(wGrp))
        .select(col(idCol).as("__x"),
          explode(concat(col("__next"), array(col("__gmin")))).as("__y"))
        .where(col("__y").isNotNull && col("__y") =!= col("__x"))
        .select(least(col("__x"), col("__y")).as("__a_id"),
          greatest(col("__x"), col("__y")).as("__b_id"))
      sparsePairs.unionByName(densePairs)
    }).distinct()
    val drops2 = verifiedDrops(pass2Pairs)

    df.join(drops1.unionByName(drops2), Seq(idCol), "left_anti")
  }

  /** Near-dup candidate pairs for any 64-bit similarity-hash column
    * (SimHash over tokens, dHash over pixels, …): band the signature into
    * `maxHamming + 1` DISJOINT chunks and hash-join on chunk agreement,
    * then exact-Hamming verify. The band count is a correctness knob, not
    * tuning: with h ≤ maxHamming bit flips spread over maxHamming+1
    * disjoint bands, SOME band is untouched (pigeonhole), so candidate
    * generation is EXACT — the result is ALL pairs at Hamming ≤
    * `maxHamming`, found without any all-pairs join. Output:
    * (a_id, b_id, hamming).
    *
    * Scale note: with a 64-bit signature the chunks are ~64/(maxHamming+1)
    * bits, so each band has ~2^7 buckets — enough to keep buckets sparse
    * up to ~10^6 rows per band. Beyond that, widen the signature (e.g.
    * 256-bit SimHash → 28-bit chunks at the same cut) rather than adding
    * bands: chunk WIDTH is what keeps bucket occupancy, and thus the
    * verified pair count, linear. */
  def simhashBandPairs(sig: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int = 8): DataFrame = {
    val bands = maxHamming + 1
    val starts = (0 to bands).map(i => (64 * i) / bands)
    // ONE pass over sig per join side: the chunks explode from an inline
    // array (a lane-per-band union would recompute the signature source
    // once per band per side)
    val chunks = (0 until bands).map { band =>
      val lo = starts(band)
      val mask = (1L << (starts(band + 1) - lo)) - 1L
      shiftrightunsigned(col(sigCol), lo) bitwiseAND lit(mask)
    }
    val banded = sig.select(col(idCol), col(sigCol),
      posexplode(array(chunks: _*)).as(Seq("__band", "__chunk")))
    val a = banded.select(col("__band"), col("__chunk"),
      col(idCol).as("a_id"), col(sigCol).as("a_sim"))
    val b = banded.select(col("__band").as("__band_b"),
      col("__chunk").as("__chunk_b"), col(idCol).as("b_id"),
      col(sigCol).as("b_sim"))
    a.join(b, col("__band") === col("__band_b") &&
        col("__chunk") === col("__chunk_b") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sim") bitwiseXOR col("b_sim")).as("hamming"))
      .where(col("hamming") <= maxHamming) // filter BEFORE the distinct shuffle
      .distinct()
  }

  /** Embedding-cosine near-dup dedup: hyperplane-LSH bucket once, verify
    * cosine ≥ `threshold` within buckets, drop the higher id (b dropped
    * iff SOME same-bucket a<b verifies — identical rule to the token
    * dedups).
    *
    * Same two-pass EXACT scheme as `lshKeep`, for the same reason:
    * materializing every in-bucket pair is quadratic in bucket size, and
    * with 2^planes buckets over n near-random vectors every bucket holds
    * ~n/2^planes rows — at 100× data that per-bucket square is the job.
    * Pass 1 verifies each vector only against its bucket MINIMUM (linear,
    * every drop sound); pass 2 pairs only pass-1 SURVIVORS against their
    * full buckets, completing the rule exactly with a near-linear pair
    * count. */
  def embeddingKeep(df: DataFrame, idCol: String, vecCol: String,
      planes: Seq[Array[Double]], threshold: Double): DataFrame = {
    val bucketed = df.select(col(idCol), col(vecCol),
      V.hyperplaneBucket(col(vecCol), planes).as("__bucket"))
    df.join(cosineDropsWithinBuckets(bucketed, idCol, vecCol, threshold),
      Seq(idCol), "left_anti")
  }

  /** The dropped-id set of the rule "b dropped iff SOME same-`__bucket`
    * a<b has cosine ≥ `threshold`", via the two-pass exact scheme above.
    * `bucketed` must carry (`idCol`, `vecCol`, `__bucket`); the bucket
    * can come from ANY partitioner — hyperplane LSH ([[embeddingKeep]]),
    * a coarse quantizer (SemDeDup q137), IVF cells — the pass structure
    * only needs bucket-equality candidates. */
  private[graft] def cosineDropsWithinBuckets(df: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    val bucketed = df.cache()

    // pass 1: one row per vector — compare to the bucket's min-id vector
    val bucketMin = bucketed.groupBy("__bucket").agg(
      min(col(idCol)).as("__a_id"),
      min_by(col(vecCol), col(idCol)).as("__a_vec"))
    val drops1 = bucketed.join(broadcast(bucketMin), Seq("__bucket"))
      .where(col(idCol) > col("__a_id") &&
        V.nativeCosine(col("__a_vec"), col(vecCol)) >= threshold)
      .select(col(idCol)).distinct().cache()

    // pass 2: survivors (b-side) against their full buckets (a-side);
    // no broadcast — dense buckets are decimated on the survivor side
    val survivors = bucketed.join(broadcast(drops1), Seq(idCol), "left_anti")
      .select(col("__bucket"), col(idCol).as("__b_id"), col(vecCol).as("__b_vec"))
    val drops2 = bucketed.join(survivors, Seq("__bucket"))
      .where(col(idCol) < col("__b_id") &&
        V.nativeCosine(col(vecCol), col("__b_vec")) >= threshold)
      .select(col("__b_id").as(idCol)).distinct()

    drops1.unionByName(drops2).distinct()
  }

  /** Persist a [[minhashIndex]] as a PRUNABLE on-disk store — the 100 TB
    * layout the scaladoc above prescribes, realized: lane rows
    * (id, bucket) land `partitionBy(__band, __pfx)` where `__pfx` is the
    * bucket's first hex nibble, and token arrays land once per doc in a
    * separate `toks` table (lanes stay a few dozen bytes per row; the
    * heavy arrays are never ×bands duplicated). An incremental probe
    * then reads ONLY the (band, prefix) partitions its batch actually
    * touches ([[incrementalMinhashKeepPruned]]) instead of scanning the
    * whole index per batch — the difference between per-batch cost
    * growing with history size and growing with batch size.
    * `mode=append` supports batch-at-a-time accumulation (callers
    * needing at-least-once replay wrap writes in the EpochStore layout). */
  def writeLaneIndex(index: DataFrame, idCol: String, path: String,
      bands: Int = 8): Unit = {
    writeLanes(index, idCol, path, bands)
    index.select(col(idCol), col("__toks"))
      .write.mode("append").parquet(s"$path/toks")
  }

  /** [[writeLaneIndex]] with the token arrays in an id-BUCKETED,
    * id-sorted catalog table instead of a flat parquet dir: the verify
    * fetch can then push the batch's candidate-id set down as an
    * `IN` filter, and Spark prunes whole bucket FILES (plus row groups
    * within them, thanks to the sort) — the toks side of a probe stops
    * scaling with history size just like the lane side already does.
    * Append-mode on the table accumulates batches, mirroring the lane
    * layout's epoch appends. */
  def writeLaneIndexBucketed(index: DataFrame, idCol: String, path: String,
      toksTable: String, bands: Int = 8, toksBuckets: Int = 64): Unit = {
    writeLanes(index, idCol, path, bands)
    index.select(col(idCol), col("__toks"))
      .write.mode(org.apache.spark.sql.SaveMode.Append).format("parquet")
      .bucketBy(toksBuckets, idCol).sortBy(idCol)
      .saveAsTable(toksTable)
  }

  private def writeLanes(index: DataFrame, idCol: String, path: String,
      bands: Int): Unit =
    laneView(index, idCol, bands)
      .select(col(idCol), col("__bucket"), col("__band"), col("__pfx"))
      .write.partitionBy("__band", "__pfx")
      .mode("append").parquet(s"$path/lanes")

  /** Lanes + the partition-prefix column the on-disk layout keys on. */
  private[graft] def laneView(sig: DataFrame, idCol: String, bands: Int): DataFrame =
    bandLanes(sig, idCol, bands)
      .withColumn("__pfx", substring(col("__bucket"), 1, 1))

  /** History lane scan restricted to the batch's (band, prefix) set —
    * the predicate lands on partition columns, so only matched
    * directories are read (PrunedIndexSpec asserts it on the plan and
    * on the touched files). */
  private[graft] def prunedLaneScan(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, incLanes: DataFrame,
      extraCond: Column = lit(true),
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    // the batch's partition fingerprint: ≤ bands × 16 rows, driver-safe
    val probes = incLanes.select("__band", "__pfx").distinct()
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val cond = probes.map { case (b, p) =>
        col("__band") === b && col("__pfx") === p
      }.reduceOption(_ || _).getOrElse(lit(false))
    // an explicit schema (writer-derived) keeps the scan alive when a
    // concurrent lister catches the store footerless — inference would
    // hard-fail the whole query on that transient
    val reader = schema.fold(spark.read)(s => spark.read.schema(s))
    reader.parquet(s"$indexPath/lanes").where(cond && extraCond)
  }

  /** [[incrementalMinhashKeep]] against a [[writeLaneIndex]] store: the
    * batch's distinct (band, prefix) set — bounded by batch×bands — is
    * collected and pushed as a PARTITION FILTER, so the history lane
    * scan reads only matched directories (asserted in PrunedIndexSpec).
    * Token arrays are fetched for verification only; at full scale
    * bucket the toks table by id so that fetch prunes too. Admission
    * rule identical to the in-memory path: existing docs always win,
    * min-id within the batch. */
  def incrementalMinhashKeepPruned(indexPath: String, incoming: DataFrame,
      idCol: String, textCol: String, bands: Int = 8, bandSize: Int = 3,
      threshold: Double = 0.5,
      incomingIndex: Option[DataFrame] = None): DataFrame = {
    val spark = incoming.sparkSession
    val incSig = incomingIndex
      .getOrElse(minhashIndex(incoming, idCol, textCol, bands, bandSize))
      .cache()
    val incLanes = laneView(incSig, idCol, bands).cache()
    val exLanes = prunedLaneScan(spark, indexPath, incLanes)
    val exToks = spark.read.parquet(s"$indexPath/toks")
    prunedAdmit(exLanes, exToks, incoming, incSig, incLanes, idCol, threshold)
  }

  /** Shared admit core of the pruned-store paths (batch function above,
    * streaming [[graft.streaming.PrunedDedupIngest]]): one band join over
    * the (already partition-pruned) history lanes + the batch's own
    * lanes, one Jaccard verify round. History always wins; min-id within
    * the batch. */
  private[graft] def prunedAdmit(exLanes: DataFrame, exToks: DataFrame,
      incoming: DataFrame, incSig: DataFrame, incLanes: DataFrame,
      idCol: String, threshold: Double): DataFrame = {
    val pairs = prunedPairs(exLanes, incLanes, idCol)
    val aSig = exToks.select(col(idCol), col("__toks"))
      .unionByName(incSig.select(col(idCol), col("__toks")))
    val drops = jaccardDrops(pairs, aSig, incSig.select(col(idCol), col("__toks")),
      idCol, threshold, broadcastA = false, broadcastB = true)
    incoming.join(drops, Seq(idCol), "left_anti")
  }

  /** The one candidate join of the pruned-store paths: history lanes
    * (already partition-pruned) union the batch's own lanes, probed
    * against the broadcast batch lanes. History always wins (no id
    * guard); min-id within the batch. */
  private[graft] def prunedPairs(exLanes: DataFrame, incLanes: DataFrame,
      idCol: String): DataFrame =
    exLanes.select(col(idCol), col("__band"), col("__bucket"))
      .withColumn("__new", lit(false))
      .unionByName(incLanes.select(col(idCol), col("__band"), col("__bucket"))
        .withColumn("__new", lit(true)))
      .join(broadcast(incLanes
          .select(col(idCol).as("__b_id"), col("__band"), col("__bucket"))),
        Seq("__band", "__bucket"))
      .where(!col("__new") || col(idCol) < col("__b_id"))
      .select(col(idCol).as("__a_id"), col("__b_id"))
      .distinct()

  /** Bucket-pruned fetch from a [[writeLaneIndexBucketed]] toks table:
    * the candidate-id `IN` filter lands on the bucketing column, so the
    * scan reads only the bucket files (and, via the in-file id sort,
    * row groups) that can hold a candidate.
    *
    * The planner's auto-bucketed-scan pass disables bucketed reading
    * for a bare filter query (nothing downstream wants the bucket
    * distribution) and bucket pruning is lost with it — so the fetch is
    * MATERIALIZED here, eagerly, under a scoped conf that keeps the
    * bucketed scan on. The result is bounded by the candidate-id set
    * (the premise of a pointed fetch), the session conf is restored
    * before returning, and downstream joins read the cache. Callers
    * own the unpersist (the query harness clears per-query caches). */
  private[graft] def pointedToks(spark: org.apache.spark.sql.SparkSession,
      toksTable: String, idCol: String, ids: Seq[Any]): DataFrame =
    // the conf flip is session-global: serialize fetches so concurrent
    // callers (several foreachBatch loops share one session) cannot
    // interleave set/restore and strand the session with the scan
    // optimization off
    pointedFetchLock.synchronized {
      val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val old = spark.conf.get(key)
      spark.conf.set(key, "false")
      try {
        val df = spark.table(toksTable).where(col(idCol).isin(ids: _*)).cache()
        df.count() // cache fill runs the bucket-pruned scan inside the scope
        df
      } finally spark.conf.set(key, old)
    }

  private val pointedFetchLock = new Object

  /** [[incrementalMinhashKeepPruned]] against a [[writeLaneIndexBucketed]]
    * store: identical admission rule, but the verify-time token fetch is
    * POINTED — the (bounded: ≤ candidate pairs) distinct history-side ids
    * are collected and pushed down as a bucket-pruning filter, so BOTH
    * history touches of a probe (lanes and toks) read only what the
    * batch's band keys and candidates select, however large history has
    * grown. Batches beyond `maxPointedFetch` candidate ids fall back to
    * the full-table join (same result; a batch that large is a backfill,
    * not an increment).
    *
    * CACHING CONTRACT: this builds three internal caches (plus the
    * pointed fetch) that stay persisted until the caller's
    * `clearCache()`; loops that probe forever must use
    * [[incrementalMinhashKeepBucketedScoped]], which releases them. */
  def incrementalMinhashKeepBucketed(indexPath: String, toksTable: String,
      incoming: DataFrame, idCol: String, textCol: String, bands: Int = 8,
      bandSize: Int = 3, threshold: Double = 0.5,
      incomingIndex: Option[DataFrame] = None,
      maxPointedFetch: Int = 100000): DataFrame =
    bucketedKeepWithCaches(indexPath, toksTable, incoming, idCol, textCol,
      bands, bandSize, threshold, incomingIndex, maxPointedFetch)._1

  /** [[incrementalMinhashKeepBucketed]] as a scoped resource for the
    * probe-forever usage (a long-lived loop probing batch after batch):
    * runs `use` on the admitted frame and ALWAYS unpersists the three
    * internal caches plus the pointed-toks fetch before returning, so a
    * loop that never ends never accumulates cached frames. One-shot
    * callers may keep using the plain variant — there the per-query
    * harness `clearCache()` is the documented owner of the release. */
  def incrementalMinhashKeepBucketedScoped[A](indexPath: String,
      toksTable: String, incoming: DataFrame, idCol: String, textCol: String,
      bands: Int = 8, bandSize: Int = 3, threshold: Double = 0.5,
      incomingIndex: Option[DataFrame] = None,
      maxPointedFetch: Int = 100000)(use: DataFrame => A): A = {
    val (admitted, caches) = bucketedKeepWithCaches(indexPath, toksTable,
      incoming, idCol, textCol, bands, bandSize, threshold, incomingIndex,
      maxPointedFetch)
    try use(admitted)
    finally caches.foreach(_.unpersist())
  }

  private def bucketedKeepWithCaches(indexPath: String, toksTable: String,
      incoming: DataFrame, idCol: String, textCol: String, bands: Int,
      bandSize: Int, threshold: Double, incomingIndex: Option[DataFrame],
      maxPointedFetch: Int): (DataFrame, Seq[DataFrame]) = {
    val spark = incoming.sparkSession
    val (incSigRaw, idxCaches) = incomingIndex match {
      case Some(idx) => (idx, Nil)
      case None =>
        val (idx, toksCache) =
          minhashIndexWithCache(incoming, idCol, textCol, bands, bandSize)
        (idx, Seq(toksCache))
    }
    val incSig = incSigRaw.cache()
    val incLanes = laneView(incSig, idCol, bands).cache()
    val exLanes = prunedLaneScan(spark, indexPath, incLanes)
    val pairs = prunedPairs(exLanes, incLanes, idCol).cache()
    // the batch's own ids resolve from incSig below; only history ids
    // need fetching, but passing the full set is harmless (non-matching
    // ids just select nothing) and saves an anti-join
    val aIds = pairs.select("__a_id").distinct()
      .limit(maxPointedFetch + 1).collect().map(_.get(0)).toSeq
    val (exToks, fetchCaches) =
      if (aIds.size <= maxPointedFetch)
        { val t = pointedToks(spark, toksTable, idCol, aIds); (t, Seq(t)) }
      else (spark.table(toksTable), Nil)
    val aSig = exToks.select(col(idCol), col("__toks"))
      .unionByName(incSig.select(col(idCol), col("__toks")))
    val drops = jaccardDrops(pairs, aSig, incSig.select(col(idCol), col("__toks")),
      idCol, threshold, broadcastA = false, broadcastB = true)
    (incoming.join(drops, Seq(idCol), "left_anti"),
      Seq(incSig, incLanes, pairs) ++ fetchCaches ++ idxCaches)
  }
}
