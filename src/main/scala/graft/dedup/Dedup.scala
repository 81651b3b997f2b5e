package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Near-duplicate detection for document corpora (SURVEY §2.D).
  *
  * Scale design: every method is candidate-generation + verification.
  * Candidate generation is always an equi-join on a small derived
  * key (content hash, LSH band hash, rare-gram hash, SimHash band) —
  * never an all-pairs comparison — so the shuffle is hash-partitioned.
  * Candidate-bucket sizes are bounded by two explicit mechanisms
  * (band selectivity alone is NOT a bound — a duplicate-heavy corpus
  * puts every copy in the same band bucket):
  *  1. exact-dedup prefilter (`prededup`, on by default): near-dup
  *     candidate generation runs on one representative per content
  *     hash, so exact duplicates — the only unbounded skew source a
  *     similarity key can't separate — never meet in a bucket;
  *  2. a posting-list cap (`maxBucket`): each bucket keeps at most
  *     `maxBucket` ids, enforced INSIDE the aggregation by a bounded
  *     top-k heap (map-side state and shuffled bytes are both capped,
  *     like d6's rare-gram df cap). A bucket past the cap is a
  *     degenerate band (boilerplate corpus) whose pairs carry no
  *     near-dup signal at that volume.
  * Within those bounds:
  *  - exact: one aggregation on a 128-bit content hash.
  *  - MinHash-LSH: 4 band keys per doc; only same-band docs meet.
  *  - SimHash: pigeonhole bands of the signature; dist<=d pairs are
  *    guaranteed to collide on >=1 of d+1 bands (no recall loss).
  *  - n-gram: rare grams only (df cap) — frequent grams would both
  *    blow up the pair count and carry no signal.
  */
object Dedup {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Sentinel for `numPerms` meaning "choose banding selectivity from
    * a sampled estimate" — see [[chooseBanding]]. The default for
    * every MinHash entry point: broad-vocabulary corpora resolve to
    * the classic 16 perms / 4 bands, narrow-vocabulary (templated)
    * corpora escalate perms-per-band before paying the measured 5×
    * false-positive-candidate cliff (GATE_SF1.md round-8 addendum).
    */
  val AutoPerms: Int = -1

  /** One banding candidate's sampled selectivity: distinct colliding
    * sample pairs at this signature width, how many of them were
    * WASTED (exact Jaccard below the caller's near-dup bar — band
    * collisions that cost verification but can never become edges),
    * and the corpus-extrapolated wasted-candidates:documents ratio.
    */
  case class BandingStat(numPerms: Int, sampleCandidates: Long,
      sampleWasted: Long, predictedWasteRatio: Double)

  /** A resolved banding choice plus the evidence it rests on —
    * returned by [[chooseBanding]] and logged by every auto-tuned
    * entry point, so the candidate-blowup telemetry is surfaced
    * before a production run pays for it.
    */
  case class BandingChoice(numPerms: Int, bands: Int, corpusDocs: Long,
      estReps: Long, sampledReps: Long, stats: Seq[BandingStat]) {
    def stat(p: Int): BandingStat = stats.find(_.numPerms == p)
      .getOrElse(BandingStat(p, 0L, 0L, 0.0))
  }

  /** Choose MinHash banding selectivity from a bounded deterministic
    * sample — the auto-tuner behind [[AutoPerms]].
    *
    * Why selectivity must be data-driven: a band of r permutation
    * rows collides for an unrelated pair with probability ≈ j^r
    * where j is the pair's baseline Jaccard. Natural corpora sit at
    * j ≈ 0 and the classic 4-perm bands are already selective;
    * templated/narrow-vocabulary corpora push j high enough that
    * unrelated documents collide at ~1000:1 false-positive ratio
    * (measured: 24.7M candidates for 25k real edges at the 100×
    * gate octave, GATE_SF1.md) and the verify join dominates end to
    * end. Raising perms-per-band restores selectivity at a small,
    * measured recall cost (98.0% of jac ≥ 0.5 edges kept at 6
    * perms/band on that corpus).
    *
    * What distinguishes waste from work: REAL near-duplicate pairs
    * also collide — a duplicate-heavy corpus legitimately emits
    * super-linearly many candidates, and a tuner that counted raw
    * collisions would de-tune recall exactly where dedup matters
    * most. So the estimate verifies each sampled colliding pair's
    * exact shingle Jaccard (the sample carries shingle sets) and
    * counts only sub-`wasteJacPm` collisions as waste.
    *
    * Mechanics (three bounded jobs, ONE full-corpus data pass):
    *  1. one unfiltered `count` of the input — metadata-only on a
    *     PLAIN parquet scan (footers, not text, at 100 TB), but a
    *     full computation pass when `docs` is a derived frame (a
    *     window-filtered survivor set, a join output). Callers that
    *     tune derived frames and already know the row count should
    *     pass `knownCount` to skip this job entirely;
    *  2. a deterministic hash-mod sample (`xxhash64(id) % m == 0`,
    *     m sized from the count for ~2·sampleSize rows —
    *     order-stable across runs and partitionings; the one pass
    *     that reads data), shingle-eligibility-filtered and
    *     exact-deduped within the sample so both the eligible and
    *     the duplicate fraction are estimated rather than assumed;
    *  3. one job over the sample computing, for EVERY candidate
    *     width at once, the distinct band-colliding pairs (same
    *     capped-bucket machinery as the real pipeline) and their
    *     exact Jaccard. Candidate widths share one signature: the
    *     permutation constants depend only on the row index
    *     ([[graft.functions.TextHash.minA]]), so the p-perm
    *     signature is the p-prefix of the widest one.
    *
    * Extrapolation: sampled wasted pairs scale with the square of
    * the rep count (pair counting over a uniform hash sample),
    * so predictedWasteRatio(p) = wasted_s(p) · estReps / s². The
    * smallest width whose predicted wasted-candidates:documents
    * ratio meets `wasteTarget` wins; if none does, the widest
    * candidate wins and a warning is logged — the surfaced form of
    * the d18 cliff. Widths beyond 24 (6 perms/band) are deliberately
    * NOT in the default ladder: the next step trades real recall
    * (95.6% at 8 perms/band on the gate corpus) for selectivity a
    * user should opt into explicitly.
    *
    * Determinism: the sample is hash-ordered, the signature is
    * seed-fixed, and the decision is a pure function of the sampled
    * aggregate — the same corpus always resolves to the same
    * banding, which is what keeps auto-tuned operators
    * oracle-checkable.
    */
  /** Session-scoped memo for [[chooseBanding]]: the decision is a
    * pure, deterministic function of the (immutable within a
    * session) input data and the tuning parameters, and one batch
    * session routinely tunes the SAME corpus many times — d7/d13
    * both tune the raw documents scan, a curation pipeline tunes
    * per stage — so each (session, canonical plan, params) pays the
    * three sampling jobs once. Keyed on `Dataset.semanticHash` (plan
    * canonicalization: different paths/filters → different keys) and
    * the session UUID (no cross-session reuse — a restarted session
    * re-reads possibly-changed files).
    */
  private val bandingMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Seq[Any]), BandingChoice]

  /** Tuner telemetry, cumulative over the JVM: how many times
    * [[chooseBanding]] actually ran its sampling jobs vs answered
    * from the memo, and the wall-clock those runs cost. Lets a bench
    * harness attribute "query time" vs "one-off tuning time" per key
    * from the artifact alone (BENCH_NOTES.md) — a tuner pre-pass
    * leaking into steady-state timings shows up as `runs` deltas
    * where only `memoHits` should move.
    */
  case class TunerStats(runs: Long, memoHits: Long, nanos: Long) {
    def -(o: TunerStats): TunerStats =
      TunerStats(runs - o.runs, memoHits - o.memoHits, nanos - o.nanos)
  }
  private val tunerRuns = new java.util.concurrent.atomic.AtomicLong
  private val tunerMemoHits = new java.util.concurrent.atomic.AtomicLong
  private val tunerNanos = new java.util.concurrent.atomic.AtomicLong
  def tunerStats: TunerStats =
    TunerStats(tunerRuns.get, tunerMemoHits.get, tunerNanos.get)

  def chooseBanding(docs: DataFrame, id: String, text: String,
      shingleK: Int = 8, bands: Int = 4,
      permCandidates: Seq[Int] = Seq(16, 20, 24),
      wasteTarget: Double = 8.0, wasteJacPm: Int = 500,
      sampleSize: Int = 2048, maxBucket: Int = 512,
      knownCount: Option[Long] = None): BandingChoice = {
    require(permCandidates.nonEmpty && bands >= 1 &&
      permCandidates.forall(p => p >= bands && p % bands == 0),
      s"permCandidates must be positive multiples of bands=$bands: $permCandidates")
    require(sampleSize >= 2, s"sampleSize too small: $sampleSize")
    // knownCount is deliberately NOT in the memo key: it is a claim
    // about the same immutable data the plan hash already identifies,
    // so a count-passing caller and a counting caller must share one
    // memo entry rather than re-tune.
    val memoKey = (System.identityHashCode(docs.sparkSession).toString,
      docs.semanticHash(),
      Seq(id, text, shingleK, bands, permCandidates, wasteTarget,
        wasteJacPm, sampleSize, maxBucket))
    val memoized = bandingMemo.get(memoKey)
    if (memoized != null) { tunerMemoHits.incrementAndGet(); return memoized }
    val t0 = System.nanoTime()
    def record(choice: BandingChoice): BandingChoice = {
      bandingMemo.put(memoKey, choice)
      tunerRuns.incrementAndGet()
      tunerNanos.addAndGet(System.nanoTime() - t0)
      choice
    }
    val perms = permCandidates.distinct.sorted
    // Metadata-only on a plain scan (parquet answers from footers);
    // a full computation pass on derived frames — which is why
    // callers holding an already-materialized count pass knownCount.
    val nRaw = knownCount.getOrElse(docs.count())
    // Degenerate corpora memoize too: without record() here, every
    // call on a <2-row (or all-ineligible) frame would re-run the
    // count/sample jobs that just proved there is nothing to tune.
    if (nRaw < 2)
      return record(BandingChoice(perms.head, bands, nRaw, nRaw, nRaw,
        perms.map(BandingStat(_, 0L, 0L, 0.0))))
    // Deterministic ~2*sampleSize-row hash-mod sample: the single
    // data-reading pass. Oversampled 2x so the post-filter eligible
    // count still lands near sampleSize. The sample key AND the
    // tuner's internal pair id are xxhash64 of the RAW id — never a
    // cast: a long cast on string ids (UUIDs, URLs) is all-null, and
    // a null-keyed sample would silently tune nothing. The tuner
    // only needs a deterministic pair identity, which a 64-bit hash
    // of any id type provides (collision odds over a ~4k sample are
    // negligible, and the sample is content-deduped anyway).
    val modulus = math.max(1L, nRaw / (2L * sampleSize))
    val sampled = docs
      .select(xxhash64(col(id)).as("__bid"), col(text).as("__bt"))
      .filter(pmod(col("__bid"), lit(modulus)) === 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxP = perms.last
    val feats = sampled
      .filter(length(lower(trim(col("__bt")))) >= shingleK)
      .withColumn("__ch", contentHash(col("__bt")))
      .dropDuplicates("__ch")
      .select(col("__bid"),
        minhashSignature(col("__bt"), shingleK, maxP).as("__sig"),
        array_sort(array_distinct(
          TextHash.shingle_hashes(lower(trim(col("__bt"))), shingleK)))
          .as("__set"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sRaw = sampled.count()
      val sReps = feats.count()
      if (sReps < 2)
        return record(BandingChoice(perms.head, bands, nRaw, 0L, sReps,
          perms.map(BandingStat(_, 0L, 0L, 0.0))))
      // eligible-rep estimate: raw corpus scaled by the sample's
      // joint eligibility+dedup survival rate
      val estReps = math.max(1L,
        math.round(nRaw.toDouble * sReps / math.max(1L, sRaw)))
      // All candidate widths in one pass: tag each band key with its
      // width, reuse the pipeline's capped-bucket pair generation,
      // verify each distinct pair's exact Jaccard once per width.
      val keyed = feats.select(col("__bid"), explode(array(
        perms.flatMap(p => bandKeyCols(col("__sig"), p, bands).map(bh =>
          struct(lit(p).as("p"), bh.as("bh")))): _*)).as("k"))
      val agg = keyed
        .groupBy(col("k.p").as("p"), col("k.bh.band"), col("k.bh.band_hash"))
        .agg(cappedBucket(col("__bid"), maxBucket).as("ds"))
        .filter(size(col("ds")) >= 2)
        .select(col("p"), explode(bucketPairs(col("ds"))).as("pr"))
        .select(col("p"), col("pr.d1").as("d1"), col("pr.d2").as("d2"))
        .distinct()
        .join(broadcast(feats.select(col("__bid").as("d1"), col("__set").as("s1"))), "d1")
        .join(broadcast(feats.select(col("__bid").as("d2"), col("__set").as("s2"))), "d2")
        .select(col("p"),
          TextHash.sorted_intersect_count(col("s1"), col("s2")).as("shared"),
          size(col("s1")).cast("long").as("n1"),
          size(col("s2")).cast("long").as("n2"))
        .withColumn("jac_pm", expr("shared * 1000 div (n1 + n2 - shared)"))
        .groupBy("p")
        .agg(count(lit(1)).as("cand"),
          sum(when(col("jac_pm") < wasteJacPm, 1L).otherwise(0L)).as("waste"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      val stats = perms.map { p =>
        val (cand, waste) = agg.getOrElse(p, (0L, 0L))
        BandingStat(p, cand, waste,
          waste.toDouble * estReps / (sReps.toDouble * sReps))
      }
      // Smallest width that meets the target wins (narrower = cheaper
      // signatures and better recall); when none does, take the
      // least-wasteful candidate — NOT blindly the widest: band
      // collision probability is a product over the specific rows a
      // band holds, so on structured corpora a wider banding can
      // measure WORSE than a narrower one (observed in BandingSpec's
      // templated corpus: 20 perms beat 24).
      val chosen = stats.find(_.predictedWasteRatio <= wasteTarget)
        .getOrElse(stats.minBy(s => (s.predictedWasteRatio, s.numPerms)))
        .numPerms
      val choice = BandingChoice(chosen, bands, nRaw, estReps, sReps, stats)
      val detail = stats.map(s =>
        f"p=${s.numPerms} waste=${s.sampleWasted}/${s.sampleCandidates} ratio=${s.predictedWasteRatio}%.2f")
        .mkString(", ")
      if (choice.stat(chosen).predictedWasteRatio > wasteTarget)
        log.warn(s"MinHash banding: even widest candidate numPerms=$chosen " +
          s"predicts wasted-candidate:doc ratio ${"%.1f".format(choice.stat(chosen).predictedWasteRatio)} " +
          s"> target $wasteTarget on ~$estReps reps ($detail); expect a " +
          "verification-dominated run — consider wider permCandidates or a pre-filter")
      else
        log.info(s"MinHash banding auto-tuned: numPerms=$chosen bands=$bands " +
          s"over ~$estReps reps ($detail)")
      record(choice)
    } finally {
      feats.unpersist()
      sampled.unpersist()
    }
  }

  /** Resolve an [[AutoPerms]] sentinel to a concrete width. */
  private[graft] def resolvePerms(docs: DataFrame, id: String, text: String,
      shingleK: Int, numPerms: Int, bands: Int, maxBucket: Int,
      knownCount: Option[Long] = None): Int =
    if (numPerms != AutoPerms) numPerms
    else chooseBanding(docs, id, text, shingleK, bands,
      maxBucket = maxBucket, knownCount = knownCount).numPerms

  /** Normalized content identity key: 128-bit MD5 of the lower-cased,
    * trimmed text. Exact-dedup decisions DROP documents, so the key
    * must make collisions negligible at corpus scale — the ~2^30 poly
    * hash used for similarity signatures reaches 50% birthday-collision
    * probability around 38k documents and must never be an identity.
    */
  def contentHash(text: Column): Column = md5(lower(trim(text)))

  /** All id pairs (d1 < d2) within one candidate bucket, generated
    * from the bucket's posting list instead of a bucket self-join:
    * the groupBy that builds the list is the only shuffle, and pair
    * expansion happens bucket-locally. Callers must bound the posting
    * list BEFORE it reaches this expansion (rare-gram df cap,
    * [[cappedBucket]]) — the quadratic blowup is only safe because
    * the list is capped.
    */
  private[graft] def bucketPairs(ds: Column): Column =
    flatten(transform(ds, x =>
      transform(filter(ds, y => y > x),
        y => struct(x.as("d1"), y.as("d2")))))

  /** Bounded posting list: the `maxBucket` smallest ids of the
    * group, as a sorted array. State is a bounded heap
    * ([[graft.functions.TopKAgg]]), so the map side holds and ships
    * at most `maxBucket` entries per bucket regardless of how
    * degenerate the key distribution is — the skew defense for all
    * bucket-pair candidate generation. Deterministic (ids, not
    * arrival order). Accepts any integral id (cast to long here —
    * TopKAgg's heap stores LongType ids); the score is the negated
    * id as a double, so ids above 2^53 could tie in score, but the
    * heap's id tie-break still keeps the smallest ids.
    */
  private[graft] def cappedBucket(id: Column, maxBucket: Int): Column =
    transform(
      graft.functions.TopKAgg.top_k(-id.cast("double"), id.cast("long"), maxBucket),
      t => t("id"))

  /** One representative (minimum id) per normalized-content hash:
    * the exact-dedup prefilter run before near-dup candidate
    * generation. Exact duplicates collide on EVERY similarity key,
    * so without this filter a duplicate-heavy corpus concentrates in
    * single band buckets; with it, near-dup buckets only ever hold
    * content-distinct docs. One window shuffle on the content hash.
    */
  private[graft] def contentReps(docs: DataFrame, id: String, text: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumn("__ch", contentHash(col(text)))
      .withColumn("__rep", min(col(id)).over(Window.partitionBy("__ch")))
      .filter(col(id) === col("__rep"))
      .drop("__ch", "__rep")
  }

  /** Exact dedup: group by content hash, keep the smallest id. */
  def exact(docs: DataFrame, id: String, text: String): DataFrame =
    docs.withColumn("content_hash", contentHash(col(text)))
      .groupBy("content_hash")
      .agg(min(col(id)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Content-defined chunking (the FastCDC/LBFS boundary family:
    * Muthitacharoen et al. 2001; Xia et al. 2016), on word tokens: a
    * chunk boundary falls after token i whenever
    * tokenHash(i) % divisor == 0 (i < n; the final chunk absorbs the
    * tail), so boundaries are declared by CONTENT, not position — an
    * insertion near the head of a re-crawled document re-chunks only
    * the window it touches and every later chunk re-aligns
    * byte-for-byte. Fixed-stride spans (d39) lose every window after
    * an insertion; CDC is why storage/transfer dedup systems survive
    * edits.
    *
    * Output: one row per chunk — (id, idx [1-based], chunk_len,
    * h1, h2) where (h1, h2) are independent base-31/37 polynomial
    * folds of the chunk's token-hash sequence (identity key
    * (h1, h2, chunk_len); for grouping beyond the tested SFs swap in
    * a 128-bit digest — no plan-shape change).
    *
    * Scale shape: boundaries and token hashes are per-row array
    * arithmetic computed ONCE per document in the projection BELOW
    * the per-chunk generate — the generate is deliberate: higher-
    * order functions are interpreted (codegen-fallback), and without
    * the Generate barrier CollapseProject inlines the O(n_tokens)
    * bounds computation into every field of every chunk element
    * (measured 64 s on the 5000-doc bench corpus vs ~2 s with the
    * barrier — an O(n·chunks) blow-up per document). Above the
    * barrier each chunk's two folds reference the materialized
    * arrays, so total per-doc work is O(n_tokens). No window, no
    * shuffle; only the chunk summaries (~n_tokens / divisor rows of
    * four integers) leave the map side.
    */
  def cdcChunks(docs: DataFrame, id: String, text: String,
      divisor: Int = 16): DataFrame =
    // One compiled pass ([[graft.functions.CdcChunkRows]]): the
    // original composed form (boundary filter + two interpreted
    // aggregate folds re-sliced per exploded chunk row) carried the
    // identical arithmetic but ran the folds as Catalyst lambda
    // interpretation per chunk — 24.3 s isolated at sf1.0, kernel
    // measured in GATE_SF1.md r15 part 3. Output is bit-identical
    // (same tokenization, boundary rule, fold bases, idx numbering,
    // and the len > 0 totality filter — enforced inside the kernel).
    docs
      .select(col(id),
        explode(TextHash.cdc_chunk_rows(col(text), divisor)).as("__c"))
      .select(col(id), col("__c.idx").as("idx"),
        col("__c.chunk_len").as("chunk_len"),
        col("__c.h1").as("h1"), col("__c.h2").as("h2"))

  /** MOSS winnowing fingerprint pairs (Schleimer, Wilkerson, Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003): per document, hash every `gramK`-token gram
    * (positional, NOT distinct) and select as fingerprints the MIN
    * hash of each sliding `window` of consecutive gram hashes. The
    * winnowing theorem gives the two properties ad-hoc sampling
    * lacks: any shared token run of length >= window+gramK−1 is
    * GUARANTEED to surface at least one shared fingerprint (no
    * missed long match), while expected fingerprint density is only
    * ~2/(window+1) of the grams (bounded index size) — the
    * principled sparsification MOSS runs on.
    *
    * Output: (d1, d2, shared_prints) for pairs sharing >=
    * `minShared` distinct selected fingerprints, df-capped by the d6
    * machinery (posting lists bounded INSIDE the aggregation by the
    * top-k heap, pairs bucket-local — a boilerplate fingerprint at
    * corpus scale ships dfCap+1 ids, not its posting list, and is
    * dropped).
    *
    * 100 TB shape: gram hashing, the window-min selection, and the
    * distinct are all IN-ROW (one scan, no explode before the
    * fingerprint explode, which is already ~2/(window+1) sparse);
    * everything after is the measured d6/d54 bounded-candidate path.
    */
  def winnowPairs(docs: DataFrame, id: String, text: String,
      gramK: Int = 4, window: Int = 4, dfCap: Int = 20,
      minShared: Int = 2): DataFrame = {
    val g = TextHash.word_gram_hashes(col(text), gramK, distinct = false)
    // window-min selection + distinct in one compiled pass
    // ([[graft.functions.WinnowPrints]] — the interpreted
    // transform/slice/array_min chain it replaces cost 27.6 s
    // isolated at sf1.0, GATE_SF1.md r15 part 3)
    val prints = docs
      .select(col(id).as("__id"), g.as("__g"))
      .filter(size(col("__g")) >= 1)
      .select(col("__id"),
        TextHash.winnow_prints(col("__g"), window).as("__ps"))
    val ep = prints.select(col("__id"), explode(col("__ps")).as("__p"))
    ep.groupBy("__p")
      .agg(graft.functions.TopKAgg.top_k(
        col("__id").cast("double"), col("__id"), dfCap + 1).as("top"))
      .filter(size(col("top")).between(2, dfCap))
      .select(transform(col("top"), t => t("id")).as("ds"))
      .select(explode(bucketPairs(col("ds"))).as("p"))
      .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .agg(count(lit(1)).as("shared_prints"))
      .filter(col("shared_prints") >= minShared)
  }

  /** Asymmetric CONTAINMENT pairs (Broder 1997's containment
    * coefficient — the quote/snippet duplicate class): C(A,B) =
    * |A∩B| / |A| over distinct word-`gramN`-gram sets; emits pairs
    * where the SMALLER document is >= `minContPm`‰ contained in the
    * larger. Symmetric Jaccard structurally misses this class (a
    * 30-gram snippet in a 500-gram article has J ≈ 0.06 but C = 1.0).
    *
    * Candidates use the d6 machinery: rare-gram posting lists
    * (df <= `dfCap`, the cap enforced INSIDE the aggregation by the
    * bounded top-k heap so no posting list ships more than dfCap+1
    * ids), pairs generated bucket-locally, evidence floor
    * `minSharedRare` (low — a snippet has few grams total).
    * Verification is one native merge-walk intersect per candidate
    * over the pre-sorted distinct sets; orientation is
    * small-side-first with the doc id as the deterministic tie-break.
    */
  def containmentPairs(docs: DataFrame, id: String, text: String,
      gramN: Int = 3, dfCap: Int = 20, minSharedRare: Int = 2,
      minContPm: Long = 800L): DataFrame = {
    val gramH = TextHash.word_gram_hashes(col(text), gramN, distinct = true)
    val grams = docs
      .select(col(id).as("__id"), array_sort(gramH).as("__gs"))
      .filter(size(col("__gs")) >= 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = grams
      .select(col("__id"), explode(col("__gs")).as("__g"))
      .groupBy("__g")
      .agg(graft.functions.TopKAgg.top_k(
        col("__id").cast("double"), col("__id"), dfCap + 1).as("top"))
      .filter(size(col("top")).between(2, dfCap))
      .select(transform(col("top"), t => t("id")).as("ds"))
      .select(explode(bucketPairs(col("ds"))).as("p"))
      .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .agg(count(lit(1)).as("shared_rare"))
      .filter(col("shared_rare") >= minSharedRare)
      .select("d1", "d2")
    cand
      .join(grams.select(col("__id").as("d1"), col("__gs").as("gs1")), "d1")
      .join(grams.select(col("__id").as("d2"), col("__gs").as("gs2")), "d2")
      .select(col("d1"), col("d2"),
        TextHash.sorted_intersect_count(col("gs1"), col("gs2")).as("shared"),
        size(col("gs1")).cast("long").as("n1"),
        size(col("gs2")).cast("long").as("n2"))
      .select(
        when(col("n1") <= col("n2"), col("d1")).otherwise(col("d2"))
          .as("small_id"),
        when(col("n1") <= col("n2"), col("d2")).otherwise(col("d1"))
          .as("big_id"),
        least(col("n1"), col("n2")).as("n_small"),
        greatest(col("n1"), col("n2")).as("n_big"),
        col("shared"))
      .withColumn("cont_pm", expr("shared * 1000 div n_small"))
      .filter(col("cont_pm") >= minContPm)
  }

  /** Exact duplicated-SUBSTRING intervals (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" —
    * the ExactSubstr pass): every SLIDING `width`-token gram that
    * occurs >= 2 times anywhere in the corpus (across documents OR
    * within one) is a duplicated seed; per document, overlapping and
    * adjacent seed intervals [pos, pos+width) coalesce into maximal
    * duplicated-token islands — the contiguous regions a removal
    * pass would cut. Stride-1 grams are what make the intervals
    * EXACT: d39's fixed-stride spans only see duplication aligned to
    * its 8-token grid (a copied sentence starting mid-span is
    * invisible); the sliding seeds catch every duplicated run
    * >= width tokens at any alignment, and the island union is its
    * exact extent.
    *
    * Output: one row per document — (id, n_tokens, n_seeds,
    * n_islands, dup_tokens, max_island), where dup_tokens is the
    * exact union size (islands never overlap) and zero-dup documents
    * report zeros.
    *
    * Scale shape: the gram stream (id, pos, gram_hash) is ~n_tokens
    * rows of three integers built map-side in one scan
    * ([[TextHash.word_gram_hashes]], O(n) rolling fold, codegen'd).
    * Corpus-wide seed counts use groupBy(gram) — NOT a window — so
    * the hot boilerplate gram is absorbed by map-side partial
    * aggregation instead of piling its occurrences into one window
    * partition; the seed filter is then an equi-join of the stream
    * against the df>=2 gram set (AQE splits the skewed build
    * partitions a hot gram creates). Only duplicated seeds (the
    * sliver) re-shuffle by document for the island windows. Total:
    * two exchanges of the full stream, one of the sliver — the
    * suffix-array construction the paper uses single-node is
    * replaced by hash aggregation, the only corpus-scale primitive
    * a 1000-executor cluster actually has for this.
    */
  def dupIntervals(docs: DataFrame, id: String, text: String,
      width: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(width >= 1, s"gram width must be >= 1, got $width")
    val base = docs.select(col(id),
      TextHash.word_gram_hashes(col(text), width, distinct = false)
        .as("__gh"),
      size(TextHash.word_gram_hashes(col(text), 1, distinct = false))
        .cast("long").as("n_tokens"))
    val stream = base
      .select(col(id), posexplode(col("__gh")).as(Seq("__pos", "__g")))
      .select(col(id), col("__pos").cast("long").as("__pos"), col("__g"))
    val dupGrams = stream.groupBy("__g")
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2)
      .select("__g")
    val seeds = stream.join(dupGrams, "__g").select(col(id), col("__pos"))
    val wDoc = Window.partitionBy(id).orderBy("__pos")
    val islands = seeds
      .withColumn("__prev_end", max(col("__pos") + width)
        .over(wDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__brk",
        when(col("__pos") > coalesce(col("__prev_end"), lit(-1L)), 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__brk")).over(wDoc))
      .groupBy(col(id), col("__isl"))
      .agg(min(col("__pos")).as("__s"),
        (max(col("__pos")) + width).as("__e"),
        count(lit(1)).as("__seeds"))
    val perDoc = islands.groupBy(col(id))
      .agg(sum(col("__seeds")).as("__n_seeds"),
        count(lit(1)).as("__n_islands"),
        sum(col("__e") - col("__s")).as("__dup_tokens"),
        max(col("__e") - col("__s")).as("__max_island"))
    base.select(col(id), col("n_tokens"))
      .join(perDoc, Seq(id), "left")
      .select(col(id), col("n_tokens"),
        coalesce(col("__n_seeds"), lit(0L)).as("n_seeds"),
        coalesce(col("__n_islands"), lit(0L)).as("n_islands"),
        coalesce(col("__dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("__max_island"), lit(0L)).as("max_island"))
  }

  /** MinHash signature column over k-char shingles. */
  def minhashSignature(text: Column, shingleK: Int, numPerms: Int): Column =
    TextHash.minhash_sig(TextHash.shingle_hashes(lower(trim(text)), shingleK), numPerms)

  /** LSH band rows: one (band, band_hash) per band per doc. Docs
    * agreeing on any band are near-dup candidates. `numPerms`
    * defaults to [[AutoPerms]] (sampled selectivity choice,
    * [[chooseBanding]]).
    */
  def lshBands(docs: DataFrame, id: String, text: String,
      shingleK: Int = 8, numPerms: Int = AutoPerms, bands: Int = 4): DataFrame = {
    val np = resolvePerms(docs, id, text, shingleK, numPerms, bands, 512)
    lshBandsResolved(docs, id, text, shingleK, np, bands)
  }

  private def lshBandsResolved(docs: DataFrame, id: String, text: String,
      shingleK: Int, numPerms: Int, bands: Int): DataFrame = {
    val sig = minhashSignature(col(text), shingleK, numPerms)
    val withSig = docs.filter(length(lower(trim(col(text)))) >= shingleK)
      .select(col(id), sig.as("sig"))
    withSig.select(col(id), explode(array(
        bandKeyCols(col("sig"), numPerms, bands): _*)).as("bh"))
      .select(col(id), col("bh.band").as("band"), col("bh.band_hash").as("band_hash"))
  }

  /** MinHash-LSH candidate pairs (distinct doc pairs sharing >= 1
    * band) with estimated (signature agreement out of numPerms) and
    * exact (shingle-set) Jaccard, as exact integer per-milles.
    *
    * `prededup` (default on) restricts candidate generation to one
    * representative per content hash — exact duplicates are
    * identity-dedup's job (D1) and would otherwise concentrate a
    * duplicate-heavy corpus into single band buckets. `maxBucket`
    * caps each band bucket's posting list at the smallest ids
    * (bounded agg state; see [[cappedBucket]]).
    *
    * Banding selectivity is corpus-dependent: classic 4-perm bands
    * are tuned for corpora whose unrelated documents share little;
    * when baseline Jaccard is high (narrow vocabulary, templated
    * text), band collisions over-generate candidates and the verify
    * join dominates. The [[AutoPerms]] default chooses perms-per-band
    * from a sampled waste estimate ([[chooseBanding]]) — measured at
    * the 100× gate (GATE_SF1.md round-8 addendum): numPerms=24,
    * bands=4 cut candidates 3.5× and total time 5× while keeping
    * 98.0% of true (jac ≥ 0.5) edges on the narrow-vocab corpus,
    * while broad-vocab corpora resolve to the classic 16.
    */
  def minhashVerifiedPairs(docs: DataFrame, id: String, text: String,
      shingleK: Int = 8, numPerms: Int = AutoPerms, bands: Int = 4,
      prededup: Boolean = true, maxBucket: Int = 512): DataFrame = {
    // Tune on the RAW input, not the rep frame: chooseBanding exact-
    // dedups within its sample anyway, and sampling the rep frame
    // would pay the contentReps window over the full corpus twice
    // more (tuner count + sample scan) before the query proper runs.
    val np = resolvePerms(docs, id, text, shingleK, numPerms, bands, maxBucket)
    val base = if (prededup) contentReps(docs, id, text) else docs
    // Materialized once: the signature feeds BOTH band-key candidate
    // generation and verification (and the table is joined twice) —
    // without the persist the O(perms·|text|) signature expression
    // would re-run per use.
    // shingle sets sorted ONCE per document (amortized over every
    // candidate pair the doc appears in) so per-pair verification is
    // a native merge walk, not a boxed hash-set build — see
    // SortedIntersectCount for the 100×-gate numbers behind this.
    val features = base
      .filter(length(lower(trim(col(text)))) >= shingleK)
      .select(col(id),
        minhashSignature(col(text), shingleK, np).as("sig"),
        array_sort(array_distinct(
          TextHash.shingle_hashes(lower(trim(col(text))), shingleK)))
          .as("shset"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = features
      .select(col(id), explode(array(
        bandKeyCols(col("sig"), np, bands): _*)).as("bh"))
      .groupBy(col("bh.band"), col("bh.band_hash"))
      .agg(cappedBucket(col(id), maxBucket).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(bucketPairs(col("ds"))).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()
    cand
      .join(features.select(col(id).as("d1"), col("sig").as("sig1"),
        col("shset").as("set1")), "d1")
      .join(features.select(col(id).as("d2"), col("sig").as("sig2"),
        col("shset").as("set2")), "d2")
      .select(col("d1"), col("d2"),
        estMatches(col("sig1"), col("sig2")).as("est_matches"),
        TextHash.sorted_intersect_count(col("set1"), col("set2")).as("shared"),
        size(col("set1")).cast("long").as("n1"),
        size(col("set2")).cast("long").as("n2"))
      .withColumn("jac_pm", expr("shared * 1000 div (n1 + n2 - shared)"))
  }

  /** Duplicate-cluster assignment: connected components over the
    * union of exact-duplicate edges (same content hash) and verified
    * MinHash near-dup edges (`jac_pm >= jacPm`). Every document gets
    * a cluster id = the smallest doc id reachable through duplicate
    * edges (singletons keep their own id), plus the cluster size —
    * the form a curation pipeline needs to keep one representative
    * per duplicate group when near-dup relations are transitive.
    *
    * Scale shape: the exact-duplicate relation is CONTRACTED before
    * the iterative part — every doc maps to its content-hash
    * representative (one window shuffle), near-dup edges are found
    * among representatives only (copies have identical shingle sets,
    * so rep edges carry the full relation), and min-label
    * propagation runs on that contracted graph. A duplicate-heavy
    * corpus therefore never enters the loop: a million copies are
    * one node. Expansion back to documents is a single equi-join.
    * The representative is the min id of its group, so the
    * contracted min-label equals the document-level min label.
    *
    * The loop itself: each iteration is one equi-join (frontier ⋈
    * adjacency) + one min-aggregation, run O(near-dup-cluster
    * diameter) times — shallow in practice — with a cheap
    * convergence count per step. (For adversarial deep-chain graphs
    * the same loop accepts an alternating small-star/large-star
    * rewrite; the join structure is identical.)
    */
  def dupClusters(docs: DataFrame, id: String, text: String,
      jacPm: Int = 500, algo: String = "minlabel",
      numPerms: Int = AutoPerms): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // One window pass computes the contraction map (doc -> rep) used
    // both to pick near-dup inputs and to expand labels at the end.
    val withRep = docs
      .select(col(id), col(text))
      .withColumn("__h", contentHash(col(text)))
      .withColumn("rep", min(col(id)).over(Window.partitionBy("__h")))
      .persist(lvl)
    val nearPairs = minhashVerifiedPairs(
        withRep.filter(col(id) === col("rep")), id, text,
        numPerms = numPerms, prededup = false)
      .filter(col("jac_pm") >= jacPm)
      .select("d1", "d2")
    val edges = nearPairs.distinct()
    val labels = (algo match {
      case "minlabel" => ccMinLabel(edges)
      case "star"     => ccSmallLargeStar(edges)
      case other => throw new IllegalArgumentException(
        s"unknown cc algo: $other (minlabel|star)")
    })._1
    // Expand contracted labels back to documents: a doc's cluster is
    // its rep's near-dup component label, or the rep itself when the
    // rep touches no near edge. The returned plan reads the (small)
    // converged label table and the contraction map, which stay
    // persisted — callers running many curation batches in one
    // session should clearCache between batches.
    withRep.select(col(id), col("rep"))
      .join(labels.withColumnRenamed("n", "rep"), Seq("rep"), "left")
      .select(col(id), coalesce(col("lbl"), col("rep")).as("cluster_id"))
      .withColumn("csize",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
  }

  /** Min-label propagation connected components. Input: undirected
    * edge list (d1, d2). Output: ((n, lbl) for every node touching an
    * edge — lbl = min node id of its component, left materialized by
    * an eager localCheckpoint for the caller's downstream join) plus
    * the scheduled-action count.
    *
    * Each action runs TWO lazy propagation rounds inside one count
    * job, so labels travel 2 hops per action: convergence needs
    * O(component diameter / 2) actions. Fine for real near-dup graphs
    * (contraction keeps them shallow); adversarial deep chains should
    * use [[ccSmallLargeStar]].
    */
  /** Eager localCheckpoint plus the RDD ids it registered. Iterative
    * CC loops use this to free a superseded round's checkpoint
    * storage deterministically: `Dataset.unpersist` only reaches
    * CacheManager entries, not checkpoint RDDs, and waiting for
    * ContextCleaner GC leaves O(rounds) materialized edge/label
    * copies live for the rest of the query (and past Bench's
    * per-query `clearCache`). Driver loops are single-threaded here
    * (forked sequential tests, sequential mains), so the id diff
    * captures exactly this checkpoint's RDDs.
    */
  private def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cp = df.localCheckpoint()
    // Keep only the checkpoint's own RDDs: the eager checkpoint
    // action can also be the FIRST materialization of an upstream
    // persisted dataset (e.g. ccMinLabel's adj), whose cache buffer
    // RDD then registers inside this diff window — freeing that id
    // later would silently evict the cache and turn every subsequent
    // round into a full recompute of the upstream plan. Checkpoint
    // RDDs are distinguishable at this point: the eager checkpoint
    // has materialized, so isCheckpointed is true for them and false
    // for plain cache buffers.
    val after = sc.getPersistentRDDs
    val ids = after.keySet.toSet.diff(before.toSet)
      .filter(id => after.get(id).exists(_.isCheckpointed))
    (cp, ids)
  }

  private def freeRdds(df: DataFrame, ids: Set[Int]): Unit = {
    val live = df.sparkSession.sparkContext.getPersistentRDDs
    ids.foreach(i => live.get(i).foreach(_.unpersist(blocking = false)))
  }

  private[graft] def ccMinLabel(edges: DataFrame): (DataFrame, Int) = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sess = edges.sparkSession
    val spDefault = sess.conf.get("spark.sql.shuffle.partitions")
    val adj = edges
      .unionByName(edges.select(col("d2").as("d1"), col("d1").as("d2")))
      .persist(lvl)
    var (labels, labelIds) = checkpointTracked(
      adj.select(col("d1").as("n")).distinct()
        .select(col("n"), col("n").as("lbl")))
    // One propagation round: neighbor-min with an improvement flag.
    def step(ls: DataFrame): DataFrame = {
      val nbrMin = adj.join(ls, adj("d2") === ls("n"))
        .groupBy(adj("d1").as("nn")).agg(min(col("lbl")).as("nlbl"))
      ls.join(nbrMin, ls("n") === nbrMin("nn"), "left")
        .select(ls("n"),
          least(ls("lbl"), coalesce(col("nlbl"), ls("lbl"))).as("lbl"),
          (coalesce(col("nlbl"), ls("lbl")) < ls("lbl")).as("chg"))
    }
    // Loop-scoped shuffle sizing from the measured adjacency count
    // (cached — the count reads the persist), the ccSmallLargeStar
    // rule: tiny iterative shuffles must not pay core-count tasks
    // per round. Restored in the finally.
    var changed = 1L
    var actions = 0
    try {
      sess.conf.set("spark.sql.shuffle.partitions",
        ccRoundPartitions(adj.count(), spDefault.toInt).toString)
      while (changed > 0) {
        // Two propagation rounds per scheduled action; a zero change
        // count on the second round is a fixpoint proof (a round
        // applied to already-converged labels changes nothing). Each
        // step references `labels` twice, so lineage would grow
        // geometrically over actions — the EAGER localCheckpoint
        // truncates the plan per action (it is also the action that
        // materializes both rounds; the change count then reads the
        // checkpointed partitions).
        val (next, nextIds) =
          checkpointTracked(step(step(labels).select("n", "lbl")))
        changed = next.filter(col("chg")).count()
        actions += 1
        // The superseded round's checkpoint is dead once `next` is
        // materialized — free it now instead of leaving it to GC.
        freeRdds(next, labelIds)
        labels = next.select("n", "lbl")
        labelIds = nextIds
      }
    } finally sess.conf.set("spark.sql.shuffle.partitions", spDefault)
    adj.unpersist()
    (labels, actions)
  }

  /** Alternating small-star/large-star connected components — the
    * O(log d) round variant for adversarial deep-chain duplicate
    * graphs (a boilerplate corpus where doc_i ~ doc_{i+1} builds a
    * path whose diameter is the corpus length; min-label propagation
    * would schedule O(diameter) Spark jobs, this schedules
    * O(log diameter)). Public-algorithm shape: Kiveris et al.,
    * "Connected Components in MapReduce and Beyond" (SOCC'14).
    *
    * Each round is two hash-partitioned groupBy+join passes over the
    * edge list — no per-node adjacency materialization beyond a
    * per-group MIN, so a high-degree star node costs one aggregation
    * group, not a posting list:
    *  - large-star: every node links its larger neighbors to the
    *    minimum of its closed neighborhood;
    *  - small-star: every node relinks its smaller-or-equal neighbors
    *    to that minimum.
    * The edge set converges to the star forest (node -> component
    * minimum); convergence is detected by an (edge count, xor of edge
    * hashes) signature going stable — one tiny aggregate per round on
    * data the round computed anyway.
    *
    * Output labels match [[ccMinLabel]] exactly: (n, lbl = component
    * min) for every node incident to an edge, persisted for the
    * caller's downstream join. Returns (labels, rounds).
    */
  /** Canonical star-CC edge orientation: (s, g) with s < g,
    * self-loops dropped, deduped. */
  private[graft] def ccCanon(e: DataFrame): DataFrame = e
    .select(least(col("s"), col("g")).as("s"), greatest(col("s"), col("g")).as("g"))
    .filter(col("s") =!= col("g"))
    .distinct()

  /** One large-star pass: every node links its larger neighbors to
    * the minimum of its closed neighborhood. Exposed at object level
    * (not nested in the loop) so the per-round physical plan is
    * inspectable on its own — see PLANS.md's star-CC section.
    */
  private[graft] def ccLargeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("s").as("u"), col("g").as("v"))
      .unionByName(e.select(col("g").as("u"), col("s").as("v")))
    val mins = sym.groupBy("u")
      .agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    ccCanon(sym.join(mins, "u").where(col("v") > col("u"))
      .select(col("m").as("s"), col("v").as("g")))
  }

  /** One small-star pass: every node relinks its smaller-or-equal
    * neighbors to its closed-neighborhood minimum. Edges arrive
    * oriented g -> s (g > s), so grouping happens at the larger end.
    */
  private[graft] def ccSmallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("g").agg(min(col("s")).as("m"))
    ccCanon(e.join(mins, "g")
      .select(col("m").as("s"), col("s").as("g"))
      .unionByName(mins.select(col("m").as("s"), col("g"))))
  }

  /** Shuffle-partition count for one star-CC round, derived from the
    * MEASURED edge count of the round's input (r17; the guide's
    * "make partitioning scale-adaptive — derive from input size").
    * The loop's per-round frames are usually tiny (near-dup edges
    * over content reps: thousands of rows at the tested SFs), but
    * every round runs ~4 hash exchanges whose task count follows
    * spark.sql.shuffle.partitions — at the session default (= core
    * count) the rounds pay pure scheduling overhead: d18 measured
    * 5.0 s at 32 partitions vs 2.6 s at 8 on IDENTICAL data
    * (the r16 verdict's "8-core bench beats 32-core" inversion).
    * ~64k edges per task keeps a round's task under ~10 ms of real
    * work; the session default stays the ceiling so a genuinely
    * large edge set keeps its parallelism.
    */
  private def ccRoundPartitions(edgeCount: Long, ceiling: Int): Int =
    math.max(1L, math.min(ceiling.toLong, edgeCount / 65536L + 1L)).toInt

  private[graft] def ccSmallLargeStar(edges0: DataFrame): (DataFrame, Int) = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sess = edges0.sparkSession
    val spDefault = sess.conf.get("spark.sql.shuffle.partitions")
    // (s, g) with s < g throughout; self-loops dropped. Each round
    // references the previous round's edge set several times (sym
    // doubles it, mins joins back onto it), so the logical plan would
    // grow exponentially in the round count if rounds merely stacked;
    // an EAGER localCheckpoint per round truncates lineage to the
    // materialized result — O(1) plan depth per round, and the
    // materialization doubles as the round's action (the signature
    // aggregate then reads the checkpointed partitions).
    var (edges, edgeIds) = checkpointTracked(
      ccCanon(edges0.select(col("d1").as("s"), col("d2").as("g"))))
    def signature(e: DataFrame): (Long, Long) = {
      // XOR, not SUM: full-range xxhash64 values overflow a long sum
      // under ANSI arithmetic; xor is closed over Long and order-free.
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(s, g))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var rounds = 0
    var sig = signature(edges)
    var converged = edges.isEmpty
    // Loop-scoped shuffle-partition override, sized per round from
    // the signature's edge count (already computed for convergence).
    // Session-level conf is restored in the finally; the loop is
    // driver-sequential, so nothing else plans under the override.
    try while (!converged) {
      sess.conf.set("spark.sql.shuffle.partitions",
        ccRoundPartitions(sig._1, spDefault.toInt).toString)
      val (next, nextIds) = checkpointTracked(ccSmallStar(ccLargeStar(edges)))
      rounds += 1
      val nextSig = signature(next)
      freeRdds(next, edgeIds)
      edges = next
      edgeIds = nextIds
      converged = nextSig == sig
      sig = nextSig
    } finally sess.conf.set("spark.sql.shuffle.partitions", spDefault)
    // Star forest: every edge is (component min, member). Roots label
    // themselves.
    val labels = edges.select(col("g").as("n"), col("s").as("lbl"))
      .unionByName(edges.select(col("s").as("n"), col("s").as("lbl")))
      .distinct()
      .persist(lvl)
    (labels, rounds)
  }

  /** LSH band hash of one signature band: base-31 fold of the band's
    * minhash rows seeded with the band number (so equal row values in
    * different bands never collide). Shared by the batch path
    * ([[minhashVerifiedPairs]]) and the persisted-index path
    * ([[buildIndex]]/[[incremental]]) — the incremental probe must
    * hash exactly like the index writer did.
    */
  private[graft] def bandKeyCols(sig: Column, numPerms: Int,
      bands: Int): Seq[Column] = {
    val rowsPerBand = numPerms / bands
    (0 until bands).map { b =>
      struct(lit(b).as("band"),
        aggregate(slice(sig, b * rowsPerBand + 1, rowsPerBand),
          lit(b.toLong), (acc, x) => (acc * 31 + x) % TextHash.P)
          .as("band_hash"))
    }
  }

  /** Signature agreement count — the estimated-Jaccard numerator out
    * of numPerms. Incremental verification runs on signatures alone
    * (the index does not store shingle sets; at corpus scale they
    * dwarf the 16-long signature and re-shipping them per batch
    * defeats the index).
    */
  private[graft] def estMatches(s1: Column, s2: Column): Column =
    size(filter(zip_with(s1, s2, (a, b) => a === b), x => x)).cast("long")

  /** Build the persisted dedup index a production training-data
    * pipeline dedups each new crawl snapshot against. Layout at
    * `indexDir` (all parquet, overwritten):
    *
    *   content/ (content_hash, keeper_id) — exact-identity map
    *   bands/   (band, band_hash, <id>)   — LSH posting lists over
    *            content representatives, capped at the `maxBucket`
    *            smallest ids per bucket INSIDE the aggregation
    *            ([[cappedBucket]]) so a boilerplate-heavy corpus
    *            cannot write an unbounded bucket
    *   sigs/    (<id>, sig)               — MinHash signatures of
    *            representatives, for probe-side verification
    *
    *   meta/    (shingle_k, num_perms, bands, max_bucket) — the
    *            banding parameters the index was written with.
    *            Probing MUST hash exactly like the writer did, so
    *            [[incremental]] reads its parameters from here; an
    *            auto-tuned build ([[AutoPerms]], the default)
    *            resolves once at build time and the choice travels
    *            with the index.
    *
    * Each table is one hash-partitioned pass; nothing is collected
    * to the driver. At 100 TB the index is just three bucketed
    * tables (plus one meta row) that later batches equi-join against.
    */
  def buildIndex(docs: DataFrame, id: String, text: String,
      indexDir: String, shingleK: Int = 8, numPerms: Int = AutoPerms,
      bands: Int = 4, maxBucket: Int = 512): Unit = {
    val np = resolvePerms(docs, id, text, shingleK, numPerms, bands, maxBucket)
    val s = docs.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    Seq((shingleK, np, bands, maxBucket))
      .toDF("shingle_k", "num_perms", "bands", "max_bucket")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/meta")
    // ONE content-hash window pass stages everything the three index
    // tables need — (content_hash, rep id, signature) per content
    // representative, ~(16+np)·8 bytes/row, text NOT staged. The
    // previous shape paid the corpus three times: exact()'s groupBy
    // for content, plus TWO contentReps window shuffles of the full
    // text column (bands and sigs each re-derived reps) with the
    // O(perms·|text|) signature computed twice. Now: one window
    // exchange, signatures once, and the derived tables read the
    // narrow staged file (r17; guide §2.4 — shared exchange).
    val stage = graft.engine.Scratch.dir("graft_dedup_build_")
    try {
      docs.select(col(id), col(text))
        .withColumn("__ch", contentHash(col(text)))
        .withColumn("__rep", min(col(id)).over(Window.partitionBy("__ch")))
        .filter(col(id) === col("__rep"))
        .select(col("__ch").as("content_hash"), col(id),
          when(length(lower(trim(col(text)))) >= shingleK,
            minhashSignature(col(text), shingleK, np)).as("sig"))
        .write.mode("overwrite").parquet(s"$stage/reps")
      val repsP = s.read.parquet(s"$stage/reps")
      // three independent derived tables over the staged file —
      // disjoint outputs, overlapped (guide §2.6)
      graft.engine.Parallel.run(
        () => repsP.select(col("content_hash"), col(id).as("keeper_id"))
          .write.mode("overwrite").parquet(s"$indexDir/content"),
        () => repsP.filter(col("sig").isNotNull)
          .select(col(id), explode(array(
            bandKeyCols(col("sig"), np, bands): _*)).as("bh"))
          .select(col(id), col("bh.band").as("band"),
            col("bh.band_hash").as("band_hash"))
          .groupBy("band", "band_hash")
          .agg(cappedBucket(col(id), maxBucket).as("ds"))
          .select(col("band"), col("band_hash"), explode(col("ds")).as(id))
          .write.mode("overwrite").parquet(s"$indexDir/bands"),
        () => repsP.filter(col("sig").isNotNull).select(col(id), col("sig"))
          .write.mode("overwrite").parquet(s"$indexDir/sigs"))
    } finally graft.engine.Scratch.delete(stage)
  }

  /** Append an ADMITTED batch to a persisted dedup index
    * ([[buildIndex]]) — the step that closes the MinHash family's
    * ingest loop (build → [[incremental]] → append → next batch),
    * the same seam [[appendSpanIndex]] and
    * [[graft.similarity.Similarity.appendIvfIndex]] close for the
    * span and embedding gates. `admitted` is the slice the caller
    * decided to ingest (typically the `kept` fate rows of
    * incremental's report joined back to the batch docs); the index
    * never re-derives fates.
    *
    * What lands (each table's delta staged to scratch before
    * anything writes to the index — the [[appendSpanIndex]]
    * crash-retry contract):
    *
    *   content/ — (content_hash, keeper_id): the batch's per-hash
    *              keepers, minus hashes the index already maps;
    *   sigs/    — signatures of the batch's content representatives
    *              (minus ids already present);
    *   bands/   — the representatives' band keys, capped in
    *              INGESTION order: a bucket already at `max_bucket`
    *              takes nothing, one with headroom takes the
    *              smallest new ids up to capacity. A from-scratch
    *              rebuild caps on globally smallest ids; append
    *              capping is ingestion-faithful (d46's "first is
    *              ingestion order" rule) — under-cap buckets, the
    *              overwhelming majority, are identical either way.
    *
    * Idempotent per table: every delta is an anti-join against its
    * OWN table (content by hash, sigs by id, bands by full key), so
    * a retry after any partial append converges — a table that
    * committed contributes an empty delta, one that did not is
    * re-staged, and no table ever gains duplicate rows. Banding
    * parameters come from the index meta (the d30 contract);
    * pre-meta legacy indexes refuse loudly.
    */
  def appendIndex(admitted: DataFrame, id: String, text: String,
      indexDir: String): Unit = {
    val s = admitted.sparkSession
    import org.apache.spark.sql.expressions.Window
    val (shK, np, nb, mb) = readIndexMeta(s, indexDir).getOrElse(
      throw new IllegalStateException(
        s"appendIndex: index at $indexDir carries no meta — pre-meta " +
          "legacy indexes cannot be appended to; rebuild with buildIndex"))
    val stage = graft.engine.Scratch.dir("graft_dedup_append_")
    try {
      // Re-using a tombstoned id is refused loudly: the id-keyed
      // sidecar would kill the NEW rows too, so the append would
      // appear ingested while staying dead. compactIndex re-arms the
      // id. (Same content under a FRESH id is the supported re-ingest
      // path — the live-view anti-joins below let it land.)
      val tomb = indexTombstones(s, indexDir, id)
      tomb.foreach { t =>
        val clash = admitted.select(col(id))
          .join(t, Seq(id), "left_semi").limit(1).count()
        if (clash > 0) throw new IllegalStateException(
          s"appendIndex: batch re-uses ids tombstoned at $indexDir — " +
            "run compactIndex first (folds removals out), then append")
      }
      // LIVE content view: a content_hash whose keeper was removed no
      // longer blocks re-ingesting that content under its new keeper
      // (the dead row stays physical until compaction; probes filter
      // it, so the hash resolving to two physical rows is benign).
      val liveContent = tomb match {
        case Some(t) => s.read.parquet(s"$indexDir/content")
          .join(t.toDF("keeper_id"), Seq("keeper_id"), "left_anti")
        case None => s.read.parquet(s"$indexDir/content")
      }
      // Defensive: drop representatives whose CONTENT is already
      // indexed before deriving the sig/band deltas. Callers normally
      // pass only kept rows, but an exact_index row slipping in would
      // otherwise land its sigs/bands under the NEW id (the per-table
      // anti-joins key on id / full band key, not content), double-
      // representing that content in the LSH tables forever.
      val reps = contentReps(admitted.select(col(id), col(text)), id, text)
        .withColumn("__ch", contentHash(col(text)))
        .join(liveContent
          .select(col("content_hash").as("__ch")), Seq("__ch"), "left_anti")
        .drop("__ch")
      reps.write.mode("overwrite").parquet(s"$stage/reps")
      val repsP = s.read.parquet(s"$stage/reps")

      exact(admitted, id, text).select("content_hash", "keeper_id")
        .join(liveContent.select("content_hash"),
          Seq("content_hash"), "left_anti")
        .write.mode("overwrite").parquet(s"$stage/content")

      repsP.filter(length(lower(trim(col(text)))) >= shK)
        .select(col(id), minhashSignature(col(text), shK, np).as("sig"))
        .join(s.read.parquet(s"$indexDir/sigs").select(col(id)),
          Seq(id), "left_anti")
        .write.mode("overwrite").parquet(s"$stage/sigs")

      // band delta: drop rows already present (retry convergence —
      // full-key anti-join against the RAW table so a retry can never
      // duplicate a physical row), then fill each bucket's remaining
      // capacity smallest-id-first. Capacity counts LIVE rows only:
      // tombstoned rows are invisible to probes, so they must not
      // hold bucket slots against new arrivals.
      val existing = s.read.parquet(s"$indexDir/bands")
      val liveExisting = tomb match {
        case Some(t) => existing.join(t, Seq(id), "left_anti")
        case None => existing
      }
      val fresh = lshBandsResolved(repsP, id, text, shK, np, nb)
        .join(existing, Seq("band", "band_hash", id), "left_anti")
      val room = liveExisting
        .join(fresh.select("band", "band_hash").distinct(),
          Seq("band", "band_hash"), "left_semi")
        .groupBy("band", "band_hash").agg(count(lit(1)).as("__n"))
      fresh
        .join(room, Seq("band", "band_hash"), "left")
        .withColumn("__n", coalesce(col("__n"), lit(0L)))
        .withColumn("__rk", row_number().over(
          Window.partitionBy("band", "band_hash").orderBy(col(id))))
        .filter(col("__rk") + col("__n") <= mb)
        .select(col("band"), col("band_hash"), col(id))
        .write.mode("overwrite").parquet(s"$stage/bands")

      s.read.parquet(s"$stage/content")
        .write.mode("append").parquet(s"$indexDir/content")
      s.read.parquet(s"$stage/sigs")
        .write.mode("append").parquet(s"$indexDir/sigs")
      s.read.parquet(s"$stage/bands")
        .write.mode("append").parquet(s"$indexDir/bands")
    } finally graft.engine.Scratch.delete(stage)
  }

  /** The MinHash index's tombstone sidecar `(<id>)` if any removal
    * has landed since the last [[compactIndex]] — column named like
    * the index's id column so joins read naturally.
    */
  private def indexTombstones(s: org.apache.spark.sql.SparkSession,
      indexDir: String, id: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val hasData = fs.exists(p) && fs.listStatus(p)
      .exists(_.getPath.getName.endsWith(".parquet"))
    if (hasData)
      Some(s.read.parquet(s"$indexDir/tombstones").toDF(id))
    else None
  }

  /** DELETE documents from a persisted MinHash dedup index
    * ([[buildIndex]]) by id — the takedown/opt-out action: a removed
    * document must stop matching future batches (its content is no
    * longer "already ingested", so a re-crawl of the same text gets
    * fate `kept` and is admitted fresh). Logical removal is
    * immediate — the ids land in a `tombstones/` sidecar that
    * [[incremental]] anti-joins out of all three probe tables
    * (content by keeper_id, bands and sigs by id) — and physical
    * removal is deferred to [[compactIndex]], the MinHash family's
    * analogue of the IVF drift rebuild.
    *
    * Idempotent: already-tombstoned ids are anti-joined out of the
    * delta (retry converges, no duplicate sidecar rows); removing an
    * id the index never held is a no-op. Staged to scratch before
    * anything writes under the index (the [[appendIndex]] contract).
    *
    * Re-USING a removed id in a later append is refused loudly by
    * [[appendIndex]] until a compaction folds the tombstone out
    * (the id-keyed tombstone would kill the new rows too);
    * re-ingesting the same CONTENT under a fresh id is the supported
    * path and needs no compaction — [[appendIndex]]'s anti-joins run
    * against the tombstone-filtered live view, so the content lands
    * under its new keeper while the dead row stays filtered.
    *
    * SIZE CONTRACT (r17): the sidecar is for TAKEDOWN-SIZED deltas —
    * a set every probe can anti-join broadcast (the [[incremental]]
    * reads hint it) and one task can write (`coalesce(1)`). Bulk
    * removal of a large corpus fraction should instead filter the
    * source and [[buildIndex]] fresh (the same full-rewrite cost a
    * mass removal fundamentally is), leaving no sidecar behind —
    * the IVF family's [[graft.similarity.Similarity.removeFromIvfIndex]]
    * documents the identical rule.
    */
  def removeFromIndex(ids: DataFrame, id: String, indexDir: String): Unit = {
    val s = ids.sparkSession
    val dead = ids.select(col(id)).distinct()
    val delta = indexTombstones(s, indexDir, id) match {
      case Some(t) => dead.join(t, Seq(id), "left_anti")
      case None => dead
    }
    val stage = graft.engine.Scratch.dir("graft_dedup_remove_")
    try {
      delta.write.mode("overwrite").parquet(s"$stage/delta")
      s.read.parquet(s"$stage/delta").coalesce(1)
        .write.mode("append").parquet(s"$indexDir/tombstones")
    } finally graft.engine.Scratch.delete(stage)
  }

  /** Fold tombstoned removals ([[removeFromIndex]]) OUT of the index
    * tables physically and clear the sidecar — run once removals
    * accumulate (the compaction half of the delete contract; probes
    * are already correct before it runs, this reclaims the bytes and
    * re-arms the removed ids for reuse).
    *
    * Staged and crash-safe in the [[buildSpanIndex]] swap style:
    * every table's compacted copy lands in scratch first, then swaps
    * into place by delete+rename, and the sidecar is deleted LAST —
    * a crash mid-swap leaves a mix of compacted and uncompacted
    * tables WITH the sidecar still present, so probes stay correct
    * (the anti-join filters whatever physical rows remain) and
    * re-running converges.
    */
  def compactIndex(s: org.apache.spark.sql.SparkSession, id: String,
      indexDir: String): Unit =
    indexTombstones(s, indexDir, id).foreach { tomb =>
      compactIndexResolved(s, id, indexDir, tomb)
    }

  private def compactIndexResolved(s: org.apache.spark.sql.SparkSession,
      id: String, indexDir: String, tomb: DataFrame): Unit = {
    val stage = graft.engine.Scratch.dir("graft_dedup_compact_")
    val conf = s.sessionState.newHadoopConf()
    try {
      s.read.parquet(s"$indexDir/content")
        .join(tomb.toDF("keeper_id"), Seq("keeper_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$stage/content")
      s.read.parquet(s"$indexDir/sigs")
        .join(tomb, Seq(id), "left_anti")
        .write.mode("overwrite").parquet(s"$stage/sigs")
      s.read.parquet(s"$indexDir/bands")
        .join(tomb, Seq(id), "left_anti")
        .write.mode("overwrite").parquet(s"$stage/bands")
      Seq("content", "sigs", "bands").foreach { t =>
        val live = new org.apache.hadoop.fs.Path(s"$indexDir/$t")
        val staged = new org.apache.hadoop.fs.Path(s"$stage/$t")
        val fs = live.getFileSystem(conf)
        fs.delete(live, true)
        if (!fs.rename(staged, live))
          throw new java.io.IOException(
            s"compactIndex: rename $staged -> $live failed")
      }
      val tp = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
      tp.getFileSystem(conf).delete(tp, true)
    } finally graft.engine.Scratch.delete(stage)
  }

  /** The banding parameters a persisted index was written with
    * ([[buildIndex]]'s meta table), or None for a pre-meta index.
    * Memoized per (session, path, meta-file fingerprint) — the same
    * metadata-caching contract as [[readSpanIndexMeta]]: buildIndex
    * overwrites meta (fingerprint changes), append/remove never
    * touch it.
    */
  private val indexMetaMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), (Int, Int, Int, Int)]

  private[graft] def readIndexMeta(s: org.apache.spark.sql.SparkSession,
      indexDir: String): Option[(Int, Int, Int, Int)] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/meta")
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val fp = fs.listStatus(p).sortBy(_.getPath.getName)
        .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
        .mkString("\n")
      val key = (System.identityHashCode(s).toString, indexDir, fp)
      val memoized = indexMetaMemo.get(key)
      if (memoized != null) return Some(memoized)
      val r = s.read.parquet(s"$indexDir/meta")
        .select("shingle_k", "num_perms", "bands", "max_bucket").head()
      val row = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      indexMetaMemo.put(key, row)
      Some(row)
    }
  }

  /** Dedup a new document batch against a persisted corpus index
    * ([[buildIndex]]) — the production incremental shape: the corpus
    * already ingested is represented only by its index tables, never
    * rescanned. Returns one row per batch document:
    *
    *   (<id>, fate, match_id) with fate ∈
    *     exact_index — content hash already in the index
    *     exact_batch — copy of a smaller-id batch document
    *     near_index  — LSH candidate vs the index, signature
    *                   agreement >= estMin of numPerms
    *     near_batch  — verified near-dup of a smaller-id batch rep
    *     kept        — none of the above (survivor to append)
    *
    * Precedence is that order; match_id is the matched document
    * (index keeper / smallest verified match), NULL for kept.
    *
    * Batch-internal near-dup semantics are set-based (a doc is
    * near_batch if it verifies against ANY smaller-id batch rep,
    * whether or not that rep itself survives) — the standard
    * order-free shape; sequential scan-order semantics would force
    * an O(batch) dependency chain.
    *
    * Scale shape: every step is an equi-join — content anti-join on
    * the 128-bit hash, band probes against pre-capped index posting
    * lists (bucket blowup bounded at index-build time), batch-side
    * pair generation through the same [[cappedBucket]] machinery as
    * [[minhashVerifiedPairs]]. No broadcast of the index is assumed
    * (it scales with the corpus, not the batch); signatures are
    * computed once per batch and persisted for reuse across the
    * probe and verify joins.
    *
    * Banding parameters come from the index's meta table (the probe
    * must hash exactly like the writer did): [[AutoPerms]] — the
    * default — adopts the stored parameters, and EXPLICIT parameters
    * that contradict a stored meta throw rather than silently probe
    * with mismatched hashes (every band key would miss, reporting
    * `kept` for every near-duplicate). A pre-meta index falls back
    * to the legacy 16/4 layout. `estMin < 0` (default) resolves to
    * half the resolved signature width — the same agreement
    * fraction at every selectivity.
    */
  def incremental(newDocs: DataFrame, id: String, text: String,
      indexDir: String, shingleK: Int = 8, numPerms: Int = AutoPerms,
      bands: Int = 4, maxBucket: Int = 512, estMin: Int = -1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = newDocs.sparkSession
    val meta = readIndexMeta(s, indexDir)
    val (shK, np, nb, mb) = meta match {
      case Some((mShK, mNp, mNb, mMb)) =>
        if (numPerms != AutoPerms &&
            (mShK, mNp, mNb) != (shingleK, numPerms, bands))
          throw new IllegalArgumentException(
            s"index at $indexDir was built with shingleK=$mShK numPerms=$mNp " +
              s"bands=$mNb but caller passed shingleK=$shingleK " +
              s"numPerms=$numPerms bands=$bands — probes would never match")
        (mShK, mNp, mNb, mMb)
      case None =>
        (shingleK, if (numPerms == AutoPerms) 16 else numPerms, bands, maxBucket)
    }
    val em = if (estMin < 0) np / 2 else estMin
    incrementalResolved(newDocs, id, text, indexDir, shK, np, nb, mb, em)
  }

  private def incrementalResolved(newDocs: DataFrame, id: String, text: String,
      indexDir: String, shingleK: Int, numPerms: Int,
      bands: Int, maxBucket: Int, estMin: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = newDocs.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Tombstoned removals ([[removeFromIndex]]) are dead to the
    // probe from the moment the sidecar lands: content by keeper,
    // bands and sigs by id. No-sidecar fast path keeps the
    // pre-tombstone plan bit-identical. Sidecar side HINTED broadcast
    // (r17): takedown-sized by the removeFromIndex contract, and an
    // estimate miss would otherwise re-shuffle the corpus-scale index
    // tables by id just to drop a handful of rows.
    val tomb = indexTombstones(s, indexDir, id)
    def liveById(df: DataFrame, idCol: String): DataFrame = tomb match {
      case Some(t) =>
        df.join(broadcast(t.toDF(idCol)), Seq(idCol), "left_anti")
      case None => df
    }
    val idxContent = liveById(
      s.read.parquet(s"$indexDir/content"), "keeper_id")
    val idxBands = liveById(s.read.parquet(s"$indexDir/bands"), id)
      .withColumnRenamed(id, "__old")
    val idxSigs = liveById(s.read.parquet(s"$indexDir/sigs"), id)
      .withColumnRenamed(id, "__old").withColumnRenamed("sig", "__osig")
    val withCh = newDocs.select(col(id), col(text))
      .withColumn("__ch", contentHash(col(text)))
      .persist(lvl)
    val exactIdx = withCh
      .join(idxContent, withCh("__ch") === idxContent("content_hash"))
      .select(col(id), col("keeper_id").as("m1"))
    // Batch docs whose content is NOT in the index: within-batch
    // exact dedup (min id keeps), survivors are the near-dup reps.
    // Materialized: exactBatch and reps both derive from it — the
    // index anti-join and the min-id window would otherwise run twice.
    val rest = withCh.join(
      idxContent.select(col("content_hash").as("__ch")), Seq("__ch"), "left_anti")
      .withColumn("__m", min(col(id)).over(Window.partitionBy("__ch")))
      .persist(lvl)
    val exactBatch = rest.filter(col(id) =!= col("__m"))
      .select(col(id), col("__m").as("m2"))
    val reps = rest.filter(col(id) === col("__m")).select(col(id), col(text))
    val repSigs = reps
      .filter(length(lower(trim(col(text)))) >= shingleK)
      .select(col(id),
        minhashSignature(col(text), shingleK, numPerms).as("sig"))
      .persist(lvl)
    val repBandRows = repSigs
      .select(col(id), explode(array(
        bandKeyCols(col("sig"), numPerms, bands): _*)).as("bh"))
      .select(col(id), col("bh.band").as("band"),
        col("bh.band_hash").as("band_hash"))
    // Probe the stored (capped) posting lists; verify on signatures.
    val nearIdx = repBandRows
      .join(idxBands, Seq("band", "band_hash"))
      .select(col(id), col("__old")).distinct()
      .join(repSigs, Seq(id))
      .join(idxSigs, Seq("__old"))
      .filter(estMatches(col("sig"), col("__osig")) >= estMin)
      .groupBy(col(id)).agg(min(col("__old")).as("m3"))
    // Batch-internal near-dup pairs: same capped-bucket pair
    // generation as minhashVerifiedPairs, verified on signatures.
    val batchPairs = repBandRows
      .groupBy("band", "band_hash")
      .agg(cappedBucket(col(id), maxBucket).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(bucketPairs(col("ds"))).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()
    val nearBatch = batchPairs
      .join(repSigs.select(col(id).as("d1"), col("sig").as("s1")), "d1")
      .join(repSigs.select(col(id).as("d2"), col("sig").as("s2")), "d2")
      .filter(estMatches(col("s1"), col("s2")) >= estMin)
      .groupBy(col("d2").as(id)).agg(min(col("d1")).as("m4"))
    withCh.select(col(id))
      .join(exactIdx, Seq(id), "left")
      .join(exactBatch, Seq(id), "left")
      .join(nearIdx, Seq(id), "left")
      .join(nearBatch, Seq(id), "left")
      .select(col(id),
        when(col("m1").isNotNull, "exact_index")
          .when(col("m2").isNotNull, "exact_batch")
          .when(col("m3").isNotNull, "near_index")
          .when(col("m4").isNotNull, "near_batch")
          .otherwise("kept").as("fate"),
        coalesce(col("m1"), col("m2"), col("m3"), col("m4")).as("match_id"))
  }

  /** Generalized-pigeonhole band combinations for SimHash candidate
    * generation (multi-index hamming search; public-algorithm shape:
    * Norouzi et al., "Fast Search in Hamming Space with Multi-Index
    * Hashing", CVPR'12): split the `bits`-bit signature into
    * nBands = 2·(maxDist+1) contiguous bands; a pair within
    * `maxDist` flips bits in at most maxDist bands, so at least
    * nBands − maxDist bands agree — the pair is GUARANTEED to
    * collide on at least one of the C(nBands, nBands−maxDist) band
    * combinations. Versus the classic (maxDist+1)-band split, the
    * composite key carries ~(1 − maxDist/nBands)·bits of
    * selectivity instead of bits/(maxDist+1): for 30 bits / dist 3
    * that is a ~2^19 key space instead of 2^7-2^8, which is what
    * keeps bucket occupancy — and with it the quadratic pair
    * expansion — flat as the corpus grows (measured at sf1.0: the
    * 4-band split saturated all 768 buckets at ~260 docs each,
    * 39M candidate pairs from 50k docs; the combination split's
    * buckets hold ~single docs). The price is C(nBands, kAgree)
    * (= 56 for dist 3) key rows per doc instead of maxDist+1 — a
    * constant emission factor traded for quadratic candidate decay.
    * Returns each combination's (bit-offset, width) segments.
    */
  private[graft] def simhashCombos(bits: Int, maxDist: Int): Seq[Seq[(Int, Int)]] = {
    val nBands = 2 * (maxDist + 1)
    val offs = (0 to nBands).map(b => b * bits / nBands)
    (0 until nBands).combinations(nBands - maxDist).toSeq
      .map(ids => ids.map(b => (offs(b), offs(b + 1) - offs(b))))
  }

  /** SimHash near-dup pairs: signatures over word 3-gram hashes
    * (single tokens saturate on shared vocabulary — 3-grams are
    * document-specific, so signatures spread); pairs within
    * `maxDist` hamming distance found via generalized-pigeonhole
    * combination banding ([[simhashCombos]]; exact — no recall loss
    * for dist <= maxDist).
    *
    * Same skew defenses as [[minhashVerifiedPairs]]: candidate
    * generation runs on content-hash representatives (`prededup`)
    * and each band bucket's posting list is capped at the
    * `maxBucket` smallest ids inside the aggregation; the hamming
    * distance is then computed by joining the signature table back
    * onto the distinct candidate pairs (signature evaluated once per
    * doc, shuffled bytes bounded per bucket).
    *
    * The signature table stays persisted after this returns — the
    * returned plan reads it on both join sides. Like
    * [[dupClusters]], batch callers running many corpora in one
    * session should `spark.catalog.clearCache()` between batches.
    */
  def simhashPairs(docs: DataFrame, id: String, text: String,
      bits: Int = 30, maxDist: Int = 3,
      prededup: Boolean = true, maxBucket: Int = 512): DataFrame = {
    val base = if (prededup) contentReps(docs, id, text) else docs
    val gramHashes = TextHash.word_gram_hashes(col(text), 3, distinct = false)
    // Materialized once: feeds band candidate generation and is
    // joined twice for verification.
    val sigs = base
      .select(col(id), TextHash.simhash(gramHashes, bits).as("sh"),
        size(gramHashes).as("__ng"))
      .filter(col("__ng") >= 1).drop("__ng")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // One composite key per band combination: concatenated bits of
    // the combination's segments. groupBy (band, band_bits) below is
    // then a ~2^19-bucket space for the 30-bit/dist-3 default.
    val bandCols = simhashCombos(bits, maxDist).zipWithIndex.map {
      case (segs, cid) =>
        val key = segs.foldLeft(lit(0L)) { case (acc, (off, w)) =>
          shiftleft(acc, w).bitwiseOR(
            shiftright(col("sh"), off).bitwiseAND(lit((1L << w) - 1)))
        }
        struct(lit(cid).as("band"), key.as("band_bits"))
    }
    val cand = sigs.select(col(id), explode(array(bandCols: _*)).as("bb"))
      .groupBy(col("bb.band"), col("bb.band_bits"))
      .agg(cappedBucket(col(id), maxBucket).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(bucketPairs(col("ds"))).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()
    cand
      .join(sigs.select(col(id).as("d1"), col("sh").as("sh1")), "d1")
      .join(sigs.select(col(id).as("d2"), col("sh").as("sh2")), "d2")
      .select(col("d1"), col("d2"),
        bit_count(col("sh1").bitwiseXOR(col("sh2"))).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Corpus-level duplicated-span removal — the C4/RefinedWeb "line
    * dedup" cleaning pass (C4 drops every repeated three-sentence
    * span but its first occurrence; RefinedWeb/Dolma do the same at
    * line grain). The synthetic corpus has no line structure, so the
    * span unit is `width` consecutive whitespace tokens
    * (non-overlapping); of all occurrences of a span across the WHOLE
    * corpus, only the first — minimum `(id, seg_idx)` — survives, and
    * each document is reassembled from its surviving spans in order.
    *
    * Returns one row per document: `n_spans`, `kept_spans`, and
    * `new_text_md5` (md5 of the space-joined surviving spans; empty
    * string when none survive) — the narrow shape keeps the output
    * checkable without shipping rebuilt text; production callers
    * wanting the text swap the final md5 for the `array_join` itself.
    *
    * Scale: the first-occurrence owner per span is a single
    * `groupBy(span_key).agg(min(struct(id, seg_idx)))` — a partial
    * (map-side) aggregation, so a boilerplate span repeated a billion
    * times collapses per-task before the shuffle, unlike a
    * row_number window over the span key (no partial agg, hot-key
    * partition). The mark-keepers join back on `span_key` is a plain
    * equi-join AQE skew-split handles, and the rebuild is one
    * combiner-friendly groupBy on the document id. Three
    * hash-partitioned shuffles total, no all-pairs step anywhere.
    */
  def spanDedup(docs: DataFrame, id: String, text: String,
      width: Int = 8): DataFrame = {
    require(width >= 1, s"span width must be >= 1, got $width")
    val keyed = spanSegments(docs, id, text, width)
    val firsts = keyed
      .groupBy("span_key")
      .agg(min(struct(col(id), col("seg_idx"))).as("__first"))
    spanRebuild(keyed.join(firsts, "span_key")
      .withColumn("keep",
        col(id) === col("__first")(id) &&
          col("seg_idx") === col("__first")("seg_idx")), id)
  }

  /** Shared segmentation of [[spanDedup]] and the incremental pair:
    * one `(id, seg_idx, span, span_key)` row per non-overlapping
    * `width`-token span (zero-shuffle posexplode expansion; the key
    * is the 128-bit md5 the owner aggregation groups on).
    */
  private def spanSegments(docs: DataFrame, id: String, text: String,
      width: Int): DataFrame =
    docs
      .select(col(id), split(trim(col(text)), "\\s+").as("__ws"))
      .select(col(id), col("__ws"),
        posexplode(sequence(lit(0), size(col("__ws")) - 1, lit(width))))
      .select(col(id), col("pos").cast("long").as("seg_idx"),
        array_join(slice(col("__ws"), col("col") + 1, lit(width)), " ")
          .as("span"))
      .withColumn("span_key", md5(col("span").cast("binary")))

  /** Shared per-document reassembly: input segment rows with a
    * boolean `keep`, output `(id, n_spans, kept_spans,
    * new_text_md5)` — one combiner-friendly groupBy on the doc id.
    */
  private def spanRebuild(marked: DataFrame, id: String): DataFrame =
    marked.groupBy(col(id))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("keep").cast("long")).as("kept_spans"),
        md5(array_join(
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("seg_idx"), col("span"))))),
            kv => kv.getField("span")),
          " ").cast("binary")).as("new_text_md5"))

  /** Build the persisted span index incremental span dedup probes
    * ([[spanDedupIncremental]]) — the d30 amortization split applied
    * to d39: real crawl pipelines do not re-run corpus-global span
    * dedup per snapshot; they dedup each NEW batch's spans against
    * everything already ingested. Layout at `indexDir` (rebuilt from
    * scratch, replacing any prior index there):
    *
    *   spans/ (span_key) — the DISTINCT md5 span keys of the
    *          ingested corpus. Membership is all the probe needs
    *          (any ingested occurrence beats every new one — see
    *          the ordering note on [[spanDedupIncremental]]), so the
    *          index is one 32-hex-char key per distinct span: far
    *          smaller than the corpus, written by one
    *          hash-partitioned distinct, never collected. Written
    *          BUCKETED by `span_key` (an external bucketed parquet
    *          table — Spark bucket file naming, re-attachable in any
    *          later session): the index side of every probe join
    *          reports its hash distribution from the file layout, so
    *          neither batch probes nor streaming micro-batch triggers
    *          re-shuffle the corpus-sized key set — only the (small)
    *          arrival side shuffles, into `buckets` partitions. At
    *          100 TB the index is the big side of the join; paying
    *          its shuffle once at build instead of per trigger is the
    *          difference between per-batch cost tracking the BATCH
    *          and tracking the CORPUS.
    *   meta/  (width, buckets) — the span grain and bucket count;
    *          the probe must segment exactly like the writer did, so
    *          it adopts these values and throws on a contradicting
    *          explicit width (the d30 contract: parameters travel
    *          with the index).
    *
    * Rebuild is STAGED (r14 — the direct drop-delete-write it
    * replaces destroyed the prior index before the new one existed):
    * the new bucketed table lands under a hidden stage path first,
    * then swaps into `spans/` by rename, and `meta/` is written LAST
    * — a crash before the swap leaves the prior index fully intact
    * (plus an orphaned stage dir the [[graft.engine.Scratch]] exit
    * sweep removes), and a probe can never see a meta row whose
    * spans/ has not landed ([[spanIndexKeys]] additionally refuses a
    * spans location with no data files). The one residual window — a
    * crash between the swap and the meta write, when the rebuild
    * CHANGED the width — leaves new keys under the old grain until
    * the rebuild is re-run; re-running converges.
    */
  def buildSpanIndex(docs: DataFrame, id: String, text: String,
      indexDir: String, width: Int = 8, buckets: Int = 32): Unit = {
    require(width >= 1, s"span width must be >= 1, got $width")
    require(buckets >= 1, s"bucket count must be >= 1, got $buckets")
    val s = docs.sparkSession
    import s.implicits._
    val tbl = spanTableName(indexDir)
    val stage = graft.engine.Scratch.dir("graft_span_build_")
    val stageTbl = s"${tbl}_stage"
    // 1. Build the new bucketed table into the stage path; the live
    //    index (if any) is untouched and still probe-able.
    s.sql(s"DROP TABLE IF EXISTS $stageTbl")
    spanSegments(docs, id, text, width)
      .select("span_key").distinct()
      .write
      .bucketBy(buckets, "span_key").sortBy("span_key")
      .option("path", s"$stage/spans")
      .format("parquet")
      .saveAsTable(stageTbl)
    s.sql(s"DROP TABLE IF EXISTS $stageTbl") // files stay; name freed
    // 2. Swap: catalog entry out, old files out, staged files in.
    s.sql(s"DROP TABLE IF EXISTS $tbl")
    val spansPath = new org.apache.hadoop.fs.Path(s"$indexDir/spans")
    val fs = spansPath.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(spansPath, true)
    fs.mkdirs(spansPath.getParent)
    if (!fs.rename(new org.apache.hadoop.fs.Path(s"$stage/spans"), spansPath))
      throw new java.io.IOException(
        s"buildSpanIndex: rename $stage/spans -> $spansPath failed")
    graft.engine.Scratch.delete(stage)
    // 3. Meta last: readers adopt the new grain only once its keys
    //    are fully in place.
    Seq((width, buckets)).toDF("width", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/meta")
    // 3b. A from-scratch rebuild derives from the LIVE corpus, so any
    //     tombstoned removals are already folded out of the new key
    //     set — clear the sidecar (after the meta commit: a crash
    //     earlier leaves the old index + sidecar intact and correct).
    Seq(s"$indexDir/tombstones", s"$indexDir/tombstones.next").foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
    }
    // 4. Re-declare the catalog table over the swapped files (same
    //    DDL path probes use to re-attach in a fresh session).
    //    Declare WITHOUT resolving: resolving here would cache this
    //    session's file listing, and appends from another session (a
    //    streaming loop's cloned micro-batch session) would then be
    //    invisible to this session's later probes.
    declareSpanTable(s, indexDir, tbl)
  }

  /** Append a new batch's surviving spans to a span index — after
    * admitting a batch, its kept spans are ingested too. One
    * distinct + anti-join pass; the index stays a set and stays
    * bucketed (the delta is inserted through the table API, so new
    * files carry bucket ids like the originals).
    *
    * Crash-safe by staging (r13 — the direct read-append this
    * replaces read `spans/` and appended to the same path inside one
    * job): the delta is MATERIALIZED to a scratch directory first,
    * so the anti-join's read of the index completes before anything
    * writes to the index location; the append job then reads only
    * the staged files. A crash mid-append leaves at worst a
    * partially visible delta — re-running the same batch converges
    * (already-visible keys drop out of the anti-join, missing ones
    * are re-staged; the key set never gains duplicates) — and a
    * crash before the append leaves the index untouched with only an
    * orphaned scratch dir, which the [[graft.engine.Scratch]] exit
    * sweep removes.
    */
  def appendSpanIndex(newDocs: DataFrame, id: String, text: String,
      indexDir: String): Unit = {
    val s = newDocs.sparkSession
    val width = readSpanIndexWidth(s, indexDir)
    val stage = graft.engine.Scratch.dir("graft_span_append_")
    try {
      val batchKeys = spanSegments(newDocs, id, text, width)
        .select("span_key").distinct()
      batchKeys.write.mode("overwrite").parquet(s"$stage/keys")
      val batchKeysP = s.read.parquet(s"$stage/keys")
      // Delta against the RAW key set (not the tombstone-filtered
      // view): the table is a set, and a tombstoned key is still
      // physically present — re-appending it would duplicate the row.
      batchKeysP
        .join(spanIndexKeysRaw(s, indexDir), Seq("span_key"), "left_anti")
        .write.mode("overwrite").parquet(s"$stage/delta")
      // REVIVE tombstoned keys this batch re-ingests: span keys are
      // content-addressed, so a new arrival carrying a removed span
      // means that content is ingested AGAIN and must suppress future
      // occurrences — the sidecar is rewritten minus the batch's keys
      // via the tombstones.next swap ([[spanIndexTombstones]] heals
      // the one residual rename window). Runs BEFORE the table
      // append: a crash between the two leaves the revived keys
      // already-physical and live (correct), and the staged delta's
      // missing keys re-stage on retry.
      spanIndexTombstones(s, indexDir).foreach { t =>
        val live = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
        val next = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones.next")
        val fs = live.getFileSystem(s.sessionState.newHadoopConf())
        fs.delete(next, true)
        t.join(batchKeysP, Seq("span_key"), "left_anti")
          .coalesce(1).write.parquet(s"$indexDir/tombstones.next")
        fs.delete(live, true)
        if (!fs.rename(next, live)) throw new java.io.IOException(
          s"appendSpanIndex: rename $next -> $live failed")
      }
      val buckets = readSpanIndexBuckets(s, indexDir)
      s.read.parquet(s"$stage/delta")
        .write.mode("append").format("parquet")
        .bucketBy(buckets, "span_key").sortBy("span_key")
        .saveAsTable(spanTableName(indexDir))
    } finally graft.engine.Scratch.delete(stage)
  }

  /** The bucketed key set of a span index, as a catalog-backed frame
    * (probes join against this; the bucketed scan's hash
    * distribution is what keeps the index side exchange-free). The
    * table name is a pure function of the index path, so any session
    * can re-attach an index built by another: if the catalog does
    * not know the table yet, it is (re)declared over the existing
    * bucketed files with the bucket spec from `meta/`.
    */
  def spanIndexKeys(s: org.apache.spark.sql.SparkSession,
      indexDir: String): DataFrame = {
    val raw = spanIndexKeysRaw(s, indexDir)
    // Tombstoned keys ([[removeFromSpanIndex]]) are dead to every
    // probe until a rebuild (or a re-ingesting append) revives or
    // folds them. No-sidecar fast path: the bucketed scan is the
    // whole plan, bit-identical to pre-tombstone — the anti-join
    // only appears while a sidecar exists, and the sidecar is
    // removal-sized, so it broadcasts.
    spanIndexTombstones(s, indexDir) match {
      case Some(t) => raw.join(broadcast(t), Seq("span_key"), "left_anti")
      case None => raw
    }
  }

  private def spanIndexKeysRaw(s: org.apache.spark.sql.SparkSession,
      indexDir: String): DataFrame = {
    val tbl = spanTableName(indexDir)
    if (!s.catalog.tableExists(tbl)) declareSpanTable(s, indexDir, tbl)
    else
      // The index is a SHARED artifact: another session (a streaming
      // ingest loop's cloned micro-batch session, another JVM) may
      // have appended since this session cached the table's file
      // listing. Refresh before resolving so probes always see the
      // current key set — one directory re-listing per probe, bounded
      // by the bucket file count, not the corpus.
      s.catalog.refreshTable(tbl)
    s.table(tbl).select("span_key")
  }

  /** The span index's tombstone sidecar `(span_key)`, completing a
    * crashed [[appendSpanIndex]] revive swap first (`tombstones`
    * absent, `tombstones.next` present → finish the rename — the
    * commitIvfMeta self-heal applied here, so the one residual
    * window of the rewrite cannot silently resurrect removals).
    */
  private def spanIndexTombstones(s: org.apache.spark.sql.SparkSession,
      indexDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    val next = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones.next")
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p) && fs.exists(next)) fs.rename(next, p)
    val hasData = fs.exists(p) && fs.listStatus(p)
      .exists(_.getPath.getName.endsWith(".parquet"))
    if (hasData)
      Some(s.read.parquet(s"$indexDir/tombstones").select("span_key"))
    else None
  }

  /** DELETE documents' spans from a persisted span index — the
    * takedown action at span grain. The index is CONTENT-addressed
    * (distinct span keys, no doc attribution), so removal takes the
    * removed documents' TEXT, derives their span keys under the
    * index's own width, and tombstones those keys: probes score them
    * novel again from the moment the sidecar lands, and the next
    * [[buildSpanIndex]] (a from-scratch rebuild over the live corpus)
    * folds them out physically and clears the sidecar.
    *
    * Shared-span caveat (documented semantics, not a defect): a key
    * the removed doc shares with a still-live doc is tombstoned too —
    * between removal and the next rebuild that span reads as novel,
    * which errs toward ADMITTING content, the right direction for a
    * takedown (the alternative — keep suppressing on the removed
    * doc's authority — is the behavior removals exist to end). The
    * rebuild, derived from live text, restores exact membership. A
    * later append that re-ingests the span also revives it exactly
    * ([[appendSpanIndex]] clears matching tombstones).
    *
    * Idempotent: the delta is anti-joined against the sidecar
    * (retries converge, no duplicate rows) and staged to scratch
    * before anything writes under the index.
    */
  def removeFromSpanIndex(docs: DataFrame, id: String, text: String,
      indexDir: String): Unit = {
    val s = docs.sparkSession
    val width = readSpanIndexWidth(s, indexDir)
    val dead = spanSegments(docs, id, text, width)
      .select("span_key").distinct()
    val delta = spanIndexTombstones(s, indexDir) match {
      case Some(t) => dead.join(t, Seq("span_key"), "left_anti")
      case None => dead
    }
    val stage = graft.engine.Scratch.dir("graft_span_remove_")
    try {
      delta.write.mode("overwrite").parquet(s"$stage/delta")
      s.read.parquet(s"$stage/delta").coalesce(1)
        .write.mode("append").parquet(s"$indexDir/tombstones")
    } finally graft.engine.Scratch.delete(stage)
  }

  /** Declare the catalog table over an existing span index's bucketed
    * files (no resolution, so nothing is cached in this session).
    */
  private def declareSpanTable(s: org.apache.spark.sql.SparkSession,
      indexDir: String, tbl: String): Unit = {
    val buckets = readSpanIndexBuckets(s, indexDir)
    // Refuse to declare a table over a location with no data files:
    // meta/ without spans/ is a half-built index (crash mid-rebuild),
    // and an empty external table would silently score every span
    // novel instead of failing.
    val spansPath = new org.apache.hadoop.fs.Path(s"$indexDir/spans")
    val fs = spansPath.getFileSystem(s.sessionState.newHadoopConf())
    val hasData = fs.exists(spansPath) &&
      fs.listStatus(spansPath).exists(st =>
        st.isFile && st.getLen > 0 && !st.getPath.getName.startsWith("_"))
    if (!hasData)
      throw new IllegalStateException(
        s"span index at $indexDir has meta but no span data files — " +
          "half-built index (crash mid-rebuild?); re-run buildSpanIndex")
    // LOCATION is a SQL string literal: ''-escape any quote in the
    // filesystem path rather than interpolating it raw.
    val loc = s"$indexDir/spans".replace("'", "''")
    s.sql(
      s"""CREATE TABLE $tbl (span_key STRING) USING PARQUET
         |CLUSTERED BY (span_key) SORTED BY (span_key)
         |INTO $buckets BUCKETS
         |LOCATION '$loc'""".stripMargin)
    ()
  }

  /** Drop the span index's catalog entry and delete its files —
    * callers that build a throwaway index (c27, specs) pair this
    * with their scratch-dir cleanup so session catalogs do not
    * accumulate one external table per invocation.
    */
  def deleteSpanIndex(s: org.apache.spark.sql.SparkSession,
      indexDir: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS ${spanTableName(indexDir)}")
    graft.engine.Scratch.delete(indexDir)
  }

  /** Deterministic catalog name for the index at `indexDir` (the
    * path IS the identity; md5 keeps it a valid identifier).
    */
  private def spanTableName(indexDir: String): String = {
    val canonical = new java.io.File(indexDir).getAbsolutePath
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    s"graft_span_idx_$h"
  }

  /** Span-index meta `(width, buckets?)`, memoized per (session,
    * path, meta-file fingerprint) — r17: every probe/append resolved
    * the one-row meta parquet as its own ~0.1 s Spark job, several
    * times per ingest epoch. The fingerprint (name/length/mtime of
    * the files under `meta/`) invalidates on rebuild (which
    * overwrites meta) and is untouched by appends — metadata caching
    * with file-level invalidation, same contract as the IVF meta
    * memo ([[graft.similarity.Similarity]]).
    */
  private val spanMetaMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), (Int, Option[Int])]

  private def readSpanIndexMeta(s: org.apache.spark.sql.SparkSession,
      indexDir: String): (Int, Option[Int]) = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/meta")
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val fp =
      if (!fs.exists(p)) ""
      else fs.listStatus(p).sortBy(_.getPath.getName)
        .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
        .mkString("\n")
    val key = (System.identityHashCode(s).toString, indexDir, fp)
    val memoized = spanMetaMemo.get(key)
    if (memoized != null) return memoized
    val df = s.read.parquet(s"$indexDir/meta")
    val row = (df.select("width").head().getInt(0),
      if (df.columns.contains("buckets"))
        Some(df.select("buckets").head().getInt(0))
      else None)
    spanMetaMemo.put(key, row)
    row
  }

  private def readSpanIndexWidth(s: org.apache.spark.sql.SparkSession,
      indexDir: String): Int = readSpanIndexMeta(s, indexDir)._1

  private def readSpanIndexBuckets(s: org.apache.spark.sql.SparkSession,
      indexDir: String): Int =
    readSpanIndexMeta(s, indexDir)._2.getOrElse {
      // pre-r13 indexes carry no bucket meta — their spans/ files are
      // unbucketed, which a bucket-spec'd table would silently
      // misread (bucket pruning against wrong file naming), so
      // refuse loudly
      throw new IllegalStateException(
        s"span index at $indexDir predates the bucketed layout " +
          "(no bucket meta) — rebuild it with buildSpanIndex")
    }

  /** Dedup a NEW batch's spans against a persisted span index
    * ([[buildSpanIndex]]) — same output shape as [[spanDedup]]
    * (`n_spans`, `kept_spans`, rebuilt-text md5 per batch document),
    * but the already-ingested corpus is represented ONLY by its
    * index: a span survives iff it is absent from the index AND this
    * occurrence is the batch-internal first owner (min `(id,
    * seg_idx)` within the batch — d39's rule applied to the batch).
    *
    * Ordering semantics: "first" is INGESTION order, not id order —
    * any indexed occurrence beats every new one regardless of ids
    * (what a crawl pipeline means by first). When every ingested id
    * precedes every batch id the result coincides with batch-global
    * [[spanDedup]] restricted to the batch (pinned in
    * SpanIndexSpec); with interleaved ids the incremental result is
    * the ingestion-faithful one.
    *
    * Scale shape: the batch-first owner is the same partial-agg
    * `min(struct)` as d39 (a boilerplate span repeated across the
    * whole batch collapses map-side); the index probe is a LEFT
    * equi-join of batch span keys against the `spans/` key set (AQE
    * skew-split territory, never a rescan of ingested text); the
    * rebuild is one combiner-friendly groupBy. `width = 0` (default)
    * adopts the index's grain; a non-zero width contradicting the
    * meta throws.
    */
  /** STREAMING-SAFE span-novelty probe of a persisted span index
    * ([[buildSpanIndex]]): per document, how much of its content is
    * NEW relative to the ingested corpus — `(id, n_spans,
    * novel_spans, novel_pm)` with `novel_pm = novel·1000 div total`.
    * The ingest-gate shape (c27): no batch-first rule, each arrival
    * is judged against the INDEX alone, so the result is
    * arrival-order independent and the identical plan — segment
    * (zero-shuffle generate) → LEFT equi-join against the static key
    * set → one per-doc aggregation — runs on a batch or streaming
    * frame (the aggregation is the single stateful operator). The
    * key set comes from the BUCKETED index table ([[spanIndexKeys]]):
    * its scan already carries the join's hash distribution, so only
    * the arrival side exchanges — per-trigger cost tracks the
    * micro-batch, not the ingested corpus.
    * Admission policy is the caller's predicate on `novel_pm`;
    * documents whose spans are mostly already ingested are the
    * boilerplate/recrawl suppression C4-style pipelines drop at
    * ingest. Width adopts the index meta ([[spanDedupIncremental]]'s
    * contract).
    */
  def spanNovelty(newDocs: DataFrame, id: String, text: String,
      indexDir: String): DataFrame = {
    val s = newDocs.sparkSession
    val width = readSpanIndexWidth(s, indexDir)
    val indexed = spanIndexKeys(s, indexDir)
      .select(col("span_key"), lit(true).as("__ingested"))
    spanSegments(newDocs, id, text, width)
      .join(indexed, Seq("span_key"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__ingested").isNull, 1L).otherwise(0L))
          .as("novel_spans"))
      .withColumn("novel_pm", expr("novel_spans * 1000 div n_spans"))
  }

  def spanDedupIncremental(newDocs: DataFrame, id: String, text: String,
      indexDir: String, width: Int = 0): DataFrame = {
    val s = newDocs.sparkSession
    val mWidth = readSpanIndexWidth(s, indexDir)
    if (width > 0 && width != mWidth)
      throw new IllegalStateException(
        s"spanDedupIncremental: index at $indexDir was built with " +
          s"width=$mWidth, caller expects $width — rebuild the index " +
          "or fix the caller")
    val keyed = spanSegments(newDocs, id, text, mWidth)
    val firsts = keyed
      .groupBy("span_key")
      .agg(min(struct(col(id), col("seg_idx"))).as("__first"))
    val indexed = spanIndexKeys(s, indexDir)
      .select(col("span_key"), lit(true).as("__ingested"))
    spanRebuild(keyed
      .join(firsts, "span_key")
      .join(indexed, Seq("span_key"), "left")
      .withColumn("keep",
        col("__ingested").isNull &&
          col(id) === col("__first")(id) &&
          col("seg_idx") === col("__first")("seg_idx")), id)
  }
}
