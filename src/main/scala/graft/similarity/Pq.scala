package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Similarity.{dot, norm2, toDouble}

/** Product quantization (PQ) with spherical sub-quantizers — the
  * memory-compression half of billion-scale similarity search
  * (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011; the spherical/cosine variant is the standard
  * adaptation for inner-product search over unit-norm embeddings).
  *
  * The vector space is split into `m` contiguous subspaces of
  * `subDim` components; each subspace trains its own `kc`-centroid
  * codebook with the SAME deterministic seeded one-Lloyd-step
  * machinery as the IVF coarse quantizer
  * ([[Similarity.kmeansCentroids]] — md5-seeded, cosine argmax
  * assignment with ties to the smallest centroid id, exact-BIGINT
  * milli-quantized means), so codes AND reconstructions are
  * bit-reproducible in any engine and the whole operator carries a
  * full SQL oracle — the encode is hash-exact, not just
  * recall-audited.
  *
  * Scale economics: an encoded vector is `m` small ints (4 bytes at
  * m=4) against `4·dim` bytes raw — 64× compression at dim=64. A
  * 10^9-vector index becomes a ~4 GB codes table: scans of the
  * encoded corpus read vec_id + codes ONLY (column pruning keeps the
  * raw embedding column untouched), reconstruction joins against
  * m·kc broadcast codebook rows, and asymmetric-distance (ADC)
  * scoring is a per-row fold with no shuffle until the final top-k.
  * Compose with IVF (route to lists, then ADC within the probed
  * lists) for the classic IVFADC layout; this module keeps the two
  * orthogonal.
  *
  * Totality rule shared with the oracle: vectors with a zero-norm
  * SLICE in any subspace are excluded up front (the spherical
  * assignment is undefined there), mirroring the zero-norm-vector
  * exclusion of every other similarity operator.
  */
object Pq {

  /** (vid, e) double-cast vector frame, restricted to vectors whose
    * every subspace slice has positive norm.
    */
  private[graft] def pqFrame(corpus: DataFrame, id: String, vec: String,
      m: Int, subDim: Int): DataFrame = {
    val allSlicesNonZero = (0 until m)
      .map(mi => norm2(slice(col("e"), mi * subDim + 1, subDim)) > 0)
      .reduce(_ && _)
    corpus
      .select(col(id).cast("long").as("vid"), toDouble(col(vec)).as("e"))
      .filter(allSlicesNonZero)
  }

  /** Train the `m` codebooks: one seeded-kmeans run per subspace over
    * the sliced frame. Returns (mi, cid, cv, cnrm) — at most `m·kc`
    * rows, a dim-class frame made for broadcast. The corpus
    * projection is persisted for the duration of the build only
    * (same contract as the IVF builder).
    */
  def trainCodebooks(corpus: DataFrame, id: String, vec: String,
      m: Int, subDim: Int, kc: Int): DataFrame = {
    val v = pqFrame(corpus, id, vec, m, subDim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val built = (0 until m).map { mi =>
        val vmi = v.select(col("vid"),
            slice(col("e"), mi * subDim + 1, subDim).as("v"))
          .withColumn("nrm", norm2(col("v")))
        Similarity.kmeansCentroids(vmi, kc)
          .select(lit(mi).as("mi"), col("cid"), col("cv"), col("cnrm"))
      }.reduce(_ unionAll _)
      // bounded: m·kc rows; materialize NOW (dim-table collect, the
      // litIndexCandidates contract) so the lazy consumers don't
      // re-run m kmeans builds per downstream action
      val rows = built.collect()
      v.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), built.schema)
    } finally v.unpersist()
  }

  /** Encode every vector to its `m` codes in ONE corpus pass: the
    * combined codebook (m·kc rows) broadcasts onto the vector frame,
    * each (vector, subspace) pair scores cosine map-side, and one
    * partial aggregation takes the per-subspace argmax (ties to the
    * smallest cid — [[Similarity.argmaxAssign]]'s rule). Output:
    * (vid, code0..code{m-1}).
    */
  def encode(corpus: DataFrame, id: String, vec: String,
      codebooks: DataFrame, m: Int, subDim: Int): DataFrame = {
    val v = pqFrame(corpus, id, vec, m, subDim)
    val sub = slice(col("e"), col("mi") * subDim + 1, lit(subDim))
    val scored = v.crossJoin(broadcast(codebooks))
      .select(col("vid"), col("mi"), struct(
        (dot(sub, col("cv")) / (norm2(sub) * col("cnrm"))).as("csim"),
        (-col("cid")).as("negc")).as("sc"))
    scored.groupBy("vid")
      .agg(
        max(when(col("mi") === 0, col("sc"))).as("b0"),
        (1 until m).map(mi =>
          max(when(col("mi") === mi, col("sc"))).as(s"b$mi")): _*)
      .select(col("vid") +:
        (0 until m).map(mi => (-col(s"b$mi.negc")).as(s"code$mi")): _*)
  }

  /** Reconstruction: concat of the coded centroid per subspace —
    * `m` broadcast joins against the (m·kc)-row codebook, reading
    * NOTHING but (vid, codes) from the encoded side. Returns
    * (vid, re) where re is the dim-length reconstructed vector.
    */
  def reconstruct(encoded: DataFrame, codebooks: DataFrame,
      m: Int): DataFrame = {
    val joined = (0 until m).foldLeft(encoded) { (acc, mi) =>
      acc.join(
        broadcast(codebooks.filter(col("mi") === mi)
          .select(col("cid").as(s"code$mi"), col("cv").as(s"r$mi"))),
        s"code$mi")
    }
    joined.select(col("vid"),
      concat((0 until m).map(mi => col(s"r$mi")): _*).as("re"))
  }

  /** IVFADC — the classic billion-scale composition (Jégou et al.
    * 2011 §IV): a coarse IVF quantizer routes each query to its
    * `nprobe` nearest inverted lists, and candidates inside the
    * probed lists are scored by ADC over their PQ codes. Memory AND
    * compute sublinearity compose: the probe touches
    * ~nprobe/kcCoarse of the corpus, and what it touches is
    * m-byte codes, not raw vectors.
    *
    * Shares the totality rule and every deterministic kernel with
    * [[trainCodebooks]]/[[adcTopK]] — coarse centroids, codes,
    * reconstructions, and ADC scores are all bit-reproducible, so
    * the WHOLE composition carries a SQL oracle (coarse chain +
    * m sub-chains). Scale shape: coarse centroids and codebooks are
    * dim-class collects; assignment is one map-side argmax pass; the
    * probe is an equi-join on cid with the ranked probe set derived
    * from the (broadcast) query side — no corpus self-join, no
    * window over anything corpus-sized until the per-query top-k.
    */
  def ivfAdcTopK(queries: DataFrame, corpus: DataFrame, id: String,
      vec: String, m: Int, subDim: Int, kc: Int, kcCoarse: Int = 0,
      nprobe: Int = 0, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = pqFrame(corpus, id, vec, m, subDim)
    val vv = v.select(col("vid"), col("e").as("v"))
      .withColumn("nrm", norm2(col("v")))
    // ONE persisted corpus projection serves the sizing count AND all
    // m+1 quantizer builds, collected in ONE job (r17; the previous
    // shape persisted the corpus twice — once here for the coarse
    // chain, once inside trainCodebooks for the sub-chains — and ran
    // two collect jobs). kcCoarse = 0 → the deployed sqrtKc policy
    // over the PQ-valid corpus (the frame the quantizer trains on).
    val (coarseRows, cbs, kcC) = {
      val c = vv.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val kcC = if (kcCoarse > 0) kcCoarse else Similarity.sqrtKc(c.count())
        val coarse = Similarity.kmeansCentroids(c, kcC)
          .select(lit(-1).as("mi"), col("cid"), col("cv"), col("cnrm"))
        val subs = (0 until m).map { mi =>
          val vmi = c.select(col("vid"),
              slice(col("v"), mi * subDim + 1, subDim).as("v"))
            .withColumn("nrm", norm2(col("v")))
          Similarity.kmeansCentroids(vmi, kc)
            .select(lit(mi).as("mi"), col("cid"), col("cv"), col("cnrm"))
        }
        val built = (coarse +: subs).reduce(_ unionAll _)
        val rows = built.collect()
        val all = vv.sparkSession.createDataFrame(
          java.util.Arrays.asList(rows: _*), built.schema)
        (all.filter(col("mi") === -1).select("cid", "cv", "cnrm"),
          all.filter(col("mi") >= 0), kcC)
      } finally c.unpersist()
    }
    val np = if (nprobe > 0) nprobe else Similarity.adaptiveNprobe(kcC)
    // FUSED single-pass assignment (r17): coarse cid and the m PQ
    // codes are all per-row argmaxes against broadcast dim tables —
    // computed in ONE corpus pass with ONE partial-agg exchange
    // (coarse rows tagged mi = -1 score the full vector, sub rows the
    // slice; CaseWhen evaluates only the taken branch). The previous
    // shape ran TWO corpus passes (argmaxAssign + encode, one
    // exchange each) and then JOINED them vid-to-vid — a third and
    // fourth corpus exchange at the probe. Expressions and tie rules
    // are bit-identical to argmaxAssign/encode (same dot, same
    // (csim, -cid) struct max), so results are unchanged.
    val sub = slice(col("v"), col("mi") * subDim + 1, lit(subDim))
    val score = when(col("mi") === -1,
        dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
      .otherwise(dot(sub, col("cv")) / (norm2(sub) * col("cnrm")))
    val scored = vv.crossJoin(broadcast(coarseRows
        .select(lit(-1).as("mi"), col("cid"), col("cv"), col("cnrm"))
        .unionAll(cbs)))
      .select(col("vid"), col("mi"),
        struct(score.as("csim"), (-col("cid")).as("negc")).as("sc"))
    val fused = scored.groupBy("vid")
      .agg(max(when(col("mi") === -1, col("sc"))).as("bc"),
        (0 until m).map(mi =>
          max(when(col("mi") === mi, col("sc"))).as(s"b$mi")): _*)
      .select(col("vid") +: (-col("bc.negc")).as("cid") +:
        (0 until m).map(mi => (-col(s"b$mi.negc")).as(s"code$mi")): _*)
    // reconstruction rides the fused frame (broadcast codebook joins,
    // keeping the coarse cid column alongside re)
    val withRe = (0 until m).foldLeft(fused) { (acc, mi) =>
        acc.join(
          broadcast(cbs.filter(col("mi") === mi)
            .select(col("cid").as(s"code$mi"), col("cv").as(s"r$mi"))),
          s"code$mi")
      }
      .select(col("vid"), col("cid"),
        concat((0 until m).map(mi => col(s"r$mi")): _*).as("re"))
    val q = pqFrame(queries, id, vec, m, subDim)
      .select(col("vid").as("q_id"), col("e").as("qe"))
      .withColumn("qnrm", norm2(col("qe")))
    val probes = q.crossJoin(broadcast(
        coarseRows.select(col("cid"), col("cv"), col("cnrm"))))
      .withColumn("crk", row_number().over(
        Window.partitionBy("q_id").orderBy(
          (dot(col("qe"), col("cv")) / (col("qnrm") * col("cnrm"))).desc,
          col("cid"))))
      .filter(col("crk") <= np)
      .select("q_id", "qe", "qnrm", "cid")
    probes.join(withRe, "cid")
      .filter(col("vid") =!= col("q_id"))
      .select(col("q_id"), col("vid").as("n_id"),
        (dot(col("qe"), col("re")) / (col("qnrm") * norm2(col("re"))))
          .as("adc_cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("adc_cos").desc, col("n_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "n_id", "adc_cos")
  }

  /** IVFADC+R — the re-ranked refinement of [[ivfAdcTopK]] (Jégou
    * et al. 2011 §V "re-ranking with source coding"): the coarse
    * route + ADC scan produce a SHORTLIST of `kShort` candidates per
    * query, and only those candidates are re-scored by EXACT cosine
    * over their raw vectors before the final top-`k` cut. This is
    * the standard recall-restoring tail: ADC ordering errors (the
    * quantization noise of m·log2(kc)-bit codes) are confined to the
    * shortlist boundary, and the refinement pays exact-vector I/O
    * for kShort rows per query instead of a corpus scan.
    *
    * Scale shape: the shortlist (n_queries × kShort rows of two ids)
    * is the dim-class side — it BROADCASTS onto the corpus vector
    * table, so the refinement join reads only (vid, vec) columns and
    * prunes corpus-side rows inside the join (the Spark analogue of
    * the paper's random-access raw-vector fetch). Every kernel below
    * the re-rank is [[ivfAdcTopK]]'s bit-reproducible machinery and
    * the re-rank itself is the d9 exact-cosine fold, so the WHOLE
    * composition still carries a SQL oracle — shortlist chain + one
    * refinement join.
    */
  def ivfAdcRerank(queries: DataFrame, corpus: DataFrame, id: String,
      vec: String, m: Int, subDim: Int, kc: Int, kcCoarse: Int = 0,
      nprobe: Int = 0, kShort: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shortlist = ivfAdcTopK(queries, corpus, id, vec, m, subDim,
        kc, kcCoarse, nprobe, kShort)
      .select(col("q_id"), col("n_id"))
    val v = pqFrame(corpus, id, vec, m, subDim)
    val q = pqFrame(queries, id, vec, m, subDim)
      .select(col("vid").as("q_id"), col("e").as("qe"),
        norm2(col("e")).as("qnrm"))
    // (shortlist ⋈ queries) is nq·kShort rows — the broadcast side;
    // the corpus vector table streams through the hash join reading
    // (vid, vec) only, with non-shortlisted rows dropped at the join
    val shortQ = shortlist.join(q, "q_id")
    v.select(col("vid").as("n_id"), col("e").as("ne"),
        norm2(col("e")).as("nnrm"))
      .join(broadcast(shortQ), "n_id")
      .select(col("q_id"), col("n_id"),
        (dot(col("qe"), col("ne")) / (col("qnrm") * col("nnrm"))).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("cos").desc, col("n_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "n_id", "cos")
  }

  /** Asymmetric-distance top-k: raw queries against the RECONSTRUCTED
    * corpus. The query set is the dim-class side (broadcast); the
    * corpus side is the codes table + codebook joins — the raw
    * embedding column of the corpus is never read. Ties break on
    * (adc_cos DESC, n_id), the d9/d19 rule.
    */
  def adcTopK(queries: DataFrame, encoded: DataFrame, codebooks: DataFrame,
      id: String, vec: String, m: Int, subDim: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = pqFrame(queries, id, vec, m, subDim)
      .select(col("vid").as("q_id"), col("e").as("qe"))
    val recon = reconstruct(encoded, codebooks, m)
    recon.join(broadcast(q), col("vid") =!= col("q_id"))
      .select(col("q_id"), col("vid").as("n_id"),
        (dot(col("qe"), col("re")) /
          (norm2(col("qe")) * norm2(col("re")))).as("adc_cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("adc_cos").desc, col("n_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "n_id", "adc_cos")
  }
}
