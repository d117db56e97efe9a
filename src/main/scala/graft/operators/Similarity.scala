package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Scale design: the brute-force path is one narrow scan with a
  * codegen'd fold per row (no explode, no shuffle except the final top-k,
  * which TakeOrdered handles in O(k) per partition). The ANN path buckets
  * vectors by random-hyperplane signs (8-bit LSH) so the candidate join is
  * an equi-join on bucket — at 10^9 vectors the probe touches ~1/256 of
  * the corpus per bucket, and bucket assignment is embarrassingly parallel.
  *
  * Determinism: float math is done on ×10^6 floor-scaled integers, so any
  * engine (the DuckDB oracle included) reproduces dot products and cosine
  * ranks bit-for-bit; hyperplane signs are md5-derived from (plane, dim)
  * indices — no RNG state.
  */
object Similarity {

  val Dim = 64
  val Scale = 1000000.0

  /** (score, index) packing for in-row argmin/top-k: `score · 2^21 + idx`
    * is monotone in (score, idx) while idx < 2^21, so a primitive long
    * min/min-k replaces a struct comparator. |score| ≤ ~10^6 (scaled
    * cosine), so the product stays ≤ ~2^43 — no overflow. Bounds the
    * centroid fan-in at 2^21 cells.
    */
  private val IdxFactor = 1L << 21
  private val IdxMask = (1L << 21) - 1

  /** Element scaled to an exact integer: floor(x · 10^6). */
  private def sInt(x: Column): Column =
    floor(x.cast("double") * lit(Scale)).cast("long")

  /** Exact scaled dot product of two float-array columns — the native
    * fused-loop Catalyst expression (graft.plans.GraftFunctions); the
    * declarative twin below is its semantic spec.
    */
  def scaledDot(a: Column, b: Column): Column =
    graft.plans.GraftFunctions.scaledDot(a, b)

  /** Declarative twin of [[scaledDot]] (higher-order built-ins only):
    * allocates a zipped array and runs two lambdas per element — kept as
    * the reference implementation VectorExpressionsSpec checks the native
    * expression against.
    */
  def scaledDotDeclarative(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => sInt(x) * sInt(y)), lit(0L), (acc, v) => acc + v)

  /** Scaled cosine: floor(10^6 · dot / (‖a‖·‖b‖)), all from exact ints. */
  def cosineScaled(a: Column, b: Column): Column =
    floor(lit(Scale) * scaledDot(a, b).cast("double") /
      (sqrt(scaledDot(a, a).cast("double")) * sqrt(scaledDot(b, b).cast("double"))))
      .cast("long")

  /** Brute-force top-k by cosine against one query vector (broadcast
    * cross join of a single row — no shuffle of the corpus).
    */
  def bruteForceTopK(embeddings: DataFrame, query: DataFrame, k: Int): DataFrame =
    embeddings.crossJoin(broadcast(query.select(col("embedding").as("qv"))))
      .select(col("vec_id"), cosineScaled(col("embedding"), col("qv")).as("cos_scaled"))
      .orderBy(col("cos_scaled").desc, col("vec_id").asc)
      .limit(k)

  /** Deterministic ±1 hyperplane signs: sign(plane j, dim i) from
    * md5("j_i") — identical to the SQL twin
    * ('0x'||substr(md5(j||'_'||i),1,2))::INT % 2.
    */
  def hyperplaneSigns(numPlanes: Int = 8): Array[Array[Int]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, Dim) { (j, i) =>
      val hex = md.digest(s"${j}_${i + 1}".getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString
      if (Integer.parseInt(hex, 16) % 2 == 1) 1 else -1
    }
  }

  /** LSH bucket id (0..2^planes-1) for an embedding column: bit j set iff
    * the scaled dot with hyperplane j is positive. The sign vectors are
    * array literals — the whole bucket assignment stays inside whole-stage
    * codegen with zero joins.
    */
  def lshBucket(emb: Column, numPlanes: Int = 8): Column = {
    val signs = hyperplaneSigns(numPlanes)
    (0 until numPlanes).map { j =>
      val signArr = array(signs(j).map(s => lit(s.toLong)): _*)
      val dot = aggregate(zip_with(emb, signArr, (x, s) => sInt(x) * s), lit(0L), (a, v) => a + v)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN top-k: restrict to the query's LSH bucket, then exact cosine. */
  def annTopK(embeddings: DataFrame, query: DataFrame, k: Int, numPlanes: Int = 8): DataFrame = {
    val bucketed = embeddings.withColumn("bucket", lshBucket(col("embedding"), numPlanes))
    val q = query.select(col("embedding").as("qv"),
      lshBucket(col("embedding"), numPlanes).as("qbucket"))
    bucketed.join(broadcast(q), col("bucket") === col("qbucket"))
      .select(col("vec_id"), col("bucket"),
        cosineScaled(col("embedding"), col("qv")).as("cos_scaled"))
      .orderBy(col("cos_scaled").desc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF (inverted-file) ANN: partition the corpus into Voronoi cells
    * around deterministic centroids (every `centroidEvery`-th vector —
    * reproducible without iterative k-means), assign each vector to its
    * max-cosine centroid, and at query time probe only the `nProbe`
    * nearest cells with the exact ranking.
    *
    * Scale shape: assignment is a broadcast cross join of the (tiny)
    * centroid set against the corpus with the native scaled_dot per pair —
    * embarrassingly parallel, one pass; the probe reads |corpus|·nProbe/C
    * vectors. The cell table would be written once and reused across
    * queries in production.
    */
  def ivfAssignments(embeddings: DataFrame, centroidEvery: Int, numPlanes: Int = 0): DataFrame = {
    val centroids = embeddings.where(col("vec_id") % centroidEvery === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    // one-row centroid array, broadcast: assignment is then a PURE
    // PROJECTION — the in-row argmin over C struct scores replaces the
    // former n·C exploded rows through a window exchange (at 1M vectors
    // × 10k cells that exchange is 10^10 rows; this plan shuffles none).
    // min of (-ccos, cid) == the window's (ccos DESC, cid ASC) head.
    val centsArr = centroids
      .agg(collect_list(struct(col("cid"), col("cemb"))).as("cents"))
    embeddings.crossJoin(broadcast(centsArr))
      .select(col("vec_id"), col("embedding"),
        array_min(transform(col("cents"), c =>
          struct((-cosineScaled(col("embedding"), c.getField("cemb"))).as("negccos"),
            c.getField("cid").as("cid"))))
          .getField("cid").as("cell"))
  }

  /** Lloyd's k-means over scaled-integer embeddings, engine-exact: seeds
    * are every `seedEvery`-th vector (deterministic init), each
    * iteration reassigns by max scaled cosine (ties → smaller cid) and
    * recomputes centroids as element-wise integer means (`sum div
    * count`). All arithmetic is BIGINT, so a SQL oracle unrolling the
    * same iterations reproduces assignments bit-for-bit — this closes
    * the "IVF centroids are every-Nth, not k-means" fixture caveat.
    *
    * Scale shape: per iteration, elements ⋈ centroid-elements is an
    * equi-join on the dim index with the (tiny) centroid relation
    * broadcast — n·C·d work, embarrassingly parallel; the centroid
    * update is one map-side-combined aggregate over n·d rows. Returns
    * the final (vec_id, cell) assignment.
    */
  def kmeansAssignments(embeddings: DataFrame, seedEvery: Int,
      iters: Int): DataFrame = {
    // scaled elements as an ARRAY per vector with its norm precomputed:
    // each corpus×centroid pair then costs ONE zip_with dot (n·C fused
    // loops) instead of 64 exploded join rows (n·C·d shuffle input) —
    // the same values, 64× fewer rows through the aggregate
    val embArr = embeddings.select(col("vec_id"),
        expr("transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT))")
          .as("xa"))
      .withColumn("xnrm", graft.plans.GraftFunctions.longDot(col("xa"), col("xa")))
      .cache()

    // in-row argmin (r6): the C centroid structs ride as ONE broadcast
    // array row (cid-ASCENDING, so packed index order == cid order), and
    // reassignment is a PROJECTION over embArr — the former window path
    // shuffled n·C scored rows per Lloyd round (at 1M vectors × 244
    // cells that exchange alone is 244M rows). Each (negccos, idx) packs
    // into one monotone long, so min packed == the window's (ccos DESC,
    // cid ASC) head; the per-centroid dot is the native long_dot fused
    // loop (the interpreted zip_with twin measured 226s for 3 rounds at
    // 1M×64-d — the lambda overhead WAS the runtime). Packing bounds C
    // at 2^21 centroids — far above any Lloyd fan-in this engine runs.
    def withCell(centArr: DataFrame): DataFrame = {
      val centsArr = centArr
        .agg(sort_array(collect_list(struct(col("cid"), col("ca"), col("cnrm"))))
          .as("cents"))
      val packed = transform(col("cents"), (c, i) =>
        (-floor(lit(1000000.0) *
            graft.plans.GraftFunctions.longDot(col("xa"), c.getField("ca"))
              .cast("double") /
            (sqrt(col("xnrm").cast("double")) *
              sqrt(c.getField("cnrm").cast("double"))))
          .cast("long")) * lit(IdxFactor) + i.cast("long"))
      embArr.crossJoin(broadcast(centsArr))
        .withColumn("cell",
          element_at(col("cents"),
            array_min(packed).bitwiseAND(lit(IdxMask)).cast("int") + 1)
            .getField("cid"))
    }
    def assign(centArr: DataFrame): DataFrame =
      withCell(centArr).select(col("vec_id"), col("cell"))
    // (cid, ca, cnrm) from element rows — used for updated centroids
    def toArr(cent: DataFrame): DataFrame =
      cent.groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(i, c))), s -> s.c)").as("ca"))
        .withColumn("cnrm", graft.plans.GraftFunctions.longDot(col("ca"), col("ca")))

    var centArr = embArr.where(col("vec_id") % seedEvery === 0)
      .select(col("vec_id").as("cid"), col("xa").as("ca"), col("xnrm").as("cnrm"))
    var it = 0
    while (it < iters) {
      // centroid update: cell attaches IN the assignment projection, so
      // the element explode needs no join back to an assignment relation
      // (the former el ⋈ asg shuffled n·d + n rows per round — 65M rows
      // at 1M×64-d); the groupBy partials map-combine to C·d per task,
      // so the only per-round shuffle is O(C·d·partitions) rows.
      // eager checkpoint per round: C rows of centroid state — keeps each
      // Lloyd iteration ONE pass (a lazy chain would re-run every prior
      // assign inside the next) and bounds lineage depth for any `iters`
      centArr = toArr(withCell(centArr)
        .select(col("cell"), posexplode(col("xa")))
        .groupBy(col("cell").as("cid"), (col("pos") + 1).as("i"))
        .agg(expr("sum(col) div count(1)").as("c")))
        .localCheckpoint(true)
      it += 1
    }
    // materialize the final assignment off the cache, then release it —
    // the (vec_id, cell) map must not pin the scaled corpus in executor
    // storage after the call (the Ranks cache contract)
    try assign(centArr).localCheckpoint(true)
    finally embArr.unpersist(false)
  }

  /** IVF multi-probe candidate pairs — the default kNN base for
    * neighborhood operators (q470 LOF): every vector is indexed into its
    * `nProbe` nearest cells (deterministic centroids, every
    * `centroidEvery`-th vector), and candidate pairs are cell-mates.
    * Pair count follows Σ|cell|² ≈ n²·nProbe²/C — the n²/C shape that
    * replaces brute force; the only cross join is corpus × centroids.
    * Returns directed (qid, cid) pairs, deduplicated across shared cells.
    *
    * `maxCell` is the vector twin of [[Dedup.minhashCandidates]]'
    * `maxBucket` — the 100 TB safety valve for a DEGENERATE cell: skewed
    * embedding distributions crowd one centroid (near-duplicate corpora,
    * zero-vector sinks), and that cell's self-join alone is |cell|²
    * pairs. With a cap, oversized cells emit hub-star edges instead
    * (min vec_id ↔ each member, kept symmetric in the directed pair
    * convention): volume turns linear while every member stays reachable
    * from the cell's hub, which is what downstream neighborhood /
    * clustering consumers need. Default None preserves the exact
    * cell-mate semantics.
    */
  def ivfCandidatePairs(embeddings: DataFrame, centroidEvery: Int,
      nProbe: Int, maxCell: Option[Int] = None): DataFrame = {
    val emb = embeddings.withColumn("__nrm",
      scaledDot(col("embedding"), col("embedding")))
    val cent = emb.where(col("vec_id") % centroidEvery === 0)
      .select(col("vec_id").as("ccid"), col("embedding").as("cemb"),
        col("__nrm").as("cnrm0"))
    // in-row multi-probe (r6): pack each centroid's (negccos, idx) into
    // one monotone long and take the native k-smallest — the former
    // window path materialized n·C rows into a vec_id exchange before
    // rn <= nProbe could drop them (240 GB of shuffle at 1M×10k), and
    // the first in-row cut (array_sort over C structs + slice) still
    // paid O(C log C) boxed struct comparisons per row, which at
    // 1M×10k-cells was the whole assignment (and OOM'd the 1M
    // ScaleCheck). min_k_long is one primitive O(C·nProbe) insertion
    // pass. cents is ccid-ASCENDING (sort_array on the struct sorts by
    // the leading field), so packed index order == ccid order and the
    // k smallest packed == (ccos DESC, ccid ASC) head — same cells as
    // the sort+slice twin, bit for bit. Nothing leaves the row until
    // the nProbe cell ids explode.
    val centsArr = cent
      .agg(sort_array(collect_list(struct(col("ccid"), col("cemb"), col("cnrm0"))))
        .as("cents"))
    // The assignment feeds BOTH sides of the cell self-join, and Spark
    // plans the two sides as independent subtrees (no ReusedExchange —
    // the per-side aliases defeat canonicalized reuse), so without a cut
    // the n·C centroid scoring runs TWICE. The assignment itself is tiny
    // (nProbe rows/vector, two longs each — 32 MB at 1M vectors):
    // materialize it once; the self-join then reads the materialized
    // relation on both sides. Eager like kmeansAssignments' result — the
    // call-time cost IS the scoring pass.
    val asg = probeAssignments(emb, centsArr, nProbe)
    cellMatePairs(asg, maxCell)
  }

  /** Directed cell-mate pairs over a materialized (vec_id, cell)
    * assignment, with the optional hub-star escape for cells above
    * `maxCell` — shared by [[ivfCandidatePairs]] and the capped arm of
    * [[ivfIncrementalPairs]]' spec twin. One tiny aggregate sizes every
    * cell and picks its hub; the size rides back as a column so the
    * dense/star split is a filter over the already-materialized
    * assignment, never a rescan of the corpus.
    */
  private def cellMatePairs(asg: DataFrame, maxCell: Option[Int]): DataFrame =
    maxCell match {
      case None =>
        asg.select(col("vec_id").as("qid"), col("cell"))
          .join(asg.select(col("vec_id").as("cid"), col("cell")), "cell")
          .where(col("qid") =!= col("cid"))
          .select("qid", "cid").distinct()
      case Some(cap) =>
        val stats = asg.groupBy("cell")
          .agg(count(lit(1)).as("csz"), min("vec_id").as("hub"))
        val sized = asg.join(stats, Seq("cell"))
        val dense = sized.where(col("csz") <= cap)
          .select(col("vec_id").as("qid"), col("cell")).as("x")
          .join(sized.where(col("csz") <= cap)
            .select(col("vec_id").as("cid"), col("cell")).as("y"), "cell")
          .where(col("qid") =!= col("cid"))
          .select("qid", "cid")
        val members = sized.where(col("csz") > cap && col("vec_id") =!= col("hub"))
        val star = members.select(col("hub").as("qid"), col("vec_id").as("cid"))
          .unionAll(members.select(col("vec_id").as("qid"), col("hub").as("cid")))
        dense.unionAll(star).distinct()
    }

  /** In-row multi-probe cell assignment shared by [[ivfCandidatePairs]]
    * and [[ivfIncrementalPairs]]: each vector's nProbe nearest cells via
    * packed-long min-k over the broadcast centroid array (see the plan
    * rationale in ivfCandidatePairs). Input needs (vec_id, embedding,
    * __nrm); output (vec_id, cell), eagerly materialized.
    */
  private def probeAssignments(emb: DataFrame, centsArr: DataFrame,
      nProbe: Int): DataFrame = {
    val packed = transform(col("cents"), (c, i) =>
      (-floor(lit(1000000.0) *
          scaledDot(col("embedding"), c.getField("cemb")).cast("double") /
          (sqrt(col("__nrm").cast("double")) *
            sqrt(c.getField("cnrm0").cast("double"))))
        .cast("long")) * lit(IdxFactor) + i.cast("long"))
    emb.crossJoin(broadcast(centsArr))
      .select(col("vec_id"),
        explode(transform(
          graft.plans.GraftFunctions.minKLong(packed, lit(nProbe)),
          p => element_at(col("cents"),
              p.bitwiseAND(lit(IdxMask)).cast("int") + 1)
            .getField("ccid"))).as("cell"))
      .localCheckpoint(true)
  }

  /** Incremental IVF candidates: a NEW shard of vectors probes an
    * EXISTING corpus's cell index — the vector twin of
    * [[graft.operators.Dedup.incrementalCandidates]]. Centroids and the
    * index assignment come from the index corpus alone (in production
    * the (vec_id, cell) map is the pre-materialized IVF index; here it
    * rebuilds deterministically), the shard assigns against those same
    * centroids, and candidates are shard×index cell-mates plus
    * shard×shard cell-mates — index×index is never re-paired, so admit
    * cost follows |shard|·nProbe, not Σ|cell|² over the corpus. Returns
    * directed (qid, cid): qid ∈ shard; cid ∈ index ∪ shard, qid ≠ cid.
    * vec_ids must be disjoint between the sides.
    *
    * `maxCell` caps a degenerate cell exactly like [[ivfCandidatePairs]]:
    * cell sizes are measured over index ∪ shard (at scale the index
    * side's counts are one aggregate over the pre-materialized
    * (vec_id, cell) relation — index metadata, no embedding read), and an
    * oversized cell emits only its hub-star edges restricted to the
    * qid-∈-shard convention — identical to the capped full-corpus
    * candidates restricted to shard queries, which the spec pins.
    */
  def ivfIncrementalPairs(indexEmb: DataFrame, shardEmb: DataFrame,
      centroidEvery: Int, nProbe: Int, maxCell: Option[Int] = None): DataFrame = {
    val cents = ivfCentroids(indexEmb, centroidEvery)
    ivfIncrementalPairsIndexed(ivfIndex(indexEmb, cents, nProbe), cents,
      shardEmb, nProbe, maxCell)
  }

  /** Deterministic IVF centroid relation (ccid, cemb, cnrm0) — every
    * `centroidEvery`-th vector with its scaled self-dot. Tiny (C rows);
    * in production this is persisted index METADATA alongside the
    * (vec_id, cell) relation, so a probe never touches corpus
    * embeddings.
    */
  def ivfCentroids(emb: DataFrame, centroidEvery: Int): DataFrame =
    emb.where(col("vec_id") % centroidEvery === 0)
      .select(col("vec_id").as("ccid"), col("embedding").as("cemb"),
        scaledDot(col("embedding"), col("embedding")).as("cnrm0"))

  /** The PERSISTABLE index relation: (vec_id, cell) over the `nProbe`
    * nearest centroids — exactly what [[ivfIncrementalPairs]] derives
    * internally, exposed so a corpus writes it once (partitioned by
    * cell) and every later shard probes the on-disk relation.
    * MaterializedIvfIndexSpec proves probe-from-disk identity.
    */
  def ivfIndex(emb: DataFrame, centroids: DataFrame, nProbe: Int): DataFrame =
    probeAssignments(
      emb.withColumn("__nrm", scaledDot(col("embedding"), col("embedding"))),
      centroids.agg(sort_array(
        collect_list(struct(col("ccid"), col("cemb"), col("cnrm0")))).as("cents")),
      nProbe)

  /** IVF index MAINTENANCE — the vector twin of
    * [[graft.operators.Dedup.appendBands]]: the admitted shard's cell
    * assignments (against the SAME frozen centroid metadata) append to
    * the persisted (vec_id, cell) relation. Assignment is per-vector, so
    * the appended relation is EXACTLY `ivfIndex` over index ∪ shard
    * with the index's centroids — probing it with the next shard is
    * identical to probing a from-scratch rebuild, which
    * MaterializedIvfIndexSpec proves through a disk round-trip (the
    * production append is a cell-partition-local parquet append; no
    * existing file is rewritten). q610 runs the full vector ingestion
    * loop through this append.
    */
  def ivfIndexAppend(indexAsg: DataFrame, centroids: DataFrame,
      shardEmb: DataFrame, nProbe: Int): DataFrame =
    indexAsg.select("vec_id", "cell")
      .unionAll(ivfIndex(shardEmb, centroids, nProbe))

  /** [[ivfIncrementalPairs]] against a PRE-MATERIALIZED index: the
    * (vec_id, cell) relation and the centroid metadata come in as
    * relations (from disk in production — no index embedding is ever
    * read); only the shard assigns fresh.
    */
  def ivfIncrementalPairsIndexed(indexAsg: DataFrame, centroids: DataFrame,
      shardEmb: DataFrame, nProbe: Int, maxCell: Option[Int] = None): DataFrame = {
    val idxAsg = indexAsg
    val shdAsg = ivfIndex(shardEmb, centroids, nProbe)
    maxCell match {
      case None =>
        val probe = shdAsg.select(col("vec_id").as("qid"), col("cell"))
          .join(idxAsg.select(col("vec_id").as("cid"), col("cell")), "cell")
          .select("qid", "cid")
        val intra = shdAsg.select(col("vec_id").as("qid"), col("cell"))
          .join(shdAsg.select(col("vec_id").as("cid"), col("cell")), "cell")
          .where(col("qid") =!= col("cid"))
          .select("qid", "cid")
        probe.unionAll(intra).distinct()
      case Some(cap) =>
        // cell size + hub over BOTH sides; the hub's side rides along via
        // the struct min (vec_ids are disjoint, so min struct = min id)
        val tagged = idxAsg.withColumn("side", lit(0))
          .unionAll(shdAsg.withColumn("side", lit(1)))
        // eager cut: stats is O(cells) rows, and leaving it as an
        // aggregate-over-self-joined-union trips Catalyst's
        // union-constraint rewrite downstream (key-not-found on the
        // shared vec_id attribute)
        val stats = tagged.groupBy("cell")
          .agg(count(lit(1)).as("csz"),
            min(struct(col("vec_id"), col("side"))).as("mh"))
          .select(col("cell"), col("csz"),
            col("mh.vec_id").as("hub"), col("mh.side").as("hub_side"))
          .localCheckpoint(true)
        val denseShd = shdAsg.join(stats.where(col("csz") <= cap), Seq("cell"))
        val probe = denseShd.select(col("vec_id").as("qid"), col("cell"))
          .join(idxAsg.select(col("vec_id").as("cid"), col("cell")), "cell")
          .select("qid", "cid")
        val intra = denseShd.select(col("vec_id").as("qid"), col("cell"))
          .join(denseShd.select(col("vec_id").as("cid"), col("cell")), "cell")
          .where(col("qid") =!= col("cid"))
          .select("qid", "cid")
        // oversized: shard member → hub, and (only when the hub itself is
        // a shard vector) hub → every member — the qid-∈-shard restriction
        // of the full capped hub-star
        val over = tagged.join(stats.where(col("csz") > cap), Seq("cell"))
          .where(col("vec_id") =!= col("hub"))
        val s1 = over.where(col("side") === 1)
          .select(col("vec_id").as("qid"), col("hub").as("cid"))
        val s2 = over.where(col("hub_side") === 1)
          .select(col("hub").as("qid"), col("vec_id").as("cid"))
        // eager cut BEFORE their union: star volume is linear by
        // construction (that is the point of the cap), and unioning the
        // two aliased self-join branches directly trips Catalyst's
        // union-constraint rewrite (alias constraints referencing the
        // projected-away hub/vec_id attributes)
        val star = s1.localCheckpoint(true).unionAll(s2.localCheckpoint(true))
        probe.unionAll(intra).unionAll(star).distinct()
    }
  }

  /** IVF top-k for one query vector: probe the query's nProbe nearest
    * cells, exact scaled-cosine rank within.
    */
  def ivfTopK(embeddings: DataFrame, query: DataFrame, k: Int,
      centroidEvery: Int, nProbe: Int): DataFrame = {
    val assigned = ivfAssignments(embeddings, centroidEvery)
    val centroids = embeddings.where(col("vec_id") % centroidEvery === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val probeCells = query.select(col("embedding").as("qv"))
      .crossJoin(broadcast(centroids))
      .select(col("qv"), col("cid"), cosineScaled(col("qv"), col("cemb")).as("ccos"))
      .orderBy(col("ccos").desc, col("cid").asc)
      .limit(nProbe)
    assigned.join(broadcast(probeCells), col("cell") === col("cid"))
      .select(col("vec_id"), col("cell"),
        cosineScaled(col("embedding"), col("qv")).as("cos_scaled"))
      .orderBy(col("cos_scaled").desc, col("vec_id").asc)
      .limit(k)
  }

  /** SemDeDup-style semantic dedup: vectors are clustered into IVF cells
    * (deterministic centroids), and within each cell a vector is REMOVED
    * iff some smaller-id cell-mate has cosine ≥ `minCosScaled` with it.
    * Returns per-vector (vec_id, cell, removed). The pairwise step is
    * cell-local — cost follows Σ|cell|², never corpus², and cells are
    * independent tasks; the pruned corpus is the `removed = false` side.
    *
    * `maxCell` is this family's 100 TB valve — BOUNDED-PREFIX
    * verification: each vector verifies against only its cell's `cap`
    * SMALLEST-id members (the canonical keepers — removal already means
    * "a smaller id covers you", so the small-id end of the cell is
    * where the decision lives). For every cell at or under the cap the
    * prefix IS the full smaller-id set — capped ≡ exact, spec-pinned in
    * SemDedupCapSpec; an oversized cell does cap·|cell| work instead of
    * |cell|², exactly linear where near-duplicate corpora crowd one
    * centroid (the distribution SemDeDup is FOR — there the prefix
    * holds the keepers and every later near-dup still matches them).
    * Capped removals are always a SUBSET of exact removals (the x-side
    * only shrinks): the cap never over-prunes, it can only admit extra
    * survivors in an oversized mixed cell. The prefix itself comes from
    * the native bounded-heap top-k-per-group operator — O(cap) state
    * per cell, no |cell|-row window sort.
    */
  def semDedup(embeddings: DataFrame, centroidEvery: Int, minCosScaled: Long,
      maxCell: Option[Int] = None): DataFrame = {
    val asg = ivfAssignments(embeddings, centroidEvery)
    val removed = cellPrefix(asg, maxCell).as("x").join(asg.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .where(cosineScaled(col("x.embedding"), col("y.embedding")) >= minCosScaled)
      .select(col("y.vec_id").as("vec_id")).distinct()
      .withColumn("__rm", lit(true))
    asg.select("vec_id", "cell")
      .join(removed, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"), coalesce(col("__rm"), lit(false)).as("removed"))
  }

  /** Cluster-balanced diversity sampling — the quota COMPLEMENT of
    * [[semDedup]]: instead of removing near-duplicates within a cell,
    * keep a fixed per-cell quota (the `perCell` smallest-id members of
    * every IVF cell), so every region of embedding space is represented
    * and no crowded region dominates the sample — the cluster-sampling
    * shape of diversity-driven data selection. Deterministic (id-prefix
    * quota, no RNG); one bounded-heap pass (native top-k-per-group)
    * after the assignment projection — no |cell|-row window sort, no
    * corpus self-join at all. Returns (vec_id, cell) for the kept
    * sample.
    */
  def clusterSample(embeddings: DataFrame, centroidEvery: Int,
      perCell: Int): DataFrame =
    cellPrefix(ivfAssignments(embeddings, centroidEvery), Some(perCell))
      .select("vec_id", "cell")

  /** The SemDeDup verification prefix: each cell's `cap` smallest-id
    * members (everything when uncapped) — the x-side of the removal
    * join. Shared by [[semDedup]], [[semDedupIncremental]] and
    * [[clusterSample]] so all three arms bound with the same semantics.
    */
  private def cellPrefix(asg: DataFrame, maxCell: Option[Int]): DataFrame =
    maxCell match {
      case None => asg
      case Some(cap) =>
        graft.plans.GraftFunctions.topKPerGroup(
          asg, Seq("cell"), "vec_id", cap, descending = false)
    }

  /** Incremental SemDeDup — the admission DECISION consumer of the
    * incremental vector machinery: a NEW shard vector is REMOVED iff
    * some smaller-id cell-mate (an index vector, or an earlier shard
    * member) has cosine ≥ `minCosScaled`; exactly
    * `semDedup(index ∪ shard)` restricted to shard ids (shard ids must
    * exceed index ids and avoid the centroid residue, the standard
    * ingestion fixture invariants). Cells come from the INDEX corpus's
    * centroids — in production the pre-materialized (vec_id, cell) map —
    * and index×index is never re-paired: admit cost follows
    * |shard| · cell occupancy. Returns (vec_id, cell, removed) for the
    * shard.
    *
    * `maxCell` applies [[semDedup]]'s bounded-prefix cap with the prefix
    * measured over index ∪ shard — identical to
    * `semDedup(index ∪ shard, cap)` restricted to shard ids
    * (SemDedupCapSpec pins it); at scale the prefix of a persisted index
    * cell is itself persistable metadata (cap rows per cell), so an
    * oversized cell costs cap·|shard∩cell| per ingest, never
    * |cell|·|shard∩cell|.
    */
  def semDedupIncremental(indexEmb: DataFrame, shardEmb: DataFrame,
      centroidEvery: Int, minCosScaled: Long,
      maxCell: Option[Int] = None): DataFrame = {
    val cents = ivfCentroids(indexEmb, centroidEvery)
    semDedupIncrementalIndexed(ivfIndex(indexEmb, cents, 1), cents,
      indexEmb, shardEmb, minCosScaled, maxCell)
  }

  /** [[semDedupIncremental]] against a PRE-MATERIALIZED (vec_id, cell)
    * index relation and its centroid metadata — the admission twin of
    * [[ivfIncrementalPairsIndexed]]: a composition that also appends to
    * the same index (q610's ingestion loop) scores the corpus against
    * the centroids ONCE and feeds both the admission decision and the
    * maintenance append, instead of each operator re-running the
    * corpus × centroids assignment pass internally (at 100 TB that pass
    * is the expensive leg; from disk in production it is already a plain
    * scan). Identical output to [[semDedupIncremental]] — it IS its back
    * half (SemDedupCapSpec pins the arm).
    */
  def semDedupIncrementalIndexed(indexAsg: DataFrame, centroids: DataFrame,
      indexEmb: DataFrame, shardEmb: DataFrame, minCosScaled: Long,
      maxCell: Option[Int] = None): DataFrame = {
    val cents = centroids
    val idxA = indexAsg.select("vec_id", "cell")
      .join(indexEmb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
    val shdA = ivfIndex(shardEmb, cents, 1)
      .join(shardEmb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
    // ONE aliased self-join against the unioned x-side (the capped-arm
    // pattern): unioning the aliased hit branches instead crashes
    // Catalyst's union-constraint rewrite — even checkpointed, LogicalRDD
    // origin constraints still reference the projected-away join attrs.
    // Capped arm only: restrict the prefix input to cells the SHARD
    // touches first (broadcast semi-join on the shard's tiny cell set) —
    // cells without a shard member can't witness any decision, and
    // without the cut the bounded-heap prefix would still stream
    // cap-per-cell rows for EVERY index cell into its exchange
    // (decision-identical either way; the uncapped arm's plain join
    // already prunes untouched cells inside the hash probe)
    val xAll0 = idxA.unionAll(shdA)
    val xAll = cellPrefix(
      if (maxCell.isEmpty) xAll0
      else xAll0.join(broadcast(shdA.select("cell").distinct()),
        Seq("cell"), "left_semi"),
      maxCell)
    val removed = shdA.as("y").join(xAll.as("x"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .where(cosineScaled(col("x.embedding"), col("y.embedding")) >= minCosScaled)
      .select(col("y.vec_id").as("vec_id")).distinct()
      .withColumn("__rm", lit(true))
    shdA.select("vec_id", "cell")
      .join(removed, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"),
        coalesce(col("__rm"), lit(false)).as("removed"))
  }

  /** Recall@k audit of the LSH ANN against the exact brute force, per
    * query vector: hits = |ANN top-k ∩ exact top-k|, recall in permille.
    *
    * Scale shape: the exact ground truth inherently needs a full
    * corpus × queries pass, so the audit runs it ONCE (broadcast query
    * set, native scaled_dot per pair) and ranks both candidate sets from
    * that single pass with the native bounded-heap top-k-per-group
    * operator — never a per-query global sort. The ordering key packs
    * (cosine, ¬vec_id) into one long so ties break toward the smaller id,
    * matching every other ranking in the engine.
    */
  def annRecall(embeddings: DataFrame, queries: DataFrame, k: Int,
      numPlanes: Int = 8): DataFrame = {
    import org.apache.spark.sql.graftshims.TopKApi
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"),
      lshBucket(col("embedding"), numPlanes).as("qbucket"))
    val scored = embeddings
      .withColumn("bucket", lshBucket(col("embedding"), numPlanes))
      .crossJoin(broadcast(q))
      .select(col("qid"), col("vec_id"),
        cosineScaled(col("embedding"), col("qv")).as("cs"),
        (col("bucket") === col("qbucket")).as("in_bucket"))
      // pack (cos, ¬vec_id) into one ordering long: cos ≤ 10^6 in
      // magnitude, vec_id < 2^32 ⇒ |ord| < 2^52
      .withColumn("ord", col("cs") * lit(4294967296L) + (lit(4294967295L) - col("vec_id")))
    // ONE pass over the corpus×queries scores: top-k per (qid, in_bucket)
    // collapses the expensive side to ≤ 2k rows/query; the ANN ranking is
    // the in-bucket half verbatim, the exact ranking re-ranks the 2k
    // survivors (top-k of a union of per-group top-ks is exact).
    val grouped = TopKApi.topKPerGroup(scored, Seq("qid", "in_bucket"), "ord", k)
    val bf = TopKApi.topKPerGroup(grouped, Seq("qid"), "ord", k)
      .select(col("qid"), col("vec_id"))
    val ann = grouped.where(col("in_bucket"))
      .select(col("qid").as("aqid"), col("vec_id").as("avid"))
    val hits = bf.join(ann, col("qid") === col("aqid") && col("vec_id") === col("avid"))
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    q.select(col("qid")).join(hits, Seq("qid"), "left_outer")
      .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("recall_permille", expr(s"CAST(hits * 1000 div $k AS BIGINT)"))
      .orderBy("qid")
  }

  /** Recall@k audit of the IVF probe path against the exact brute force,
    * per query vector — [[annRecall]]'s twin for the engine's DEFAULT kNN
    * base (the q121 audit covered only the 8-plane LSH path; the IVF
    * multi-probe family had cost certifications but no recall-vs-exact
    * measurement until this). A query's candidate set is every corpus
    * vector whose HOME cell (nProbe=1 assignment) is among the query's
    * `nProbe` nearest centroids — exactly [[ivfTopK]]'s probe semantics.
    *
    * Scale shape: identical to [[annRecall]] — the exact ground truth
    * needs one corpus × queries pass, so that single native-scaled-dot
    * pass feeds BOTH rankings through the bounded-heap top-k-per-group
    * operator (no per-query global sort); cell assignment is the in-row
    * packed-argmin projection over the broadcast centroid array, and the
    * query probe-cell sets ride as one tiny broadcast array column.
    */
  def ivfRecall(embeddings: DataFrame, queries: DataFrame, k: Int,
      centroidEvery: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.graftshims.TopKApi
    val centsArr = ivfCentroids(embeddings, centroidEvery)
      .agg(sort_array(collect_list(struct(col("ccid"), col("cemb"), col("cnrm0"))))
        .as("cents"))
    // home cell of every corpus vector (the nProbe=1 assignment)
    val asg = probeAssignments(
      embeddings.withColumn("__nrm", scaledDot(col("embedding"), col("embedding"))),
      centsArr, 1)
    // each query's nProbe probe cells as ONE in-row array (packed min-k
    // over the broadcast centroid array — the probeAssignments recipe,
    // kept un-exploded so it can broadcast with the query row)
    val packedQ = transform(col("cents"), (c, i) =>
      (-floor(lit(1000000.0) *
          scaledDot(col("qv"), c.getField("cemb")).cast("double") /
          (sqrt(scaledDot(col("qv"), col("qv")).cast("double")) *
            sqrt(c.getField("cnrm0").cast("double"))))
        .cast("long")) * lit(IdxFactor) + i.cast("long"))
    val qp = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .crossJoin(broadcast(centsArr))
      .select(col("qid"), col("qv"),
        transform(graft.plans.GraftFunctions.minKLong(packedQ, lit(nProbe)),
          p => element_at(col("cents"),
              p.bitwiseAND(lit(IdxMask)).cast("int") + 1)
            .getField("ccid")).as("qcells"))
    val scored = embeddings.join(asg, Seq("vec_id"))
      .crossJoin(broadcast(qp))
      .select(col("qid"), col("vec_id"),
        cosineScaled(col("embedding"), col("qv")).as("cs"),
        array_contains(col("qcells"), col("cell")).as("in_probe"))
      // the annRecall ordering pack: (cos, ¬vec_id) in one long
      .withColumn("ord", col("cs") * lit(4294967296L) + (lit(4294967295L) - col("vec_id")))
    val grouped = TopKApi.topKPerGroup(scored, Seq("qid", "in_probe"), "ord", k)
    val bf = TopKApi.topKPerGroup(grouped, Seq("qid"), "ord", k)
      .select(col("qid"), col("vec_id"))
    val ann = grouped.where(col("in_probe"))
      .select(col("qid").as("aqid"), col("vec_id").as("avid"))
    val hits = bf.join(ann, col("qid") === col("aqid") && col("vec_id") === col("avid"))
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    qp.select(col("qid")).join(hits, Seq("qid"), "left_outer")
      .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("recall_permille", expr(s"CAST(hits * 1000 div $k AS BIGINT)"))
      .orderBy("qid")
  }

  /** Product-quantization codes: the vector splits into `m` subvectors of
    * `d` dims; each maps to the nearest (scaled-integer L2²) of `k`
    * codewords in that subspace, ties to the smaller code. The codebook is
    * driver-side metadata (m·k·d longs — like chunk bounds), baked in as a
    * nested array literal, so encoding is a PURE PROJECTION: no join, no
    * shuffle, embarrassingly parallel over the corpus. Returns array<long>
    * of `m` codes.
    */
  def pqCodes(emb: Column, cb: Array[Array[Array[Long]]]): Column = {
    val m = cb.length; val k = cb(0).length; val d = cb(0)(0).length
    graft.plans.GraftFunctions.pqEncode(emb, cb.flatten.flatten, m, k, d)
  }

  /** Declarative HOF twin of [[pqCodes]] — the semantic spec the native
    * expression is checked against (PQEncodeSpec); interpreted lambdas,
    * ~60× slower at scale.
    */
  def pqCodesDeclarative(emb: Column, cb: Array[Array[Array[Long]]]): Column = {
    val m = cb.length; val k = cb(0).length; val d = cb(0)(0).length
    val cbLit = array(cb.map(mArr => array(mArr.map(cArr =>
      array(cArr.map(lit(_)): _*)): _*)): _*)
    transform(sequence(lit(0), lit(m - 1)), mi =>
      aggregate(
        sequence(lit(0), lit(k - 1)),
        struct(lit(-1L).as("c"), lit(Long.MaxValue).as("dist")),
        (acc, c) => {
          val d2 = aggregate(sequence(lit(0), lit(d - 1)), lit(0L), (a, i) => {
            val x = sInt(element_at(emb, mi * d + i + 1))
            val y = element_at(element_at(element_at(cbLit, mi + 1), c + 1), i + 1)
            a + (x - y) * (x - y)
          })
          when(d2 < acc.getField("dist"),
            struct(c.cast("long").as("c"), d2.as("dist"))).otherwise(acc)
        },
        acc => acc.getField("c")))
  }

  /** PQ/ADC top-k: asymmetric distance computation — the query's exact
    * distance to every codeword (an m×k table, computed once on the
    * driver) is summed over each corpus vector's codes. The scan reads
    * only the code arrays (m bytes of signal per vector instead of the
    * full embedding — at 10^9 vectors this is the difference between
    * scanning 32 GB and 256 GB), and scoring is an in-row fold over the
    * broadcast-literal table.
    */
  def pqTopK(embeddings: DataFrame, query: DataFrame, k: Int,
      codebookEvery: Int = 31, m: Int = 8, nCodes: Int = 16): DataFrame = {
    val d = Dim / m
    def scaled(f: Float): Long = math.floor(f.toDouble * Scale).toLong
    // codebook: the m-th subvector of the 16 deterministic training
    // vectors (vec_id = c · codebookEvery) — reproducible without k-means
    val trainRows = embeddings
      .where(col("vec_id") % codebookEvery === 0 && col("vec_id") < codebookEvery.toLong * nCodes)
      .orderBy("vec_id").select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    require(trainRows.length == nCodes, s"expected $nCodes training vectors, got ${trainRows.length}")
    val cb = Array.tabulate(m, nCodes, d)((mi, c, i) => scaled(trainRows(c)(mi * d + i)))
    // ADC table: exact scaled-L2² of the query to every codeword
    val qv = query.select("embedding").head().getSeq[Float](0).toArray.map(scaled)
    val dt = Array.tabulate(m, nCodes) { (mi, c) =>
      (0 until d).map(i => { val diff = qv(mi * d + i) - cb(mi)(c)(i); diff * diff }).sum
    }
    val dtLit = array(dt.map(row => array(row.map(lit(_)): _*)): _*)
    val codes = pqCodes(col("embedding"), cb)
    embeddings
      .select(col("vec_id"), codes.as("codes"))
      .select(col("vec_id"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0L), (a, mi) =>
          a + element_at(element_at(dtLit, mi + 1),
            element_at(col("codes"), mi + 1).cast("int") + 1)).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
      .limit(k)
  }

  /** Embedding near-duplicate pairs: bucket-mates with cosine above a
    * scaled threshold (the dedup-by-embedding path).
    *
    * `maxBucket` closes this operator's member of the degenerate-locality
    * class (identical embeddings all hash to ONE bucket — |bucket|²
    * pairs exactly on near-duplicate corpora): a bucket over the cap
    * restricts the pairing's x-side to its hub (min vec_id), so it emits
    * hub-anchored pairs only — linear, still cosine-VERIFIED, and a
    * subset of the exact output; buckets at or under the cap keep exact
    * all-pairs (spec-pinned in SemDedupCapSpec's pair-cap case). The
    * whole split is ONE aliased join against a witness-restricted
    * x-side — no unioned self-join branches (the r8 Catalyst lesson).
    */
  def nearDupPairs(embeddings: DataFrame, minCosScaled: Long, numPlanes: Int = 8,
      maxBucket: Option[Int] = None): DataFrame = {
    val b = embeddings.withColumn("bucket", lshBucket(col("embedding"), numPlanes))
    val xSide = maxBucket match {
      case None => b
      case Some(cap) =>
        val stats = b.groupBy("bucket")
          .agg(count(lit(1)).as("bsz"), min("vec_id").as("hub"))
        b.join(stats, Seq("bucket"))
          .where(col("bsz") <= cap || col("vec_id") === col("hub"))
          .select("vec_id", "embedding", "bucket")
    }
    xSide.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("v1"), col("y.vec_id").as("v2"),
        cosineScaled(col("x.embedding"), col("y.embedding")).as("cos_scaled"))
      .where(col("cos_scaled") >= minCosScaled)
  }
}
