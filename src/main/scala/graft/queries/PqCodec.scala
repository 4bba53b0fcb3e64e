package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Product-quantization codec shared by [[IvfIndex]] (which trains the
  * codebooks at build/retrain and stores the per-vector packed code
  * words in the bucketed table) and [[AnnPq]] (which serves ADC
  * queries off the stored words). Public Jégou/Douze/Schmid 2011
  * scheme.
  *
  * TWO committed geometries over the 64-dim normalized vectors, both
  * 8 stored bytes/vector (8× smaller than the int8 SQ8 codes, 64×
  * smaller than float64):
  *
  *   - [[G16]] — 16 subspaces × 4 dims, K=16 (4-bit codes): the r13
  *     gate geometry; cheapest to train (16 tiny codebooks).
  *   - [[G8]] — 8 subspaces × 8 dims, K=256 (8-bit codes): the
  *     measured RECALL rung at the same byte budget — recall@10 at
  *     pool 50 on the 128k near-random corpus is 0.43 vs G16's 0.36
  *     (BENCH_sq8.json; numpy cross-check in round 14). Fewer, finer
  *     codebooks beat more, coarser ones on data with no cluster
  *     structure — and also beat RESIDUAL coding there (see
  *     [[AnnPq]]: at 16 coarse centroids the corpus fits cos ≈ 0.23,
  *     so residuals carry MORE energy (|r| ≈ 1.24) than the vectors
  *     and quantize worse).
  *
  * Determinism (the house k-means discipline, so the DuckDB oracle
  * replays training and code assignment bit-for-bit):
  *  - seeds: subvectors of vec_id < K, per subspace;
  *  - Euclidean assignment (subvectors are NOT unit-norm — spherical
  *    assignment would be wrong), squared-distance folded
  *    left-to-right, ties (dist asc, cid asc);
  *  - mean updates integer-quantize components (floor(x·1e6 + 0.5) as
  *    BIGINT) before summing — order-independent — then de-quantize;
  *    NO normalization (codebooks live in subvector space, not on the
  *    sphere).
  *
  * Training (round 14): per Lloyd iteration the CURRENT books ride
  * the [[PqEncode]] kernel as a plain driver-side array (one codegen
  * scan assigns all M subspaces at once), and the quantized component
  * sums collect to the driver (M×K×SubDim rows — 1 k/16 k values).
  * This replaced the joined long-form formulation because K=256 made
  * the n×M×K assignment join and the literal-argmin column formula
  * (M×K×SubDim case terms) infeasible; the kernel is bit-equal to
  * both (AnnPqSpec parity pins word ≡ [[codeColumn]]).
  */
object PqCodec {

  /** One PQ geometry: m subspaces × subDim dims, k centroids per
    * codebook, codes packed `bits` apart into one BIGINT word. */
  final case class PqGeom(m: Int, subDim: Int, k: Int, bits: Int) {
    require(m * subDim == 64, s"subspaces must tile the 64 dims (got $m×$subDim)")
    require(k <= (1 << bits) && m * bits <= 64,
      s"codes must pack into one long (m=$m bits=$bits k=$k)")
    /** ADC read of code `sub` from packed-word column `pcCol` —
      * codegen shift-and-mask. */
    def unpackSql(pcCol: String, sub: Int): String =
      s"CAST((($pcCol >> ${bits * sub}) & ${(1 << bits) - 1}) AS INT)"
  }

  /** The r13 gate geometry: 16×4-dim, 16-centroid codebooks. */
  val G16: PqGeom = PqGeom(16, 4, 16, 4)
  /** The wide-codebook recall rung: 8×8-dim, 256-centroid codebooks. */
  val G8: PqGeom = PqGeom(8, 8, 256, 8)

  // G16 aliases — the ann_pq/ann_ivf_pq/ann_ivf_pqr gate constants.
  val M = G16.m
  val SubDim = G16.subDim
  val K = G16.k
  val Iters = 2 // Lloyd iterations (the IvfIndex cadence)
  val QuantScale = 1000000.0 // integer-quantization grid (means + LUT)

  /** Subvector `sub` (0-based) of a 64-dim array column. */
  def subv(v: Column, sub: Int, geom: PqGeom = G16): Column =
    slice(v, sub * geom.subDim + 1, geom.subDim)

  /** Train all `geom.m` codebooks: returns the checkpointed
    * (sub, cid, cv) frame — m×k rows, broadcast-sized. Throws
    * IllegalArgumentException on a degenerate corpus (missing seed
    * ids or an empty Lloyd cell) — [[IvfIndex]] catches it and
    * degrades the build to pq-less. */
  def train(e: DataFrame, geom: PqGeom = G16): DataFrame = {
    val spark = e.sparkSession
    val eC = e.localCheckpoint()

    // Seeds: subvectors of vec_id < k, cid = vec_id — collected in
    // order so books(sub)(cid) is positional.
    val seedRows = eC.filter(col("vec_id") < geom.k)
      .select(col("vec_id"), col("v")).collect()
    require(seedRows.length == geom.k,
      s"PQ seeds need all vec_id < ${geom.k} present (got ${seedRows.length}): " +
        "a cohort-filtered corpus cannot train this geometry — reseed or drop pq")
    var books = Array.ofDim[Array[Double]](geom.m, geom.k)
    seedRows.foreach { r =>
      val cid = r.getLong(0).toInt
      val v = r.getSeq[Double](1).toArray
      for (m <- 0 until geom.m)
        books(m)(cid) = java.util.Arrays.copyOfRange(
          v, m * geom.subDim, (m + 1) * geom.subDim)
    }

    // Lloyd: assign with the CURRENT books via the codegen kernel (one
    // scan, all subspaces), then integer-quantized component means.
    for (_ <- 1 to Iters) {
      val mask = lit((1L << geom.bits) - 1)
      val subs = (0 until geom.m).map { m =>
        struct(lit(m).as("sub"),
          shiftright(col("w"), geom.bits * m).bitwiseAND(mask).as("cid"),
          subv(col("v"), m, geom).as("sv"))
      }
      val stats = eC
        .select(col("v"), encode(col("v"), books, geom).as("w"))
        .select(explode(array(subs: _*)).as("s"))
        .select(col("s.sub").as("sub"), col("s.cid").as("cid"),
          posexplode(col("s.sv")).as(Seq("dim", "va")))
        .groupBy(col("sub"), col("cid"), col("dim"))
        .agg(sum(floor(col("va") * QuantScale + 0.5)).as("sq"),
          count(lit(1)).as("n"))
        .collect()
      val next = Array.ofDim[Array[Double]](geom.m, geom.k)
      stats.groupBy(r => (r.getInt(0), r.getLong(1).toInt)).foreach {
        case ((sub, cid), rows) =>
          val cv = new Array[Double](geom.subDim)
          rows.foreach { r =>
            cv(r.getInt(2)) =
              r.getLong(3).toDouble / r.getLong(4).toDouble / QuantScale
          }
          next(sub)(cid) = cv
      }
      // Density is a TRAIN-TIME invariant every consumer assumes: the
      // positional ADC LUT and the kernel's dense book array both
      // break on an empty Lloyd cell (duplicate seeds collapsing a
      // cluster). Checked per iteration; the SHARED corpus index
      // catches this upstream and degrades to pq-less.
      for (m <- 0 until geom.m; j <- 0 until geom.k)
        require(next(m)(j) != null,
          s"PQ codebooks must be dense: empty Lloyd cell (sub=$m, cid=$j) — " +
            "reseed or drop pq")
      books = next
    }

    import scala.jdk.CollectionConverters._
    val rows = (for (m <- 0 until geom.m; c <- 0 until geom.k)
      yield org.apache.spark.sql.Row(m, c.toLong, books(m)(c).toSeq)).asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sub",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("cid", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cv",
        ArrayType(DoubleType, containsNull = false), nullable = false)))
    spark.createDataFrame(rows, schema).localCheckpoint()
  }

  /** Integer-quantization grid for the OPQ energy ranking (x ∈ [-1,1]
    * so x²·1e12 ≤ 1e12; 131k-row sums stay far below Long.MaxValue). */
  val EnergyScale = 1000000000000.0

  /** OPQ-lite rotation (Ge et al. 2013 "Optimized Product
    * Quantization", the parametric eigenvalue-allocation idea
    * restricted to PERMUTATION rotations): rank the 64 dims by
    * integer-quantized energy Σ floor(x²·1e12 + 0.5) (order-free, so
    * the DuckDB oracle replays the ranking bit-for-bit), snake-deal
    * the ranks into the geometry's m subspaces so per-subspace energy
    * balances, then PQ-encode the PERMUTED vectors. A permutation is
    * an orthogonal rotation the oracle CAN replay end-to-end — the
    * full learned rotation (an SVD per alternation) is not
    * SQL-expressible, so this rung deliberately trades the last OPQ
    * percent for a fully oracle-gated transform. Returns newpos → old
    * dim, both 0-based; within a subspace, dims sit in assignment
    * (round) order. */
  def energyPermutation(e: DataFrame, geom: PqGeom = G16): Array[Int] = {
    val energies = e
      .select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(sum(floor(col("x") * col("x") * EnergyScale + 0.5)).as("en"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    require(energies.length == 64,
      s"the OPQ permutation needs 64-dim vectors (got ${energies.length} dims)")
    val ranked = energies.sortBy { case (d, en) => (-en, d) }.map(_._1)
    val groups = Array.fill(geom.m)(List.newBuilder[Int])
    ranked.zipWithIndex.foreach { case (dim, r) =>
      val t = r / geom.m
      val p = r % geom.m
      val g = if (t % 2 == 0) p else geom.m - 1 - p
      groups(g) += dim
    }
    groups.flatMap(_.result())
  }

  /** `v` reindexed by `perm` (newpos → old dim, 0-based) — the
    * permutation-rotation applied as one 64-element array projection
    * (stays inside whole-stage codegen). */
  def permuteCol(v: Column, perm: Seq[Int]): Column =
    array(perm.map(i => element_at(v, i + 1)): _*)

  /** Collect the trained codebooks to the driver — m×k×subDim doubles
    * (≤ 16 k values) — for the [[PqEncode]] kernel. */
  def collectBooks(books: DataFrame, geom: PqGeom = G16): Array[Array[Array[Double]]] = {
    val out = Array.ofDim[Array[Double]](geom.m, geom.k)
    books.select(col("sub"), col("cid"), col("cv")).collect().foreach { r =>
      out(r.getInt(0))(r.getLong(1).toInt) = r.getSeq[Double](2).toArray
    }
    for (m <- 0 until geom.m; j <- 0 until geom.k)
      require(out(m)(j) != null,
        s"PQ codebook cell (sub=$m, cid=$j) is missing — train() guarantees " +
          "density, so this frame is not a trained codebook")
    out
  }

  /** The packed code word as the [[PqEncode]] codegen kernel — the
    * write-path transform (build / append / retrain) and the training
    * loop's assignment step. All m codes in ONE BIGINT, code `sub` in
    * bits [bits·sub, bits·(sub+1)): fixed 8 stored bytes with no
    * parquet array framing, shift-and-mask ADC reads. */
  def encode(v: Column, books: Array[Array[Array[Double]]],
      geom: PqGeom = G16): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      PqEncode(org.apache.spark.sql.graft.ColumnBridge.expression(v), books,
        geom.bits))

  /** The per-row code ARRAY form (`array<int>`) via the column
    * formula the kernel replaced — kept ONLY as the parity reference
    * AnnPqSpec pins [[encode]] against (literal-argmin: K×subDim case
    * terms per subspace — infeasible to compile at K=256, which is
    * why the kernel exists). Same exactness contract: left-to-right
    * squared-distance folds, first-minimum ties ≡ (dist asc, cid
    * asc). */
  def codeColumn(v: Column, books: Array[Array[Array[Double]]],
      geom: PqGeom = G16): Column = {
    val perSub = (0 until geom.m).map { m =>
      val o = m * geom.subDim
      val dists = (0 until geom.k).map { j =>
        val cv = books(m)(j)
        (0 until geom.subDim).map { i =>
          val d = element_at(v, o + i + 1) - lit(cv(i))
          d * d
        }.reduce(_ + _)
      }
      val ds = array(dists: _*)
      (array_position(ds, array_min(ds)) - 1).cast("int")
    }
    array(perSub: _*)
  }

  /** Nearest-codebook-entry word — called from generated code and
    * [[PqEncode.nullSafeEval]]. Subspace widths derive from the book
    * shapes; first strict minimum ≡ (dist asc, cid asc); the fold is
    * acc=0.0 then += d² in index order, IEEE-identical to the
    * column/oracle folds. */
  def encodeWord(v: ArrayData, books: Array[Array[Array[Double]]],
      bits: Int): Long = {
    var word = 0L
    var o = 0
    var m = 0
    while (m < books.length) {
      val bk = books(m)
      val sd = bk(0).length
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < bk.length) {
        val c = bk(j)
        var acc = 0.0
        var i = 0
        while (i < sd) { val d = v.getDouble(o + i) - c(i); acc += d * d; i += 1 }
        if (acc < bestD) { bestD = acc; best = j }
        j += 1
      }
      word |= best.toLong << (bits * m)
      o += sd
      m += 1
    }
    word
  }

  /** The residual frame a residual-coded IVF-PQ trains/codes on:
    * rv = v − centroid(cid), with the centroid values as LITERALS
    * (`cents(cid)` is the trained centroid of bucket cid). Returned as
    * (vec_id, v) so [[train]]/[[encode]] apply unchanged. Callers must
    * BIND the result to a column before feeding [[encode]]'s
    * reference sites (see IvfIndex.withCodes). */
  def residualCol(v: Column, cid: Column,
      cents: Array[Array[Double]]): Column = {
    val centArr = array(cents.map(cv => array(cv.map(lit): _*)): _*)
    zip_with(v, element_at(centArr, cid.cast("int") + 1), (x, c) => x - c)
  }
}

/** Native codegen expression wrapping [[PqCodec.encodeWord]]: the
  * packed PQ code word of a 64-dim double-array column under
  * driver-side codebooks (carried as a reference object — NOT
  * generated source, so the generated method stays tiny at any K;
  * the literal-argmin formula this replaced built K×subDim case terms
  * per subspace). */
case class PqEncode(child: Expression,
    books: Array[Array[Array[Double]]], bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode needs an array<double> input, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqCodec.encodeWord(input.asInstanceOf[ArrayData], books, bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("pqBooks", books, "double[][][]")
      s"${ev.value} = graft.queries.PqCodec.encodeWord($c, $ref, $bits);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  // Structural equality despite the raw Array constructor arg (r14
  // ADVICE: case-class equals/hashCode on arrays is reference
  // identity, so two semantically identical encodes never compared
  // equal — silently defeating Catalyst canonicalization,
  // subexpression elimination, and exchange/plan reuse when the same
  // books encode is referenced twice). Content hash precomputed once;
  // the deep comparison runs only on hash-equal candidates.
  private lazy val booksHash: Int =
    java.util.Arrays.deepHashCode(books.asInstanceOf[Array[AnyRef]])
  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, Int.box(bits), Int.box(booksHash))
  override def equals(other: Any): Boolean = other match {
    case that: PqEncode =>
      child == that.child && bits == that.bits &&
        booksHash == that.booksHash &&
        java.util.Arrays.deepEquals(
          books.asInstanceOf[Array[AnyRef]],
          that.books.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
}
