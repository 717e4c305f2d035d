package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Single-task exact all-pairs set-similarity kernel — the
  * [[LocalExact]] path for the prefix-filtered Bayardo join family
  * (q133 all-pairs, q165 incremental): below the document threshold
  * the whole df-rank → prefix → candidate → verify chain runs as ONE
  * executor task over the checkpointed (doc_id, arr, sz) relation,
  * replacing an 8-stage distributed plan whose per-stage scheduling
  * dominates at small corpus sizes. The distributed Bayardo plan
  * stays the over-threshold path — at 100 TB the prefix equi-join is
  * the only shape that works; this is dispatch, not replacement.
  *
  * Exactness contract (pinned by LocalExactParitySpec forcing
  * `spark.graft.localExactMaxRows=0`): the OUTPUT is the full set of
  * pairs with 3·inter ≥ sz1+sz2 and the identical integer jac_bp =
  * (inter·10000) div (sz1+sz2−inter). The prefix filter is complete
  * for ANY global total order on shingles (Bayardo, WWW 2007 §3 —
  * the canonical-ordering argument), so this kernel may intern
  * shingles to dense ints and rank by (df, intern-id) where the
  * distributed plan ranks by (df, utf8) — candidate sets differ at
  * df ties, verified OUTPUTS are identical. Interning also makes the
  * verify intersect an int two-pointer instead of ~40M UTF8 string
  * compares (measured 3.2 s → ~0.1 s at sf0.1).
  */
object AllPairsLocal {

  private final case class Doc(id: Long, base: Boolean,
                               sorted: Array[Int], // ascending intern ids (verify)
                               prefix: Array[Int]) { // rarest-first ⌊sz/2⌋+1 ids
    def sz: Long = sorted.length.toLong
  }

  private def internDocs(rows: Iterator[Row], baseAt: Int,
                         prefixDiv: Int = 2): Array[Doc] = {
    val ids = new java.util.HashMap[String, Integer]()
    val df = new scala.collection.mutable.ArrayBuffer[Int]()
    val raw = rows.map { r =>
      val arr = r.getSeq[String](1)
      val a = new Array[Int](arr.length)
      var i = 0
      arr.foreach { w =>
        var id = ids.get(w)
        if (id == null) { id = ids.size(); ids.put(w, id); df += 0 }
        df(id) += 1
        a(i) = id
        i += 1
      }
      (r.getLong(0), if (baseAt >= 0) r.getBoolean(baseAt) else false, a)
    }.toArray
    raw.map { case (docId, base, a) =>
      // global rank (df asc, intern-id asc) — a total order, so the
      // prefix-filter completeness bound applies
      val byRank = a.clone()
      sortBy(byRank, id => (df(id).toLong << 32) | id.toLong)
      val sorted = a.clone()
      java.util.Arrays.sort(sorted)
      Doc(docId, base, sorted, byRank.take(a.length / prefixDiv + 1))
    }
  }

  private def sortBy(a: Array[Int], key: Int => Long): Unit = {
    val boxed = a.map(i => (key(i), i)).sortBy(_._1)
    var i = 0
    while (i < a.length) { a(i) = boxed(i)._2; i += 1 }
  }

  /** Verified (a, b, inter) for candidate pairs under `orient` (which
    * also fixes the emitted orientation). */
  private def verifiedPairs(docs: Array[Doc],
                            orient: (Doc, Doc) => Boolean): Iterator[(Doc, Doc, Long)] = {
    val nShingles = docs.iterator.map(d =>
      if (d.sorted.isEmpty) 0 else d.sorted(d.sorted.length - 1) + 1)
      .foldLeft(0)(math.max)
    val index = Array.fill(nShingles)(null: java.util.ArrayList[Integer])
    var i = 0
    while (i < docs.length) {
      docs(i).prefix.foreach { w =>
        if (index(w) == null) index(w) = new java.util.ArrayList[Integer]()
        index(w).add(i)
      }
      i += 1
    }
    val seen = new java.util.HashSet[Long]()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Doc, Doc, Long)]
    index.foreach { bucket =>
      if (bucket != null) {
        var x = 0
        while (x < bucket.size()) {
          var y = x + 1
          while (y < bucket.size()) {
            val (p, q) = (bucket.get(x).intValue(), bucket.get(y).intValue())
            val (a, b) =
              if (orient(docs(p), docs(q))) (p, q)
              else if (orient(docs(q), docs(p))) (q, p)
              else (-1, -1)
            if (a >= 0 && seen.add((a.toLong << 32) | b.toLong)) {
              val (da, db) = (docs(a), docs(b))
              var (u, v, inter) = (0, 0, 0L)
              while (u < da.sorted.length && v < db.sorted.length) {
                val c = da.sorted(u) - db.sorted(v)
                if (c == 0) { inter += 1L; u += 1; v += 1 }
                else if (c < 0) u += 1
                else v += 1
              }
              if (3L * inter >= da.sz + db.sz) out += ((da, db, inter))
            }
            y += 1
          }
          x += 1
        }
      }
    }
    out.iterator
  }

  private def jacBp(inter: Long, s1: Long, s2: Long): Long =
    (inter * 10000L) / (s1 + s2 - inter) // floor div, operands ≥ 0

  /** q133 shape over checkpointed `docArr(doc_id, arr, sz)`:
    * (d1, d2, inter, sz1, sz2, jac_bp), d1 < d2, UNSORTED (caller
    * orders). None above the threshold. */
  def allPairs(docArr: DataFrame, maxRows: Long): Option[DataFrame] =
    LocalExact(docArr, StructType(Seq(
      StructField("d1", LongType), StructField("d2", LongType),
      StructField("inter", LongType), StructField("sz1", LongType),
      StructField("sz2", LongType), StructField("jac_bp", LongType))),
      maxRows) { it =>
      val docs = internDocs(it, baseAt = -1)
      verifiedPairs(docs, (a, b) => a.id < b.id).map { case (a, b, inter) =>
        Row(a.id, b.id, inter, a.sz, b.sz, jacBp(inter, a.sz, b.sz))
      }
    }

  /** q143 shape over checkpointed `docArr(doc_id, arr, sz)` — EXACT
    * asymmetric containment: ordered pairs (a, b), a ≠ b, with
    * 5·|A∩B| ≥ 4·|A|. One-sided prefix filter: a pair must share one
    * of A's ⌊|A|/5⌋+1 rarest shingles with B's FULL set, so the
    * candidate scan walks A's prefix against the full inverted
    * index. (d_a, d_b, inter, sz_a, sz_b, cont_bp), UNSORTED. */
  def containment(docArr: DataFrame, maxRows: Long): Option[DataFrame] =
    LocalExact(docArr, StructType(Seq(
      StructField("d_a", LongType), StructField("d_b", LongType),
      StructField("inter", LongType), StructField("sz_a", LongType),
      StructField("sz_b", LongType), StructField("cont_bp", LongType))),
      maxRows) { it =>
      val docs = internDocs(it, baseAt = -1, prefixDiv = 5)
      val nShingles = docs.iterator.map(d =>
        if (d.sorted.isEmpty) 0 else d.sorted(d.sorted.length - 1) + 1)
        .foldLeft(0)(math.max)
      // FULL-stream inverted index (the container side pays nothing)
      val index = Array.fill(nShingles)(null: java.util.ArrayList[Integer])
      var i = 0
      while (i < docs.length) {
        docs(i).sorted.foreach { w =>
          if (index(w) == null) index(w) = new java.util.ArrayList[Integer]()
          index(w).add(i)
        }
        i += 1
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      var a = 0
      while (a < docs.length) {
        val da = docs(a)
        val seen = new java.util.HashSet[Int]()
        da.prefix.foreach { w =>
          val bucket = index(w)
          var x = 0
          while (x < bucket.size()) {
            val b = bucket.get(x).intValue()
            if (b != a && seen.add(b)) {
              val db = docs(b)
              var (u, v, inter) = (0, 0, 0L)
              while (u < da.sorted.length && v < db.sorted.length) {
                val c = da.sorted(u) - db.sorted(v)
                if (c == 0) { inter += 1L; u += 1; v += 1 }
                else if (c < 0) u += 1
                else v += 1
              }
              if (5L * inter >= 4L * da.sz)
                out += Row(da.id, db.id, inter, da.sz, db.sz,
                  (inter * 10000L) / da.sz)
            }
            x += 1
          }
        }
        a += 1
      }
      out.iterator
    }

  /** q165 shape over checkpointed `docArr(doc_id, arr, sz, base)`:
    * per incoming doc, its best base match (max jac_bp, tie min base
    * id) — (inc, base_id, jac_bp), UNSORTED. None above threshold. */
  def incremental(docArr: DataFrame, maxRows: Long): Option[DataFrame] =
    LocalExact(docArr, StructType(Seq(
      StructField("inc", LongType), StructField("base_id", LongType),
      StructField("jac_bp", LongType))), maxRows) { it =>
      val docs = internDocs(it, baseAt = 3)
      val best = new java.util.HashMap[Long, (Long, Long)]() // inc → (jac, bs)
      verifiedPairs(docs, (a, b) => !a.base && b.base).foreach {
        case (a, b, inter) =>
          val j = jacBp(inter, a.sz, b.sz)
          val cur = best.get(a.id)
          if (cur == null || j > cur._1 || (j == cur._1 && b.id < cur._2))
            best.put(a.id, (j, b.id))
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      best.forEach((inc, v) => out += Row(inc, v._2, v._1))
      out.iterator
    }
}
