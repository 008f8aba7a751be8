package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-signature algorithms as native Catalyst expressions.
  *
  * Why expressions and not composed ops: a MinHash via explode(shingles)
  * → groupBy(doc, hashIdx) → min would shuffle rows×shingles×k — at
  * 100 TB that is the whole corpus amplified hundreds of times. Each
  * signature here is computed in a single streaming pass over the
  * document inside whole-stage codegen (doGenCode emits a static call,
  * so the projection stays inside the generated loop); only the tiny
  * signature (k longs) ever moves.
  *
  * All hashing is FNV-1a 64 + splitmix64-derived universal hashes —
  * fixed public constants, deterministic across JVMs.
  */
object TextHashAlgos {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64 over a byte range. */
  def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) { h = (h ^ (bytes(i) & 0xffL)) * FnvPrime; i += 1 }
    h
  }

  /** splitmix64 — used to derive per-hash-function mixing constants. */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hashes of the word n-grams of `text` (words = space-separated),
    * one streaming pass, no materialized shingle strings: the n-gram
    * hash chains the word hashes. Returns hashes in document order. */
  def shingleHashes(text: UTF8String, n: Int): Array[Long] = {
    val bytes = text.getBytes
    // word boundaries
    var nWords = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    val wordHash = new Array[Long](nWords)
    var w = 0
    var start = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        wordHash(w) = fnv1a(bytes, start, i); w += 1; start = i + 1
      }
      i += 1
    }
    if (nWords < n) return Array.emptyLongArray
    val out = new Array[Long](nWords - n + 1)
    var g = 0
    while (g <= nWords - n) {
      var h = FnvOffset
      var j = 0
      while (j < n) { h = (h ^ wordHash(g + j)) * FnvPrime; j += 1 }
      out(g) = h
      g += 1
    }
    out
  }

  /** k-permutation MinHash signature over word n-grams, one pass.
    * Universal hashes h_i(x) = mix(x ^ c_i) with c_i = splitmix64(i). */
  def minhash(text: UTF8String, n: Int, k: Int): ArrayData = {
    val grams = shingleHashes(text, n)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var g = 0
    while (g < grams.length) {
      val base = grams(g)
      var i = 0
      while (i < k) {
        val h = splitmix64(base ^ splitmix64(i.toLong))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      g += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over word unigram hashes (±1 per bit, >0 → 1). */
  def simhash(text: UTF8String): Long = {
    val grams = shingleHashes(text, 1)
    val acc = new Array[Int](64)
    var g = 0
    while (g < grams.length) {
      val h = grams(g)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      g += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD'03): hash all char k-grams, slide a window of w hashes,
    * keep the rightmost minimum of each window. Returns the distinct
    * selected hashes, sorted. */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val gram = new Array[Long](n)
    var i = 0
    while (i < n) { gram(i) = fnv1a(bytes, i, i + k); i += 1 }
    val selected = new java.util.TreeSet[java.lang.Long]()
    var win = 0
    val last = n - w
    if (last < 0) {
      // fewer grams than the window: take the single rightmost min
      var best = 0
      i = 1
      while (i < n) { if (gram(i) <= gram(best)) best = i; i += 1 }
      selected.add(gram(best))
    } else {
      while (win <= last) {
        var best = win
        i = win + 1
        while (i < win + w) { if (gram(i) <= gram(best)) best = i; i += 1 }
        selected.add(gram(best))
        win += 1
      }
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct xxhash64 values (seed 42 — Spark's `xxhash64`) of the
    * word n-grams of `text`, first-occurrence order — bit-identical to
    * `array_distinct(transform(sequence(0, size(w) - n), i ->
    * xxhash64(concat_ws(' ', w[i], ..., w[i+n-1]))))` over
    * `w = split(text, " ")` (r19 opt round): every separator is
    * exactly one space, so words i..i+n−1 joined with ' ' ARE the
    * original byte span [start(i), end(i+n−1)) (the [[TextStatAlgos
    * .repStats]] equivalence — UTF-8-safe, since 0x20 never occurs
    * inside a multi-byte sequence), and xxhash64 of a string is
    * XXH64 over its bytes. One streaming pass with zero gram-string
    * allocation replaces the interpreted higher-order transform +
    * per-gram concat_ws/substring copies. Fewer than n words → empty
    * array (explode then yields no rows, exactly like the old
    * `size(w) >= n` filter). */
  def wordGramXxh(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    var nWords = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    if (nWords < n) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nWords)
    val ends = new Array[Int](nWords)
    var w = 0
    var start = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        starts(w) = start; ends(w) = i; w += 1; start = i + 1
      }
      i += 1
    }
    val nG = nWords - n + 1
    val seen = new java.util.HashSet[java.lang.Long](nG * 2)
    val out = new Array[Long](nG)
    var m = 0
    var g = 0
    while (g < nG) {
      val from = starts(g)
      val until = ends(g + n - 1)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
          until - from, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      g += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** Distinct xxhash64 values (seed 42) of the char n-grams of `text`,
    * first-occurrence order — bit-identical to
    * `array_distinct(transform(sequence(1, length(text) - n + 1), i ->
    * xxhash64(substring(text, i, n))))` (r19 opt round). `substring`
    * counts CHARS; on an all-ASCII row (numBytes == numChars — the
    * corpus contract the edit-distance oracle already pins) the gram
    * is a raw byte window hashed with zero allocation; a row with
    * multi-byte chars takes the exact per-gram substring path.
    * Shorter than n chars → empty array (the old `length(text) >= n`
    * filter's explode-drop). */
  def charGramXxh(text: UTF8String, n: Int): ArrayData = {
    val nChars = text.numChars()
    val nG = nChars - n + 1
    if (nG <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](nG * 2)
    val out = new Array[Long](nG)
    var m = 0
    if (text.numBytes() == nChars) {
      val bytes = text.getBytes
      var i = 0
      while (i < nG) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i, n, 42L)
        if (seen.add(h)) { out(m) = h; m += 1 }
        i += 1
      }
    } else {
      var i = 0
      while (i < nG) {
        val sub = text.substringSQL(i + 1, n)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(sub.getBaseObject, sub.getBaseOffset,
            sub.numBytes(), 42L)
        if (seen.add(h)) { out(m) = h; m += 1 }
        i += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}

object TextStatAlgos {
  /** Repetition stats of `text` split on single spaces (empty tokens
    * kept, exactly like `split(text, ' ')` with limit -1):
    * `[n_words, n3, dst3, mx2, n2]` where n3/dst3 are total/distinct
    * word-3-gram counts and mx2/n2 are the max multiplicity and total
    * count of word-2-grams.
    *
    * Equality of joined n-grams is equality of the underlying text
    * span: every separator is exactly one space, so the words i..j
    * joined with ' ' ARE the original substring [start(i), end(j)) —
    * dedup works on substrings, no gram strings are re-assembled. One
    * pass, exact (string-keyed, no hash truncation), replacing a
    * sort + interpreted fold over per-row gram arrays. */
  def repStats(text: UTF8String): ArrayData = {
    val s = text.toString
    val len = s.length
    var nw = 1
    var i = 0
    while (i < len) { if (s.charAt(i) == ' ') nw += 1; i += 1 }
    val starts = new Array[Int](nw)
    val ends = new Array[Int](nw)
    var w = 0
    i = 0
    while (i < len) {
      if (s.charAt(i) == ' ') { ends(w) = i; w += 1; starts(w) = i + 1 }
      i += 1
    }
    ends(w) = len
    val n3 = if (nw >= 3) nw - 2 else 0
    val set3 = new java.util.HashSet[String](Integer.highestOneBit(n3 * 4 + 15))
    i = 0
    while (i < n3) { set3.add(s.substring(starts(i), ends(i + 2))); i += 1 }
    val n2 = if (nw >= 2) nw - 1 else 0
    val cnt2 = new java.util.HashMap[String, Integer](Integer.highestOneBit(n2 * 4 + 15))
    var mx2 = 0L
    i = 0
    while (i < n2) {
      val g = s.substring(starts(i), ends(i + 1))
      val prev = cnt2.get(g)
      val c = if (prev == null) 1 else prev.intValue + 1
      cnt2.put(g, Integer.valueOf(c))
      if (c > mx2) mx2 = c.toLong
      i += 1
    }
    new GenericArrayData(Array[Long](nw.toLong, n3.toLong, set3.size.toLong, mx2, n2.toLong))
  }

  /** MD5 instance per thread — getInstance per row would dominate the
    * per-token digest work in [[iwScoreStats]]'s inner loop. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** DSIR importance score + token count of `text` in one streaming
    * pass: `[Σ ratio(bucket(tok)), n_toks]` over the non-empty
    * space-separated tokens, where `bucket(tok)` = first byte of
    * MD5(tok) mod `ratio.length` — identical arithmetic to the
    * declarative `conv(substring(md5(tok), 1, 2), 16, 10) % B` (the
    * first two hex chars ARE the first digest byte). Replaces a
    * split + filter + interpreted higher-order `aggregate` lambda
    * (the lambda body was re-evaluated per ELEMENT outside codegen)
    * and never materializes the token array: each token is digested
    * straight off its UTF-8 byte slice. */
  def iwScoreStats(text: UTF8String, ratio: Array[Long]): ArrayData = {
    val bytes = text.getBytes
    val md = md5Local.get()
    val b = ratio.length
    var score = 0L
    var n = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) { // empty tokens are filtered out
          md.reset()
          md.update(bytes, start, i - start)
          score += ratio((md.digest()(0) & 0xff) % b)
          n += 1L
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(Array[Long](score, n))
  }

  /** The whole length + repetition keep verdict in ONE kernel call:
    * n_words ≥ minWords, duplicate-trigram permille ≤ dup3PmMax, and
    * top-bigram-coverage permille ≤ top2PmMax. Exists so a gating
    * FILTER costs one [[repStats]] pass — filtering on fields of an
    * aliased repStats column lets predicate pushdown substitute the
    * alias and re-evaluate the kernel once per referenced field.
    * JVM integer division == `DIV` here (all operands non-negative);
    * minWords ≥ 3 keeps the denominators positive. */
  def repKeep(text: UTF8String, minWords: Int,
    dup3PmMax: Long, top2PmMax: Long): Boolean = {
    require(minWords >= 3, s"minWords must be >= 3, got $minWords")
    val a = repStats(text)
    val nw = a.getLong(0)
    val n3 = a.getLong(1)
    val dst3 = a.getLong(2)
    val mx2 = a.getLong(3)
    val n2 = a.getLong(4)
    nw >= minWords &&
      (1000L * (n3 - dst3)) / n3 <= dup3PmMax &&
      (1000L * mx2) / n2 <= top2PmMax
  }
}

/** Per-document repetition stats `[n_words, n3, dst3, mx2, n2]` — see
  * [[TextStatAlgos.repStats]]. */
case class RepStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rep_stats"
  override def nullSafeEval(input: Any): Any =
    TextStatAlgos.repStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatAlgos.repStats($c)")
  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

/** One-call length + repetition gate verdict — see
  * [[TextStatAlgos.repKeep]]. */
case class RepKeep(child: Expression, minWords: Int,
  dup3PmMax: Long, top2PmMax: Long) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "rep_keep"
  override def nullSafeEval(input: Any): Any =
    TextStatAlgos.repKeep(input.asInstanceOf[UTF8String],
      minWords, dup3PmMax, top2PmMax)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextStatAlgos.repKeep($c, $minWords, ${dup3PmMax}L, ${top2PmMax}L)")
  override protected def withNewChildInternal(newChild: Expression): RepKeep =
    copy(child = newChild)
}

/** Per-document DSIR `[score, n_toks]` against a literal per-bucket
  * ratio table — see [[TextStatAlgos.iwScoreStats]]. `ratio` is a Seq
  * so Catalyst canonicalization/CSE compare it structurally (an Array
  * field would silently break both). */
case class IwScoreStats(child: Expression, ratio: Seq[Long])
  extends UnaryExpression {
  @transient private lazy val ratioArr: Array[Long] = ratio.toArray
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "iw_score_stats"
  override def nullSafeEval(input: Any): Any =
    TextStatAlgos.iwScoreStats(input.asInstanceOf[UTF8String], ratioArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("iwRatio", ratioArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextStatAlgos.iwScoreStats($c, $r)")
  }
  override protected def withNewChildInternal(newChild: Expression): IwScoreStats =
    copy(child = newChild)
}

/** MinHash signature of the word `shingle`-grams of a string column:
  * array of `numHashes` longs. One pass, codegen-friendly. */
case class MinHashSig(child: Expression, shingle: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(input: Any): Any =
    TextHashAlgos.minhash(input.asInstanceOf[UTF8String], shingle, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashAlgos.minhash($c, $shingle, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash of a string column. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    TextHashAlgos.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashAlgos.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Winnowing fingerprint set (sorted distinct longs) of a string. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"
  override def nullSafeEval(input: Any): Any =
    TextHashAlgos.winnow(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashAlgos.winnow($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** Distinct word-n-gram xxhash64 set (first-occurrence order) of a
  * string — the [[TextHashAlgos.wordGramXxh]] kernel. */
case class WordGramHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_gram_hashes"
  override def nullSafeEval(input: Any): Any =
    TextHashAlgos.wordGramXxh(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashAlgos.wordGramXxh($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordGramHashes =
    copy(child = newChild)
}

/** Distinct char-n-gram xxhash64 set (first-occurrence order) of a
  * string — the [[TextHashAlgos.charGramXxh]] kernel. */
case class CharGramHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"
  override def nullSafeEval(input: Any): Any =
    TextHashAlgos.charGramXxh(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashAlgos.charGramXxh($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
}

/** Column-API wrappers for the custom expressions. */
object TextFunctions {
  def wordGramHashes(c: Column, n: Int): Column =
    ColumnBridge.column(WordGramHashes(ColumnBridge.expression(c), n))
  def charGramHashes(c: Column, n: Int): Column =
    ColumnBridge.column(CharGramHashes(ColumnBridge.expression(c), n))
  def minhashSig(c: Column, shingle: Int = 3, numHashes: Int = 64): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), shingle, numHashes))
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
  def winnowFingerprints(c: Column, k: Int = 8, w: Int = 4): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(c), k, w))
  def repStats(c: Column): Column =
    ColumnBridge.column(RepStats(ColumnBridge.expression(c)))
  def repKeep(c: Column, minWords: Int, dup3PmMax: Long, top2PmMax: Long): Column =
    ColumnBridge.column(RepKeep(ColumnBridge.expression(c),
      minWords, dup3PmMax, top2PmMax))
  def iwScoreStats(c: Column, ratio: Seq[Long]): Column =
    ColumnBridge.column(IwScoreStats(ColumnBridge.expression(c), ratio))
}
