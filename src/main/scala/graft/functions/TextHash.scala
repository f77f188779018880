package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-sketch building blocks for near-duplicate detection — MinHash
  * signatures, banded LSH keys, and SimHash — all as pure Catalyst
  * expressions (array higher-order functions + xxhash64), so they
  * whole-stage-codegen and need no UDF/UDAF.
  *
  * Determinism: xxhash64 with an explicit integer salt column per hash
  * family member; no RNG at runtime.
  */
object TextHash {

  /** Non-empty lowercase whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Distinct k-word shingles (empty array when fewer than k tokens —
    * Spark's `sequence(1,0)` would count *down*, hence the guard). */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      array_distinct(
        transform(sequence(lit(1), size(toks) - (k - 1)),
          i => array_join(slice(toks, i, lit(k)), " "))))
      .otherwise(array().cast("array<string>"))

  /** One 64-bit content hash per shingle. Hash each string ONCE — the
    * permutation family below then works in the integer domain, so a
    * `perms`-wide signature costs one variable-length string hash +
    * `perms` fixed-width long hashes per shingle instead of `perms`
    * string hashes. (An affine h*A+B family would be cheaper still,
    * but ANSI mode — Spark 4's default — throws on the intended
    * mod-2^64 wraparound.) */
  def shingleHashes(sh: Column): Column = transform(sh, x => xxhash64(x))

  /** MinHash signature over pre-hashed shingles (see [[shingleHashes]]).
    * Null-free for non-empty arrays. */
  def minhashFromHashes(hs: Column, perms: Int): Column =
    array((0 until perms).map(s =>
      array_min(transform(hs, h => xxhash64(lit(s), h)))): _*)

  /** MinHash signature straight from shingle strings. Callers on a hot
    * path should materialize [[shingleHashes]] in its own projection
    * first so the string hash isn't re-expanded per permutation. */
  def minhashSignature(sh: Column, perms: Int): Column =
    minhashFromHashes(shingleHashes(sh), perms)

  /** LSH band keys: hash of each consecutive `rowsPerBand`-slice of the
    * signature, salted by band index. Docs sharing any band key are
    * candidate pairs. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      xxhash64(lit(b), slice(sig, b * rowsPerBand + 1, rowsPerBand))): _*)

  /** Estimated Jaccard between two signatures: matching-position
    * fraction. */
  def estJaccard(sigA: Column, sigB: Column, perms: Int): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast("double") / perms

  /** 64-bit SimHash over a (token, tf) set: per bit, sum +tf when the
    * token-hash bit is set else -tf; bit set in the output when the sum
    * is positive. Caller supplies the exploded (hash, tf) aggregate
    * context; this builds the 64 per-bit sum expressions. */
  def simhashBitSums(tokenHash: Column, tf: Column): Seq[Column] =
    (0 until 64).map { b =>
      sum(when(shiftright(tokenHash, b).bitwiseAND(1) === 1, tf)
        .otherwise(-tf)).as(s"_bit$b")
    }

  /** Combine the 64 bit-sum columns into the final signed-long hash. */
  def simhashFromBitSums(cols: Seq[Column]): Column =
    cols.zipWithIndex.map { case (c, b) =>
      when(c > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")
}
