package graft

import org.scalatest.funsuite.AnyFunSuite

import java.io.File
import java.lang.reflect.Modifier

/** Nothing lands unverified silently: every public method on the operator
  * objects in `graft.ops` and `graft.streaming` must be mentioned in
  * COVERAGE.md (as `Object.method`, or by method name), or be explicitly
  * allowlisted here as internal plumbing. Round-7 lesson: an operator
  * (`Stats.madOutliers`) shipped in a snapshot commit with zero
  * verification because no gate noticed the new public method — this
  * spec is that gate. Note Scala `private[graft]` compiles to a PUBLIC
  * bytecode method, so package-private helpers surface here too; list
  * them in `plumbing` with the operator whose oracle covers them. */
class CoverageHygieneSpec extends AnyFunSuite {

  /** Public-in-bytecode helpers that are not operators themselves; each
    * is exercised through the callers named in its comment. */
  private val plumbing: Set[String] = Set(
    // Dedup internals shared across the near-dup family (all covered by
    // q_dedup_minhash / q_dedup_ngram / q_dedup_simhash oracles)
    "Dedup.bucketPairs",       // one-shuffle bucket-pairs emitter
    "Dedup.maxBandBucket",     // bucket-size guard for the pairs emitter
    "Dedup.maybeCache",        // small-plan cache boundary
    "Dedup.minhashSignature",  // SQL form kept as the oracle mirror
    // factored core of minhashNearDups (same plan, q_dedup_minhash
    // oracle) — the from-persisted-index entry the incremental
    // pipeline state reuses
    "Dedup.minhashNearDupsFromSigs",
    "Dedup.shingleCandidates", // narrow-then-rejoin candidate shape
    "Dedup.shingleExpr",       // k-shingle expression (q_text_topgrams too)
    "Dedup.spread",            // single-split input spreader (plan shape)
    "Dedup.withSimhashChunks", // simhash chunk columns (q_dedup_simhash)
    // Bpe internals: the initial-segmentation and UTF-8-order helpers
    // under Bpe.train (q_text_bpe oracle + BpeSpec convention tests),
    // plus the default driver-state cap constant (BpeSpec)
    "Bpe.spaceout", "Bpe.utf8Less", "Bpe.DefaultMaxWords",
    // Classify: scalar inverse of the fast sigmoid — the bias-init
    // primitive under Classify.train (q_classify_* oracles re-derive it)
    "Classify.fastLogit",
    // Sampling: hashBucket is the md5-bucket primitive under
    // deterministicSplit/sampleByHash/stratifiedSample (their oracles)
    "Sampling.hashBucket",
    // Similarity scalar pieces under every ANN oracle
    "Similarity.bandSignatures",      // banded LSH bits (SimilaritySpec)
    "Similarity.cosineFromParts",     // cosine assembly (q_ann_* oracles)
    "Similarity.dotExact",            // decimal dot (q_ann_bruteforce)
    "Similarity.hyperplaneSignature", // LSH bucket bits (q_ann_lsh)
    "Similarity.hyperplaneWeight",    // deterministic weight model
    "Similarity.normExact",           // decimal norm (q_ann_* oracles)
    // Sketch: shared bucket/rank derivation (q_sketch_hll + streaming twin)
    "Sketch.hllBucketAndRank",
    // TextAnalysis constants/primitives under q_text_pii / gopher / fingerprint
    "TextAnalysis.EmailPattern", "TextAnalysis.PhonePattern",
    "TextAnalysis.markers", "TextAnalysis.polyHash",
    // Zorder internals under q_zorder_key
    "Zorder.boundaries", "Zorder.bucketOf", "Zorder.mortonKey",
    // StreamingOps: schema helper shared by every streaming oracle
    "StreamingOps.rawEventsSchema",
    // Multimodal: schema constant under q_multimodal_meta/frames
    "Multimodal.mediaSchema"
  )

  test("every public ops/streaming method has a COVERAGE.md mention") {
    val coverage = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")))
    val classesDir = new File(
      graft.ops.Stats.getClass.getProtectionDomain.getCodeSource
        .getLocation.toURI)
    val missing = Seq("graft/ops", "graft/streaming").flatMap { pkg =>
      val files = Option(new File(classesDir, pkg).listFiles).getOrElse(
        fail(s"no classes under $pkg — compile first"))
      files.toSeq
        .filter(f => f.getName.endsWith("$.class") &&
          f.getName.count(_ == '$') == 1)
        .sortBy(_.getName)
        .flatMap { f =>
          val cls = Class.forName(
            pkg.replace('/', '.') + "." + f.getName.stripSuffix(".class"))
          val obj = f.getName.stripSuffix("$.class")
          cls.getDeclaredMethods.toSeq
            .filter(m => Modifier.isPublic(m.getModifiers) && !m.isSynthetic &&
              !m.getName.contains("$") && m.getDeclaringClass == cls)
            .map(_.getName).distinct.sorted
            .filterNot(m => plumbing(s"$obj.$m"))
            .filterNot(m => coverage.contains(s"$obj.$m") ||
              coverage.contains(m))
            .map(m => s"$obj.$m")
        }
    }
    assert(missing.isEmpty,
      s"""public operator methods with NO COVERAGE.md mention (add a row
         |with an oracle query + spec, or allowlist as plumbing with the
         |covering operator named):
         |  ${missing.mkString("\n  ")}""".stripMargin)
  }
}
