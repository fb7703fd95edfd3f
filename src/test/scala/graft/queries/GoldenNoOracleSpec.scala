package graft.queries

import java.security.MessageDigest

import graft.SparkTestBase

/** Committed canonical hashes for every query the driver records as
  * `no_oracle` (VERDICT r5 task #9): queries whose semantics DuckDB
  * cannot express (multimodal codecs, ANN index internals, BPE merges,
  * coreset selection, model-based scoring). Each already has a
  * semantics spec (planted fixtures, recall bounds); this pins the
  * EXACT sf0.001 output so a refactor cannot silently drift it.
  *
  * Canonical form: columns sorted by name, rows rendered as JSON (stable
  * for arrays/structs/doubles, unlike `String.valueOf`), lines sorted,
  * MD5. All 16 are deterministic: seeded models, integer-quantized
  * scores, canonical tie-breaks.
  */
class GoldenNoOracleSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def canonicalHash(name: String, dir: String = dir): String = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val cols = df.columns.sorted.toSeq
    val lines = df.select(cols.head, cols.tail: _*)
      .toJSON.collect().sorted
    spark.catalog.clearCache()
    MessageDigest.getInstance("MD5")
      .digest(lines.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  private val golden = Map(
    "q35_multimodal" -> "7e31a2a02ccd0ce6ce4c45a573fbf59b",
    "q49_ann_ivf" -> "f11dcd79ff8c862ea106513eb0f90a72",
    "q51_frame_sample" -> "aece7a91f115f163adbb7048519f4426",
    "q57_dedup_minhash_fast" -> "e2422836a03489869af86335d971ff1b",
    "q95_ann_pq" -> "0f4191b0d42893c7a220615bb1e20c35",
    "q96_ann_ivfpq" -> "5153a29e79d666018210d11218130d37",
    "q100_image_neardup" -> "ba4f602cd687a61db9714c0d7055709b",
    "q101_audio_neardup" -> "88eaba48f0beaa79cb3a373ca531ef00",
    "q107_bpe_merges" -> "952851c7ae0aaead1ba16b6400ef76b1",
    "q140_kcenter_coreset" -> "7f53e81ebc4aa6e6f2ecfde554ec648b",
    "q152_quality_classifier" -> "140e7b416e22b113c30df5742b7ada7f",
    "q153_compression_signal" -> "34a5a50b33b9739ceb64e1b38e5e1d0c",
    "q155_image_resize" -> "567d470308fda478b2e51db8fb0045ab",
    "q174_unigram_vocab" -> "34503e3746ddeeb63ec638e34d02381e",
    "q197_mst_boruvka" -> "44046721edf365842b538db01c5062dd",
    "q202_single_linkage" -> "5677ae9ee40d1b208a7c48266a313365",
    "q232_als_factorize" -> "25e69d9be069a1eb6091c816c9dffb39",
    "q234_isotonic_calibration" -> "46e12bb8ac02c18483522d0bcc8c6165",
    "q240_mondrian_kanon" -> "0e61dbf436947f188fa31aa3d61235b9")

  for ((name, expected) <- golden) {
    test(s"$name canonical output matches the committed golden hash") {
      val actual = canonicalHash(name)
      assert(actual == expected, s"$name golden hash drifted: actual=$actual")
    }
  }

  /** EVERY rows-only query ALSO pinned at sf0.01 (the r7→r8 move
    * mirroring GoldenMlSpec's): at sf0.001 several of these run
    * single-partition, where partition-order or merge-order drift is
    * invisible — at sf0.01 the same queries run multi-partition, so a
    * nondeterministic shuffle merge or an order-dependent tie-break
    * cannot hide behind one partition. */
  private val goldenSf01 = Map(
    "q35_multimodal" -> "cb9b95bd468868db28e09769c3929fa9",
    "q51_frame_sample" -> "7369baee9948fd1cc6e26de165ac6240",
    "q57_dedup_minhash_fast" -> "840d5cc2606fc063680094734f4359ef",
    "q107_bpe_merges" -> "80a5ff9726817bc2625d2600c9902f27",
    "q140_kcenter_coreset" -> "92f26d2a1544d387dd8af8f9d99fafe0",
    "q152_quality_classifier" -> "5326803ff19b1585ea7ece744a0b5b90",
    "q153_compression_signal" -> "40bb809c2f6d086dc2ae30b853cc7ac7",
    "q155_image_resize" -> "17af46f2b22e8851ceb74b95c41b9b8e",
    "q174_unigram_vocab" -> "c6b57c0b3bc08783e79833bb5dae5284",
    "q232_als_factorize" -> "b2c00e74cecb7ac19e0a7dd260cfa100",
    "q234_isotonic_calibration" -> "12703bf404018ddeb8e6d9670aace226",
    "q240_mondrian_kanon" -> "897d8ac53e276a3afe3a53a6d5c66ee9",
    "q49_ann_ivf" -> "80a828425f0401b8a69cd4625f1b240e",
    "q95_ann_pq" -> "60aed0d214c5fa8d7fe4f1cfc2f8eddb",
    "q96_ann_ivfpq" -> "e4565fd1f0905a9bf95c8768f1ed40ee",
    "q100_image_neardup" -> "84434167b124398b7fab8c104d76ee28",
    "q101_audio_neardup" -> "88eaba48f0beaa79cb3a373ca531ef00",
    "q197_mst_boruvka" -> "57c2b1c3f06d19d15b25dc2b2c1f58ec",
    "q202_single_linkage" -> "8216770289aca659c791458e7e5cc580")

  for ((name, expected) <- goldenSf01) {
    test(s"$name canonical output matches the committed golden hash at sf0.01") {
      val actual = canonicalHash(name, "/root/testdata/sf0.01")
      assert(actual == expected, s"$name sf0.01 golden hash drifted: actual=$actual")
    }
  }
}
