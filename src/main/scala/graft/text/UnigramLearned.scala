package graft.text

/** The frozen Viterbi-EM cost table behind `q_unigram_learn`: minted by
  * `runMain graft.UnigramTrain /root/testdata/sf0.01 3 --bigrams` over
  * the sf0.01 bigram pre-token corpus and checked in as a RESOURCE (per
  * the r19 verdict watch-item: frozen vocabularies go in resource files
  * with a checksum, not as src/main data literals — `BpeLearn1k` stays
  * a literal as the grandfathered first instance). The md5 pin makes a
  * silently edited or re-minted-without-review table fail at class
  * load; re-mint intentionally with UnigramTrain and update BOTH the
  * file and the constant. The `q_unigram_learn` query trains LIVE and
  * must reproduce this table at sf0.01 — the green hash verifies
  * training determinism itself, exactly the `q_bpe_learn1k` pattern.
  * Unlike that row, q_unigram_learn also passes at sf0.1: the table
  * trained there differs in its integer costs but induces identical
  * segmentations (measured r20) — exact table reproduction is only
  * guaranteed at sf0.01, count coincidence elsewhere is observed. */
object UnigramLearned {

  private val ResourcePath = "/graft/unigram_costs_sf001.tsv"
  private val Md5 = "d86e54cc4920bc97d804a305b8d17681"

  /** (piece, cost) rows in the file's (cost asc, piece asc) order. */
  lazy val Costs: Seq[(String, Long)] = {
    val in = getClass.getResourceAsStream(ResourcePath)
    require(in != null, s"resource $ResourcePath missing from classpath")
    val bytes = try in.readAllBytes() finally in.close()
    val got = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    require(got == Md5,
      s"$ResourcePath md5 $got != pinned $Md5 — re-minted without review? " +
        "Regenerate with graft.UnigramTrain and update the pin together.")
    new String(bytes, "UTF-8").linesIterator.filter(_.nonEmpty).map { l =>
      val i = l.indexOf('\t')
      require(i > 0, s"malformed cost line: $l")
      (l.substring(0, i), l.substring(i + 1).toLong)
    }.toSeq
  }
}
