package graft.queries

import graft.GQuery

/** L1–L7 + extended LLM-pipeline ops (SURVEY.md §2.10): dedup (exact,
  * MinHash, SimHash, n-gram Jaccard, embedding), similarity search, text
  * analysis (lang-id, quality, tokens, fingerprints), multimodal. */
object LlmQueries {
  def all: Seq[GQuery] = Seq.empty
}
