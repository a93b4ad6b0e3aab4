package graft.catalog

/** FROZEN per-word Viterbi segmentation map behind the
  * q_unigram_train_round oracle: every distinct sf0.01 corpus word
  * segmented under the frozen SEED model
  * (tools/unigram_seed_model.json, exported by
  * graft.tools.UnigramSeedExport with full round-trip double logps) by
  * the INDEPENDENT replay tools/unigram_train_replay.py (from-scratch
  * DP over the documented kernel semantics — no Scala code shared).
  * One row per piece INSTANCE, so the oracle's freq-weighted re-count
  * is a plain join+sum over its SQL-derived word table; seeding,
  * survival floor, and ranking all stay pure SQL. Do not edit by hand;
  * regenerate with `unigram_train_replay.py <sf_dir> --scala` when the
  * corpus or seed hyperparameters change.
  */
object UnigramTrainPinned {
  val SegMapValues: String =
    """(VALUES
    |  ('a', 'a'),
    |  ('agg', 'agg'),
    |  ('batch', 'batc'),
    |  ('batch', 'h'),
    |  ('big', 'big'),
    |  ('column', 'co'),
    |  ('column', 'lumn'),
    |  ('customer', 'cust'),
    |  ('customer', 'omer'),
    |  ('data', 'data'),
    |  ('dup', 'dup'),
    |  ('fast', 'fast'),
    |  ('filter', 'filt'),
    |  ('filter', 'er'),
    |  ('group', 'g'),
    |  ('group', 'roup'),
    |  ('hash', 'hash'),
    |  ('join', 'join'),
    |  ('key', 'key'),
    |  ('line', 'line'),
    |  ('merge', 'merg'),
    |  ('merge', 'e'),
    |  ('order', 'orde'),
    |  ('order', 'r'),
    |  ('part', 'part'),
    |  ('query', 'quer'),
    |  ('query', 'y'),
    |  ('row', 'row'),
    |  ('scan', 'scan'),
    |  ('slow', 'slow'),
    |  ('small', 's'),
    |  ('small', 'mall'),
    |  ('sort', 'sort'),
    |  ('spark', 's'),
    |  ('spark', 'park'),
    |  ('stream', 'st'),
    |  ('stream', 'ream'),
    |  ('table', 'tabl'),
    |  ('table', 'e'),
    |  ('the', 'the'),
    |  ('value', 'valu'),
    |  ('value', 'e'),
    |  ('vector', 'vect'),
    |  ('vector', 'or'),
    |  ('window', 'wind'),
    |  ('window', 'ow')
    |) AS segmap(word, piece)""".stripMargin

  /** Round-2 sibling of [[SegMapValues]], for the DISTINGUISHING
    * q_unigram_train_round2 scenario (vocabSize=40, seedFactor=1 —
    * binding seed cut; two words re-segment and one piece dies in
    * round 2): the same distinct corpus words segmented under the
    * FROZEN ROUND-1 model of that scenario
    * (tools/unigram_round1_v40s1_model.json, exported by
    * graft.tools.UnigramRoundExport -- round-trip double logps) by the
    * same independent replay (`unigram_train_replay.py --model
    * unigram_round1_v40s1_model.json`). Backs the round-2 freq-weighted
    * re-count; regenerate alongside the round-1 map.
    */
  val SegMapValues2: String =
    """(VALUES
    |  ('a', 'a'),
    |  ('agg', 'a'),
    |  ('agg', 'g'),
    |  ('agg', 'g'),
    |  ('batch', 'batc'),
    |  ('batch', 'h'),
    |  ('big', 'b'),
    |  ('big', 'i'),
    |  ('big', 'g'),
    |  ('column', 'c'),
    |  ('column', 'o'),
    |  ('column', 'lu'),
    |  ('column', 'm'),
    |  ('column', 'n'),
    |  ('customer', 'c'),
    |  ('customer', 'u'),
    |  ('customer', 'st'),
    |  ('customer', 'o'),
    |  ('customer', 'mer'),
    |  ('data', 'd'),
    |  ('data', 'a'),
    |  ('data', 'ta'),
    |  ('dup', 'd'),
    |  ('dup', 'u'),
    |  ('dup', 'p'),
    |  ('fast', 'f'),
    |  ('fast', 'a'),
    |  ('fast', 'st'),
    |  ('filter', 'f'),
    |  ('filter', 'i'),
    |  ('filter', 'l'),
    |  ('filter', 't'),
    |  ('filter', 'er'),
    |  ('group', 'g'),
    |  ('group', 'ro'),
    |  ('group', 'u'),
    |  ('group', 'p'),
    |  ('hash', 'hash'),
    |  ('join', 'join'),
    |  ('key', 'k'),
    |  ('key', 'e'),
    |  ('key', 'y'),
    |  ('line', 'l'),
    |  ('line', 'in'),
    |  ('line', 'e'),
    |  ('merge', 'mer'),
    |  ('merge', 'g'),
    |  ('merge', 'e'),
    |  ('order', 'or'),
    |  ('order', 'd'),
    |  ('order', 'er'),
    |  ('part', 'par'),
    |  ('part', 't'),
    |  ('query', 'q'),
    |  ('query', 'u'),
    |  ('query', 'er'),
    |  ('query', 'y'),
    |  ('row', 'row'),
    |  ('scan', 's'),
    |  ('scan', 'c'),
    |  ('scan', 'an'),
    |  ('slow', 's'),
    |  ('slow', 'l'),
    |  ('slow', 'ow'),
    |  ('small', 's'),
    |  ('small', 'm'),
    |  ('small', 'al'),
    |  ('small', 'l'),
    |  ('sort', 's'),
    |  ('sort', 'or'),
    |  ('sort', 't'),
    |  ('spark', 's'),
    |  ('spark', 'par'),
    |  ('spark', 'k'),
    |  ('stream', 'st'),
    |  ('stream', 'r'),
    |  ('stream', 'e'),
    |  ('stream', 'a'),
    |  ('stream', 'm'),
    |  ('table', 'ta'),
    |  ('table', 'b'),
    |  ('table', 'l'),
    |  ('table', 'e'),
    |  ('the', 't'),
    |  ('the', 'h'),
    |  ('the', 'e'),
    |  ('value', 'v'),
    |  ('value', 'al'),
    |  ('value', 'ue'),
    |  ('vector', 'v'),
    |  ('vector', 'e'),
    |  ('vector', 'c'),
    |  ('vector', 't'),
    |  ('vector', 'or'),
    |  ('window', 'w'),
    |  ('window', 'in'),
    |  ('window', 'd'),
    |  ('window', 'ow')
    |) AS segmap(word, piece)""".stripMargin
}
