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
}
