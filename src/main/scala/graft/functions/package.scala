package graft

import org.apache.spark.sql.{Column, GraftShim}

/** Column-level DSL over the engine's custom Catalyst expressions.
  * Mirrors `org.apache.spark.sql.functions`' style.
  */
package object functions {
  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftShim.column(e)
  private def ex(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    GraftShim.expression(c)

  /** Big-endian uint64 decode of a replay-ID buffer (eventParser.js:160-162). */
  def decode_replay_id(c: Column): Column = col(DecodeReplayId(ex(c)))

  /** Big-endian 8-byte encode of a replay ID (eventParser.js:170-174). */
  def encode_replay_id(c: Column): Column = col(EncodeReplayId(ex(c)))

  /** CDC field-bitmap expansion (eventParser.js:79-152). */
  def expand_bitmap(bitmaps: Column, fields: Column, childFields: Column): Column =
    col(ExpandBitmap(ex(bitmaps), ex(fields), ex(childFields)))

  /** Cosine similarity of two float32 vectors (double result). */
  def cosine_similarity(a: Column, b: Column): Column =
    col(CosineSimilarity(ex(a), ex(b)))

  /** Dot product of two float32 vectors (double result). */
  def dot_product(a: Column, b: Column): Column = col(DotProduct(ex(a), ex(b)))

  /** Fused fixed-point-quantize + exact int64 dot of two float32
    * vectors (codegen'd; bit-identical to quantize-then-fold).
    */
  def int_dot_q(a: Column, b: Column): Column = col(IntDotQ(ex(a), ex(b)))

  /** Euclidean norm of a float32 vector (double result). */
  def l2_norm(vec: Column): Column = col(L2Norm(ex(vec)))

  /** Element-wise mean of equal-length vectors (native aggregate: one dense
    * buffer per group, map-side combinable — no posexplode shuffle). */
  def vector_avg(vec: Column): Column =
    col(VectorAvg(ex(vec)).toAggregateExpression())

  /** Container-header sniff of a binary media payload:
    * `struct<format, width, height>` (png/jpeg/bmp/gif/unknown). */
  def media_header(content: Column): Column = col(MediaHeader(ex(content)))

  /** Lower 64 bits of md5 (little-endian) — DuckDB `md5_number_lower` compatible. */
  def md5_lower64(c: Column): Column = col(Md5Lower64(ex(c)))

  /** 32-bit SimHash over a token array. */
  def simhash32(tokens: Column): Column = col(SimHash(ex(tokens), 32))

  /** 64-bit SimHash over a token array. */
  def simhash64(tokens: Column): Column = col(SimHash(ex(tokens), 64))

  /** 128-bit SimHash over a token array, as `[hi, lo]` longs. */
  def simhash128(tokens: Column): Column = col(SimHash128(ex(tokens)))

  /** 64-bit polynomial rolling hash of a string. */
  def rolling_hash(c: Column): Column = col(RollingHash(ex(c)))

  /** Hyperplane-LSH band keys (`bands` keys of `planesPerBand` sign bits)
    * for a float32 vector — one codegen'd multiply-add pass. */
  def hyperplane_bands(vec: Column, planesPerBand: Int, bands: Int): Column =
    col(HyperplaneBands(ex(vec), planesPerBand, bands))

  /** Per-band probe-key lists (`[key, probe keys…]` per band) for
    * query-directed multi-probe LSH — flips subsets (≤ probeBits) of the
    * probePlanes lowest-|margin| planes. */
  def hyperplane_probes(vec: Column, planesPerBand: Int, bands: Int,
                        probeBits: Int, probePlanes: Int): Column =
    col(HyperplaneProbes(ex(vec), planesPerBand, bands, probeBits, probePlanes))

  /** Symmetric int8 quantization of a float32 vector (one byte/dim). */
  def i8_quantize(vec: Column): Column = col(Int8Quantize(ex(vec)))

  /** Per-vector dequantization scale (`max |v| / 127`). */
  def i8_scale(vec: Column): Column = col(Int8Scale(ex(vec)))

  /** Cosine over int8-quantized payloads — exact integer accumulation. */
  def cosine_i8(a: Column, b: Column): Column = col(Int8Cosine(ex(a), ex(b)))

  /** Distinct word n-gram shingles of a text column, one pass, codegen'd. */
  def word_shingles(text: Column, n: Int): Column = col(WordShingles(ex(text), n))

  /** MinHash signature (k slots) of a shingle set — one xxhash + k affine
    * transforms per shingle, codegen'd. */
  def minhash_signature(shingles: Column, k: Int): Column =
    col(MinHashSignature(ex(shingles), k))

  /** Per-event Avro decode against a schema JSON (P1); null on corrupt
    * payloads so failures can dead-letter (S10). */
  def avro_decode(payload: Column, schemaJson: String): Column =
    col(AvroDecode(ex(payload), schemaJson))

  /** Avro encode of a struct column for publish (P2). */
  def avro_encode(record: Column, schemaJson: String): Column =
    col(AvroEncode(ex(record), schemaJson))

  /** Bloom filter over a column of 64-bit hashes (map-side-combinable
    * native aggregate; `binary` result). */
  def bloom_agg(hash: Column, expectedItems: Long, fpp: Double = 0.01): Column =
    col(BloomAgg(ex(hash), expectedItems, fpp).toAggregateExpression())

  /** Membership probe against a serialized Bloom filter COLUMN (codegen'd;
    * per-row byte-array copy is inherent to the column form — prefer
    * [[bloom_broadcast_probe]] for large probe sides). */
  def bloom_might_contain(filter: Column, hash: Column): Column =
    col(BloomMightContain(ex(filter), ex(hash)))

  /** Membership probe against a torrent-broadcast serialized Bloom filter:
    * zero per-row filter traffic, one deserialization per task — the
    * Spark-runtime-filter shape for probing billions of rows. */
  def bloom_broadcast_probe(
      filter: org.apache.spark.broadcast.Broadcast[Array[Byte]],
      hash: Column): Column =
    col(BloomBroadcastProbe(filter, ex(hash)))

  /** Mergeable KLL quantile sketch of a double column (`binary` result —
    * storable and re-mergeable, unlike approx_percentile). */
  def kll_agg(c: Column, k: Int = 200): Column =
    col(KllAgg(ex(c), k).toAggregateExpression())

  /** Map-side subword encoding of a token array through a torrent-broadcast
    * `word -> tokens` dictionary (zero-shuffle tokenization; unseen words
    * fall back to characters + `fallbackMark`). */
  def bpe_dict_encode(
      dict: org.apache.spark.broadcast.Broadcast[Array[(String, Array[String])]],
      fallbackMark: String, tokens: Column): Column =
    col(BpeDictEncode(dict, fallbackMark, ex(tokens)))

  /** Map-side subword-ID encoding: token array → flattened int-id stream
    * through broadcast `word -> ids` + `symbol -> id` dictionaries. */
  def bpe_dict_encode_ids(
      dict: org.apache.spark.broadcast.Broadcast[Array[(String, Array[Int])]],
      symIds: org.apache.spark.broadcast.Broadcast[Array[(String, Int)]],
      fallbackMark: String, unkId: Int, tokens: Column): Column =
    col(BpeDictEncodeIds(dict, symIds, fallbackMark, unkId, ex(tokens)))

  /** Re-merge stored KLL sketches into one (shard profiles → corpus). */
  def kll_merge_agg(sketch: Column, k: Int = 200): Column =
    col(KllMergeAgg(ex(sketch), k).toAggregateExpression())

  /** Mergeable Misra–Gries heavy-hitter sketch of a string column
    * (`binary` result — bounded `capacity` counters; every item with
    * frequency > N/(capacity+1) guaranteed present). */
  def mg_agg(c: Column, capacity: Int = 256): Column =
    col(MgAgg(ex(c), capacity).toAggregateExpression())

  /** Re-merge stored MG sketches (shard profiles → corpus hitters). */
  def mg_merge_agg(sketch: Column, capacity: Int = 256): Column =
    col(MgMergeAgg(ex(sketch), capacity).toAggregateExpression())

  /** Per-row character counts + Σ p·ln p fold in one JVM pass
    * (struct<n, n_distinct, sum_plnp>; input must be pre-lowered). */
  def char_entropy_stats(c: Column): Column = col(CharEntropyStats(ex(c)))

  /** Per-group top-n `value`s by (score desc, value asc), best-first —
    * mergeable bounded buffer: partials carry ≤ n entries per group per
    * task (a window would shuffle every candidate row). */
  def top_n_by(value: Column, score: Column, n: Int): Column =
    col(TopNBy(ex(value), ex(score), n).toAggregateExpression())

  /** [[top_n_by]] keeping the scores: per-group top-n as
    * `array<struct<v, s>>` best-first (score desc, value asc) — for
    * consumers that need the score in the output; `posexplode` yields
    * the window-equivalent rank as `pos + 1`. */
  def top_n_by_scored(value: Column, score: Column, n: Int): Column =
    col(TopNByScored(ex(value), ex(score), n).toAggregateExpression())

  /** Per-group row with the maximum `ord` (hash-aggregable latest-wins
    * over an arbitrary struct payload — `max_by(struct)` demotes to
    * SortAggregate; this stays an ObjectHashAggregate with map-side
    * partials). Deterministic byte-order tie-break on duplicate ords. */
  def max_by_row(row: Column, ord: Column): Column =
    col(MaxByRow(ex(row), ex(ord)).toAggregateExpression())

  /** Decode an MG sketch's survivors as
    * `array<struct<item, est>>` ordered by (est desc, item). */
  def mg_items(sketch: Column): Column = col(MgItems(ex(sketch)))

  /** Decode a binary payload to `w·h` gray pixels through `decoder`
    * (codec seam; default tiles payload bytes deterministically). */
  def gray_decode(decoder: GrayDecoder, content: Column,
                  w: Column, h: Column): Column =
    col(GrayDecode(decoder, ex(content), ex(w), ex(h)))

  /** Encode `w·h` gray pixels as a real PNG container (JDK writer;
    * lossless — pixels round-trip exactly through [[ImageIoDecoder]]). */
  def png_gray_encode(pixels: Column, w: Column, h: Column): Column =
    col(PngGrayEncode(ex(pixels), ex(w), ex(h)))

  /** Nearest-neighbor resample of a gray pixel buffer to `outW·outH`. */
  def gray_resize(outW: Int, outH: Int, pixels: Column,
                  w: Column, h: Column): Column =
    col(GrayResize(outW, outH, ex(pixels), ex(w), ex(h)))

  /** Per-p×p-patch brightness mean/std (ViT patchify summary). */
  def gray_patch_stats(p: Int, pixels: Column, w: Column, h: Column): Column =
    col(GrayPatchStats(p, ex(pixels), ex(w), ex(h)))

  /** One-pass count / mean / flattened d×d second-moment aggregate of a
    * vector column (map-side-combinable; the covariance input of
    * whitening). */
  def vector_moments(c: Column): Column =
    col(VectorMoments(ex(c)).toAggregateExpression())

  /** `W · (v − μ)` against a broadcast row-major matrix + mean — linear
    * embedding post-processing as a zero-shuffle codegen'd map. */
  def mat_vec_center(
      w: org.apache.spark.broadcast.Broadcast[Array[Double]],
      mean: org.apache.spark.broadcast.Broadcast[Array[Double]],
      vec: Column): Column =
    col(MatVecCenter(w, mean, ex(vec)))

  /** LE signed-16-bit PCM decode + per-frame RMS/ZCR/peak features. */
  def pcm16_frames(frameLen: Int, content: Column): Column =
    col(Pcm16Frames(frameLen, ex(content)))

  /** Greedy longest-match WordPiece segmentation of a token array against
    * a torrent-broadcast piece vocabulary (zero-shuffle tokenization). */
  def wordpiece_encode(
      pieces: org.apache.spark.broadcast.Broadcast[Array[String]],
      unk: String, tokens: Column): Column =
    col(WordPieceEncode(pieces, unk, ex(tokens)))

  /** Viterbi max-likelihood Unigram-LM segmentation of a token array
    * against a torrent-broadcast `(piece, llp_nano, id)` model
    * (zero-shuffle tokenization; SentencePiece inference). */
  def unigram_encode(
      model: org.apache.spark.broadcast.Broadcast[Array[(String, Long, Int)]],
      unk: String, tokens: Column): Column =
    col(UnigramEncode(model, unk, ex(tokens)))

  /** Integer-id sibling of [[unigram_encode]]: the flattened piece-id
    * stream under the model's dense frequency-sorted assignment. */
  def unigram_encode_ids(
      model: org.apache.spark.broadcast.Broadcast[Array[(String, Long, Int)]],
      unkId: Int, tokens: Column): Column =
    col(UnigramEncodeIds(model, unkId, ex(tokens)))

  /** Sampled Unigram segmentation ∝ Π p(piece)^alpha (subword
    * regularization) — content-addressed uniforms from (seed, docKey,
    * position, word); zero-shuffle. */
  def unigram_sample_encode(
      model: org.apache.spark.broadcast.Broadcast[Array[(String, Long, Int)]],
      alpha: Double, seed: Long, unk: String,
      docKey: Column, tokens: Column): Column =
    col(UnigramSampleEncode(model, alpha, seed, unk, ex(docKey), ex(tokens)))

  /** One word's Unigram-LM E-step contribution: expected piece counts on
    * the micro grid as `array<struct<pid, c_micro>>`. */
  def unigram_expected(
      model: org.apache.spark.broadcast.Broadcast[Array[(String, Long, Int)]],
      word: Column, cnt: Column): Column =
    col(UnigramExpected(model, ex(word), ex(cnt)))

  /** Mergeable theta distinct sketch of a string column (`binary` —
    * storable, unionable, intersectable; exact below 2^lgK entries). */
  def theta_agg(c: Column, lgK: Int = 12): Column =
    col(ThetaAgg(ex(c), lgK).toAggregateExpression())

  /** Union stored theta sketches (shard profiles → corpus set). */
  def theta_union_agg(sketch: Column, lgK: Int = 12): Column =
    col(ThetaUnionAgg(ex(sketch), lgK).toAggregateExpression())

  /** Distinct estimate of a serialized theta sketch. */
  def theta_estimate(sketch: Column): Column = col(ThetaEstimate(ex(sketch)))

  /** Pairwise intersection of two serialized theta sketches. */
  def theta_intersect(a: Column, b: Column): Column =
    col(ThetaIntersect(ex(a), ex(b)))

  /** Pairwise a-not-b of two serialized theta sketches. */
  def theta_a_not_b(a: Column, b: Column): Column =
    col(ThetaANotB(ex(a), ex(b)))

  /** Exact integer dot product of per-row (bucket, count) arrays against
    * a torrent-broadcast dense weight array (bias at index 0) — the
    * zero-shuffle LR margin kernel. */
  def bucket_weight_sum(
      weights: org.apache.spark.broadcast.Broadcast[Array[Long]],
      buckets: Column, counts: Column): Column =
    col(BucketWeightSum(weights, ex(buckets), ex(counts)))

  /** LR gradient accumulator: per-row `r · cnts(i)` folded into slot
    * `bs(i)+1` of a fixed `size`-slot long array (bias pseudo-feature
    * `b = -1` at slot 0), partial-aggregating — one ~8·size-byte row per
    * map task crosses the exchange per training iteration. */
  def bucket_grad_sum(bs: Column, cnts: Column, r: Column,
                      size: Int): Column =
    col(BucketGradSum(ex(bs), ex(cnts), ex(r), size)
      .toAggregateExpression())

  /** Extract quantiles at `ranks` from a serialized KLL sketch column. */
  def kll_quantiles(sketch: Column, ranks: Seq[Double]): Column =
    col(KllQuantiles(ex(sketch), ranks))

  /** Asymmetric-distance score of a PQ code word against a query lookup
    * table (m byte lookups per vector — the PQ scan kernel). */
  def pq_adc_score(codes: Column, lut: Column): Column =
    col(PqAdcScore(ex(codes), ex(lut)))

  /** Nearest-centroid PQ code assignment in one map pass (the PQ
    * train/encode kernel — no subvector×codebook join). */
  def pq_encode(vec: Column, flatBooks: Column, m: Int, ksub: Int): Column =
    col(PqEncode(ex(vec), ex(flatBooks), m, ksub))
}
