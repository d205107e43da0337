#!/usr/bin/env python3
"""Split operators/ExtensionQueries.scala (12.6k lines) into per-domain
registries + one shared-helpers object, preserving the registry order
exactly (memoized standing tables mean first-access pays the build cost,
so bench ordering must be stable)."""
import re, sys, os

SRC = "src/main/scala/graft/operators/ExtensionQueries.scala"
lines = open(SRC).read().split("\n")  # 0-based

# Boundaries (1-based from inspection): head 1-17, helpers 18-296,
# "val all" 297, first Q 299, Seq close ")" 11924, tail helpers 11925-12648, "}" 12649
assert lines[16] == "object ExtensionQueries {", lines[16]
assert lines[296].strip() == "val all: Seq[Q] = Seq(", lines[296]

# find the Seq close: the line "  )" after the last Q chunk
qstarts = [i for i, l in enumerate(lines) if re.match(r'^\s*Q\("', l)]
# Seq close = first line after last chunk that is exactly "  )"
close = None
for i in range(qstarts[-1], len(lines)):
    if lines[i] == "  )":
        close = i
        break
assert close is not None
tail_end = len(lines) - 1
while lines[tail_end].strip() == "":
    tail_end -= 1
assert lines[tail_end] == "}", lines[tail_end]

head = lines[0:9]            # package + imports (lines 1-9)
helpers_head = lines[17:296] # between "object ... {" and "val all"
tail_helpers = lines[close + 1:tail_end]

# chunks: name -> list of lines
chunks = []
for idx, s in enumerate(qstarts):
    e = qstarts[idx + 1] if idx + 1 < len(qstarts) else close
    name = re.match(r'^\s*Q\("([^"]+)"', lines[s]).group(1)
    body = lines[s:e]
    # strip trailing blank lines of each chunk
    while body and body[-1].strip() == "":
        body.pop()
    chunks.append((name, body))
order = [n for n, _ in chunks]
assert len(chunks) == 257, len(chunks)

D = {}
def assign(domain, names):
    for n in names.split():
        D[n] = domain

assign("DedupQueries", """
q20_dedup_exact q21_doc_fingerprint q36_minhash_md5 q54_minhash_group_agg
q37_jaccard_pairs q52_simhash_md5 q53_lsh_neighbors q44_neardup_portable
q61_dedup_clusters q63_dedup_corpus q67_incremental_neardup q96_repeated_spans
q101_incremental_clusters q102_dedup_segments q109_containment_pairs
q127_neardup_explain q128_source_overlap q129_lsh_recall
q171_exact_substr_spans q172_exact_substr_cut q180_incremental_substr
q185_allpairs_join q194_template_dedup q68_decontamination
q118_bloom_decontamination q123_leakage_safe_split""")
assign("DedupReportQueries", """
q199_cluster_sizes q219_cluster_size_histogram q220_dup_rate_by_source
q227_dedup_token_savings q232_contamination_matrix q239_lsh_parameter_sweep
q255_minhash_calibration q256_neardup_source_matrix""")
assign("SimilarityQueries", """
q27_cosine_pairs q28_ann_topk q42_ivf_topk q47_label_centroids
q62_ivf_multiprobe q78_semantic_dedup q86_incremental_assign
q97_quantize_int8 q98_hash_features q99_quantized_ann q122_ann_recall
q136_hnsw_levels q137_hnsw_ann q138_hnsw_incremental q143_pq_codes
q144_pq_adc q145_pq_rerank q155_rp_project q156_rp_topk""")
assign("SimilarityReportQueries", """
q176_hard_negatives q184_embedding_drift q196_contrastive_pairs
q204_ann_bakeoff q205_mmr_diversify q209_cluster_quality q210_margin_mining
q260_embedding_norms q261_embedding_dims q279_embedding_contrast""")
assign("RetrievalQueries", """
q35_term_freq q76_bm25 q77_inverted_index q81_pmi_bigrams
q85_bm25_multiquery q92_incremental_index q94_hybrid_rrf
q115_champion_rerank q105_champion_pairs q167_passage_retrieval
q193_kwic_snippets q203_retrieval_metrics q206_cooccurrence_lift
q213_incremental_cooccur q223_vocab_overlap q234_vocab_drift
q237_source_lang_pmi q257_stopword_profile""")
assign("TextQueries", """
q22_token_count q23_text_quality q24_lang_stopwords q48_lang_classify
q38_lang_stats q41_bpe_tokens q60_repetition_metrics q72_quality_filter
q83_lm_score q139_bpe_merges q140_bpe_encode q141_bpe_incremental
q148_gopher_repetition q149_pii_scan q150_pii_redact q151_gopher_gate
q152_ccnet_buckets q153_nb_model q154_nb_classify q158_kn_score
q166_bpe_fertility q168_kn3_score q179_c4_clean q181_gazetteer_tags
q244_tokenizer_fertility""")
assign("TextReportQueries", """
q89_quality_representative q126_adaptive_quality q146_dsir_importance
q147_dsir_sample q195_ngram_novelty q216_lexical_diversity q217_zipf_slope
q226_bigram_novelty q228_incremental_novelty q233_quality_calibration
q238_filter_attribution q253_length_profile q254_good_turing
q225_pii_density_by_source""")
assign("EventQueries", """
q25_events_hourly q26_events_sliding q33_events_props q34_sessions
q43_asof_join q58_recent_pairs q87_funnel q88_cohort_retention
q103_range_join q108_sliding_windows q169_asof_tolerance
q183_event_anomalies q191_event_transitions q192_behavior_scores
q198_interarrival_sla q201_seasonal_baseline q202_theil_sen_trend
q208_attribution q211_decayed_engagement q221_event_burstiness
q224_hourly_entropy q252_attribution_windows q259_props_profile
q267_session_funnel q268_ab_lift q275_asof_staleness q280_weekly_churn""")
assign("SketchQueries", """
q80_kmv_distinct q84_profile q95_incremental_profile q106_heavy_hitters
q111_value_percentiles q113_incremental_hh q116_bisect_quantiles
q120_group_quantiles q121_psi_drift q124_count_min q130_cm_join_estimate
q132_psi_by_type q133_kll_quantiles q134_kll_merged q173_hll_distinct
q174_hll_merged q200_hll_overlap q240_ks_drift q258_benford
q51_value_outliers q186_winsorize q187_mad_outliers""")
assign("GraphQueries", """
q82_pagerank q110_triangles q119_incremental_degrees
q197_clustering_coefficients q207_kcore q104_fuzzy_join
q157_entity_resolution q159_incremental_entities q182_golden_records""")
assign("MediaQueries", """
q31_media_stats q32_media_features q69_image_decode q70_audio_decode
q71_video_frames q75_mjpeg_frames q160_image_ahash q161_image_neardup
q162_audio_fingerprint q163_audio_neardup q164_video_frame_hashes
q165_video_neardup""")
assign("MixingQueries", """
q64_stratified_sample q65_pack_sequences q66_corpus_mix q90_encode_tokens
q91_tokenizer_feed q100_incremental_pack q107_quota_sample
q112_weighted_sample q117_zorder_stats q131_zorder3_stats
q135_zorder_incremental q175_unimax_alloc q177_sft_pack q188_hilbert_stats
q190_training_manifest q212_padding_waste q215_mixture_entropy
q218_temperature_sampling q274_fold_balance q73_curated_corpus
q74_chunk_fnv_portable q170_corpus_datacard q276_threshold_sweep
q278_curation_attrition q114_bloom_semijoin""")
assign("StreamedQueries", """
q214_streamed_cooccur q229_streamed_bins q230_streamed_seasonal
q231_streamed_assign q235_streamed_sessions q236_streamed_degrees
q241_streamed_nb q242_streamed_index q243_streamed_bpe q245_streamed_scd2
q246_streamed_neardups q247_streamed_curation q248_streamed_quality
q249_streamed_hh q250_streamed_cm q251_streamed_tumbling""")
assign("CardQueries", """
q39_running_totals q40_set_ops q45_rollup q50_cube q46_pivot
q56_salted_agg q57_salted_join q79_scd2_status q93_scd2_upsert
q125_join_diagnostics q142_snapshot_diff q178_constraint_checks
q189_fk_checks q222_length_gini q262_rfm_segments q263_pareto_revenue
q264_order_aging q265_basket_support q266_price_dispersion
q269_nation_trade q270_supplier_hhi q271_segment_mix q272_release_notes
q273_gain_curve q277_discount_corr q281_brand_size_pivot""")

unassigned = [n for n in order if n not in D]
if unassigned:
    print("UNASSIGNED:", unassigned)
    sys.exit(1)
extra = set(D) - set(order)
if extra:
    print("EXTRA:", sorted(extra))
    sys.exit(1)

# group
from collections import OrderedDict
domains = OrderedDict()
for name, body in chunks:
    domains.setdefault(D[name], []).append((name, body))

IMPORTS = """
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Dedup, Graph, Hnsw, Layout, Mixing, NaiveBayes, Pii, Projection, Retrieval, Similarity, Sketches, TextAnalysis}
import graft.sources.{Tables, VersionedTable}
import ParityQueries.Q
import ExtensionShared._
""".strip("\n")

DOCS = {
    "DedupQueries": "Exact/near-duplicate detection: hash dedup, MinHash+LSH banding, SimHash, exact-substring spans (Lee et al.), AllPairs prefix filtering, connected-component clustering, decontamination, incremental variants.",
    "DedupReportQueries": "Dedup observability cards: cluster-size reports, dup-rate matrices, LSH parameter sweeps, contamination matrices.",
    "SimilarityQueries": "Embedding similarity search: brute-force cosine, IVF (Lloyd-refined) + multiprobe, HNSW shards, PQ/int8/RP quantization, SemDeDup, incremental assignment.",
    "SimilarityReportQueries": "Embedding-space analysis cards: drift, contrastive/hard-negative mining, ANN bakeoff, MMR diversification, cluster quality.",
    "RetrievalQueries": "Lexical retrieval: BM25 (single/multi-query), inverted index, hybrid RRF, passage retrieval, KWIC, PMI/co-occurrence, vocabulary overlap/drift.",
    "TextQueries": "Text analysis kernels: token counting, language ID, quality gates (Gopher/C4/CCNet), PII scan/redact, BPE train/encode, n-gram LM scoring, NB classify.",
    "TextReportQueries": "Text-corpus report cards: quality calibration, DSIR importance, novelty, lexical diversity, Zipf/Good-Turing, length profiles.",
    "EventQueries": "Event-time analytics: tumbling/sliding windows, sessionization, funnels, cohort retention, as-of joins, anomaly/seasonality/attribution.",
    "SketchQueries": "Mergeable sketches and robust stats: KLL, HLL, KMV, Count-Min, heavy hitters, quantiles, PSI/KS drift, winsorize/MAD, Benford.",
    "GraphQueries": "Graph + record linkage: PageRank, triangles, k-core, clustering coefficients, fuzzy-match entity resolution and golden records.",
    "MediaQueries": "Multimodal binary columns: PNG/WAV/GVID/MJPEG decode, perceptual hashes, media near-dup joins.",
    "MixingQueries": "Corpus curation and layout: stratified/weighted/quota sampling, sequence packing, corpus mixing, z-order/Hilbert layout, manifests, curation pipeline.",
    "StreamedQueries": "Structured Streaming end-state twins: restartable micro-batch waves whose terminal tables are oracle-checked against the batch formulation.",
    "CardQueries": "Relational/procurement analytics cards: rollup/cube/pivot, SCD2, salted agg/join, FK checks, RFM/Pareto/HHI and other dashboard cards.",
}

outdir = "src/main/scala/graft/operators"
report = []
for dom, items in domains.items():
    body = []
    for name, b in items:
        body.extend(b)
        body.append("")
    if body and body[-1] == "":
        body.pop()
    text = "\n".join(head[:1]) + "\n\n" + IMPORTS + "\n\n" + \
        "/** " + DOCS[dom] + "\n  *\n  * One domain registry of the extension surface; composed (in the\n  * original, order-stable sequence) by [[ExtensionQueries.all]].\n  */\n" + \
        f"object {dom} {{\n\n  val all: Seq[Q] = Seq(\n\n" + "\n".join(body) + "\n  )\n}\n"
    path = os.path.join(outdir, dom + ".scala")
    open(path, "w").write(text)
    report.append((dom, len(items), text.count("\n") + 1))

# shared helpers object
def relax(ls):
    out = []
    for l in ls:
        l = re.sub(r"^(\s*)private (val|def|lazy val)", r"\1private[operators] \2", l)
        out.append(l)
    return out

shared = "\n".join(head[:1]) + "\n\n" + "\n".join([
    "import org.apache.spark.sql.Column",
    "import org.apache.spark.sql.functions._",
    "import org.apache.spark.sql.types.DecimalType",
    "",
    "import graft.functions.{Dedup, Graph, Hnsw, Layout, Mixing, NaiveBayes, Pii, Projection, Retrieval, Similarity, Sketches, TextAnalysis}",
    "import graft.sources.{Tables, VersionedTable}",
]) + "\n\n" + \
"""/** Helpers shared by the per-domain extension registries: memoized
  * standing tables (near-dup clusters, entity components, media
  * payloads, incremental-dedup indexes) and the multi-query oracle SQL
  * CTE chains. Formerly the private header/footer of the monolithic
  * ExtensionQueries object.
  */
private[operators] object ExtensionShared {
""" + "\n".join(relax(helpers_head)) + "\n" + "\n".join(relax(tail_helpers)) + "\n}\n"
open(os.path.join(outdir, "ExtensionShared.scala"), "w").write(shared)
report.append(("ExtensionShared", 0, shared.count("\n") + 1))

# new ExtensionQueries.scala: order-stable composition
order_lines = ",\n".join('    "%s"' % n for n in order)
dom_concat = " ++\n    ".join(f"{d}.all" for d in domains)
eq = "\n".join(head[:1]) + "\n\nimport ParityQueries.Q\n\n" + \
"""/** The training-data-pipeline extension surface (BASELINE.json north star):
  * dedup, text analysis, similarity search, event-time windows — run over
  * the driver's documents/embeddings/events tables, oracle-checked in
  * DuckDB wherever the computation is portable (exact integer/decimal math,
  * sequential float folds), rows-only otherwise.
  *
  * The registry itself lives in per-domain objects (DedupQueries,
  * SimilarityQueries, StreamedQueries, ...); this object composes them
  * back into the ORIGINAL registry order. Order is behaviourally neutral
  * for correctness but not for the bench: memoized standing tables
  * (ExtensionShared.clustersTable et al.) charge their one-time build to
  * whichever query touches them first, so a stable sequence keeps
  * per-query timings comparable across rounds.
  */
object ExtensionQueries {

  private val domains: Seq[Q] =
    """ + dom_concat + """

  /** Original (pre-split) registry sequence — the bench-stable order. */
  private val order: Seq[String] = Seq(
""" + order_lines + """
  )

  val all: Seq[Q] = {
    val byName = domains.map(q => q.name -> q).toMap
    require(byName.size == domains.size, "duplicate query name in domain registries")
    require(byName.size == order.size && order.forall(byName.contains),
      "domain registries drifted from the canonical order list")
    order.map(byName)
  }
}
"""
open(SRC, "w").write(eq)

for dom, n, ln in report:
    print(f"{dom:28s} {n:4d} queries {ln:6d} lines")
print("TOTAL chunks:", sum(n for _, n, _ in report))
