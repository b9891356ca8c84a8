#!/bin/bash
# sf1 oracle parity for the 2j tier (round-15 verdict ask #6): the
# driver's correctness gate runs at sf0.01, but keys with bounded
# anchors (doc_id < 200 etc.) have scale-dependent semantics — this
# proves engine and DuckDB oracle move in lockstep at 10x, writing
# CORRECTNESS_SF1.json. Usage: scripts/sf1_oracle.sh [sf1_dir]
set -e
SF1="${1:-/root/repo/target/sf1}"
OUT=/root/repo/target/verify_sf1
KEYS2J="contamination_check,curation_funnel,dedup_cluster,dedup_corpus_bloom,\
dedup_embedding,dedup_exact,dedup_lsh_parity,dedup_minhash_lsh,dedup_near,\
dedup_ngram_jaccard,dedup_resolve,dedup_simhash,dedup_substring,dedup_url,\
domain_mix,embed_kmeans,embed_pq,embed_quantize,embedding_normalize,\
multimodal_decode,multimodal_frames,multimodal_meta,pack_sequences,\
robust_bm25,robust_dedup_minhash,robust_multimodal,robust_partition_derive,\
robust_token_count,sample_cap_per_key,sample_stratified,shuffle_epoch,\
sim_ann_lsh,sim_cosine_topk,sim_hybrid_rrf,sim_ivf_index,sim_ivf_knn,\
sim_ivf_recall,sim_ivfpq_index,sim_ivfpq_recall,sim_ivfpq_rerank,\
sim_ivfpq_residual,sim_ivfpqr_recall,sim_ivfpqr_rerank,sim_knn_query,\
sim_lsh_parity,sim_pq_recall,split_train_test,text_bm25_topk,text_chunk,\
text_fingerprint,text_html_strip,text_langid,text_pii_redact,text_quality,\
text_rarity,text_repetition,text_stats,text_token_count,tf_top_terms,\
token_histogram"
rm -rf "$OUT"
SPARK_GRAFT_ONLY="$KEYS2J" "$(dirname "$0")/run.sh" graft.Verify "$SF1" "$OUT"
python3 "$(dirname "$0")/check_oracle.py" "$SF1" "$OUT" \
  /root/repo/CORRECTNESS_SF1.json
