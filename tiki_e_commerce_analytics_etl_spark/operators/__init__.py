"""Operator library: dedup, merge/upsert, reshape, quality, sessions,
similarity, text analysis, multimodal plumbing, sampling, skew
mitigation, and grouped-map time-series repair.

Submodules (import the module, call its functions):
  dedup       keep_latest, exact_dedup, minhash_lsh_candidates,
              simhash / simhash_df, ngram_jaccard_pairs
  merge       merge_upsert, merge_source_wins, antijoin_new_rows
  reshape     melt, union_concat
  quality     Check, run_checks, checks_report, summary
  sessions    sessionize, session_stats
  similarity  brute_force_topk, lsh_topk, ivf_topk, cosine_neardup_pairs
  text        words, token_count, lang_id, quality_score, fingerprint
  multimodal  extract_features, resize_images, frame_sample
  sampling    hash_sample, hash_split
  skew        with_salt, salted_count_distinct, salted_join_left_skewed
  grouped     resample_ffill_daily
"""
