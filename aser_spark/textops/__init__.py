"""Large-scale training-data pipeline operators over document/embedding
tables: deduplication, text analysis/quality, similarity search, and
multimodal column plumbing.

Everything is built from JVM-side pyspark.sql.functions (higher-order
functions, no Python UDFs) except the explicitly-stubbed multimodal
decoders, so plans stay inside whole-stage codegen and scale with
partitions.  Hash primitives are md5-hex based so a DuckDB oracle can
reproduce values bit-for-bit.
"""

from .dedup import (exact_duplicates, minhash_signatures, lsh_candidate_pairs,
                    near_dup_groups, ngram_jaccard_pairs, simhash)
from .quality import (document_fingerprint, grouped_quantiles, language_id,
                      quality_scores, repetition_stats, scored_documents,
                      scrub_pii, token_stats)
from .selection import (benchmark_contamination, budget_select,
                        chunk_documents, hash_sample, pack_documents,
                        stratified_hash_sample, temperature_mix_rates)
from .similarity import (brute_force_cosine_topk, embedding_near_duplicates,
                         fit_ivf_centroids, ivf_ann_topk, ivf_ann_topk_grid,
                         ivf_ann_topk_trained, hyperplane_signatures,
                         lsh_ann_topk, lsh_candidate_vector_pairs,
                         lsh_table_signatures, rademacher_planes,
                         suggest_n_planes)
