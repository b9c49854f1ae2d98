#!/bin/bash
# sf10 spot-certification of the PAIR-GROWTH dedup families (VERDICT r07
# next-#4): the sf1 cert showed their cost rides candidate-pair count
# (C(g,2) per g-member near-dup group); this run scales the HAZARD
# VARIABLE — dup-group size g — by 100 instead of 10, at a tractable
# total size, by replicating sf0.01 with GenScale factor 100 (50k docs,
# 500 rotation groups of 100 → C(100,2)=4950 candidate pairs per group,
# 110x the per-group pairs of the sf1 cert). Prove: per-query cost stays
# linear in candidate pairs, the shingle df-cap keeps the inverted index
# bounded (per-shingle df = group size = 100, under the 500 cap), and no
# query goes super-linear beyond its pair growth.
#
# x_sim_topk_brute is excluded (declared quadratic); x_dedup_semantic
# runs with its corpus-scaled blocking (k ∝ N/250).
set -e
cd "$(dirname "$0")/.."

# r12: the full-list OOM was root-caused to the hygiene sweep's
# non-blocking unpersist leaving ~7.4 GB of doomed localCheckpoint
# blocks on-heap while the async removal worker drained them slower
# than the bench cadence; the sweep now blocks, and the full list is
# certified green at 12g (64-103 MB retained after every query).
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-12g}

if [ ! -d testdata_sf10 ]; then
  sbt -batch "runMain graft.GenScale /root/testdata/sf0.01 testdata_sf10 100"
fi

# r14 adds the cold-start probes (load-from-disk path: index read +
# probe, no build) and the zipf probe/rebuild separation pair — the
# probe must stay ~flat while the rebuild scales with the corpus.
# r15 adds the zipf COLD probe (must stay as flat as the warm zipf
# probe — the restart-cost-is-fixture-density claim) and the bands
# disk chain (append+compact+cold probe under 100x pair growth),
# then the vocab drift statistic (vocabulary-sized: must stay ~flat).
# r16 adds the zipf DISK CHAIN twin (one-flip append + compact + cold
# probe on the realistic vocabulary — expected near-flat, unlike the
# raw chain's density confound).
QUERIES=b_src1_scan,x_dedup_exact,x_dedup_fuzzy,x_dedup_ngram_jaccard,x_dedup_containment,x_dedup_minhash,x_dedup_simhash,x_dedup_semantic,x_sel_dsir,x_pack_sequences,x_pack_sequences_bpe,x_dedup_incremental,x_dedup_index_update,x_dedup_index_delete,x_stream_index_ingest,x_qual_classifier,x_qual_apply,x_qual_update,x_dedup_index_cold_probe,x_retr_index_cold_probe,x_text_bm25_zipf,x_retr_vocab_probe,x_retr_vocab_cold_probe,x_dedup_index_disk_update,x_retr_vocab_drift,x_sim_index_probe_ivfpq,x_sim_index_cold_probe_ivfpq,x_retr_vocab_disk_update

# denominators: the same queries on the UNSCALED source fixture
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QUERIES="$QUERIES" \
SPARK_GRAFT_BENCH_OUT=BENCH_sf10_base.json \
  sbt -batch "runMain graft.Bench"

SPARK_GRAFT_SF_DIR="$(pwd)/testdata_sf10" \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QUERIES="$QUERIES" \
SPARK_GRAFT_BENCH_OUT=BENCH_sf10.json \
  sbt -batch "runMain graft.Bench"
