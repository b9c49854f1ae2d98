#!/bin/bash
# Solo re-measure protocol (VERDICT r16 what's-wrong-#2): board-run
# ambient drift — co-resident queries, leaked blocks, whole-machine
# contention windows — became the dominant round-over-round noise term
# (the same build read 202.0 s and 237.1 s on consecutive full-board
# stamps, with pure-SQL rows moving 1.6x between runs of identical
# code). Any board mover >1.3x vs the prior round's gate board gets
# re-measured HERE before it is quoted: one Bench invocation (= one
# fresh JVM, min-of-3 rep-major passes) per query, nothing co-resident,
# results merged into one JSON artifact the round notes reference.
# SURVEY quotes only board numbers or solo-tagged numbers from this
# script — never ad-hoc /tmp measurements.
#
# usage: scripts/bench_solo.sh [-d SF_DIR] [-o OUT.json] query [query...]
set -e
cd "$(dirname "$0")/.."

SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
OUT=bench_solo.json
while getopts "d:o:" opt; do
  case $opt in
    d) SF_DIR=$OPTARG ;;
    o) OUT=$OPTARG ;;
    *) echo "usage: $0 [-d SF_DIR] [-o OUT.json] query [query...]" >&2; exit 2 ;;
  esac
done
shift $((OPTIND - 1))
[ $# -ge 1 ] || { echo "usage: $0 [-d SF_DIR] [-o OUT.json] query [query...]" >&2; exit 2; }

TMPDIR_SOLO=$(mktemp -d)
trap 'rm -rf "$TMPDIR_SOLO"' EXIT

# one JVM per query: Bench's single-query board is the solo measurement
# (same warmup, same min-of-3 rep-major discipline, same loud-failure
# contract as the full board)
for q in "$@"; do
  SPARK_GRAFT_SF_DIR="$SF_DIR" \
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  SPARK_GRAFT_QUERIES="$q" \
  SPARK_GRAFT_BENCH_OUT="$TMPDIR_SOLO/$q.json" \
    sbt -batch "runMain graft.Bench"
done

# merge the per-query artifacts into one {"protocol":"solo",...} JSON
python3 - "$SF_DIR" "$OUT" "$TMPDIR_SOLO" "$@" <<'EOF'
import json, sys
sf_dir, out, tmp = sys.argv[1], sys.argv[2], sys.argv[3]
queries = sys.argv[4:]
merged, medians = {}, {}
for q in queries:
    j = json.load(open(f"{tmp}/{q}.json"))
    if j.get("failed"):
        sys.exit(f"solo rep of {q} FAILED: {j['failed']}")
    merged[q] = j["queries"][q]
    medians[q] = j["queries_median"][q]
json.dump({"protocol": "solo", "runs_per_query": 3, "jvm_per_query": True,
           "sf": sf_dir, "queries": merged, "queries_median": medians},
          open(out, "w"), indent=1)
print(f"SOLO OK {len(queries)} queries -> {out}")
EOF
