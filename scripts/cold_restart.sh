#!/bin/bash
# Cross-JVM restart certification: JVM 1 (graft.ColdSave) builds and
# persists every standing artifact (IVF / PQ / LSH / BM25 / dedup bands
# / quality weights / BPE vocab) and dumps the warm reference outputs;
# JVM 2 (graft.ColdProbe) — a separate forked sbt runMain process with
# every per-application cache empty by construction — loads the
# artifacts, probes them, and requires row-set identity. Writes
# COLD_RESTART_r*.txt via the caller's redirect.
set -e
cd "$(dirname "$0")/.."
DIR=${1:-/tmp/graft_cold_restart}
SF=${2:-/root/testdata/sf0.01}
rm -rf "$DIR"
sbt -batch "runMain graft.ColdSave $SF $DIR"
sbt -batch "runMain graft.ColdProbe $SF $DIR"
