#!/usr/bin/env bash
# Isolated-bench leg of the BENCH_AB sweep-vs-isolated gate: one fresh
# JVM per query (SPARK_GRAFT_BENCH_ONLY), min of 3, default env
# (cpus=32, 32g pinned heap) — the exact discipline BENCH_AB.md's
# `isolated` column documents. Serializes sbt (never concurrent with a
# sweep). Usage: scripts/ab_isolated.sh out.txt q97_dedup_incremental ...
set -u
out="$1"; shift
: > "$out"
for q in "$@"; do
  line=$(SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
    SPARK_GRAFT_BENCH_ONLY="$q" sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric":"total"')
  echo "$q $line" >> "$out"
  echo "$q $line"
done
