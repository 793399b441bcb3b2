#!/usr/bin/env bash
# Demonstrates the spark-submit deployment path end-to-end (north rule:
# "runs via spark-submit"): package the library jar, submit the extraction
# job against the deterministic synthetic corpus, and show checkpointed
# resume being a no-op on re-run. Master defaults to local[8] here; on a
# real cluster pass e.g. --master yarn --deploy-mode cluster and the entry
# point picks up the submitted master/conf untouched (GraftSession.fromSubmit).
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK_SUBMIT=${SPARK_SUBMIT:-/opt/spark/bin/spark-submit}
MASTER=${MASTER:-local[8]}
TURNS=${TURNS:-200000}
OUT=${OUT:-/tmp/graft_submit_demo}

sbt -batch package
JAR=$(ls target/scala-2.13/rdfmicrodataspark_2.13-*.jar | head -1)

echo "== N-Triples text export (canonicalized graph) =="
rm -rf "$OUT/nt"
"$SPARK_SUBMIT" --master "$MASTER" --class graft.ExtractMain "$JAR" \
  --input "synthetic:$TURNS" --output "$OUT/nt" --ntriples 2>/dev/null | tail -1

echo "== Bucketed graph materialization with per-partition lineage + manifest =="
rm -rf "$OUT/graph"
"$SPARK_SUBMIT" --master "$MASTER" --class graft.ExtractMain "$JAR" \
  --input "synthetic:$TURNS" --output "$OUT/graph" --buckets 32 2>/dev/null | tail -1

echo "== Re-run over the committed manifest: resume is a no-op =="
"$SPARK_SUBMIT" --master "$MASTER" --class graft.ExtractMain "$JAR" \
  --input "synthetic:$TURNS" --output "$OUT/graph" --buckets 32 2>/dev/null | tail -1

echo "== Nightly-crawl folds (IncrementalMain): novel-append + standing link state =="
rm -rf "$OUT/standing"
# first delta (half the corpus) builds the standing root from scratch;
# nConvs is PINNED across the two deltas so the second is a true superset
# (the generator's conv assignment — and with it skolem identity — depends
# on the conv count)
CONVS=$((TURNS/20))
"$SPARK_SUBMIT" --master "$MASTER" --class graft.IncrementalMain "$JAR" \
  --root "$OUT/standing" --input "synthetic:$((TURNS/2)):$CONVS" \
  --link-keys http://schema.org/headline 2>/dev/null | tail -1
# second delta is a SUPERSET (the full corpus): only the new half's triples
# are novel — the anti-join against the pred_bucket-pruned standing slice
# appends just those under a fresh batch_id partition
"$SPARK_SUBMIT" --master "$MASTER" --class graft.IncrementalMain "$JAR" \
  --root "$OUT/standing" --input "synthetic:$TURNS:$CONVS" \
  --link-keys http://schema.org/headline 2>/dev/null | tail -1

echo "== Crash-rerun of the same delta: novelty is zero, state unchanged =="
"$SPARK_SUBMIT" --master "$MASTER" --class graft.IncrementalMain "$JAR" \
  --root "$OUT/standing" --input "synthetic:$TURNS:$CONVS" \
  --link-keys http://schema.org/headline 2>/dev/null | tail -1

echo "== Consumer-side BGP query over the materialized graph (QueryMain) =="
# works over any Triple-schema parquet dir; a writeGraph pred_bucket layout
# additionally gets partition pruning via its _graft_layout.json metadata
rm -rf "$OUT/bindings"
"$SPARK_SUBMIT" --master "$MASTER" --class graft.QueryMain "$JAR" \
  --graph "$OUT/graph" --output "$OUT/bindings" --show 3 \
  --pattern '?s <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> ?t' 2>/dev/null | tail -5

echo "== DESCRIBE one entity's full triple set (QueryMain --describe) =="
rm -rf "$OUT/described"
"$SPARK_SUBMIT" --master "$MASTER" --class graft.QueryMain "$JAR" \
  --graph "$OUT/graph" --output "$OUT/described" --describe '?s' --show 5 \
  --pattern '?s <http://schema.org/name> "Person 44"' 2>/dev/null | tail -7
