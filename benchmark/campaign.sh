#!/usr/bin/env bash
# Multi-dataset benchmark campaign (reference: benchmark/hdf5/ref_logs/Makefile
# runs the same QPS-at-recall harness per dataset/index). Each leg is one
# suite.py invocation; logs land in docs/campaign/. Run on a free TPU:
#   PYTHONPATH=/root/repo:$PYTHONPATH bash benchmark/campaign.sh
set -u
cd "$(dirname "$0")/.."
OUT=docs/campaign
mkdir -p "$OUT"

run() { # name args...
  local name=$1; shift
  echo "=== $name: $* ==="
  timeout 3600 python -u benchmark/suite.py "$@" 2>&1 | tee "$OUT/$name.log" | grep -E '^\{' || true
}

# SIFT1M-like: 1M x 128 L2 (headline set)
run sift1m-main  --nb 1000000 --dim 128 --recall 0.95 --gt-nq 10000 --nq 10000 \
                 --index FLAT,IVF_FLAT,IVF_SQ8,IVF_PQ,SCANN,IVF_RABITQ,HNSW
# GIST1M-like: 1M x 960 L2 (high-dim regime; reference GIST-960)
run gist1m       --nb 1000000 --dim 960 --nq 1000 --gt-nq 1000 --recall 0.95 \
                 --index IVF_FLAT,IVF_PQ,HNSW
# GloVe-like: 1M x 100 COSINE (angular regime)
run glove-cos    --nb 1000000 --dim 100 --recall 0.95 --gt-nq 5000 --nq 5000 \
                 --metric COSINE --index IVF_FLAT,HNSW
# filtered search (reference benchmark_float_bitset sweep points)
run sift1m-f50   --nb 1000000 --dim 128 --recall 0.95 --gt-nq 5000 --nq 5000 \
                 --filter 0.5 --index IVF_FLAT,HNSW
run sift1m-f95   --nb 1000000 --dim 128 --recall 0.90 --gt-nq 5000 --nq 5000 \
                 --filter 0.95 --index IVF_FLAT,HNSW
# k=100 regime (reference datasets ship k=100 ground truth)
run sift1m-k100  --nb 1000000 --dim 128 --k 100 --recall 0.95 --gt-nq 5000 --nq 5000 \
                 --index IVF_FLAT,HNSW
# DISKANN (disk-resident)
run sift1m-disk  --nb 1000000 --dim 128 --recall 0.90 --gt-nq 2000 --nq 2000 \
                 --index DISKANN
echo "campaign done -> $OUT/"
