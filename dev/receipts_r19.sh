#!/bin/bash
# Round-19 receipt protocol (BASELINE.md round-19 tables). One
# measurement per fresh JVM (the round-16 protocol); run with NOTHING
# else on the host. Usage: dev/receipts_r19.sh <phase>
#   grid      — streamsem2 families x nprobe grid (9 points)
#   old2      — task-5 re-measure: old-fixture streamsem f=2 n=2/4
#   contentfam— composed rail, sequential then parallelism=8
#   xjvm      — cross-JVM fan-out: mat once, 1-JVM run, 2-JVM split, md5s
set -euo pipefail
cd /root/repo
SOAK=/tmp/soak100
OUT=/tmp/receipts_r19
mkdir -p "$OUT"

case "$1" in
  grid)
    for fam in 1 2 3; do
      for np in 1 2 4; do
        echo "== streamsem2 nprobe=$np families=$fam =="
        SPARK_GRAFT_CPUS=32 dev/run_main.sh graft.Receipts \
          streamsem2 "$SOAK" "$np" "$fam" 2>/dev/null \
          | grep '"cmd"' | tee -a "$OUT/streamsem2.jsonl"
      done
    done
    ;;
  old2)
    for np in 2 4; do
      echo "== streamsem (old fixture) nprobe=$np families=2 =="
      SPARK_GRAFT_CPUS=32 dev/run_main.sh graft.Receipts \
        streamsem "$SOAK" "$np" 2 2>/dev/null \
        | grep '"cmd"' | tee -a "$OUT/streamsem_old2.jsonl"
    done
    ;;
  contentfam)
    for par in 1 8; do
      echo "== contentfam planes=2 tables=2 families=2 par=$par =="
      SPARK_GRAFT_CPUS=32 dev/run_main.sh graft.Receipts \
        contentfam "$SOAK" 2 2 2 "$par" 2>/dev/null \
        | grep '"cmd"' | tee -a "$OUT/contentfam.jsonl"
    done
    ;;
  xjvm)
    MAT=/tmp/graft_r19_mat
    echo "== contentmat planes=6 tables=2 =="
    SPARK_GRAFT_CPUS=32 dev/run_main.sh graft.Receipts \
      contentmat "$SOAK" 6 2 "$MAT" 2>/dev/null \
      | grep '"cmd"' | tee -a "$OUT/xjvm.jsonl"
    echo "== single JVM, shards 0-63, par=8 =="
    SPARK_GRAFT_CPUS=32 dev/run_main.sh graft.Receipts \
      contentrun "$SOAK" 6 2 "$MAT" 0-63 /tmp/graft_r19_vall 1 8 \
      2>/dev/null | grep '"cmd"' | tee -a "$OUT/xjvm.jsonl"
    echo "== two concurrent JVMs, shards 0-31 / 32-63, par=8 each =="
    T0=$(date +%s.%N)
    SPARK_GRAFT_CPUS=16 SPARK_GRAFT_XMX=48g dev/run_main.sh graft.Receipts \
      contentrun "$SOAK" 6 2 "$MAT" 0-31 /tmp/graft_r19_v0 1 8 \
      2>/dev/null | grep '"cmd"' > "$OUT/xjvm_j0.json" &
    P0=$!
    SPARK_GRAFT_CPUS=16 SPARK_GRAFT_XMX=48g dev/run_main.sh graft.Receipts \
      contentrun "$SOAK" 6 2 "$MAT" 32-63 /tmp/graft_r19_v1 1 8 \
      2>/dev/null | grep '"cmd"' > "$OUT/xjvm_j1.json" &
    P1=$!
    wait $P0 $P1
    T1=$(date +%s.%N)
    echo "{\"cmd\":\"xjvm_pair_wall\",\"wall_sec\":$(python3 -c "print($T1 - $T0)")}" \
      | tee -a "$OUT/xjvm.jsonl"
    cat "$OUT/xjvm_j0.json" "$OUT/xjvm_j1.json" | tee -a "$OUT/xjvm.jsonl"
    echo "== md5: single vs union-of-two =="
    SPARK_GRAFT_CPUS=32 dev/run_main.sh graft.Receipts \
      contentmd5 /tmp/graft_r19_vall 2>/dev/null \
      | grep '"cmd"' | tee -a "$OUT/xjvm.jsonl"
    SPARK_GRAFT_CPUS=32 dev/run_main.sh graft.Receipts \
      contentmd5 /tmp/graft_r19_v0 /tmp/graft_r19_v1 2>/dev/null \
      | grep '"cmd"' | tee -a "$OUT/xjvm.jsonl"
    ;;
  *) echo "unknown phase $1"; exit 1 ;;
esac
