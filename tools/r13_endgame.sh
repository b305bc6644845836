#!/bin/bash
# Round-13 endgame: PPJoin candidate-volume decomposition at sf10, the
# full 190-query gate at sf0.01 twice (determinism audit inputs), the
# DuckDB replica gate, and the RATIOS regeneration from BENCH_r13_full.
set -u
cd /root/repo
mkdir -p target/m
SPARK_GRAFT_SF_DIR=target/scale/sf10 sbt -batch "runMain graft.Profile ppjoin" \
  > target/m/r13_ppjoin_sf10.log 2>&1
echo "== ppjoin done ($(date -u +%H:%M:%S))"
rm -rf /tmp/vr13a /tmp/vr13b
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vr13a" \
  > target/m/r13_verify_a.log 2>&1
echo "== verify a done ($(date -u +%H:%M:%S))"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vr13b" \
  > target/m/r13_verify_b.log 2>&1
echo "== verify b done ($(date -u +%H:%M:%S))"
python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/vr13a \
  > target/m/r13_gate.txt 2>&1
tail -3 target/m/r13_gate.txt
python3 tools/ratio_table.py /root/testdata/sf0.1 BENCH_r13_full.json \
  /tmp/vr13a/oracle_sql.json --out RATIOS.md > target/m/r13_ratios.log 2>&1
echo "== ratios done ($(date -u +%H:%M:%S))"
echo ENDGAME_DONE
