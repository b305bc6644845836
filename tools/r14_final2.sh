#!/bin/bash
set -u
cd /root/repo
mkdir -p target/m
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/m/r14_mm7_sf01_a.json \
  sbt -batch "runMain graft.Bench mm7_video_meta" > target/m/r14_mm7_sf01_a.log 2>&1
echo "== mm7 a done ($(date -u +%H:%M:%S))"
rm -rf /tmp/vr14f /tmp/vr14g
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vr14f" > target/m/r14_verify_f.log 2>&1
echo "== verify f done ($(date -u +%H:%M:%S))"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/m/r14_mm7_sf01_b.json \
  sbt -batch "runMain graft.Bench mm7_video_meta" > target/m/r14_mm7_sf01_b.log 2>&1
echo "== mm7 b done ($(date -u +%H:%M:%S))"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vr14g" > target/m/r14_verify_g.log 2>&1
echo "== verify g done ($(date -u +%H:%M:%S))"
python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/vr14f > target/m/r14_gate4.txt 2>&1
tail -2 target/m/r14_gate4.txt
sbt -batch test > target/m/r14_test_final3.log 2>&1
grep -E "Tests: |Suites: " target/m/r14_test_final3.log | tail -2
echo FINAL2_DONE
