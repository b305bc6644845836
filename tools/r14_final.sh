#!/bin/bash
# Round-14 consolidation at final HEAD: the mm decode family changed after
# the earlier passes (16-bit -> Adam7 -> WAV -> tRNS), so ALL its rows are
# re-measured fresh (2 spaced passes), the 197-query Verify runs twice
# (determinism-audit inputs), and the gate re-checks everything.
set -u
cd /root/repo
mkdir -p target/m
MM="mm5_pixel_stats,mm5b_palette_stats,mm5c_deep_stats,mm5d_interlaced_stats,mm5e_alpha_palette_stats,mm6_audio_stats"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/m/r14_mm2_sf01_a.json \
  sbt -batch "runMain graft.Bench $MM" > target/m/r14_mm2_sf01_a.log 2>&1
echo "== mm2 a done ($(date -u +%H:%M:%S))"
rm -rf /tmp/vr14d /tmp/vr14e
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vr14d" > target/m/r14_verify_d.log 2>&1
echo "== verify d done ($(date -u +%H:%M:%S))"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/m/r14_mm2_sf01_b.json \
  sbt -batch "runMain graft.Bench $MM" > target/m/r14_mm2_sf01_b.log 2>&1
echo "== mm2 b done ($(date -u +%H:%M:%S))"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vr14e" > target/m/r14_verify_e.log 2>&1
echo "== verify e done ($(date -u +%H:%M:%S))"
python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/vr14d > target/m/r14_gate3.txt 2>&1
tail -2 target/m/r14_gate3.txt
echo FINAL_DONE
