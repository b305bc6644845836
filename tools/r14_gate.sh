#!/bin/bash
# Round-14 endgame gate: full test suite at HEAD, the 193-query Verify
# twice (determinism-audit inputs), and the DuckDB replica gate.
set -u
cd /root/repo
mkdir -p target/m
sbt -batch test > target/m/r14_test_b.log 2>&1
grep -E "Tests: |All tests" target/m/r14_test_b.log | tail -2
echo "== tests done ($(date -u +%H:%M:%S))"
rm -rf /tmp/vr14a /tmp/vr14b
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vr14a" > target/m/r14_verify_a.log 2>&1
echo "== verify a done ($(date -u +%H:%M:%S))"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vr14b" > target/m/r14_verify_b.log 2>&1
echo "== verify b done ($(date -u +%H:%M:%S))"
python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/vr14a > target/m/r14_gate.txt 2>&1
tail -3 target/m/r14_gate.txt
echo GATE_DONE
