#!/bin/bash
# Round-13 post-fix measurements:
#  - d11b re-measure after the ranked-frame material() fix (the scoped
#    block-manager cache of the corpus-scaled ranked shingle frame caused
#    a first-attempt UNABLE_TO_ACQUIRE_MEMORY at sf10 in the campaign's
#    pass a) — sf0.1 and sf10, 2 spaced passes each; these rows REPLACE
#    the r13_campaign d11b rows, which timed the cached variant.
#  - sf100 tier with tier-sized harness (see r13_sf100.sh header): d11
#    naive + d11c router on documents, g2 on lineitem, 2 spaced passes.
# Anchors post closes the measurement window.
set -u
cd /root/repo
mkdir -p target/m
D11B="d11b_containment_prefix"
SF100_DOC="d11_containment,d11c_containment_auto"
SF100_LI="g2_triangles"

run() { # run <sfdir> <out> <log> <queries> [extra env via prefix]
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_BENCH_OUT=$2 \
    sbt -batch "runMain graft.Bench $4" > "$3" 2>&1
  echo "== done: $2 ($(date -u +%H:%M:%S))"
}

run /root/testdata/sf0.1 target/m/r13_d11b_sf01_c.json target/m/r13_d11b_sf01_c.log "$D11B"
run target/scale/sf10 target/m/r13_d11b_sf10_c.json target/m/r13_d11b_sf10_c.log "$D11B"
export SPARK_DRIVER_MEM=32g
export SPARK_GRAFT_SHUFFLE_PARTITIONS=256
run target/scale/sf100 target/m/r13_doc_sf100_c.json target/m/r13_doc_sf100_c.log "$SF100_DOC"
run target/scale/sf100 target/m/r13_li_sf100_c.json target/m/r13_li_sf100_c.log "$SF100_LI"
unset SPARK_DRIVER_MEM SPARK_GRAFT_SHUFFLE_PARTITIONS
run /root/testdata/sf0.1 target/m/r13_d11b_sf01_d.json target/m/r13_d11b_sf01_d.log "$D11B"
run target/scale/sf10 target/m/r13_d11b_sf10_d.json target/m/r13_d11b_sf10_d.log "$D11B"
export SPARK_DRIVER_MEM=32g
export SPARK_GRAFT_SHUFFLE_PARTITIONS=256
run target/scale/sf100 target/m/r13_doc_sf100_d.json target/m/r13_doc_sf100_d.log "$SF100_DOC"
run target/scale/sf100 target/m/r13_li_sf100_d.json target/m/r13_li_sf100_d.log "$SF100_LI"
unset SPARK_DRIVER_MEM SPARK_GRAFT_SHUFFLE_PARTITIONS
python3 tools/bench_min.py --anchor target/m/r13_anchor_post.json
echo POST_DONE
