#!/bin/bash
# Round-16 chain #2: the flat sub-cell cap at depth + final bench capture.
cd /root/repo
P=/tmp/chain16b.progress
L=/tmp/chain16b.log
step() { echo "$(date +%H:%M:%S) $1" >> "$P"; }

step "skew flatcap slope"
GRAFT_D13_ASSIGNVIA=lshflat sbt -batch "runMain graft.ScaleBench SCALE_SKEW1000X_FLATCAP.json q=d13_semantic_dedup 30=/tmp/scale/skew30 100=/tmp/scale/skew100" >> "$L" 2>&1

step "probe flatcap skew30"
sbt -batch "runMain graft.D13LshProbe /tmp/scale/skew30 lshflat" >> "$L" 2>&1

step "cellstats flatcap skew100"
sbt -batch "runMain graft.CellStatsProbe /tmp/scale/skew100 lshflat" >> "$L" 2>&1

step "main auto slope rerun"
GRAFT_D13_ASSIGNVIA=auto sbt -batch "runMain graft.ScaleBench SCALE_1000X_AUTO.json q=d13_semantic_dedup,p6_pretrain_pipeline 30=/tmp/scale/sf30 100=/tmp/scale/sf100" >> "$L" 2>&1

step "probe flatcap main sf10"
sbt -batch "runMain graft.D13LshProbe /tmp/scale/sf10 lshflat" >> "$L" 2>&1

step "bench capture"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" >> "$L" 2>&1

step "done"
