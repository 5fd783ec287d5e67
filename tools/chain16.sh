#!/bin/bash
# Round-16 measurement chain (serialized sbt runs — see memory note:
# never two sbt invocations at once). Progress: /tmp/chain16.progress,
# full log: /tmp/chain16.log. Ordered cheap/decision-critical first so
# a truncated chain still leaves the VERDICT #1/#2 essentials.
cd /root/repo
P=/tmp/chain16.progress
L=/tmp/chain16.log
step() { echo "$(date +%H:%M:%S) $1" >> "$P"; }

step "start"

# d12 drift isolation (VERDICT #6): fresh-JVM min-of-5 at sf0.1, 32 cpus
# (the q4 A/B method's isolated half; the in-sweep half is BENCH_SELF)
step "d12 isolation"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.MicroBench /root/testdata/sf0.1 5 d12" >> "$L" 2>&1

# clustered corpora at depth (VERDICT #2)
step "gen skew30"
sbt -batch "runMain graft.ScaleGen /tmp/scale/skew30 30 skew" >> "$L" 2>&1
step "gen skew100"
sbt -batch "runMain graft.ScaleGen /tmp/scale/skew100 100 skew" >> "$L" 2>&1

# flat tier on the clustered corpus, sf30->100 (the missing matrix cell)
step "skew flat slope"
GRAFT_D13_ASSIGNVIA=lshflat sbt -batch "runMain graft.ScaleBench SCALE_SKEW1000X_FLAT.json q=d13_semantic_dedup 30=/tmp/scale/skew30 100=/tmp/scale/skew100" >> "$L" 2>&1

# honesty kit: flat recall/precision on clustered at sf30 + margin stats
step "probe flat skew30"
sbt -batch "runMain graft.D13LshProbe /tmp/scale/skew30 lshflat" >> "$L" 2>&1
step "probe margin skew30"
sbt -batch "runMain graft.D13LshProbe /tmp/scale/skew30 margin" >> "$L" 2>&1
step "probe margin skew100"
sbt -batch "runMain graft.D13LshProbe /tmp/scale/skew100 margin" >> "$L" 2>&1

# VERDICT #1 Done-criterion: the 1000x span under assignVia=auto (main)
step "main auto slope"
GRAFT_D13_ASSIGNVIA=auto sbt -batch "runMain graft.ScaleBench SCALE_1000X_AUTO.json q=d13_semantic_dedup,p6_pretrain_pipeline 30=/tmp/scale/sf30 100=/tmp/scale/sf100" >> "$L" 2>&1

# VERDICT #4: s11 under via=auto on the same span
step "s11 auto slope"
SPARK_GRAFT_S11_VIA=auto sbt -batch "runMain graft.ScaleBench SCALE_1000X_S11AUTO.json q=s11_bitext_margin 30=/tmp/scale/sf30 100=/tmp/scale/sf100" >> "$L" 2>&1

# twolevel on clustered at depth (the expensive row, last)
step "skew twolevel slope"
GRAFT_D13_ASSIGNVIA=twolevel sbt -batch "runMain graft.ScaleBench SCALE_SKEW1000X_TL.json q=d13_semantic_dedup 30=/tmp/scale/skew30 100=/tmp/scale/skew100" >> "$L" 2>&1
step "probe twolevel skew30"
sbt -batch "runMain graft.D13LshProbe /tmp/scale/skew30 twolevel" >> "$L" 2>&1

step "done"
