#!/bin/bash
# Scale-artifact campaign — the invariant-13/20 protocol in one script.
#
# The driver regenerates /root/testdata between rounds AND between sessions of
# one round, so scale fixtures and artifacts must be regenerated together in
# the session that ships any measured-source change. This script reproduces
# the campaign every round has run by hand: amplify fixtures with
# tools/gen_sf.py, run bench.py per rung (scenarios on at sf1/sf10, off at
# sf30/sf60; invariant-23 heap sizing), then tools/duck_bench.py --isolate
# (one process per oracle, 900 s timeout — the recursive-CTE oracles hang
# otherwise). Subsets are read from the committed artifacts so the rung
# composition is stable across regenerations; edit those files to change it.
#
#   bash tools/scale_campaign.sh [sf1] [sf10] [sf30] [sf60]   # default: all
#
# Disk notes (single-box FS): sf60's substring-dedup sort spills ~50-65 G —
# the sf60 step DELETES the smaller rungs' fixtures and /tmp/rubix_warehouse
# first. sf100 does not fit (three full-disk crashes, BASELINE §4h). The sf60
# bench gates layout prebuilds to orders,customer,events,docs — its subset
# excludes lineitem-layout rows because that ingest shuffle spills ~41 G.
# Background runs: keep `python -u` + redirect BOTH streams (invariant 27).
set -o pipefail
cd "$(dirname "$0")/.."
TD=${RUBIX_SCALE_DIR:-/tmp/rubix_testdata}
SRC=${RUBIX_SCALE_SRC:-/root/testdata/sf0.1}
RUNGS=${@:-sf1 sf10 sf30 sf60}

subset() { python -c "import json;print(','.join(sorted(json.load(open('$1'))['queries'])))"; }
log() { echo "[$(date +%T)] $*"; }

for rung in $RUNGS; do
  case $rung in
    sf1)  factor=10;  mem=;    scen=1; gate=; Q=$(subset BENCH_SF1.json) ;;
    sf10) factor=100; mem=;    scen=1; gate=; Q=$(subset BENCH_SF10.json) ;;
    sf30) factor=300; mem=48g; scen=0; gate=; Q=$(subset BENCH_SF30.json) ;;
    sf60) factor=600; mem=60g; scen=0; gate=orders,customer,events,docs
          Q=$(subset BENCH_SF60.json)
          log "clearing smaller rungs for sf60 disk headroom"
          rm -rf $TD/sf1 $TD/sf10 $TD/sf30 /tmp/rubix_warehouse ;;
    *) echo "unknown rung $rung"; exit 2 ;;
  esac
  UP=$(echo $rung | tr a-z A-Z)
  log "GEN $rung (factor $factor)"
  SPARK_GRAFT_DRIVER_MEM=${mem:-16g} python -u tools/gen_sf.py \
    --src $SRC --out $TD/$rung --factor $factor || exit 1
  log "BENCH $rung"
  # env (not bare assignments): a ${gate:+...} word in an assignment prefix
  # ends the prefix SYNTACTICALLY even when it expands to nothing, making bash
  # exec the next assignment as a command — the empty-gate rungs never ran.
  env SPARK_GRAFT_DRIVER_MEM=${mem:-16g} SPARK_GRAFT_BENCH_SCENARIOS=$scen \
    ${gate:+SPARK_GRAFT_BENCH_LAYOUT_TABLES=$gate} \
    SPARK_GRAFT_SF_DIR=$TD/$rung SPARK_GRAFT_BENCH_QUERIES=$Q \
    python -u bench.py || exit 1
  cp BENCH_DETAIL.json BENCH_$UP.json
  log "DUCK $rung"
  # duck_bench --out is RESUMABLE: with the previous generation's artifact in
  # place it sees every query already answered and exits in one second without
  # touching the file (a stale artifact that LOOKS fresh). Fresh-generation
  # campaigns must start clean; set RUBIX_DUCK_RESUME=1 only to continue a
  # timeout-interrupted duck pass of THIS generation.
  [ "${RUBIX_DUCK_RESUME:-0}" = "1" ] || rm -f DUCK_$UP.json
  python -u tools/duck_bench.py --sf-dir $TD/$rung --queries $Q \
    --isolate --timeout 900 --out DUCK_$UP.json || exit 1
done
log "CAMPAIGN DONE — regenerate docs/PLANS.md from a clean tree and commit all artifacts together"
