#!/bin/bash
# Round-12b artifact regeneration chain (run detached; ~2h):
# 3-sf plan audit, full selfchecks at sf0.01 and sf1, PERFCHECK at
# sf0.1, then the sf0.1 and sf1 benches. Each step logs to its own
# file; the chain stops loudly on the first failure.
cd /root/repo || exit 1
set -x
python tools/plan_audit.py /root/testdata/sf0.01,/root/testdata/sf0.1,/root/repo/testdata_sf1 > pa_r12b.log 2>&1 || { echo STEP_FAIL plan_audit; exit 1; }
python tools/selfcheck.py /root/testdata/sf0.01 > selfcheck_r12b_001.log 2>&1 || { echo STEP_FAIL selfcheck001; exit 1; }
python tools/selfcheck.py /root/repo/testdata_sf1 > selfcheck_r12b_sf1.log 2>&1 || { echo STEP_FAIL selfcheck_sf1; exit 1; }
python tools/selfcheck.py --perf /root/testdata/sf0.1 > perfcheck_r12b.log 2>&1 || { echo STEP_FAIL perfcheck; exit 1; }
python bench.py > bench_sf01_r12b.out 2> bench_sf01_r12b.err || { echo STEP_FAIL bench01; exit 1; }
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf1 SPARK_GRAFT_BENCH_REPS=2 python bench.py > bench_sf1_r12b.out 2> bench_sf1_r12b.err || { echo STEP_FAIL bench_sf1; exit 1; }
echo ALL_DONE
