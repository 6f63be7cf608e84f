#!/bin/bash
# Round-4 queued TPU evidence, stage 4 (post RT_MAX_ROWS + reinit-cap
# fixes). Sequential — one chip.
set -u
cd /root/repo
export TF_CPP_MIN_LOG_LEVEL=3

echo "=== $(date -u +%H:%M:%S) prune_scale retry (RT_MAX_ROWS cap in)"
python bench/prune_scale.py > out/prune_scale.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $?"

echo "=== $(date -u +%H:%M:%S) flagship fix validation (reinit min-cap)"
python bench/flagship_attrib.py --variants fixed \
    >> out/flag_attrib.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $?"

echo "=== $(date -u +%H:%M:%S) regression gate at HEAD"
python bench/check_regression.py > out/check_regression_r4b.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $?"
echo "=== R4 QUEUE4 DONE"
