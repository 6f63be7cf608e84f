#!/bin/bash
# Round-4 queued TPU evidence runs, stage 2 (after the c9h segment was
# re-sized: its committed t_end implied ~1000 shared-dt steps x ~155 s —
# days — so the segment is now 32 initial-dt units; see the config note).
# Sequential — one chip. Re-entrant: config runs resume.
set -u
cd /root/repo
export TF_CPP_MIN_LOG_LEVEL=3

echo "=== $(date -u +%H:%M:%S) c9h_4m_hermite_macro (re-sized segment)"
rm -rf out/c9h_4m
python -m oc_nbody_tpu run configs/c9h_4m_hermite_macro.toml \
    > out/c9h_4m.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $?"

echo "=== $(date -u +%H:%M:%S) c8x_8m_macro_extended (committed segment)"
python -m oc_nbody_tpu run configs/c8x_8m_macro_extended.toml --resume \
    > out/c8x_8m.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $?"

echo "=== $(date -u +%H:%M:%S) prune_scale: 1M dissolution pruned vs full"
python bench/prune_scale.py > out/prune_scale.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $?"

echo "=== $(date -u +%H:%M:%S) flagship attribution: etai2 diagf64"
python bench/flagship_attrib.py --variants etai2 diagf64 \
    >> out/flag_attrib.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $?"

echo "=== $(date -u +%H:%M:%S) regression gate (post-refactor rates)"
python bench/check_regression.py > out/check_regression_r4.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $?"

echo "=== $(date -u +%H:%M:%S) c7_2m full length (t=0 -> 1.0)"
python -m oc_nbody_tpu run configs/c7_2m_chunked.toml --resume \
    --set output.t_end=1.0 --set output.snap_every=0.25 \
    > out/c7_2m.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $?"
echo "=== R4 QUEUE2 DONE"
