#!/bin/bash
# Round-4 queued TPU evidence runs (VERDICT round-3 items 2 and 3 + W1).
# Sequential — one chip, no contention. Re-entrant: config runs resume.
set -u
cd /root/repo
export TF_CPP_MIN_LOG_LEVEL=3

echo "=== $(date -u +%H:%M:%S) flagship attribution: base (W1 control)"
python bench/flagship_attrib.py --variants base > out/flag_attrib.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $? — variants nokick nosev eta2"
python bench/flagship_attrib.py --variants nokick nosev eta2 \
    >> out/flag_attrib.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $?"

echo "=== $(date -u +%H:%M:%S) c9h_4m_hermite_macro (committed segment)"
python -m oc_nbody_tpu run configs/c9h_4m_hermite_macro.toml --resume \
    > out/c9h_4m.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $? — extending to 4 blocks"
python -m oc_nbody_tpu run configs/c9h_4m_hermite_macro.toml --resume \
    --set output.t_end=0.015625 >> out/c9h_4m.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $?"

echo "=== $(date -u +%H:%M:%S) c8x_8m_macro_extended (committed segment)"
python -m oc_nbody_tpu run configs/c8x_8m_macro_extended.toml --resume \
    > out/c8x_8m.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $?"

echo "=== $(date -u +%H:%M:%S) c7_2m full length (t=0 -> 1.0)"
python -m oc_nbody_tpu run configs/c7_2m_chunked.toml --resume \
    --set output.t_end=1.0 --set output.snap_every=0.25 \
    > out/c7_2m.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $?"
echo "=== R4 QUEUE DONE"
