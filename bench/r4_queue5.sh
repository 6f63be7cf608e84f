#!/bin/bash
# Round-4 queued TPU evidence, stage 5: the flagship composition re-run
# at HEAD — the SEV-boundary reinit min-cap (run._merge_reinit_carry)
# shipped after attribution isolated the 1.1e-3 ledger residual to the
# coarse post-death startup rungs; this re-run measures the residual the
# SHIPPED framework delivers over the full t=0->120 composition.
set -u
cd /root/repo
export TF_CPP_MIN_LOG_LEVEL=3

echo "=== $(date -u +%H:%M:%S) flagship_32k full re-run at HEAD"
python -m oc_nbody_tpu run configs/flagship_32k.toml \
    --set output.out_dir=out/flagship_32k_r4 \
    > out/flagship_r4.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $?"
echo "=== R4 QUEUE5 DONE"
