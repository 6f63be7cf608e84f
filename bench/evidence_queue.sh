#!/bin/bash
# Round-3/4 queued TPU evidence runs (ROADMAP.md "Queued for hardware").
# Runs the demo configs full-scale on the real chip, sequentially (one
# chip — no contention), logging to out/<name>.log. Re-entrant: each run
# resumes from its latest snapshot if interrupted.
set -u
cd /root/repo
export TF_CPP_MIN_LOG_LEVEL=3
for cfg in sev_cluster_8k gas_expulsion_8k gmc_flyby_8k bar_cluster_8k cc_collapse_1k flagship_32k; do
  echo "=== $(date -u +%H:%M:%S) starting $cfg"
  python -m oc_nbody_tpu run configs/$cfg.toml --resume \
      > out/${cfg}.log 2>&1
  echo "=== $(date -u +%H:%M:%S) $cfg exited $?"
done
echo "=== QUEUE DONE"
