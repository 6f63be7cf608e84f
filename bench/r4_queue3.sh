#!/bin/bash
# Round-4 queued TPU evidence, stage 3: the ensemble x SEV kick-velocity
# survey (the judge-named bound-mass vs kick-sigma grid) on the chip.
set -u
cd /root/repo
export TF_CPP_MIN_LOG_LEVEL=3

echo "=== $(date -u +%H:%M:%S) kick survey: 16 seeds x sigma {0,100,400}"
python -m oc_nbody_tpu ensemble configs/survey_kick_1k.toml \
    --seeds 0:16 --sweep sev.kick_sigma_ns_kms=0,100,400 \
    > out/kick_survey.log 2>&1
echo "=== $(date -u +%H:%M:%S) exited $?"
python analysis/ensemble_stats.py out/survey_kick_1k/ensemble.h5 \
    --drift-warn 1e-3 --save docs/evidence/r4_kick_survey.png \
    >> out/kick_survey.log 2>&1
echo "=== $(date -u +%H:%M:%S) stats exited $?"
echo "=== R4 QUEUE3 DONE"
