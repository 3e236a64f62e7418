#!/bin/bash
# Round-3 quality run: flagship schedule on the anti-aliased multi-view
# fixture (configs/inb/inb_fake_mv.yaml), resilient to remote-TPU tunnel
# flaps: training resumes from the latest checkpoint after any crash
# (resume is the train_net.py default).  Reference protocol being matched:
# the inb_377 schedule + held-out-view evaluation.
#
# Usage: bash scripts/run_quality_r3.sh [cfg] [logfile]
set -u
CFG=${1:-configs/inb/inb_fake_mv.yaml}
LOG=${2:-/tmp/quality_r3.log}
cd "$(dirname "$0")/.."

echo "=== quality run $(date) cfg=$CFG ===" >> "$LOG"
for attempt in $(seq 1 12); do
  # wait for the device to answer before (re)starting
  until timeout 100 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "[$(date +%H:%M:%S)] tunnel down, waiting" >> "$LOG"
    sleep 60
  done
  echo "[$(date +%H:%M:%S)] attempt $attempt: training" >> "$LOG"
  timeout 5400 python train_net.py --cfg_file "$CFG" >> "$LOG" 2>&1
  rc=$?
  echo "[$(date +%H:%M:%S)] train exit $rc" >> "$LOG"
  if [ $rc -eq 0 ]; then
    for etry in 1 2 3; do
      echo "[$(date +%H:%M:%S)] evaluating (try $etry)" >> "$LOG"
      timeout 3600 python run.py --type evaluate --cfg_file "$CFG" >> "$LOG" 2>&1
      erc=$?
      echo "[$(date +%H:%M:%S)] eval exit $erc" >> "$LOG"
      if [ $erc -eq 0 ]; then
        # novel-pose protocol on the same checkpoint (frames 4-5 untrained)
        echo "[$(date +%H:%M:%S)] novel-pose eval" >> "$LOG"
        timeout 3600 python run.py --type evaluate \
          --cfg_file configs/inb/inb_fake_mv_np.yaml >> "$LOG" 2>&1
        echo "[$(date +%H:%M:%S)] novel-pose eval exit $?" >> "$LOG"
        exit 0
      fi
      sleep 60
    done
    exit 1
  fi
  sleep 30
done
echo "gave up after 12 attempts" >> "$LOG"
exit 1
