#!/bin/bash
# Round-4 reference-scale rehearsal: full flagship schedule on the
# fake_zju_big fixture (6,890 verts / 100 frames / 5 views / 1024^2,
# configs/inb/inb_fake_big.yaml), resilient to remote-TPU tunnel flaps:
# training resumes from the latest checkpoint after any crash (resume is
# the train_net.py default; budgets.json pins the probed auto-budgets so
# resume never recompiles with different shapes).
#
# Usage: bash scripts/run_quality_r4.sh [cfg] [logfile]
set -u
CFG=${1:-configs/inb/inb_fake_big.yaml}
LOG=${2:-/tmp/big_run.log}
cd "$(dirname "$0")/.."

echo "=== rehearsal run $(date) cfg=$CFG ===" >> "$LOG"
for attempt in $(seq 1 12); do
  until timeout 100 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "[$(date +%H:%M:%S)] tunnel down, waiting" >> "$LOG"
    sleep 60
  done
  echo "[$(date +%H:%M:%S)] attempt $attempt: training (resume)" >> "$LOG"
  timeout 7200 python -u train_net.py --cfg_file "$CFG" >> "$LOG" 2>&1
  rc=$?
  echo "[$(date +%H:%M:%S)] train exit $rc" >> "$LOG"
  if [ $rc -eq 0 ]; then
    echo "[$(date +%H:%M:%S)] final held-out evaluation" >> "$LOG"
    timeout 3600 python -u run.py --type evaluate --cfg_file "$CFG" >> "$LOG" 2>&1
    echo "[$(date +%H:%M:%S)] eval exit $?" >> "$LOG"
    exit 0
  fi
  sleep 30
done
echo "gave up after 12 attempts" >> "$LOG"
exit 1
