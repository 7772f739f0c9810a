#!/bin/bash
# Round-5 TPU queue, part 1: the batch-8 lr sweep (VERDICT r4 next-#1).
# Sequential — single chip, single host core.  Each cell is the 16-epoch
# soak train protocol (batch 8, bf16, no remat, cosine to total_iter).
cd /root/repo
LOG=/root/data/r5_queue.log
mkdir -p /root/data

run() {
  echo "=== $(date +%F\ %T) START: $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== $(date +%F\ %T) rc=$? DONE: $*" >> "$LOG"
}

run python tools/soak_run.py --stages train --epochs 16 \
    --data-root /root/data/synth1024 --set optimizer.lr=0.00021 \
    --log-dir /root/data/soak_lr21 --out /root/data/LR_CELL_21.json

run python tools/soak_run.py --stages train --epochs 16 \
    --data-root /root/data/synth1024 --set optimizer.lr=0.0003 \
    --log-dir /root/data/soak_lr30 --out /root/data/LR_CELL_30.json

echo "=== $(date +%F\ %T) LR QUEUE COMPLETE" >> "$LOG"
