#!/bin/bash
# Round-5 TPU queue, part 2 (serial — single chip, single host core):
#   1. wait for the lr-sweep queue (part 1) to drain
#   2. multihost 1/2/4-proc regimes (CPU-only; VERDICT r4 #6)
#   3. s2d-stem train-step cell under the TRAIN_BENCH protocol (#3)
#   4. e2e median-of-10 stream bench on the best lr-sweep ckpt (#5)
#   5. endpoint-F1 training-lever cells, 6 epochs on the SHARED 16-epoch
#      cosine prefix (scheduler.T_max pinned to 1216 = the lr21 cell's
#      horizon, so epoch-5 val is directly comparable to the lr21 curve) (#2)
#   6. hard-geometry eval of the benign-trained ckpt (#7)
cd /root/repo
LOG=/root/data/r5_queue2.log
mkdir -p /root/data

run() {
  echo "=== $(date +%F\ %T) START: $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== $(date +%F\ %T) rc=$? DONE: $*" >> "$LOG"
}

# 1. wait for the part-1 lr sweep
while kill -0 "$(cat /tmp/queue_lr.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== $(date +%F\ %T) part-1 drained" >> "$LOG"

# 2. multihost (CPU-only; needs the otherwise-idle host, chip sits idle)
run timeout 5400 python tools/multihost_test.py

# 3. s2d stem train cell (batch 8, no remat — the shipped defaults)
run timeout 3600 python tools/train_mfu_sweep.py --batches 8 \
    --policies none --also-none-at 0 --sets "s2d_stem=True" \
    --out /root/repo/TRAIN_BENCH_S2D.json

# 4. best lr-sweep ckpt -> e2e median bench
BEST=$(python - <<'EOF'
import json, os
best, bl = "", -1.0
for f, d in (("/root/data/LR_CELL_21.json", "/root/data/soak_lr21"),
             ("/root/data/LR_CELL_30.json", "/root/data/soak_lr30")):
    if not os.path.isfile(f):
        continue
    r = json.load(open(f))
    c = max(v["composite"] for v in r["train"]["val_curve"])
    if c > bl:
        bl, best = c, os.path.join(d, "ckpt", "best")
print(best)
EOF
)
echo "=== BEST_CKPT=$BEST" >> "$LOG"
run timeout 7200 python tools/stream_bench.py --ckpt "$BEST" --runs 10

# 5. endpoint training-lever cells (lr 2.1e-4, shared cosine prefix)
run timeout 10800 python tools/soak_run.py --stages train --epochs 6 \
    --data-root /root/data/synth1024_s3 \
    --set optimizer.lr=0.00021 --set scheduler.T_max=1216 \
    --set total_iter=1216 \
    --log-dir /root/data/soak_endp_sig3 \
    --out /root/data/ENDP_CELL_sig3.json
run timeout 10800 python tools/soak_run.py --stages train --epochs 6 \
    --data-root /root/data/synth1024 \
    --set optimizer.lr=0.00021 --set scheduler.T_max=1216 \
    --set total_iter=1216 --set heads.endp_pos_w=8.0 \
    --log-dir /root/data/soak_endp_focal \
    --out /root/data/ENDP_CELL_focal.json
run timeout 10800 python tools/soak_run.py --stages train --epochs 6 \
    --data-root /root/data/synth1024 \
    --set optimizer.lr=0.00021 --set scheduler.T_max=1216 \
    --set total_iter=1216 --set endp_head_extra=True \
    --log-dir /root/data/soak_endp_cap \
    --out /root/data/ENDP_CELL_cap.json

# 6. hard-geometry eval (train/test stress split: benign-trained ckpt,
#    curved/merging/crossing + degraded-intensity val tiles)
run timeout 3600 python tools/soak_run.py --stages validate \
    --data-root /root/data/synth256_hard --ckpt "$BEST" \
    --log-dir /root/data/hard_eval --out /root/data/HARD_EVAL.json

echo "=== $(date +%F\ %T) QUEUE-2 COMPLETE" >> "$LOG"
