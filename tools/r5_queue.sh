#!/bin/bash
# Round-5 sequential chip queue (run AFTER bench.py finishes; one TPU
# process at a time). Logs into expr_r5_queue.log.
set -x
cd /root/repo

# 1. Online free-running ATE, V1_01 + V2_01 full length, n=2
#    (VERDICT r4 item 1 done-bar: free-run online ATE <= 1 cm)
timeout 2400 python tools/evaluate.py --online --depth 4 --runs 2 \
  --frames 4000 --start 0 --seqs V1_01_easy,V2_01_easy \
  --out expr_online_r5 2>&1 | tail -30

# 2. Detector-distribution A/B on the V1_03 image-level failure window
#    (VERDICT r4 item 3 / missing #3): quota vs octree emulation,
#    reference contract (no reloc), n=2 each
timeout 2400 python tools/evaluate_image.py --seqs V1_03_difficult \
  --frames 600 --runs 2 --out expr_img_r5_ab_quota 2>&1 | tail -12
timeout 2400 python tools/evaluate_image.py --seqs V1_03_difficult \
  --frames 600 --runs 2 --distribution octree \
  --out expr_img_r5_ab_octree 2>&1 | tail -12

# 3. Sprite-density probe on V2_02 (fidelity confound check)
timeout 1800 python tools/evaluate_image.py --seqs V2_02_medium \
  --frames 600 --runs 1 --landmarks 16000 \
  --out expr_img_r5_dense 2>&1 | tail -8

echo "R5 QUEUE PHASE A DONE"
